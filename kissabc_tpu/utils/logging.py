"""Observability.

The reference's observability is ``verbose`` knobs @show-ing
(iteration, eps, ESS) and @info completion reports (SURVEY §5). Here:

- in-loop verbose printing is ``jax.debug.print`` inside the jitted
  programs (already wired into smc/pfilter/ABCDE via ``verbose=True``);
- ``trace`` wraps a block in the JAX/XLA profiler, producing a
  TensorBoard-compatible trace of the compiled TPU program;
- ``IterLog`` collects host-side structured per-iteration records when
  algorithms are run in host-stepped mode.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time


@contextlib.contextmanager
def trace(logdir: str = "/tmp/kissabc_trace"):
    """Profile a block: ``with trace(): smc(...)`` then inspect with
    TensorBoard / xprof."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class IterLog:
    """Structured iteration log: ``log.emit(iteration=3, eps=0.5)``;
    lines are JSON on stderr plus kept in memory for tests."""

    def __init__(self, stream=None, enabled: bool = True):
        self.stream = stream if stream is not None else sys.stderr
        self.enabled = enabled
        self.records: list[dict] = []
        self._t0 = time.perf_counter()

    def emit(self, **fields):
        rec = {"t": round(time.perf_counter() - self._t0, 4), **fields}
        self.records.append(rec)
        if self.enabled:
            print(json.dumps(rec), file=self.stream, flush=True)
        return rec
