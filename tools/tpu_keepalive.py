#!/usr/bin/env python
"""Keep the tunneled TPU attach path warm.

On this axon-tunneled image, the first device op of a process after the
TPU sat idle for a few minutes stalls 2–30+ minutes (observed up to
1913 s on 2026-08-20); warmth usually carries across processes once ANY
process completed an op recently (see CLAUDE.md, "COLD-ATTACH STALL").
This daemon executes one tiny device op per interval so capped runs
(the driver's `timeout 590 python bench.py`) don't burn their whole
budget inside the warmup absorber.

Contention is negligible: the op is a ~1 ms scalar add; the tunnel
serializes it between other work. The process self-expires.

Usage: python tools/tpu_keepalive.py [hours=6] [interval_s=75]
"""

import sys
import time


def main():
    hours = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    interval = float(sys.argv[2]) if len(sys.argv) > 2 else 75.0
    deadline = time.time() + hours * 3600

    import jax
    import jax.numpy as jnp

    n = 0
    while time.time() < deadline:
        t0 = time.time()
        try:
            v = float((jnp.ones((8, 128)) + 1.0).sum())
            n += 1
            print(f"keepalive #{n}: op={time.time() - t0:.2f}s val={v}",
                  flush=True)
        except Exception as e:  # tunnel hiccup: report and keep trying
            print(f"keepalive #{n}: ERROR {e!r}", flush=True)
        time.sleep(max(0.0, interval - (time.time() - t0)))


if __name__ == "__main__":
    main()
