"""Plain rejection-ABC — the textbook baseline sampler (Pritchard et al.
1999; Beaumont 2002 top-quantile variant).

The reference (KissABC.jl) does not ship this, but it is the method every
ABC user reaches for first, the natural sanity oracle for ``smc``/``AIS``
posteriors, and a direct Monte-Carlo estimator of the ABC acceptance mass
``P(cost <= eps | prior)`` — directly comparable to ``SMCResult.log_evidence``.
(Threshold mode stops as soon as the particle buffer fills, a data-
dependent stopping time that makes naccept/nsims slightly optimistic —
classic inverse-binomial bias, vanishing as ``batch``/acceptances per
batch grow; a run that exhausts ``max_sims`` is exactly unbiased.)
Listed in PARITY.md as a beyond-reference capability.

It is also the single most TPU-friendly algorithm in the package — pure
prior sampling plus a batched simulator, zero ensemble interaction — so it
doubles as a throughput ceiling for the simulator itself. Two modes, each
one jitted program:

- **budget mode** (``nsims=``): draw a fixed simulation budget in chunks
  and keep the best ``nparticles`` — a streaming top-k: ``lax.scan`` over
  chunks carrying a best-so-far buffer, merged with each chunk by one
  ``lax.top_k`` over the concatenated costs (no global sort, no O(nsims)
  memory; merge measured at ~0.17 ms per 131072-wide chunk on v5e vs
  ~1.4 ms of simulation — the pipeline runs within ~10% of the bare
  simulator).
- **threshold mode** (``eps=``): accept draws with ``cost <= eps`` into a
  fixed buffer via a cumsum-indexed masked scatter (``mode='drop'``)
  inside a bounded ``lax.while_loop`` — the unbounded rejection loop of
  the textbook algorithm made static-shape (same policy as pfilter's
  bounded ``@goto`` replacement, ``src/smc.jl:308-321``).

The jitted programs are memoized on ``(prior, cost, shapes, mesh, ...)``
object identity/value, so repeated calls (replication studies, key sweeps)
skip the ~1 s retrace and pay only dispatch — without this, per-call
retrace halved the end-to-end throughput in bench.

Prior draws are in-support by construction (discrete marginals come out
integral), so there is no raw-vs-pushed cost distinction here (cf. the
``cost_on`` knob on pfilter/ABCDE); the cost sees the float particle and
the returned population is pushed.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.tree import tfloat, tgather, tree_map
from ..particles import Particles, particles_from_tree
from ..utils.hostfetch import fetch, fetch_tree
from ..utils.rng import as_key
from .density import _adapt_cost

_f32 = jnp.float32


class RejectionResult(NamedTuple):
    P: object            # posterior Particles (pushed, sorted best-first)
    C: Particles         # kept costs, ascending (+inf = unfilled slots)
    eps: float           # budget mode: worst finite kept cost;
    #                      threshold mode: the eps the caller passed
    nsims: int           # total simulator calls
    naccept: int         # finite-cost kept draws (budget) / accepted (eps)
    log_evidence: float  # log P(cost <= eps | prior) = log(naccept/nsims)


def _batched_prior_sampler(prior, b):
    """One BATCHED draw per marginal (``prior.sample(key, (b,))``) when
    its tree structure/shapes/dtypes match the per-walker vmapped draw,
    else the vmapped per-walker key-split fallback.

    The per-walker ``jax.random.split(kd, b)`` + per-marginal fold-ins
    inside ``Factored.sample_tree`` cost ~100 us of threefry glue per
    131072-wide chunk (profiled r4 — ~5% of the rejection row, the one
    sweep path that hadn't had the one-bits-call treatment; VERDICT r4
    next #4). Streams change vs r4 (documented stream-change policy);
    the marginal laws are identical. The structural check runs via
    ``jax.eval_shape`` (trace-only, no device ops)."""
    def vm(kd):
        return jax.vmap(lambda kk: tfloat(prior.sample_tree(kk)))(
            jax.random.split(kd, b))

    def fast(kd):
        return tfloat(prior.sample(kd, (b,)))

    try:
        k0 = jax.random.key(0)
        ref = jax.eval_shape(vm, k0)
        got = jax.eval_shape(fast, k0)
        lr = jax.tree_util.tree_leaves(ref)
        lg = jax.tree_util.tree_leaves(got)
        same = (jax.tree_util.tree_structure(ref)
                == jax.tree_util.tree_structure(got)
                and len(lr) == len(lg)
                and all(a.shape == c.shape and a.dtype == c.dtype
                        for a, c in zip(lr, lg)))
    except Exception:  # exotic priors without batched sample support
        same = False
    return fast if same else vm


def _make_draw_chunk(prior, cost, b, cost_vectorized, mesh):
    """One chunk of ``b`` prior draws + costs; non-finite costs -> +inf."""
    from ..parallel.mesh import constrainer
    constrain = constrainer(mesh, "walker")
    cost2 = cost if cost_vectorized else _adapt_cost(cost)
    sample_b = _batched_prior_sampler(prior, b)

    def draw_chunk(k):
        kd, kc = jax.random.split(k)
        ths = constrain(sample_b(kd))
        if cost_vectorized:
            cs = cost2(ths, kc)
        else:
            cs = jax.vmap(cost2)(ths, jax.random.split(kc, b))
        cs = jnp.asarray(cs, _f32)
        return ths, jnp.where(jnp.isfinite(cs), cs, jnp.inf)

    return draw_chunk


def _empty_buffer(prior, n, k0):
    """Zeroed population buffer with the prior's tree structure/dtypes
    (shape-only: eval_shape issues no device ops)."""
    return tree_map(
        lambda x: jnp.zeros((n,) + x.shape[1:], x.dtype),
        jax.eval_shape(lambda kk: jax.vmap(
            lambda q: tfloat(prior.sample_tree(q)))(
                jax.random.split(kk, n)), k0))


@lru_cache(maxsize=32)
def _budget_program(prior, cost, n, b, nchunks, cost_vectorized, mesh,
                    verbose):
    draw_chunk = _make_draw_chunk(prior, cost, b, cost_vectorized, mesh)

    def step(carry, k):
        buf_th, buf_cs = carry
        ths, cs = draw_chunk(k)
        merged = jnp.concatenate([buf_cs, cs])
        top, idx = jax.lax.top_k(-merged, n)
        cat = tree_map(lambda a, c: jnp.concatenate([a, c]), buf_th, ths)
        if verbose:
            jax.debug.print("abc_rejection chunk: running eps={e}",
                            e=-top[n - 1])
        return (tgather(cat, idx), -top), None

    def program(k):
        k0, kscan = jax.random.split(k)
        buf_th = _empty_buffer(prior, n, k0)
        buf_cs = jnp.full((n,), jnp.inf, _f32)
        (buf_th, buf_cs), _ = jax.lax.scan(
            step, (buf_th, buf_cs), jax.random.split(kscan, nchunks))
        # carry invariant: top_k returns values sorted, so buf_cs exits
        # the scan ascending (best-first) — no final sort needed
        pushed = jax.vmap(prior.push_tree)(buf_th)
        return pushed, buf_cs

    return jax.jit(program)


@lru_cache(maxsize=32)
def _threshold_program(prior, cost, n, b, epsv, max_batches,
                       cost_vectorized, mesh, verbose):
    draw_chunk = _make_draw_chunk(prior, cost, b, cost_vectorized, mesh)

    def cond(c):
        t, _th, _cs, fill, *_ = c
        return (t < max_batches) & (fill < n)

    def body(c):
        t, buf_th, buf_cs, fill, nacc, k = c
        k, sub = jax.random.split(k)
        ths, cs = draw_chunk(sub)
        m = cs <= epsv
        pos = fill + jnp.cumsum(m) - 1
        pos = jnp.where(m & (pos < n), pos, n)  # OOB -> dropped
        buf_th = tree_map(
            lambda bl, cl: bl.at[pos].set(cl, mode="drop"), buf_th, ths)
        buf_cs = buf_cs.at[pos].set(cs, mode="drop")
        kept = jnp.sum(m)
        if verbose:
            jax.debug.print(
                "abc_rejection batch {t}: +{k} accepted", t=t, k=kept)
        return (t + 1, buf_th, buf_cs,
                jnp.minimum(fill + kept, n), nacc + kept, k)

    def program(k):
        k0, kloop = jax.random.split(k)
        buf_th = _empty_buffer(prior, n, k0)
        buf_cs = jnp.full((n,), jnp.inf, _f32)
        t, buf_th, buf_cs, fill, nacc, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), buf_th, buf_cs, jnp.int32(0),
             jnp.int32(0), kloop))
        # sort best-first like budget mode (unfilled +inf slots go last)
        order = jnp.argsort(buf_cs)
        buf_th, buf_cs = tgather((buf_th, buf_cs), order)
        pushed = jax.vmap(prior.push_tree)(buf_th)
        return pushed, buf_cs, fill, nacc, t

    return jax.jit(program)


def abc_rejection(prior, cost, nparticles: int, *, eps: float | None = None,
                  nsims: int | None = None, batch: int | None = None,
                  max_sims: int = 10_000_000, cost_vectorized: bool = False,
                  mesh=None, verbose: bool = False,
                  key=0) -> RejectionResult:
    """Rejection ABC. Exactly one of ``eps`` / ``nsims`` selects the mode
    (default: budget mode with ``nsims = 100 * nparticles``).

    ``batch`` is the per-chunk simulation width (default
    ``max(nparticles, 4096)`` capped at the budget) — make it large enough
    to saturate the chip; the carry buffer stays ``nparticles`` wide.
    ``max_sims`` bounds threshold mode (spent in whole batches, so the
    realized budget is ``floor(max_sims/batch)*batch``); if the buffer is
    still unfilled at the budget a ``RuntimeWarning`` surfaces the
    shortfall (unfilled slots carry cost ``+inf``) instead of silently
    looping forever. Budget mode conversely rounds ``nsims`` UP to whole
    chunks (realized budget ``ceil(nsims/batch)*batch``, up to
    ``batch-1`` extra simulator calls) so no requested simulation is
    dropped; pass ``batch`` dividing ``nsims`` for an exact budget.
    ``mesh``: shard each simulation chunk over the mesh ``walker`` axis.
    """
    if eps is not None and nsims is not None:
        raise ValueError("pass either eps= (threshold mode) or nsims= "
                         "(budget mode), not both")
    n = int(nparticles)
    if n < 1:
        raise ValueError("nparticles must be >= 1")

    if batch is None:
        batch = max(n, 4096)
        if eps is None:
            batch = min(batch, nsims if nsims is not None else 100 * n)
    b = max(int(batch), 1)

    if eps is None:
        # ---- budget mode: streaming top-k over ceil(nsims/b) chunks ----
        total = 100 * n if nsims is None else int(nsims)
        if total < n:
            raise ValueError(f"nsims={total} < nparticles={n}")
        nchunks = math.ceil(total / b)
        total = nchunks * b  # realized budget (rounded up to whole chunks)
        prog = _budget_program(prior, cost, n, b, nchunks,
                               bool(cost_vectorized), mesh, bool(verbose))
        pushed, cs = prog(as_key(key))
        cs = fetch(cs)
        # kept slots with +inf cost are either never-overwritten init
        # placeholders or genuinely infinite-cost draws — neither is a
        # posterior sample; count only the finite ones (cs is ascending,
        # so they are the leading naccept entries)
        naccept = int(np.sum(np.isfinite(cs)))
        epsv = float(cs[naccept - 1]) if naccept else float("inf")
        if naccept < n:
            import warnings
            warnings.warn(
                f"abc_rejection: only {naccept}/{n} draws had finite cost "
                f"within nsims={total}; trailing slots are unfilled "
                "placeholders (cost +inf) — raise nsims or check the "
                "simulator.", RuntimeWarning, stacklevel=2)
    else:
        # ---- threshold mode: bounded masked accumulate ----
        if int(max_sims) < 1:
            raise ValueError(f"max_sims must be >= 1, got {max_sims}")
        epsv = float(eps)
        b = min(b, int(max_sims))  # never exceed the simulation budget
        # whole batches only (static shapes): the realized budget is
        # floor(max_sims/batch)*batch — choose batch to divide max_sims
        # to spend it exactly
        max_batches = max(1, int(max_sims) // b)
        prog = _threshold_program(prior, cost, n, b, epsv, max_batches,
                                  bool(cost_vectorized), mesh, bool(verbose))
        pushed, cs, fill, nacc, t = prog(as_key(key))
        cs = fetch(cs)
        fill = int(fill)
        total = int(t) * b
        # nacc <= t*b always, and when fill < n nothing was dropped so
        # nacc == fill — no clamping needed
        naccept = int(nacc)
        if fill < n:
            import warnings
            warnings.warn(
                f"abc_rejection: only {fill}/{n} particles accepted after "
                f"{total} simulations (budget max_sims={int(max_sims)}, "
                f"spent in whole batches of {b}) at eps={epsv}; unfilled "
                "slots have cost +inf — raise max_sims or loosen eps.",
                RuntimeWarning, stacklevel=2)

    logz = (math.log(naccept) - math.log(total)) if naccept else -math.inf
    return RejectionResult(
        P=particles_from_tree(fetch_tree(pushed)),
        C=Particles(cs),
        eps=epsv,
        nsims=total,
        naccept=int(naccept),
        log_evidence=logz,
    )
