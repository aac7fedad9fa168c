"""Adaptive-epsilon SMC-ABC — the reference's flagship algorithm
(``src/smc.jl:92-206``; Del Moral 2012 adaptive SMC with an
affine-invariant-style rejuvenation move).

TPU-native structure (SURVEY §3.3, §7.5): the entire adaptive loop is ONE
jitted ``lax.while_loop``; each iteration is

  1. adaptive threshold  eps <- type-7 quantile of alive costs (smc.jl:134)
  2. alive-mask update with the boundary flag (smc.jl:136-141)
  3. deterministic replication resampling when alpha*ESS <= N*min_r_ess
     (smc.jl:145-153) — reproduced exactly; a proper systematic resampler
     is available via ``resample='systematic'``
  4. delayed-acceptance MCMC rejuvenation sweep against a snapshot of the
     population, with the accept-count-accumulating retry loop
     (smc.jl:156-193): Gaussian-scaled difference proposals for ALL alive
     particles in one batched kernel, cheap prior gate, then the simulator
     gate — on TPU the simulator runs masked-but-batched (lockstep SIMD
     makes compaction pointless for jittable costs)
  5. stall / epstol / acceptance stopping rule (smc.jl:194-198)

The population is a struct-of-arrays float pytree on the walker axis, so
the same program runs single-chip or sharded over a mesh (parallel/).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.moves import gaussian_diff_propose
from ..ops.quantile import (masked_quantile,
                            masked_quantile_bisect,
                            resolve_quantile_impl)
from ..ops.resampling import replicate_alive, systematic
from ..ops.tree import tfloat, tgather, tselect, tree_map
from ..particles import particles_from_tree
from ..utils.hostfetch import fetch
from ..utils.rng import as_key
from .density import _adapt_cost

_f32 = jnp.float32


class _SMCState(NamedTuple):
    """Loop carry of the smc while_loop — a NamedTuple so host-stepped
    consumers (smc_stepped logging/checkpointing) address fields by name
    instead of magic positional indices, and checkpoint leaves carry
    stable field-path names."""
    key: object
    thetas: object   # population pytree (walker axis leading)
    xs: object       # costs [n]
    lps: object      # prior log-densities [n]
    alive: object    # bool mask [n]
    eps: object      # current threshold
    logz: object     # accumulated log survival mass (evidence)
    it: object       # iteration counter
    acc: object      # accepted count of the last sweep
    done: object     # stop flag


class SMCResult(NamedTuple):
    P: object          # Particles (or list of Particles) — alive posterior
    C: np.ndarray      # final cost array (full population, smc.jl:205)
    eps: float         # final threshold
    iterations: int
    ess: int
    # log P(cost < eps | prior) — the ABC acceptance mass under the
    # final threshold, estimated by the telescoping product of per-
    # iteration survival fractions (the standard adaptive-SMC evidence
    # estimator; Del Moral 2012 / Didelot 2011 ABC model choice).
    # Divide out the eps-kernel volume to compare models. Beyond the
    # reference (which returns no evidence).
    log_evidence: float = float("nan")


def _smc_program(prior, cost2, *, nparticles, alpha, mcmc_retrys, mcmc_tol,
                 epstol, r_epstol, min_r_ess, max_stretch, max_iters,
                 resample, verbose, constrain=lambda t: t,
                 cost_vectorized=False, partner_scheme="auto", mesh=None,
                 quantile_impl="auto", sweep_fused=None):
    """Build the jittable smc(key) -> final-state program. ``constrain``
    pins population arrays to a mesh axis (parallel/mesh.py); identity on
    a single chip. With ``cost_vectorized`` the user cost takes the whole
    pushed population + keys[n] at once — the hook for batched/Pallas
    fused simulators (ops/pallas_kernels.py). ``sweep_fused`` replaces
    the whole inner rejuvenation sweep with a one-kernel implementation
    (``make_fused_smc_sweep``): proposal + prior gate + simulator +
    cost gate + commit in one pallas_call; ``cost2`` still drives
    init."""
    n = nparticles
    d = prior.nparams
    retry_n = 1 + mcmc_retrys
    tol_count = mcmc_tol * n
    # quantile_impl: the sort-based masked quantile wins on a single
    # chip at moderate n, but the 33-pass bit-pattern bisection is
    # nearly flat in n (sort 1.74 vs bisect 0.46 ms at n=2^20 —
    # profiled as 15% of the 1M smc iteration), so 'auto' is
    # size-aware (bisect at n >= 2^18). On a multi-chip mesh the sort
    # would lower to a full-population all-gather per iteration while
    # the bisection is O(iters) SCALAR all-reduces, so 'auto' picks
    # bisect when the population is sharded. The two are bit-identical
    # on the same multiset (test_ops.py), so the sharded-vs-unsharded
    # bitwise determinism contract survives the switch.
    qfn = (masked_quantile
           if resolve_quantile_impl(quantile_impl, mesh, n) == "sort"
           else masked_quantile_bisect)

    vlogpdf = jax.vmap(lambda th: prior.logpdf_tree(prior.push_tree(th)))
    if cost_vectorized:
        vpush = jax.vmap(prior.push_tree)
        batch_cost = lambda ths, key: cost2(vpush(ths), key)
    else:
        _vc = jax.vmap(lambda th, k: cost2(prior.push_tree(th), k))
        batch_cost = lambda ths, key: _vc(ths, jax.random.split(key, n))

    def init(key):
        kth, kc = jax.random.split(key)
        thetas = jax.vmap(lambda k: tfloat(prior.sample_tree(k)))(
            jax.random.split(kth, n))
        thetas = constrain(thetas)
        xs = jnp.asarray(batch_cost(thetas, kc), _f32)
        lps = jnp.asarray(vlogpdf(thetas), _f32)
        return thetas, constrain(xs), constrain(lps)

    def mcmc_sweep(key, thetas, xs, lps, alive, eps, flag):
        """One retry round of the rejuvenation sweep (smc.jl:159-191);
        proposals all read the pre-sweep snapshot (smc.jl:160-167)."""
        if sweep_fused is not None:
            return sweep_fused(key, thetas, xs, lps, alive, eps, flag)
        kp, kmh, kc = jax.random.split(key, 3)
        props = gaussian_diff_propose(kp, thetas, d, max_stretch,
                                      scheme=partner_scheme, mesh=mesh)
        lprob = -jax.random.exponential(kmh, (n,), _f32)  # log U per walker
        lpp = jnp.asarray(vlogpdf(props), _f32)
        # gate 1 — prior-only MH (smc.jl:172-175); -inf lpp rejected
        lm = jnp.minimum(lpp - lps, 0.0)
        gate1 = alive & (lpp > -jnp.inf) & (lprob < lm)
        # gate 2 — simulator (smc.jl:176-181); batched, masked afterward.
        xp = jnp.asarray(batch_cost(props, kc), _f32)
        gate2 = jnp.where(flag, xp <= eps, xp < eps)
        commit = gate1 & gate2
        thetas = tselect(commit, props, thetas)
        xs = jnp.where(commit, xp, xs)
        lps = jnp.where(commit, lpp, lps)
        return thetas, xs, lps, jnp.sum(commit)

    def body(state):
        (key, thetas, xs, lps, alive, eps, logz, it, _acc, done) = state
        key, kres, kmc = jax.random.split(key, 3)
        it = it + 1
        eps_v = eps
        prev_cnt = jnp.sum(alive)  # walkers representing prior|cost<eps_v
        eps = qfn(xs, alive, alpha)
        xmin = jnp.min(jnp.where(alive, xs, jnp.inf))
        flag = ~(eps > xmin)
        alive = jnp.where(flag, xs <= eps, xs < eps)
        ess = jnp.sum(alive)
        # evidence: survival fraction of this eps-lowering telescopes to
        # P(cost < eps_final | prior) (counts taken BEFORE resampling)
        logz = logz + (jnp.log(ess.astype(_f32))
                       - jnp.log(prev_cnt.astype(_f32)))

        # Step 2 — resampling (smc.jl:145-153), under lax.cond so the
        # argsort/scan of the resampler only runs on iterations that
        # actually resample
        need = alpha * ess <= n * min_r_ess

        def resample_branch(op):
            th, x_, lp_, al = op
            if resample == "replicate":
                ridx = replicate_alive(al)
            else:
                ridx = systematic(kres, al.astype(_f32))
            # one combined tgather: packs th+xs+lps into a single row
            # gather (per-element latency wall — see ops/tree.py)
            th, x_, lp_ = tgather((th, x_, lp_), ridx)
            return (th, x_, lp_, jnp.ones_like(al))

        thetas, xs, lps, alive = jax.lax.cond(
            need, resample_branch, lambda op: op, (thetas, xs, lps, alive))
        ess = jnp.where(need, n, ess)

        if verbose:
            jax.debug.print(
                "smc it={it} eps={eps} ESS={ess}", it=it, eps=eps, ess=ess)

        # Step 3 — MCMC with accept-accumulating retries (smc.jl:156-193)
        def retry_cond(c):
            r, acc, *_ = c
            return (r < retry_n) & ((r == 0) | (acc < tol_count))

        def retry_body(c):
            r, acc, th, x_, lp_, k = c
            k, sub = jax.random.split(k)
            th, x_, lp_, got = mcmc_sweep(sub, th, x_, lp_, alive, eps, flag)
            return r + 1, acc + got, th, x_, lp_, k

        _, accepted, thetas, xs, lps, kmc = jax.lax.while_loop(
            retry_cond, retry_body,
            (jnp.int32(0), jnp.int32(0), thetas, xs, lps, kmc))

        stall = 2.0 * jnp.abs(eps_v - eps) < r_epstol * (
            jnp.abs(eps_v) + jnp.abs(eps))
        done = stall | (eps <= epstol) | (accepted < tol_count)
        thetas = constrain(thetas)
        return _SMCState(key, thetas, constrain(xs), constrain(lps),
                         constrain(alive), eps, logz, it, accepted, done)

    def cond(state):
        return ~state.done & (state.it < max_iters)

    def init_state(key):
        kinit, kloop = jax.random.split(key)
        thetas, xs, lps = init(kinit)
        alive = jnp.ones((n,), bool)
        return _SMCState(kloop, thetas, xs, lps, alive,
                         jnp.asarray(jnp.inf, _f32), jnp.asarray(0.0, _f32),
                         jnp.int32(0), jnp.int32(0), jnp.asarray(False))

    def program(key):
        state = jax.lax.while_loop(cond, body, init_state(key))
        pushed = jax.vmap(prior.push_tree)(state.thetas)
        return (pushed, state.xs, state.lps, state.alive, state.eps,
                state.logz, state.it, state.done)

    # expose the pieces for host-stepped drivers (checkpoint/resume,
    # per-iteration logging)
    program.init_state = init_state
    program.body = body
    program.cond = cond
    return program


def _validate_smc_knobs(prior, *, nparticles, alpha, mcmc_retrys, mcmc_tol,
                        r_epstol, min_r_ess, max_stretch, resample,
                        partner_scheme="auto", quantile_impl="auto"):
    """Knob validation shared by smc and smc_stepped — reference error
    semantics (smc.jl:107-118) plus the string knobs this build adds."""
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1].")
    if r_epstol is None:
        r_epstol = (1 - alpha) ** 1.5 / 50.0
    if min_r_ess is None:
        min_r_ess = alpha ** 2
    if min_r_ess <= 0:
        raise ValueError("min_r_ess must be > 0.")
    if mcmc_retrys < 0:
        raise ValueError("mcmc_retrys must be >= 0.")
    if r_epstol < 0:
        raise ValueError("r_epstol must be >= 0")
    if mcmc_tol < 0:
        raise ValueError("mcmc_tol must be >= 0")
    if max_stretch <= 1:
        raise ValueError("max_stretch must be > 1")
    if resample not in ("replicate", "systematic"):
        raise ValueError(
            f"resample must be 'replicate' or 'systematic', got {resample!r}")
    if partner_scheme not in ("auto", "roll", "gather"):
        raise ValueError(
            "partner_scheme must be 'auto', 'roll' or 'gather', "
            f"got {partner_scheme!r}")
    resolve_quantile_impl(quantile_impl, None)  # validate the string
    min_np = math.ceil(3 * prior.nparams / min(alpha, min_r_ess))
    if nparticles < min_np:
        raise ValueError(f"nparticles must be >= {min_np}.")
    return r_epstol, min_r_ess


def smc(prior, cost, *, nparticles: int = 100, alpha: float = 0.95,
        mcmc_retrys: int = 0, mcmc_tol: float = 0.015, epstol: float = 0.0,
        r_epstol: float | None = None, min_r_ess: float | None = None,
        max_stretch: float = 2.0, max_iters: int = 10_000,
        resample: str = "replicate", verbose: bool = False,
        parallel: bool = True, mesh=None, cost_vectorized: bool = False,
        partner_scheme: str = "auto", quantile_impl: str = "auto",
        sweep_fused=None, key=0) -> SMCResult:
    """Adaptive SMC-ABC. Signature and defaults mirror the reference
    (smc.jl:92-106): ``r_epstol=(1-alpha)^1.5/50``, ``min_r_ess=alpha^2``.
    ``parallel`` is accepted for API parity; execution is always the
    batched TPU path.

    Large-population note: the reference's literal resample trigger
    (``alpha*ESS <= N*min_r_ess`` with ``min_r_ess=alpha^2``) fires
    every iteration at its own boundary, and each replicate-resample
    costs ~45-90 ms of population gathers at 2^20 particles (XLA gather
    latency; profiled). ``min_r_ess=0.5`` — resample when ESS halves,
    the standard ESS-triggered rule — gave identical posterior moments
    2.9x faster at 1M (docs/benchmarks.md ``smc-1m``). Defaults stay
    reference-exact. ``resample='systematic'`` swaps the reference's
    deterministic replication (smc.jl:146-152) for low-variance systematic
    resampling. ``mesh``: a ``jax.sharding.Mesh`` with a ``walker`` axis —
    the population is sharded over it and XLA inserts the ICI collectives
    (SURVEY §2b). ``quantile_impl``: the per-iteration eps quantile —
    ``'sort'`` (fastest single-chip), ``'bisect'`` (exact order
    statistics by value bisection: O(1) bytes/chip on a mesh instead of
    the sort's full-population all-gather), ``'auto'`` = bisect when the
    population is sharded over >1 device; both are bit-identical on the
    same cost multiset. ``sweep_fused``: a one-kernel rejuvenation
    sweep from ``make_fused_smc_sweep(prior, draw, reduce_cost, ...)``
    — the whole inner MCMC move (proposal + prior gate + simulator +
    cost gate + commit) runs as one pallas_call per retry round
    (``cost`` still drives init, so pass the matching streaming cost).
    On a mesh, build the sweep with the SAME mesh
    (``make_fused_smc_sweep(..., mesh=mesh)``): partner rolls become
    shard-sized ppermutes and the kernel runs per shard. Statistics
    match the split path (different streams)."""
    if sweep_fused is not None and mesh is not None \
            and getattr(sweep_fused, "mesh", None) is not mesh:
        raise ValueError(
            "smc(mesh=...) with sweep_fused needs the sweep built for "
            "the SAME mesh: make_fused_smc_sweep(..., mesh=mesh) — a "
            "single-chip fused sweep cannot run on sharded populations")
    r_epstol, min_r_ess = _validate_smc_knobs(
        prior, nparticles=nparticles, alpha=alpha, mcmc_retrys=mcmc_retrys,
        mcmc_tol=mcmc_tol, r_epstol=r_epstol, min_r_ess=min_r_ess,
        max_stretch=max_stretch, resample=resample,
        partner_scheme=partner_scheme, quantile_impl=quantile_impl)
    del parallel

    from ..parallel.mesh import constrainer
    program = _smc_program(
        prior, cost if cost_vectorized else _adapt_cost(cost),
        nparticles=nparticles, alpha=alpha,
        mcmc_retrys=mcmc_retrys, mcmc_tol=mcmc_tol, epstol=epstol,
        r_epstol=r_epstol, min_r_ess=min_r_ess, max_stretch=max_stretch,
        max_iters=max_iters, resample=resample, verbose=verbose,
        constrain=constrainer(mesh, "walker"), mesh=mesh,
        cost_vectorized=cost_vectorized, partner_scheme=partner_scheme,
        quantile_impl=quantile_impl, sweep_fused=sweep_fused)
    pushed, xs, lps, alive, eps, logz, it, done = \
        jax.jit(program)(as_key(key))

    if not bool(done):
        # the reference loops until an eps stall / epstol / acceptance
        # collapse (smc.jl:194-198); max_iters is this build's safety
        # bound, so hitting it means none of the real stopping rules
        # fired — surface it rather than letting it read as convergence
        import warnings
        warnings.warn(
            f"smc: stopped at the max_iters={max_iters} safety bound "
            "before any stopping rule (eps stall / epstol / acceptance "
            "collapse) fired; the posterior may not be converged.",
            RuntimeWarning, stacklevel=2)
    alive_np = fetch(alive)
    pushed_alive = tree_map(lambda x: fetch(x)[alive_np], pushed)
    return SMCResult(
        P=particles_from_tree(pushed_alive),
        C=fetch(xs),
        eps=float(eps),
        iterations=int(it),
        ess=int(alive_np.sum()),
        log_evidence=float(logz),
    )


def smc_stepped(prior, cost, *, checkpoint_path: str | None = None,
                resume: bool = False, log=None, nparticles: int = 100,
                alpha: float = 0.95, mcmc_retrys: int = 0,
                mcmc_tol: float = 0.015, epstol: float = 0.0,
                r_epstol: float | None = None, min_r_ess: float | None = None,
                max_stretch: float = 2.0, max_iters: int = 10_000,
                resample: str = "replicate", checkpoint_every: int = 10,
                cost_vectorized: bool = False, mesh=None,
                partner_scheme: str = "auto", quantile_impl: str = "auto",
                sweep_fused=None, key=0) -> SMCResult:
    """Host-stepped smc: the same algorithm as ``smc`` but with the outer
    adaptive loop driven from the host, enabling (a) per-iteration
    structured logging via ``log`` (an ``utils.logging.IterLog``) and
    (b) checkpoint/resume: state is persisted to ``checkpoint_path``
    every ``checkpoint_every`` iterations and with ``resume=True`` a run
    continues from the last saved state (useful for expensive
    simulators; the reference has no such mechanism, SURVEY §5).
    ``mesh``: shard the population over a mesh ``walker`` axis exactly
    like ``smc(mesh=...)`` — checkpoints are device-agnostic host
    arrays, so a run may be checkpointed on one mesh and resumed on
    another (or on a single chip). ``sweep_fused`` accepts a one-kernel
    rejuvenation sweep from ``make_fused_smc_sweep`` exactly like
    ``smc`` (build it with the same ``mesh`` when sharded)."""
    if sweep_fused is not None and mesh is not None \
            and getattr(sweep_fused, "mesh", None) is not mesh:
        raise ValueError(
            "smc_stepped(mesh=...) with sweep_fused needs the sweep "
            "built for the SAME mesh: make_fused_smc_sweep(..., "
            "mesh=mesh) — a single-chip fused sweep cannot run on "
            "sharded populations")
    import os

    from ..utils import checkpoint as ckpt

    r_epstol, min_r_ess = _validate_smc_knobs(
        prior, nparticles=nparticles, alpha=alpha, mcmc_retrys=mcmc_retrys,
        mcmc_tol=mcmc_tol, r_epstol=r_epstol, min_r_ess=min_r_ess,
        max_stretch=max_stretch, resample=resample,
        partner_scheme=partner_scheme, quantile_impl=quantile_impl)

    from ..parallel.mesh import constrainer
    program = _smc_program(
        prior, cost if cost_vectorized else _adapt_cost(cost),
        nparticles=nparticles, alpha=alpha, mcmc_retrys=mcmc_retrys,
        mcmc_tol=mcmc_tol, epstol=epstol, r_epstol=r_epstol,
        min_r_ess=min_r_ess, max_stretch=max_stretch, max_iters=max_iters,
        resample=resample, verbose=False,
        constrain=constrainer(mesh, "walker"), mesh=mesh,
        cost_vectorized=cost_vectorized, partner_scheme=partner_scheme,
        quantile_impl=quantile_impl, sweep_fused=sweep_fused)

    init_state = jax.jit(program.init_state)
    body = jax.jit(program.body)

    state = init_state(as_key(key))
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        state, _meta = ckpt.load(checkpoint_path, state)

    while True:
        if bool(state.done) or int(state.it) >= max_iters:
            break
        state = body(state)
        if log is not None:
            log.emit(iteration=int(state.it), eps=float(state.eps),
                     ess=int(jnp.sum(state.alive)),
                     accepted=int(state.acc))
        if checkpoint_path and int(state.it) % checkpoint_every == 0:
            ckpt.save(checkpoint_path, state,
                      {"iteration": int(state.it)})

    if not bool(state.done):
        import warnings
        warnings.warn(
            f"smc_stepped: stopped at the max_iters={max_iters} safety "
            "bound before any stopping rule fired; the posterior may not "
            "be converged.", RuntimeWarning, stacklevel=2)
    eps, logz, it = state.eps, state.logz, state.it
    alive, xs = state.alive, state.xs
    pushed = jax.vmap(prior.push_tree)(state.thetas)
    alive_np = fetch(alive)
    pushed_alive = tree_map(lambda x: fetch(x)[alive_np], pushed)
    return SMCResult(
        P=particles_from_tree(pushed_alive),
        C=fetch(xs),
        eps=float(eps),
        iterations=int(it),
        ess=int(alive_np.sum()),
        log_evidence=float(logz),
    )
