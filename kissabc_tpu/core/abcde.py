"""ABC Differential Evolution — reference ``ABCDE``
(``src/smc.jl:347-430``, à la Turner & Sederberg).

Generational double-buffered population: every generation, each particle i
picks a base s (itself, or — when above the annealed per-particle
threshold — a random not-worse particle, smc.jl:389-391), takes a DE step
``theta_s + gamma*(theta_a - theta_b)`` with gamma = pw*2.38/sqrt(2d)
(smc.jl:368,400), passes a cheap prior-MH gate before the costly simulator
(smc.jl:401-403), and commits into the buffer when
``cost <= max(eps, Delta_i)`` (smc.jl:406).

TPU-native: the per-generation particle loop is one batched kernel; the
"random not-worse particle" draw uses a rank trick (sort costs once, draw
a uniform position below i's inclusive rank) instead of the reference's
materialized index set; the whole generational loop is a single jitted
``lax.while_loop`` honoring ``earlystop`` (smc.jl:377-379).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.tree import tgather, tselect, tree_map
from ..particles import Particles, particles_from_tree
from ..utils.hostfetch import fetch, fetch_tree
from ..utils.rng import as_key
from .density import _adapt_cost
from .pfilter import _init_with_retry

_f32 = jnp.float32


class ABCDEResult(NamedTuple):
    P: object
    C: Particles
    reached_eps: bool
    nsim: int
    iterations: int


def ABCDE(prior, cost, eps_target: float, *, nparticles: int = 50,
          generations: int = 20, alpha: float = 0.0, earlystop: bool = False,
          verbose: bool = True, proposal_width: float = 1.0,
          parallel: bool = True, cost_vectorized: bool = False,
          mesh=None, cost_on: str = "raw", sweep_fused=None,
          key=0) -> ABCDEResult:
    """Signature/defaults mirror the reference (smc.jl:347).
    ``cost_vectorized``: cost takes (theta_batch, key). ``mesh``: shard
    the population over a mesh ``walker`` axis.

    ``cost_on``: ``'raw'`` (default) evaluates cost on the RAW float
    particle, exactly the reference's ``cost(θs[i].x)`` / ``cost(θp.x)``
    (smc.jl:358-363,405) — only ``logpdf`` sees the pushed value.
    ``'pushed'`` snaps discrete marginals before the simulator (documented
    extension; see docs/design.md parity notes and ``pfilter``).

    ``sweep_fused``: a fused generation from
    ``make_fused_abcde_generation(prior, draw, reduce_cost,
    gamma=...)`` — the per-walker downstream of each generation (DE
    proposal, prior gate, streaming simulator, commit) as ONE
    pallas_call; the population-global base/partner selection stays
    here. Its ``gamma`` must equal this call's
    ``proposal_width * 2.38 / sqrt(2d)`` and its ``cost_on`` must
    describe the same simulator semantics; init still evaluates
    ``cost`` on the XLA path."""
    if not (0 <= alpha < 1):
        raise ValueError("alpha must be in 0 <= alpha < 1.")
    if cost_on not in ("raw", "pushed"):
        raise ValueError(f"cost_on must be 'raw' or 'pushed', got {cost_on!r}")
    if sweep_fused is not None and mesh is not None \
            and getattr(sweep_fused, "mesh", None) is not mesh:
        raise ValueError(
            "ABCDE(mesh=...) with sweep_fused needs the generation "
            "built for the SAME mesh: make_fused_abcde_generation(..., "
            "mesh=mesh) — a single-chip fused generation cannot run on "
            "sharded populations")
    push_cost = cost_on == "pushed"
    del parallel
    n = nparticles
    d = prior.nparams
    if n < 3:
        raise ValueError(
            f"ABCDE needs >= 3 particles (a DE step draws two partners "
            f"distinct from the base), got {n}")
    gamma = proposal_width * 2.38 / math.sqrt(2 * d)
    if sweep_fused is not None:
        fg = getattr(sweep_fused, "gamma", None)
        if fg is not None and abs(fg - gamma) > 1e-6 * abs(gamma):
            raise ValueError(
                f"sweep_fused was built with gamma={fg:.6g} but this "
                f"call needs proposal_width*2.38/sqrt(2d) = {gamma:.6g}"
                " — pass the same gamma to make_fused_abcde_generation")
    cost2 = cost if cost_vectorized else _adapt_cost(cost)

    vlog = jax.vmap(lambda th: prior.logpdf_tree(prior.push_tree(th)))
    ctree = prior.push_tree if push_cost else (lambda th: th)
    if cost_vectorized:
        _vpush = jax.vmap(ctree)
        vcost = lambda ths, key: cost2(_vpush(ths), key)
    else:
        _vc = jax.vmap(lambda th, k: cost2(ctree(th), k))
        vcost = lambda ths, key: _vc(ths, jax.random.split(key, n))

    def generation(key, thetas, lps, ds, nsims):
        kb, ka2, kb2, km, kc = jax.random.split(key, 5)
        eps_l = jnp.min(ds)
        eps_h = jnp.max(ds)
        eps_pop = jnp.maximum(eps_target, eps_l + alpha * (eps_h - eps_l))

        idx = jnp.arange(n, dtype=jnp.int32)
        active = jnp.ones((n,), bool)
        if earlystop:
            active = ds > eps_target  # smc.jl:382-384

        # per-particle threshold (smc.jl:388)
        eps_i = jnp.where(ds <= eps_target, eps_target, eps_pop)

        # base selection: random not-worse particle when above threshold
        # (smc.jl:389-391). rank trick: sort ds ascending; for particle i,
        # the candidate set {j : ds[j] <= ds[i]} is exactly the first
        # count_i sorted positions with count_i = rank of ds[i] (right).
        order = jnp.argsort(ds, stable=True)
        ds_sorted = ds[order]
        # count[i] = #{j : ds[j] <= ds[i]} == searchsorted(ds_sorted,
        # ds, 'right'), but computed WITHOUT searchsorted: its binary
        # search lowers to a 15-iteration while loop of full-population
        # gathers (~1.75 ms/gen at n=16k — profiled as 60% of the
        # generation). In sorted space the count at position k is
        # (last index of k's tied run) + 1: mark run ends, suffix-min
        # the run-end positions (one cummin), scatter back through
        # `order` — one scatter instead of 15 gathers.
        karr = jnp.arange(n, dtype=jnp.int32)
        run_end = jnp.concatenate(
            [ds_sorted[1:] != ds_sorted[:-1], jnp.ones((1,), bool)])
        cand = jnp.where(run_end, karr, n - 1)
        last = jnp.flip(jax.lax.cummin(jnp.flip(cand)))
        count = jnp.zeros((n,), jnp.int32).at[order].set(last + 1)
        # ONE bits call for all per-walker index randomness (base pick +
        # two DE partners) — modulo draws, randint's bias class; the
        # per-walker split+randint constructions cost ~0.3 ms each at
        # n=16k and were ~25% of the generation (same documented
        # stream-change policy as ops/moves.py's rotation mixture)
        v = jax.random.bits(kb, (3, n), jnp.uint32)
        u = (v[0] % jnp.maximum(count, 1).astype(jnp.uint32)) \
            .astype(jnp.int32)
        s_rand = order[u]
        s = jnp.where(ds > eps_i, s_rand, idx)

        # DE partners a != s, b != a,s from the full range (smc.jl:392-399)
        aa = (v[1] % jnp.uint32(n - 1)).astype(jnp.int32)
        aa = aa + (aa >= s)
        bb = (v[2] % jnp.uint32(n - 2)).astype(jnp.int32)
        lo = jnp.minimum(aa, s)
        hi = jnp.maximum(aa, s)
        bb = bb + (bb >= lo)
        bb = bb + (bb >= hi)
        del ka2, kb2

        # ONE gather for all three partner pulls: each separate [n]
        # gather costs ~116 us of latency at n=16k regardless of size
        # (profiled), so 3 pulls x K leaves through tgather's packed
        # row gather (ops/tree.py) collapse 3K latency walls into one;
        # non-(n,) leaves (multivariate marginals) fall back per-leaf
        g3 = tgather(thetas, jnp.concatenate([s, aa, bb]))
        ts = tree_map(lambda x: x[:n], g3)
        ta = tree_map(lambda x: x[n:2 * n], g3)
        tb = tree_map(lambda x: x[2 * n:], g3)

        if sweep_fused is not None:
            # fused per-walker downstream: proposal + prior gate +
            # simulator + commit in one pallas_call (the gathers above
            # stay in XLA — they are the population-global part)
            thetas, lps, ds, gate = sweep_fused(
                kc, thetas, (ts, ta, tb), lps, ds, active, eps_i)
            nsims = nsims + gate.astype(jnp.int32)
            return thetas, lps, ds, nsims

        props = tree_map(
            lambda xs_, xa, xb: xs_ + gamma * (xa - xb), ts, ta, tb)

        lpp = jnp.asarray(vlog(props), _f32)
        lu = -jax.random.exponential(km, (n,), _f32)
        gate_prior = active & (lu <= jnp.minimum(0.0, lpp - lps))
        nsims = nsims + gate_prior.astype(jnp.int32)  # smc.jl:404 tally
        dp = jnp.asarray(vcost(props, kc), _f32)
        commit = gate_prior & (dp <= jnp.maximum(eps_i, ds))
        # double buffer: reads above used the old population; writes land
        # in the new one (smc.jl:373-375,412-414)
        thetas = tselect(commit, props, thetas)
        ds = jnp.where(commit, dp, ds)
        lps = jnp.where(commit, lpp, lps)
        return thetas, lps, ds, nsims

    from ..parallel.mesh import constrainer
    constrain = constrainer(mesh, "walker")

    def body(state):
        key, thetas, lps, ds, nsims, it = state
        key, sub = jax.random.split(key)
        thetas, lps, ds, nsims = generation(sub, thetas, lps, ds, nsims)
        thetas = constrain(thetas)
        if verbose:
            jax.debug.print(
                "ABCDE gen={it} completion={c} eps_range=({lo},{hi})",
                it=it + 1, c=jnp.mean((ds <= eps_target).astype(_f32)),
                lo=jnp.min(ds), hi=jnp.max(ds))
        return key, thetas, lps, ds, nsims, it + 1

    def cond(state):
        _, _, _, ds, _, it = state
        go = it < generations
        if earlystop:
            go = go & (jnp.max(ds) > eps_target)
        return go

    def program(key):
        kinit, kloop = jax.random.split(key)
        thetas, lps, ds, ok = _init_with_retry(
            prior, cost2, n, kinit, cost_vectorized=cost_vectorized,
            push_cost=push_cost)
        state = (kloop, thetas, lps, ds, jnp.zeros((n,), jnp.int32),
                 jnp.int32(0))
        state = jax.lax.while_loop(cond, body, state)
        _, thetas, lps, ds, nsims, it = state
        pushed = jax.vmap(prior.push_tree)(thetas)
        return pushed, ds, nsims, it, ok

    pushed, ds, nsims, it, ok = jax.jit(program)(as_key(key))
    if not bool(jnp.all(ok)):
        raise RuntimeError(
            "Prior leads to infinite costs too often; could not initialize "
            "a finite population.")
    ds_np = fetch(ds)
    return ABCDEResult(
        P=particles_from_tree(fetch_tree(pushed)),
        C=Particles(ds_np),
        reached_eps=bool(ds_np.max() <= eps_target),
        nsim=int(fetch(nsims).sum()),
        iterations=int(it),
    )
