"""Quantile particle filter — reference ``pfilter`` (``src/smc.jl:275-340``).

Repeatedly set eps to the q-quantile of costs and regenerate every particle
with cost > eps by DE-proposing from the good set until the move efficiency
``nbad/nreps`` drops below ``eff_tol``.

TPU-native redesign: the reference's unbounded ``@goto resample`` rejection
loop per bad particle (smc.jl:308-321) becomes a bounded masked
``lax.while_loop``: each round, ALL still-unfixed bad particles propose in
one batched kernel; the proposal count tally reproduces the reference's
per-attempt ``localreps`` accounting (prior-gate failures count too,
smc.jl:313-318). The good set is the pre-sweep snapshot, exactly as the
reference's fixed ``idxok`` (smc.jl:301-302).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.moves import masked_distinct
from ..ops.quantile import (masked_quantile_bisect, quantile,
                            resolve_quantile_impl)
from ..ops.tree import tfloat, tgather, tselect, tree_map
from ..particles import Particles, particles_from_tree
from ..utils.hostfetch import fetch, fetch_tree
from ..utils.rng import as_key
from .density import _adapt_cost

_f32 = jnp.float32


class PFilterResult(NamedTuple):
    P: object
    C: Particles
    eps: float
    iterations: int
    unfixed: int = 0


def _init_with_retry(prior, cost2, n, key, max_rounds=1000,
                     cost_vectorized=False, push_cost=False):
    """Init with per-particle redraw until (logpdf, cost) are finite —
    the reference's unbounded while at smc.jl:283-294, bounded here.
    ``push_cost=False`` evaluates cost on the RAW float tree, exactly the
    reference's ``cost(sample[i].x)`` (smc.jl:287-292)."""
    vlog = jax.vmap(lambda th: prior.logpdf_tree(prior.push_tree(th)))
    ctree = prior.push_tree if push_cost else (lambda th: th)

    def draw_all(k):
        kd, kc = jax.random.split(k)
        ths = jax.vmap(lambda kk: tfloat(prior.sample_tree(kk)))(
            jax.random.split(kd, n))
        lps = jnp.asarray(vlog(ths), _f32)
        if cost_vectorized:
            cs = cost2(jax.vmap(ctree)(ths), kc)
        else:
            cs = jax.vmap(lambda th, kk: cost2(ctree(th), kk))(
                ths, jax.random.split(kc, n))
        return ths, lps, jnp.asarray(cs, _f32)

    thetas, lps, cs = draw_all(key)
    ok = jnp.isfinite(lps) & jnp.isfinite(cs)

    def cond(c):
        t, _, _, _, ok, _ = c
        return (t < max_rounds) & ~jnp.all(ok)

    def body(c):
        t, th, lp, cx, ok, k = c
        k, sub = jax.random.split(k)
        nth, nlp, ncx = draw_all(sub)
        th = tselect(ok, th, nth)
        lp = jnp.where(ok, lp, nlp)
        cx = jnp.where(ok, cx, ncx)
        ok = jnp.isfinite(lp) & jnp.isfinite(cx)
        return t + 1, th, lp, cx, ok, k

    _, thetas, lps, cs, ok, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), thetas, lps, cs, ok, key))
    return thetas, lps, cs, ok


def pfilter(prior, cost, N: int, *, q: float = 0.7, eff_tol: float = 0.1,
            epstol: float = -jnp.inf, max_iters: float = jnp.inf,
            proposal_width: float = 0.75, inner_retry: int = 200,
            verbose: bool = False, parallel: bool = True,
            cost_vectorized: bool = False, mesh=None,
            cost_on: str = "raw", quantile_impl: str = "auto",
            key=0) -> PFilterResult:
    """Signature/defaults mirror the reference (smc.jl:275). ``inner_retry``
    bounds the per-sweep rejection rounds (the reference's loop is
    unbounded). ``cost_vectorized``: cost takes (theta_batch, key).
    ``mesh``: shard the population over a mesh ``walker`` axis.
    ``quantile_impl``: the per-iteration eps quantile, as in ``smc`` —
    'sort' | 'bisect' | 'auto' (auto = the O(1)-bytes/chip bisection
    when the population is sharded over >1 device; bit-identical).

    ``cost_on``: ``'raw'`` (default) evaluates the cost on the RAW float
    particle — exactly the reference, which calls ``cost(sample[i].x)`` /
    ``cost(p.x)`` un-pushed while only ``logpdf`` sees the pushed value
    (smc.jl:289,308-317); for discrete priors the simulator therefore
    receives the un-snapped float marginal. ``'pushed'`` snaps first
    (integer-valued discrete params), which is usually what a discrete
    model intends — a deliberate, documented extension
    (docs/design.md, parity notes)."""
    del parallel
    if cost_on not in ("raw", "pushed"):
        raise ValueError(f"cost_on must be 'raw' or 'pushed', got {cost_on!r}")
    push_cost = cost_on == "pushed"
    d = prior.nparams
    low_n = 4 * d
    if N * q <= low_n:
        N = math.ceil((low_n + 1) / q)
    n = N
    if resolve_quantile_impl(quantile_impl, mesh, n) == "sort":
        qfn = quantile
    else:
        def qfn(x, qq):
            return masked_quantile_bisect(x, jnp.ones(x.shape, bool), qq)
    cost2 = cost if cost_vectorized else _adapt_cost(cost)
    max_outer = 100_000 if math.isinf(max_iters) else int(max_iters) + 1

    vlog = jax.vmap(lambda th: prior.logpdf_tree(prior.push_tree(th)))
    ctree = prior.push_tree if push_cost else (lambda th: th)
    if cost_vectorized:
        _vpush = jax.vmap(ctree)
        vcost = lambda ths, key: cost2(_vpush(ths), key)
    else:
        _vc = jax.vmap(lambda th, k: cost2(ctree(th), k))
        vcost = lambda ths, key: _vc(ths, jax.random.split(key, n))

    def regen_round(key, thetas, lps, cs, good, order, active, eps):
        """One masked rejection round for all still-active bad particles
        (the body of the reference's @goto resample loop, smc.jl:308-326).
        Partner triples come from the shared masked_distinct kernel with
        the good-first ordering precomputed once per sweep."""
        kp, kw, km, kcost = jax.random.split(key, 4)
        bs, css, dss = jax.vmap(
            lambda k: masked_distinct(k, good, 3, order=order)
        )(jax.random.split(kp, n))
        w = jax.random.normal(kw, (n,), _f32) * proposal_width
        # one gather for all three partner pulls (concatenated indices —
        # each separate gather pays the per-element latency wall,
        # ops/tree.py)
        g3 = tgather(thetas, jnp.concatenate([bs, css, dss]))
        tb = tree_map(lambda x: x[:n], g3)
        tc = tree_map(lambda x: x[n:2 * n], g3)
        td = tree_map(lambda x: x[2 * n:], g3)
        props = tree_map(
            lambda xb, xc, xd: xb + (xd - xc)
            * w.reshape((n,) + (1,) * (xb.ndim - 1)),
            tb, tc, td)
        lpp = jnp.asarray(vlog(props), _f32)
        lu = -jax.random.exponential(km, (n,), _f32)
        gate_prior = lu <= jnp.minimum(0.0, lpp - lps)
        xp = jnp.asarray(vcost(props, kcost), _f32)
        gate_cost = xp <= eps
        accept = active & gate_prior & gate_cost
        thetas = tselect(accept, props, thetas)
        lps = jnp.where(accept, lpp, lps)
        cs = jnp.where(accept, xp, cs)
        nreps = jnp.sum(active)  # every attempt counts (smc.jl:313)
        return thetas, lps, cs, accept, nreps

    from ..parallel.mesh import constrainer
    constrain = constrainer(mesh, "walker")

    def outer_body(state):
        key, thetas, lps, cs, it, _eff, _eps, _unfixed, done = state
        key, ksweep = jax.random.split(key)
        it = it + 1
        eps = qfn(cs, q)
        bad = cs > eps
        good = ~bad
        order = jnp.argsort(bad, stable=True)  # good-first positions
        nbad = jnp.sum(bad)

        def inner_cond(c):
            t, active, *_ = c
            return (t < inner_retry) & jnp.any(active)

        def inner_body(c):
            t, active, th, lp, cx, reps, k = c
            k, sub = jax.random.split(k)
            th, lp, cx, fixed, nreps = regen_round(
                sub, th, lp, cx, good, order, active, eps)
            return t + 1, active & ~fixed, th, lp, cx, reps + nreps, k

        _, active, thetas, lps, cs, reps, _ = jax.lax.while_loop(
            inner_cond, inner_body,
            (jnp.int32(0), bad, thetas, lps, cs, jnp.int32(0), ksweep))

        # particles the bounded rejection loop could NOT regenerate (the
        # reference's unbounded @goto loop guarantees zero; surfaced so a
        # hard-to-hit threshold can't silently degrade the population)
        unfixed = jnp.sum(active)
        eff = nbad.astype(_f32) / jnp.maximum(reps, 1).astype(_f32)
        if verbose:
            jax.debug.print("pfilter it={it} eps={eps} eff={eff}",
                            it=it, eps=eps, eff=eff)
        done = (eff < eff_tol) | (eps < epstol) | (it > max_iters)
        return (key, constrain(thetas), constrain(lps), constrain(cs),
                it, eff, eps, unfixed, done)

    def outer_cond(state):
        *_, it, _eff, _eps, _unfixed, done = state
        return ~done & (it < max_outer)

    def program(key):
        kinit, kloop = jax.random.split(key)
        thetas, lps, cs, ok = _init_with_retry(
            prior, cost2, n, kinit, cost_vectorized=cost_vectorized,
            push_cost=push_cost)
        thetas = constrain(thetas)
        state = (kloop, thetas, lps, cs, jnp.int32(0),
                 jnp.asarray(jnp.inf, _f32), jnp.asarray(jnp.inf, _f32),
                 jnp.int32(0), jnp.asarray(False))
        state = jax.lax.while_loop(outer_cond, outer_body, state)
        _, thetas, lps, cs, it, _eff, eps, unfixed, _ = state
        pushed = jax.vmap(prior.push_tree)(thetas)
        return pushed, cs, eps, it, unfixed, ok

    pushed, cs, eps, it, unfixed, ok = jax.jit(program)(as_key(key))
    if not bool(jnp.all(ok)):
        raise RuntimeError(
            "Prior leads to infinite costs too often; could not initialize "
            "a finite population.")
    unfixed = int(unfixed)
    if unfixed:
        import warnings
        warnings.warn(
            f"pfilter: {unfixed} particle(s) still above eps after "
            f"inner_retry={inner_retry} rejection rounds in the final "
            "sweep; raise inner_retry or loosen the threshold.",
            RuntimeWarning, stacklevel=2)
    return PFilterResult(
        P=particles_from_tree(fetch_tree(pushed)),
        C=Particles(fetch(cs)),
        eps=float(eps),
        iterations=int(it),
        unfixed=unfixed,
    )
