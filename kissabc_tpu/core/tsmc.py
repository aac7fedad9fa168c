"""Adaptive tempered SMC (likelihood tempering) with evidence estimation.

Beyond-reference capability (the reference's `smc` is cost-threshold
ABC only): classical Bayesian SMC over a sequence of tempered targets

    pi_lambda(theta)  ∝  prior(theta) * exp(lambda * loglike(theta)),
    lambda: 0 -> 1,

with the next temperature chosen adaptively so the incremental-weight
effective sample size hits ``alpha * N`` (Del Moral et al. 2012; cf. the
'Optimised Annealed Sequential Monte Carlo Samplers' line of work in
PAPERS.md), systematic resampling, and ensemble-move MCMC rejuvenation
(the same red/black stretch/DE/walk mixture as AIS, targeting the
current tempered density). Produces a consistent marginal-likelihood
(evidence) estimate as a by-product:

    log Z = sum_t log ( sum_i w_i exp(dlambda_t * ll_i) / sum_i w_i ).

The classical SMC unbiasedness theorem (Del Moral 2004, Prop. 7.4.1)
requires a temperature schedule FIXED in advance; here the schedule is
chosen adaptively from the same particle set (``next_lambda``), which
introduces a bias that vanishes as the particle count grows — the
estimator is consistent, not strictly unbiased.

TPU-native: one jitted ``lax.while_loop``; the temperature search is a
fixed-iteration bisection on Kish ESS; everything batched over the
walker axis (shardable via ``mesh=`` exactly like smc).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.moves import propose_half
from ..ops.quantile import ess_weights
from ..ops.resampling import systematic
from ..ops.tree import tfloat, tgather, tselect, tree_map
from ..particles import particles_from_tree
from ..utils.hostfetch import fetch_tree
from ..utils.rng import as_key
from .density import _adapt_cost

_f32 = jnp.float32


class TSMCResult(NamedTuple):
    P: object            # posterior Particles (unweighted, post-resample)
    log_evidence: float  # marginal-likelihood estimate log Z
    lam: float           # final temperature (1.0 on success)
    iterations: int
    ess: float           # Kish ESS of the LAST incremental weights
                         # (pre-resample) — sampler-health indicator


def tsmc(prior, loglike, *, nparticles: int = 1000, alpha: float = 0.5,
         mcmc_steps: int = 3, max_iters: int = 1000,
         partner_scheme: str = "auto", mesh=None,
         loglike_vectorized: bool = False, sweep_fused=None,
         key=0) -> TSMCResult:
    """Adaptive tempered SMC.

    - ``prior``: any distribution here (incl. ``Factored``).
    - ``loglike(theta[, key])``: log-likelihood of one pushed parameter
      pack (vmapped internally).
    - ``alpha``: per-step incremental-ESS target fraction (next lambda
      solves ESS(dlambda) = alpha * N; 0.5 is standard).
    - ``mcmc_steps``: rejuvenation sweeps (red/black mixture moves) per
      temperature.
    - ``loglike_vectorized``: ``loglike(theta_batch_tree, key) -> [b]``
      evaluates the whole (pushed) batch at once — the hook for
      batched/Pallas likelihood kernels, mirroring ``cost_vectorized``
      on the ABC samplers.
    - ``sweep_fused``: a one-kernel tempered rejuvenation sweep from
      ``make_fused_tempered_sweep(prior, loglike_elementwise, ...)`` —
      replaces the split red/black rejuvenation with one pallas_call
      per half-update (proposal + prior + loglike + tempered accept
      in-kernel). Initialization still evaluates ``loglike`` on the
      XLA path, so both must describe the SAME likelihood.
    """
    if not 0 < alpha < 1:
        raise ValueError("alpha must be in (0, 1)")
    if sweep_fused is not None and mesh is not None \
            and getattr(sweep_fused, "mesh", None) is not mesh:
        raise ValueError(
            "tsmc(mesh=...) with sweep_fused needs the sweep built for "
            "the SAME mesh: make_fused_tempered_sweep(..., mesh=mesh) — "
            "a single-chip fused sweep cannot run on sharded "
            "populations")
    n = nparticles
    d = prior.nparams

    from ..parallel.mesh import constrainer
    constrain = constrainer(mesh, "walker")

    vlp = jax.vmap(lambda th: prior.logpdf_tree(prior.push_tree(th)))
    if loglike_vectorized:
        _vpush = jax.vmap(prior.push_tree)

        def vll(ths, key):
            return loglike(_vpush(ths), key)
    else:
        ll2 = _adapt_cost(loglike)
        _v = jax.vmap(lambda th, k: ll2(prior.push_tree(th), k))

        def vll(ths, key):
            b = jax.tree_util.tree_leaves(ths)[0].shape[0]
            return _v(ths, jax.random.split(key, b))

    def next_lambda(lam, ll):
        """Bisect dlam in (0, 1-lam] so Kish ESS of exp(dlam*ll) = alpha*n
        (if even the full step keeps ESS above target, jump to lam=1)."""
        target = alpha * n

        def ess_at(dlam):
            lw = dlam * ll
            lw = lw - jnp.max(lw)
            w = jnp.exp(lw)
            return ess_weights(w)

        full = 1.0 - lam

        def body(_, c):
            lo, hi = c
            mid = 0.5 * (lo + hi)
            too_low = ess_at(mid) < target  # ESS decreases with dlam
            return jnp.where(too_low, lo, mid), jnp.where(too_low, mid, hi)

        lo, hi = jax.lax.fori_loop(
            0, 40, body, (jnp.asarray(0.0, _f32), full))
        dlam = 0.5 * (lo + hi)
        return jnp.where(ess_at(full) >= target, full, dlam)

    # tempered red/black rejuvenation with the r5 shard-local halves
    # layout (see core/ais.py make_sweep_halves): the halves are two
    # separate trees (no slice / dynamic-update-slice), partner rolls go
    # through roll_walkers ppermutes on a walker mesh, and at large n
    # the rotation-scheme mixture fuses all per-walker randomness
    # (incl. the MH accept log-uniform) into one bits call. Gather-path
    # streams are byte-identical to the sliced r4 layout.
    roll_mesh = (mesh if mesh is not None
                 and "chain" not in mesh.axis_names else None)

    def rejuvenate(key, thetas, lp, ll, lam):
        """mcmc_steps red/black mixture sweeps targeting pi_lambda."""
        h = n // 2

        def half_update(key, upd, lp_u, ll_u, comp):
            kp, kl, ka = jax.random.split(key, 3)
            props, corr, lu = propose_half(kp, upd, comp, d,
                                           scheme=partner_scheme,
                                           mesh=roll_mesh, accept_lu=True)
            lpp = vlp(props)
            llp = vll(props, kl)
            old = lp_u + lam * ll_u
            new = jnp.where(jnp.isfinite(lpp), lpp + lam * llp, -jnp.inf)
            if lu is None:
                lu = -jax.random.exponential(ka, lp_u.shape, _f32)
            acc = lu <= (corr + new - old)
            upd = tselect(acc, props, upd)
            lp_u = jnp.where(acc, lpp, lp_u)
            ll_u = jnp.where(acc, llp, ll_u)
            return upd, lp_u, ll_u

        tha = tree_map(lambda x: x[:h], thetas)
        thb = tree_map(lambda x: x[h:], thetas)
        lpa, lpb = lp[:h], lp[h:]
        lla, llb = ll[:h], ll[h:]

        def sweep(c, k):
            (tha, thb), (lpa, lpb), (lla, llb) = c
            if sweep_fused is not None:
                ((tha, thb), ((lpa, lla), (lpb, llb))) = sweep_fused(
                    k, (tha, thb), ((lpa, lla), (lpb, llb)), lam)
            else:
                k1, k2 = jax.random.split(k)
                tha, lpa, lla = half_update(k1, tha, lpa, lla, thb)
                thb, lpb, llb = half_update(k2, thb, lpb, llb, tha)
            return (((constrain(tha), constrain(thb)),
                     (constrain(lpa), constrain(lpb)),
                     (constrain(lla), constrain(llb))), None)

        ((tha, thb), (lpa, lpb), (lla, llb)), _ = jax.lax.scan(
            sweep, ((tha, thb), (lpa, lpb), (lla, llb)),
            jax.random.split(key, mcmc_steps))
        thetas = tree_map(lambda a, b: jnp.concatenate([a, b]), tha, thb)
        return (thetas, jnp.concatenate([lpa, lpb]),
                jnp.concatenate([lla, llb]))

    def body(state):
        key, thetas, lp, ll, lam, logz, it, _ess = state
        key, kres, kmc = jax.random.split(key, 3)
        it = it + 1

        dlam = next_lambda(lam, ll)
        # evidence increment: log mean exp(dlam*ll) (weights are uniform
        # here because we resample every step)
        m = jnp.max(dlam * ll)
        logz = logz + m + jnp.log(jnp.mean(jnp.exp(dlam * ll - m)))
        # reweight + systematic resample back to uniform weights
        w = jnp.exp(dlam * ll - m)
        cur_ess = ess_weights(w)
        idx = systematic(kres, w)
        # one combined tgather: packs thetas+lp+ll into a single row
        # gather (per-element latency wall — see ops/tree.py)
        thetas, lp, ll = tgather((thetas, lp, ll), idx)
        lam = lam + dlam

        thetas, lp, ll = rejuvenate(kmc, thetas, lp, ll, lam)
        return (key, constrain(thetas), lp, ll, lam, logz, it, cur_ess)

    def cond(state):
        _, _, _, _, lam, _, it, _ess = state
        return (lam < 1.0) & (it < max_iters)

    def program(key):
        kinit, kll, kloop = jax.random.split(key, 3)
        thetas = jax.vmap(lambda k: tfloat(prior.sample_tree(k)))(
            jax.random.split(kinit, n))
        thetas = constrain(thetas)
        lp = jnp.asarray(vlp(thetas), _f32)
        ll = jnp.asarray(vll(thetas, kll), _f32)
        state = (kloop, thetas, lp, ll, jnp.asarray(0.0, _f32),
                 jnp.asarray(0.0, _f32), jnp.int32(0),
                 jnp.asarray(float(n), _f32))
        state = jax.lax.while_loop(cond, body, state)
        _, thetas, lp, ll, lam, logz, it, ess = state
        pushed = jax.vmap(prior.push_tree)(thetas)
        return pushed, lam, logz, it, ess

    pushed, lam, logz, it, ess = jax.jit(program)(as_key(key))
    return TSMCResult(
        P=particles_from_tree(fetch_tree(pushed)),
        log_evidence=float(logz),
        lam=float(lam),
        iterations=int(it),
        ess=float(ess),
    )
