"""Density models — the reference's L3 layer (``src/types.jl``).

Three targets, each defining the 6-function protocol the sampler drives
(types.jl:3-8): ``init_sample``, ``loglike``, ``nparams``, ``accept``,
``ld_valid``, ``push``. Log-density records (``ld``) are pytrees:

- ``ApproxKernelizedPosterior`` -> (logprior, loglikelihood)   types.jl:51-58
- ``ApproxPosterior``           -> (logprior, cost)            types.jl:84-91
- ``CommonLogDensity``          -> scalar log-density          types.jl:117-119

Accept rules are pure functions of (key, old_ld, new_ld, correction); the
reference's ``-randexp() <= lW`` draws become ``log U <= lW``
(types.jl:74,103,127). Everything is traceable and vmapped over walker
ensembles by the samplers.

Cost/simulator functions may be deterministic (``cost(theta)``) or
stochastic (``cost(theta, key)``); stochastic simulators receive an
explicit threefry key instead of the reference's implicit global RNG.
"""

from __future__ import annotations

import inspect

import jax
import jax.numpy as jnp

from ..ops.tree import tfloat
from ..utils.rng import log_uniform

_f32 = jnp.float32


def _adapt_cost(cost):
    """Wrap a user cost/log-density fn into canonical (theta, key) form."""
    try:
        n = len([p for p in inspect.signature(cost).parameters.values()
                 if p.default is inspect.Parameter.empty
                 and p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)])
    except (TypeError, ValueError):
        n = 1
    if n >= 2:
        return cost
    return lambda theta, key: cost(theta)


def _finite(x):
    return jnp.isfinite(x)


class Density:
    """Base class; concrete models fill in the protocol."""

    @property
    def nparams(self):
        raise NotImplementedError

    def loglike_batch(self, pushed, key):
        """Batched loglike over a walker ensemble (single key: the
        non-vectorized path splits it per walker; vectorized simulators
        consume it whole). Overridden by models with vectorized
        (fused/Pallas) simulators."""
        h = jax.tree_util.tree_leaves(pushed)[0].shape[0]
        return jax.vmap(self.loglike)(pushed, jax.random.split(key, h))

    def accept_batch(self, key, old_lds, new_lds, corr):
        """Batched MH accept over [h] walkers from ONE key — every accept
        rule needs exactly one log-uniform per walker, so this is a
        single batched draw instead of h key splits."""
        h = corr.shape[0]
        lu = -jax.random.exponential(key, (h,), _f32)
        return jax.vmap(self.accept_lu)(lu, old_lds, new_lds, corr)

    def accept_lu(self, lu, old_ld, new_ld, corr):
        """accept with the log-uniform draw supplied (pure, batched-safe).
        Concrete models implement this; ``accept`` wraps it."""
        raise NotImplementedError

    def accept(self, key, old_ld, new_ld, corr):
        return self.accept_lu(log_uniform(key), old_ld, new_ld, corr)

    def push(self, theta):
        """Generic densities don't snap dtypes (types.jl:27)."""
        return theta

    def init_sample(self, key):
        raise NotImplementedError

    def loglike(self, theta_pushed, key):
        raise NotImplementedError

    def ld_valid(self, ld):
        raise NotImplementedError


class ApproxKernelizedPosterior(Density):
    """ABC density with Gaussian kernel 𝒩(0, eps): loglikelihood =
    -(cost/eps)^2/2 when the prior is finite (types.jl:40-75).

    ``cost_vectorized=True`` declares that ``cost(thetas_tree, keys[n])``
    consumes a whole pushed batch at once — the hook for fused/Pallas
    simulators (ops/pallas_kernels.py); the sampler then calls
    ``loglike_batch`` instead of vmapping ``loglike``."""

    def __init__(self, prior, cost, target_average_cost,
                 cost_vectorized=False):
        self.prior = prior
        self.cost = cost if cost_vectorized else _adapt_cost(cost)
        self.vectorized = cost_vectorized
        self.scale = float(target_average_cost)

    def loglike_batch(self, pushed, key):
        if not self.vectorized:
            return Density.loglike_batch(self, pushed, key)
        lp = jax.vmap(self.prior.logpdf_tree)(pushed)
        c = self.cost(pushed, key)
        ll = jnp.where(_finite(lp), -0.5 * jnp.square(c / self.scale), lp)
        return (jnp.asarray(lp, _f32), jnp.asarray(ll, _f32))

    @property
    def nparams(self):
        return self.prior.nparams

    def push(self, theta):
        return self.prior.push_tree(theta)

    def init_sample(self, key):
        return tfloat(self.prior.sample_tree(key))

    def loglike(self, theta_pushed, key):
        lp = self.prior.logpdf_tree(theta_pushed)
        c = self.cost(theta_pushed, key)
        ll = jnp.where(_finite(lp), -0.5 * jnp.square(c / self.scale), lp)
        return (jnp.asarray(lp, _f32), jnp.asarray(ll, _f32))

    def ld_valid(self, ld):
        return _finite(ld[0] + ld[1])

    def accept_lu(self, lu, old_ld, new_ld, corr):
        lw = corr + (new_ld[0] + new_ld[1]) - (old_ld[0] + old_ld[1])
        lw = jnp.where(self.ld_valid(new_ld), lw, -jnp.inf)
        return lu <= lw


class ApproxPosterior(Density):
    """ABC density with hard threshold: accept = MH on the prior ratio AND
    new_cost <= max(maxcost, old_cost) — the ``max`` lets early particles
    anneal in from cost > eps regions (types.jl:76-104)."""

    def __init__(self, prior, cost, max_cost, cost_vectorized=False):
        self.prior = prior
        self.cost = cost if cost_vectorized else _adapt_cost(cost)
        self.vectorized = cost_vectorized
        self.maxcost = float(max_cost)

    def loglike_batch(self, pushed, key):
        if not self.vectorized:
            return Density.loglike_batch(self, pushed, key)
        lp = jax.vmap(self.prior.logpdf_tree)(pushed)
        c = jnp.where(_finite(lp),
                      jnp.asarray(self.cost(pushed, key), _f32), -lp)
        return (jnp.asarray(lp, _f32), jnp.asarray(c, _f32))

    @property
    def nparams(self):
        return self.prior.nparams

    def push(self, theta):
        return self.prior.push_tree(theta)

    def init_sample(self, key):
        return tfloat(self.prior.sample_tree(key))

    def loglike(self, theta_pushed, key):
        lp = self.prior.logpdf_tree(theta_pushed)
        c = jnp.where(_finite(lp),
                      jnp.asarray(self.cost(theta_pushed, key), _f32),
                      -lp)
        return (jnp.asarray(lp, _f32), jnp.asarray(c, _f32))

    def ld_valid(self, ld):
        return _finite(ld[0]) & _finite(ld[1])

    def accept_lu(self, lu, old_ld, new_ld, corr):
        lw = corr + new_ld[0] - old_ld[0]
        lw = jnp.where(self.ld_valid(new_ld), lw, -jnp.inf)
        gate_cost = jnp.maximum(self.maxcost, old_ld[1]) - new_ld[1] >= 0
        return (lu <= lw) & gate_cost


class CommonLogDensity(Density):
    """Classical MCMC target: user supplies nparameters, sample_init(key),
    and a log-density lpi(x) — makes AIS a general-purpose sampler
    (types.jl:105-128, e.g. the Rosenbrock banana, KissABC.jl:140-147)."""

    def __init__(self, nparameters, sample_init, lpi,
                 lpi_vectorized=False):
        self._n = int(nparameters)
        self.sample_init = sample_init
        self.lpi = lpi if lpi_vectorized else _adapt_cost(lpi)
        self.vectorized = lpi_vectorized

    def loglike_batch(self, pushed, key):
        if not self.vectorized:
            return Density.loglike_batch(self, pushed, key)
        return jnp.asarray(self.lpi(pushed, key), _f32)

    @property
    def nparams(self):
        return self._n

    def init_sample(self, key):
        return tfloat(self.sample_init(key))

    def loglike(self, theta_pushed, key):
        return jnp.asarray(self.lpi(theta_pushed, key), _f32)

    def ld_valid(self, ld):
        return _finite(ld)

    def accept_lu(self, lu, old_ld, new_ld, corr):
        lw = corr + new_ld - old_ld
        lw = jnp.where(self.ld_valid(new_ld), lw, -jnp.inf)
        return lu <= lw
