"""JAX-native distributions subset.

The reference re-exports all of Distributions.jl to its users
(reference ``src/KissABC.jl:13-14``); the test-suite and examples exercise
exactly: Uniform, Normal, Truncated(Normal), DiscreteUniform, Beta,
NegativeBinomial, Exponential, Categorical, MultivariateNormal, Product,
plus the package's own ``Factored`` mixed-support product prior
(``src/priors.jl:10-49``). This module provides that support set as
pytree-registered dataclasses with ``sample(key, shape)`` + ``logpdf(x)``
(+ ``cdf``/``quantile`` where closed forms exist), a ``discrete`` flag
driving the ``push_p`` dtype policy (``src/types.jl:27-32``), and the
prior-tree protocol the samplers consume.

Everything is traceable: distributions can be vmapped/jitted and their
parameters may themselves be traced arrays.

Parameterization notes (kept Distributions.jl-compatible):
- ``Exponential(theta)`` is the *scale* (mean) parameterization.
- ``NegativeBinomial(r, p)``: P(X=k) = C(k+r-1, k) p^r (1-p)^k.
- ``Categorical(p)`` is 0-indexed here (Julia's is 1-indexed).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.scipy.special import betaln, gammaln, ndtr, ndtri

_f32 = jnp.float32
_NEG_INF = -jnp.inf


def _register(cls, fields):
    """Register a distribution class as a pytree with array fields."""
    def flatten(d):
        return tuple(getattr(d, f) for f in fields), None

    def unflatten(_, children):
        obj = object.__new__(cls)
        for f, c in zip(fields, children):
            object.__setattr__(obj, f, c)
        return obj

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


def dist(*fields):
    def wrap(cls):
        cls._fields = fields

        def __init__(self, *args, **kwargs):
            named = dict(zip(fields, args))
            named.update(kwargs)
            for f in fields:
                object.__setattr__(self, f, jnp.asarray(named[f], _f32))
        if "__init__" not in cls.__dict__:
            cls.__init__ = __init__

        def __repr__(self):
            inner = ", ".join(f"{f}={getattr(self, f)}" for f in fields)
            return f"{cls.__name__}({inner})"
        cls.__repr__ = __repr__
        return _register(cls, fields)
    return wrap


class Distribution:
    """Base univariate/multivariate distribution.

    ``discrete`` drives the push_p dtype policy; ``event_dim`` is 0 for
    univariate and 1 for vector-valued; ``nparams`` is the reference's
    ``length(prior)`` (priors.jl:49, types.jl:37).
    """

    discrete: bool = False
    event_dim: int = 0

    @property
    def nparams(self) -> int:
        return 1

    # --- prior-tree protocol (theta is a bare array for plain dists) ---
    def sample_tree(self, key):
        return self.sample(key)

    def logpdf_tree(self, theta):
        return self.logpdf(theta)

    def push_tree(self, theta):
        return self.push(theta)

    def push(self, x):
        """Snap a float-evolved value onto the support dtype
        (types.jl:31-32: continuous -> float, discrete -> round to Int)."""
        if self.discrete:
            return jnp.round(x).astype(jnp.int32)
        return jnp.asarray(x, _f32)

    def pdf(self, x):
        return jnp.exp(self.logpdf(x))


# --------------------------------------------------------------------------
# Continuous univariate
# --------------------------------------------------------------------------

@dist("a", "b")
class Uniform(Distribution):
    def sample(self, key, shape=()):
        return jax.random.uniform(key, shape, _f32, self.a, self.b)

    def logpdf(self, x):
        inside = (x >= self.a) & (x <= self.b)
        return jnp.where(inside, -jnp.log(self.b - self.a), _NEG_INF)

    def cdf(self, x):
        return jnp.clip((x - self.a) / (self.b - self.a), 0.0, 1.0)

    def quantile(self, q):
        return self.a + q * (self.b - self.a)


@dist("mu", "sigma")
class Normal(Distribution):
    def sample(self, key, shape=()):
        return self.mu + self.sigma * jax.random.normal(key, shape, _f32)

    def logpdf(self, x):
        z = (x - self.mu) / self.sigma
        return -0.5 * z * z - jnp.log(self.sigma) - 0.5 * math.log(2 * math.pi)

    def cdf(self, x):
        return ndtr((x - self.mu) / self.sigma)

    def quantile(self, q):
        return self.mu + self.sigma * ndtri(q)


@dist("theta")
class Exponential(Distribution):
    """Scale parameterization: mean = theta (Distributions.jl convention)."""

    def sample(self, key, shape=()):
        return self.theta * jax.random.exponential(key, shape, _f32)

    def logpdf(self, x):
        ok = x >= 0
        return jnp.where(ok, -x / self.theta - jnp.log(self.theta), _NEG_INF)

    def cdf(self, x):
        return jnp.where(x >= 0, 1.0 - jnp.exp(-x / self.theta), 0.0)

    def quantile(self, q):
        return -self.theta * jnp.log1p(-q)


@dist("alpha", "beta")
class Beta(Distribution):
    def sample(self, key, shape=()):
        return jax.random.beta(key, self.alpha, self.beta, shape, _f32)

    def logpdf(self, x):
        inside = (x >= 0) & (x <= 1)
        lx = jnp.where(inside, jnp.clip(x, 1e-37, 1.0), 0.5)
        l1x = jnp.where(inside, jnp.clip(1.0 - x, 1e-37, 1.0), 0.5)
        lp = ((self.alpha - 1) * jnp.log(lx) + (self.beta - 1) * jnp.log(l1x)
              - betaln(self.alpha, self.beta))
        return jnp.where(inside, lp, _NEG_INF)


@dist("alpha", "theta")
class Gamma(Distribution):
    """Shape ``alpha``, scale ``theta``."""

    def sample(self, key, shape=()):
        return self.theta * jax.random.gamma(key, self.alpha, shape, _f32)

    def logpdf(self, x):
        ok = x > 0
        xs = jnp.where(ok, x, 1.0)
        lp = ((self.alpha - 1) * jnp.log(xs) - xs / self.theta
              - gammaln(self.alpha) - self.alpha * jnp.log(self.theta))
        return jnp.where(ok, lp, _NEG_INF)


@dist("mu", "sigma")
class LogNormal(Distribution):
    def sample(self, key, shape=()):
        return jnp.exp(self.mu + self.sigma * jax.random.normal(key, shape, _f32))

    def logpdf(self, x):
        ok = x > 0
        xs = jnp.where(ok, x, 1.0)
        z = (jnp.log(xs) - self.mu) / self.sigma
        lp = (-0.5 * z * z - jnp.log(xs) - jnp.log(self.sigma)
              - 0.5 * math.log(2 * math.pi))
        return jnp.where(ok, lp, _NEG_INF)


class Truncated(Distribution):
    """Truncation of a base distribution with ``cdf``/``quantile`` to
    [lo, hi] — covers the reference's ``Truncated(Normal(0,0.05),0,100)``
    usage (reference ``test/runtests.jl:288``)."""

    def __init__(self, base, lo, hi):
        object.__setattr__(self, "base", base)
        object.__setattr__(self, "lo", jnp.asarray(lo, _f32))
        object.__setattr__(self, "hi", jnp.asarray(hi, _f32))

    @property
    def _clo(self):
        return self.base.cdf(self.lo)

    @property
    def _chi(self):
        return self.base.cdf(self.hi)

    def sample(self, key, shape=()):
        u = jax.random.uniform(key, shape, _f32, self._clo, self._chi)
        return jnp.clip(self.base.quantile(u), self.lo, self.hi)

    def logpdf(self, x):
        inside = (x >= self.lo) & (x <= self.hi)
        lz = jnp.log(self._chi - self._clo)
        return jnp.where(inside, self.base.logpdf(x) - lz, _NEG_INF)

    def cdf(self, x):
        c = (self.base.cdf(jnp.clip(x, self.lo, self.hi)) - self._clo)
        return c / (self._chi - self._clo)

    def quantile(self, q):
        return self.base.quantile(self._clo + q * (self._chi - self._clo))

    def __repr__(self):
        return f"Truncated({self.base!r}, {self.lo}, {self.hi})"


_register(Truncated, ("base", "lo", "hi"))


def TruncatedNormal(mu, sigma, lo, hi):
    return Truncated(Normal(mu, sigma), lo, hi)


# --------------------------------------------------------------------------
# Discrete univariate
# --------------------------------------------------------------------------

@dist("a", "b")
class DiscreteUniform(Distribution):
    discrete = True

    def __init__(self, a=0, b=1):
        object.__setattr__(self, "a", jnp.asarray(a, _f32))
        object.__setattr__(self, "b", jnp.asarray(b, _f32))

    def sample(self, key, shape=()):
        return jax.random.randint(key, shape, self.a.astype(jnp.int32),
                                  self.b.astype(jnp.int32) + 1)

    def logpdf(self, x):
        xf = jnp.asarray(x, _f32)
        inside = (xf >= self.a) & (xf <= self.b)
        return jnp.where(inside, -jnp.log(self.b - self.a + 1), _NEG_INF)


@dist("r", "p")
class NegativeBinomial(Distribution):
    """P(X=k) = C(k+r-1, k) p^r (1-p)^k  (number of failures before the
    r-th success) — Distributions.jl convention, used by the socks model
    (reference ``test/runtests.jl:50``)."""

    discrete = True

    def sample(self, key, shape=()):
        kg, kp = jax.random.split(key)
        lam = jax.random.gamma(kg, self.r, shape, _f32) * (1 - self.p) / self.p
        return jax.random.poisson(kp, lam, shape)

    def logpdf(self, x):
        xf = jnp.asarray(x, _f32)
        ok = xf >= 0
        xs = jnp.where(ok, xf, 0.0)
        lp = (gammaln(xs + self.r) - gammaln(self.r) - gammaln(xs + 1)
              + self.r * jnp.log(self.p) + xs * jnp.log1p(-self.p))
        return jnp.where(ok, lp, _NEG_INF)


@dist("lam")
class Poisson(Distribution):
    discrete = True

    def sample(self, key, shape=()):
        return jax.random.poisson(key, self.lam, shape)

    def logpdf(self, x):
        xf = jnp.asarray(x, _f32)
        ok = xf >= 0
        xs = jnp.where(ok, xf, 0.0)
        lp = xs * jnp.log(self.lam) - self.lam - gammaln(xs + 1)
        return jnp.where(ok, lp, _NEG_INF)


class Categorical(Distribution):
    """0-indexed categorical over ``len(p)`` classes (note: the Julia
    reference's Categorical is 1-indexed)."""

    discrete = True

    def __init__(self, p):
        object.__setattr__(self, "p", jnp.asarray(p, _f32))

    def sample(self, key, shape=()):
        return jax.random.categorical(key, jnp.log(self.p), shape=shape)

    def logpdf(self, x):
        xi = jnp.clip(jnp.asarray(x, jnp.int32), 0, self.p.shape[-1] - 1)
        inside = (jnp.asarray(x, _f32) >= 0) & \
                 (jnp.asarray(x, _f32) <= self.p.shape[-1] - 1)
        return jnp.where(inside, jnp.log(self.p[xi]), _NEG_INF)

    def __repr__(self):
        return f"Categorical(p={self.p})"


_register(Categorical, ("p",))


# --------------------------------------------------------------------------
# Multivariate
# --------------------------------------------------------------------------

class MvNormal(Distribution):
    """Multivariate normal. ``MvNormal(d, sigma)`` gives the zero-mean
    isotropic form used by the reference tests
    (``MultivariateNormal(4, 1.0)``, runtests.jl:186); otherwise pass a
    mean vector and either a scalar sigma or a full covariance matrix."""

    event_dim = 1

    def __init__(self, mean_or_dim, sigma_or_cov=1.0):
        if isinstance(mean_or_dim, int):
            mean = jnp.zeros((mean_or_dim,), _f32)
        else:
            mean = jnp.asarray(mean_or_dim, _f32)
        cov = jnp.asarray(sigma_or_cov, _f32)
        if cov.ndim == 0:
            cov = cov ** 2 * jnp.eye(mean.shape[0], dtype=_f32)
        elif cov.ndim == 1:
            cov = jnp.diag(cov ** 2)
        object.__setattr__(self, "mean", mean)
        object.__setattr__(self, "cov", cov)
        object.__setattr__(self, "chol", jnp.linalg.cholesky(cov))

    @property
    def nparams(self):
        return self.mean.shape[0]

    def sample(self, key, shape=()):
        d = self.mean.shape[0]
        z = jax.random.normal(key, shape + (d,), _f32)
        return self.mean + z @ self.chol.T

    def logpdf(self, x):
        d = self.mean.shape[0]
        diff = x - self.mean
        sol = jax.scipy.linalg.cho_solve((self.chol, True), diff[..., None])
        maha = jnp.sum(diff * sol[..., 0], axis=-1)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(self.chol)))
        return -0.5 * (maha + logdet + d * math.log(2 * math.pi))

    def __repr__(self):
        return f"MvNormal(d={self.mean.shape[0]})"


_register(MvNormal, ("mean", "cov", "chol"))
MultivariateNormal = MvNormal


class Product(Distribution):
    """Vector of independent univariate marginals of homogeneous support
    (all-continuous or all-discrete), sampled/evaluated as one ``[d]``
    array leaf — the Distributions.jl ``Product`` exercised at
    runtests.jl:30."""

    event_dim = 1

    def __init__(self, dists: Sequence[Distribution]):
        ds = tuple(dists)
        if len({d.discrete for d in ds}) != 1:
            raise ValueError(
                "Product requires homogeneous support; use Factored for "
                "mixed continuous/discrete parameter packs.")
        object.__setattr__(self, "dists", ds)

    @property
    def discrete(self):
        return self.dists[0].discrete

    @property
    def nparams(self):
        return len(self.dists)

    def sample(self, key, shape=()):
        keys = jax.random.split(key, len(self.dists))
        cols = [d.sample(k, shape) for d, k in zip(self.dists, keys)]
        return jnp.stack(cols, axis=-1)

    def logpdf(self, x):
        terms = [d.logpdf(x[..., i]) for i, d in enumerate(self.dists)]
        return sum(terms)

    def __repr__(self):
        return f"Product({list(self.dists)!r})"


_register(Product, ("dists",))


def IID(d: Distribution, n: int) -> Product:
    return Product([d] * n)


# --------------------------------------------------------------------------
# Factored — the reference's own mixed-support product prior
# --------------------------------------------------------------------------

class Factored(Distribution):
    """Product of N independent univariate marginals, each possibly
    continuous or discrete (reference ``src/priors.jl:10-49``). Samples are
    N-tuples of scalars; logpdf/pdf are sums/products over marginals.

    The particle pytree for a Factored prior is a tuple of leaves so each
    marginal keeps its own dtype at prior/cost evaluation while the
    proposals act on all-float shadows (SURVEY §7 'mixed dtypes')."""

    def __init__(self, *dists: Distribution):
        object.__setattr__(self, "p", tuple(dists))

    @property
    def nparams(self):
        return len(self.p)

    def rand(self, key):
        return self.sample_tree(key)

    # tuple-tree protocol ---------------------------------------------------
    def sample_tree(self, key):
        keys = jax.random.split(key, len(self.p))
        return tuple(d.sample(k) for d, k in zip(self.p, keys))

    def logpdf(self, x):
        return sum(d.logpdf(xi) for d, xi in zip(self.p, x))

    def logpdf_tree(self, theta):
        return self.logpdf(theta)

    def pdf(self, x):
        out = self.p[0].pdf(x[0])
        for d, xi in zip(self.p[1:], x[1:]):
            out = out * d.pdf(xi)
        return out

    def push_tree(self, theta):
        return tuple(d.push(xi) for d, xi in zip(self.p, theta))

    push = push_tree

    def sample(self, key, shape=()):
        if shape == ():
            return self.sample_tree(key)
        keys = jax.random.split(key, len(self.p))
        return tuple(d.sample(k, shape) for d, k in zip(self.p, keys))

    def __len__(self):
        return len(self.p)

    def __repr__(self):
        return f"Factored{self.p!r}"


_register(Factored, ("p",))


__all__ = [
    "Distribution", "Uniform", "Normal", "Exponential", "Beta", "Gamma",
    "LogNormal", "Truncated", "TruncatedNormal", "DiscreteUniform",
    "NegativeBinomial", "Poisson", "Categorical", "MvNormal",
    "MultivariateNormal", "Product", "IID", "Factored",
]
