"""JAX-native distributions subset.

The reference re-exports all of Distributions.jl to its users
(reference ``src/KissABC.jl:13-14``); the test-suite and examples exercise
exactly: Uniform, Normal, Truncated(Normal), DiscreteUniform, Beta,
NegativeBinomial, Exponential, Categorical, MultivariateNormal, Product,
plus the package's own ``Factored`` mixed-support product prior
(``src/priors.jl:10-49``). This module provides that support set as
pytree-registered classes with ``sample(key, shape)`` + ``logpdf(x)``
(+ ``cdf``/``quantile`` where closed forms exist), a ``discrete`` flag
driving the ``push_p`` dtype policy (``src/types.jl:27-32``), and the
prior-tree protocol the samplers consume.

Performance-critical design rule: distribution PARAMETERS live on the
HOST (numpy scalars/arrays), and every derived constant (log-normalizers,
cdf bounds, Cholesky factors) is precomputed in ``__init__`` with
numpy/scipy. Traced methods therefore embed pure host constants — they
never create device arrays at trace time, which would stall lowering with
device->host readbacks (catastrophic over a tunneled TPU: a single
constant readback can cost seconds) and would break under vmap-of-trace.
Only the sampled/evaluated values are traced jnp math. Consequence:
parameters must be static Python/numpy values, not tracers.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln, ndtr, ndtri
from scipy import special as sps

_f32 = np.float32
# strongly-typed: mixing a weak python-float -inf into jnp.where alongside
# np.float32 branches triggers a ~10x slower XLA lowering on TPU
_NEG_INF = np.float32(-np.inf)
_LOG_2PI = math.log(2 * math.pi)


def _register(cls, fields):
    """Register a distribution class as a pytree (host-constant leaves)."""
    def flatten(d):
        # params are static host data: put everything in treedef so the
        # object hashes as a jit-static constant
        return (), tuple(getattr(d, f) for f in fields)

    def unflatten(aux, _):
        obj = object.__new__(cls)
        for f, c in zip(fields, aux):
            object.__setattr__(obj, f, c)
        if hasattr(cls, "_post_init"):
            obj._post_init()
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
                object.__setattr__(self, f, _f32(named[f]))
            if hasattr(self, "_post_init"):
                self._post_init()
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
        return jnp.asarray(x, jnp.float32)

    def pdf(self, x):
        return jnp.exp(self.logpdf(x))

    def sf(self, x):
        """Survival function 1 - cdf. This generic fallback computes the
        complement in f32, so the upper tail saturates once cdf rounds
        to 1 (~1e-7 tail mass); families with a stable closed survival
        form override it (Normal, Exponential, Weibull, ...) for
        tail-accurate values — Distributions.jl's ``ccdf`` semantics."""
        return 1.0 - self.cdf(x)

    def logsf(self, x):
        """log survival. The generic fallback floors at log(1e-37); the
        tail-accurate overrides (e.g. Exponential's exact ``-x/theta``)
        have unbounded range."""
        return jnp.log(jnp.maximum(self.sf(x), np.float32(1e-37)))


def _bisect_quantile(cdf, lo, hi, q, iters=60):
    """Invert a monotone cdf on [lo, hi] with fixed-iteration bisection —
    jit/vmap-safe quantile for distributions without a closed form."""
    q = jnp.asarray(q, jnp.float32)
    lo = jnp.broadcast_to(jnp.asarray(lo, jnp.float32), q.shape)
    hi = jnp.broadcast_to(jnp.asarray(hi, jnp.float32), q.shape)

    def body(_, c):
        lo, hi = c
        mid = 0.5 * (lo + hi)
        below = cdf(mid) < q
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return 0.5 * (lo + hi)


# --------------------------------------------------------------------------
# Continuous univariate
# --------------------------------------------------------------------------

@dist("a", "b")
class Uniform(Distribution):
    def _post_init(self):
        object.__setattr__(self, "_nll", _f32(np.log(self.b - self.a)))

    def sample(self, key, shape=()):
        return jax.random.uniform(key, shape, jnp.float32, self.a, self.b)

    def logpdf(self, x):
        inside = (x >= self.a) & (x <= self.b)
        return jnp.where(inside, -self._nll, _NEG_INF)

    def cdf(self, x):
        return jnp.clip((x - self.a) / (self.b - self.a), 0.0, 1.0)

    def quantile(self, q):
        return self.a + q * (self.b - self.a)


@dist("mu", "sigma")
class Normal(Distribution):
    def _post_init(self):
        object.__setattr__(
            self, "_lnorm", _f32(np.log(self.sigma) + 0.5 * _LOG_2PI))

    def sample(self, key, shape=()):
        return self.mu + self.sigma * jax.random.normal(key, shape)

    def logpdf(self, x):
        z = (x - self.mu) / self.sigma
        return -0.5 * z * z - self._lnorm

    def cdf(self, x):
        return ndtr((x - self.mu) / self.sigma)

    def sf(self, x):
        return ndtr(-(x - self.mu) / self.sigma)

    def logsf(self, x):
        from jax.scipy.special import log_ndtr
        return log_ndtr(-(x - self.mu) / self.sigma)

    def quantile(self, q):
        return self.mu + self.sigma * ndtri(q)


@dist("theta")
class Exponential(Distribution):
    """Scale parameterization: mean = theta (Distributions.jl convention)."""

    def _post_init(self):
        object.__setattr__(self, "_ltheta", _f32(np.log(self.theta)))

    def sample(self, key, shape=()):
        return self.theta * jax.random.exponential(key, shape)

    def logpdf(self, x):
        return jnp.where(x >= 0, -x / self.theta - self._ltheta, _NEG_INF)

    def cdf(self, x):
        return jnp.where(x >= 0, 1.0 - jnp.exp(-x / self.theta), 0.0)

    def sf(self, x):
        return jnp.exp(-jnp.maximum(x, 0.0) / self.theta)

    def logsf(self, x):
        return -jnp.maximum(x, 0.0) / self.theta

    def quantile(self, q):
        return -self.theta * jnp.log1p(-q)


@dist("alpha", "beta")
class Beta(Distribution):
    def _post_init(self):
        object.__setattr__(
            self, "_lbeta", _f32(sps.betaln(self.alpha, self.beta)))

    def sample(self, key, shape=()):
        return jax.random.beta(key, self.alpha, self.beta, shape)

    def logpdf(self, x):
        inside = (x >= 0) & (x <= 1)
        lx = jnp.where(inside, jnp.clip(x, 1e-37, 1.0), 0.5)
        l1x = jnp.where(inside, jnp.clip(1.0 - x, 1e-37, 1.0), 0.5)
        lp = ((self.alpha - 1) * jnp.log(lx) + (self.beta - 1) * jnp.log(l1x)
              - self._lbeta)
        return jnp.where(inside, lp, _NEG_INF)

    def cdf(self, x):
        from jax.scipy.special import betainc
        return betainc(self.alpha, self.beta, jnp.clip(x, 0.0, 1.0))

    def quantile(self, q):
        return _bisect_quantile(self.cdf, 0.0, 1.0, q)


@dist("alpha", "theta")
class Gamma(Distribution):
    """Shape ``alpha``, scale ``theta``."""

    def _post_init(self):
        object.__setattr__(
            self, "_lnorm",
            _f32(sps.gammaln(self.alpha) + self.alpha * np.log(self.theta)))

    def sample(self, key, shape=()):
        return self.theta * jax.random.gamma(key, self.alpha, shape)

    def logpdf(self, x):
        ok = x > 0
        xs = jnp.where(ok, x, 1.0)
        lp = (self.alpha - 1) * jnp.log(xs) - xs / self.theta - self._lnorm
        return jnp.where(ok, lp, _NEG_INF)

    def cdf(self, x):
        from jax.scipy.special import gammainc
        return gammainc(self.alpha, jnp.maximum(x, 0.0) / self.theta)

    def quantile(self, q):
        hi = self.theta * (self.alpha + 1.0
                           + 12.0 * np.sqrt(self.alpha) + 12.0)
        return _bisect_quantile(self.cdf, 0.0, hi, q)


def Erlang(k, theta=1.0):
    """Erlang(k, theta) == Gamma with integer shape
    (Distributions.jl ``Erlang``)."""
    ki = int(k)
    if ki != k or ki < 1:
        raise ValueError("Erlang needs integer k >= 1")
    return Gamma(ki, theta)


@dist("mu", "sigma")
class LogNormal(Distribution):
    def _post_init(self):
        object.__setattr__(
            self, "_lnorm", _f32(np.log(self.sigma) + 0.5 * _LOG_2PI))

    def sample(self, key, shape=()):
        return jnp.exp(self.mu + self.sigma * jax.random.normal(key, shape))

    def logpdf(self, x):
        ok = x > 0
        xs = jnp.where(ok, x, 1.0)
        z = (jnp.log(xs) - self.mu) / self.sigma
        return jnp.where(ok, -0.5 * z * z - jnp.log(xs) - self._lnorm,
                         _NEG_INF)

    def cdf(self, x):
        ok = x > 0
        xs = jnp.where(ok, x, 1.0)
        return jnp.where(ok, ndtr((jnp.log(xs) - self.mu) / self.sigma),
                         _f32(0.0))

    def sf(self, x):
        ok = x > 0
        xs = jnp.where(ok, x, 1.0)
        return jnp.where(ok, ndtr(-(jnp.log(xs) - self.mu) / self.sigma),
                         _f32(1.0))

    def logsf(self, x):
        from jax.scipy.special import log_ndtr
        ok = x > 0
        xs = jnp.where(ok, x, 1.0)
        return jnp.where(
            ok, log_ndtr(-(jnp.log(xs) - self.mu) / self.sigma), _f32(0.0))

    def quantile(self, q):
        return jnp.exp(self.mu + self.sigma * ndtri(q))


@dist("mu", "sigma")
class Laplace(Distribution):
    def _post_init(self):
        object.__setattr__(self, "_lnorm", _f32(np.log(2 * self.sigma)))

    def sample(self, key, shape=()):
        return self.mu + self.sigma * jax.random.laplace(key, shape)

    def logpdf(self, x):
        return -jnp.abs(x - self.mu) / self.sigma - self._lnorm

    def cdf(self, x):
        z = (x - self.mu) / self.sigma
        return jnp.where(z < 0, 0.5 * jnp.exp(z), 1 - 0.5 * jnp.exp(-z))

    def sf(self, x):
        z = (x - self.mu) / self.sigma
        return jnp.where(z < 0, 1 - 0.5 * jnp.exp(z), 0.5 * jnp.exp(-z))

    def logsf(self, x):
        z = (x - self.mu) / self.sigma
        zs = jnp.minimum(z, 0.0)
        return jnp.where(z < 0, jnp.log1p(-0.5 * jnp.exp(zs)),
                         _f32(np.log(0.5)) - z)

    def quantile(self, q):
        return self.mu - self.sigma * jnp.sign(q - 0.5) * jnp.log1p(
            -2 * jnp.abs(q - 0.5))


@dist("mu", "sigma")
class Cauchy(Distribution):
    def _post_init(self):
        object.__setattr__(self, "_lnorm", _f32(np.log(np.pi * self.sigma)))

    def sample(self, key, shape=()):
        return self.mu + self.sigma * jax.random.cauchy(key, shape)

    def logpdf(self, x):
        z = (x - self.mu) / self.sigma
        return -jnp.log1p(z * z) - self._lnorm

    def cdf(self, x):
        return 0.5 + jnp.arctan((x - self.mu) / self.sigma) / np.pi

    def sf(self, x):
        z = (x - self.mu) / self.sigma
        # upper tail via arctan(1/z)/pi (exact identity for z > 0) —
        # 0.5 - arctan(z)/pi cancels catastrophically for large z
        zs = jnp.where(z > 0, z, 1.0)
        return jnp.where(z > 0, jnp.arctan(1.0 / zs) / np.pi,
                         0.5 - jnp.arctan(z) / np.pi)

    def logsf(self, x):
        return jnp.log(self.sf(x))

    def quantile(self, q):
        return self.mu + self.sigma * jnp.tan(np.pi * (q - 0.5))


@dist("nu")
class StudentT(Distribution):
    """Standard Student t with nu degrees of freedom."""

    def _post_init(self):
        nu = float(self.nu)
        object.__setattr__(self, "_lnorm", _f32(
            sps.gammaln((nu + 1) / 2) - sps.gammaln(nu / 2)
            - 0.5 * np.log(nu * np.pi)))
        from scipy import stats as _st
        object.__setattr__(
            self, "_qhi", float(_st.t(nu).ppf(1.0 - 1e-7)))

    def sample(self, key, shape=()):
        return jax.random.t(key, self.nu, shape)

    def logpdf(self, x):
        nu = self.nu
        return self._lnorm - (nu + 1) / 2 * jnp.log1p(x * x / nu)

    def cdf(self, x):
        from jax.scipy.special import betainc
        # F(t) = 1 - I_{nu/(nu+t^2)}(nu/2, 1/2) / 2 for t >= 0, symmetric
        z = self.nu / (self.nu + x * x)
        tail = np.float32(0.5) * betainc(self.nu / 2, np.float32(0.5), z)
        return jnp.where(x >= 0, np.float32(1.0) - tail, tail)

    def quantile(self, q):
        return _bisect_quantile(self.cdf, -self._qhi, self._qhi, q)


# Distributions.jl's name for the standard Student t (re-export parity,
# reference KissABC.jl:13-14)
TDist = StudentT


@dist("alpha", "theta")
class Weibull(Distribution):
    """Shape ``alpha``, scale ``theta``."""

    def _post_init(self):
        object.__setattr__(self, "_lnorm", _f32(
            np.log(self.alpha) - self.alpha * np.log(self.theta)))

    def sample(self, key, shape=()):
        u = jax.random.uniform(key, shape)
        return self.theta * (-jnp.log1p(-u)) ** (1.0 / self.alpha)

    def logpdf(self, x):
        ok = x > 0
        xs = jnp.where(ok, x, 1.0)
        lp = (self._lnorm + (self.alpha - 1) * jnp.log(xs)
              - (xs / self.theta) ** self.alpha)
        return jnp.where(ok, lp, _NEG_INF)

    def cdf(self, x):
        return jnp.where(x > 0,
                         -jnp.expm1(-(jnp.maximum(x, 0) / self.theta)
                                    ** self.alpha), 0.0)

    def sf(self, x):
        return jnp.exp(self.logsf(x))

    def logsf(self, x):
        return -(jnp.maximum(x, 0.0) / self.theta) ** self.alpha

    def quantile(self, q):
        return self.theta * (-jnp.log1p(-q)) ** (1.0 / self.alpha)


@dist("nu")
class Chisq(Distribution):
    """Chi-squared with ``nu`` degrees of freedom (= Gamma(nu/2, 2))."""

    def _post_init(self):
        nu = float(self.nu)
        object.__setattr__(self, "_lnorm", _f32(
            sps.gammaln(nu / 2) + (nu / 2) * np.log(2.0)))

    def sample(self, key, shape=()):
        return jax.random.chisquare(key, self.nu, shape)

    def logpdf(self, x):
        ok = x > 0
        xs = jnp.where(ok, x, 1.0)
        lp = (self.nu / 2 - 1) * jnp.log(xs) - xs / 2 - self._lnorm
        return jnp.where(ok, lp, _NEG_INF)

    def cdf(self, x):
        from jax.scipy.special import gammainc
        return gammainc(self.nu / 2, jnp.maximum(x, 0.0) / 2)

    def quantile(self, q):
        hi = float(self.nu + 12 * np.sqrt(2 * float(self.nu)) + 12)
        return _bisect_quantile(self.cdf, 0.0, hi, q)


@dist("nu1", "nu2")
class FDist(Distribution):
    """Fisher–Snedecor F(nu1, nu2)."""

    def _post_init(self):
        n1, n2 = float(self.nu1), float(self.nu2)
        object.__setattr__(self, "_lnorm", _f32(
            sps.betaln(n1 / 2, n2 / 2) - (n1 / 2) * np.log(n1 / n2)))
        from scipy import stats as _st
        object.__setattr__(
            self, "_qhi", float(_st.f(n1, n2).ppf(1.0 - 1e-7)))

    def sample(self, key, shape=()):
        return jax.random.f(key, self.nu1, self.nu2, shape)

    def logpdf(self, x):
        n1, n2 = self.nu1, self.nu2
        ok = x > 0
        xs = jnp.where(ok, x, 1.0)
        lp = ((n1 / 2 - 1) * jnp.log(xs)
              - (n1 + n2) / 2 * jnp.log1p(n1 * xs / n2) - self._lnorm)
        return jnp.where(ok, lp, _NEG_INF)

    def cdf(self, x):
        from jax.scipy.special import betainc
        xs = jnp.maximum(x, 0.0)
        z = self.nu1 * xs / (self.nu1 * xs + self.nu2)
        return betainc(self.nu1 / 2, self.nu2 / 2, z)

    def quantile(self, q):
        return _bisect_quantile(self.cdf, 0.0, self._qhi, q)


@dist("mu", "theta")
class Logistic(Distribution):
    """Location ``mu``, scale ``theta``."""

    def _post_init(self):
        object.__setattr__(self, "_ltheta", _f32(np.log(self.theta)))

    def sample(self, key, shape=()):
        return self.mu + self.theta * jax.random.logistic(key, shape)

    def logpdf(self, x):
        z = (x - self.mu) / self.theta
        az = jnp.abs(z)
        return -az - 2.0 * jnp.log1p(jnp.exp(-az)) - self._ltheta

    def cdf(self, x):
        return jax.nn.sigmoid((x - self.mu) / self.theta)

    def sf(self, x):
        return jax.nn.sigmoid(-(x - self.mu) / self.theta)

    def logsf(self, x):
        return jax.nn.log_sigmoid(-(x - self.mu) / self.theta)

    def quantile(self, q):
        return self.mu + self.theta * (jnp.log(q) - jnp.log1p(-q))


@dist("sigma")
class Rayleigh(Distribution):
    def _post_init(self):
        object.__setattr__(self, "_l2s", _f32(2.0 * np.log(self.sigma)))

    def sample(self, key, shape=()):
        u = jax.random.uniform(key, shape)
        return self.sigma * jnp.sqrt(-2.0 * jnp.log1p(-u))

    def logpdf(self, x):
        ok = x > 0
        xs = jnp.where(ok, x, 1.0)
        z2 = (xs * xs) / (self.sigma * self.sigma)
        return jnp.where(ok, jnp.log(xs) - self._l2s - 0.5 * z2, _NEG_INF)

    def cdf(self, x):
        xs = jnp.maximum(x, 0.0)
        return -jnp.expm1(-0.5 * (xs / self.sigma) ** 2)

    def sf(self, x):
        return jnp.exp(self.logsf(x))

    def logsf(self, x):
        xs = jnp.maximum(x, 0.0)
        return -0.5 * (xs / self.sigma) ** 2

    def quantile(self, q):
        return self.sigma * jnp.sqrt(-2.0 * jnp.log1p(-q))


@dist("alpha", "theta")
class Pareto(Distribution):
    """Shape ``alpha``, scale (left edge) ``theta``; support x >= theta."""

    def _post_init(self):
        a, t = float(self.alpha), float(self.theta)
        object.__setattr__(self, "_lnorm", _f32(np.log(a) + a * np.log(t)))

    def sample(self, key, shape=()):
        u = jax.random.uniform(key, shape)
        return self.theta * jnp.exp(-jnp.log1p(-u) / self.alpha)

    def logpdf(self, x):
        ok = x >= self.theta
        xs = jnp.where(ok, x, self.theta)
        return jnp.where(ok, self._lnorm - (self.alpha + 1) * jnp.log(xs),
                         _NEG_INF)

    def cdf(self, x):
        xs = jnp.maximum(x, self.theta)
        return 1.0 - (self.theta / xs) ** self.alpha

    def sf(self, x):
        xs = jnp.maximum(x, self.theta)
        return (self.theta / xs) ** self.alpha

    def logsf(self, x):
        xs = jnp.maximum(x, self.theta)
        # host-side log(theta): no device constants at trace time
        return self.alpha * (_f32(np.log(float(self.theta))) - jnp.log(xs))

    def quantile(self, q):
        return self.theta * jnp.exp(-jnp.log1p(-q) / self.alpha)


@dist("alpha", "theta")
class InverseGamma(Distribution):
    """Shape ``alpha``, scale ``theta``: X = theta / Gamma(alpha, 1)."""

    def _post_init(self):
        a, t = float(self.alpha), float(self.theta)
        object.__setattr__(self, "_lnorm", _f32(
            sps.gammaln(a) - a * np.log(t)))
        from scipy import stats as _st
        object.__setattr__(
            self, "_qhi", float(_st.invgamma(a, scale=t).ppf(1.0 - 1e-7)))

    def sample(self, key, shape=()):
        return self.theta / jax.random.gamma(key, self.alpha, shape)

    def logpdf(self, x):
        ok = x > 0
        xs = jnp.where(ok, x, 1.0)
        lp = -(self.alpha + 1) * jnp.log(xs) - self.theta / xs - self._lnorm
        return jnp.where(ok, lp, _NEG_INF)

    def cdf(self, x):
        from jax.scipy.special import gammaincc
        xs = jnp.maximum(x, np.float32(1e-37))
        return gammaincc(self.alpha, self.theta / xs)

    def quantile(self, q):
        return _bisect_quantile(self.cdf, 0.0, self._qhi, q)


@dist("mu", "theta")
class Gumbel(Distribution):
    """Gumbel (max) with location ``mu`` and scale ``theta``
    (Distributions.jl's ``Gumbel(mu, theta)``)."""

    def _post_init(self):
        object.__setattr__(self, "_lth", _f32(np.log(self.theta)))

    def sample(self, key, shape=()):
        u = jax.random.uniform(key, shape, jnp.float32,
                               np.float32(1e-7), np.float32(1.0))
        return self.mu - self.theta * jnp.log(-jnp.log(u))

    def logpdf(self, x):
        z = (x - self.mu) / self.theta
        return -(z + jnp.exp(-z)) - self._lth

    def cdf(self, x):
        return jnp.exp(-jnp.exp(-(x - self.mu) / self.theta))

    def sf(self, x):
        # -expm1(-t) ~ t for small t: upper tail exact where cdf rounds to 1
        return -jnp.expm1(-jnp.exp(-(x - self.mu) / self.theta))

    def logsf(self, x):
        z = (x - self.mu) / self.theta
        t = jnp.exp(-z)
        # log(-expm1(-t)) = log(t) - t/2 + O(t^2) for small t — switch
        # before t underflows f32 so the far upper tail stays exact (-z)
        exact = jnp.log(jnp.maximum(-jnp.expm1(-t), _f32(1e-37)))
        return jnp.where(t < _f32(1e-4), -z - 0.5 * t, exact)

    def quantile(self, q):
        return self.mu - self.theta * jnp.log(-jnp.log(q))


@dist("a", "b", "c")
class TriangularDist(Distribution):
    """Triangular on [a, b] with mode ``c`` (Distributions.jl argument
    order: lower, upper, mode)."""

    def _post_init(self):
        a, b, c = float(self.a), float(self.b), float(self.c)
        if not a <= c <= b:
            raise ValueError("TriangularDist needs a <= c <= b")
        object.__setattr__(self, "_fc", _f32((c - a) / (b - a)))

    def sample(self, key, shape=()):
        return self.quantile(jax.random.uniform(key, shape))

    def logpdf(self, x):
        a, b, c = self.a, self.b, self.c
        l2 = np.float32(np.log(2.0))
        ok = (x >= a) & (x <= b)
        # a, b, c are host floats: endpoint-mode degeneracies branch at
        # trace time so no 0/0 (log0 - log0 = nan) can reach the graph
        if c == a:      # density 2(b-x)/(b-a)^2 on [a, b]
            num = jnp.where(ok, b - x, 1.0)
            lp = l2 + jnp.log(num) - np.float32(2.0 * np.log(b - a))
            return jnp.where(ok, lp, _NEG_INF)
        if c == b:      # density 2(x-a)/(b-a)^2 on [a, b]
            num = jnp.where(ok, x - a, 1.0)
            lp = l2 + jnp.log(num) - np.float32(2.0 * np.log(b - a))
            return jnp.where(ok, lp, _NEG_INF)
        left = (x >= a) & (x <= c)
        right = (x > c) & (x <= b)
        # guard both branch numerators so neither produces log(<=0)
        num = jnp.where(left, x - a, jnp.where(right, b - x, 1.0))
        den = jnp.where(left, (b - a) * (c - a),
                        jnp.where(right, (b - a) * (b - c), 1.0))
        lp = l2 + jnp.log(num) - jnp.log(den)
        return jnp.where(left | right, lp, _NEG_INF)

    def cdf(self, x):
        a, b, c = self.a, self.b, self.c
        xl = jnp.clip(x, a, c)
        xr = jnp.clip(x, c, b)
        low = ((xl - a) ** 2 / ((b - a) * (c - a)) if c > a
               else jnp.zeros_like(xl))
        high = (1.0 - (b - xr) ** 2 / ((b - a) * (b - c)) if b > c
                else jnp.ones_like(xr))
        return jnp.where(x < c, low, high)

    def quantile(self, q):
        a, b, c = self.a, self.b, self.c
        lo = a + jnp.sqrt(jnp.maximum(q, 0.0) * (b - a) * (c - a))
        hi = b - jnp.sqrt(jnp.maximum(1.0 - q, 0.0) * (b - a) * (b - c))
        return jnp.where(q < self._fc, lo, hi)


@dist("a", "b")
class Arcsine(Distribution):
    """Arcsine on [a, b] (Distributions.jl ``Arcsine(a, b)``): the Beta
    (1/2, 1/2) law rescaled — density 1/(pi*sqrt((x-a)(b-x)))."""

    def _post_init(self):
        a, b = float(self.a), float(self.b)
        if not a < b:
            raise ValueError("Arcsine needs a < b")
        object.__setattr__(self, "_lpi", _f32(math.log(math.pi)))
        object.__setattr__(self, "_w", _f32(b - a))

    def sample(self, key, shape=()):
        return self.quantile(jax.random.uniform(key, shape))

    def logpdf(self, x):
        inside = (x > self.a) & (x < self.b)
        num = jnp.where(inside, (x - self.a) * (self.b - x), 1.0)
        return jnp.where(inside, -self._lpi - 0.5 * jnp.log(num), _NEG_INF)

    def cdf(self, x):
        z = jnp.clip((x - self.a) / self._w, 0.0, 1.0)
        return np.float32(2.0 / math.pi) * jnp.arcsin(jnp.sqrt(z))

    def quantile(self, q):
        s = jnp.sin(np.float32(math.pi / 2.0) * q)
        return self.a + self._w * s * s


@dist("r")
class Semicircle(Distribution):
    """Wigner semicircle with radius ``r`` on [-r, r]
    (Distributions.jl ``Semicircle(r)``)."""

    def _post_init(self):
        r = float(self.r)
        if not r > 0:
            raise ValueError("Semicircle needs r > 0")
        # log normalizer of 2*sqrt(r^2-x^2)/(pi r^2)
        object.__setattr__(
            self, "_lc", _f32(math.log(2.0) - math.log(math.pi)
                              - 2.0 * math.log(r)))

    def sample(self, key, shape=()):
        # X = r*(2B - 1) with B ~ Beta(3/2, 3/2)
        b = jax.random.beta(key, np.float32(1.5), np.float32(1.5), shape)
        return self.r * (2.0 * b - 1.0)

    def logpdf(self, x):
        inside = jnp.abs(x) < self.r
        num = jnp.where(inside, self.r * self.r - x * x, 1.0)
        return jnp.where(inside, self._lc + 0.5 * jnp.log(num), _NEG_INF)

    def cdf(self, x):
        xc = jnp.clip(x, -self.r, self.r)
        z = xc / self.r
        return (0.5 + (xc * jnp.sqrt(self.r * self.r - xc * xc))
                * np.float32(1.0 / math.pi) / (self.r * self.r)
                + jnp.arcsin(z) * np.float32(1.0 / math.pi))

    def quantile(self, q):
        return _bisect_quantile(self.cdf, -float(self.r), float(self.r), q)


@dist("alpha", "theta")
class Frechet(Distribution):
    """Frechet (inverse Weibull) with shape ``alpha`` and scale ``theta``
    (Distributions.jl ``Frechet(alpha, theta)``): cdf exp(-(x/theta)^-a)."""

    def _post_init(self):
        a, th = float(self.alpha), float(self.theta)
        if not (a > 0 and th > 0):
            raise ValueError("Frechet needs alpha > 0 and theta > 0")
        object.__setattr__(self, "_lc", _f32(math.log(a) - math.log(th)))

    def sample(self, key, shape=()):
        u = jax.random.uniform(key, shape, jnp.float32,
                               np.float32(1e-7), np.float32(1.0))
        return self.quantile(u)

    def logpdf(self, x):
        ok = x > 0
        z = jnp.where(ok, x / self.theta, 1.0)
        lz = jnp.log(z)
        return jnp.where(ok, self._lc - (self.alpha + 1.0) * lz
                         - jnp.exp(-self.alpha * lz), _NEG_INF)

    def cdf(self, x):
        ok = x > 0
        z = jnp.where(ok, x / self.theta, 1.0)
        return jnp.where(ok, jnp.exp(-z ** (-self.alpha)), 0.0)

    def sf(self, x):
        ok = x > 0
        z = jnp.where(ok, x / self.theta, 1.0)
        return jnp.where(ok, -jnp.expm1(-z ** (-self.alpha)), _f32(1.0))

    def logsf(self, x):
        ok = x > 0
        z = jnp.where(ok, x / self.theta, 1.0)
        t = z ** (-self.alpha)
        exact = jnp.log(jnp.maximum(-jnp.expm1(-t), _f32(1e-37)))
        # small-t series keeps the far upper tail (t ~ z^-alpha) exact
        lsf = jnp.where(t < _f32(1e-4),
                        -self.alpha * jnp.log(z) - 0.5 * t, exact)
        return jnp.where(ok, lsf, _f32(0.0))

    def quantile(self, q):
        return self.theta * (-jnp.log(q)) ** np.float32(-1.0 /
                                                        float(self.alpha))


@dist("mu", "sigma")
class Levy(Distribution):
    """Levy with location ``mu`` and scale ``sigma``
    (Distributions.jl ``Levy(mu, sigma)``) — the stable(1/2) law on
    (mu, inf)."""

    def _post_init(self):
        if not float(self.sigma) > 0:
            raise ValueError("Levy needs sigma > 0")
        object.__setattr__(
            self, "_lc",
            _f32(0.5 * (math.log(float(self.sigma)) - _LOG_2PI)))

    def sample(self, key, shape=()):
        # X = mu + sigma / Z^2 with Z ~ N(0,1) (folded: Z^2 ~ chi^2_1)
        z = jax.random.normal(key, shape)
        return self.mu + self.sigma / (z * z)

    def logpdf(self, x):
        ok = x > self.mu
        d = jnp.where(ok, x - self.mu, 1.0)
        return jnp.where(
            ok, self._lc - 1.5 * jnp.log(d) - 0.5 * self.sigma / d,
            _NEG_INF)

    def cdf(self, x):
        from jax.scipy.special import erfc
        ok = x > self.mu
        d = jnp.where(ok, x - self.mu, 1.0)
        return jnp.where(ok, erfc(jnp.sqrt(0.5 * self.sigma / d)), 0.0)

    def quantile(self, q):
        from jax.scipy.special import erfinv
        # erfcinv(q) = erfinv(1 - q)
        e = erfinv(1.0 - q)
        return self.mu + 0.5 * self.sigma / (e * e)


class GeneralizedPareto(Distribution):
    """GPD with location ``mu``, scale ``sigma``, shape ``xi``
    (Distributions.jl ``GeneralizedPareto(mu, sigma, xi)``). The xi == 0
    (exponential-tail) case branches at trace time — xi is a host
    constant."""

    def __init__(self, mu, sigma, xi):
        if not float(sigma) > 0:
            raise ValueError("GeneralizedPareto needs sigma > 0")
        object.__setattr__(self, "mu", _f32(mu))
        object.__setattr__(self, "sigma", _f32(sigma))
        object.__setattr__(self, "xi", _f32(xi))
        self._post_init()

    def _post_init(self):
        object.__setattr__(self, "_lsg",
                           _f32(math.log(float(self.sigma))))

    def _zhi(self):
        # upper support bound in z-space: inf for xi >= 0, -1/xi below
        xi = float(self.xi)
        return np.float32(np.inf) if xi >= 0 else _f32(-1.0 / xi)

    def sample(self, key, shape=()):
        u = jax.random.uniform(key, shape, jnp.float32,
                               np.float32(0.0), np.float32(1.0 - 1e-7))
        return self.quantile(u)

    def logpdf(self, x):
        z = (x - self.mu) / self.sigma
        inside = (z >= 0) & (z < self._zhi())
        zs = jnp.where(inside, z, 0.0)
        if float(self.xi) == 0.0:
            lp = -zs - self._lsg
        else:
            lp = (-(1.0 / self.xi + 1.0) * jnp.log1p(self.xi * zs)
                  - self._lsg)
        return jnp.where(inside, lp, _NEG_INF)

    def cdf(self, x):
        z = jnp.clip((x - self.mu) / self.sigma, 0.0, self._zhi())
        if float(self.xi) == 0.0:
            return 1.0 - jnp.exp(-z)
        return 1.0 - jnp.exp(np.float32(-1.0 / float(self.xi))
                             * jnp.log1p(self.xi * z))

    def quantile(self, q):
        if float(self.xi) == 0.0:
            return self.mu - self.sigma * jnp.log1p(-q)
        return self.mu + self.sigma * jnp.expm1(
            np.float32(-float(self.xi)) * jnp.log1p(-q)) / self.xi

    def __repr__(self):
        return (f"GeneralizedPareto(mu={self.mu}, sigma={self.sigma}, "
                f"xi={self.xi})")


_register(GeneralizedPareto, ("mu", "sigma", "xi"))


@dist("a", "b")
class Kumaraswamy(Distribution):
    """Kumaraswamy on (0, 1) with shapes ``a``, ``b``
    (Distributions.jl ``Kumaraswamy(a, b)``): cdf 1 - (1 - x^a)^b."""

    def _post_init(self):
        a, b = float(self.a), float(self.b)
        if not (a > 0 and b > 0):
            raise ValueError("Kumaraswamy needs a > 0 and b > 0")
        object.__setattr__(self, "_lab",
                           _f32(math.log(a) + math.log(b)))

    def sample(self, key, shape=()):
        u = jax.random.uniform(key, shape, jnp.float32,
                               np.float32(1e-7), np.float32(1.0 - 1e-7))
        return self.quantile(u)

    def logpdf(self, x):
        inside = (x > 0) & (x < 1)
        xs = jnp.where(inside, x, 0.5)
        lp = (self._lab + (self.a - 1.0) * jnp.log(xs)
              + (self.b - 1.0) * jnp.log1p(-xs ** self.a))
        return jnp.where(inside, lp, _NEG_INF)

    def cdf(self, x):
        xc = jnp.clip(x, 0.0, 1.0)
        return 1.0 - jnp.exp(self.b * jnp.log1p(-xc ** self.a))

    def quantile(self, q):
        inv_b = np.float32(1.0 / float(self.b))
        inv_a = np.float32(1.0 / float(self.a))
        return (-jnp.expm1(inv_b * jnp.log1p(-q))) ** inv_a


class VonMises(Distribution):
    """von Mises on [mu - pi, mu + pi) with concentration ``kappa``
    (Distributions.jl ``VonMises(mu, kappa)``).

    logpdf/pdf are exact (the I0(kappa) normalizer is a host scipy
    constant). Sampling inverts a precomputed 8193-point host quantile
    table (scipy ppf) by linear interpolation — error O(1e-5) in x for
    moderate kappa, plenty below ABC tolerance scales; it keeps sampling
    a two-op gather instead of a data-dependent rejection loop (TPU
    control-flow rule)."""

    _TAB = 8193

    def __init__(self, mu, kappa):
        if not float(kappa) > 0:
            raise ValueError("VonMises needs kappa > 0")
        object.__setattr__(self, "mu", _f32(mu))
        object.__setattr__(self, "kappa", _f32(kappa))
        self._post_init()

    def _post_init(self):
        from scipy import stats as _st
        # log(2*pi*I0(kappa)) via the exponentially-scaled Bessel:
        # stable for large kappa
        object.__setattr__(
            self, "_lnorm",
            _f32(_LOG_2PI + math.log(float(sps.i0e(self.kappa)))
                 + float(self.kappa)))
        qs = np.linspace(0.0, 1.0, self._TAB)
        tab = _st.vonmises(float(self.kappa), loc=float(self.mu)).ppf(qs)
        tab[0], tab[-1] = (float(self.mu) - math.pi,
                           float(self.mu) + math.pi)
        object.__setattr__(self, "_tab", tab.astype(_f32))

    def sample(self, key, shape=()):
        u = jax.random.uniform(key, shape)
        t = u * np.float32(self._TAB - 1)
        i = jnp.clip(t.astype(jnp.int32), 0, self._TAB - 2)
        f = t - i
        lo = jnp.take(self._tab, i)
        hi = jnp.take(self._tab, i + 1)
        return lo + f * (hi - lo)

    def logpdf(self, x):
        inside = jnp.abs(x - self.mu) <= np.float32(math.pi)
        return jnp.where(inside,
                         self.kappa * jnp.cos(x - self.mu) - self._lnorm,
                         _NEG_INF)

    def quantile(self, q):
        # same linear interpolation into the host ppf table as sample()
        t = jnp.asarray(q, jnp.float32) * np.float32(self._TAB - 1)
        i = jnp.clip(t.astype(jnp.int32), 0, self._TAB - 2)
        f = t - i
        lo = jnp.take(self._tab, i)
        hi = jnp.take(self._tab, i + 1)
        return lo + f * (hi - lo)

    def cdf(self, x):
        # inverse of the monotone table (searchsorted + linear interp)
        xf = jnp.asarray(x, jnp.float32)
        xc = jnp.clip(xf, self._tab[0], self._tab[-1])
        i = jnp.clip(jnp.searchsorted(self._tab, xc, side="right") - 1,
                     0, self._TAB - 2)
        lo = jnp.take(self._tab, i)
        hi = jnp.take(self._tab, i + 1)
        f = jnp.where(hi > lo, (xc - lo) / (hi - lo), np.float32(0.0))
        return (i + f) / np.float32(self._TAB - 1)

    def __repr__(self):
        return f"VonMises(mu={self.mu}, kappa={self.kappa})"


def _vm_flatten(d):
    return (), (float(d.mu), float(d.kappa))


def _vm_unflatten(aux, _):
    obj = object.__new__(VonMises)
    object.__setattr__(obj, "mu", _f32(aux[0]))
    object.__setattr__(obj, "kappa", _f32(aux[1]))
    obj._post_init()
    return obj


jax.tree_util.register_pytree_node(VonMises, _vm_flatten, _vm_unflatten)


@dist("p")
class Bernoulli(Distribution):
    """Bernoulli success probability ``p`` (support {0, 1})."""

    discrete = True

    def _post_init(self):
        # no clamps: a degenerate Bernoulli(0)/Bernoulli(1) must assign
        # exactly -inf to the impossible outcome (the logpdf select has
        # no multiplication, so -inf is safe there)
        p = float(self.p)
        object.__setattr__(self, "_lp",
                           _f32(np.log(p)) if p > 0 else _NEG_INF)
        object.__setattr__(self, "_l1p",
                           _f32(np.log1p(-p)) if p < 1 else _NEG_INF)

    def sample(self, key, shape=()):
        return (jax.random.uniform(key, shape) < self.p).astype(jnp.int32)

    def logpdf(self, x):
        xf = jnp.asarray(x, jnp.float32)
        ok = (xf == 0) | (xf == 1)
        return jnp.where(ok, jnp.where(xf > 0.5, self._lp, self._l1p),
                         _NEG_INF)


@dist("n", "p")
class Binomial(Distribution):
    discrete = True

    def _post_init(self):
        object.__setattr__(self, "_lgn1", _f32(sps.gammaln(self.n + 1)))
        object.__setattr__(self, "_lp", _f32(np.log(max(self.p, 1e-37))))
        object.__setattr__(self, "_l1p", _f32(np.log1p(-min(self.p,
                                                            1 - 1e-7))))

    def sample(self, key, shape=()):
        nn = int(self.n)
        u = jax.random.uniform(key, shape + (nn,))
        return jnp.sum(u < self.p, axis=-1).astype(jnp.int32)

    def logpdf(self, x):
        xf = jnp.asarray(x, jnp.float32)
        inside = (xf >= 0) & (xf <= self.n)
        xs = jnp.where(inside, xf, 0.0)
        lp = (self._lgn1 - gammaln(xs + 1) - gammaln(self.n - xs + 1)
              + xs * self._lp + (self.n - xs) * self._l1p)
        return jnp.where(inside, lp, _NEG_INF)


@dist("p")
class Geometric(Distribution):
    """Number of failures before the first success: P(X=k)=p(1-p)^k."""

    discrete = True

    def _post_init(self):
        object.__setattr__(self, "_lp", _f32(np.log(self.p)))
        object.__setattr__(self, "_l1p", _f32(np.log1p(-self.p)))

    def sample(self, key, shape=()):
        u = jax.random.uniform(key, shape)
        return jnp.floor(jnp.log1p(-u) / self._l1p).astype(jnp.int32)

    def logpdf(self, x):
        xf = jnp.asarray(x, jnp.float32)
        ok = xf >= 0
        xs = jnp.where(ok, xf, 0.0)
        return jnp.where(ok, self._lp + xs * self._l1p, _NEG_INF)


@dist("n", "alpha", "beta")
class BetaBinomial(Distribution):
    """Beta-binomial: Binomial(n, p) with p ~ Beta(alpha, beta)
    (Distributions.jl ``BetaBinomial(n, alpha, beta)``)."""

    discrete = True

    def _post_init(self):
        n, a, b = float(self.n), float(self.alpha), float(self.beta)
        if not (n == int(n) and n >= 0 and a > 0 and b > 0):
            raise ValueError(
                "BetaBinomial needs integer n >= 0, alpha > 0, beta > 0")
        # log C(n,x) + betaln(x+a, n-x+b) - betaln(a, b); every
        # x-independent gammaln folds into one host constant
        object.__setattr__(
            self, "_lc",
            _f32(sps.gammaln(n + 1) - sps.betaln(a, b)
                 - sps.gammaln(n + a + b)))

    def sample(self, key, shape=()):
        kb, ku = jax.random.split(key)
        p = jax.random.beta(kb, self.alpha, self.beta, shape)
        u = jax.random.uniform(ku, shape + (int(self.n),))
        return jnp.sum(u < p[..., None], axis=-1).astype(jnp.int32)

    def logpdf(self, x):
        xf = jnp.asarray(x, jnp.float32)
        inside = (xf >= 0) & (xf <= self.n)
        xs = jnp.where(inside, xf, 0.0)
        lp = (self._lc - gammaln(xs + 1) - gammaln(self.n - xs + 1)
              + gammaln(xs + self.alpha)
              + gammaln(self.n - xs + self.beta))
        return jnp.where(inside, lp, _NEG_INF)


class Hypergeometric(Distribution):
    """Hypergeometric(s, f, n): successes drawn in ``n`` draws without
    replacement from ``s`` successes + ``f`` failures
    (Distributions.jl ``Hypergeometric(s, f, n)``). Finite support, so
    sampling is a categorical over the host-precomputed pmf table."""

    discrete = True

    def __init__(self, s, f, n):
        s, f, n = int(s), int(f), int(n)
        if s < 0 or f < 0 or not 0 <= n <= s + f:
            raise ValueError(
                "Hypergeometric needs s, f >= 0 and 0 <= n <= s + f")
        object.__setattr__(self, "s", s)
        object.__setattr__(self, "f", f)
        object.__setattr__(self, "n", n)
        self._post_init()

    def _post_init(self):
        from scipy import stats as _st
        s, f, n = self.s, self.f, self.n
        kmin, kmax = max(0, n - f), min(n, s)
        ks = np.arange(kmin, kmax + 1)
        logpmf = _st.hypergeom(s + f, s, n).logpmf(ks)
        object.__setattr__(self, "_kmin", kmin)
        object.__setattr__(self, "_kmax", kmax)
        object.__setattr__(self, "_logpmf", logpmf.astype(_f32))

    def sample(self, key, shape=()):
        idx = jax.random.categorical(key, self._logpmf, shape=shape)
        return (idx + self._kmin).astype(jnp.int32)

    def logpdf(self, x):
        xf = jnp.asarray(x, jnp.float32)
        inside = (xf >= self._kmin) & (xf <= self._kmax)
        xi = jnp.clip(jnp.asarray(x, jnp.int32) - self._kmin, 0,
                      self._kmax - self._kmin)
        return jnp.where(inside, jnp.take(self._logpmf, xi), _NEG_INF)

    def __repr__(self):
        return f"Hypergeometric(s={self.s}, f={self.f}, n={self.n})"


def _hg_flatten(d):
    return (), (d.s, d.f, d.n)


def _hg_unflatten(aux, _):
    obj = object.__new__(Hypergeometric)
    for name, v in zip(("s", "f", "n"), aux):
        object.__setattr__(obj, name, v)
    obj._post_init()
    return obj


jax.tree_util.register_pytree_node(Hypergeometric, _hg_flatten,
                                   _hg_unflatten)


@dist("mu1", "mu2")
class Skellam(Distribution):
    """Skellam: X1 - X2 with independent Poissons mu1, mu2
    (Distributions.jl ``Skellam(mu1, mu2)``). Support: all integers.

    logpdf evaluates log I_|k|(2*sqrt(mu1*mu2)) by a fixed-length
    logsumexp series (host-chosen length: the Bessel series terms peak
    near j ~ z/2, so K = z + 12*sqrt(z) + 30 covers the mass to f32
    precision) — jit-safe, no data-dependent loops."""

    discrete = True

    def _post_init(self):
        m1, m2 = float(self.mu1), float(self.mu2)
        if not (m1 > 0 and m2 > 0):
            raise ValueError("Skellam needs mu1 > 0 and mu2 > 0")
        z = 2.0 * math.sqrt(m1 * m2)
        K = int(z + 12.0 * math.sqrt(z) + 30.0)
        j = np.arange(K, dtype=np.float64)
        object.__setattr__(self, "_lzh", _f32(math.log(z / 2.0)))
        object.__setattr__(self, "_j2lzh_mlgj",
                           (2.0 * j * math.log(z / 2.0)
                            - sps.gammaln(j + 1)).astype(_f32))
        object.__setattr__(self, "_jgrid", j.astype(_f32))
        object.__setattr__(self, "_lrat",
                           _f32(0.5 * (math.log(m1) - math.log(m2))))
        object.__setattr__(self, "_msum", _f32(m1 + m2))

    def sample(self, key, shape=()):
        k1, k2 = jax.random.split(key)
        return (jax.random.poisson(k1, self.mu1, shape)
                - jax.random.poisson(k2, self.mu2, shape)).astype(jnp.int32)

    def logpdf(self, x):
        xf = jnp.asarray(x, jnp.float32)
        v = jnp.abs(xf)
        # log I_v(z) = logsumexp_j [(2j+v)log(z/2) - lgamma(j+1)
        #                           - lgamma(j+v+1)]
        lt = (self._j2lzh_mlgj + v[..., None] * self._lzh
              - gammaln(self._jgrid + v[..., None] + 1.0))
        log_iv = jax.scipy.special.logsumexp(lt, axis=-1)
        return xf * self._lrat - self._msum + log_iv


def _host_cdf(base: Distribution, x: float) -> float:
    """Host-side cdf for the truncation bounds — numpy/scipy only, so
    ``Truncated.__init__`` never touches the device."""
    x = float(x)
    if isinstance(base, Normal):
        return float(sps.ndtr((x - float(base.mu)) / float(base.sigma)))
    if isinstance(base, Uniform):
        return float(np.clip((x - base.a) / (base.b - base.a), 0.0, 1.0))
    if isinstance(base, Exponential):
        return float(-np.expm1(-max(x, 0.0) / base.theta))
    if isinstance(base, LogNormal):
        if x <= 0:
            return 0.0
        return float(sps.ndtr((np.log(x) - base.mu) / base.sigma))
    if isinstance(base, Gamma):
        return float(sps.gammainc(base.alpha, max(x, 0.0) / base.theta))
    if isinstance(base, Beta):
        return float(sps.betainc(base.alpha, base.beta,
                                 min(max(x, 0.0), 1.0)))
    # general case: the scipy twin registry (statistics.py) covers every
    # univariate family — Distributions.jl's truncated() works on all of
    # them, so ours must too (lazy import: statistics imports this module)
    from .statistics import _twin
    t = _twin(base)
    if t is not None and getattr(base, "event_dim", 0) == 0:
        return float(t.cdf(x))
    raise TypeError(f"Truncated: no host cdf for {type(base).__name__}")


def _host_sf(base: Distribution, x: float) -> float:
    """Host-side survival function 1-cdf, computed WITHOUT cancellation so
    far-upper-tail truncation windows keep full f64 precision."""
    x = float(x)
    if isinstance(base, Normal):
        return float(sps.ndtr(-(x - float(base.mu)) / float(base.sigma)))
    if isinstance(base, Uniform):
        return float(np.clip((base.b - x) / (base.b - base.a), 0.0, 1.0))
    if isinstance(base, Exponential):
        return float(np.exp(-max(x, 0.0) / base.theta))
    if isinstance(base, LogNormal):
        if x <= 0:
            return 1.0
        return float(sps.ndtr(-(np.log(x) - base.mu) / base.sigma))
    if isinstance(base, Gamma):
        return float(sps.gammaincc(base.alpha, max(x, 0.0) / base.theta))
    if isinstance(base, Beta):
        return float(1.0 - sps.betainc(base.alpha, base.beta,
                                       min(max(x, 0.0), 1.0)))
    from .statistics import _twin
    t = _twin(base)
    if t is not None and getattr(base, "event_dim", 0) == 0:
        return float(t.sf(x))
    raise TypeError(f"Truncated: no host sf for {type(base).__name__}")


def _host_frozen(base: Distribution):
    """scipy frozen equivalent of a discrete base — host pmf/cdf/tails
    for ``TruncatedDiscrete`` tabulation."""
    from scipy import stats as _st
    if isinstance(base, Poisson):
        return _st.poisson(float(base.lam))
    if isinstance(base, Binomial):
        return _st.binom(int(base.n), float(base.p))
    if isinstance(base, Geometric):  # failures before success: loc=-1
        return _st.geom(float(base.p), loc=-1)
    if isinstance(base, NegativeBinomial):
        return _st.nbinom(float(base.r), float(base.p))
    if isinstance(base, Bernoulli):
        return _st.bernoulli(float(base.p))
    if isinstance(base, DiscreteUniform):
        return _st.randint(int(base.a), int(base.b) + 1)
    if isinstance(base, BetaBinomial):
        return _st.betabinom(int(base.n), float(base.alpha),
                             float(base.beta))
    if isinstance(base, Hypergeometric):
        return _st.hypergeom(base.s + base.f, base.s, base.n)
    if isinstance(base, Skellam):
        return _st.skellam(float(base.mu1), float(base.mu2))
    raise TypeError(
        f"Truncated: no host pmf for discrete {type(base).__name__}")


class TruncatedDiscrete(Distribution):
    """Truncation of a DISCRETE base to the integers in [lo, hi]
    (inclusive, like Distributions.jl's ``truncated``). The support is
    tabulated on the host via the scipy twin of the base — an unbounded
    side is capped where the base tail mass drops below 1e-12."""

    discrete = True

    def __init__(self, base, lo, hi):
        object.__setattr__(self, "base", base)
        object.__setattr__(self, "lo", float(lo))
        object.__setattr__(self, "hi", float(hi))
        self._post_init()

    def _post_init(self):
        frozen = _host_frozen(self.base)
        klo = (int(np.ceil(self.lo)) if np.isfinite(self.lo)
               else int(frozen.ppf(1e-12)))
        khi = (int(np.floor(self.hi)) if np.isfinite(self.hi)
               else int(frozen.isf(1e-12)))
        if khi < klo:
            raise ValueError(
                f"TruncatedDiscrete({self.base!r}, {self.lo}, {self.hi}): "
                "empty integer support.")
        ks = np.arange(klo, khi + 1)
        pmf = frozen.pmf(ks)
        mass = float(pmf.sum())
        if not mass > 0.0:
            raise ValueError(
                f"TruncatedDiscrete({self.base!r}, {self.lo}, {self.hi}): "
                "the truncation window has zero probability mass.")
        with np.errstate(divide="ignore"):
            logpmf = np.log(pmf / mass)
        object.__setattr__(self, "_klo", klo)
        object.__setattr__(self, "_khi", khi)
        object.__setattr__(self, "_logpmf", logpmf.astype(_f32))
        object.__setattr__(self, "_cdf_tab",
                           np.cumsum(pmf / mass).astype(_f32))

    def sample(self, key, shape=()):
        idx = jax.random.categorical(key, self._logpmf, shape=shape)
        return (idx + self._klo).astype(jnp.int32)

    def logpdf(self, x):
        xf = jnp.asarray(x, jnp.float32)
        xr = jnp.round(xf)
        # pmf lives only on the integer atoms (match PoissonBinomial's
        # integrality guard); round (not toward-zero cast) pairs the index
        # with the correct atom for negative supports too
        inside = (xr >= self._klo) & (xr <= self._khi) & (xf == xr)
        xi = jnp.clip(xr.astype(jnp.int32) - self._klo, 0,
                      self._khi - self._klo)
        return jnp.where(inside, jnp.take(self._logpmf, xi), _NEG_INF)

    def cdf(self, x):
        xi = jnp.clip(jnp.floor(jnp.asarray(x, jnp.float32)).astype(
            jnp.int32) - self._klo, -1, self._khi - self._klo)
        tab = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                               jnp.asarray(self._cdf_tab)])
        return jnp.take(tab, xi + 1)

    def quantile(self, q):
        idx = jnp.searchsorted(jnp.asarray(self._cdf_tab),
                               jnp.asarray(q, jnp.float32))
        return (jnp.clip(idx, 0, self._khi - self._klo)
                + self._klo).astype(jnp.int32)

    def __repr__(self):
        return f"Truncated({self.base!r}, {self.lo}, {self.hi})"


def _td_flatten(d):
    return (), (d.base, d.lo, d.hi)


def _td_unflatten(aux, _):
    obj = object.__new__(TruncatedDiscrete)
    for f, c in zip(("base", "lo", "hi"), aux):
        object.__setattr__(obj, f, c)
    obj._post_init()
    return obj


jax.tree_util.register_pytree_node(TruncatedDiscrete, _td_flatten,
                                   _td_unflatten)


class Truncated(Distribution):
    """Truncation of a base distribution with a ``quantile`` to [lo, hi] —
    covers the reference's ``Truncated(Normal(0,0.05),0,100)`` usage
    (reference ``test/runtests.jl:288``). Normalization constants are
    precomputed on the host. A DISCRETE base dispatches to
    ``TruncatedDiscrete`` (host-tabulated integer support), mirroring
    Distributions.jl's ``truncated`` over discrete distributions."""

    def __new__(cls, base=None, lo=None, hi=None):
        if cls is Truncated and getattr(base, "discrete", False):
            return TruncatedDiscrete(base, lo, hi)
        return object.__new__(cls)

    def __init__(self, base, lo, hi):
        if not hasattr(base, "quantile"):
            raise TypeError(
                f"Truncated({type(base).__name__}, ...): the base needs a "
                "device-side quantile for inverse-cdf window sampling")
        object.__setattr__(self, "base", base)
        object.__setattr__(self, "lo", _f32(lo))
        object.__setattr__(self, "hi", _f32(hi))
        self._post_init()

    def _post_init(self):
        clo = _host_cdf(self.base, self.lo)
        chi = _host_cdf(self.base, self.hi)
        slo = _host_sf(self.base, self.lo)
        shi = _host_sf(self.base, self.hi)
        # the window mass in f64 from whichever tail representation keeps
        # precision: cdf values cancel catastrophically near 1 (upper
        # tail), survival values near 1 (lower tail) — pick by location
        mass = (slo - shi) if clo > 0.5 else (chi - clo)
        if not mass > 0.0:
            raise ValueError(
                f"Truncated({self.base!r}, {self.lo}, {self.hi}): the "
                "truncation window has zero probability mass (underflow); "
                "widen the window or reparameterize.")
        object.__setattr__(self, "_clo", _f32(clo))
        object.__setattr__(self, "_chi", _f32(chi))
        object.__setattr__(self, "_slo", _f32(slo))
        object.__setattr__(self, "_shi", _f32(shi))
        object.__setattr__(self, "_mass", _f32(mass))
        object.__setattr__(self, "_lz", _f32(np.log(mass)))
        # pick the sampling domain that is non-degenerate in f32: far
        # upper-tail windows collapse in cdf space (cdf -> 1.0f) but stay
        # exactly representable in survival space (tiny positives)
        object.__setattr__(self, "_use_sf", bool(_f32(chi) == _f32(clo)))

    def sample(self, key, shape=()):
        if self._use_sf:
            if self._shi == self._slo:
                raise ValueError(
                    f"{self!r}: truncation window is degenerate in float32 "
                    "in both cdf and survival space; widen the window.")
            if not isinstance(self.base, Normal):
                raise ValueError(
                    f"{self!r}: far-tail window sampling needs a precise "
                    "inverse survival function (available for Normal "
                    "bases); widen the window or standardize first.")
            # N(mu, s): quantile_sf(u) = mu - s*ndtri(u), exact for tiny u
            u = jax.random.uniform(key, shape, jnp.float32,
                                   self._shi, self._slo)
            x = self.base.mu - self.base.sigma * ndtri(u)
            return jnp.clip(x, self.lo, self.hi)
        u = jax.random.uniform(key, shape, jnp.float32, self._clo, self._chi)
        return jnp.clip(self.base.quantile(u), self.lo, self.hi)

    def logpdf(self, x):
        inside = (x >= self.lo) & (x <= self.hi)
        return jnp.where(inside, self.base.logpdf(x) - self._lz, _NEG_INF)

    def cdf(self, x):
        xc = jnp.clip(x, self.lo, self.hi)
        if self._use_sf:
            # cdf space is degenerate here (chi == clo in f32): work in
            # survival space, (S(lo) - S(x)) / mass, with a precise sf
            if not isinstance(self.base, Normal):
                raise ValueError(
                    f"{self!r}: far-tail window cdf needs a precise "
                    "survival function (available for Normal bases).")
            from jax.scipy.special import erfc
            z = (xc - self.base.mu) / self.base.sigma
            sf = np.float32(0.5) * erfc(z / np.float32(np.sqrt(2.0)))
            return jnp.clip((self._slo - sf) / self._mass, 0.0, 1.0)
        return jnp.clip((self.base.cdf(xc) - self._clo) / self._mass,
                        0.0, 1.0)

    def quantile(self, q):
        if self._use_sf:
            if not isinstance(self.base, Normal):
                raise ValueError(
                    f"{self!r}: far-tail window quantile needs a precise "
                    "inverse survival function (available for Normal "
                    "bases).")
            # S(x) = slo - q*mass, x = mu - sigma*ndtri(S(x))
            u = self._slo - q * self._mass
            return jnp.clip(self.base.mu - self.base.sigma * ndtri(u),
                            self.lo, self.hi)
        return jnp.clip(self.base.quantile(self._clo + q * self._mass),
                        self.lo, self.hi)

    def __repr__(self):
        return f"Truncated({self.base!r}, {self.lo}, {self.hi})"


_register(Truncated, ("base", "lo", "hi"))


def TruncatedNormal(mu, sigma, lo, hi):
    return Truncated(Normal(mu, sigma), lo, hi)


class Mixture(Distribution):
    """Finite mixture of same-kind univariate components
    (Distributions.jl's ``MixtureModel(components, weights)``; alias
    ``MixtureModel``). All components must agree on ``discrete``;
    weights default to uniform and are renormalized.

    Sampling draws every component once and selects by a categorical
    index — static shapes, no data-dependent branching (TPU control-flow
    rule); the K-fold oversampling is irrelevant for the small K of
    practical mixture priors."""

    def __init__(self, components, weights=None):
        components = tuple(components)
        if not components:
            raise ValueError("Mixture needs at least one component")
        if len({bool(c.discrete) for c in components}) != 1:
            raise ValueError(
                "Mixture components must all be discrete or all continuous")
        if any(getattr(c, "event_dim", 0) != 0 for c in components):
            raise ValueError(
                "Mixture supports univariate components only (the "
                "select-sampling reshape assumes scalar events)")
        if weights is None:
            weights = np.full(len(components), 1.0 / len(components))
        w = np.asarray(weights, np.float64)
        if w.shape != (len(components),) or (w < 0).any() or w.sum() <= 0:
            raise ValueError("Mixture weights must be nonnegative, one per "
                             "component, with positive sum")
        object.__setattr__(self, "components", components)
        object.__setattr__(self, "weights", (w / w.sum()).astype(_f32))
        self._post_init()

    def _post_init(self):
        object.__setattr__(self, "discrete",
                           bool(self.components[0].discrete))
        with np.errstate(divide="ignore"):
            object.__setattr__(self, "_logw",
                               np.log(self.weights).astype(_f32))

    def sample(self, key, shape=()):
        kk, kc = jax.random.split(key)
        idx = jax.random.categorical(kk, self._logw, shape=shape)
        draws = jnp.stack([c.sample(k, shape) for c, k in zip(
            self.components,
            jax.random.split(kc, len(self.components)))])
        out = jnp.take_along_axis(
            draws.reshape(len(self.components), -1),
            idx.reshape(1, -1), axis=0).reshape(shape)
        return out.astype(jnp.int32) if self.discrete else out

    def logpdf(self, x):
        lps = jnp.stack([lw + c.logpdf(x)
                         for lw, c in zip(self._logw, self.components)])
        return jax.scipy.special.logsumexp(lps, axis=0)

    def cdf(self, x):
        return sum(w * c.cdf(x)
                   for w, c in zip(self.weights, self.components))

    def quantile(self, q):
        if self.discrete:
            raise NotImplementedError(
                "Mixture.quantile is available for continuous mixtures")
        # bracket bounds are derived host constants — computed once and
        # memoized (never per call, and never inside a trace: the
        # component quantiles here are eager device ops + readbacks,
        # which the CLAUDE.md tunnel rule forbids at trace time)
        if not hasattr(self, "_qbounds"):
            los = [float(c.quantile(np.float32(1e-6)))
                   for c in self.components]
            his = [float(c.quantile(np.float32(1.0 - 1e-6)))
                   for c in self.components]
            object.__setattr__(self, "_qbounds", (min(los), max(his)))
        lo, hi = self._qbounds
        return _bisect_quantile(self.cdf, lo, hi, q)

    def __repr__(self):
        return (f"Mixture({list(self.components)!r}, "
                f"weights={self.weights})")


MixtureModel = Mixture


class Affine(Distribution):
    """loc + scale * base for a CONTINUOUS univariate base —
    Distributions.jl's location-scale idiom ``a + b * dist``. Also
    reachable through operator sugar: ``2 + 3 * ka.Exponential(1.0)``.
    scale may be negative (the support flips)."""

    def __init__(self, loc, scale, base):
        if getattr(base, "discrete", False):
            raise ValueError("Affine supports continuous bases only")
        if getattr(base, "event_dim", 0) != 0:
            raise ValueError("Affine supports univariate bases only")
        if float(scale) == 0.0:
            raise ValueError("Affine needs scale != 0")
        object.__setattr__(self, "loc", _f32(loc))
        object.__setattr__(self, "scale", _f32(scale))
        object.__setattr__(self, "base", base)
        self._post_init()

    def _post_init(self):
        object.__setattr__(self, "_labs",
                           _f32(np.log(abs(float(self.scale)))))

    def _z(self, x):
        return (x - self.loc) / self.scale

    def sample(self, key, shape=()):
        return self.loc + self.scale * self.base.sample(key, shape)

    def logpdf(self, x):
        return self.base.logpdf(self._z(x)) - self._labs

    def cdf(self, x):
        c = self.base.cdf(self._z(x))
        return c if float(self.scale) > 0 else 1.0 - c

    def quantile(self, q):
        q = q if float(self.scale) > 0 else 1.0 - jnp.asarray(
            q, jnp.float32)
        return self.loc + self.scale * self.base.quantile(q)

    def __repr__(self):
        return f"({self.loc} + {self.scale} * {self.base!r})"


def _aff_flatten(d):
    return (), (float(d.loc), float(d.scale), d.base)


def _aff_unflatten(aux, _):
    obj = object.__new__(Affine)
    object.__setattr__(obj, "loc", _f32(aux[0]))
    object.__setattr__(obj, "scale", _f32(aux[1]))
    object.__setattr__(obj, "base", aux[2])
    obj._post_init()
    return obj


jax.tree_util.register_pytree_node(Affine, _aff_flatten, _aff_unflatten)


def _affine_of(base, loc=0.0, scale=1.0):
    """Compose affine transforms without nesting Affine-of-Affine."""
    if isinstance(base, Affine):
        return Affine(loc + scale * float(base.loc),
                      scale * float(base.scale), base.base)
    return Affine(loc, scale, base)


def _dist_add(self, other):
    return _affine_of(self, loc=float(other))


def _dist_mul(self, other):
    return _affine_of(self, scale=float(other))


def _dist_neg(self):
    return _affine_of(self, scale=-1.0)


def _dist_sub(self, other):      # dist - c
    return _affine_of(self, loc=-float(other))


def _dist_rsub(self, other):     # c - dist
    return _affine_of(self, loc=float(other), scale=-1.0)


Distribution.__add__ = _dist_add
Distribution.__radd__ = _dist_add
Distribution.__mul__ = _dist_mul
Distribution.__rmul__ = _dist_mul
Distribution.__neg__ = _dist_neg
Distribution.__sub__ = _dist_sub
Distribution.__rsub__ = _dist_rsub


def _mix_flatten(d):
    return (), (d.components, d.weights.tobytes(), d.weights.shape)


def _mix_unflatten(aux, _):
    obj = object.__new__(Mixture)
    object.__setattr__(obj, "components", aux[0])
    object.__setattr__(obj, "weights",
                       np.frombuffer(aux[1], dtype=_f32).reshape(aux[2]))
    obj._post_init()
    return obj


jax.tree_util.register_pytree_node(Mixture, _mix_flatten, _mix_unflatten)


# --------------------------------------------------------------------------
# Discrete univariate
# --------------------------------------------------------------------------

@dist("a", "b")
class DiscreteUniform(Distribution):
    discrete = True

    def __init__(self, a=0, b=1):
        object.__setattr__(self, "a", _f32(a))
        object.__setattr__(self, "b", _f32(b))
        self._post_init()

    def _post_init(self):
        object.__setattr__(self, "_lpmf", _f32(np.log(self.b - self.a + 1)))

    def sample(self, key, shape=()):
        return jax.random.randint(key, shape, int(self.a), int(self.b) + 1)

    def logpdf(self, x):
        inside = (x >= self.a) & (x <= self.b)
        return jnp.where(inside, -self._lpmf, _NEG_INF)


@dist("r", "p")
class NegativeBinomial(Distribution):
    """P(X=k) = C(k+r-1, k) p^r (1-p)^k  (number of failures before the
    r-th success) — Distributions.jl convention, used by the socks model
    (reference ``test/runtests.jl:50``)."""

    discrete = True

    def _post_init(self):
        object.__setattr__(self, "_lgr", _f32(sps.gammaln(self.r)))
        object.__setattr__(self, "_rlp", _f32(self.r * np.log(self.p)))
        object.__setattr__(self, "_l1p", _f32(np.log1p(-self.p)))

    def sample(self, key, shape=()):
        kg, kp = jax.random.split(key)
        lam = jax.random.gamma(kg, self.r, shape) * (1 - self.p) / self.p
        return jax.random.poisson(kp, lam, shape)

    def logpdf(self, x):
        xf = jnp.asarray(x, jnp.float32)
        ok = xf >= 0
        xs = jnp.where(ok, xf, 0.0)
        lp = (gammaln(xs + self.r) - self._lgr - gammaln(xs + 1)
              + self._rlp + xs * self._l1p)
        return jnp.where(ok, lp, _NEG_INF)


@dist("lam")
class Poisson(Distribution):
    discrete = True

    def _post_init(self):
        object.__setattr__(self, "_llam", _f32(np.log(self.lam)))

    def sample(self, key, shape=()):
        return jax.random.poisson(key, self.lam, shape)

    def logpdf(self, x):
        xf = jnp.asarray(x, jnp.float32)
        ok = xf >= 0
        xs = jnp.where(ok, xf, 0.0)
        return jnp.where(ok, xs * self._llam - self.lam - gammaln(xs + 1),
                         _NEG_INF)


class Categorical(Distribution):
    """0-indexed categorical over ``len(p)`` classes (note: the Julia
    reference's Categorical is 1-indexed)."""

    discrete = True

    def __init__(self, p):
        object.__setattr__(self, "p", np.asarray(p, _f32))
        self._post_init()

    def _post_init(self):
        object.__setattr__(
            self, "_logp",
            np.log(np.clip(self.p, np.finfo(_f32).tiny, None)).astype(_f32))

    def sample(self, key, shape=()):
        return jax.random.categorical(key, self._logp, shape=shape)

    def logpdf(self, x):
        k = self.p.shape[-1]
        xi = jnp.clip(jnp.asarray(x, jnp.int32), 0, k - 1)
        xf = jnp.asarray(x, jnp.float32)
        inside = (xf >= 0) & (xf <= k - 1)
        lp = jnp.take(self._logp, xi, axis=-1)
        pos = jnp.take(self.p, xi, axis=-1) > 0
        return jnp.where(inside & pos, lp, _NEG_INF)

    def __repr__(self):
        return f"Categorical(p={self.p})"


def _cat_flatten(d):
    return (), (d.p.tobytes(), d.p.shape)


def _cat_unflatten(aux, _):
    obj = object.__new__(Categorical)
    object.__setattr__(obj, "p",
                       np.frombuffer(aux[0], dtype=_f32).reshape(aux[1]))
    obj._post_init()
    return obj


jax.tree_util.register_pytree_node(Categorical, _cat_flatten, _cat_unflatten)


# --------------------------------------------------------------------------
# Multivariate
# --------------------------------------------------------------------------

class MvNormal(Distribution):
    """Multivariate normal. ``MvNormal(d, sigma)`` gives the zero-mean
    isotropic form used by the reference tests
    (``MultivariateNormal(4, 1.0)``, runtests.jl:186); otherwise pass a
    mean vector and either a scalar sigma or a full covariance matrix.
    Cholesky/log-det are precomputed on the host."""

    event_dim = 1

    def __init__(self, mean_or_dim, sigma_or_cov=1.0):
        if isinstance(mean_or_dim, int):
            mean = np.zeros((mean_or_dim,), _f32)
        else:
            mean = np.asarray(mean_or_dim, _f32)
        cov = np.asarray(sigma_or_cov, np.float64)
        if cov.ndim == 0:
            cov = cov ** 2 * np.eye(mean.shape[0])
        elif cov.ndim == 1:
            cov = np.diag(cov ** 2)
        object.__setattr__(self, "mean", mean)
        object.__setattr__(self, "cov", cov.astype(_f32))
        self._post_init()

    def _post_init(self):
        chol = np.linalg.cholesky(np.asarray(self.cov, np.float64))
        object.__setattr__(self, "chol", chol.astype(_f32))
        # inverse taken from the FLOAT64 factor before the f32 cast;
        # the remaining accuracy gap vs an on-device triangular solve is
        # the f32 matmul itself, which costs ~kappa(chol) ulps in the
        # Mahalanobis term — acceptable for reasonably conditioned
        # covariances, and the matmul is batch-shape agnostic where
        # solve_triangular refuses mixed batch ranks
        object.__setattr__(self, "_cholinv",
                           np.linalg.inv(chol).astype(_f32))
        object.__setattr__(
            self, "_logdet", _f32(2.0 * np.sum(np.log(np.diag(chol)))))

    @property
    def nparams(self):
        return self.mean.shape[0]

    def sample(self, key, shape=()):
        d = self.mean.shape[0]
        z = jax.random.normal(key, shape + (d,))
        return self.mean + z @ self.chol.T

    def logpdf(self, x):
        d = self.mean.shape[0]
        diff = x - self.mean
        # host-precomputed chol^-1 as a matmul: batch-shape agnostic
        # (solve_triangular refuses mixed batch ranks)
        sol = jnp.einsum("ij,...j->...i", self._cholinv, diff)
        maha = jnp.sum(sol * sol, axis=-1)
        return -0.5 * (maha + self._logdet + d * _LOG_2PI)

    def __repr__(self):
        return f"MvNormal(d={self.mean.shape[0]})"


def _mvn_flatten(d):
    return (), (d.mean.tobytes(), d.mean.shape, d.cov.tobytes())


def _mvn_unflatten(aux, _):
    obj = object.__new__(MvNormal)
    mean = np.frombuffer(aux[0], dtype=_f32).reshape(aux[1])
    n = mean.shape[0]
    object.__setattr__(obj, "mean", mean)
    object.__setattr__(obj, "cov",
                       np.frombuffer(aux[2], dtype=_f32).reshape((n, n)))
    obj._post_init()
    return obj


jax.tree_util.register_pytree_node(MvNormal, _mvn_flatten, _mvn_unflatten)
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


def _prod_flatten(d):
    return (), d.dists


def _prod_unflatten(aux, _):
    obj = object.__new__(Product)
    object.__setattr__(obj, "dists", tuple(aux))
    return obj


jax.tree_util.register_pytree_node(Product, _prod_flatten, _prod_unflatten)


def IID(d: Distribution, n: int) -> Product:
    return Product([d] * n)


class Dirichlet(Distribution):
    """Dirichlet over the (k-1)-simplex; ``alpha`` is a host vector.
    Re-export parity with Distributions.jl (reference KissABC.jl:13-14)."""

    event_dim = 1

    def __init__(self, alpha):
        a = np.asarray(alpha, _f32)
        if a.ndim == 0:
            raise ValueError("Dirichlet needs a concentration vector")
        object.__setattr__(self, "alpha", a)
        self._post_init()

    def _post_init(self):
        a = np.asarray(self.alpha, np.float64)
        object.__setattr__(self, "_lnorm", _f32(
            np.sum(sps.gammaln(a)) - sps.gammaln(np.sum(a))))

    @property
    def nparams(self):
        return self.alpha.shape[0]

    def sample(self, key, shape=()):
        return jax.random.dirichlet(key, self.alpha, shape)

    def logpdf(self, x):
        inside = jnp.all(x > 0, axis=-1) & \
            (jnp.abs(jnp.sum(x, axis=-1) - 1.0) < np.float32(1e-4))
        xs = jnp.clip(x, np.float32(1e-37), 1.0)
        lp = jnp.sum((self.alpha - 1.0) * jnp.log(xs), axis=-1) - self._lnorm
        return jnp.where(inside, lp, _NEG_INF)

    def __repr__(self):
        return f"Dirichlet(alpha={self.alpha})"


def _dir_flatten(d):
    return (), (d.alpha.tobytes(), d.alpha.shape)


def _dir_unflatten(aux, _):
    obj = object.__new__(Dirichlet)
    object.__setattr__(obj, "alpha",
                       np.frombuffer(aux[0], dtype=_f32).reshape(aux[1]))
    obj._post_init()
    return obj


jax.tree_util.register_pytree_node(Dirichlet, _dir_flatten, _dir_unflatten)


class Multinomial(Distribution):
    """Multinomial(n, p): counts over ``len(p)`` classes summing to n.
    Re-export parity with Distributions.jl (reference KissABC.jl:13-14).
    Note: float-evolved count vectors are pushed per-component
    (round-half-even); vectors whose pushed sum != n get logpdf -inf, so
    off-simplex proposals are rejected by the prior gate."""

    discrete = True
    event_dim = 1

    def __init__(self, n, p):
        object.__setattr__(self, "n", int(n))
        object.__setattr__(self, "p", np.asarray(p, _f32))
        self._post_init()

    def _post_init(self):
        p = np.asarray(self.p, np.float64)
        p = p / p.sum()
        logp = np.full(p.shape, -np.inf)
        np.log(p, out=logp, where=p > 0)
        object.__setattr__(self, "_pnorm", p.astype(_f32))
        object.__setattr__(self, "_logp", logp.astype(_f32))
        object.__setattr__(self, "_lgn1", _f32(sps.gammaln(self.n + 1)))

    @property
    def nparams(self):
        return self.p.shape[0]

    def sample(self, key, shape=()):
        k = self._pnorm.shape[0]
        return jax.random.multinomial(
            key, np.float32(self.n), self._pnorm, shape=shape + (k,))

    def logpdf(self, x):
        xf = jnp.asarray(x, jnp.float32)
        ok = jnp.all(xf >= 0, axis=-1) & \
            (jnp.abs(jnp.sum(xf, axis=-1) - self.n) < np.float32(0.5)) & \
            jnp.all((self._pnorm > 0) | (xf == 0), axis=-1)
        xs = jnp.maximum(xf, 0.0)
        logp = jnp.where(self._pnorm > 0, self._logp, 0.0)
        lp = (self._lgn1 - jnp.sum(gammaln(xs + 1.0), axis=-1)
              + jnp.sum(xs * logp, axis=-1))
        return jnp.where(ok, lp, _NEG_INF)

    def __repr__(self):
        return f"Multinomial(n={self.n}, p={self.p})"


def _multi_flatten(d):
    return (), (d.n, d.p.tobytes(), d.p.shape)


def _multi_unflatten(aux, _):
    obj = object.__new__(Multinomial)
    object.__setattr__(obj, "n", aux[0])
    object.__setattr__(obj, "p",
                       np.frombuffer(aux[1], dtype=_f32).reshape(aux[2]))
    obj._post_init()
    return obj


jax.tree_util.register_pytree_node(Multinomial, _multi_flatten,
                                   _multi_unflatten)


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


def _fact_flatten(d):
    return (), d.p


def _fact_unflatten(aux, _):
    obj = object.__new__(Factored)
    object.__setattr__(obj, "p", tuple(aux))
    return obj


jax.tree_util.register_pytree_node(Factored, _fact_flatten, _fact_unflatten)


# --------------------------------------------------------------------------
# Tier-4 continuous univariate (re-export breadth toward Distributions.jl,
# reference ``src/KissABC.jl:13-14`` re-exports the whole package)
# --------------------------------------------------------------------------

@dist("a", "b")
class LogUniform(Distribution):
    """LogUniform(a, b), 0 < a < b (Distributions.jl ``LogUniform``):
    log X ~ Uniform(log a, log b)."""

    def _post_init(self):
        a, b = float(self.a), float(self.b)
        if not (0 < a < b):
            raise ValueError("LogUniform needs 0 < a < b")
        object.__setattr__(self, "_la", _f32(math.log(a)))
        object.__setattr__(self, "_lr", _f32(math.log(b) - math.log(a)))
        object.__setattr__(self, "_llr",
                           _f32(math.log(math.log(b) - math.log(a))))

    def sample(self, key, shape=()):
        u = jax.random.uniform(key, shape)
        return jnp.exp(self._la + u * self._lr)

    def logpdf(self, x):
        inside = (x >= self.a) & (x <= self.b)
        xs = jnp.where(inside, x, 1.0)
        return jnp.where(inside, -jnp.log(xs) - self._llr, _NEG_INF)

    def cdf(self, x):
        xc = jnp.clip(x, self.a, self.b)
        return (jnp.log(xc) - self._la) / self._lr

    def quantile(self, q):
        return jnp.exp(self._la + q * self._lr)


@dist("mu", "sigma")
class SymTriangularDist(Distribution):
    """Symmetric triangular on [mu - sigma, mu + sigma]
    (Distributions.jl ``SymTriangularDist(mu, sigma)``)."""

    def _post_init(self):
        if not float(self.sigma) > 0:
            raise ValueError("SymTriangularDist needs sigma > 0")
        object.__setattr__(self, "_ls", _f32(math.log(float(self.sigma))))

    def sample(self, key, shape=()):
        # difference of two uniforms is symmetric triangular on [-1, 1]
        u = jax.random.uniform(key, shape + (2,))
        return self.mu + self.sigma * (u[..., 0] - u[..., 1])

    def logpdf(self, x):
        z = jnp.abs(x - self.mu) / self.sigma
        inside = z <= 1.0
        zs = jnp.where(inside, jnp.minimum(z, np.float32(1 - 1e-7)), 0.0)
        return jnp.where(inside, jnp.log1p(-zs) - self._ls, _NEG_INF)

    def cdf(self, x):
        z = jnp.clip((x - self.mu) / self.sigma, -1.0, 1.0)
        lower = 0.5 * (1.0 + z) ** 2
        upper = 1.0 - 0.5 * (1.0 - z) ** 2
        return jnp.where(z < 0, lower, upper)

    def quantile(self, q):
        z = jnp.where(q < 0.5, jnp.sqrt(2.0 * q) - 1.0,
                      1.0 - jnp.sqrt(2.0 * jnp.maximum(1.0 - q, 0.0)))
        return self.mu + self.sigma * z


@dist("mu", "sigma")
class Cosine(Distribution):
    """Raised-cosine on [mu - sigma, mu + sigma]
    (Distributions.jl ``Cosine(mu, sigma)``):
    pdf (1 + cos(pi z)) / (2 sigma)."""

    def _post_init(self):
        if not float(self.sigma) > 0:
            raise ValueError("Cosine needs sigma > 0")
        object.__setattr__(self, "_l2s",
                           _f32(math.log(2.0 * float(self.sigma))))

    def sample(self, key, shape=()):
        u = jax.random.uniform(key, shape)
        return self.quantile(u)

    def logpdf(self, x):
        z = (x - self.mu) / self.sigma
        inside = jnp.abs(z) <= 1.0
        zs = jnp.where(inside, z, 0.0)
        p1 = jnp.maximum(1.0 + jnp.cos(np.float32(math.pi) * zs), 1e-37)
        return jnp.where(inside, jnp.log(p1) - self._l2s, _NEG_INF)

    def cdf(self, x):
        z = jnp.clip((x - self.mu) / self.sigma, -1.0, 1.0)
        return 0.5 * (1.0 + z + jnp.sin(np.float32(math.pi) * z)
                      / np.float32(math.pi))

    def quantile(self, q):
        zlo = _f32(self.mu - self.sigma)
        zhi = _f32(self.mu + self.sigma)
        return _bisect_quantile(self.cdf, zlo, zhi, q)


class _PolyKernel(Distribution):
    """Shared base for the polynomial smoothing-kernel distributions
    (Epanechnikov/Biweight/Triweight, Distributions.jl names) on
    [mu - sigma, mu + sigma]: pdf c/sigma * (1 - z^2)^m."""

    _m = 1       # exponent
    _c = 0.75    # normalizer of (1-z^2)^m on [-1, 1]

    def _post_init(self):
        if not float(self.sigma) > 0:
            raise ValueError(f"{type(self).__name__} needs sigma > 0")
        object.__setattr__(
            self, "_lc",
            _f32(math.log(self._c) - math.log(float(self.sigma))))

    def sample(self, key, shape=()):
        u = jax.random.uniform(key, shape)
        return self.quantile(u)

    def logpdf(self, x):
        z = (x - self.mu) / self.sigma
        inside = jnp.abs(z) <= 1.0
        zs = jnp.where(inside, z, 0.0)
        base = jnp.maximum(1.0 - zs * zs, 1e-37)
        return jnp.where(inside,
                         self._lc + np.float32(self._m) * jnp.log(base),
                         _NEG_INF)

    def _cdf_z(self, z):
        raise NotImplementedError

    def cdf(self, x):
        z = jnp.clip((x - self.mu) / self.sigma, -1.0, 1.0)
        return self._cdf_z(z)

    def quantile(self, q):
        return _bisect_quantile(self.cdf, _f32(self.mu - self.sigma),
                                _f32(self.mu + self.sigma), q)


@dist("mu", "sigma")
class Epanechnikov(_PolyKernel):
    """Epanechnikov kernel: pdf 3/(4 sigma) (1 - z^2)."""

    _m, _c = 1, 0.75

    def _cdf_z(self, z):
        return 0.5 + 0.25 * (3.0 * z - z ** 3)

    def sample(self, key, shape=()):
        # exact: the median of three iid U(-1,1) is Epanechnikov
        u = jax.random.uniform(key, shape + (3,), jnp.float32, -1.0, 1.0)
        return self.mu + self.sigma * jnp.median(u, axis=-1)


@dist("mu", "sigma")
class Biweight(_PolyKernel):
    """Biweight (quartic) kernel: pdf 15/(16 sigma) (1 - z^2)^2."""

    _m, _c = 2, 15.0 / 16.0

    def _cdf_z(self, z):
        return 0.5 + np.float32(15.0 / 16.0) * (
            z - 2.0 * z ** 3 / 3.0 + z ** 5 / 5.0)


@dist("mu", "sigma")
class Triweight(_PolyKernel):
    """Triweight kernel: pdf 35/(32 sigma) (1 - z^2)^3."""

    _m, _c = 3, 35.0 / 32.0

    def _cdf_z(self, z):
        return 0.5 + np.float32(35.0 / 32.0) * (
            z - z ** 3 + 3.0 * z ** 5 / 5.0 - z ** 7 / 7.0)


@dist("xi", "lam", "gamma", "delta")
class JohnsonSU(Distribution):
    """Johnson S_U (Distributions.jl ``JohnsonSU(xi, lambda, gamma,
    delta)``): X = xi + lambda * sinh((Z - gamma) / delta), Z ~ N(0,1)."""

    def _post_init(self):
        lam, dl = float(self.lam), float(self.delta)
        if not (lam > 0 and dl > 0):
            raise ValueError("JohnsonSU needs lambda > 0 and delta > 0")
        object.__setattr__(
            self, "_lc",
            _f32(math.log(dl) - math.log(lam) - 0.5 * _LOG_2PI))

    def sample(self, key, shape=()):
        z = jax.random.normal(key, shape)
        return self.xi + self.lam * jnp.sinh((z - self.gamma) / self.delta)

    def _r(self, x):
        z = (x - self.xi) / self.lam
        return z, self.gamma + self.delta * jnp.arcsinh(z)

    def logpdf(self, x):
        z, r = self._r(x)
        return self._lc - 0.5 * jnp.log1p(z * z) - 0.5 * r * r

    def cdf(self, x):
        return ndtr(self._r(x)[1])

    def quantile(self, q):
        return self.xi + self.lam * jnp.sinh(
            (ndtri(q) - self.gamma) / self.delta)


class GeneralizedExtremeValue(Distribution):
    """GEV with location ``mu``, scale ``sigma``, shape ``xi``
    (Distributions.jl ``GeneralizedExtremeValue(mu, sigma, xi)``). The
    xi == 0 (Gumbel) case branches at trace time — xi is a host
    constant."""

    def __init__(self, mu, sigma, xi):
        if not float(sigma) > 0:
            raise ValueError("GeneralizedExtremeValue needs sigma > 0")
        object.__setattr__(self, "mu", _f32(mu))
        object.__setattr__(self, "sigma", _f32(sigma))
        object.__setattr__(self, "xi", _f32(xi))
        self._post_init()

    def _post_init(self):
        object.__setattr__(self, "_lsg",
                           _f32(math.log(float(self.sigma))))

    def _inside(self, z):
        xi = float(self.xi)
        if xi == 0.0:
            return jnp.full(jnp.shape(z), True)
        if xi > 0:
            return z > _f32(-1.0 / xi)
        return z < _f32(-1.0 / xi)

    def sample(self, key, shape=()):
        u = jax.random.uniform(key, shape, jnp.float32,
                               np.float32(1e-7), np.float32(1.0 - 1e-7))
        return self.quantile(u)

    def logpdf(self, x):
        z = (x - self.mu) / self.sigma
        inside = self._inside(z)
        zs = jnp.where(inside, z, 0.0)
        if float(self.xi) == 0.0:
            lp = -zs - jnp.exp(-zs) - self._lsg
        else:
            # log t = -(1/xi) log1p(xi z); log pdf = (xi+1) log t - t - log s
            lt = np.float32(-1.0 / float(self.xi)) * jnp.log1p(self.xi * zs)
            lp = (self.xi + 1.0) * lt - jnp.exp(lt) - self._lsg
        return jnp.where(inside, lp, _NEG_INF)

    def cdf(self, x):
        z = (x - self.mu) / self.sigma
        if float(self.xi) == 0.0:
            return jnp.exp(-jnp.exp(-z))
        inside = self._inside(z)
        zs = jnp.where(inside, z, 0.0)
        t = jnp.exp(np.float32(-1.0 / float(self.xi))
                    * jnp.log1p(self.xi * zs))
        c = jnp.exp(-t)
        lower_is_0 = float(self.xi) > 0
        return jnp.where(inside, c,
                         np.float32(0.0) if lower_is_0 else np.float32(1.0))

    def quantile(self, q):
        if float(self.xi) == 0.0:
            return self.mu - self.sigma * jnp.log(-jnp.log(q))
        return self.mu + self.sigma * jnp.expm1(
            np.float32(-float(self.xi)) * jnp.log(-jnp.log(q))) / self.xi

    def __repr__(self):
        return (f"GeneralizedExtremeValue(mu={self.mu}, "
                f"sigma={self.sigma}, xi={self.xi})")


_register(GeneralizedExtremeValue, ("mu", "sigma", "xi"))


def NormalCanon(eta, lam):
    """Canonical-form normal (Distributions.jl ``NormalCanon(eta,
    lambda)``): precision ``lam``, potential ``eta`` — equals
    Normal(eta/lam, 1/sqrt(lam))."""
    lam = float(lam)
    if not lam > 0:
        raise ValueError("NormalCanon needs lambda > 0")
    return Normal(float(eta) / lam, lam ** -0.5)


@dist("mu", "lam")
class InverseGaussian(Distribution):
    """Inverse Gaussian / Wald with mean ``mu`` and shape ``lam``
    (Distributions.jl ``InverseGaussian(mu, lambda)``)."""

    def _post_init(self):
        mu, lam = float(self.mu), float(self.lam)
        if not (mu > 0 and lam > 0):
            raise ValueError("InverseGaussian needs mu > 0 and lambda > 0")
        from scipy import stats as _st
        object.__setattr__(
            self, "_lc", _f32(0.5 * (math.log(lam) - _LOG_2PI)))
        object.__setattr__(
            self, "_qhi",
            _f32(float(_st.invgauss(mu / lam, scale=lam).ppf(1 - 1e-9))))

    def sample(self, key, shape=()):
        # Michael–Schucany–Haas transform: exact, no rejection loop
        kz, ku = jax.random.split(key)
        nu = jax.random.normal(kz, shape) ** 2
        mu, lam = self.mu, self.lam
        x1 = (mu + mu * mu * nu / (2.0 * lam)
              - mu / (2.0 * lam)
              * jnp.sqrt(4.0 * mu * lam * nu + (mu * nu) ** 2))
        x1 = jnp.maximum(x1, np.float32(1e-30))  # f32 cancellation guard
        u = jax.random.uniform(ku, shape)
        return jnp.where(u < mu / (mu + x1), x1, mu * mu / x1)

    def logpdf(self, x):
        ok = x > 0
        xs = jnp.where(ok, x, 1.0)
        lp = (self._lc - 1.5 * jnp.log(xs)
              - self.lam * (xs - self.mu) ** 2
              / (2.0 * self.mu ** 2 * xs))
        return jnp.where(ok, lp, _NEG_INF)

    def cdf(self, x):
        from jax.scipy.special import log_ndtr
        ok = x > 0
        xs = jnp.where(ok, x, 1.0)
        r = jnp.sqrt(self.lam / xs)
        a = ndtr(r * (xs / self.mu - 1.0))
        # exp(2 lam/mu) overflows alone; fold it into the log-cdf term
        b = jnp.exp(2.0 * self.lam / self.mu
                    + log_ndtr(-r * (xs / self.mu + 1.0)))
        return jnp.where(ok, a + b, np.float32(0.0))

    def quantile(self, q):
        return _bisect_quantile(self.cdf, 0.0, self._qhi, q)


@dist("nu")
class Chi(Distribution):
    """Chi distribution with ``nu`` degrees of freedom
    (Distributions.jl ``Chi(nu)``): the square root of a Chisq(nu)."""

    def _post_init(self):
        nu = float(self.nu)
        if not nu > 0:
            raise ValueError("Chi needs nu > 0")
        from scipy import stats as _st
        object.__setattr__(
            self, "_lc",
            _f32(-(0.5 * nu - 1.0) * math.log(2.0) - sps.gammaln(0.5 * nu)))
        object.__setattr__(self, "_qhi",
                           _f32(float(_st.chi(nu).ppf(1 - 1e-9))))

    def sample(self, key, shape=()):
        return jnp.sqrt(2.0 * jax.random.gamma(
            key, np.float32(0.5 * float(self.nu)), shape))

    def logpdf(self, x):
        ok = x > 0
        xs = jnp.where(ok, x, 1.0)
        lp = (self.nu - 1.0) * jnp.log(xs) - 0.5 * xs * xs + self._lc
        return jnp.where(ok, lp, _NEG_INF)

    def cdf(self, x):
        from jax.scipy.special import gammainc
        xs = jnp.maximum(x, 0.0)
        return gammainc(np.float32(0.5 * float(self.nu)), 0.5 * xs * xs)

    def quantile(self, q):
        return _bisect_quantile(self.cdf, 0.0, self._qhi, q)


@dist("alpha", "beta")
class BetaPrime(Distribution):
    """Beta prime (Distributions.jl ``BetaPrime(alpha, beta)``):
    X = Y/(1-Y) with Y ~ Beta(alpha, beta)."""

    def _post_init(self):
        a, b = float(self.alpha), float(self.beta)
        if not (a > 0 and b > 0):
            raise ValueError("BetaPrime needs alpha > 0 and beta > 0")
        from scipy import stats as _st
        object.__setattr__(self, "_lbeta", _f32(sps.betaln(a, b)))
        object.__setattr__(self, "_qhi",
                           _f32(float(_st.betaprime(a, b).ppf(1 - 1e-7))))

    def sample(self, key, shape=()):
        y = jax.random.beta(key, self.alpha, self.beta, shape)
        y = jnp.clip(y, 1e-7, 1.0 - 1e-7)
        return y / (1.0 - y)

    def logpdf(self, x):
        ok = x > 0
        xs = jnp.where(ok, x, 1.0)
        lp = ((self.alpha - 1.0) * jnp.log(xs)
              - (self.alpha + self.beta) * jnp.log1p(xs) - self._lbeta)
        return jnp.where(ok, lp, _NEG_INF)

    def cdf(self, x):
        from jax.scipy.special import betainc
        xs = jnp.maximum(x, 0.0)
        return betainc(self.alpha, self.beta, xs / (1.0 + xs))

    def quantile(self, q):
        return _bisect_quantile(self.cdf, 0.0, self._qhi, q)


@dist("mu", "alpha", "p")
class PGeneralizedGaussian(Distribution):
    """p-generalized Gaussian / exponential power
    (Distributions.jl ``PGeneralizedGaussian(mu, alpha, p)``):
    pdf p/(2 alpha Gamma(1/p)) exp(-|z|^p)."""

    def _post_init(self):
        a, p = float(self.alpha), float(self.p)
        if not (a > 0 and p > 0):
            raise ValueError("PGeneralizedGaussian needs alpha > 0, p > 0")
        from scipy import stats as _st
        object.__setattr__(
            self, "_lc",
            _f32(math.log(p) - math.log(2.0 * a) - sps.gammaln(1.0 / p)))
        object.__setattr__(self, "_inv_p", _f32(1.0 / p))
        object.__setattr__(
            self, "_zhi", _f32(float(_st.gennorm(p).ppf(1 - 1e-9))))

    def sample(self, key, shape=()):
        kg, ks = jax.random.split(key)
        g = jax.random.gamma(kg, self._inv_p, shape)
        s = jax.random.rademacher(ks, shape).astype(jnp.float32)
        return self.mu + self.alpha * s * g ** self._inv_p

    def logpdf(self, x):
        z = jnp.abs((x - self.mu) / self.alpha)
        return self._lc - z ** self.p

    def cdf(self, x):
        from jax.scipy.special import gammainc
        z = (x - self.mu) / self.alpha
        half_tail = 0.5 * gammainc(self._inv_p, jnp.abs(z) ** self.p)
        return 0.5 + jnp.sign(z) * half_tail

    def quantile(self, q):
        lo = _f32(self.mu - self.alpha * self._zhi)
        hi = _f32(self.mu + self.alpha * self._zhi)
        return _bisect_quantile(self.cdf, lo, hi, q)


@dist("nu", "sigma")
class Rician(Distribution):
    """Rician (Distributions.jl ``Rician(nu, sigma)``): the norm of a
    2-D normal with mean radius ``nu``. logpdf uses the exponentially
    scaled Bessel i0e, so it is stable at large x*nu/sigma^2."""

    def _post_init(self):
        nu, sg = float(self.nu), float(self.sigma)
        if not (nu >= 0 and sg > 0):
            raise ValueError("Rician needs nu >= 0 and sigma > 0")
        from scipy import stats as _st
        object.__setattr__(self, "_l2sg", _f32(2.0 * math.log(sg)))
        # cdf via X^2/sigma^2 ~ NoncentralChisq(2, nu^2/sigma^2): Poisson
        # mixture series, host weights truncated at 1e-12 tail mass
        half = nu * nu / (2.0 * sg * sg)
        kmax = int(_st.poisson(half).ppf(1 - 1e-12)) + 3 if half > 0 else 1
        ks = np.arange(kmax)
        lw = (_st.poisson(half).logpmf(ks) if half > 0
              else np.zeros(1))
        object.__setattr__(self, "_w", np.exp(lw).astype(_f32))
        object.__setattr__(self, "_shapes", (1.0 + ks).astype(_f32))
        object.__setattr__(
            self, "_qhi",
            _f32(float(_st.rice(nu / sg, scale=sg).ppf(1 - 1e-9))
                 if nu > 0 else
                 float(_st.rayleigh(scale=sg).ppf(1 - 1e-9))))

    def sample(self, key, shape=()):
        z = jax.random.normal(key, shape + (2,))
        sg = self.sigma
        return jnp.sqrt((self.nu + sg * z[..., 0]) ** 2
                        + (sg * z[..., 1]) ** 2)

    def logpdf(self, x):
        from jax.scipy.special import i0e
        ok = x > 0
        xs = jnp.where(ok, x, 1.0)
        s2 = self.sigma ** 2
        t = xs * self.nu / s2
        # log I0(t) = log i0e(t) + t
        lp = (jnp.log(xs) - self._l2sg
              - (xs * xs + self.nu ** 2) / (2.0 * s2)
              + jnp.log(i0e(t)) + t)
        return jnp.where(ok, lp, _NEG_INF)

    def cdf(self, x):
        from jax.scipy.special import gammainc
        xs = jnp.maximum(x, 0.0)
        z = (xs * xs / (2.0 * self.sigma ** 2))[..., None]
        return jnp.sum(self._w * gammainc(self._shapes, z), axis=-1)

    def quantile(self, q):
        return _bisect_quantile(self.cdf, 0.0, self._qhi, q)


@dist("theta")
class Lindley(Distribution):
    """Lindley (Distributions.jl ``Lindley(theta)``): the mixture
    theta/(1+theta) Exp(1/theta) + 1/(1+theta) Gamma(2, 1/theta);
    pdf theta^2/(1+theta) (1+x) exp(-theta x)."""

    def _post_init(self):
        th = float(self.theta)
        if not th > 0:
            raise ValueError("Lindley needs theta > 0")
        object.__setattr__(
            self, "_lc", _f32(2.0 * math.log(th) - math.log1p(th)))
        object.__setattr__(self, "_wexp", _f32(th / (1.0 + th)))
        object.__setattr__(self, "_qhi", _f32(60.0 / th))

    def sample(self, key, shape=()):
        ku, ke = jax.random.split(key)
        e = jax.random.exponential(ke, shape + (2,))
        u = jax.random.uniform(ku, shape)
        # Exp(1)/theta w.p. theta/(1+theta), else (Exp+Exp)/theta
        extra = jnp.where(u < self._wexp, 0.0, e[..., 1])
        return (e[..., 0] + extra) / self.theta

    def logpdf(self, x):
        ok = x >= 0
        xs = jnp.where(ok, x, 0.0)
        return jnp.where(ok, self._lc + jnp.log1p(xs) - self.theta * xs,
                         _NEG_INF)

    def cdf(self, x):
        xs = jnp.maximum(x, 0.0)
        th = self.theta
        return 1.0 - (1.0 + th * xs / (1.0 + th)) * jnp.exp(-th * xs)

    def quantile(self, q):
        return _bisect_quantile(self.cdf, 0.0, self._qhi, q)


@dist("mu", "sigma")
class LogitNormal(Distribution):
    """Logit-normal on (0, 1) (Distributions.jl ``LogitNormal(mu,
    sigma)``): logit(X) ~ Normal(mu, sigma)."""

    def _post_init(self):
        if not float(self.sigma) > 0:
            raise ValueError("LogitNormal needs sigma > 0")
        object.__setattr__(
            self, "_lnorm",
            _f32(math.log(float(self.sigma)) + 0.5 * _LOG_2PI))

    def sample(self, key, shape=()):
        y = self.mu + self.sigma * jax.random.normal(key, shape)
        return jax.nn.sigmoid(y)

    def logpdf(self, x):
        inside = (x > 0) & (x < 1)
        xs = jnp.where(inside, jnp.clip(x, 1e-7, 1.0 - 1e-7), 0.5)
        lgt = jnp.log(xs) - jnp.log1p(-xs)
        z = (lgt - self.mu) / self.sigma
        lp = -0.5 * z * z - self._lnorm - jnp.log(xs) - jnp.log1p(-xs)
        return jnp.where(inside, lp, _NEG_INF)

    def cdf(self, x):
        xc = jnp.clip(x, 1e-7, 1.0 - 1e-7)
        lgt = jnp.log(xc) - jnp.log1p(-xc)
        c = ndtr((lgt - self.mu) / self.sigma)
        return jnp.where(x <= 0, np.float32(0.0),
                         jnp.where(x >= 1, np.float32(1.0), c))

    def quantile(self, q):
        return jax.nn.sigmoid(self.mu + self.sigma * ndtri(q))


@dist("nu", "lam")
class NoncentralChisq(Distribution):
    """Noncentral chi-squared (Distributions.jl ``NoncentralChisq(nu,
    lambda)``). Sampling is exact via the Poisson-Gamma mixture
    X = 2 Gamma(nu/2 + K), K ~ Poisson(lambda/2) (the Gamma shape is a
    traced array — no rejection loop). logpdf/cdf evaluate the Poisson
    mixture series with host-precomputed weights truncated at 1e-12
    tail mass, avoiding the fractional-order Bessel JAX lacks."""

    def _post_init(self):
        nu, lam = float(self.nu), float(self.lam)
        if not (nu > 0 and lam >= 0):
            raise ValueError("NoncentralChisq needs nu > 0, lambda >= 0")
        from scipy import stats as _st
        half = lam / 2.0
        kmax = int(_st.poisson(half).ppf(1 - 1e-12)) + 3 if half > 0 else 1
        ks = np.arange(kmax)
        lw = _st.poisson(half).logpmf(ks) if half > 0 else np.zeros(1)
        shapes = nu / 2.0 + ks
        # log w_k - a_k log 2 - lgamma(a_k): everything but the x terms
        object.__setattr__(
            self, "_ck",
            (lw - shapes * math.log(2.0)
             - sps.gammaln(shapes)).astype(_f32))
        object.__setattr__(self, "_shapes", shapes.astype(_f32))
        object.__setattr__(self, "_lw", lw.astype(_f32))
        object.__setattr__(
            self, "_qhi", _f32(float(_st.ncx2(nu, lam).ppf(1 - 1e-9))
                               if lam > 0 else
                               float(_st.chi2(nu).ppf(1 - 1e-9))))

    def sample(self, key, shape=()):
        kp, kg = jax.random.split(key)
        half = np.float32(float(self.lam) / 2.0)
        if float(self.lam) > 0:
            k = jax.random.poisson(kp, half, shape).astype(jnp.float32)
        else:
            k = jnp.zeros(shape, jnp.float32)
        a = np.float32(float(self.nu) / 2.0) + k
        return 2.0 * jax.random.gamma(kg, a)

    def logpdf(self, x):
        ok = x > 0
        xs = jnp.where(ok, x, 1.0)
        lx = jnp.log(xs)[..., None]
        terms = self._ck + (self._shapes - 1.0) * lx
        lp = jax.nn.logsumexp(terms, axis=-1) - 0.5 * xs
        return jnp.where(ok, lp, _NEG_INF)

    def cdf(self, x):
        from jax.scipy.special import gammainc
        xs = jnp.maximum(x, 0.0)[..., None]
        g = gammainc(self._shapes, 0.5 * xs)
        return jnp.sum(jnp.exp(self._lw) * g, axis=-1)

    def quantile(self, q):
        return _bisect_quantile(self.cdf, 0.0, self._qhi, q)


# --------------------------------------------------------------------------
# Tier-4 discrete
# --------------------------------------------------------------------------

class Dirac(Distribution):
    """Point mass at ``value`` (Distributions.jl ``Dirac``). Discrete in
    the measure-theoretic sense; ``push`` snaps any float-evolved
    proposal back onto the atom (round-to-int would be wrong for float
    atoms), keeping int32 dtype only for integer atoms."""

    discrete = True

    def __init__(self, value):
        object.__setattr__(self, "value", float(value))
        self._post_init()

    def _post_init(self):
        is_int = float(self.value).is_integer()
        object.__setattr__(self, "_isint", is_int)
        object.__setattr__(
            self, "_atom",
            np.int32(self.value) if is_int else _f32(self.value))

    def sample(self, key, shape=()):
        dtype = jnp.int32 if self._isint else jnp.float32
        return jnp.full(shape, self._atom, dtype)

    def push(self, x):
        dtype = jnp.int32 if self._isint else jnp.float32
        return jnp.full(jnp.shape(x), self._atom, dtype)

    def logpdf(self, x):
        hit = jnp.asarray(x, jnp.float32) == _f32(self.value)
        return jnp.where(hit, np.float32(0.0), _NEG_INF)

    def cdf(self, x):
        return jnp.where(jnp.asarray(x, jnp.float32) >= _f32(self.value),
                         np.float32(1.0), np.float32(0.0))

    def quantile(self, q):
        return jnp.full(jnp.shape(q), _f32(self.value))

    def __repr__(self):
        return f"Dirac({self.value})"


def _dirac_flatten(d):
    return (), (d.value,)


def _dirac_unflatten(aux, _):
    obj = object.__new__(Dirac)
    object.__setattr__(obj, "value", aux[0])
    obj._post_init()
    return obj


jax.tree_util.register_pytree_node(Dirac, _dirac_flatten, _dirac_unflatten)


class DiscreteNonParametric(Distribution):
    """Arbitrary finite-support discrete distribution
    (Distributions.jl ``DiscreteNonParametric(xs, ps)``): atom ``xs[i]``
    with probability ``ps[i]``. Atoms may be non-integer; ``push`` snaps
    a float-evolved value to the NEAREST atom (the tree-algebra
    generalization of round-to-int, which is exactly nearest-atom for
    integer supports)."""

    discrete = True

    def __init__(self, xs, ps):
        xs = np.asarray(xs, _f32)
        ps = np.asarray(ps, np.float64)
        if xs.ndim != 1 or xs.shape != ps.shape:
            raise ValueError("DiscreteNonParametric needs 1-D xs, ps of "
                             "equal length")
        if np.any(ps < 0) or not np.isclose(ps.sum(), 1.0, atol=1e-6):
            raise ValueError("DiscreteNonParametric weights must be "
                             "nonnegative and sum to 1")
        # merge duplicate atoms so logpdf (searchsorted: first hit) and
        # sample (sum of duplicate weights) agree on the pmf
        uxs, inv = np.unique(xs, return_inverse=True)
        ups = np.zeros(uxs.shape, np.float64)
        np.add.at(ups, inv, ps)
        object.__setattr__(self, "xs", uxs)
        object.__setattr__(self, "ps", ups.astype(_f32))
        self._post_init()

    def _post_init(self):
        object.__setattr__(
            self, "_logp",
            np.log(np.clip(np.asarray(self.ps, np.float64),
                           np.finfo(np.float64).tiny, None)).astype(_f32))
        object.__setattr__(
            self, "_cum",
            np.cumsum(np.asarray(self.ps, np.float64)).astype(_f32))
        object.__setattr__(
            self, "_isint",
            bool(np.all(np.asarray(self.xs, np.float64)
                        == np.round(np.asarray(self.xs, np.float64)))))
        # midpoints between consecutive atoms drive nearest-atom push
        xs = np.asarray(self.xs, np.float64)
        object.__setattr__(
            self, "_mids", (0.5 * (xs[1:] + xs[:-1])).astype(_f32))

    def _out_dtype(self):
        return jnp.int32 if self._isint else jnp.float32

    def sample(self, key, shape=()):
        idx = jax.random.categorical(key, self._logp, shape=shape)
        return jnp.take(self.xs, idx).astype(self._out_dtype())

    def push(self, x):
        idx = jnp.searchsorted(self._mids, jnp.asarray(x, jnp.float32))
        return jnp.take(self.xs, idx).astype(self._out_dtype())

    def logpdf(self, x):
        xf = jnp.asarray(x, jnp.float32)
        idx = jnp.clip(jnp.searchsorted(self.xs, xf), 0, len(self.xs) - 1)
        hit = jnp.take(self.xs, idx) == xf
        return jnp.where(hit & (jnp.take(self.ps, idx) > 0),
                         jnp.take(self._logp, idx), _NEG_INF)

    def cdf(self, x):
        xf = jnp.asarray(x, jnp.float32)
        idx = jnp.searchsorted(self.xs, xf, side="right")
        cum = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                               jnp.asarray(self._cum)])
        return jnp.take(cum, idx)

    def quantile(self, q):
        idx = jnp.clip(jnp.searchsorted(self._cum,
                                        jnp.asarray(q, jnp.float32)),
                       0, len(self.xs) - 1)
        return jnp.take(self.xs, idx).astype(self._out_dtype())

    def __repr__(self):
        return f"DiscreteNonParametric(xs={self.xs}, ps={self.ps})"


def _dnp_flatten(d):
    return (), (d.xs.tobytes(), d.ps.tobytes(), d.xs.shape)


def _dnp_unflatten(aux, _):
    obj = object.__new__(DiscreteNonParametric)
    object.__setattr__(obj, "xs",
                       np.frombuffer(aux[0], dtype=_f32).reshape(aux[2]))
    object.__setattr__(obj, "ps",
                       np.frombuffer(aux[1], dtype=_f32).reshape(aux[2]))
    obj._post_init()
    return obj


jax.tree_util.register_pytree_node(DiscreteNonParametric, _dnp_flatten,
                                   _dnp_unflatten)


class PoissonBinomial(Distribution):
    """Sum of independent non-identical Bernoullis
    (Distributions.jl ``PoissonBinomial(ps)``). The pmf table is an
    exact host dynamic-programming convolution (float64, length n+1);
    sampling draws the n Bernoullis in one batched uniform."""

    discrete = True

    def __init__(self, ps):
        ps = np.asarray(ps, np.float64)
        if ps.ndim != 1 or np.any(ps < 0) or np.any(ps > 1):
            raise ValueError("PoissonBinomial needs a 1-D vector of "
                             "probabilities in [0, 1]")
        object.__setattr__(self, "ps", ps.astype(_f32))
        self._post_init()

    def _post_init(self):
        ps = np.asarray(self.ps, np.float64)
        pmf = np.ones(1)
        for p in ps:
            nxt = np.zeros(pmf.shape[0] + 1)
            nxt[:-1] += pmf * (1 - p)
            nxt[1:] += pmf * p
            pmf = nxt
        object.__setattr__(
            self, "_lpmf",
            np.log(np.clip(pmf, 1e-300, None)).astype(_f32))
        object.__setattr__(self, "_cum", np.cumsum(pmf).astype(_f32))

    def sample(self, key, shape=()):
        n = self.ps.shape[0]
        u = jax.random.uniform(key, shape + (n,))
        return jnp.sum(u < self.ps, axis=-1).astype(jnp.int32)

    def logpdf(self, x):
        n = self.ps.shape[0]
        xi = jnp.clip(jnp.asarray(x, jnp.int32), 0, n)
        xf = jnp.asarray(x, jnp.float32)
        inside = (xf >= 0) & (xf <= n) & (xf == jnp.round(xf))
        return jnp.where(inside, jnp.take(self._lpmf, xi), _NEG_INF)

    def cdf(self, x):
        n = self.ps.shape[0]
        xi = jnp.clip(jnp.floor(jnp.asarray(x, jnp.float32)), -1,
                      n).astype(jnp.int32)
        cum = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                               jnp.asarray(self._cum)])
        return jnp.take(cum, xi + 1)

    def __repr__(self):
        return f"PoissonBinomial(n={self.ps.shape[0]})"


def _pb_flatten(d):
    return (), (d.ps.tobytes(), d.ps.shape)


def _pb_unflatten(aux, _):
    obj = object.__new__(PoissonBinomial)
    object.__setattr__(obj, "ps",
                       np.frombuffer(aux[0], dtype=_f32).reshape(aux[1]))
    obj._post_init()
    return obj


jax.tree_util.register_pytree_node(PoissonBinomial, _pb_flatten,
                                   _pb_unflatten)


# --------------------------------------------------------------------------
# Tier-4 multivariate / matrix-variate
# --------------------------------------------------------------------------

class MvLogNormal(Distribution):
    """Multivariate log-normal (Distributions.jl ``MvLogNormal``):
    log X ~ MvNormal(mean, cov). Same constructor forms as MvNormal."""

    event_dim = 1

    def __init__(self, mean_or_dim, sigma_or_cov=1.0):
        object.__setattr__(self, "normal",
                           MvNormal(mean_or_dim, sigma_or_cov))

    @property
    def nparams(self):
        return self.normal.nparams

    def sample(self, key, shape=()):
        return jnp.exp(self.normal.sample(key, shape))

    def logpdf(self, x):
        ok = jnp.all(x > 0, axis=-1)
        xs = jnp.where(x > 0, x, 1.0)
        lx = jnp.log(xs)
        lp = self.normal.logpdf(lx) - jnp.sum(lx, axis=-1)
        return jnp.where(ok, lp, _NEG_INF)

    def __repr__(self):
        return f"MvLogNormal(d={self.normal.mean.shape[0]})"


def _mvln_flatten(d):
    return (), (d.normal,)


def _mvln_unflatten(aux, _):
    obj = object.__new__(MvLogNormal)
    object.__setattr__(obj, "normal", aux[0])
    return obj


jax.tree_util.register_pytree_node(MvLogNormal, _mvln_flatten,
                                   _mvln_unflatten)


class MvTDist(Distribution):
    """Multivariate Student t (Distributions.jl ``MvTDist(df, mu,
    Sigma)``) with scale matrix ``Sigma`` (not the covariance, which is
    df/(df-2) Sigma)."""

    event_dim = 1

    def __init__(self, df, mean, cov):
        df = float(df)
        if not df > 0:
            raise ValueError("MvTDist needs df > 0")
        mean = np.asarray(mean, _f32)
        cov = np.asarray(cov, np.float64)
        if cov.ndim == 0:
            cov = cov ** 2 * np.eye(mean.shape[0])
        object.__setattr__(self, "df", _f32(df))
        object.__setattr__(self, "mean", mean)
        object.__setattr__(self, "cov", cov.astype(_f32))
        self._post_init()

    def _post_init(self):
        df = float(self.df)
        d = self.mean.shape[0]
        chol = np.linalg.cholesky(np.asarray(self.cov, np.float64))
        object.__setattr__(self, "chol", chol.astype(_f32))
        # float64 inverse cast to f32 — same conditioning tradeoff as
        # MvNormal._post_init (see comment there)
        object.__setattr__(self, "_cholinv",
                           np.linalg.inv(chol).astype(_f32))
        logdet = 2.0 * np.sum(np.log(np.diag(chol)))
        object.__setattr__(
            self, "_lc",
            _f32(sps.gammaln((df + d) / 2.0) - sps.gammaln(df / 2.0)
                 - 0.5 * d * math.log(df * math.pi) - 0.5 * logdet))

    @property
    def nparams(self):
        return self.mean.shape[0]

    def sample(self, key, shape=()):
        kz, kg = jax.random.split(key)
        d = self.mean.shape[0]
        z = jax.random.normal(kz, shape + (d,)) @ self.chol.T
        half = np.float32(0.5 * float(self.df))
        chisq = 2.0 * jax.random.gamma(kg, half, shape + (1,))
        return self.mean + z * jnp.sqrt(self.df / chisq)

    def logpdf(self, x):
        diff = x - self.mean
        sol = jnp.einsum("ij,...j->...i", self._cholinv, diff)
        maha = jnp.sum(sol * sol, axis=-1)
        d = self.mean.shape[0]
        return self._lc - 0.5 * (self.df + d) * jnp.log1p(maha / self.df)

    def __repr__(self):
        return f"MvTDist(df={self.df}, d={self.mean.shape[0]})"


def _mvt_flatten(d):
    return (), (float(d.df), d.mean.tobytes(), d.mean.shape, d.cov.tobytes())


def _mvt_unflatten(aux, _):
    obj = object.__new__(MvTDist)
    mean = np.frombuffer(aux[1], dtype=_f32).reshape(aux[2])
    n = mean.shape[0]
    object.__setattr__(obj, "df", _f32(aux[0]))
    object.__setattr__(obj, "mean", mean)
    object.__setattr__(obj, "cov",
                       np.frombuffer(aux[3], dtype=_f32).reshape((n, n)))
    obj._post_init()
    return obj


jax.tree_util.register_pytree_node(MvTDist, _mvt_flatten, _mvt_unflatten)


def _tri_logdet(m):
    """log |det| from a (batched) Cholesky factor."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(m, axis1=-2, axis2=-1)),
                         axis=-1)


class Wishart(Distribution):
    """Wishart(df, S) over d x d SPD matrices (Distributions.jl
    ``Wishart``). Sampling is the Bartlett decomposition (one batched
    normal + one batched gamma — no loops); logpdf uses the identity
    tr(S^-1 X) = ||L^-1 chol(X)||_F^2 with L = chol(S) host-precomputed."""

    event_dim = 2

    def __init__(self, df, S):
        S = np.asarray(S, np.float64)
        if S.ndim != 2 or S.shape[0] != S.shape[1]:
            raise ValueError("Wishart needs a square scale matrix")
        d = S.shape[0]
        df = float(df)
        if not df > d - 1:
            raise ValueError("Wishart needs df > d - 1")
        object.__setattr__(self, "df", _f32(df))
        object.__setattr__(self, "S", S.astype(_f32))
        self._post_init()

    def _post_init(self):
        df = float(self.df)
        S = np.asarray(self.S, np.float64)
        d = S.shape[0]
        L = np.linalg.cholesky(S)
        object.__setattr__(self, "_L", L.astype(_f32))
        object.__setattr__(self, "_Linv", np.linalg.inv(L).astype(_f32))
        logdetS = 2.0 * np.sum(np.log(np.diag(L)))
        object.__setattr__(
            self, "_lnorm",
            _f32(0.5 * df * d * math.log(2.0) + 0.5 * df * logdetS
                 + float(sps.multigammaln(0.5 * df, d))))
        # Bartlett diagonal gamma shapes (df - i)/2, i = 0..d-1
        object.__setattr__(
            self, "_bshapes",
            ((df - np.arange(d)) / 2.0).astype(_f32))

    @property
    def nparams(self):
        return self.S.shape[0] * self.S.shape[1]

    def sample(self, key, shape=()):
        d = self.S.shape[0]
        kz, kg = jax.random.split(key)
        z = jax.random.normal(kz, shape + (d, d))
        c = jax.random.gamma(
            kg, jnp.broadcast_to(self._bshapes, shape + (d,)))
        a = jnp.tril(z, -1) + jnp.eye(d) * jnp.sqrt(2.0 * c)[..., None, :]
        la = jnp.einsum("ij,...jk->...ik", self._L, a)
        return la @ jnp.swapaxes(la, -1, -2)

    def push(self, x):
        """Matrix-support projection (the continuous analogue of the
        discrete round-to-int push): proposals evolve the d x d leaf
        elementwise, so symmetry is restored here; non-SPD projections
        get -inf from logpdf and are MH-rejected."""
        x = jnp.asarray(x, jnp.float32)
        return 0.5 * (x + jnp.swapaxes(x, -1, -2))

    def logpdf(self, x):
        d = self.S.shape[0]
        cl = jnp.linalg.cholesky(x)
        ldx = _tri_logdet(cl)
        m = jnp.einsum("ij,...jk->...ik", self._Linv, cl)
        tr = jnp.sum(m * m, axis=(-2, -1))
        lp = 0.5 * (self.df - d - 1.0) * ldx - 0.5 * tr - self._lnorm
        return jnp.where(jnp.isfinite(lp), lp, _NEG_INF)  # non-SPD -> -inf

    def __repr__(self):
        return f"Wishart(df={self.df}, d={self.S.shape[0]})"


def _wis_flatten(d):
    return (), (float(d.df), d.S.tobytes(), d.S.shape)


def _wis_unflatten(aux, _):
    obj = object.__new__(Wishart)
    object.__setattr__(obj, "df", _f32(aux[0]))
    object.__setattr__(obj, "S",
                       np.frombuffer(aux[1], dtype=_f32).reshape(aux[2]))
    obj._post_init()
    return obj


jax.tree_util.register_pytree_node(Wishart, _wis_flatten, _wis_unflatten)


class InverseWishart(Distribution):
    """InverseWishart(df, Psi) over d x d SPD matrices (Distributions.jl
    ``InverseWishart``): X^-1 ~ Wishart(df, Psi^-1)."""

    event_dim = 2

    def __init__(self, df, Psi):
        Psi = np.asarray(Psi, np.float64)
        if Psi.ndim != 2 or Psi.shape[0] != Psi.shape[1]:
            raise ValueError("InverseWishart needs a square scale matrix")
        d = Psi.shape[0]
        df = float(df)
        if not df > d - 1:
            raise ValueError("InverseWishart needs df > d - 1")
        object.__setattr__(self, "df", _f32(df))
        object.__setattr__(self, "Psi", Psi.astype(_f32))
        self._post_init()

    def _post_init(self):
        df = float(self.df)
        Psi = np.asarray(self.Psi, np.float64)
        d = Psi.shape[0]
        object.__setattr__(self, "_wis",
                           Wishart(df, np.linalg.inv(Psi)))
        LP = np.linalg.cholesky(Psi)
        object.__setattr__(self, "_LP", LP.astype(_f32))
        logdetP = 2.0 * np.sum(np.log(np.diag(LP)))
        object.__setattr__(
            self, "_lnorm",
            _f32(0.5 * df * d * math.log(2.0) - 0.5 * df * logdetP
                 + float(sps.multigammaln(0.5 * df, d))))

    @property
    def nparams(self):
        return self.Psi.shape[0] * self.Psi.shape[1]

    def sample(self, key, shape=()):
        w = self._wis.sample(key, shape)
        cw = jnp.linalg.cholesky(w)
        d = self.Psi.shape[0]
        eye = jnp.broadcast_to(jnp.eye(d, dtype=jnp.float32),
                               w.shape)
        inv_cw = jax.scipy.linalg.solve_triangular(cw, eye, lower=True)
        return jnp.swapaxes(inv_cw, -1, -2) @ inv_cw

    def push(self, x):
        x = jnp.asarray(x, jnp.float32)
        return 0.5 * (x + jnp.swapaxes(x, -1, -2))

    def logpdf(self, x):
        d = self.Psi.shape[0]
        cl = jnp.linalg.cholesky(x)
        ldx = _tri_logdet(cl)
        # tr(Psi X^-1) = ||cl^-1 L_Psi||_F^2 with cl = chol(X); broadcast
        # the host factor to cl's batch shape (solve_triangular refuses
        # mixed batch ranks)
        m = jax.scipy.linalg.solve_triangular(
            cl, jnp.broadcast_to(self._LP, cl.shape), lower=True)
        tr = jnp.sum(m * m, axis=(-2, -1))
        lp = -0.5 * (self.df + d + 1.0) * ldx - 0.5 * tr - self._lnorm
        return jnp.where(jnp.isfinite(lp), lp, _NEG_INF)  # non-SPD -> -inf

    def __repr__(self):
        return f"InverseWishart(df={self.df}, d={self.Psi.shape[0]})"


def _iw_flatten(d):
    return (), (float(d.df), d.Psi.tobytes(), d.Psi.shape)


def _iw_unflatten(aux, _):
    obj = object.__new__(InverseWishart)
    object.__setattr__(obj, "df", _f32(aux[0]))
    object.__setattr__(obj, "Psi",
                       np.frombuffer(aux[1], dtype=_f32).reshape(aux[2]))
    obj._post_init()
    return obj


jax.tree_util.register_pytree_node(InverseWishart, _iw_flatten,
                                   _iw_unflatten)


class LKJCholesky(Distribution):
    """LKJ distribution over CHOLESKY FACTORS of d x d correlation
    matrices (Distributions.jl ``LKJCholesky(d, eta)``). Samples lower
    triangular L with unit-norm rows (so L L^T is a correlation
    matrix); density over L's free entries is the exact row-factorized
    onion form

      log p(L) = sum_m [(2 eta - 2 + d - 1 - m) log L_mm]  - log Z

    (m = 1..d-1, 0-indexed rows), with the normalizer assembled from
    per-row Beta and sphere-area constants on the host. Sampling is the
    onion method: one batched Beta + one batched normal per row,
    unrolled at trace time over the host-known d."""

    event_dim = 2

    def __init__(self, d, eta=1.0):
        d, eta = int(d), float(eta)
        if d < 2 or eta <= 0:
            raise ValueError("LKJCholesky needs d >= 2 and eta > 0")
        object.__setattr__(self, "d", d)
        object.__setattr__(self, "eta", _f32(eta))
        self._post_init()

    def _post_init(self):
        d, eta = int(self.d), float(self.eta)
        lz = 0.0
        betas = []
        for m in range(1, d):
            a, b = m / 2.0, eta + (d - 1 - m) / 2.0
            betas.append((_f32(a), _f32(b)))
            log_sphere = (math.log(2.0) + 0.5 * m * math.log(math.pi)
                          - sps.gammaln(0.5 * m))
            lz += sps.betaln(a, b) + log_sphere - math.log(2.0)
        object.__setattr__(self, "_betas", tuple(betas))
        object.__setattr__(self, "_lz", _f32(lz))
        # diag exponents (2 eta - 2 + d - 1 - m), m = 0..d-1 (row 0 unused)
        object.__setattr__(
            self, "_dexp",
            (2.0 * eta - 2.0 + d - 1 - np.arange(d)).astype(_f32))

    @property
    def nparams(self):
        return self.d * self.d

    def sample(self, key, shape=()):
        d = self.d
        rows = [jnp.broadcast_to(
            jnp.concatenate([jnp.ones((1,), jnp.float32),
                             jnp.zeros((d - 1,), jnp.float32)]),
            shape + (d,))]
        for m in range(1, d):
            km = jax.random.fold_in(key, m)
            kb, kn = jax.random.split(km)
            a, b = self._betas[m - 1]
            y = jax.random.beta(kb, a, b, shape)
            z = jax.random.normal(kn, shape + (m,))
            u = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
            w = jnp.sqrt(y)[..., None] * u
            lmm = jnp.sqrt(jnp.maximum(1.0 - y, 1e-30))[..., None]
            pad = jnp.zeros(shape + (d - 1 - m,), jnp.float32)
            rows.append(jnp.concatenate([w, lmm, pad], axis=-1))
        return jnp.stack(rows, axis=-2)

    def push(self, x):
        """Project a float-evolved leaf back onto lower-triangular
        unit-norm-row Cholesky factors of correlation matrices."""
        x = jnp.tril(jnp.asarray(x, jnp.float32))
        nrm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.maximum(nrm, 1e-30)

    def logpdf(self, L):
        diag = jnp.diagonal(L, axis1=-2, axis2=-1)
        ok = jnp.all(diag > 0, axis=-1)
        ds = jnp.where(diag > 0, diag, 1.0)
        lp = jnp.sum(self._dexp[1:] * jnp.log(ds[..., 1:]), axis=-1)
        return jnp.where(ok, lp - self._lz, _NEG_INF)

    def __repr__(self):
        return f"LKJCholesky(d={self.d}, eta={self.eta})"


def _lkjc_flatten(d):
    return (), (d.d, float(d.eta))


def _lkjc_unflatten(aux, _):
    obj = object.__new__(LKJCholesky)
    object.__setattr__(obj, "d", aux[0])
    object.__setattr__(obj, "eta", _f32(aux[1]))
    obj._post_init()
    return obj


jax.tree_util.register_pytree_node(LKJCholesky, _lkjc_flatten,
                                   _lkjc_unflatten)


class LKJ(Distribution):
    """LKJ distribution over d x d CORRELATION MATRICES
    (Distributions.jl ``LKJ(d, eta)``): density det(R)^(eta-1) / c_d(eta)
    with the Lewandowski-Kurowicka-Joe normalizer

      c_d(eta) = 2^{sum_k (2 eta - 2 + d - k)(d - k)}
                 prod_k B(eta + (d-k-1)/2, eta + (d-k-1)/2)^{d-k}

    (k = 1..d-1). Sampling draws an LKJCholesky L and returns L L^T."""

    event_dim = 2

    def __init__(self, d, eta=1.0):
        d, eta = int(d), float(eta)
        if d < 2 or eta <= 0:
            raise ValueError("LKJ needs d >= 2 and eta > 0")
        object.__setattr__(self, "d", d)
        object.__setattr__(self, "eta", _f32(eta))
        self._post_init()

    def _post_init(self):
        d, eta = int(self.d), float(self.eta)
        object.__setattr__(self, "_chol", LKJCholesky(d, eta))
        lc = 0.0
        for k in range(1, d):
            lc += (2.0 * eta - 2.0 + d - k) * (d - k) * math.log(2.0)
            lc += (d - k) * sps.betaln(eta + (d - k - 1) / 2.0,
                                       eta + (d - k - 1) / 2.0)
        object.__setattr__(self, "_lc", _f32(lc))

    @property
    def nparams(self):
        return self.d * self.d

    def sample(self, key, shape=()):
        L = self._chol.sample(key, shape)
        return L @ jnp.swapaxes(L, -1, -2)

    def push(self, x):
        """Project a float-evolved leaf back onto correlation matrices:
        symmetrize and pin the diagonal at 1 (non-SPD projections get
        -inf from logpdf and are MH-rejected)."""
        x = jnp.asarray(x, jnp.float32)
        sym = 0.5 * (x + jnp.swapaxes(x, -1, -2))
        d = self.d
        eye = jnp.eye(d, dtype=jnp.float32)
        return sym * (1.0 - eye) + eye

    def logpdf(self, R):
        cl = jnp.linalg.cholesky(R)
        lp = (self.eta - 1.0) * _tri_logdet(cl) - self._lc
        return jnp.where(jnp.isfinite(lp), lp, _NEG_INF)

    def __repr__(self):
        return f"LKJ(d={self.d}, eta={self.eta})"


def _lkj_flatten(d):
    return (), (d.d, float(d.eta))


def _lkj_unflatten(aux, _):
    obj = object.__new__(LKJ)
    object.__setattr__(obj, "d", aux[0])
    object.__setattr__(obj, "eta", _f32(aux[1]))
    obj._post_init()
    return obj


jax.tree_util.register_pytree_node(LKJ, _lkj_flatten, _lkj_unflatten)


__all__ = [
    "Distribution", "Uniform", "Normal", "Exponential", "Beta", "Gamma",
    "LogNormal", "Laplace", "Cauchy", "StudentT", "TDist", "Weibull",
    "Chisq", "FDist", "Logistic", "Rayleigh", "Pareto", "InverseGamma",
    "Gumbel", "TriangularDist", "Arcsine", "Semicircle", "Frechet",
    "Levy", "GeneralizedPareto", "Kumaraswamy", "VonMises", "Erlang",
    "LogUniform", "SymTriangularDist", "Cosine", "Epanechnikov",
    "Biweight", "Triweight", "JohnsonSU", "GeneralizedExtremeValue",
    "NormalCanon", "InverseGaussian", "Chi", "BetaPrime",
    "PGeneralizedGaussian", "Rician", "Lindley", "LogitNormal",
    "NoncentralChisq", "Dirac", "DiscreteNonParametric",
    "PoissonBinomial", "MvLogNormal", "MvTDist", "Wishart",
    "InverseWishart", "LKJ", "LKJCholesky",
    "Truncated", "TruncatedDiscrete", "TruncatedNormal",
    "Mixture", "MixtureModel", "Affine",
    "DiscreteUniform", "Bernoulli",
    "Binomial", "BetaBinomial", "Hypergeometric", "Skellam",
    "Geometric", "NegativeBinomial", "Poisson", "Categorical", "MvNormal",
    "MultivariateNormal", "Product", "IID", "Dirichlet", "Multinomial",
    "Factored",
]
