"""Generic cross-distribution consistency battery.

Every distribution must be internally consistent regardless of where its
formulas came from: quantile inverts cdf, samples follow the cdf (KS),
and discrete supports return int32 samples with finite logpmf. This is
regression insurance on top of the per-distribution scipy oracles in
test_distributions.py — a future formula edit that breaks one leg of a
distribution fails here even if no oracle test covers that leg.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

import kissabc_tpu as ka

KEY = jax.random.key(11)

# (constructor args) chosen away from degenerate corners
CONTINUOUS = [
    ka.Uniform(-1.0, 2.0),
    ka.Normal(0.5, 1.5),
    ka.Exponential(2.0),
    ka.Beta(2.0, 3.0),
    ka.Gamma(3.0, 1.5),
    ka.LogNormal(0.2, 0.5),
    ka.Laplace(0.0, 1.0),
    ka.Cauchy(0.0, 1.0),
    ka.StudentT(5.0),
    ka.Weibull(2.0, 1.0),
    ka.Chisq(4.0),
    ka.FDist(5.0, 7.0),
    ka.Logistic(0.0, 1.0),
    ka.Rayleigh(1.5),
    ka.Pareto(3.0, 1.0),
    ka.InverseGamma(3.0, 2.0),
    ka.Gumbel(0.0, 1.0),
    ka.TriangularDist(0.0, 2.0, 0.5),
    ka.Arcsine(0.0, 1.0),
    ka.Semicircle(1.0),
    ka.Frechet(2.5, 1.0),
    ka.Levy(0.0, 1.0),
    ka.GeneralizedPareto(0.0, 1.0, 0.2),
    ka.GeneralizedPareto(0.0, 1.0, 0.0),
    ka.Kumaraswamy(2.0, 3.0),
    ka.TruncatedNormal(0.0, 1.0, -1.0, 2.0),
    ka.Erlang(3, 0.5),
    ka.LogUniform(0.5, 8.0),
    ka.SymTriangularDist(1.0, 2.0),
    ka.Cosine(0.5, 2.0),
    ka.Epanechnikov(0.0, 1.0),
    ka.Biweight(0.0, 1.0),
    ka.Triweight(0.0, 1.0),
    ka.JohnsonSU(-1.0, 2.0, 0.5, 1.5),
    ka.GeneralizedExtremeValue(0.5, 2.0, 0.3),
    ka.GeneralizedExtremeValue(0.5, 2.0, 0.0),
    ka.GeneralizedExtremeValue(0.5, 2.0, -0.25),
    ka.InverseGaussian(2.0, 5.0),
    ka.Chi(3.0),
    ka.BetaPrime(3.0, 5.0),
    ka.PGeneralizedGaussian(0.5, 2.0, 1.5),
    ka.Rician(2.0, 0.8),
    ka.Lindley(1.5),
    ka.LogitNormal(0.5, 1.2),
    ka.NoncentralChisq(3.0, 4.0),
    ka.StudentT(4.0),  # gained cdf/quantile legs (bisection) in r2
    ka.VonMises(0.5, 2.0),  # table-interp cdf/quantile
    # Truncated over general bases (host normalizer via the scipy-twin
    # registry) — Distributions.jl truncated() works on everything
    ka.Truncated(ka.Cauchy(0.0, 1.0), -2.0, 3.0),
    ka.Truncated(ka.Weibull(2.0, 1.5), 0.5, 2.5),
    ka.Truncated(ka.StudentT(4.0), -1.5, 1.5),
    ka.Truncated(ka.InverseGamma(3.0, 2.0), 0.3, 1.5),
]

DISCRETE = [
    ka.Bernoulli(0.3),
    ka.Binomial(12, 0.4),
    ka.Geometric(0.35),
    ka.Poisson(4.0),
    ka.NegativeBinomial(5.0, 0.4),
    ka.DiscreteUniform(-2, 7),
    ka.Categorical([0.2, 0.5, 0.3]),
    ka.BetaBinomial(9, 2.0, 2.0),
    ka.Hypergeometric(8, 6, 7),
    ka.Skellam(2.5, 1.5),
    ka.Dirac(3),
    ka.DiscreteNonParametric([2, 5, 9], [0.3, 0.3, 0.4]),
    ka.PoissonBinomial([0.1, 0.5, 0.9, 0.3]),
]


@pytest.mark.parametrize("d", CONTINUOUS, ids=lambda d: repr(d))
def test_continuous_consistency(d):
    n = 8000
    x = np.asarray(d.sample(KEY, (n,)))
    assert x.shape == (n,) and np.isfinite(x).all()
    # logpdf finite at sampled points
    lp = np.asarray(d.logpdf(jnp.asarray(x)))
    assert np.isfinite(lp).all(), f"{d!r}: non-finite logpdf at samples"
    if hasattr(d, "cdf"):
        # samples follow the claimed cdf (KS against the dist's own cdf)
        ks = st.kstest(x[:4000], lambda v: np.asarray(d.cdf(jnp.asarray(
            np.asarray(v, np.float32)))).astype(np.float64))
        assert ks.pvalue > 1e-4, f"{d!r}: KS p={ks.pvalue}"
    if hasattr(d, "cdf") and hasattr(d, "quantile"):
        qs = np.asarray([0.05, 0.25, 0.5, 0.75, 0.95], np.float32)
        xq = np.asarray(d.quantile(jnp.asarray(qs)))
        back = np.asarray(d.cdf(jnp.asarray(xq)))
        np.testing.assert_allclose(back, qs, atol=5e-3,
                                   err_msg=f"{d!r}: cdf(quantile(q)) != q")


@pytest.mark.parametrize("d", DISCRETE, ids=lambda d: repr(d))
def test_discrete_consistency(d):
    n = 8000
    x = np.asarray(d.sample(KEY, (n,)))
    assert x.dtype == np.int32, f"{d!r}: samples must be int32"
    lp = np.asarray(d.logpdf(jnp.asarray(x)))
    assert np.isfinite(lp).all(), f"{d!r}: non-finite logpmf at samples"
    # empirical pmf matches exp(logpmf) on the observed support
    vals, counts = np.unique(x, return_counts=True)
    emp = counts / n
    model = np.exp(np.asarray(d.logpdf(jnp.asarray(vals))))
    # chi-square-ish bound: 5 sigma of the multinomial sampling error
    err = 5.0 * np.sqrt(np.maximum(model * (1 - model), 1e-12) / n)
    bad = np.abs(emp - model) > np.maximum(err, 0.01)
    assert not bad.any(), (
        f"{d!r}: pmf mismatch at {vals[bad]}: emp={emp[bad]} vs "
        f"model={model[bad]}")
    # push policy: float-evolved values snap back onto the support dtype
    pushed = d.push(jnp.asarray(x, jnp.float32) + 0.3)
    assert pushed.dtype == jnp.int32


@pytest.mark.parametrize("d", CONTINUOUS + DISCRETE, ids=lambda d: repr(d))
def test_declared_moments_match_empirical(d):
    """ka.mean/ka.var/ka.kurtosis (statistics.py) vs this battery's own
    samplers — a registry/convention error in either leg fails here."""
    if isinstance(d, ka.VonMises):
        pytest.skip("var(VonMises) is the CIRCULAR variance "
                    "(Distributions.jl semantics) — not comparable to "
                    "the empirical linear variance")
    n = 8000
    x = np.asarray(d.sample(KEY, (n,)), np.float64)
    try:
        m, v = ka.mean(d), ka.var(d)
    except NotImplementedError:
        pytest.skip("no declared moments")
    if not (np.isfinite(m) and np.isfinite(v)):
        pytest.skip("undefined moments (heavy tail)")
    se = np.sqrt(v / n)
    assert abs(x.mean() - m) < 6.0 * se + 1e-9, (
        f"{d!r}: mean {x.mean()} vs declared {m}")
    if v <= 0:
        return
    try:
        k = ka.kurtosis(d)
    except NotImplementedError:
        return
    if np.isfinite(k) and k < 50:
        # relative sampling error of the std estimate ~ sqrt((k+2)/4n)
        tol = 6.0 * np.sqrt((k + 2.0) / (4.0 * n)) + 0.01
        rel = abs(x.std(ddof=1) - np.sqrt(v)) / np.sqrt(v)
        assert rel < tol, (
            f"{d!r}: std {x.std(ddof=1)} vs declared {np.sqrt(v)}")
