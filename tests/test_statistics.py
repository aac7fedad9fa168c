"""Distributions.jl functional statistics surface (statistics.py).

Two independent oracles:
1. scipy frozen objects constructed HERE with their own convention
   mapping (a registry error in statistics._twin must be made
   identically twice to slip through);
2. empirical moments from OUR samplers (fully independent of scipy;
   the only check possible for override families like Kumaraswamy,
   Lindley, Mixture, Truncated, the kernels, ...).

Reference surface: the @reexport of Distributions.jl at
/root/reference/src/KissABC.jl:13-14 gives users mean/std/var/mode/
entropy/insupport/minimum/maximum/params/ccdf/... on every prior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

import kissabc_tpu as ka

# (ours, scipy twin built independently here)
TWIN_CASES = [
    (ka.Normal(1.5, 2.0), st.norm(1.5, 2.0)),
    (ka.Uniform(-1.0, 3.0), st.uniform(-1.0, 4.0)),
    (ka.Exponential(2.5), st.expon(scale=2.5)),
    (ka.Beta(2.0, 5.0), st.beta(2.0, 5.0)),
    (ka.Gamma(2.5, 1.7), st.gamma(2.5, scale=1.7)),
    (ka.LogNormal(0.3, 0.8), st.lognorm(0.8, scale=np.exp(0.3))),
    (ka.Laplace(1.0, 2.0), st.laplace(1.0, 2.0)),
    (ka.StudentT(5.0), st.t(5.0)),
    (ka.Weibull(2.0, 1.5), st.weibull_min(2.0, scale=1.5)),
    (ka.Chisq(4.0), st.chi2(4.0)),
    (ka.Chi(3.0), st.chi(3.0)),
    (ka.NoncentralChisq(4.0, 2.5), st.ncx2(4.0, 2.5)),
    (ka.FDist(8.0, 12.0), st.f(8.0, 12.0)),
    (ka.Logistic(0.5, 1.2), st.logistic(0.5, 1.2)),
    (ka.Rayleigh(2.0), st.rayleigh(scale=2.0)),
    (ka.Pareto(3.0, 2.0), st.pareto(3.0, scale=2.0)),
    (ka.GeneralizedPareto(0.5, 1.5, 0.2), st.genpareto(0.2, 0.5, 1.5)),
    (ka.GeneralizedExtremeValue(0.5, 1.5, 0.2),
     st.genextreme(-0.2, 0.5, 1.5)),
    (ka.InverseGamma(3.0, 2.0), st.invgamma(3.0, scale=2.0)),
    (ka.InverseGaussian(2.0, 3.0), st.invgauss(2.0 / 3.0, scale=3.0)),
    (ka.Gumbel(0.5, 2.0), st.gumbel_r(0.5, 2.0)),
    (ka.TriangularDist(0.0, 4.0, 1.0), st.triang(0.25, loc=0, scale=4)),
    (ka.SymTriangularDist(1.0, 2.0), st.triang(0.5, loc=-1, scale=4)),
    (ka.Cosine(1.0, 2.0), st.cosine(loc=1.0, scale=2.0 / np.pi)),
    (ka.Arcsine(1.0, 3.0), st.arcsine(loc=1.0, scale=2.0)),
    (ka.Semicircle(2.0), st.semicircular(scale=2.0)),
    # alpha=5: ALL four moments exist, so scipy's blind Gamma formulas
    # are valid (for alpha<=4 scipy lies about kurtosis; statistics.py
    # guards that — see test_frechet_divergent_moments)
    (ka.Frechet(5.0, 2.0), st.invweibull(5.0, scale=2.0)),
    (ka.LogUniform(0.5, 4.0), st.loguniform(0.5, 4.0)),
    (ka.JohnsonSU(0.5, 2.0, 0.3, 1.5),
     st.johnsonsu(0.3, 1.5, loc=0.5, scale=2.0)),
    (ka.BetaPrime(3.0, 5.0), st.betaprime(3.0, 5.0)),
    (ka.PGeneralizedGaussian(0.5, 1.5, 3.0),
     st.gennorm(3.0, loc=0.5, scale=1.5)),
    (ka.Rician(2.0, 1.5), st.rice(2.0 / 1.5, scale=1.5)),
    (ka.Poisson(3.5), st.poisson(3.5)),
    (ka.Bernoulli(0.3), st.bernoulli(0.3)),
    (ka.Binomial(10, 0.4), st.binom(10, 0.4)),
    (ka.Geometric(0.3), st.geom(0.3, loc=-1)),
    (ka.NegativeBinomial(4.0, 0.3), st.nbinom(4.0, 0.3)),
    (ka.BetaBinomial(10, 2.0, 3.0), st.betabinom(10, 2.0, 3.0)),
    (ka.Hypergeometric(7, 5, 6), st.hypergeom(12, 7, 6)),
    (ka.Skellam(2.0, 3.0), st.skellam(2.0, 3.0)),
    (ka.DiscreteUniform(2, 9), st.randint(2, 10)),
]


def test_twin_families_moments_and_support():
    for d, f in TWIN_CASES:
        name = type(d).__name__
        assert np.isclose(ka.mean(d), f.mean(), rtol=1e-5,
                          atol=1e-6), name
        assert np.isclose(ka.var(d), f.var(), rtol=1e-5, atol=1e-6), name
        assert np.isclose(ka.std(d), f.std(), rtol=1e-5, atol=1e-6), name
        assert np.isclose(ka.median(d), f.median(), rtol=1e-5,
                          atol=1e-6), name
        assert np.isclose(ka.entropy(d), f.entropy(), rtol=1e-5,
                          atol=1e-6), name
        lo, hi = f.support()
        assert np.isclose(ka.minimum(d), lo, rtol=1e-6, atol=1e-6), name
        assert np.isclose(ka.maximum(d), hi, rtol=1e-6, atol=1e-6), name
        # undefined higher moments (e.g. Pareto alpha<=3) are nan on
        # both sides — equal_nan treats that as agreement
        assert np.isclose(ka.skewness(d), f.stats(moments="s"),
                          rtol=1e-5, atol=1e-6, equal_nan=True), name
        assert np.isclose(ka.kurtosis(d), f.stats(moments="k"),
                          rtol=1e-5, atol=1e-6, equal_nan=True), name


# families with no scipy twin (or non-delegating overrides): empirical
# moments from OUR sampler are the oracle
OVERRIDE_CASES = [
    ka.Kumaraswamy(2.0, 3.0),
    ka.Lindley(0.7),
    ka.LogitNormal(0.4, 0.9),
    ka.Epanechnikov(1.0, 2.0),
    ka.Biweight(-0.5, 1.5),
    ka.Triweight(0.0, 2.0),
    ka.Mixture([ka.Normal(0.0, 1.0), ka.Normal(4.0, 2.0)], [0.25, 0.75]),
    (2.0 + 3.0 * ka.Exponential(1.5)),
    (2.0 - 3.0 * ka.Exponential(1.5)),
    ka.Truncated(ka.Normal(0.0, 1.0), 0.5, 2.0),
    ka.Truncated(ka.Gamma(2.0, 1.5), 1.0, np.inf),
    ka.Truncated(ka.Poisson(3.0), 1, 5),
    ka.DiscreteNonParametric([0.5, 1.5, 4.0], [0.2, 0.5, 0.3]),
    ka.PoissonBinomial([0.2, 0.5, 0.9]),
]


def test_override_families_empirical_moments():
    n = 200_000
    for i, d in enumerate(OVERRIDE_CASES):
        x = np.asarray(d.sample(jax.random.key(100 + i), (n,)),
                       np.float64)
        m, s = ka.mean(d), ka.std(d)
        name = type(d).__name__
        # mean within 6 standard errors; std within 3%
        assert abs(x.mean() - m) < 6.0 * s / np.sqrt(n) + 1e-4, (
            name, x.mean(), m)
        assert np.isclose(x.std(ddof=1), s, rtol=0.03), (
            name, x.std(ddof=1), s)
        assert ka.minimum(d) - 1e-5 <= x.min()
        assert x.max() <= ka.maximum(d) + 1e-5


def test_frechet_divergent_moments():
    # 3rd moment diverges for alpha <= 3, 4th for alpha <= 4 — scipy's
    # invweibull returns finite garbage there; ours must return inf
    assert ka.skewness(ka.Frechet(2.5, 1.0)) == np.inf
    assert ka.kurtosis(ka.Frechet(2.5, 1.0)) == np.inf
    assert ka.kurtosis(ka.Frechet(3.5, 1.0)) == np.inf
    assert np.isfinite(ka.skewness(ka.Frechet(3.5, 1.0)))
    assert np.isfinite(ka.kurtosis(ka.Frechet(4.5, 1.0)))


def test_truncated_continuous_vs_truncnorm():
    d = ka.Truncated(ka.Normal(0.0, 1.0), 0.5, 2.0)
    f = st.truncnorm(0.5, 2.0)
    assert np.isclose(ka.mean(d), f.mean(), rtol=1e-6)
    assert np.isclose(ka.var(d), f.var(), rtol=1e-6)
    assert np.isclose(ka.median(d), f.median(), rtol=1e-6)
    assert np.isclose(ka.entropy(d), f.entropy(), rtol=1e-5)
    assert ka.minimum(d) == 0.5 and ka.maximum(d) == 2.0


def test_vonmises_circular_stats():
    import scipy.special as sp
    d = ka.VonMises(0.5, 2.0)
    r = sp.i1(2.0) / sp.i0(2.0)
    assert ka.mean(d) == ka.median(d) == ka.mode(d) == 0.5
    assert np.isclose(ka.var(d), 1.0 - r, rtol=1e-7)  # circular variance
    assert np.isclose(ka.entropy(d),
                      np.log(2 * np.pi * sp.i0(2.0)) - 2.0 * r, rtol=1e-7)
    assert np.isclose(ka.minimum(d), 0.5 - np.pi)
    assert np.isclose(ka.maximum(d), 0.5 + np.pi)


def test_modes():
    assert ka.mode(ka.Normal(1.5, 2.0)) == 1.5
    assert np.isclose(ka.mode(ka.Gamma(3.0, 2.0)), 4.0)
    assert np.isclose(ka.mode(ka.Beta(3.0, 2.0)), 2.0 / 3.0)
    assert np.isclose(ka.mode(ka.LogNormal(0.3, 0.8)),
                      np.exp(0.3 - 0.64), rtol=1e-6)
    assert ka.mode(ka.Exponential(2.0)) == 0.0
    assert ka.mode(ka.Poisson(3.5)) == 3.0
    assert ka.mode(ka.Binomial(10, 0.4)) == 4.0
    assert ka.mode(ka.TriangularDist(0.0, 4.0, 1.0)) == 1.0
    assert ka.mode(ka.Dirac(7.0)) == 7.0
    # argmax atom
    assert ka.mode(ka.DiscreteNonParametric([1.0, 2.0], [0.7, 0.3])) == 1.0
    with pytest.raises(NotImplementedError):
        ka.mode(ka.Beta(0.5, 0.5))


def test_multivariate_mean_cov_entropy():
    mu = np.array([1.0, 2.0])
    sig = np.array([[2.0, 0.5], [0.5, 1.0]])
    d = ka.MvNormal(mu, sig)
    assert np.allclose(ka.mean(d), mu)
    assert np.allclose(ka.cov(d), sig, atol=1e-6)
    assert np.allclose(ka.var(d), np.diag(sig), atol=1e-6)
    assert np.isclose(ka.entropy(d),
                      st.multivariate_normal(mu, sig).entropy(), rtol=1e-6)

    a = np.array([2.0, 3.0, 5.0])
    di = ka.Dirichlet(a)
    assert np.allclose(ka.mean(di), a / a.sum(), atol=1e-7)
    assert np.allclose(np.diag(ka.cov(di)), st.dirichlet(a).var(),
                       rtol=1e-6)

    mn = ka.Multinomial(10, [0.2, 0.3, 0.5])
    assert np.allclose(ka.mean(mn), [2.0, 3.0, 5.0], atol=1e-6)
    p = np.array([0.2, 0.3, 0.5])
    assert np.allclose(ka.cov(mn), 10 * (np.diag(p) - np.outer(p, p)),
                       atol=1e-6)

    # MvLogNormal moments vs sampling
    ml = ka.MvLogNormal(np.array([0.1, -0.2]),
                        np.array([[0.3, 0.1], [0.1, 0.2]]))
    x = np.asarray(ml.sample(jax.random.key(0), (400_000,)), np.float64)
    assert np.allclose(x.mean(0), ka.mean(ml), rtol=0.01)
    assert np.allclose(np.cov(x.T), ka.cov(ml), rtol=0.05)

    mt = ka.MvTDist(6.0, np.array([1.0, 2.0]), sig)
    assert np.allclose(ka.mean(mt), [1.0, 2.0])
    assert np.allclose(ka.cov(mt), 6.0 / 4.0 * sig, atol=1e-6)

    w = ka.Wishart(5.0, np.eye(2))
    assert np.allclose(ka.mean(w), 5.0 * np.eye(2), atol=1e-6)
    iw = ka.InverseWishart(6.0, np.eye(2))
    assert np.allclose(ka.mean(iw), np.eye(2) / 3.0, atol=1e-6)
    assert np.allclose(ka.mean(ka.LKJ(3, 2.0)), np.eye(3))


def test_factored_and_product_tuplewise():
    fac = ka.Factored(ka.Uniform(0.0, 1.0), ka.Poisson(3.0))
    assert ka.mean(fac) == (0.5, 3.0)
    assert np.allclose(ka.var(fac), (1.0 / 12.0, 3.0))
    assert np.isclose(ka.entropy(fac), 0.0 + st.poisson(3.0).entropy(),
                      rtol=1e-6)
    assert ka.minimum(fac) == (0.0, 0.0)
    ok = ka.insupport(fac, (jnp.float32(0.5), jnp.float32(2.0)))
    bad = ka.insupport(fac, (jnp.float32(1.5), jnp.float32(2.0)))
    assert bool(ok) and not bool(bad)

    pr = ka.Product([ka.Normal(0.0, 1.0), ka.Normal(5.0, 2.0)])
    assert np.allclose(ka.mean(pr), [0.0, 5.0])
    assert np.allclose(ka.cov(pr), np.diag([1.0, 4.0]), atol=1e-6)


def test_insupport_pointwise_and_jittable():
    assert bool(ka.insupport(ka.Beta(2.0, 2.0), 0.5))
    assert not bool(ka.insupport(ka.Beta(2.0, 2.0), 1.5))
    assert bool(ka.insupport(ka.Poisson(3.0), 2.0))
    assert not bool(ka.insupport(ka.Poisson(3.0), 2.5))  # integrality
    assert bool(ka.insupport(ka.Dirac(1.5), 1.5))
    assert not bool(ka.insupport(ka.Dirac(1.5), 2.0))
    d = ka.DiscreteNonParametric([0.5, 4.0], [0.5, 0.5])
    assert bool(ka.insupport(d, 4.0)) and not bool(ka.insupport(d, 1.0))
    # jittable over arrays
    f = jax.jit(lambda x: ka.insupport(ka.Uniform(0.0, 1.0), x))
    out = f(jnp.array([-0.5, 0.5, 1.5], jnp.float32))
    assert list(np.asarray(out)) == [False, True, False]


def test_pointwise_ccdf_logcdf_cquantile():
    d = ka.Normal(0.0, 1.0)
    x = np.float32(0.7)
    assert np.isclose(float(ka.ccdf(d, x)), st.norm.sf(0.7), rtol=1e-5)
    assert np.isclose(float(ka.logcdf(d, x)), st.norm.logcdf(0.7),
                      rtol=1e-5)
    assert np.isclose(float(ka.logccdf(d, x)), st.norm.logsf(0.7),
                      rtol=1e-5)
    assert np.isclose(float(ka.cquantile(d, np.float32(0.975))),
                      st.norm.ppf(0.025), rtol=1e-4)
    assert np.isclose(float(ka.quantile(d, np.float32(0.975))),
                      st.norm.ppf(0.975), rtol=1e-4)
    assert np.isclose(float(ka.pdf(d, x)), st.norm.pdf(0.7), rtol=1e-5)
    assert np.isclose(float(ka.logpdf(d, x)), st.norm.logpdf(0.7),
                      rtol=1e-5)
    assert np.isclose(float(ka.cdf(d, x)), st.norm.cdf(0.7), rtol=1e-5)


def test_params_and_cloud_inputs():
    assert ka.params(ka.Normal(1.0, 2.0)) == (1.0, 2.0)
    assert ka.params(ka.Hypergeometric(7, 5, 6)) == (7, 5, 6)
    mu, cv = ka.params(ka.MvNormal(np.zeros(2), np.eye(2)))
    assert np.allclose(mu, 0.0) and np.allclose(cv, np.eye(2))
    # free functions also take Particles / arrays (Julia mean(p) idiom)
    p = ka.Particles(np.array([1.0, 2.0, 3.0]))
    assert ka.mean(p) == 2.0
    assert np.isclose(ka.std(p), 1.0)
    assert ka.median([1.0, 2.0, 9.0]) == 2.0


def test_aliases_and_wrappers_dispatch():
    # NormalCanon -> Normal, Erlang -> Gamma, TruncatedNormal -> Truncated
    assert np.isclose(ka.mean(ka.NormalCanon(2.0, 4.0)), 0.5)
    assert np.isclose(ka.mean(ka.Erlang(3, 2.0)), 6.0)
    tn = ka.TruncatedNormal(0.0, 1.0, 0.5, 2.0)
    assert np.isclose(ka.mean(tn), st.truncnorm(0.5, 2.0).mean(),
                      rtol=1e-6)
    assert np.isclose(ka.mean(ka.TDist(5.0)), 0.0)


def test_truncated_general_bases():
    """r2: Truncated's host normalizer falls back to the scipy-twin
    registry, so truncated() now works over (nearly) every continuous
    family, like Distributions.jl."""
    cases = [
        (ka.Truncated(ka.Cauchy(0.0, 1.0), -2.0, 3.0),
         st.cauchy(0, 1), -2.0, 3.0),
        (ka.Truncated(ka.Gumbel(0.0, 1.0), -1.0, 2.0),
         st.gumbel_r(0, 1), -1.0, 2.0),
        (ka.Truncated(ka.StudentT(4.0), -1.5, 1.5), st.t(4.0), -1.5, 1.5),
        (ka.Truncated(ka.FDist(5.0, 9.0), 0.5, 3.0),
         st.f(5.0, 9.0), 0.5, 3.0),
    ]
    from scipy.integrate import quad
    for d, f, lo, hi in cases:
        mass = f.cdf(hi) - f.cdf(lo)
        mid = 0.5 * (lo + hi)
        assert np.isclose(float(d.logpdf(np.float32(mid))),
                          f.logpdf(mid) - np.log(mass), rtol=1e-4)
        m = quad(lambda v: v * f.pdf(v), lo, hi)[0] / mass
        assert np.isclose(ka.mean(d), m, rtol=1e-5)
        x = np.asarray(d.sample(jax.random.key(5), (20000,)))
        assert lo - 1e-5 <= x.min() and x.max() <= hi + 1e-5
        assert abs(x.mean() - m) < 5 * x.std() / np.sqrt(x.size)


def test_new_cdf_quantile_legs_vs_scipy():
    # StudentT/FDist/InverseGamma/VonMises gained cdf and/or quantile
    for d, f in [(ka.StudentT(4.0), st.t(4.0)),
                 (ka.FDist(5.0, 9.0), st.f(5.0, 9.0)),
                 (ka.InverseGamma(3.0, 2.0), st.invgamma(3.0, scale=2.0)),
                 (ka.VonMises(0.5, 2.0), st.vonmises(2.0, loc=0.5))]:
        qs = np.asarray([0.1, 0.35, 0.6, 0.9], np.float32)
        xs = np.asarray(f.ppf(qs), np.float32)
        assert np.allclose(np.asarray(d.cdf(xs)), qs, atol=2e-5)
        assert np.allclose(np.asarray(d.quantile(qs)), xs, atol=2e-4)


def test_fit_mle_recovers_parameters():
    """Distributions.jl fit/fit_mle: parameters recovered from large
    samples of each supported family (closed forms + scipy numeric MLE).
    """
    key = jax.random.key(0)
    cases = [
        (ka.Normal, ka.Normal(1.5, 2.0), [("mu", 1.5), ("sigma", 2.0)]),
        (ka.LogNormal, ka.LogNormal(0.3, 0.8),
         [("mu", 0.3), ("sigma", 0.8)]),
        (ka.Exponential, ka.Exponential(2.5), [("theta", 2.5)]),
        (ka.Laplace, ka.Laplace(1.0, 2.0), [("mu", 1.0), ("sigma", 2.0)]),
        (ka.Rayleigh, ka.Rayleigh(1.5), [("sigma", 1.5)]),
        (ka.Pareto, ka.Pareto(3.0, 2.0), [("alpha", 3.0), ("theta", 2.0)]),
        (ka.Poisson, ka.Poisson(4.0), [("lam", 4.0)]),
        (ka.Bernoulli, ka.Bernoulli(0.3), [("p", 0.3)]),
        (ka.Geometric, ka.Geometric(0.35), [("p", 0.35)]),
        (ka.Gamma, ka.Gamma(2.5, 1.7), [("alpha", 2.5), ("theta", 1.7)]),
        (ka.Weibull, ka.Weibull(2.0, 1.5),
         [("alpha", 2.0), ("theta", 1.5)]),
        (ka.Beta, ka.Beta(2.0, 5.0), [("alpha", 2.0), ("beta", 5.0)]),
        (ka.Gumbel, ka.Gumbel(0.5, 2.0), [("mu", 0.5), ("theta", 2.0)]),
        (ka.InverseGaussian, ka.InverseGaussian(2.0, 3.0),
         [("mu", 2.0), ("lam", 3.0)]),
    ]
    for cls, d, ps in cases:
        x = np.asarray(d.sample(key, (60_000,)))
        f = ka.fit(cls, x)
        for name, val in ps:
            got = float(getattr(f, name))
            assert abs(got - val) < 0.08 * max(abs(val), 1.0) + 0.02, (
                cls.__name__, name, got, val)

    mv = ka.MvNormal(np.array([1.0, 2.0]),
                     np.array([[2.0, 0.5], [0.5, 1.0]]))
    f = ka.fit_mle(ka.MvNormal, np.asarray(mv.sample(key, (100_000,))))
    assert np.allclose(f.mean, [1.0, 2.0], atol=0.03)
    assert np.allclose(np.asarray(f.cov),
                       [[2.0, 0.5], [0.5, 1.0]], atol=0.06)

    cat = ka.fit(ka.Categorical, np.asarray(
        ka.Categorical([0.2, 0.5, 0.3]).sample(key, (60_000,))))
    assert np.allclose(cat.p, [0.2, 0.5, 0.3], atol=0.015)

    uni = ka.fit(ka.Uniform, np.asarray(
        ka.Uniform(-1.0, 3.0).sample(key, (60_000,))))
    assert abs(float(uni.a) + 1.0) < 0.01 and abs(float(uni.b) - 3.0) < 0.01

    with pytest.raises(NotImplementedError):
        ka.fit(ka.Wishart, np.zeros((10, 2, 2)))


def test_convenience_functions():
    """truncated()/support/product_distribution/cor/loglikelihood/rand —
    the remaining Distributions.jl conveniences."""
    assert ka.support(ka.Beta(2.0, 3.0)) == (0.0, 1.0)
    t = ka.truncated(ka.Normal(0.0, 1.0), lower=0.5)
    assert float(t.lo) == 0.5 and ka.maximum(t) == np.inf
    assert type(ka.truncated(ka.Poisson(3.0), 1, 5)).__name__ == \
        "TruncatedDiscrete"
    assert isinstance(
        ka.product_distribution([ka.Normal(0, 1), ka.Normal(2, 3)]),
        ka.Product)
    assert isinstance(
        ka.product_distribution([ka.Normal(0, 1), ka.Poisson(2.0)]),
        ka.Factored)
    mv = ka.MvNormal(np.zeros(2), np.array([[4.0, 1.0], [1.0, 1.0]]))
    assert np.allclose(ka.cor(mv), [[1.0, 0.5], [0.5, 1.0]], atol=1e-6)
    xs = np.asarray([0.5, -0.3], np.float32)
    assert np.isclose(float(ka.loglikelihood(ka.Normal(0.0, 1.0), xs)),
                      st.norm.logpdf(xs).sum(), rtol=1e-5)
    assert ka.rand(ka.Normal(0.0, 1.0), 5, key=2).shape == (5,)
    tup = ka.rand(ka.Factored(ka.Uniform(0, 1), ka.Poisson(3.0)), 4,
                  key=1)
    assert tup[0].shape == (4,) and str(tup[1].dtype) == "int32"


def test_truncated_far_tail_stats():
    """review r2: finite user bounds must never be tightened by the
    effective-support clamp; far-upper windows need sf-space mass/median.
    Oracles: scipy truncnorm for moments; dense-grid/MC integration for
    entropy (scipy's closed-form truncnorm.entropy() itself suffers
    cancellation at [8,9] and returns -3.195 vs the true -1.111)."""
    t = ka.Truncated(ka.Normal(0.0, 1.0), 8.0, 9.0)
    f = st.truncnorm(8.0, 9.0)
    assert np.isclose(ka.mean(t), f.mean(), rtol=1e-8)
    assert np.isclose(ka.median(t), f.median(), rtol=1e-8)
    assert np.isclose(ka.var(t), f.var(), rtol=1e-6)
    assert 8.0 <= ka.mean(t) <= 9.0 and 8.0 <= ka.median(t) <= 9.0
    xs = np.linspace(8.0, 9.0, 200_001)
    p = f.pdf(xs)
    h = -np.trapezoid(p * np.log(np.maximum(p, 1e-300)), xs)
    assert np.isclose(ka.entropy(t), h, rtol=1e-5)
    # ordinary windows unchanged
    t2 = ka.Truncated(ka.Normal(0.0, 1.0), 7.0, 9.0)
    assert np.isclose(ka.mean(t2), st.truncnorm(7.0, 9.0).mean(),
                      rtol=1e-8)
    # review r2 second pass: VERY WIDE finite windows must not starve
    # Gauss-Kronrod (the un-clamped [-1e4, 1e4] quad silently returned 0)
    tw = ka.Truncated(ka.Normal(0.0, 1.0), -1e4, 1e4)
    assert np.isclose(ka.var(tw), 1.0, rtol=1e-5)
    tw2 = ka.Truncated(ka.Normal(0.0, 1.0), -1e4, 0.5)
    assert np.isclose(ka.mean(tw2), st.truncnorm(-1e4, 0.5).mean(),
                      rtol=1e-6)
    assert np.isclose(ka.entropy(tw2), st.truncnorm(-1e4, 0.5).entropy(),
                      rtol=1e-5)


def test_truncated_vonmises_and_product_multivariate():
    # review r2: VonMises was missing from the twin registry (truncated()
    # raised); multivariate entries crashed Product at sample time
    tv = ka.Truncated(ka.VonMises(0.5, 2.0), 0.0, 1.0)
    x = np.asarray(tv.sample(jax.random.key(0), (5000,)))
    assert x.min() >= 0.0 and x.max() <= 1.0
    assert np.isfinite(ka.mean(tv))
    pd = ka.product_distribution(
        [ka.MvNormal(np.zeros(2), np.eye(2)), ka.Normal(0.0, 1.0)])
    assert isinstance(pd, ka.Factored)
    s = pd.sample_tree(jax.random.key(0))
    assert np.shape(s[0]) == (2,) and np.shape(s[1]) == ()


def test_tail_accurate_survival_functions():
    """ccdf/logccdf dispatch to d.sf/d.logsf overrides (advisor r2):
    f32 `1 - cdf` saturates beyond ~1e-7 tail mass, the survival forms
    must track scipy's float64 sf deep into the tail."""
    from kissabc_tpu import statistics as kst
    cases = [
        (ka.Normal(0.0, 1.0), st.norm(), [3.0, 8.0, 12.0, -3.0]),
        (ka.Exponential(2.0), st.expon(scale=2.0), [1.0, 50.0, 200.0]),
        (ka.Weibull(1.5, 2.0), st.weibull_min(1.5, scale=2.0),
         [1.0, 20.0, 60.0]),
        (ka.LogNormal(0.0, 1.0), st.lognorm(1.0), [1.0, 100.0, 1e4]),
        (ka.Logistic(0.0, 1.0), st.logistic(), [1.0, 40.0, 90.0]),
        (ka.Cauchy(0.0, 1.0), st.cauchy(), [1.0, 1e4, 1e8]),
        (ka.Pareto(2.5, 1.0), st.pareto(2.5), [2.0, 1e4, 1e8]),
        (ka.Gumbel(0.0, 1.0), st.gumbel_r(), [1.0, 30.0, 80.0]),
        (ka.Frechet(2.0, 1.0), st.invweibull(2.0), [1.0, 1e3, 1e6]),
        (ka.Rayleigh(1.0), st.rayleigh(), [1.0, 10.0, 25.0]),
        (ka.Laplace(0.0, 1.0), st.laplace(), [1.0, 40.0, 80.0]),
    ]
    for d, tw, xs in cases:
        for x in xs:
            got = float(kst.logccdf(d, np.float32(x)))
            ref = tw.logsf(x)
            assert abs(got - ref) / max(abs(ref), 1e-12) < 5e-5, (
                d, x, got, ref)
            if ref > -80:  # sf representable in f32
                got_sf = float(kst.ccdf(d, np.float32(x)))
                assert np.isclose(got_sf, tw.sf(x), rtol=2e-4), (
                    d, x, got_sf)
    # generic fallback families still agree where f32 can represent it
    g = ka.Gamma(2.0, 1.0)
    assert np.isclose(float(kst.ccdf(g, np.float32(1.0))),
                      st.gamma(2.0).sf(1.0), rtol=1e-5)
    # the fallback logccdf floor (documented caveat, not a bug)
    assert float(kst.logccdf(g, np.float32(100.0))) <= np.log(1e-36)


def test_sf_logsf_jittable():
    """sf/logsf are pointwise jnp code usable inside jitted programs."""
    d = ka.Normal(0.0, 1.0)
    f = jax.jit(lambda x: (d.sf(x), d.logsf(x)))
    s, ls = f(jnp.asarray([0.0, 5.0], jnp.float32))
    assert np.isclose(float(s[0]), 0.5, atol=1e-6)
    assert np.isclose(float(ls[1]), st.norm().logsf(5.0), rtol=1e-5)
