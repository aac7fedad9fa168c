"""Unit tests: distributions vs scipy closed forms (SURVEY §7 stage 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

import kissabc_tpu as ka

KEY = jax.random.key(42)
N = 20_000


def draws(dist, n=N, key=KEY):
    return np.asarray(dist.sample(key, (n,)))


def test_uniform():
    d = ka.Uniform(-2.0, 3.0)
    x = draws(d)
    assert x.min() >= -2 and x.max() <= 3
    assert abs(x.mean() - 0.5) < 0.05
    assert np.isclose(float(d.logpdf(0.0)), st.uniform(-2, 5).logpdf(0.0), rtol=1e-4)
    assert float(d.logpdf(4.0)) == -np.inf


def test_normal():
    d = ka.Normal(1.5, 0.7)
    x = draws(d)
    assert abs(x.mean() - 1.5) < 0.02
    assert abs(x.std() - 0.7) < 0.02
    xs = np.linspace(-2, 5, 7)
    np.testing.assert_allclose(
        np.asarray(d.logpdf(xs)), st.norm(1.5, 0.7).logpdf(xs), rtol=1e-4)


def test_exponential_scale_param():
    d = ka.Exponential(2.5)  # Distributions.jl scale convention: mean 2.5
    x = draws(d)
    assert abs(x.mean() - 2.5) < 0.06
    xs = np.array([0.1, 1.0, 5.0])
    np.testing.assert_allclose(
        np.asarray(d.logpdf(xs)), st.expon(scale=2.5).logpdf(xs), rtol=1e-4)
    assert float(d.logpdf(-1.0)) == -np.inf


def test_beta():
    d = ka.Beta(15.0, 2.0)  # the socks prop_pairs prior (runtests.jl:51)
    x = draws(d)
    assert abs(x.mean() - 15 / 17) < 0.01
    xs = np.array([0.3, 0.7, 0.95])
    np.testing.assert_allclose(
        np.asarray(d.logpdf(xs)), st.beta(15, 2).logpdf(xs), rtol=2e-3, atol=1e-3)


def test_gamma():
    d = ka.Gamma(3.0, 2.0)
    x = draws(d)
    assert abs(x.mean() - 6.0) < 0.15
    xs = np.array([1.0, 5.0, 12.0])
    np.testing.assert_allclose(
        np.asarray(d.logpdf(xs)), st.gamma(3, scale=2).logpdf(xs), rtol=1e-4)


def test_truncated_normal():
    d = ka.TruncatedNormal(0.0, 0.05, 0.0, 100.0)  # runtests.jl:288 prior
    x = draws(d)
    ref = st.truncnorm(0.0, 100 / 0.05, loc=0, scale=0.05)
    assert x.min() >= 0
    assert abs(x.mean() - ref.mean()) < 0.002
    xs = np.array([0.01, 0.05, 0.12])
    np.testing.assert_allclose(
        np.asarray(d.logpdf(xs)), ref.logpdf(xs), rtol=1e-3)
    assert float(d.logpdf(-0.01)) == -np.inf


def test_discrete_uniform():
    d = ka.DiscreteUniform(1, 10)
    x = draws(d)
    assert d.discrete
    assert x.min() == 1 and x.max() == 10
    assert abs(x.mean() - 5.5) < 0.1
    assert np.isclose(float(d.logpdf(3)), -np.log(10), rtol=1e-4)
    assert float(d.logpdf(11)) == -np.inf


def test_negative_binomial():
    # the socks prior (runtests.jl:46-50)
    mu, sd = 30, 15
    r = -mu**2 / (mu - sd**2)
    p = r / (mu + r)
    d = ka.NegativeBinomial(r, p)
    assert d.discrete
    x = draws(d)
    ref = st.nbinom(r, p)
    assert abs(x.mean() - ref.mean()) < 0.5
    assert abs(x.std() - ref.std()) < 0.5
    ks = np.arange(0, 80)
    np.testing.assert_allclose(
        np.asarray(d.logpdf(ks)), ref.logpmf(ks), rtol=2e-3, atol=2e-3)


def test_poisson():
    d = ka.Poisson(4.0)
    x = draws(d)
    assert abs(x.mean() - 4.0) < 0.1
    ks = np.arange(0, 15)
    np.testing.assert_allclose(
        np.asarray(d.logpdf(ks)), st.poisson(4.0).logpmf(ks), rtol=1e-3, atol=1e-3)


def test_categorical():
    p = np.array([0.2, 0.5, 0.3])
    d = ka.Categorical(p)
    x = draws(d)
    freqs = np.bincount(x, minlength=3) / len(x)
    np.testing.assert_allclose(freqs, p, atol=0.02)
    np.testing.assert_allclose(
        np.asarray(d.logpdf(np.arange(3))), np.log(p), rtol=1e-4)
    assert float(d.logpdf(3)) == -np.inf


def test_mvnormal():
    d = ka.MvNormal(4, 1.0)  # MultivariateNormal(4, 1.0), runtests.jl:186
    assert d.nparams == 4
    x = draws(d)
    assert x.shape == (N, 4)
    np.testing.assert_allclose(x.mean(axis=0), np.zeros(4), atol=0.03)
    pt = np.array([0.5, -1.0, 0.0, 2.0])
    np.testing.assert_allclose(
        float(d.logpdf(pt)),
        st.multivariate_normal(np.zeros(4), np.eye(4)).logpdf(pt), rtol=1e-4)


def test_mvnormal_full_cov():
    cov = np.array([[2.0, 0.5], [0.5, 1.0]])
    d = ka.MvNormal(np.array([1.0, -1.0]), cov)
    x = draws(d)
    np.testing.assert_allclose(np.cov(x.T), cov, atol=0.05)
    pt = np.array([0.0, 0.0])
    np.testing.assert_allclose(
        float(d.logpdf(pt)),
        st.multivariate_normal([1, -1], cov).logpdf(pt), rtol=1e-4)


def test_product():
    d = ka.Product([ka.Normal(0, 1), ka.Normal(5, 2)])
    x = draws(d)
    assert x.shape == (N, 2)
    assert abs(x[:, 1].mean() - 5) < 0.05
    np.testing.assert_allclose(
        float(d.logpdf(np.array([0.0, 5.0]))),
        st.norm(0, 1).logpdf(0) + st.norm(5, 2).logpdf(5), rtol=1e-4)
    with pytest.raises(ValueError):
        ka.Product([ka.Normal(0, 1), ka.DiscreteUniform(0, 1)])


def test_distributions_are_traceable():
    d = ka.Beta(2.0, 3.0)

    @jax.jit
    def f(key):
        return d.sample(key, (4,)), d.logpdf(0.5)

    x, lp = f(KEY)
    assert x.shape == (4,)
    assert np.isfinite(float(lp))


def test_laplace():
    d = ka.Laplace(1.0, 2.0)
    x = draws(d)
    assert abs(x.mean() - 1.0) < 0.05
    xs = np.array([-1.0, 1.0, 4.0])
    np.testing.assert_allclose(
        np.asarray(d.logpdf(xs)), st.laplace(1, 2).logpdf(xs), rtol=1e-4)


def test_cauchy():
    d = ka.Cauchy(0.5, 1.5)
    x = draws(d)
    assert abs(np.median(x) - 0.5) < 0.05
    xs = np.array([-2.0, 0.5, 3.0])
    np.testing.assert_allclose(
        np.asarray(d.logpdf(xs)), st.cauchy(0.5, 1.5).logpdf(xs), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(d.cdf(0.5)), 0.5, atol=1e-6)


def test_student_t():
    d = ka.StudentT(5.0)
    x = draws(d)
    assert abs(x.mean()) < 0.05
    xs = np.array([-2.0, 0.0, 1.0])
    np.testing.assert_allclose(
        np.asarray(d.logpdf(xs)), st.t(5).logpdf(xs), rtol=1e-3)


def test_weibull():
    d = ka.Weibull(2.0, 3.0)
    x = draws(d)
    ref = st.weibull_min(2, scale=3)
    assert abs(x.mean() - ref.mean()) < 0.05
    xs = np.array([0.5, 2.0, 6.0])
    np.testing.assert_allclose(
        np.asarray(d.logpdf(xs)), ref.logpdf(xs), rtol=1e-3)


def test_binomial():
    d = ka.Binomial(20, 0.3)
    assert d.discrete
    x = draws(d, n=5000)
    assert abs(x.mean() - 6.0) < 0.15
    ks = np.arange(0, 21)
    np.testing.assert_allclose(
        np.asarray(d.logpdf(ks)), st.binom(20, 0.3).logpmf(ks),
        rtol=1e-3, atol=1e-3)
    assert float(d.logpdf(21)) == -np.inf


def test_geometric():
    d = ka.Geometric(0.3)
    assert d.discrete
    x = draws(d)
    ref_mean = (1 - 0.3) / 0.3
    assert abs(x.mean() - ref_mean) < 0.1
    ks = np.arange(0, 15)
    np.testing.assert_allclose(
        np.asarray(d.logpdf(ks)), st.geom(0.3, loc=-1).logpmf(ks), rtol=1e-4)


def test_chisq():
    d = ka.Chisq(5.0)
    x = draws(d)
    assert abs(x.mean() - 5.0) < 0.1
    xs = np.array([1.0, 4.0, 11.0])
    np.testing.assert_allclose(
        np.asarray(d.logpdf(xs)), st.chi2(5).logpdf(xs), rtol=1e-4)
    assert float(d.logpdf(-0.5)) == -np.inf
    np.testing.assert_allclose(
        np.asarray(d.cdf(xs)), st.chi2(5).cdf(xs), atol=1e-5)
    assert abs(float(d.quantile(0.7)) - st.chi2(5).ppf(0.7)) < 1e-3


def test_tdist_alias():
    assert ka.TDist is ka.StudentT
    d = ka.TDist(4.0)
    xs = np.array([-2.0, 0.0, 1.5])
    np.testing.assert_allclose(
        np.asarray(d.logpdf(xs)), st.t(4).logpdf(xs), rtol=1e-4)


def test_fdist():
    d = ka.FDist(6.0, 14.0)
    x = draws(d)
    assert abs(x.mean() - 14.0 / 12.0) < 0.05
    xs = np.array([0.3, 1.0, 2.5])
    np.testing.assert_allclose(
        np.asarray(d.logpdf(xs)), st.f(6, 14).logpdf(xs), rtol=1e-4)
    assert float(d.logpdf(-1.0)) == -np.inf
    np.testing.assert_allclose(
        np.asarray(d.cdf(xs)), st.f(6, 14).cdf(xs), atol=1e-5)


def test_logistic():
    d = ka.Logistic(1.0, 2.0)
    x = draws(d)
    assert abs(x.mean() - 1.0) < 0.1
    xs = np.array([-4.0, 1.0, 7.0])
    np.testing.assert_allclose(
        np.asarray(d.logpdf(xs)), st.logistic(1, 2).logpdf(xs), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(d.cdf(xs)), st.logistic(1, 2).cdf(xs), atol=1e-5)
    assert abs(float(d.quantile(0.9)) - st.logistic(1, 2).ppf(0.9)) < 1e-3


def test_rayleigh():
    d = ka.Rayleigh(1.5)
    x = draws(d)
    ref = st.rayleigh(scale=1.5)
    assert abs(x.mean() - ref.mean()) < 0.03
    xs = np.array([0.5, 1.5, 4.0])
    np.testing.assert_allclose(
        np.asarray(d.logpdf(xs)), ref.logpdf(xs), rtol=1e-4)
    assert float(d.logpdf(-0.1)) == -np.inf
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs), atol=1e-5)


def test_pareto():
    d = ka.Pareto(3.0, 2.0)
    x = draws(d)
    ref = st.pareto(3, scale=2)
    assert x.min() >= 2.0
    assert abs(x.mean() - ref.mean()) < 0.05
    xs = np.array([2.1, 3.0, 8.0])
    np.testing.assert_allclose(
        np.asarray(d.logpdf(xs)), ref.logpdf(xs), rtol=1e-4)
    assert float(d.logpdf(1.9)) == -np.inf
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs), atol=1e-5)


def test_inverse_gamma():
    d = ka.InverseGamma(4.0, 3.0)
    x = draws(d)
    ref = st.invgamma(4, scale=3)
    assert abs(x.mean() - ref.mean()) < 0.02
    xs = np.array([0.4, 1.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(d.logpdf(xs)), ref.logpdf(xs), rtol=1e-4)
    assert float(d.logpdf(-1.0)) == -np.inf
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs), atol=2e-5)


def test_dirichlet():
    alpha = np.array([2.0, 5.0, 3.0])
    d = ka.Dirichlet(alpha)
    assert d.nparams == 3
    x = draws(d)
    np.testing.assert_allclose(x.sum(axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(x.mean(axis=0), alpha / alpha.sum(), atol=0.01)
    pt = np.array([0.2, 0.5, 0.3], np.float32)
    np.testing.assert_allclose(
        float(d.logpdf(pt)), st.dirichlet(alpha).logpdf(pt), rtol=1e-4)
    off = np.array([0.2, 0.5, 0.4], np.float32)  # sums to 1.1
    assert float(d.logpdf(off)) == -np.inf
    neg = np.array([-0.1, 0.6, 0.5], np.float32)
    assert float(d.logpdf(neg)) == -np.inf


def test_multinomial():
    p = np.array([0.2, 0.5, 0.3])
    d = ka.Multinomial(10, p)
    assert d.discrete and d.nparams == 3
    x = draws(d, n=5000)
    np.testing.assert_allclose(x.sum(axis=-1), 10.0, atol=1e-5)
    np.testing.assert_allclose(x.mean(axis=0), 10 * p, atol=0.15)
    pt = np.array([2.0, 5.0, 3.0])
    np.testing.assert_allclose(
        float(d.logpdf(pt)), st.multinomial(10, p).logpmf(pt), rtol=1e-4)
    assert float(d.logpdf(np.array([2.0, 5.0, 4.0]))) == -np.inf  # sum 11
    assert float(d.logpdf(np.array([-1.0, 8.0, 3.0]))) == -np.inf
    # a zero-probability class with a nonzero count is impossible
    dz = ka.Multinomial(4, np.array([0.5, 0.5, 0.0]))
    assert float(dz.logpdf(np.array([2.0, 1.0, 1.0]))) == -np.inf
    assert np.isfinite(float(dz.logpdf(np.array([3.0, 1.0, 0.0]))))


def test_truncated_far_tail_log_space():
    # reference ADVICE: Truncated(Normal(0,1), 8, 9) used to underflow to
    # _lz = -inf (linear-space cdf difference); now computed in survival
    # space, and sampling switches to the sf domain
    d = ka.Truncated(ka.Normal(0.0, 1.0), 8.0, 9.0)
    ref = st.truncnorm(8.0, 9.0)
    xs = np.array([8.1, 8.4, 8.9])
    np.testing.assert_allclose(
        np.asarray(d.logpdf(xs)), ref.logpdf(xs), rtol=1e-3)
    x = draws(d, n=4000)
    assert x.min() >= 8.0 and x.max() <= 9.0
    assert abs(x.mean() - ref.mean()) < 0.01
    # a window with truly zero f64 mass raises instead of going -inf
    with pytest.raises(ValueError):
        ka.Truncated(ka.Normal(0.0, 1.0), 40.0, 41.0)


def test_bernoulli():
    d = ka.Bernoulli(0.3)
    assert d.discrete
    x = draws(d)
    assert set(np.unique(x)) <= {0, 1}
    assert abs(x.mean() - 0.3) < 0.01
    np.testing.assert_allclose(
        np.asarray(d.logpdf(np.array([0.0, 1.0]))),
        st.bernoulli(0.3).logpmf([0, 1]), rtol=1e-5)
    assert float(d.logpdf(2.0)) == -np.inf
    assert float(d.logpdf(-1.0)) == -np.inf


def test_gumbel():
    d = ka.Gumbel(1.0, 2.0)
    ref = st.gumbel_r(1.0, 2.0)
    x = draws(d)
    assert abs(x.mean() - ref.mean()) < 0.05
    xs = np.array([-3.0, 1.0, 6.0])
    np.testing.assert_allclose(
        np.asarray(d.logpdf(xs)), ref.logpdf(xs), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs),
                               atol=1e-5)
    assert abs(float(d.quantile(0.8)) - ref.ppf(0.8)) < 1e-3


def test_triangular():
    d = ka.TriangularDist(-1.0, 3.0, 0.5)
    ref = st.triang((0.5 - -1.0) / 4.0, loc=-1.0, scale=4.0)
    x = draws(d)
    assert x.min() >= -1.0 and x.max() <= 3.0
    assert abs(x.mean() - ref.mean()) < 0.02
    xs = np.array([-0.5, 0.5, 2.0])
    np.testing.assert_allclose(
        np.asarray(d.logpdf(xs)), ref.logpdf(xs), rtol=1e-4)
    assert float(d.logpdf(-1.5)) == -np.inf
    assert float(d.logpdf(3.5)) == -np.inf
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs),
                               atol=1e-5)
    assert abs(float(d.quantile(0.25)) - ref.ppf(0.25)) < 1e-3
    # degenerate modes at the endpoints still integrate
    lo = ka.TriangularDist(0.0, 1.0, 0.0)
    hi = ka.TriangularDist(0.0, 1.0, 1.0)
    np.testing.assert_allclose(float(lo.cdf(0.5)), 0.75, atol=1e-6)
    np.testing.assert_allclose(float(hi.cdf(0.5)), 0.25, atol=1e-6)
    with pytest.raises(ValueError):
        ka.TriangularDist(0.0, 1.0, 2.0)


def test_bernoulli_in_factored_prior():
    # Bernoulli marginal evolves in float and snaps to {0,1} at push
    pri = ka.Factored(ka.Bernoulli(0.7), ka.Normal(0.0, 1.0))
    s = pri.sample(jax.random.PRNGKey(0), (64,))
    assert s[0].dtype == jnp.int32
    lp = pri.logpdf(s)
    assert np.all(np.isfinite(np.asarray(lp)))


def test_truncated_far_tail_cdf_quantile():
    # review r2: cdf/quantile on a far-tail window used to be nan/inf
    # (normalizer chi - clo underflows); now computed in survival space
    d = ka.Truncated(ka.Normal(0.0, 1.0), 8.0, 9.0)
    ref = st.truncnorm(8.0, 9.0)
    xs = np.array([8.1, 8.4, 8.9])
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs),
                               atol=2e-4)
    for q in (0.1, 0.5, 0.9):
        assert abs(float(d.quantile(q)) - ref.ppf(q)) < 1e-2
    # ordinary windows keep working and clip to the support
    dn = ka.Truncated(ka.Normal(0.0, 1.0), -1.0, 1.0)
    refn = st.truncnorm(-1.0, 1.0)
    np.testing.assert_allclose(np.asarray(dn.cdf(xs - 8.2)),
                               refn.cdf(xs - 8.2), atol=1e-5)
    assert abs(float(dn.quantile(0.3)) - refn.ppf(0.3)) < 1e-3


def test_triangular_endpoint_mode_logpdf():
    # review r2: c == a (or b) gave nan at the mode (log0 - log0)
    lo = ka.TriangularDist(0.0, 1.0, 0.0)
    hi = ka.TriangularDist(0.0, 1.0, 1.0)
    np.testing.assert_allclose(float(lo.logpdf(0.0)), np.log(2.0),
                               rtol=1e-6)
    np.testing.assert_allclose(float(hi.logpdf(1.0)), np.log(2.0),
                               rtol=1e-6)
    ref_lo = st.triang(0.0, loc=0.0, scale=1.0)
    xs = np.array([0.25, 0.5, 0.75])
    np.testing.assert_allclose(np.asarray(lo.logpdf(xs)),
                               ref_lo.logpdf(xs), rtol=1e-4)
    assert float(lo.logpdf(-0.1)) == -np.inf
    assert float(lo.logpdf(1.0)) == -np.inf  # density 0 at far endpoint


def test_bernoulli_degenerate():
    # review r2: p=0/1 clamps assigned finite logp to impossible outcomes
    assert float(ka.Bernoulli(1.0).logpdf(0.0)) == -np.inf
    assert float(ka.Bernoulli(1.0).logpdf(1.0)) == 0.0
    assert float(ka.Bernoulli(0.0).logpdf(1.0)) == -np.inf
    assert float(ka.Bernoulli(0.0).logpdf(0.0)) == 0.0
    assert int(ka.Bernoulli(1.0).sample(jax.random.key(0), ())) == 1
    assert int(ka.Bernoulli(0.0).sample(jax.random.key(0), ())) == 0


# ---------------------------------------------------------------------------
# tier-3 widening (r2): Distributions.jl re-export breadth, scipy oracles
# ---------------------------------------------------------------------------

def test_arcsine():
    d = ka.Arcsine(-1.0, 3.0)
    ref = st.arcsine(loc=-1.0, scale=4.0)
    x = draws(d)
    assert x.min() >= -1 and x.max() <= 3
    assert abs(x.mean() - ref.mean()) < 0.03
    xs = np.array([-0.5, 1.0, 2.5])
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref.logpdf(xs),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs),
                               rtol=1e-4)
    for q in (0.1, 0.5, 0.9):
        assert abs(float(d.quantile(q)) - ref.ppf(q)) < 1e-4
    assert float(d.logpdf(3.5)) == -np.inf


def test_semicircle():
    d = ka.Semicircle(2.0)
    ref = st.semicircular(scale=2.0)
    x = draws(d)
    assert np.abs(x).max() <= 2.0
    assert abs(x.mean()) < 0.02
    assert abs(x.std() - ref.std()) < 0.02
    xs = np.array([-1.5, 0.0, 1.0])
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref.logpdf(xs),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs),
                               atol=1e-5)
    assert abs(float(d.quantile(0.25)) - ref.ppf(0.25)) < 1e-4
    assert float(d.logpdf(2.1)) == -np.inf


def test_frechet():
    d = ka.Frechet(3.0, 2.0)
    ref = st.invweibull(3.0, scale=2.0)
    x = draws(d)
    assert x.min() > 0
    assert abs(np.median(x) - ref.median()) < 0.03
    xs = np.array([0.8, 2.0, 5.0])
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref.logpdf(xs),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs),
                               rtol=1e-4)
    assert abs(float(d.quantile(0.7)) - ref.ppf(0.7)) < 1e-4
    assert float(d.logpdf(-1.0)) == -np.inf


def test_levy():
    d = ka.Levy(1.0, 2.0)
    ref = st.levy(loc=1.0, scale=2.0)
    x = draws(d)
    assert x.min() > 1.0
    assert abs(np.median(x) - ref.median()) < 0.2
    xs = np.array([1.5, 3.0, 10.0])
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref.logpdf(xs),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs),
                               atol=1e-5)
    for q in (0.2, 0.5, 0.8):
        assert abs(float(d.quantile(q)) - ref.ppf(q)) / ref.ppf(q) < 1e-3
    assert float(d.logpdf(0.5)) == -np.inf


@pytest.mark.parametrize("xi", [0.0, 0.3, -0.4])
def test_generalized_pareto(xi):
    d = ka.GeneralizedPareto(0.5, 2.0, xi)
    ref = st.genpareto(xi, loc=0.5, scale=2.0)
    x = draws(d)
    assert x.min() >= 0.5
    if xi < 0:
        assert x.max() <= 0.5 + 2.0 / 0.4 + 1e-3
    assert abs(np.median(x) - ref.median()) < 0.1
    xs = np.array([0.7, 1.5, 3.0])
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref.logpdf(xs),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs),
                               atol=1e-5)
    for q in (0.3, 0.9):
        assert abs(float(d.quantile(q)) - ref.ppf(q)) < 2e-3
    assert float(d.logpdf(0.0)) == -np.inf


def test_kumaraswamy():
    # Kumaraswamy(1, b) == Beta(1, b): exact oracle via the special case
    d1 = ka.Kumaraswamy(1.0, 3.0)
    ref1 = st.beta(1.0, 3.0)
    xs = np.array([0.1, 0.4, 0.8])
    np.testing.assert_allclose(np.asarray(d1.logpdf(xs)), ref1.logpdf(xs),
                               rtol=1e-4)
    # general case: closed-form mean b*B(1+1/a, b) + cdf round trip
    import scipy.special as sps_
    a, b = 2.0, 5.0
    d = ka.Kumaraswamy(a, b)
    x = draws(d)
    mean = b * sps_.beta(1 + 1 / a, b)
    assert abs(x.mean() - mean) < 0.01
    qs = np.array([0.2, 0.5, 0.9], np.float32)
    np.testing.assert_allclose(np.asarray(d.cdf(d.quantile(qs))), qs,
                               atol=1e-5)
    assert float(d.logpdf(1.5)) == -np.inf


def test_vonmises():
    d = ka.VonMises(0.5, 2.0)
    ref = st.vonmises(2.0, loc=0.5)
    x = draws(d)
    assert np.abs(x - 0.5).max() <= np.pi + 1e-5
    # circular mean
    assert abs(np.angle(np.exp(1j * x).mean()) - 0.5) < 0.02
    xs = np.array([-0.5, 0.5, 1.5])
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref.logpdf(xs),
                               rtol=1e-4)
    # table-inverse sampling: KS test against scipy
    ks = st.kstest(x[:2000], ref.cdf)
    assert ks.pvalue > 1e-3


def test_erlang():
    d = ka.Erlang(4, 0.5)
    ref = st.gamma(4, scale=0.5)
    xs = np.array([0.5, 2.0, 4.0])
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref.logpdf(xs),
                               rtol=1e-4)
    with pytest.raises(ValueError):
        ka.Erlang(2.5, 1.0)


def test_beta_binomial():
    d = ka.BetaBinomial(10, 2.0, 3.0)
    ref = st.betabinom(10, 2.0, 3.0)
    x = draws(d)
    assert x.dtype == np.int32 and x.min() >= 0 and x.max() <= 10
    assert abs(x.mean() - ref.mean()) < 0.05
    assert abs(x.std() - ref.std()) < 0.05
    ks = np.arange(0, 11)
    np.testing.assert_allclose(np.asarray(d.logpdf(ks)), ref.logpmf(ks),
                               rtol=1e-3, atol=1e-3)
    assert float(d.logpdf(11)) == -np.inf


def test_hypergeometric():
    d = ka.Hypergeometric(7, 5, 6)  # 7 successes, 5 failures, 6 draws
    ref = st.hypergeom(12, 7, 6)
    x = draws(d)
    assert x.min() >= 1 and x.max() <= 6  # support max(0,6-5)..min(6,7)
    assert abs(x.mean() - ref.mean()) < 0.03
    ks = np.arange(1, 7)
    np.testing.assert_allclose(np.asarray(d.logpdf(ks)), ref.logpmf(ks),
                               rtol=1e-4, atol=1e-5)
    assert float(d.logpdf(0)) == -np.inf
    assert float(d.logpdf(7)) == -np.inf


def test_skellam():
    d = ka.Skellam(3.0, 1.5)
    ref = st.skellam(3.0, 1.5)
    x = draws(d)
    assert abs(x.mean() - 1.5) < 0.05
    assert abs(x.std() - ref.std()) < 0.05
    ks = np.arange(-6, 10)
    np.testing.assert_allclose(np.asarray(d.logpdf(ks)), ref.logpmf(ks),
                               rtol=1e-3, atol=1e-3)
    # larger rates exercise the series length heuristic
    d2 = ka.Skellam(40.0, 35.0)
    ref2 = st.skellam(40.0, 35.0)
    ks2 = np.arange(-20, 35, 5)
    np.testing.assert_allclose(np.asarray(d2.logpdf(ks2)),
                               ref2.logpmf(ks2), rtol=1e-3, atol=2e-3)


def test_tier3_in_factored_prior():
    # every new distribution plays in a Factored prior end-to-end
    pri = ka.Factored(ka.Arcsine(0.0, 1.0), ka.VonMises(0.0, 1.0),
                      ka.BetaBinomial(5, 1.0, 1.0), ka.Skellam(2.0, 2.0))
    s = pri.sample_tree(jax.random.key(0))
    lp = pri.logpdf(s)
    assert np.isfinite(float(lp))
    pushed = pri.push(s)
    assert pushed[2].dtype == jnp.int32
    assert pushed[3].dtype == jnp.int32


def test_truncated_discrete_poisson():
    # Distributions.jl parity: truncated(Poisson(4), 2, 8) — Truncated
    # dispatches discrete bases to the host-tabulated TruncatedDiscrete
    d = ka.Truncated(ka.Poisson(4.0), 2, 8)
    assert isinstance(d, ka.TruncatedDiscrete) and d.discrete
    x = draws(d)
    assert x.dtype == np.int32 and x.min() >= 2 and x.max() <= 8
    ref = st.poisson(4.0)
    mass = ref.cdf(8) - ref.cdf(1)
    ks = np.arange(2, 9)
    np.testing.assert_allclose(np.asarray(d.logpdf(ks)),
                               ref.logpmf(ks) - np.log(mass), rtol=1e-4)
    assert float(d.logpdf(1)) == -np.inf
    assert float(d.logpdf(9)) == -np.inf
    # moments against the renormalized law
    mean = (ks * ref.pmf(ks)).sum() / mass
    assert abs(x.mean() - mean) < 0.05
    # cdf/quantile round trip on the lattice
    np.testing.assert_allclose(float(d.cdf(4)),
                               (ref.cdf(4) - ref.cdf(1)) / mass, rtol=1e-4)
    assert int(d.quantile(0.5)) == 4


def test_truncated_discrete_unbounded_side():
    # one-sided truncation: lower tail cut, upper side unbounded
    d = ka.Truncated(ka.NegativeBinomial(5.0, 0.4), 3, np.inf)
    x = draws(d)
    assert x.min() >= 3
    ref = st.nbinom(5.0, 0.4)
    mass = 1.0 - ref.cdf(2)
    ks = np.arange(3, 20)
    np.testing.assert_allclose(np.asarray(d.logpdf(ks)),
                               ref.logpmf(ks) - np.log(mass), rtol=1e-3)


def test_truncated_discrete_in_factored_smc():
    # end-to-end: truncated-discrete prior keeps the integer push policy
    import jax.numpy as jnp
    pri = ka.Factored(ka.Truncated(ka.Poisson(10.0), 5, 20),
                      ka.Uniform(0.0, 1.0))
    s = pri.sample_tree(jax.random.key(0))
    assert s[0].dtype == jnp.int32
    assert np.isfinite(float(pri.logpdf(s)))

    def cost(th, key):
        k, u = th
        return jnp.abs(k.astype(jnp.float32) - 12.0) * 0.1 + jnp.abs(u - 0.5)

    # the budget cap (max_iters=40) fires before epstol on this discrete
    # cost floor — expected here; the assertions below are about dtypes
    with pytest.warns(RuntimeWarning, match="max_iters"):
        res = ka.smc(pri, cost, nparticles=256, epstol=0.2, max_iters=40,
                     key=3)
    ks = np.asarray(res.P[0].particles)
    assert ks.dtype in (np.int32, np.float32)
    assert (np.round(ks) == ks).all()
    assert 5 <= ks.min() and ks.max() <= 20


def test_mixture_continuous():
    # Distributions.jl MixtureModel parity: 0.3 N(-2,1) + 0.7 N(3,0.5)
    d = ka.Mixture([ka.Normal(-2.0, 1.0), ka.Normal(3.0, 0.5)],
                   [0.3, 0.7])
    x = draws(d)
    mean = 0.3 * -2.0 + 0.7 * 3.0
    assert abs(x.mean() - mean) < 0.05
    xs = np.array([-3.0, 0.0, 2.5, 3.5])
    ref = np.log(0.3 * st.norm(-2, 1).pdf(xs) + 0.7 * st.norm(3, 0.5).pdf(xs))
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref, rtol=1e-4)
    refc = 0.3 * st.norm(-2, 1).cdf(xs) + 0.7 * st.norm(3, 0.5).cdf(xs)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), refc, atol=1e-5)
    # quantile inverts cdf (bisection)
    for q in (0.1, 0.5, 0.9):
        assert abs(float(d.cdf(d.quantile(np.float32(q)))) - q) < 1e-4
    # KS against the mixture law
    ks = st.kstest(x[:4000], lambda v: 0.3 * st.norm(-2, 1).cdf(v)
                   + 0.7 * st.norm(3, 0.5).cdf(v))
    assert ks.pvalue > 1e-3
    # MixtureModel alias + uniform default weights
    d2 = ka.MixtureModel([ka.Uniform(0, 1), ka.Uniform(2, 3)])
    x2 = draws(d2)
    assert abs((x2 < 1.5).mean() - 0.5) < 0.03


def test_mixture_discrete_and_validation():
    d = ka.Mixture([ka.Poisson(2.0), ka.Poisson(10.0)], [0.5, 0.5])
    assert d.discrete
    x = draws(d)
    assert x.dtype == np.int32
    ks = np.arange(0, 20)
    ref = np.log(0.5 * st.poisson(2).pmf(ks) + 0.5 * st.poisson(10).pmf(ks))
    np.testing.assert_allclose(np.asarray(d.logpdf(ks)), ref, rtol=1e-3)
    import pytest
    with pytest.raises(ValueError, match="discrete or all continuous"):
        ka.Mixture([ka.Normal(0, 1), ka.Poisson(2.0)])
    with pytest.raises(ValueError, match="weights"):
        ka.Mixture([ka.Normal(0, 1)], [-1.0])
    # mixture prior end-to-end in a Factored smc
    import jax.numpy as jnp
    pri = ka.Factored(ka.Mixture([ka.Normal(-2, 0.5), ka.Normal(2, 0.5)]),
                      ka.Uniform(0, 1))
    res = ka.smc(pri, lambda th, key: jnp.abs(jnp.abs(th[0]) - 2.0),
                 nparticles=256, epstol=0.1, max_iters=40, key=1)
    assert np.isfinite(np.asarray(res.P[0].particles)).all()


def test_affine_location_scale():
    # Distributions.jl `a + b*dist` idiom via operator sugar
    d = 2.0 + 3.0 * ka.Exponential(1.0)          # shifted-scaled exp
    assert isinstance(d, ka.Affine)
    ref = st.expon(loc=2.0, scale=3.0)
    x = draws(d)
    assert x.min() >= 2.0
    assert abs(x.mean() - ref.mean()) < 0.1
    xs = np.array([2.5, 4.0, 9.0])
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref.logpdf(xs),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs),
                               rtol=1e-4)
    assert abs(float(d.quantile(0.6)) - ref.ppf(0.6)) < 1e-3
    # negative scale flips the support; composition flattens Affine
    dneg = 1.0 - ka.Exponential(2.0)
    assert isinstance(dneg, ka.Affine) and not isinstance(dneg.base,
                                                          ka.Affine)
    xn = draws(dneg)
    assert xn.max() <= 1.0
    refn = 1.0 - st.expon(scale=2.0).ppf(0.75)
    assert abs(float(dneg.quantile(0.25)) - refn) < 1e-3
    np.testing.assert_allclose(float(dneg.cdf(0.0)),
                               1.0 - st.expon(scale=2.0).cdf(1.0),
                               rtol=1e-4)
    # composition: 2*(1 + Normal) + 1 == Normal(3, 2)
    dc = 2.0 * (1.0 + ka.Normal(0.0, 1.0)) + 1.0
    np.testing.assert_allclose(np.asarray(dc.logpdf(xs)),
                               st.norm(3.0, 2.0).logpdf(xs), rtol=1e-4)
    # discrete bases are rejected
    import pytest
    with pytest.raises(ValueError, match="continuous"):
        2.0 * ka.Poisson(3.0)
    # works as a Factored prior component
    pri = ka.Factored(10.0 + 0.5 * ka.Gamma(2.0, 1.0), ka.Uniform(0, 1))
    s = pri.sample_tree(jax.random.key(0))
    assert np.isfinite(float(pri.logpdf(s)))


# --------------------------------------------------------------------------
# Tier-4 closed-form batch
# --------------------------------------------------------------------------

def test_log_uniform():
    d = ka.LogUniform(0.5, 8.0)
    ref = st.loguniform(0.5, 8.0)
    x = draws(d)
    assert x.min() >= 0.5 and x.max() <= 8.0
    assert abs(x.mean() - ref.mean()) < 0.05
    xs = np.array([0.7, 2.0, 6.5])
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref.logpdf(xs),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs), rtol=1e-4)
    assert abs(float(d.quantile(0.3)) - ref.ppf(0.3)) < 1e-3
    assert float(d.logpdf(0.4)) == -np.inf


def test_sym_triangular():
    d = ka.SymTriangularDist(1.0, 2.0)
    ref = st.triang(0.5, loc=-1.0, scale=4.0)
    x = draws(d)
    assert abs(x.mean() - 1.0) < 0.03
    assert x.min() >= -1.0 and x.max() <= 3.0
    xs = np.array([-0.5, 1.0, 2.5])
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref.logpdf(xs),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs), rtol=1e-4)
    qs = np.array([0.1, 0.5, 0.9])
    np.testing.assert_allclose(np.asarray(d.quantile(qs)), ref.ppf(qs),
                               atol=1e-4)
    assert float(d.logpdf(3.5)) == -np.inf


def test_cosine():
    d = ka.Cosine(0.5, 2.0)
    # scipy's raised cosine has support [loc-pi*scale, loc+pi*scale]
    ref = st.cosine(loc=0.5, scale=2.0 / np.pi)
    x = draws(d)
    assert abs(x.mean() - 0.5) < 0.03
    xs = np.array([-1.0, 0.5, 1.8])
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref.logpdf(xs),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs),
                               rtol=1e-3, atol=1e-5)
    assert abs(float(d.quantile(0.75)) - ref.ppf(0.75)) < 1e-3


@pytest.mark.parametrize("cls,c", [(ka.Epanechnikov, 4), (ka.Biweight, 6),
                                   (ka.Triweight, 8)])
def test_poly_kernels(cls, c):
    d = cls(1.0, 3.0)
    # scipy rdist(c): pdf ∝ (1-x^2)^(c/2-1) on [-1,1]
    ref = st.rdist(c, loc=1.0, scale=3.0)
    x = draws(d)
    assert abs(x.mean() - 1.0) < 0.05
    assert x.min() >= -2.0 and x.max() <= 4.0
    xs = np.array([-1.0, 1.0, 3.2])
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref.logpdf(xs),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs),
                               rtol=1e-3, atol=1e-5)
    qs = np.array([0.2, 0.5, 0.8])
    np.testing.assert_allclose(np.asarray(d.quantile(qs)), ref.ppf(qs),
                               atol=2e-3)
    assert float(d.logpdf(4.5)) == -np.inf


def test_johnson_su():
    d = ka.JohnsonSU(-1.0, 2.0, 0.5, 1.5)   # xi, lambda, gamma, delta
    ref = st.johnsonsu(0.5, 1.5, loc=-1.0, scale=2.0)
    x = draws(d)
    assert abs(x.mean() - ref.mean()) < 0.05
    xs = np.array([-3.0, -1.0, 1.5])
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref.logpdf(xs),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs), rtol=1e-3)
    qs = np.array([0.1, 0.5, 0.9])
    np.testing.assert_allclose(np.asarray(d.quantile(qs)), ref.ppf(qs),
                               atol=2e-3)


@pytest.mark.parametrize("xi", [0.3, 0.0, -0.25])
def test_generalized_extreme_value(xi):
    d = ka.GeneralizedExtremeValue(0.5, 2.0, xi)
    ref = st.genextreme(-xi, loc=0.5, scale=2.0)
    x = draws(d)
    assert abs(np.median(x) - ref.median()) < 0.06
    xs = np.array([-1.0, 0.5, 4.0], np.float32)
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref.logpdf(xs),
                               rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs),
                               rtol=2e-3, atol=1e-5)
    qs = np.array([0.1, 0.5, 0.9])
    np.testing.assert_allclose(np.asarray(d.quantile(qs)), ref.ppf(qs),
                               rtol=1e-3, atol=2e-3)
    if xi > 0:
        assert float(d.logpdf(0.5 - 2.0 / xi - 0.5)) == -np.inf
    elif xi < 0:
        assert float(d.logpdf(0.5 + 2.0 / (-xi) + 0.5)) == -np.inf


def test_normal_canon():
    d = ka.NormalCanon(3.0, 4.0)   # eta, lambda -> Normal(0.75, 0.5)
    assert isinstance(d, ka.Normal)
    ref = st.norm(0.75, 0.5)
    xs = np.array([0.0, 0.75, 1.5])
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref.logpdf(xs),
                               rtol=1e-4)


# --------------------------------------------------------------------------
# Tier-4 special-function batch
# --------------------------------------------------------------------------

def test_inverse_gaussian():
    d = ka.InverseGaussian(2.0, 5.0)     # mu, lambda
    ref = st.invgauss(2.0 / 5.0, scale=5.0)
    x = draws(d)
    assert x.min() > 0
    assert abs(x.mean() - 2.0) < 0.05
    xs = np.array([0.5, 2.0, 6.0])
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref.logpdf(xs),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs),
                               rtol=1e-3, atol=1e-6)
    qs = np.array([0.1, 0.5, 0.9])
    np.testing.assert_allclose(np.asarray(d.quantile(qs)), ref.ppf(qs),
                               rtol=2e-3)
    assert float(d.logpdf(-0.5)) == -np.inf


def test_chi():
    d = ka.Chi(3.0)   # Maxwell-Boltzmann
    ref = st.chi(3.0)
    x = draws(d)
    assert abs(x.mean() - ref.mean()) < 0.02
    xs = np.array([0.5, 1.5, 3.0])
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref.logpdf(xs),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs),
                               rtol=1e-3, atol=1e-6)
    assert abs(float(d.quantile(0.7)) - ref.ppf(0.7)) < 2e-3


def test_beta_prime():
    d = ka.BetaPrime(3.0, 5.0)
    ref = st.betaprime(3.0, 5.0)
    x = draws(d)
    assert x.min() > 0
    assert abs(x.mean() - ref.mean()) < 0.03
    xs = np.array([0.2, 0.75, 2.5])
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref.logpdf(xs),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs),
                               rtol=1e-3, atol=1e-6)
    assert abs(float(d.quantile(0.4)) - ref.ppf(0.4)) < 2e-3


@pytest.mark.parametrize("p", [0.7, 1.5, 4.0])
def test_pgeneralized_gaussian(p):
    d = ka.PGeneralizedGaussian(0.5, 2.0, p)
    ref = st.gennorm(p, loc=0.5, scale=2.0)
    x = draws(d)
    assert abs(x.mean() - 0.5) < 0.15
    xs = np.array([-2.0, 0.5, 3.0])
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref.logpdf(xs),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs),
                               rtol=1e-3, atol=1e-5)
    qs = np.array([0.15, 0.5, 0.85])
    np.testing.assert_allclose(np.asarray(d.quantile(qs)), ref.ppf(qs),
                               atol=3e-3)


def test_rician():
    d = ka.Rician(2.0, 0.8)
    ref = st.rice(2.0 / 0.8, scale=0.8)
    x = draws(d)
    assert x.min() > 0
    assert abs(x.mean() - ref.mean()) < 0.02
    xs = np.array([1.0, 2.2, 3.5])
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref.logpdf(xs),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs),
                               rtol=2e-3, atol=1e-5)
    assert abs(float(d.quantile(0.6)) - ref.ppf(0.6)) < 3e-3


def test_lindley():
    th = 1.5
    d = ka.Lindley(th)
    x = draws(d)
    # closed-form mean (theta+2)/(theta(theta+1))
    assert abs(x.mean() - (th + 2) / (th * (th + 1))) < 0.02
    xs = np.array([0.3, 1.0, 3.0])
    ref_pdf = th**2 / (1 + th) * (1 + xs) * np.exp(-th * xs)
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), np.log(ref_pdf),
                               rtol=1e-4)
    ref_cdf = 1 - (1 + th * xs / (1 + th)) * np.exp(-th * xs)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref_cdf, rtol=1e-4)
    # sampler matches the analytic cdf
    ks = st.kstest(x[:4000], lambda v: np.asarray(d.cdf(jnp.asarray(
        np.asarray(v, np.float32)))).astype(np.float64))
    assert ks.pvalue > 1e-4
    assert float(d.logpdf(-0.1)) == -np.inf


def test_logit_normal():
    d = ka.LogitNormal(0.5, 1.2)
    x = draws(d)
    assert x.min() > 0 and x.max() < 1
    xs = np.array([0.2, 0.5, 0.9])
    # change of variables through scipy norm
    lgt = np.log(xs / (1 - xs))
    ref_lp = st.norm(0.5, 1.2).logpdf(lgt) - np.log(xs) - np.log1p(-xs)
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref_lp, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)),
                               st.norm(0.5, 1.2).cdf(lgt), rtol=1e-3)
    q = float(d.quantile(0.75))
    assert abs(st.norm(0.5, 1.2).cdf(np.log(q / (1 - q))) - 0.75) < 1e-3
    assert float(d.logpdf(1.2)) == -np.inf


@pytest.mark.parametrize("nu,lam", [(3.0, 4.0), (1.0, 0.5), (2.0, 0.0)])
def test_noncentral_chisq(nu, lam):
    d = ka.NoncentralChisq(nu, lam)
    ref = st.ncx2(nu, lam) if lam > 0 else st.chi2(nu)
    x = draws(d)
    assert abs(x.mean() - (nu + lam)) < 0.15
    xs = np.array([1.0, 4.0, 10.0])
    np.testing.assert_allclose(np.asarray(d.logpdf(xs)), ref.logpdf(xs),
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(d.cdf(xs)), ref.cdf(xs),
                               rtol=2e-3, atol=1e-6)
    qs = np.array([0.25, 0.5, 0.75])
    np.testing.assert_allclose(np.asarray(d.quantile(qs)), ref.ppf(qs),
                               rtol=3e-3)
    ks = st.kstest(x[:4000], ref.cdf)
    assert ks.pvalue > 1e-4


# --------------------------------------------------------------------------
# Tier-4 discrete + multivariate batch
# --------------------------------------------------------------------------

def test_dirac():
    d = ka.Dirac(3.0)
    x = draws(d, n=100)
    assert x.dtype == np.int32 and (x == 3).all()
    assert float(d.logpdf(3)) == 0.0
    assert float(d.logpdf(2)) == -np.inf
    # float atom keeps float dtype and push snaps back to the atom
    df = ka.Dirac(1.5)
    xf = draws(df, n=10)
    assert xf.dtype == np.float32 and (xf == 1.5).all()
    assert float(df.push(jnp.asarray(7.3))) == 1.5
    assert float(d.push(jnp.asarray(7.3))) == 3
    assert float(d.cdf(2.9)) == 0.0 and float(d.cdf(3.0)) == 1.0


def test_discrete_nonparametric():
    xs = [1.0, 2.5, 4.0, 7.0]
    ps = [0.1, 0.4, 0.3, 0.2]
    d = ka.DiscreteNonParametric(xs, ps)
    assert d.discrete
    x = draws(d)
    # empirical pmf matches
    for xi, pi in zip(xs, ps):
        assert abs((x == xi).mean() - pi) < 0.02
    np.testing.assert_allclose(
        np.asarray(d.logpdf(np.array(xs, np.float32))), np.log(ps),
        rtol=1e-5)
    assert float(d.logpdf(3.0)) == -np.inf
    # nearest-atom push
    assert float(d.push(jnp.asarray(2.9))) == 2.5
    assert float(d.push(jnp.asarray(3.3))) == 4.0
    assert float(d.push(jnp.asarray(-5.0))) == 1.0
    assert float(d.push(jnp.asarray(100.0))) == 7.0
    np.testing.assert_allclose(
        np.asarray(d.cdf(np.array([0.5, 2.5, 5.0, 9.0], np.float32))),
        [0.0, 0.5, 0.8, 1.0], atol=1e-6)
    assert float(d.quantile(0.45)) == 2.5
    # integer support -> int32 samples (reference push_p policy)
    di = ka.DiscreteNonParametric([2, 5, 9], [0.3, 0.3, 0.4])
    assert np.asarray(di.sample(KEY, (5,))).dtype == np.int32
    import pytest
    with pytest.raises(ValueError, match="sum to 1"):
        ka.DiscreteNonParametric([1.0, 2.0], [0.5, 0.6])


def test_poisson_binomial():
    ps = [0.1, 0.5, 0.9, 0.3]
    d = ka.PoissonBinomial(ps)
    x = draws(d)
    assert x.dtype == np.int32
    assert abs(x.mean() - sum(ps)) < 0.03
    # exact pmf by brute-force enumeration
    import itertools
    pmf = np.zeros(5)
    for bits in itertools.product([0, 1], repeat=4):
        pr = np.prod([p if b else 1 - p for p, b in zip(ps, bits)])
        pmf[sum(bits)] += pr
    ks = np.arange(5)
    np.testing.assert_allclose(np.asarray(d.logpdf(ks)), np.log(pmf),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d.cdf(ks)), np.cumsum(pmf),
                               rtol=1e-5)
    assert float(d.logpdf(5)) == -np.inf
    assert float(d.logpdf(2.5)) == -np.inf
    # equal-p case equals Binomial
    db = ka.PoissonBinomial([0.4] * 6)
    np.testing.assert_allclose(np.asarray(db.logpdf(np.arange(7))),
                               st.binom(6, 0.4).logpmf(np.arange(7)),
                               rtol=1e-5)


def test_mv_log_normal():
    mean = np.array([0.2, -0.3])
    cov = np.array([[0.5, 0.2], [0.2, 0.4]])
    d = ka.MvLogNormal(mean, cov)
    x = draws(d)
    assert x.shape == (N, 2) and (x > 0).all()
    # moments of lognormal: E[X_i] = exp(mu_i + cov_ii/2)
    np.testing.assert_allclose(x.mean(axis=0),
                               np.exp(mean + np.diag(cov) / 2), rtol=0.05)
    pts = np.array([[1.0, 0.5], [2.0, 1.5]], np.float32)
    ref = (st.multivariate_normal(mean, cov).logpdf(np.log(pts))
           - np.log(pts).sum(axis=1))
    np.testing.assert_allclose(np.asarray(d.logpdf(pts)), ref, rtol=1e-3)
    assert float(d.logpdf(np.array([1.0, -0.5], np.float32))) == -np.inf


def test_mv_t_dist():
    mean = np.array([1.0, -2.0, 0.5])
    cov = np.array([[1.0, 0.3, 0.0], [0.3, 2.0, 0.5], [0.0, 0.5, 1.5]])
    d = ka.MvTDist(5.0, mean, cov)
    x = draws(d)
    assert abs(x.mean(axis=0) - mean).max() < 0.1
    # covariance of mv-t is df/(df-2) Sigma
    emp = np.cov(x.T)
    np.testing.assert_allclose(emp, 5.0 / 3.0 * cov, rtol=0.15, atol=0.05)
    pts = np.array([[1.0, -2.0, 0.5], [2.0, 0.0, -1.0]], np.float32)
    ref = st.multivariate_t(mean, cov, df=5).logpdf(pts)
    np.testing.assert_allclose(np.asarray(d.logpdf(pts)), ref, rtol=1e-3)


def test_wishart():
    S = np.array([[1.0, 0.3], [0.3, 0.8]])
    d = ka.Wishart(5.0, S)
    x = draws(d, n=4000)
    assert x.shape == (4000, 2, 2)
    # E[W] = df * S
    np.testing.assert_allclose(x.mean(axis=0), 5.0 * S, rtol=0.08)
    ref = st.wishart(5, S)
    pts = np.stack([5.0 * S, np.array([[2.0, 0.1], [0.1, 6.0]])]).astype(
        np.float32)
    np.testing.assert_allclose(np.asarray(d.logpdf(pts)),
                               [ref.logpdf(p) for p in pts], rtol=2e-3)
    import pytest
    with pytest.raises(ValueError, match="df"):
        ka.Wishart(0.5, S)


def test_inverse_wishart():
    Psi = np.array([[2.0, 0.4], [0.4, 1.5]])
    d = ka.InverseWishart(6.0, Psi)
    x = draws(d, n=4000)
    # E[X] = Psi / (df - d - 1) = Psi / 3
    np.testing.assert_allclose(x.mean(axis=0), Psi / 3.0, rtol=0.1)
    ref = st.invwishart(6, Psi)
    pts = np.stack([Psi / 3.0, np.array([[1.0, 0.0], [0.0, 0.8]])]).astype(
        np.float32)
    np.testing.assert_allclose(np.asarray(d.logpdf(pts)),
                               [ref.logpdf(p) for p in pts], rtol=2e-3)
    # samples are SPD
    assert (np.linalg.eigvalsh(x[:100]) > 0).all()


def test_lkj_cholesky():
    d, eta = 4, 2.5
    dist = ka.LKJCholesky(d, eta)
    L = draws(dist, n=8000)
    assert L.shape == (8000, 4, 4)
    # rows are unit norm (LL^T is a correlation matrix)
    R = L @ np.swapaxes(L, -1, -2)
    np.testing.assert_allclose(np.diagonal(R, axis1=-2, axis2=-1), 1.0,
                               atol=1e-5)
    # exact marginal: each off-diagonal r_ij ~ 2 Beta(a, a) - 1 with
    # a = eta - 1 + d/2
    a = eta - 1 + d / 2
    for (i, j) in [(1, 0), (2, 1), (3, 0), (3, 2)]:
        ks = st.kstest((R[:, i, j] + 1) / 2, st.beta(a, a).cdf)
        assert ks.pvalue > 1e-4, f"r[{i},{j}]: p={ks.pvalue}"
    # logpdf oracle: torch.distributions.LKJCholesky (same density-over-L
    # parameterization)
    import torch
    tl = torch.distributions.LKJCholesky(d, eta)
    L64 = L[:16].astype(np.float64)
    L64 /= np.linalg.norm(L64, axis=-1, keepdims=True)  # exact unit rows
    ref = tl.log_prob(torch.from_numpy(L64)).numpy()
    np.testing.assert_allclose(
        np.asarray(dist.logpdf(jnp.asarray(L[:16]))), ref, rtol=1e-3,
        atol=1e-3)


def test_lkj():
    d, eta = 3, 1.8
    dist = ka.LKJ(d, eta)
    R = draws(dist, n=8000)
    np.testing.assert_allclose(np.diagonal(R, axis1=-2, axis2=-1), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(R, np.swapaxes(R, -1, -2), atol=1e-6)
    a = eta - 1 + d / 2
    ks = st.kstest((R[:, 1, 0] + 1) / 2, st.beta(a, a).cdf)
    assert ks.pvalue > 1e-4
    # normalizer oracle: numerically integrate exp(logpdf) over the
    # 3x3 elliptope on a grid -> must be ~1
    n = 120
    g = np.linspace(-1 + 1 / n, 1 - 1 / n, n).astype(np.float64)
    r12, r13, r23 = np.meshgrid(g, g, g, indexing="ij")
    det = (1 + 2 * r12 * r13 * r23 - r12**2 - r13**2 - r23**2)
    valid = det > 1e-12
    lc = float(dist._lc)
    integrand = np.where(valid, np.exp((eta - 1) * np.log(
        np.where(valid, det, 1.0)) - lc), 0.0)
    total = integrand.sum() * (2 / n) ** 3
    assert abs(total - 1.0) < 0.01, f"LKJ normalizer integral = {total}"
    # uniform case eta=1: E[R] = I
    du = ka.LKJ(3, 1.0)
    Ru = draws(du, n=8000)
    np.testing.assert_allclose(Ru.mean(axis=0), np.eye(3), atol=0.03)


def test_matrix_push_projections():
    # push is the continuous analogue of round-to-int: it projects
    # float-evolved matrix leaves back onto the support manifold
    x = jnp.asarray(np.random.default_rng(1).normal(size=(5, 3, 3)),
                    jnp.float32)
    w = ka.Wishart(5.0, np.eye(3))
    pw = np.asarray(w.push(x))
    np.testing.assert_allclose(pw, np.swapaxes(pw, -1, -2), atol=1e-6)
    lkj = ka.LKJ(3, 2.0)
    pl = np.asarray(lkj.push(x))
    np.testing.assert_allclose(pl, np.swapaxes(pl, -1, -2), atol=1e-6)
    np.testing.assert_allclose(np.diagonal(pl, axis1=-2, axis2=-1), 1.0)
    lc = ka.LKJCholesky(3, 2.0)
    pc = np.asarray(lc.push(x))
    assert (np.triu(pc, 1) == 0).all()
    np.testing.assert_allclose(np.linalg.norm(pc, axis=-1), 1.0, atol=1e-6)
    # non-SPD projection -> -inf logpdf (MH rejects rather than NaNs)
    bad = jnp.asarray(np.diag([1.0, -1.0, 1.0]), jnp.float32)
    assert float(w.logpdf(bad)) == -np.inf
    # all off-diagonals -0.9 is symmetric unit-diag but not PSD
    badc = jnp.asarray(np.full((3, 3), -0.9) + 1.9 * np.eye(3), jnp.float32)
    assert float(lkj.logpdf(lkj.push(badc))) == -np.inf
    assert float(ka.InverseWishart(5.0, np.eye(3)).logpdf(bad)) == -np.inf


def test_lkj_prior_smc_end_to_end():
    # infer a 2x2 correlation matrix through smc: matrix leaves flow
    # through proposals (push re-symmetrizes + pins the unit diagonal)
    obs_corr = np.float32(0.6)
    prior = ka.LKJ(2, 1.0)

    def cost(R, key):
        cl = jnp.linalg.cholesky(R)
        z = jax.random.normal(key, (500, 2)) @ cl.T
        r = jnp.mean(z[:, 0] * z[:, 1]) / (
            jnp.std(z[:, 0]) * jnp.std(z[:, 1]))
        return jnp.abs(r - obs_corr)

    res = ka.smc(prior, cost, nparticles=128, epstol=0.05, max_iters=150,
                 key=5)
    P = res.P  # row-major components [R00, R01, R10, R11]
    assert P[0].approx(1.0) and P[0].std() == 0.0
    assert abs(P[1].mean() - 0.6) < 0.08
    assert P[1].particles.max() <= 1.0 + 1e-6
