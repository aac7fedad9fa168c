"""smc end-to-end tests against the reference oracles (SURVEY §6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kissabc_tpu as ka


def test_readme_normal_model():
    """The README Normal(mu,sigma) flagship model (README.md:70-84):
    posterior must match mu=2.0+-0.0062, sigma=0.0401+-0.00081."""
    pri = ka.Factored(ka.Uniform(1, 3), ka.TruncatedNormal(0, 0.05, 0, 100))

    def cost(theta, key):
        mu, sigma = theta
        x = mu + sigma * jax.random.normal(key, (1000,))
        d1 = jnp.mean(x) - 2.0
        d2 = jnp.std(x) - 0.04
        return jnp.hypot(d1, d2 * 50)

    res = ka.smc(pri, cost, nparticles=200, key=1)
    mu_p, sig_p = res.P
    assert res.eps < 0.02
    assert abs(mu_p.mean() - 2.0) < 0.02
    assert abs(sig_p.mean() - 0.0401) < 0.004


def test_dirac_delta_smc():
    """smc(pri, cost, epstol=0.1).P ~= 0.707 (runtests.jl:85)."""
    pri = ka.Normal(1, 0.2)
    cost = lambda x: jnp.abs(x * x + 1 - 1.5)
    res = ka.smc(pri, cost, epstol=0.1, key=2)
    assert res.P.approx(0.707, atol=0.05)


def test_mixed_prior_smc():
    """smc(Factored(Normal, DiscreteUniform)).P[2] ~= 5 (runtests.jl:113)."""
    pri = ka.Factored(ka.Normal(1, 0.5), ka.DiscreteUniform(1, 10))

    def cost(theta, key):
        n, du = theta
        sim = (n * n + du) * (n + jax.random.normal(key) * 0.01)
        return jnp.abs(sim - 5.5)

    res = ka.smc(pri, cost, key=3)
    du_post = res.P[1]
    assert du_post.approx(5, atol=1.0)
    assert np.allclose(du_post.particles, np.round(du_post.particles))


def test_banana_smc_parallel_and_inf_costs():
    """SMC testset (runtests.jl:240-254): banana cost, plus the variant
    whose cost is Inf half the time."""
    pp = ka.Factored(ka.Normal(0, 5), ka.Normal(0, 5))

    def cc(theta, key):
        x, y = theta
        k1, k2 = jax.random.split(key)
        return (50 * (x + jax.random.normal(k1) * 0.01 - y ** 2) ** 2
                + (y - 1 + jax.random.normal(k2) * 0.01) ** 2)

    r = ka.smc(pp, cc, alpha=0.9, nparticles=500, epstol=0.01, key=4).P
    assert r[0].approx(1, atol=0.1)
    assert r[1].approx(1, atol=0.05)

    def cc2(theta, key):
        kc, kflip = jax.random.split(key)
        base = cc(theta, kc)
        return jnp.where(jax.random.bernoulli(kflip), jnp.inf, base)

    r2 = ka.smc(pp, cc2, alpha=0.9, nparticles=1000, epstol=0.01, key=5).P
    assert r2[0].approx(1, atol=0.1)
    assert r2[1].approx(1, atol=0.05)


def test_smc_max_iters_warns_unconverged():
    # max_iters is this build's safety bound (the reference loops until
    # a real stopping rule fires) — hitting it must not read as
    # convergence
    import warnings as w

    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        res = ka.smc(ka.Normal(1, 0.2),
                     lambda x: jnp.abs(x * x + 1 - 1.5),
                     nparticles=128, max_iters=3, key=0)
    assert res.iterations == 3
    assert any("max_iters" in str(x.message) for x in rec)
    # a normally-converging run does not warn
    with w.catch_warnings(record=True) as rec2:
        w.simplefilter("always")
        ka.smc(ka.Normal(1, 0.2), lambda x: jnp.abs(x * x + 1 - 1.5),
               nparticles=128, epstol=0.1, key=0)
    assert not any("max_iters" in str(x.message) for x in rec2)


def test_smc_knob_validation():
    pri = ka.Normal(0, 1)
    cost = lambda x: jnp.abs(x)
    with pytest.raises(ValueError):
        ka.smc(pri, cost, alpha=0.0)
    with pytest.raises(ValueError):
        ka.smc(pri, cost, min_r_ess=0.0)
    with pytest.raises(ValueError):
        ka.smc(pri, cost, mcmc_retrys=-1)
    with pytest.raises(ValueError):
        ka.smc(pri, cost, max_stretch=1.0)
    with pytest.raises(ValueError):
        ka.smc(pri, cost, nparticles=2)


def test_smc_systematic_resampling_variant():
    pri = ka.Normal(1, 0.2)
    cost = lambda x: jnp.abs(x * x + 1 - 1.5)
    res = ka.smc(pri, cost, epstol=0.1, resample="systematic", key=6)
    assert res.P.approx(0.707, atol=0.05)


def test_smc_deterministic_given_key():
    pri = ka.Normal(1, 0.2)
    cost = lambda x: jnp.abs(x * x + 1 - 1.5)
    a = ka.smc(pri, cost, epstol=0.1, key=7)
    b = ka.smc(pri, cost, epstol=0.1, key=7)
    np.testing.assert_array_equal(a.P.particles, b.P.particles)
    assert a.eps == b.eps


def test_smc_vector_prior():
    """smc over a vector-leaf prior (MvNormal): ensemble leaves are
    [n, d]; roll/gather partner schemes and resampling must handle the
    extra dimension."""
    pri = ka.MvNormal(2, 1.0)
    cost = lambda x: jnp.abs(jnp.sqrt(jnp.sum(x * x)) - 1.0)
    res = ka.smc(pri, cost, nparticles=500, epstol=0.05, key=8)
    x, y = res.P
    radii = np.sqrt(x.particles ** 2 + y.particles ** 2)
    assert np.abs(radii - 1.0).mean() < 0.05


def test_smc_log_evidence_matches_analytic():
    """Beyond-reference: SMCResult.log_evidence = log P(cost < eps |
    prior), the telescoping product of survival fractions. Analytic
    oracle: Uniform(-1,1) prior with cost |x| gives P(|x| < eps) = eps;
    the 2-d product prior with max(|x|,|y|) gives eps^2."""
    prior = ka.Uniform(-1.0, 1.0)
    res = ka.smc(prior, lambda x, key: jnp.abs(x), nparticles=4096,
                 epstol=0.05, key=5)
    assert np.isclose(np.exp(res.log_evidence), res.eps, rtol=0.12)

    prior2 = ka.Factored(ka.Uniform(-1, 1), ka.Uniform(-1, 1))
    res2 = ka.smc(prior2,
                  lambda th, key: jnp.maximum(jnp.abs(th[0]),
                                              jnp.abs(th[1])),
                  nparticles=4096, epstol=0.1, key=6)
    assert np.isclose(np.exp(res2.log_evidence), res2.eps ** 2, rtol=0.15)


def test_smc_evidence_ranks_models():
    """ABC model choice: a misspecified simulator earns a (much) lower
    acceptance mass — the actual use of log_evidence."""
    tmean, tstd = 0.0, 1.0

    def costA(x, key):  # well-specified
        s = jax.random.normal(key, (500,)) * x[1] + x[0]
        return jnp.hypot(jnp.mean(s) - tmean, jnp.std(s) - tstd)

    def costB(x, key):  # shifted by +2: cannot explain the data
        s = jax.random.normal(key, (500,)) * x[1] + x[0] + 2.0
        return jnp.hypot(jnp.mean(s) - tmean, jnp.std(s) - tstd)

    prior = ka.Factored(ka.Uniform(-1.0, 1.0), ka.Uniform(0.5, 2.0))
    ra = ka.smc(prior, costA, nparticles=1024, epstol=0.1, key=1)
    rb = ka.smc(prior, costB, nparticles=1024, epstol=0.1, key=2)
    assert ra.eps <= 0.1  # the good model reaches the tolerance
    assert rb.eps > 0.5   # the bad one stalls far above it
    # and even at its far-looser eps, B's acceptance mass is much lower
    assert ra.log_evidence > rb.log_evidence + 2.0


def test_smc_quantile_impl_bitwise_and_validation():
    """quantile_impl='bisect' must reproduce the sort path BITWISE end
    to end (the order statistics are exact, test_ops.py) — this is what
    lets 'auto' switch impls on a mesh without breaking the
    sharded-vs-unsharded determinism contract."""
    import numpy as np
    import pytest

    prior = ka.Factored(ka.Uniform(1, 3), ka.TruncatedNormal(0, 0.05, 0, 100))

    def cost(theta, key):
        mu, sigma = theta
        x = mu + sigma * jax.random.normal(key, (100,))
        return jnp.hypot(jnp.mean(x) - 2.0, (jnp.std(x) - 0.04) * 50)

    kw = dict(nparticles=200, epstol=0.1, key=11)
    a = ka.smc(prior, cost, quantile_impl="sort", **kw)
    b = ka.smc(prior, cost, quantile_impl="bisect", **kw)
    assert a.iterations == b.iterations and a.eps == b.eps
    np.testing.assert_array_equal(a.C, b.C)
    for pa, pb in zip(a.P, b.P):
        np.testing.assert_array_equal(pa.particles, pb.particles)
    with pytest.raises(ValueError, match="quantile_impl"):
        ka.smc(prior, cost, quantile_impl="median-of-medians", **kw)
