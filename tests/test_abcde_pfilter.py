"""ABCDE + pfilter end-to-end tests."""

import jax
import jax.numpy as jnp
import numpy as np

import kissabc_tpu as ka


def _mixture_cost(x, key):
    """The classical 0.1N+N mixture simulator (runtests.jl:144-146)."""
    k1, k2, k3 = jax.random.split(key, 3)
    sim = x + jnp.where(jax.random.bernoulli(k1),
                        jax.random.normal(k2) * 0.1,
                        jax.random.normal(k3))
    return jnp.abs(sim)


def test_abcde_dirac():
    pri = ka.Normal(1, 0.2)
    cost = lambda x: jnp.abs(x * x + 1 - 1.5)
    res = ka.ABCDE(pri, cost, 0.01, nparticles=100, generations=500,
                   verbose=False, key=1)
    assert res.reached_eps
    assert res.P.approx(np.sqrt(0.5), atol=0.02)
    assert res.nsim > 0


def test_abcde_earlystop():
    pri = ka.Normal(1, 0.2)
    cost = lambda x: jnp.abs(x * x + 1 - 1.5)
    res = ka.ABCDE(pri, cost, 0.05, nparticles=60, generations=2000,
                   earlystop=True, verbose=False, key=2)
    assert res.reached_eps
    assert res.iterations < 2000


def test_abcde_multivariate_marginal():
    """Non-(n,) theta leaves (MvNormal marginal) through the packed
    partner gather — regression for the r5 stacked-gather rewrite,
    which briefly required homogeneous scalar leaves."""
    pri = ka.Factored(ka.MvNormal(np.zeros(2), np.eye(2)),
                      ka.Normal(0.0, 1.0))

    def cost(th):
        v, s = th
        return jnp.abs(v[0] - 1.0) + jnp.abs(v[1] + 1.0) + jnp.abs(s)

    res = ka.ABCDE(pri, cost, 0.35, nparticles=64, generations=300,
                   verbose=False, key=1)
    assert res.reached_eps
    means = [float(np.mean(np.asarray(p.particles))) for p in res.P]
    assert abs(means[0] - 1.0) < 0.1
    assert abs(means[1] + 1.0) < 0.1
    assert abs(means[2]) < 0.1


def test_abcde_mixture_annealing():
    """alpha-annealed population threshold on the mixture model."""
    pri = ka.Uniform(-10, 10)
    res = ka.ABCDE(pri, _mixture_cost, 0.05, nparticles=150,
                   generations=400, alpha=0.3, verbose=False, key=3)
    assert res.P.approx(0.0, atol=0.2)


def test_pfilter_basic():
    pri = ka.Uniform(-10, 10)
    res = ka.pfilter(pri, _mixture_cost, 400, verbose=False, key=4)
    assert res.P.approx(0.0, atol=0.2)
    assert res.eps < 1.0


def test_pfilter_n_floor():
    """N*q <= 4d forces N = ceil((4d+1)/q) (smc.jl:276-279)."""
    pri = ka.Normal(0, 1)
    cost = lambda x: jnp.abs(x)
    res = ka.pfilter(pri, cost, 5, q=0.7, max_iters=3, verbose=False, key=5)
    # floored to ceil(5/0.7) = 8 particles minimum
    assert len(res.C.particles) >= 8


def test_pfilter_epstol_stop():
    pri = ka.Normal(0, 1)
    cost = lambda x: jnp.abs(x)
    res = ka.pfilter(pri, cost, 100, epstol=0.5, eff_tol=0.0,
                     max_iters=50, verbose=False, key=6)
    assert res.eps < 0.5 or res.iterations >= 50


def test_pfilter_discrete_prior_raw_cost():
    """Reference parity (smc.jl:289,308-319): pfilter's cost sees the RAW
    float particle — for a discrete prior the simulator receives the
    un-snapped float marginal, while logpdf sees the pushed one. The
    indicator cost below is >=1 on integers and ~0.01*|x-5| on the
    fractional values only DE moves can produce, so eps < 1 is reachable
    ONLY under raw-cost semantics."""
    pri = ka.DiscreteUniform(0, 10)

    def cost(x):
        frac = jnp.abs(x - jnp.round(x))
        return jnp.where(frac < 1e-6, 1.0 + 0.001 * jnp.abs(x - 5.0),
                         0.01 * jnp.abs(x - 5.0))

    res = ka.pfilter(pri, cost, 100, epstol=0.5, max_iters=50, key=3)
    assert res.eps < 1.0  # impossible with pushed-cost semantics
    assert float(np.max(res.C.particles)) < 1.0
    # the returned posterior is still pushed (integer support)
    vals = res.P.particles
    np.testing.assert_allclose(vals, np.round(vals))

    # cost_on='pushed' (documented extension): every cost stays at the
    # integer-indicator value, eps can never drop below 1
    res2 = ka.pfilter(pri, cost, 100, cost_on="pushed", max_iters=3, key=3)
    assert res2.eps >= 1.0


def test_abcde_discrete_prior_raw_cost():
    """Same reference delta for ABCDE (smc.jl:358-363,405)."""
    pri = ka.DiscreteUniform(0, 10)

    def cost(x):
        frac = jnp.abs(x - jnp.round(x))
        return jnp.where(frac < 1e-6, 1.0 + 0.001 * jnp.abs(x - 5.0),
                         0.01 * jnp.abs(x - 5.0))

    res = ka.ABCDE(pri, cost, 0.04, nparticles=100, generations=300,
                   verbose=False, key=5)
    assert float(np.max(res.C.particles)) < 1.0
    res2 = ka.ABCDE(pri, cost, 0.04, nparticles=100, generations=3,
                    cost_on="pushed", verbose=False, key=5)
    assert float(np.min(res2.C.particles)) >= 1.0


def test_pfilter_unfixed_surfaced():
    """ADVICE: particles the bounded rejection loop could not regenerate
    must be surfaced, not silently returned."""
    import warnings
    pri = ka.Uniform(0, 1)
    # near-impossible acceptance below the quantile: a cost that is pure
    # noise makes regeneration easy, so instead make it constant — every
    # proposal has the same cost, eps == cost, nothing is ever "bad".
    # To force unfixed particles, use a cost with a tiny accept window.
    cost = lambda x: jnp.where(x < 1e-7, 0.0, 1.0)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res = ka.pfilter(pri, cost, 40, inner_retry=2, max_iters=1, key=0)
    if res.unfixed:
        assert any("inner_retry" in str(x.message) for x in w)
    # normal easy problem: nothing unfixed, no warning
    res_ok = ka.pfilter(pri, lambda x: jnp.abs(x - 0.5), 40,
                        epstol=0.2, key=0)
    assert res_ok.unfixed == 0


def test_pfilter_quantile_impl_bitwise():
    """quantile_impl='bisect' reproduces the sort path bitwise (as in
    smc): lets 'auto' switch to the O(1)-bytes quantile on a mesh
    without breaking determinism."""
    pri = ka.Uniform(-10, 10)
    a = ka.pfilter(pri, _mixture_cost, 200, verbose=False, key=4,
                   quantile_impl="sort")
    b = ka.pfilter(pri, _mixture_cost, 200, verbose=False, key=4,
                   quantile_impl="bisect")
    assert a.eps == b.eps and a.iterations == b.iterations
    np.testing.assert_array_equal(a.C.particles, b.C.particles)
    import pytest
    with pytest.raises(ValueError, match="quantile_impl"):
        ka.pfilter(pri, _mixture_cost, 200, quantile_impl="nope")
