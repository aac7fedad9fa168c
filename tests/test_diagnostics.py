"""ESS (Geyer/Stan autocorrelation estimator) and split-R-hat —
beyond-reference diagnostics (utils/diagnostics.py), validated against
closed forms: iid (ESS ~ N), AR(1) (ESS/N = (1-rho)/(1+rho)), shifted
chains (R-hat >> 1), antithetic super-efficiency, and an actual AIS run.
"""

import numpy as np
import pytest

import kissabc_tpu as ka
from kissabc_tpu.utils.diagnostics import autocovariance, ess, rhat


def test_iid_ess_and_rhat():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 2000))
    e = ess(x)
    assert 0.85 * 8000 < e <= 8000 * np.log10(8000)
    assert e > 7000
    assert abs(rhat(x) - 1.0) < 0.01


def test_ar1_ess_matches_closed_form():
    # AR(1) with coefficient rho has integrated autocorrelation time
    # (1+rho)/(1-rho), so ESS/N = (1-rho)/(1+rho)
    rho, n = 0.9, 200_000
    rng = np.random.default_rng(1)
    e = rng.standard_normal(n)
    y = np.empty(n)
    y[0] = e[0]
    for t in range(1, n):
        y[t] = rho * y[t - 1] + np.sqrt(1 - rho * rho) * e[t]
    frac = ess(y) / n
    expect = (1 - rho) / (1 + rho)
    assert abs(frac - expect) < 0.25 * expect


def test_rhat_detects_disjoint_chains():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((1, 1000))
    b = rng.standard_normal((1, 1000)) + 3.0
    assert rhat(np.concatenate([a, b])) > 1.5
    # split-rhat also catches single-chain drift
    drift = np.linspace(0.0, 5.0, 2000) + rng.standard_normal(2000)
    assert rhat(drift) > 1.5


def test_antithetic_superefficiency_capped():
    rng = np.random.default_rng(3)
    z = rng.standard_normal(5000)
    anti = np.empty(10000)
    anti[0::2], anti[1::2] = z, -z
    e = ess(anti)
    assert e > 10000  # super-efficient
    assert e <= 10000 * np.log10(10000) + 1e-6  # Stan cap


def test_degenerate_inputs():
    assert np.isnan(ess(np.ones(100)))
    assert np.isnan(rhat(np.ones(100)))
    with pytest.raises(ValueError):
        ess(np.zeros(3))
    with pytest.raises(ValueError):
        rhat(np.zeros((2, 3)))
    with pytest.raises(ValueError):
        ess(np.zeros((2, 3, 4)))


def test_autocovariance_matches_direct():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(256)
    acov = autocovariance(x)[0]
    xc = x - x.mean()
    direct = np.array([np.sum(xc[: 256 - t] * xc[t:]) / 256
                       for t in range(8)])
    assert np.allclose(acov[:8], direct, atol=1e-10)


def test_on_real_ais_run_and_particles_input():
    import jax.numpy as jnp
    pri = ka.Normal(0.0, 1.0)
    mdl = ka.CommonLogDensity(
        1, lambda k: pri.sample(k), lambda x: -0.5 * x * x)
    res = ka.sample(mdl, ka.AIS(32), 400, ntransitions=4, key=7)
    e = ess(res)          # Particles input
    r = rhat(res.particles)
    n = len(res)
    assert 0 < e <= n * np.log10(n) + 1e-6
    assert r < 1.2  # stationary target, plenty of moves


def test_small_inputs_and_frozen_chains():
    # review r2: 4-7 draw inputs crashed (post-split length check);
    # disjoint frozen chains returned nan instead of inf
    rng = np.random.default_rng(7)
    assert np.isfinite(ess(rng.standard_normal(5)))
    assert np.isfinite(ess(rng.standard_normal(7)))
    assert rhat(np.concatenate([np.zeros((1, 100)),
                                np.ones((1, 100))])) == np.inf
    assert np.isnan(rhat(np.ones((2, 100))))


def test_multiparam_tuple_input():
    """ess/rhat map over tuple-of-Particles (the d>1 result shape);
    a list of ARRAYS keeps the [chains, draws] meaning."""
    import jax.numpy as jnp
    import kissabc_tpu as ka
    prior = ka.Factored(ka.Normal(0.0, 1.0), ka.Normal(5.0, 2.0))
    mdl = ka.CommonLogDensity(
        2, lambda k: prior.sample_tree(k),
        lambda th: -0.5 * (th[0] ** 2 + ((th[1] - 5.0) / 2.0) ** 2))
    res = ka.sample(mdl, ka.AIS(16), 128, ntransitions=2, key=9)
    e, r = ess(res), rhat(res)
    assert e.shape == (2,) and np.all(e > 0)
    assert r.shape == (2,) and np.all(np.isfinite(r))
    # list of arrays = chains, not parameters
    rng = np.random.default_rng(1)
    chains = [rng.standard_normal(500), rng.standard_normal(500)]
    assert np.isscalar(rhat(np.stack(chains))) or np.ndim(
        rhat(np.stack(chains))) == 0


def test_rank_normalize_scipy_oracle():
    """The rank-normal transform must equal the scipy composition
    ndtri((rankdata - 3/8)/(S + 1/4)) — the ArviZ/Stan z-scale
    (Vehtari et al. 2021 §3.1). ArviZ itself is not in this image, but
    its transform IS this composition, and the downstream estimator is
    the already-oracled split ESS."""
    from scipy.special import ndtri
    from scipy.stats import rankdata
    from kissabc_tpu.utils.diagnostics import rank_normalize
    rng = np.random.default_rng(11)
    x = rng.standard_cauchy((3, 50))
    x[0, :5] = x[1, :5]  # exercise the tie path
    expect = ndtri((rankdata(x, method="average").reshape(x.shape)
                    - 0.375) / (x.size + 0.25))
    np.testing.assert_allclose(rank_normalize(x), expect, rtol=1e-12)


def test_rank_ess_iid_near_nominal():
    rng = np.random.default_rng(5)
    for sample in (rng.standard_normal((4, 1000)),
                   rng.standard_cauchy((4, 1000))):
        for method in ("rank", "bulk", "tail"):
            e = ess(sample, method=method)
            assert 0.7 * 4000 < e < 1.3 * 4000, (method, e)


def test_rank_ess_heavy_tail_robustness():
    """An AR(1)-correlated heavy-tailed chain: the raw-moment ESS is
    dominated by single extreme draws (high variance run-to-run), the
    rank ESS must sit stably near the AR(1) nominal ESS
    n*(1-phi)/(1+phi)."""
    phi, n = 0.7, 4000
    nominal = n * (1 - phi) / (1 + phi)
    rng = np.random.default_rng(17)
    z = np.empty(n)
    z[0] = rng.standard_normal()
    for i in range(1, n):
        z[i] = phi * z[i - 1] + np.sqrt(1 - phi**2) * rng.standard_normal()
    from scipy.stats import norm, cauchy
    heavy = cauchy.ppf(norm.cdf(z))  # Cauchy marginal, same copula
    e_rank = ess(heavy, method="rank")
    assert 0.6 * nominal < e_rank < 1.6 * nominal, (e_rank, nominal)


def test_rank_rhat_catches_scale_disagreement():
    """Chains agreeing in location but not scale: split-R-hat is blind
    (between-chain mean variance ~ 0), the folded term in rank-R-hat
    must flag it — the Vehtari et al. 2021 motivating example."""
    rng = np.random.default_rng(23)
    x = np.vstack([rng.standard_normal((2, 1000)),
                   5.0 * rng.standard_normal((2, 1000))])
    assert rhat(x) < 1.05
    assert rhat(x, method="rank") > 1.1
    # well-mixed chains stay ~1 under both
    g = rng.standard_normal((4, 1000))
    assert rhat(g, method="rank") < 1.01


def test_diagnostics_method_validation_and_multiparam():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 100))
    with pytest.raises(ValueError, match="method"):
        ess(x, method="bogus")
    with pytest.raises(ValueError, match="method"):
        rhat(x, method="bogus")
    import kissabc_tpu as ka
    ps = [ka.Particles(rng.standard_normal(256)) for _ in range(3)]
    e = ess(ps, method="rank")
    r = rhat(ps, method="rank")
    assert e.shape == (3,) and r.shape == (3,)


def test_tail_ess_degenerate_tail_is_nan():
    """Review r3: a constant tail indicator (>=5% point mass at the
    extreme) must surface as NaN, not a silently finite tail-ESS from
    NaN-order-dependent min()."""
    import kissabc_tpu as ka

    rng = np.random.default_rng(0)
    y = rng.normal(size=4000)
    y[:500] = y.max() + 1.0  # 12.5% point mass at the maximum
    v = ka.ess(y, method="tail")
    assert np.isnan(v), v
