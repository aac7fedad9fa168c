"""Regression tests for the round-1 code-review findings (all were in
previously-uncovered paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kissabc_tpu as ka


def test_ais_with_vectorized_cost_init():
    """Finding 1: _init_ensemble crashed for cost_vectorized models."""
    pri = ka.Normal(1, 0.2)
    model = ka.ApproxKernelizedPosterior(
        pri, lambda xs, key: jnp.abs(xs * xs + 1 - 1.5), 0.001,
        cost_vectorized=True)
    res = ka.sample(model, ka.AIS(16), 100, discard_initial=200, key=1)
    assert res.map(lambda m: m * m + 1).approx(1.5)


def test_truncated_gamma_beta_lognormal():
    """Finding 2: Truncated(Gamma/Beta/LogNormal) lacked quantile/cdf."""
    import scipy.stats as st
    for base, lo, hi, ref in [
        (ka.Gamma(2.0, 1.0), 0.0, 5.0, st.gamma(2)),
        (ka.Beta(2.0, 3.0), 0.2, 0.8, st.beta(2, 3)),
        (ka.LogNormal(0.0, 0.5), 0.5, 3.0, st.lognorm(0.5)),
    ]:
        t = ka.Truncated(base, lo, hi)
        x = np.asarray(t.sample(jax.random.key(0), (8000,)))
        assert x.min() >= lo - 1e-5 and x.max() <= hi + 1e-5
        want = ref.expect(lambda v: v, lb=lo, ub=hi, conditional=True)
        assert abs(x.mean() - want) < 0.03, (base, x.mean(), want)

    # a Truncated(Gamma) prior runs through a sampler end to end
    prior = ka.Truncated(ka.Gamma(2.0, 1.0), 0.0, 5.0)
    res = ka.smc(prior, lambda x: jnp.abs(x - 1.5), epstol=0.2, key=2)
    assert res.P.approx(1.5, atol=0.3)


def test_density_accept_wrapper():
    """Finding 3: the protocol-level accept() was clobbered by a stub."""
    m = ka.ApproxPosterior(ka.Normal(0, 1), lambda x: jnp.abs(x), 0.1)
    old = (jnp.float32(-0.5), jnp.float32(0.05))
    new = (jnp.float32(-0.5), jnp.float32(0.05))
    out = m.accept(jax.random.key(0), old, new, jnp.float32(0.0))
    assert bool(out)  # equal ld, cost within threshold -> accept


def test_smc_stepped_validates_knobs(tmp_path):
    """Finding 4: smc_stepped skipped all knob validation."""
    pri = ka.Normal(0, 1)
    cost = lambda x: jnp.abs(x)
    with pytest.raises(ValueError):
        ka.smc_stepped(pri, cost, mcmc_retrys=-1)
    with pytest.raises(ValueError):
        ka.smc_stepped(pri, cost, alpha=1.2)


def test_string_knob_validation():
    """Finding 6: typo'd string knobs silently selected other branches."""
    pri = ka.Normal(0, 1)
    cost = lambda x: jnp.abs(x)
    with pytest.raises(ValueError):
        ka.smc(pri, cost, resample="replicated")
    with pytest.raises(ValueError):
        ka.smc(pri, cost, partner_scheme="rolls")


def test_chains_with_2d_mesh():
    """Finding 5: multi-chain sample() dropped the walker-axis mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from kissabc_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(chain=2, walker=4)
    pri = ka.Normal(1, 0.2)
    abc = ka.ApproxKernelizedPosterior(
        pri, lambda x: jnp.abs(x * x + 1 - 1.5), 0.001)
    res = ka.sample(abc, ka.AIS(16), 50, chains=2, discard_initial=100,
                    mesh=mesh, key=3)
    assert len(res) == 100
    assert res.map(lambda m: m * m + 1).approx(1.5)


def test_partner_scheme_forwarded_single_chain():
    """ADVICE r1: sample()/sample_raw() must forward partner_scheme on
    the single-chain path — 'gather' vs 'roll' at the same key must give
    different (but both correct) streams, proving the knob lands."""
    pri = ka.Normal(1, 0.2)
    abc = ka.ApproxKernelizedPosterior(
        pri, lambda x: jnp.abs(x * x + 1 - 1.5), 0.005)
    import numpy as np
    a = ka.sample(abc, ka.AIS(64), 128, partner_scheme="roll", key=5)
    b = ka.sample(abc, ka.AIS(64), 128, partner_scheme="gather", key=5)
    assert not np.allclose(a.particles, b.particles)
    assert a.map(lambda m: m * m + 1).approx(1.5, atol=0.05)
    assert b.map(lambda m: m * m + 1).approx(1.5, atol=0.05)


def test_sequential_schedule_with_chains_raises():
    """ADVICE r1: schedule='sequential' silently ran red/black when
    chains= was set; now it raises."""
    pri = ka.Normal(1, 0.2)
    abc = ka.ApproxKernelizedPosterior(
        pri, lambda x: jnp.abs(x * x + 1 - 1.5), 0.005)
    with pytest.raises(ValueError, match="sequential"):
        ka.sample(abc, ka.AIS(16), 20, chains=2, schedule="sequential")


def test_sequential_schedule_rejects_ignored_knobs():
    # review r2: partner_scheme/kernel/mesh were silently ignored on the
    # sequential path; now they raise like the chains+sequential case
    import pytest
    import jax.numpy as jnp
    import kissabc_tpu as ka

    pri = ka.Normal(0.0, 1.0)
    mdl = ka.ApproxKernelizedPosterior(
        pri, lambda x, key: jnp.abs(x), 0.5)
    with pytest.raises(ValueError, match="partner_scheme"):
        ka.sample(mdl, ka.AIS(8), 4, schedule="sequential",
                  partner_scheme="gather")
    with pytest.raises(ValueError, match="progress"):
        ka.sample(mdl, ka.AIS(8), 4, schedule="sequential",
                  progress=True)


# --- round-2 review batch: distribution-tier + Particles findings --------


def test_particles_sampling_ctor_rejects_multivariate():
    # review r2: Particles(N, MvNormal) silently flattened both
    # coordinates into one 2N-length scalar cloud
    with pytest.raises(ValueError, match="univariate"):
        ka.Particles(64, ka.MvNormal(np.zeros(2), np.eye(2)), key=0)


def test_particles_sampling_ctor_numpy_key():
    # review r2: numpy integer seeds crashed (isinstance(np.int64, int)
    # is False, so the raw scalar reached jax as a malformed key)
    a = ka.Particles(256, ka.Normal(0.0, 1.0), key=np.int64(3))
    b = ka.Particles(256, ka.Normal(0.0, 1.0), key=3)
    assert np.allclose(a.particles, b.particles)


def test_discrete_nonparametric_merges_duplicate_atoms():
    # review r2: duplicate atoms made sample() and logpdf() disagree
    # (searchsorted found only the first duplicate's weight)
    d = ka.DiscreteNonParametric([1.0, 1.0, 2.0], [0.25, 0.25, 0.5])
    assert d.xs.shape == (2,)
    assert np.isclose(float(d.logpdf(1.0)), np.log(0.5), rtol=1e-6)
    assert np.isclose(float(d.cdf(1.0)), 0.5, rtol=1e-6)


def test_mixture_rejects_multivariate_components():
    # review r2: multivariate components constructed fine but sample()
    # crashed with an opaque broadcast error in take_along_axis
    with pytest.raises(ValueError, match="univariate"):
        ka.Mixture([ka.MvNormal(np.zeros(2), np.eye(2)),
                    ka.MvNormal(np.ones(2), np.eye(2))])


def test_mixture_quantile_bounds_memoized():
    # review r2: quantile() recomputed component-quantile device ops +
    # float() readbacks per call (tunnel trap); now memoized host consts
    m = ka.Mixture([ka.Normal(0.0, 1.0), ka.Normal(5.0, 2.0)], [0.3, 0.7])
    q = float(m.quantile(np.float32(0.5)))
    assert abs(float(m.cdf(q)) - 0.5) < 1e-4
    assert hasattr(m, "_qbounds")
    lo, hi = m._qbounds
    assert isinstance(lo, float) and isinstance(hi, float)


def test_truncated_discrete_integrality_and_negative_atoms():
    # review r2: non-integer x inside the window returned finite mass,
    # and the toward-zero int cast paired negative x with the wrong atom
    import scipy.stats as st
    td = ka.Truncated(ka.Poisson(3.0), 1, 5)
    assert float(td.logpdf(2.5)) == -np.inf
    assert np.isfinite(float(td.logpdf(2.0)))
    sk = ka.Truncated(ka.Skellam(2.0, 3.0), -5, 5)
    ref = st.skellam(2, 3)
    mass = ref.cdf(5) - ref.cdf(-6)
    assert np.isclose(float(jnp.exp(sk.logpdf(-3))),
                      ref.pmf(-3) / mass, rtol=1e-5)
    assert float(sk.logpdf(-2.7)) == -np.inf
