"""Tests for abc_rejection (beyond-reference baseline sampler): analytic
eps/evidence oracles for both modes, mixed-support priors, shortfall
surfacing, and sharded execution on the virtual mesh."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import kissabc_tpu as ka
from kissabc_tpu.parallel.mesh import make_mesh


def test_budget_mode_uniform_ball():
    # deterministic cost |theta - 0.3| under Uniform(0,1): keeping the best
    # n of nsims draws selects the interval of prior mass n/nsims around
    # 0.3, so eps -> (n/nsims)/2 and the kept cloud is ~U(0.3 +- eps)
    res = ka.abc_rejection(
        ka.Uniform(0.0, 1.0), lambda th: jnp.abs(th - 0.3),
        512, nsims=65536, key=0)
    assert res.nsims == 65536 and res.naccept == 512
    expected_eps = 512 / 65536 / 2
    assert abs(res.eps - expected_eps) < 0.3 * expected_eps
    assert abs(res.P.mean() - 0.3) < 3 * expected_eps
    assert res.C.particles.max() == pytest.approx(res.eps)
    assert np.all(np.diff(res.C.particles) >= 0)  # sorted best-first
    assert res.log_evidence == pytest.approx(np.log(512 / 65536))


def test_budget_mode_buffer_merge_across_chunks():
    # small batch forces many top-k merges; result must match a single
    # huge chunk bit-for-nothing statistically (same realized eps law)
    res = ka.abc_rejection(
        ka.Uniform(0.0, 1.0), lambda th: jnp.abs(th - 0.3),
        64, nsims=16384, batch=256, key=1)
    assert res.nsims == 16384
    assert abs(res.eps - 64 / 16384 / 2) < 0.6 * (64 / 16384 / 2)


def test_threshold_mode_evidence_matches_gaussian_mass():
    # cost = |x| under N(0,1), eps = 0.5: acceptance mass is 2*Phi(0.5)-1
    res = ka.abc_rejection(
        ka.Normal(0.0, 1.0), lambda th: jnp.abs(th), 2048,
        eps=0.5, batch=8192, key=3)
    assert res.naccept >= 2048
    truth = 2 * stats.norm.cdf(0.5) - 1
    assert abs(np.exp(res.log_evidence) - truth) < 0.03
    assert res.C.particles.max() <= 0.5
    assert abs(res.P.mean()) < 0.05
    # accepted draws are the prior truncated to |x|<=0.5: check spread
    assert abs(res.P.std() - stats.truncnorm.std(-0.5, 0.5)) < 0.02


def test_budget_mode_infinite_cost_shortfall_warns():
    # a cost that is almost always +inf: budget mode must NOT silently
    # return zero-initialized placeholder particles — finite kept draws
    # are counted, eps is the worst FINITE kept cost, and the shortfall
    # warns (review finding: placeholders used to leak with naccept=n)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res = ka.abc_rejection(
            ka.Uniform(0.0, 1.0),
            lambda th: jnp.where(th < 0.001, th, jnp.inf),
            64, nsims=1024, key=11)
    assert any("finite cost" in str(x.message) for x in w)
    assert res.naccept < 64
    assert np.isfinite(res.eps) or res.naccept == 0
    # the finite kept draws really satisfy the cost law (th < 0.001)
    kept = res.C.particles[:res.naccept]
    assert np.all(np.isfinite(kept))
    assert res.log_evidence <= np.log(max(res.naccept, 1) / 1024)


def test_threshold_mode_sorted_and_budget_capped():
    # threshold mode sorts best-first like budget mode, and never runs
    # more than max_sims simulations even when batch > max_sims
    res = ka.abc_rejection(ka.Normal(0.0, 1.0), lambda th: jnp.abs(th),
                           32, eps=1.0, batch=4096, max_sims=1000, key=12)
    assert res.nsims <= 1000
    finite = res.C.particles[np.isfinite(res.C.particles)]
    assert len(finite) > 0
    assert np.all(np.diff(finite) >= 0)  # best-first like budget mode


def test_threshold_unfilled_warns():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res = ka.abc_rejection(
            ka.Normal(0.0, 1.0), lambda th: jnp.abs(th), 256,
            eps=1e-5, batch=512, max_sims=2048, key=4)
    assert any("unfilled" in str(x.message) or "accepted within"
               in str(x.message) for x in w)
    assert res.naccept < 256
    assert np.isinf(res.C.particles).any()


def test_mixed_prior_pushes_discrete():
    # Factored(continuous, discrete): returned discrete marginal is
    # integer-valued (push policy, reference types.jl:27-32)
    pri = ka.Factored(ka.Uniform(0.0, 1.0), ka.DiscreteUniform(1, 10))
    def cost(th, key):
        u, k = th
        return jnp.abs(u - 0.5) + jnp.abs(k - 4.0)
    res = ka.abc_rejection(pri, cost, 256, nsims=16384, key=5)
    u, kpart = res.P
    assert np.issubdtype(kpart.particles.dtype, np.integer)
    assert kpart.mean() == pytest.approx(4.0, abs=0.3)
    assert abs(u.mean() - 0.5) < 0.1


def test_knob_validation():
    with pytest.raises(ValueError):
        ka.abc_rejection(ka.Normal(0, 1), lambda th: th, 10,
                         eps=1.0, nsims=100)
    with pytest.raises(ValueError):
        ka.abc_rejection(ka.Normal(0, 1), lambda th: th, 100, nsims=10)


def test_sharded_matches_unsharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(walker=8)
    cost = lambda th: jnp.abs(th - 0.3)
    a = ka.abc_rejection(ka.Uniform(0.0, 1.0), cost, 128,
                         nsims=8192, key=7)
    b = ka.abc_rejection(ka.Uniform(0.0, 1.0), cost, 128,
                         nsims=8192, mesh=mesh, key=7)
    # sharding constraints change layout, not math: bitwise-identical
    assert np.array_equal(a.C.particles, b.C.particles)
    assert np.array_equal(a.P.particles, b.P.particles)
