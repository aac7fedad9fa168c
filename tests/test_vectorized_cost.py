"""Vectorized (batched) simulator support: smc(cost_vectorized=True) and
density-model ``loglike_batch`` — the integration point for fused/Pallas
simulators (ops/pallas_kernels.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import kissabc_tpu as ka


def _scalar_cost(x, key):
    return jnp.abs(x * x + 1 - 1.5)


def _batched_cost(xs, key):
    return jnp.abs(xs * xs + 1 - 1.5)


def test_smc_vectorized_matches_scalar():
    pri = ka.Normal(1, 0.2)
    a = ka.smc(pri, _scalar_cost, epstol=0.1, key=5)
    b = ka.smc(pri, _batched_cost, epstol=0.1, cost_vectorized=True, key=5)
    # identical RNG stream (same key; cost is deterministic here)
    np.testing.assert_allclose(a.P.particles, b.P.particles, rtol=1e-6)
    assert a.iterations == b.iterations


def test_ais_vectorized_kernelized():
    pri = ka.Normal(1, 0.2)
    model = ka.ApproxKernelizedPosterior(
        pri, _batched_cost, 0.001, cost_vectorized=True)
    res = ka.sample(model, ka.AIS(12), 500, discard_initial=1000, key=6)
    assert res.map(lambda m: m * m + 1).approx(1.5)


def test_ais_vectorized_hard_threshold():
    pri = ka.Normal(0, 1)
    model = ka.ApproxPosterior(
        pri, lambda xs, keys: jnp.abs(xs - 1.5), 0.01, cost_vectorized=True)
    res = ka.sample(model, ka.AIS(20), 100, discard_initial=2000, key=7)
    assert res.approx(1.5, atol=0.05)


def test_stochastic_batched_cost():
    """Batched costs receive one key and manage their own draws."""
    pri = ka.Uniform(-10, 10)

    def bcost(xs, key):
        noise = jax.random.normal(key, xs.shape)
        return jnp.abs(xs + 0.1 * noise)

    res = ka.smc(pri, bcost, epstol=0.2, cost_vectorized=True, key=8)
    assert res.P.approx(0.0, atol=0.3)


def test_common_logdensity_vectorized():
    """CommonLogDensity with a vectorized log-density over the batch."""
    D = ka.CommonLogDensity(
        2, lambda k: jax.random.normal(k, (2,)),
        lambda xs, key: -0.5 * jnp.sum(xs * xs, axis=-1),
        lpi_vectorized=True)
    res = ka.sample(D, ka.AIS(32), 500, ntransitions=5,
                    discard_initial=500, key=9)
    x, y = res
    assert abs(x.mean()) < 0.15 and abs(y.mean()) < 0.15
    assert abs(x.std() - 1.0) < 0.15


def test_host_cost_pure_callback():
    """The SURVEY §7 escape hatch: a numpy-only black-box simulator
    driven through pure_callback inside the jitted smc loop."""
    import numpy as np
    from kissabc_tpu.utils.host_sim import host_cost

    def black_box(thetas, seeds):
        x = np.asarray(thetas)
        rngs = [np.random.default_rng(int(s)) for s in seeds]
        noise = np.array([r.normal() * 0.05 for r in rngs])
        return np.abs(x - 1.5 + noise)

    cost = host_cost(black_box)
    res = ka.smc(ka.Normal(0, 1), cost, epstol=0.1,
                 cost_vectorized=True, key=11)
    assert res.P.approx(1.5, atol=0.15)
