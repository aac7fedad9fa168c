"""BASELINE configs 4-5: g-and-k quantile-distribution inference and a
multimodal posterior stressing ensemble mixing across sharded walkers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kissabc_tpu as ka


def test_gk_inference():
    import sys
    sys.path.insert(0, "examples")
    from example_gk import TRUE, cost, prior

    res = ka.smc(prior, cost, nparticles=1024, alpha=0.9, epstol=0.08,
                 key=21)
    a, b, g, k = res.P
    # location/scale recover tightly; g (skewness) is famously weakly
    # identified from octiles, k moderately
    assert abs(a.mean() - TRUE[0]) < 0.3
    assert abs(b.mean() - TRUE[1]) < 0.5
    assert abs(k.mean() - TRUE[3]) < 0.4


def _bimodal_cost(x, key):
    # posterior modes at x = +-2
    return jnp.abs(x * x - 4.0) + 0.1 * jnp.abs(jax.random.normal(key))


def test_multimodal_mixing_single_chip():
    prior = ka.Uniform(-10, 10)
    res = ka.smc(prior, _bimodal_cost, nparticles=1000, alpha=0.9,
                 epstol=0.2, key=22)
    x = res.P.particles
    frac_pos = (x > 0).mean()
    assert 0.2 < frac_pos < 0.8  # both modes survive
    assert np.abs(np.abs(x) - 2).mean() < 0.2


def test_multimodal_mixing_sharded():
    """The sharded ensemble must behave as ONE logical population: both
    modes populated on a walker-sharded mesh (BASELINE north-star)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from kissabc_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(walker=8)
    prior = ka.Uniform(-10, 10)
    res = ka.smc(prior, _bimodal_cost, nparticles=1024, alpha=0.9,
                 epstol=0.2, mesh=mesh, key=23)
    x = res.P.particles
    frac_pos = (x > 0).mean()
    assert 0.2 < frac_pos < 0.8
    # and matches the unsharded run bitwise (same key, same layout math)
    res2 = ka.smc(prior, _bimodal_cost, nparticles=1024, alpha=0.9,
                  epstol=0.2, key=23)
    np.testing.assert_allclose(np.sort(x), np.sort(res2.P.particles),
                               rtol=1e-5)
