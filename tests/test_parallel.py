"""Sharding tests on the 8-virtual-device CPU mesh (conftest forces
--xla_force_host_platform_device_count=8): the ensemble axes become mesh
axes and the same programs must produce correct posteriors when sharded
(SURVEY §2b / §5 'distributed communication backend')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kissabc_tpu as ka
from kissabc_tpu.parallel.mesh import constrainer, make_mesh


def _require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def test_make_mesh():
    _require_devices(8)
    m = make_mesh(chain=2, walker=4)
    assert m.axis_names == ("chain", "walker")
    assert m.devices.shape == (2, 4)


def test_constrainer_identity_without_mesh():
    c = constrainer(None, "walker")
    x = jnp.ones((4,))
    assert c(x) is x


def test_smc_sharded_walkers():
    _require_devices(8)
    mesh = make_mesh(walker=8)
    pri = ka.Normal(1, 0.2)
    cost = lambda x: jnp.abs(x * x + 1 - 1.5)
    res = ka.smc(pri, cost, nparticles=256, epstol=0.1, mesh=mesh, key=2)
    assert res.P.approx(0.707, atol=0.05)


def test_smc_sharded_matches_unsharded():
    """Determinism across sharding layouts: per-particle keys are derived
    from global indices, so the sharded run must equal the single-chip
    run bitwise (SURVEY §5 race-detection note)."""
    _require_devices(8)
    mesh = make_mesh(walker=8)
    pri = ka.Normal(1, 0.2)
    cost = lambda x: jnp.abs(x * x + 1 - 1.5)
    a = ka.smc(pri, cost, nparticles=128, epstol=0.1, key=3)
    b = ka.smc(pri, cost, nparticles=128, epstol=0.1, mesh=mesh, key=3)
    np.testing.assert_allclose(a.P.particles, b.P.particles, rtol=1e-5)
    assert a.iterations == b.iterations


def test_ais_sharded_walkers():
    _require_devices(8)
    mesh = make_mesh(walker=8)
    pri = ka.Normal(1, 0.2)
    cost = lambda x: jnp.abs(x * x + 1 - 1.5)
    abc = ka.ApproxKernelizedPosterior(pri, cost, 0.001)
    res = ka.sample(abc, ka.AIS(64), 256, discard_initial=512,
                    mesh=mesh, key=4)
    assert res.map(lambda m: m * m + 1).approx(1.5)


def test_ais_chain_mesh():
    _require_devices(8)
    mesh = make_mesh(chain=8)
    pri = ka.Normal(1, 0.2)
    cost = lambda x: jnp.abs(x * x + 1 - 1.5)
    abc = ka.ApproxKernelizedPosterior(pri, cost, 0.001)
    res = ka.sample(abc, ka.AIS(12), 50, chains=8, discard_initial=120,
                    mesh=mesh, key=5)
    assert len(res) == 8 * 50
    assert res.map(lambda m: m * m + 1).approx(1.5)


def test_pfilter_abcde_sharded():
    _require_devices(8)
    mesh = make_mesh(walker=8)
    pri = ka.Uniform(-10, 10)

    def cost(x, key):
        return jnp.abs(x + 0.1 * jax.random.normal(key))

    r1 = ka.pfilter(pri, cost, 512, mesh=mesh, verbose=False, key=6)
    assert r1.P.approx(0.0, atol=0.3)
    r2 = ka.ABCDE(pri, cost, 0.1, nparticles=256, generations=200,
                  mesh=mesh, verbose=False, key=7)
    assert r2.P.approx(0.0, atol=0.3)


def test_smc_stepped_sharded_checkpoint_resume(tmp_path):
    """VERDICT r1: the host-stepped/checkpoint path must shard too. Run
    smc_stepped on the 8-device walker mesh with per-iteration
    checkpoints, kill it mid-flight (max_iters), resume SHARDED from the
    checkpoint, and require the bitwise-identical result to (a) the
    uninterrupted sharded run and (b) the unsharded smc driver."""
    _require_devices(8)
    mesh = make_mesh(walker=8)
    pri = ka.Normal(1, 0.2)
    cost = lambda x: jnp.abs(x * x + 1 - 1.5)
    p = str(tmp_path / "sharded.npz")

    full = ka.smc_stepped(pri, cost, epstol=0.1, mesh=mesh, key=7)

    # interrupted run: stop after 3 iterations, checkpointing every one
    # (the max_iters cap simulates the interruption, so its safety-bound
    # warning is the expected signal here)
    try:
        with pytest.warns(RuntimeWarning, match="max_iters"):
            ka.smc_stepped(pri, cost, epstol=0.1, mesh=mesh, key=7,
                           checkpoint_path=p, checkpoint_every=1,
                           max_iters=3)
    except Exception:
        pass
    resumed = ka.smc_stepped(pri, cost, epstol=0.1, mesh=mesh, key=7,
                             checkpoint_path=p, checkpoint_every=1,
                             resume=True)
    np.testing.assert_array_equal(resumed.P.particles, full.P.particles)
    assert resumed.iterations == full.iterations

    # and a checkpoint written on the mesh resumes on a single device
    single = ka.smc_stepped(pri, cost, epstol=0.1, key=7,
                            checkpoint_path=p, resume=True)
    np.testing.assert_array_equal(single.P.particles, full.P.particles)

    unsharded = ka.smc(pri, cost, epstol=0.1, key=7)
    np.testing.assert_allclose(full.P.particles, unsharded.P.particles,
                               rtol=1e-5)
