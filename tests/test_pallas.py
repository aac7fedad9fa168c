"""Pallas hardware-PRNG simulator kernel tests.

The statistical tests need the real TPU PRNG (interpret mode yields
deterministic zero bits), so they are skipped off-TPU; the CPU fallback
path of ``make_flagship_cost_batched`` is tested everywhere.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kissabc_tpu.ops.pallas_kernels import (make_flagship_cost_batched,
                                            normal_summary_cost)

ON_TPU = jax.devices()[0].platform == "tpu"


def test_fallback_batched_cost_matches_reference_stat():
    """Off-TPU the batched cost is the vmapped threefry simulator; its
    mean cost at the true parameters matches the closed-form
    E|N(0, 0.0447)| = 0.0357 scale."""
    n = 4096
    cost = make_flagship_cost_batched()
    mu = jnp.full((n,), 2.0)
    sg = jnp.full((n,), 0.04)
    c = np.asarray(cost((mu, sg), jax.random.key(0)))
    assert np.isfinite(c).all()
    assert abs(c.mean() - 0.0357) < 0.005


@pytest.mark.skipif(not ON_TPU, reason="needs TPU hardware PRNG")
def test_kernel_statistics_on_tpu():
    n = 8192
    mu = jnp.full((n,), 2.0)
    sg = jnp.full((n,), 0.04)
    c = np.asarray(normal_summary_cost(mu, sg, jnp.uint32(3)))
    assert np.isfinite(c).all()
    # E[cost] = E hypot(N(0, 0.04/sqrt(1000)), 50*N(0, 0.04/sqrt(2000)))
    assert abs(c.mean() - 0.0357) < 0.004
    # different seeds give different draws; same seed reproduces
    c2 = np.asarray(normal_summary_cost(mu, sg, jnp.uint32(4)))
    assert not np.allclose(c, c2)
    c3 = np.asarray(normal_summary_cost(mu, sg, jnp.uint32(3)))
    np.testing.assert_array_equal(c, c3)
