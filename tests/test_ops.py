"""Unit tests for the jit-safe numeric kernels: masked quantile,
resampling, distinct-index sampling, masked indexing."""

import jax
import jax.numpy as jnp
import numpy as np

from kissabc_tpu.ops.moves import masked_distinct, masked_index
from kissabc_tpu.ops.quantile import ess_weights, masked_quantile, quantile
from kissabc_tpu.ops.resampling import replicate_alive, systematic
from kissabc_tpu.ops.tree import sample_distinct

KEY = jax.random.key(0)


def test_masked_quantile_matches_numpy_type7():
    rng = np.random.default_rng(0)
    x = rng.normal(size=101).astype(np.float32)
    mask = rng.random(101) < 0.6
    for q in (0.1, 0.5, 0.7, 0.95):
        got = float(masked_quantile(jnp.asarray(x), jnp.asarray(mask), q))
        want = float(np.quantile(x[mask], q))  # numpy default = type 7
        assert abs(got - want) < 1e-5, (q, got, want)


def test_quantile_full():
    x = jnp.asarray(np.arange(10, dtype=np.float32))
    assert abs(float(quantile(x, 0.5)) - 4.5) < 1e-6


def test_masked_quantile_with_inf_values():
    x = jnp.asarray([1.0, jnp.inf, 2.0, jnp.inf])
    mask = jnp.ones(4, bool)
    assert float(masked_quantile(x, mask, 0.25)) == 1.75
    assert float(masked_quantile(x, mask, 1.0)) == np.inf


def test_replicate_alive_matches_reference_formula():
    # smc.jl:146-149: repeat(idxalive, ceil(n/len))[1:n]
    alive = np.array([False, True, False, True, True, False])
    idx = np.asarray(replicate_alive(jnp.asarray(alive)))
    idxalive = np.nonzero(alive)[0]
    want = np.tile(idxalive, int(np.ceil(6 / len(idxalive))))[:6]
    np.testing.assert_array_equal(idx, want)


def test_systematic_resampling_unbiased():
    w = np.array([0.1, 0.2, 0.0, 0.4, 0.3])
    counts = np.zeros(5)
    n_rep = 400
    for i in range(n_rep):
        idx = np.asarray(systematic(jax.random.fold_in(KEY, i),
                                    jnp.asarray(w)))
        counts += np.bincount(idx, minlength=5)
    freq = counts / (n_rep * 5)
    np.testing.assert_allclose(freq, w, atol=0.01)
    assert counts[2] == 0  # zero-weight particle never chosen


def test_systematic_low_variance():
    # with equal weights systematic resampling is the identity permutation
    w = jnp.ones(8) / 8
    idx = np.asarray(systematic(KEY, w))
    np.testing.assert_array_equal(np.sort(idx), np.arange(8))


def test_systematic_stratification_bound():
    """The defining property of systematic resampling: every ancestor's
    replication count is within 1 of its expectation n*w (pins the r5
    closed-form scatter+cumsum implementation — searchsorted lowered to
    a log2(n)-iteration gather loop, 158->10 ms at 1M particles)."""
    rng = np.random.default_rng(1)
    for t, n in enumerate((7, 64, 1001)):
        w = rng.exponential(size=n).astype(np.float32) ** 3 + 1e-12
        idx = np.asarray(systematic(jax.random.fold_in(KEY, 100 + t),
                                    jnp.asarray(w)))
        wn = w / w.sum()
        counts = np.bincount(idx, minlength=n)
        assert (np.abs(counts - n * wn) <= 1.0 + 1e-4).all()
        assert counts.sum() == n


def test_sample_distinct_excludes_and_uniform():
    n = 7
    excl = (jnp.asarray(2), jnp.asarray(5))
    draws = jax.vmap(
        lambda k: sample_distinct(k, n, excl)
    )(jax.random.split(KEY, 4000))
    draws = np.asarray(draws)
    assert not np.any(draws == 2)
    assert not np.any(draws == 5)
    freq = np.bincount(draws, minlength=n) / len(draws)
    live = [0, 1, 3, 4, 6]
    np.testing.assert_allclose(freq[live], 1 / 5, atol=0.03)


def test_masked_index_and_distinct():
    mask = jnp.asarray([False, True, True, False, True, False])
    idx = jax.vmap(lambda k: masked_index(k, mask))(
        jax.random.split(KEY, 2000))
    idx = np.asarray(idx)
    assert set(np.unique(idx)) <= {1, 2, 4}
    freq = np.bincount(idx, minlength=6) / len(idx)
    np.testing.assert_allclose(freq[[1, 2, 4]], 1 / 3, atol=0.04)

    trip = jax.vmap(lambda k: jnp.stack(masked_distinct(k, mask, 3)))(
        jax.random.split(KEY, 500))
    trip = np.asarray(trip)
    assert set(np.unique(trip)) <= {1, 2, 4}
    # all three distinct in every draw
    assert all(len(set(row)) == 3 for row in trip)


def test_ess_weights():
    assert float(ess_weights(jnp.ones(10))) == 10.0
    w = jnp.asarray([1.0, 0, 0, 0])
    assert abs(float(ess_weights(w)) - 1.0) < 1e-6


def test_bisect_quantile_equals_sort_quantile():
    """masked_quantile_bisect must be bit-identical to the sort-based
    type-7 quantile, including duplicates and +-inf entries."""
    from kissabc_tpu.ops.quantile import masked_quantile_bisect
    rng = np.random.default_rng(3)
    for trial in range(6):
        n = 257
        x = rng.normal(size=n).astype(np.float32)
        if trial >= 2:  # duplicates
            x = np.round(x * 4) / 4
        if trial >= 4:  # infinities
            x[rng.random(n) < 0.2] = np.inf
            x[rng.random(n) < 0.05] = -np.inf
        mask = rng.random(n) < 0.7
        mask[0] = True
        for q in (0.05, 0.5, 0.7, 0.95, 1.0):
            a = float(masked_quantile(jnp.asarray(x), jnp.asarray(mask), q))
            b = float(masked_quantile_bisect(jnp.asarray(x),
                                             jnp.asarray(mask), q))
            if np.isnan(a):
                assert np.isnan(b), (trial, q)
            else:
                assert a == b or abs(a - b) < 2e-6 * max(1, abs(a)), \
                    (trial, q, a, b)
