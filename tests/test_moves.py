"""Proposal-kernel unit tests: closed-form distribution of the stretch Z,
shape/correction contracts of all moves, and an MH-invariance e2e check
(N(0,1) target stays N(0,1) under the mixture kernel)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

import kissabc_tpu as ka
from kissabc_tpu.core.ais import make_sweep
from kissabc_tpu.ops.moves import (cdf_g_inv, de_one, gaussian_diff_propose,
                                   mixture_one, propose_half, sample_g,
                                   stretch_one, walk_one)

KEY = jax.random.key(1)


def test_cdf_g_inv_closed_form():
    # transition.jl:46: (u(sqrt(a)-sqrt(1/a)) + sqrt(1/a))^2
    a = 3.0
    for u in (0.0, 0.3, 1.0):
        want = (u * (math.sqrt(a) - math.sqrt(1 / a)) + math.sqrt(1 / a)) ** 2
        assert abs(float(cdf_g_inv(u, a)) - want) < 1e-6
    # support is [1/a, a]
    assert abs(float(cdf_g_inv(0.0, a)) - 1 / a) < 1e-6
    assert abs(float(cdf_g_inv(1.0, a)) - a) < 1e-6


def test_sample_g_density():
    """Z ~ g(z) ∝ 1/sqrt(z) on [1/a, a]: mean = E[Z] =
    int z g(z) dz / int g(z) dz = (a - a^-1... check via numeric integral."""
    a = 3.0
    zs = np.asarray(jax.vmap(lambda k: sample_g(k, a))(
        jax.random.split(KEY, 40_000)))
    assert zs.min() >= 1 / a - 1e-6 and zs.max() <= a + 1e-6
    # numeric moments of g
    grid = np.linspace(1 / a, a, 100_000)
    g = 1 / np.sqrt(grid)
    m1 = np.trapezoid(grid * g, grid) / np.trapezoid(g, grid)
    assert abs(zs.mean() - m1) < 0.01


def _ens(key, h, d):
    return (jax.random.normal(key, (h, d)),)


def test_move_shapes_and_corrections():
    d = 3
    half = _ens(KEY, 8, d)
    comp = _ens(jax.random.fold_in(KEY, 1), 10, d)
    for kern, has_corr in ((stretch_one, True), (de_one, False),
                           (walk_one, False), (mixture_one, None)):
        props, corr = propose_half(KEY, half, comp, d, kernel=kern)
        assert props[0].shape == (8, d)
        assert corr.shape == (8,)
        if has_corr is False:
            np.testing.assert_array_equal(np.asarray(corr), 0.0)


def test_stretch_correction_is_jacobian():
    """corr = (d-1) log Z and the proposal lies on the line through
    (theta_i, partner)."""
    d = 4
    half = (jnp.ones((1, d)) * 2.0,)
    comp = (jnp.zeros((3, d)),)  # all partners at origin
    props, corr = propose_half(KEY, half, comp, d, kernel=stretch_one)
    # proposal = 0 + Z*(theta_i - 0) = Z*theta_i -> recover Z
    z = float(props[0][0, 0]) / 2.0
    assert np.allclose(np.asarray(props[0][0]), z * 2.0)
    assert abs(float(corr[0]) - (d - 1) * math.log(z)) < 1e-5


def test_gaussian_diff_proposal_moments():
    """smc move: W = (b-a)*ms*N(0,1)/sqrt(d); for an iid N(0,1) ensemble
    Var(prop - theta_i) = 2*ms^2/d per component."""
    n, d, ms = 4000, 2, 2.0
    ens = (jax.random.normal(KEY, (n, d)),)
    props = gaussian_diff_propose(jax.random.fold_in(KEY, 9), ens, d, ms)
    diff = np.asarray(props[0] - ens[0])
    want_var = 2 * ms**2 / d
    assert abs(diff.var() - want_var) < 0.15 * want_var
    assert abs(diff.mean()) < 0.05


def test_mixture_mh_preserves_standard_normal():
    """e2e kernel-invariance: run the red/black mixture sweep on a
    CommonLogDensity N(0, I_2) target starting FROM the target; the
    ensemble must remain N(0,1) (moment check)."""
    d = 2
    n = 64
    model = ka.CommonLogDensity(
        d, lambda k: jax.random.normal(k, (d,)),
        lambda x: -0.5 * jnp.sum(x * x))
    sweep = make_sweep(model, n)

    thetas = (jax.random.normal(KEY, (n, d)),)
    thetas = thetas[0]  # model works on bare arrays
    lds = jax.vmap(lambda th: model.loglike(th, KEY))(thetas)

    def body(carry, k):
        th, ld = carry
        th, ld = sweep(k, th, ld)
        return (th, ld), th

    (_, _), hist = jax.lax.scan(
        body, (thetas, lds), jax.random.split(jax.random.fold_in(KEY, 3), 300))
    samples = np.asarray(hist[100:]).reshape(-1, d)  # post-burnin pool
    assert abs(samples.mean()) < 0.05
    assert abs(samples.std() - 1.0) < 0.05
    # joint second moments: components uncorrelated
    c = np.corrcoef(samples.T)
    assert abs(c[0, 1]) < 0.05


def test_bits_to_variate_maps_match_jax_random_laws():
    """The raw-bits -> variate maps behind the fused per-sweep draw
    (_bits_to_uniform/_bits_to_normal/_bits_to_log_uniform) reproduce
    the laws of the jax.random primitives they replace (moment + range
    checks on real threefry bits)."""
    from kissabc_tpu.ops.moves import (_bits_to_log_uniform,
                                       _bits_to_normal,
                                       _bits_to_uniform)

    bits = jax.random.bits(jax.random.key(0), (200_000,), jnp.uint32)
    u = np.asarray(_bits_to_uniform(bits))
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 2e-3
    assert abs(u.var() - 1.0 / 12.0) < 1e-3

    z = np.asarray(_bits_to_normal(bits))
    assert np.isfinite(z).all()
    assert abs(z.mean()) < 6e-3
    assert abs(z.std() - 1.0) < 5e-3
    assert abs(np.mean(z ** 3)) < 0.02          # symmetry
    assert abs(np.mean(z ** 4) - 3.0) < 0.06    # normal kurtosis

    lu = np.asarray(_bits_to_log_uniform(bits))
    assert (lu <= 0.0).all() and np.isfinite(lu).all()
    # -lu ~ Exponential(1)
    assert abs((-lu).mean() - 1.0) < 6e-3
    assert abs((-lu).var() - 1.0) < 2e-2
