"""Unit tests for the Particles result type (MonteCarloMeasurements
parity surface: constructors, p-statistics, two-sided approx, algebra,
tree bundling)."""

import numpy as np
import pytest

import kissabc_tpu as ka
from kissabc_tpu.particles import particles_from_tree


def test_sampling_constructor():
    # MCM's Particles(N, dist) idiom
    p = ka.Particles(20_000, ka.Normal(1.5, 0.7), key=3)
    assert len(p) == 20_000
    assert abs(p.mean() - 1.5) < 0.02
    assert abs(p.std() - 0.7) < 0.02
    # discrete dist samples stay integer-valued
    q = ka.Particles(5_000, ka.Poisson(4.0), key=1)
    assert q.particles.dtype == np.int32
    assert abs(q.mean() - 4.0) < 0.15


def test_p_functions():
    p = ka.Particles(np.arange(101, dtype=np.float32))
    assert ka.pmean(p) == 50.0
    assert ka.pmedian(p) == 50.0
    assert abs(ka.pstd(p) - np.std(np.arange(101.0), ddof=1)) < 1e-6
    assert ka.pquantile(p, 0.25) == 25.0
    # also accept raw arrays
    assert ka.pmean([1.0, 3.0]) == 2.0


def test_two_sided_approx():
    a = ka.Particles(np.random.default_rng(0).normal(0.0, 1.0, 4000))
    tight = ka.Particles(np.random.default_rng(1).normal(0.5, 0.01, 4000))
    # one-sided (self std only) would fail from tight's view; two-sided
    # passes because a's std is wide
    assert tight.approx(a)
    assert a.approx(tight)
    assert not tight.approx(ka.Particles(
        np.random.default_rng(2).normal(5.0, 0.01, 4000)))


def test_algebra_and_map():
    p = ka.Particles(np.array([1.0, 2.0, 3.0]))
    assert np.allclose(((p + 1) * 2).particles, [4.0, 6.0, 8.0])
    assert np.allclose((1 - p).particles, [0.0, -1.0, -2.0])
    assert np.allclose((p ** 2).particles, [1.0, 4.0, 9.0])
    assert np.allclose(p.map(np.exp).particles, np.exp([1.0, 2.0, 3.0]))


def test_ufunc_propagation():
    # numpy ufuncs return Particles (MCM registers Base math functions);
    # __array__ alone would demote np.sin(p) to a bare ndarray
    p = ka.Particles(np.array([0.0, np.pi / 2, np.pi]))
    s = np.sin(p)
    assert isinstance(s, ka.Particles)
    assert np.allclose(s.particles, [0.0, 1.0, 0.0], atol=1e-12)
    # mixed Particles/array/scalar operands
    q = np.maximum(p, np.pi / 4)
    assert isinstance(q, ka.Particles)
    assert np.allclose(q.particles, [np.pi / 4, np.pi / 2, np.pi])
    m = np.add(np.array([1.0, 2.0, 3.0]), p)
    assert isinstance(m, ka.Particles)
    # multi-output ufuncs wrap every output
    frac, whole = np.modf(ka.Particles(np.array([1.5, 2.25, -0.5])))
    assert isinstance(frac, ka.Particles) and isinstance(whole, ka.Particles)
    assert np.allclose(frac.particles, [0.5, 0.25, -0.5])
    # reductions fall through to plain numpy scalars
    assert np.allclose(np.add.reduce(p), np.pi * 1.5)


def test_comparisons_and_extra_dunders():
    # (p > c).mean() estimates P(p > c) — MCM's mean(p > 0) idiom
    p = ka.Particles(np.random.default_rng(0).normal(0.0, 1.0, 20_000))
    mask = p > 0
    assert isinstance(mask, ka.Particles)
    assert abs(mask.mean() - 0.5) < 0.02
    assert abs((p < 1.0).mean() - 0.8413) < 0.02
    d = ka.Particles(np.array([1.0, 2.0, 3.0]))
    assert np.allclose((d % 2).particles, [1.0, 0.0, 1.0])
    assert np.allclose((d // 2).particles, [0.0, 1.0, 1.0])
    assert np.allclose((2 ** d).particles, [2.0, 4.0, 8.0])
    # == / != are clouds too: (p == k).mean() estimates P(p == k) for
    # discrete marginals
    eq = d == 2.0
    assert isinstance(eq, ka.Particles)
    assert eq.mean() == 1.0 / 3.0
    assert (d != 2.0).mean() == 2.0 / 3.0
    # ambiguous truth values raise loudly (numpy semantics) instead of
    # silently collapsing inside `if`/`in`
    import pytest
    with pytest.raises(ValueError):
        bool(eq)
    assert bool(ka.Particles(np.array([5.0])) == 5.0)


def test_hpdi():
    # standard normal: the 95% HPDI is the symmetric ±1.96 interval
    rng = np.random.default_rng(0)
    p = ka.Particles(rng.normal(0.0, 1.0, 100_000))
    lo, hi = ka.hpdi(p, 0.95)
    assert abs(lo + 1.96) < 0.05 and abs(hi - 1.96) < 0.05
    # skewed (exponential): HPDI hugs zero, shorter than equal-tail
    q = ka.Particles(rng.exponential(1.0, 100_000))
    lo, hi = ka.hpdi(q, 0.9)
    assert lo < 0.01
    eq_lo, eq_hi = np.quantile(q.particles, [0.05, 0.95])
    assert (hi - lo) < (eq_hi - eq_lo)
    # mass check: the interval really holds ~alpha of the cloud
    frac = float(((q.particles >= lo) & (q.particles <= hi)).mean())
    assert abs(frac - 0.9) < 0.005
    # accepts raw arrays too
    assert ka.hpdi(np.arange(101.0), 0.5)[0] >= 0.0
    # degenerate clouds: singleton collapses, empty raises
    assert ka.hpdi(np.array([3.0])) == (3.0, 3.0)
    import pytest
    with pytest.raises(ValueError):
        ka.hpdi(np.array([]))
    # multi-parameter posteriors: list of Particles -> per-param
    # intervals; 2-D raw arrays refuse to pool across parameters
    ivs = ka.hpdi([p, ka.Particles(rng.normal(100.0, 1.0, 10_000))], 0.95)
    assert len(ivs) == 2 and abs(ivs[1][0] - 98.04) < 0.2
    with pytest.raises(ValueError):
        ka.hpdi(np.zeros((2, 100)))


def test_tree_bundling_matrix_leaves():
    tree = (np.ones((10,)), np.arange(20.0).reshape(10, 2),
            np.arange(40.0).reshape(10, 2, 2))
    cols = particles_from_tree(tree)
    # 1 scalar + 2 vector + 4 matrix components
    assert len(cols) == 7
    # matrix components flatten row-major: entry (0,1) of walker w is
    # 4w + 1
    assert np.allclose(cols[4].particles, 4 * np.arange(10.0) + 1)


def test_chainsstack():
    a = [ka.Particles(np.zeros(5)), ka.Particles(np.ones(5))]
    b = [ka.Particles(np.ones(5)), ka.Particles(np.zeros(5))]
    out = ka.chainsstack([a, b])
    assert len(out) == 2 and len(out[0]) == 10
    assert out[0].particles.sum() == 5.0


def test_ufunc_reductions_return_python_scalars():
    # advisor r2: np.max(p)/np.add.reduce(p) came back 0-d np arrays,
    # inconsistent with Particles.mean()/std() returning float
    rng = np.random.default_rng(3)
    p = ka.Particles(rng.standard_normal(64))
    for r in (np.max(p), np.min(p), np.add.reduce(p)):
        assert isinstance(r, float)
    assert isinstance(np.sin(p), ka.Particles)


def test_mcm_constructor_sugar():
    """MCM long-tail surface (VERDICT r2 missing #3): Particles(N) is
    systematic standard normal; mu +- sigma sugar; Particles(matrix)
    returns per-column clouds."""
    p = ka.Particles(2000)
    assert abs(p.mean()) < 1e-9          # systematic: exact zero mean
    assert abs(p.std() - 1.0) < 1e-3
    q = ka.pm(3.0, 0.5, 2000)
    assert abs(q.mean() - 3.0) < 1e-9 and abs(q.std() - 0.5) < 1e-3
    assert ka.plus_minus is ka.pm
    m = np.stack([np.zeros(10), np.ones(10)], axis=1)  # [10, 2]
    cols = ka.Particles(m)
    assert isinstance(cols, list) and len(cols) == 2
    assert cols[1].mean() == 1.0


def test_sigmapoints_moments_exact():
    """Unweighted mean/cov (ddof=1) of the 2n+1 sigma points reproduce
    the inputs exactly (MCM sigmapoints contract)."""
    mvec = np.array([1.0, -2.0, 0.5])
    S = np.array([[2.0, 0.3, 0.0],
                  [0.3, 1.0, -0.2],
                  [0.0, -0.2, 0.5]])
    X = ka.sigmapoints(mvec, S)
    assert X.shape == (7, 3)
    np.testing.assert_allclose(X.mean(axis=0), mvec, atol=1e-12)
    np.testing.assert_allclose(np.cov(X.T, ddof=1), S, atol=1e-12)
    # scalar form
    Xs = ka.sigmapoints(2.0, 4.0)
    assert Xs.shape == (3, 1)
    np.testing.assert_allclose(np.var(Xs, ddof=1), 4.0)


def test_sigmapoints_reference_workflow():
    """The reference's commented workflow (smc.jl:225-236) ported
    near-verbatim: smc on the banana cost, then
    Particles(sigmapoints(mean(R), cov(R)))."""
    import jax
    import jax.numpy as jnp
    pp = ka.Factored(ka.Normal(0, 5), ka.Normal(0, 5))

    def cc(theta, key):
        x, y = theta
        k1, k2 = jax.random.split(key)
        n1 = 0.01 * jax.random.normal(k1)
        n2 = 0.01 * jax.random.normal(k2)
        return 50 * (x + n1 - y**2) ** 2 + (y - 1 + n2) ** 2

    R = ka.smc(pp, cc, alpha=0.95, nparticles=128, epstol=2.0,
               max_iters=100, key=0).P
    sP = ka.Particles(ka.sigmapoints(ka.mean(R), ka.cov(R)))
    assert isinstance(sP, list) and len(sP) == 2
    np.testing.assert_allclose(
        [sP[0].mean(), sP[1].mean()], ka.mean(R), rtol=1e-6)
    np.testing.assert_allclose(ka.cov(sP), ka.cov(R), rtol=1e-5,
                               atol=1e-10)


def test_pm_independent_clouds_combine_in_quadrature():
    """Review r3: default-keyed pm()/Particles(N) clouds must be
    INDEPENDENT (MCM global-RNG semantics) — with a shared default key
    they were perfectly correlated and stds added linearly."""
    import kissabc_tpu as ka

    x = ka.pm(1.0, 0.1)
    y = ka.pm(2.0, 0.2)
    s = (x + y).std()
    assert abs(s - np.hypot(0.1, 0.2)) < 0.02, s
    assert (ka.pm(1.0, 0.1) - ka.pm(1.0, 0.1)).std() > 0.05
    # explicit keys remain reproducible (and shared-key clouds correlate)
    a = ka.pm(0.0, 1.0, key=7)
    b = ka.pm(0.0, 1.0, key=7)
    assert (a - b).std() == 0.0


def test_particles_pickle_deepcopy():
    """Review r3: __new__ with a required positional arg broke
    pickle/deepcopy (cls.__new__(cls) with no args)."""
    import copy
    import pickle

    from kissabc_tpu import Particles

    p = Particles(np.arange(10.0))
    for q in (copy.deepcopy(p), pickle.loads(pickle.dumps(p))):
        np.testing.assert_array_equal(q.particles, p.particles)
    with pytest.raises(TypeError):
        Particles()


def test_sigmapoints_tuple_and_missing_S():
    from kissabc_tpu import Particles, sigmapoints

    rng = np.random.default_rng(3)
    p1, p2 = Particles(rng.normal(size=(400, 2)))
    sp = sigmapoints((p1, p2))
    assert sp.shape == (5, 2)
    np.testing.assert_allclose(sp.mean(0), [p1.mean(), p2.mean()],
                               atol=1e-9)
    with pytest.raises(TypeError, match="covariance"):
        sigmapoints([1.0, 2.0])
