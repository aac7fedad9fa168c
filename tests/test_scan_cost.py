"""make_streaming_scan_cost — the sequential (Markovian) simulator
kernel (VERDICT r3 missing #2; reference anchor: the drifted-Wiener
time-series ABC class of runtests.jl:116-131).

Coverage mirrors the i.i.d. streaming kernel's suite: an interpret-mode
stub-bit stream replayed in pure numpy (bitwise pipeline check incl.
the odd-nsteps tail and SMEM series reads), fallback statistics against
AR(1) closed forms, a posterior-recovery end-to-end run, and kwarg
validation. The hardware-PRNG statistical twin runs on-chip via the
``tpu_hw`` mark (bench.py pallas-tests row).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kissabc_tpu as ka
from kissabc_tpu.ops.pallas_kernels import (_plan_tiles,
                                            make_streaming_scan_cost,
                                            stub_bits_numpy)

ON_TPU = jax.devices()[0].platform == "tpu"

A = np.float32(0.2)  # AR(1) mean-reversion weight


def _ar1_step(th, x, eps, t):
    mu, s = th
    return (1.0 - A) * x + A * mu + s * eps


def _ar1_init(th):
    return th[0]


def _golden_scan(n, nsteps, seed, mu, s, *, block, wt, sub_rows=8,
                 series=None):
    """Pure-numpy replay of the kernel's (pid, ws, pair) stub stream for
    the AR(1) step with default 2-moment observation (or |x-y_t| series
    matching when ``series`` is given)."""
    npad, wt_ = _plan_tiles(n, block, wt)
    sb_rows = wt_ * block
    rows_per = sb_rows // 128
    npairs = -(-nsteps // 2)
    mu_p = np.zeros((npad,), np.float32)
    s_p = np.zeros((npad,), np.float32)
    mu_p[:n], s_p[:n] = mu, s
    mu_p = mu_p.reshape(-1, 128)
    s_p = s_p.reshape(-1, 128)
    nstats = 2 if series is None else 1
    out = [np.zeros((npad // 128, 128), np.float64)
           for _ in range(nstats)]
    for pid in range(npad // sb_rows):
        for ws in range(rows_per // sub_rows):
            r0 = pid * rows_per + ws * sub_rows
            rs = slice(r0, r0 + sub_rows)
            x = mu_p[rs].astype(np.float64)
            th = (mu_p[rs].astype(np.float64), s_p[rs].astype(np.float64))
            sums = [np.zeros((sub_rows, 128), np.float64)
                    for _ in range(nstats)]
            for j in range(npairs):
                ctr = 2 * (ws * npairs + j)
                b1 = stub_bits_numpy(pid, seed, ctr, (sub_rows, 128))
                b2 = stub_bits_numpy(pid, seed, ctr + 1, (sub_rows, 128))
                u1 = (((b1 >> 9) | np.uint32(0x3F800000))
                      .view(np.float32) - 1.0)
                u2 = (((b2 >> 9) | np.uint32(0x3F800000))
                      .view(np.float32) - 1.0)
                r = np.sqrt(-2.0 * np.log1p(-u1.astype(np.float64)))
                ang = 2.0 * np.pi * u2.astype(np.float64)
                for half, eps in ((0, r * np.cos(ang)),
                                  (1, r * np.sin(ang))):
                    t = 2 * j + half
                    if t >= nsteps:
                        continue
                    x = (1.0 - A) * x + A * th[0] + th[1] * eps
                    if series is None:
                        sums[0] += x
                        sums[1] += x * x
                    else:
                        sums[0] += np.abs(x - series[t])
            for p in range(nstats):
                out[p][rs] = sums[p] / nsteps
    return [o.reshape(npad)[:n] for o in out]


def test_stub_stream_vs_numpy_golden_odd_nsteps():
    """Interpret-mode kernel vs the numpy replay, multiple programs AND
    multiple walker sub-slabs per program, odd nsteps (tail path)."""
    n, nsteps, block, wt = 2100, 11, 128, 16
    rng = np.random.default_rng(7)
    mu = rng.uniform(0.5, 2.0, n).astype(np.float32)
    s = rng.uniform(0.5, 1.5, n).astype(np.float32)

    cost = make_streaming_scan_cost(
        _ar1_step, _ar1_init, lambda th, m: m[0] + 10.0 * m[1],
        nsteps=nsteps, block=block, walker_tiles=wt, sub_rows=8,
        bits="stub", interpret=True)
    got = np.asarray(cost((jnp.asarray(mu), jnp.asarray(s)),
                          jax.random.key(0)))

    seed = int(jax.random.bits(jax.random.key(0), (), jnp.uint32))
    m1, m2 = _golden_scan(n, nsteps, seed, mu, s, block=block, wt=wt)
    np.testing.assert_allclose(got, m1 + 10.0 * m2, rtol=3e-4, atol=3e-5)


def test_series_smem_reads_vs_golden():
    """Observed-series matching: per-step SMEM scalars reach observe()
    in step order."""
    n, nsteps, block, wt = 1024, 7, 128, 8
    rng = np.random.default_rng(3)
    mu = rng.uniform(0.5, 2.0, n).astype(np.float32)
    s = rng.uniform(0.5, 1.5, n).astype(np.float32)
    y = np.linspace(0.0, 2.0, nsteps).astype(np.float32)

    cost = make_streaming_scan_cost(
        _ar1_step, _ar1_init, lambda th, m: m[0], nsteps=nsteps,
        observe=lambda th, x, t, obs: (jnp.abs(x - obs),), series=y,
        block=block, walker_tiles=wt, sub_rows=8, bits="stub",
        interpret=True)
    got = np.asarray(cost((jnp.asarray(mu), jnp.asarray(s)),
                          jax.random.key(2)))

    seed = int(jax.random.bits(jax.random.key(2), (), jnp.uint32))
    (m1,) = _golden_scan(n, nsteps, seed, mu, s, block=block, wt=wt,
                         series=y)
    np.testing.assert_allclose(got, m1, rtol=3e-4, atol=3e-5)


def test_fallback_ar1_stationary_moments():
    """Off-TPU threefry fallback: time-averaged mean/variance of the
    AR(1) chain match the stationary closed forms."""
    n, nsteps = 4096, 512
    mu = jnp.full((n,), 1.0)
    s = jnp.full((n,), 1.0)
    c1 = make_streaming_scan_cost(_ar1_step, _ar1_init,
                                  lambda th, m: m[0], nsteps=nsteps)
    c2 = make_streaming_scan_cost(_ar1_step, _ar1_init,
                                  lambda th, m: m[1], nsteps=nsteps)
    m1 = np.asarray(c1((mu, s), jax.random.key(5)))
    m2 = np.asarray(c2((mu, s), jax.random.key(5)))
    var = m2 - m1 * m1
    stat_var = 1.0 / (1.0 - (1.0 - float(A)) ** 2)
    assert abs(m1.mean() - 1.0) < 0.02
    # time-average variance on a finite path started at the mean biases
    # slightly low; generous tolerance
    assert abs(var.mean() - stat_var) / stat_var < 0.1


def test_pytree_state_two_components():
    """State may be a pytree: a 2-component system (position +
    EW-average of |position|) evolves both leaves."""
    def step(th, xt, eps, t):
        x, acc = xt
        x = x + th[0] * 0.1 + eps
        return (x, 0.9 * acc + 0.1 * jnp.abs(x))

    def init(th):
        return (th[0], jnp.abs(th[0]))

    cost = make_streaming_scan_cost(
        step, init, lambda th, m: m[0],
        observe=lambda th, xt, t, obs: (xt[1],), nsteps=64)
    out = np.asarray(cost((jnp.full((512,), 0.5),), jax.random.key(1)))
    assert out.shape == (512,)
    assert np.all(np.isfinite(out)) and out.mean() > 0.2


def test_smc_recovers_ar1_parameters():
    """End-to-end posterior recovery through smc: match the AR(1)
    stationary mean and variance; posterior concentrates at the true
    (mu, s). Runs the fallback path in CI; the identical cost runs the
    Pallas kernel on TPU."""
    nsteps = 256
    stat_var = 1.0 / (1.0 - (1.0 - float(A)) ** 2)

    def reduce_cost(th, m):
        var = jnp.maximum(m[1] - m[0] * m[0], 0.0)
        return jnp.hypot(m[0] - 1.0, (var - stat_var) / stat_var)

    cost = make_streaming_scan_cost(_ar1_step, _ar1_init, reduce_cost,
                                    nsteps=nsteps)
    prior = ka.Factored(ka.Uniform(0, 2), ka.Uniform(0.3, 2.0))
    res = ka.smc(prior, cost, nparticles=512, cost_vectorized=True,
                 epstol=0.15, key=9)
    mu_post, s_post = res.P
    assert abs(mu_post.mean() - 1.0) < 0.15
    assert abs(s_post.mean() - 1.0) < 0.25


def test_validation():
    ok = dict(nsteps=4)
    mk = lambda **kw: make_streaming_scan_cost(  # noqa: E731
        _ar1_step, _ar1_init, lambda th, m: m[0], **{**ok, **kw})
    with pytest.raises(ValueError, match="nsteps"):
        mk(nsteps=0)
    with pytest.raises(ValueError, match="noise"):
        mk(noise="cauchy")
    with pytest.raises(ValueError, match="block"):
        mk(block=100)
    with pytest.raises(ValueError, match="sub_rows"):
        mk(sub_rows=7)
    with pytest.raises(ValueError, match="nmoments"):
        mk(nmoments=0)
    with pytest.raises(ValueError, match="series"):
        make_streaming_scan_cost(
            _ar1_step, _ar1_init, lambda th, m: m[0], nsteps=4,
            observe=lambda th, x, t, obs: (x,),
            series=np.zeros((5,), np.float32))
    with pytest.raises(ValueError, match="tuple"):
        c = make_streaming_scan_cost(
            _ar1_step, _ar1_init, lambda th, m: m,
            observe=lambda th, x, t, obs: x, nsteps=4)
        c((jnp.ones((128,)), jnp.ones((128,))), jax.random.key(0))
    with pytest.raises(ValueError, match="scalar"):
        c = make_streaming_scan_cost(_ar1_step, _ar1_init,
                                     lambda th, m: m[0], nsteps=4)
        c((jnp.ones((8, 2)), jnp.ones((8, 2))), jax.random.key(0))


@pytest.mark.tpu_hw
@pytest.mark.skipif(not ON_TPU, reason="needs TPU hardware PRNG")
def test_hw_statistics_match_fallback():
    """Hardware-PRNG kernel vs the threefry fallback: time-averaged
    AR(1) stationary moments agree within Monte-Carlo error."""
    n, nsteps = 131072, 512
    mu = jnp.full((n,), 1.0)
    s = jnp.full((n,), 1.0)
    c1 = make_streaming_scan_cost(_ar1_step, _ar1_init,
                                  lambda th, m: m[0], nsteps=nsteps)
    c2 = make_streaming_scan_cost(_ar1_step, _ar1_init,
                                  lambda th, m: m[1], nsteps=nsteps)
    m1 = np.asarray(c1((mu, s), jax.random.key(3)))
    m2 = np.asarray(c2((mu, s), jax.random.key(3)))
    var = m2 - m1 * m1
    stat_var = 1.0 / (1.0 - (1.0 - float(A)) ** 2)
    assert abs(m1.mean() - 1.0) < 0.01
    assert abs(var.mean() - stat_var) / stat_var < 0.06
    # per-walker spread: time-averages over 512 correlated steps
    assert 0.02 < m1.std() < 0.5


def test_scan_cost_on_mesh():
    """shard_batched_cost composes with the scan cost on a walker-
    sharded mesh (the multi-chip route a Pallas scan kernel takes);
    per-shard key folding gives independent streams per shard."""
    from kissabc_tpu.ops.pallas_kernels import shard_batched_cost
    from kissabc_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(walker=8)
    cost = shard_batched_cost(
        make_streaming_scan_cost(_ar1_step, _ar1_init,
                                 lambda th, m: jnp.abs(m[0] - 1.0),
                                 nsteps=64),
        mesh)
    prior = ka.Factored(ka.Uniform(0, 2), ka.Uniform(0.3, 2.0))
    res = ka.smc(prior, cost, nparticles=64, mesh=mesh,
                 cost_vectorized=True, epstol=0.5, max_iters=50, key=3)
    assert res.C.shape[0] == 64
    assert float(res.eps) <= 0.5 or res.iterations >= 50


def test_odd_nsteps_tail_passes_traced_t():
    """Regression (r4 review): the odd-nsteps tail step used to pass a
    raw Python int as t, so step/observe using the documented
    t.astype(...) crashed on the kernel path while passing on the
    threefry fallback."""
    def step(th, x, eps, t):
        return x + th[0] * (t.astype(jnp.float32) + 1.0) * 0.0 + eps

    cost = make_streaming_scan_cost(
        step, _ar1_init,
        lambda th, m: m[0],
        observe=lambda th, x, t, obs: (x * (t.astype(jnp.float32) + 1.0),),
        nsteps=5, block=128, walker_tiles=8, sub_rows=8, bits="stub",
        interpret=True)
    out = np.asarray(cost((jnp.ones((1024,)), jnp.ones((1024,))),
                          jax.random.key(0)))
    assert np.isfinite(out).all()


def test_unalignable_row_count_raises_not_hangs():
    """Regression (r4 review): a per-program row count that is not a
    multiple of 8 made the sub_rows clamp loop spin forever; it must
    raise instead."""
    cost = make_streaming_scan_cost(
        _ar1_step, _ar1_init, lambda th, m: m[0], nsteps=4,
        block=128, walker_tiles=1, interpret=True, bits="stub")
    with pytest.raises(ValueError, match="view-rows"):
        cost((jnp.ones((128,)), jnp.ones((128,))), jax.random.key(0))


def test_uniform_noise_fallback_statistics():
    """noise='uniform': AR(1) driven by centered scaled uniforms has the
    same stationary moments (fallback path; the kernel path shares the
    bit->uniform pipeline already golden-tested for 'normal')."""
    SQ12 = np.float32(np.sqrt(12.0))

    def step(th, x, eps, t):
        mu, s = th
        return (1.0 - A) * x + A * mu + s * (eps - 0.5) * SQ12

    n, nsteps = 4096, 512
    c1 = make_streaming_scan_cost(step, _ar1_init, lambda th, m: m[0],
                                  nsteps=nsteps, noise="uniform")
    c2 = make_streaming_scan_cost(step, _ar1_init, lambda th, m: m[1],
                                  nsteps=nsteps, noise="uniform")
    mu = jnp.full((n,), 1.0)
    s = jnp.full((n,), 1.0)
    m1 = np.asarray(c1((mu, s), jax.random.key(8)))
    m2 = np.asarray(c2((mu, s), jax.random.key(8)))
    var = m2 - m1 * m1
    stat_var = 1.0 / (1.0 - (1.0 - float(A)) ** 2)
    assert abs(m1.mean() - 1.0) < 0.02
    assert abs(var.mean() - stat_var) / stat_var < 0.1
    # interpret-mode uniform pipeline executes and stays in [0,1) ->
    # bounded increments (smoke for the kernel body's uniform branch)
    ci = make_streaming_scan_cost(step, _ar1_init, lambda th, m: m[0],
                                  nsteps=8, noise="uniform", block=128,
                                  walker_tiles=8, sub_rows=8,
                                  bits="stub", interpret=True)
    out = np.asarray(ci((mu[:1024], s[:1024]), jax.random.key(0)))
    assert np.isfinite(out).all()
