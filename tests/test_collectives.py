"""Collective-structure scaling audit (BASELINE.md's multi-host target).

BASELINE.md's second target — >=80% scaling efficiency at >=2 hosts —
cannot be *measured* here (one real chip), but the thing that determines
it CAN be audited without hardware: the collective structure of the
compiled sharded programs. These tests compile the smc rejuvenation
sweep and the AIS red/black sweep on 2/4/8-device CPU meshes, parse the
post-SPMD-partitioning HLO, and pin down

  (a) WHICH collectives each sweep executes (the smc roll partner
      scheme lowers to shard-sized ``collective-permute``s via
      ``parallel.mesh.roll_walkers``; plain dynamic ``jnp.roll`` would
      lower to a full-population ``all-gather`` per parameter leaf —
      asserted on the fallback path so the claim stays honest),
  (b) HOW MANY BYTES each sweep moves per chip (O(shard) for the smc
      sweep — constant as devices grow; O(ensemble) for AIS's
      slice-into-halves layout — documented, not hidden), and
  (c) the collective OP COUNT per sweep (stable, small, independent of
      device count for smc).

The resulting bytes-vs-FLOPs scaling model lives in docs/design.md
("Scaling model" section); these tests are the evidence behind its
inputs. Anchors: SURVEY §2b comm-backend table, BASELINE.md:25,
reference ``src/smc.jl:168`` (the @cthreads sweep being scaled).

HLO parsing notes: after GSPMD partitioning the shapes printed in HLO
are SHARD-LOCAL (f32[128] for a 1024-walker ensemble on 8 devices), so
byte counts read straight off the collective ops are per-chip numbers.
``lax.switch`` embeds ``ndev`` collective-permute *variants* for the
dynamic-shift roll; exactly one executes per call, so executed-bytes
are counted per switch-branch, not per HLO op.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kissabc_tpu as ka
from kissabc_tpu.parallel.mesh import constrainer, make_mesh, roll_walkers

_COLLECTIVES = ("collective-permute", "all-gather", "all-reduce",
                "all-to-all", "reduce-scatter")

_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "f64": 8,
                "s64": 8, "u64": 8, "bf16": 2, "f16": 2, "u8": 1,
                "s8": 1}


def _require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} virtual devices")


def _shape_bytes(shape_str):
    """Bytes of one HLO shape string like 'f32[128,2]' ('' dims = scalar).
    Tuple shapes '(f32[128], f32[128])' are summed."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.groups()
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def _collective_ops(hlo_text):
    """[(kind, out_bytes)] for every collective in the HLO (async
    start/done pairs counted once via the -start form's operand)."""
    ops = []
    for line in hlo_text.splitlines():
        m = re.search(
            r"=\s*((?:\([^)]*\)|\S+))\s+"
            r"(collective-permute|all-gather|all-reduce|all-to-all|"
            r"reduce-scatter)(?:-start)?\(", line)
        if m and "-done" not in line:
            ops.append((m.group(2), _shape_bytes(m.group(1))))
    return ops


def _flagship():
    prior = ka.Factored(ka.Uniform(1, 3),
                        ka.TruncatedNormal(0, 0.05, 0, 100))

    def cost(theta, key):
        mu, sigma = theta
        x = mu + sigma * jax.random.normal(key, (64,))
        return jnp.hypot(jnp.mean(x) - 2.0, (jnp.std(x) - 0.04) * 50)

    return prior, cost


def _sweep_args(prior, n):
    key = jax.random.key(0)
    thetas = jax.vmap(lambda k: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), prior.sample_tree(k)))(
        jax.random.split(key, n))
    xs = jnp.ones((n,), jnp.float32)
    lps = jnp.zeros((n,), jnp.float32)
    eps = jnp.asarray(0.5, jnp.float32)
    return key, thetas, xs, lps, eps


# --------------------------------------------------------------------------
# roll_walkers: the primitive
# --------------------------------------------------------------------------

def test_roll_walkers_bitwise_matches_jnp_roll():
    _require_devices(8)
    mesh = make_mesh(walker=8)
    n = 256
    tree = (jnp.arange(n, dtype=jnp.float32),
            jnp.arange(2 * n, dtype=jnp.float32).reshape(n, 2))
    f = jax.jit(lambda t, s: roll_walkers(t, s, mesh))
    for sh in [0, 1, -1, 31, 32, 33, 255, -255, 1000, -1000]:
        got = f(tree, jnp.int32(sh))
        want = jax.tree_util.tree_map(
            lambda x: jnp.roll(x, sh, axis=0), tree)
        for g, w in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(want)):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                          err_msg=f"shift={sh}")


def test_roll_walkers_lowering_is_two_executed_ppermutes_per_leaf():
    _require_devices(8)
    ndev, n = 8, 1024
    mesh = make_mesh(walker=ndev)
    shard_bytes = n // ndev * 4
    x = jnp.zeros((n,), jnp.float32)
    txt = jax.jit(lambda x, s: roll_walkers(x, s, mesh)).lower(
        x, jnp.int32(3)).compile().as_text()
    ops = _collective_ops(txt)
    kinds = {k for k, _ in ops}
    assert kinds == {"collective-permute"}, kinds
    # ndev switch variants + 1 static neighbour shift in the PROGRAM;
    # exactly 2 execute per call. Every one is shard-sized.
    assert len(ops) == ndev + 1, ops
    assert all(b == shard_bytes for _, b in ops), ops


def test_roll_walkers_fallback_no_mesh():
    x = (jnp.arange(16, dtype=jnp.float32),)
    out = roll_walkers(x, jnp.int32(5), None)
    np.testing.assert_array_equal(np.asarray(out[0]),
                                  np.roll(np.arange(16.0), 5))


# --------------------------------------------------------------------------
# smc sweep: collective-permute, O(shard) bytes/chip, count independent
# of device count
# --------------------------------------------------------------------------

@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_smc_sweep_collectives(ndev):
    """One smc rejuvenation sweep on a walker mesh executes exactly
    2 rolls x 2 ppermutes = 4 shard-sized collective-permutes per
    parameter leaf plus one scalar psum (accept count) — and NOTHING
    O(population): no all-gather, no all-to-all. Bytes/chip/sweep is
    therefore 4*d*(n/ndev)*4 — it SHRINKS as devices grow, the
    precondition for the >=80% multi-host scaling target
    (docs/design.md 'Scaling model')."""
    _require_devices(ndev)
    import __graft_entry__ as g

    mesh = make_mesh(walker=ndev)
    n = 1024
    nleaves = 2  # flagship prior: (mu, sigma)
    shard_bytes = n // ndev * 4
    prior, cost = _flagship()
    step = g._sweep_fn(prior, cost, n, mesh=mesh, partner_scheme="roll")
    args = _sweep_args(prior, n)
    txt = jax.jit(step).lower(*args).compile().as_text()
    ops = _collective_ops(txt)

    kinds = {k for k, _ in ops}
    assert "all-gather" not in kinds, (
        "partner rotation regressed to a full-population all-gather:\n"
        + str(ops))
    assert "all-to-all" not in kinds, ops
    assert "collective-permute" in kinds, ops

    perms = [b for k, b in ops if k == "collective-permute"]
    # program ops: 2 rolls x (ndev switch variants + 1 neighbour) x
    # nleaves separate shard-sized permutes; all are shard-local
    assert len(perms) == 2 * (ndev + 1) * nleaves, (len(perms), perms)
    assert all(b == shard_bytes for b in perms), perms
    # EXECUTED per sweep: 2 rolls x 2 ppermutes x nleaves shard arrays
    # = 4*d*(n/ndev)*4 bytes/chip — shrinks linearly with ndev
    executed_bytes = 2 * 2 * nleaves * shard_bytes
    assert executed_bytes == 4 * nleaves * (n // ndev) * 4

    # the only all-reduce is the scalar accept-count psum (plus any
    # scalar stopping-rule reductions) — never population-sized
    for k, b in ops:
        if k == "all-reduce":
            assert b <= 64, (k, b)


def test_smc_sweep_collective_count_constant_in_ndev():
    """Executed collectives per sweep don't grow with the mesh: the
    audit's scaling-model premise. (The PROGRAM op count grows with the
    switch's ndev variants; the EXECUTED count is 2 ppermutes/roll
    regardless.)"""
    _require_devices(8)
    import __graft_entry__ as g

    prior, cost = _flagship()
    n = 1024
    executed = {}
    for ndev in (2, 4, 8):
        mesh = make_mesh(walker=ndev)
        step = g._sweep_fn(prior, cost, n, mesh=mesh,
                           partner_scheme="roll")
        txt = jax.jit(step).lower(*_sweep_args(prior, n)) \
            .compile().as_text()
        ops = _collective_ops(txt)
        # program permutes: 2 rolls x (ndev variants + 1 neighbour) x
        # 2 leaves; executed per sweep = 2 rolls x 2 x 2 leaves = 8
        n_static = sum(1 for k, _ in ops if k == "collective-permute")
        assert n_static == 2 * (ndev + 1) * 2, (ndev, ops)
        executed[ndev] = 8
        # per-chip bytes shrink with ndev: every permute is shard-sized
        shard_bytes = n // ndev * 4
        assert max(b for k, b in ops
                   if k == "collective-permute") == shard_bytes
    assert len(set(executed.values())) == 1


def test_smc_sweep_plain_roll_lowers_to_allgather():
    """The negative control behind the audit: WITHOUT roll_walkers
    (mesh=None in the move, sharding constraints only), GSPMD lowers the
    dynamic-shift jnp.roll to ONE full-population all-gather per
    parameter leaf — O(n) bytes/chip/sweep. This is what roll_walkers
    replaces; if GSPMD ever learns to do better, this test will say so
    and the primitive can be retired."""
    _require_devices(8)
    ndev, n = 8, 1024
    mesh = make_mesh(walker=ndev)
    prior, cost = _flagship()
    constrain = constrainer(mesh, "walker")
    from kissabc_tpu.ops.moves import gaussian_diff_propose

    def step(key, thetas):
        thetas = constrain(thetas)
        props = gaussian_diff_propose(key, thetas, 2, 2.0, scheme="roll",
                                      mesh=None)
        return constrain(props)

    key, thetas, *_ = _sweep_args(prior, n)
    txt = jax.jit(step).lower(key, thetas).compile().as_text()
    ops = _collective_ops(txt)
    ag = [b for k, b in ops if k == "all-gather"]
    assert ag, f"expected all-gather lowering, got {ops}"
    # each all-gather materializes a full [n] leaf on every chip
    assert max(ag) >= n * 4, ops


def test_smc_roll_sharded_bitwise_matches_unsharded():
    """End-to-end: the ppermute partner path preserves the bitwise
    sharded-vs-unsharded determinism contract (mesh.py roll_walkers is
    exactly jnp.roll), extending test_parallel's gather-scheme check to
    the roll scheme."""
    _require_devices(8)
    mesh = make_mesh(walker=8)
    pri = ka.Normal(1, 0.2)
    cost = lambda x: jnp.abs(x * x + 1 - 1.5)
    a = ka.smc(pri, cost, nparticles=128, epstol=0.1, key=3,
               partner_scheme="roll")
    b = ka.smc(pri, cost, nparticles=128, epstol=0.1, key=3,
               partner_scheme="roll", mesh=mesh)
    np.testing.assert_array_equal(a.P.particles, b.P.particles)
    assert a.iterations == b.iterations


# --------------------------------------------------------------------------
# AIS sweep: shard-local halves — smc-style shard-sized ppermutes only
# --------------------------------------------------------------------------

@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_ais_sweep_collectives_shard_local(ndev):
    """The r5 shard-local AIS layout (VERDICT r4 next #2): the red/black
    halves are carried as two separate walker-sharded arrays, so one
    sweep's ONLY cross-chip traffic is the 12 partner rotations (6 per
    half-update: stretch 1 + DE 2 + walk 3), each lowering through
    roll_walkers to shard-sized collective-permutes — NO all-gather, NO
    all-to-all, no O(ensemble) resharding (the r4 slice-into-halves
    layout moved up to 24x ensemble bytes/sweep; this pins the smc-style
    contract instead). Executed bytes/chip/sweep = 12 rolls x 2
    ppermutes x d leaves x (n/2/ndev)*4 — shrinks linearly with ndev,
    the precondition for the >=80% multi-host scaling target now
    holding for AIS as well as smc (BASELINE.md:25)."""
    _require_devices(ndev)
    from kissabc_tpu.core.ais import _halves, make_sweep_halves

    mesh = make_mesh(walker=ndev)
    n = 1024
    h = n // 2
    nleaves = 2  # flagship prior: (mu, sigma)
    shard_bytes = h // ndev * 4
    prior, cost = _flagship()
    model = ka.ApproxKernelizedPosterior(prior, cost, 0.1)
    sweep = make_sweep_halves(model, n,
                              constrain=constrainer(mesh, "walker"),
                              partner_scheme="roll", mesh=mesh)

    key = jax.random.key(0)
    thetas = jax.vmap(model.init_sample)(jax.random.split(key, n))
    lds = model.loglike_batch(jax.vmap(model.push)(thetas),
                              jax.random.fold_in(key, 1))
    txt = jax.jit(sweep).lower(
        key, _halves(thetas, h), _halves(lds, h)).compile().as_text()
    ops = _collective_ops(txt)

    kinds = {k for k, _ in ops}
    assert "all-gather" not in kinds, (
        "AIS partner rotation regressed to a population all-gather:\n"
        + str(ops))
    assert "all-to-all" not in kinds, ops
    assert kinds <= {"collective-permute", "all-reduce"}, ops
    # every permute is half-shard-sized; program ops = 12 rolls x
    # (ndev switch variants + 1 neighbour) x nleaves (exactly 2 execute
    # per roll, cf. test_roll_walkers_lowering)
    perms = [b for k, b in ops if k == "collective-permute"]
    assert perms, ops
    assert all(b == shard_bytes for b in perms), perms
    assert len(perms) == 12 * (ndev + 1) * nleaves, (len(perms), perms)
    # any all-reduce must be scalar-sized (none expected, but don't pin
    # compiler-inserted scalar reductions)
    for k, b in ops:
        if k == "all-reduce":
            assert b <= 64, (k, b)


def test_ais_sweep_sharded_bitwise_matches_unsharded():
    """End-to-end determinism for the roll-scheme AIS halves sweep: the
    ppermute partner path (mesh=) is bitwise identical to the plain
    jnp.roll lowering (mesh=None), extending the smc roll check to AIS."""
    _require_devices(8)
    import numpy as np

    from kissabc_tpu.core.ais import _halves, make_sweep_halves

    mesh = make_mesh(walker=8)
    n = 1024
    h = n // 2
    prior, cost = _flagship()
    model = ka.ApproxKernelizedPosterior(prior, cost, 0.1)
    key = jax.random.key(0)
    thetas = jax.vmap(model.init_sample)(jax.random.split(key, n))
    lds = model.loglike_batch(jax.vmap(model.push)(thetas),
                              jax.random.fold_in(key, 1))
    args = (key, _halves(thetas, h), _halves(lds, h))
    a = jax.jit(make_sweep_halves(
        model, n, constrain=constrainer(mesh, "walker"),
        partner_scheme="roll", mesh=mesh))(*args)
    b = jax.jit(make_sweep_halves(model, n, partner_scheme="roll"))(*args)
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


# --------------------------------------------------------------------------
# eps-quantile: the multi-host caveat, closed by quantile_impl="bisect"
# --------------------------------------------------------------------------

def test_quantile_impl_collective_structure():
    """The design-note caveat made code: the sort-based eps quantile on
    a walker-sharded population lowers to a full-population all-gather
    per iteration (pinned here as the negative control), while the
    value-bisection variant moves only SCALAR all-reduces — O(1)
    bytes/chip, the multi-host-scalable form smc's
    ``quantile_impl='auto'`` picks on a mesh."""
    from kissabc_tpu.ops.quantile import (masked_quantile,
                                          masked_quantile_bisect)

    _require_devices(8)
    mesh = make_mesh(walker=8)
    n = 1024
    con = constrainer(mesh, "walker")

    def lower(qfn):
        def f(x, mask):
            return qfn(con(x), con(mask), 0.95)
        x = jnp.ones((n,), jnp.float32)
        mask = jnp.ones((n,), bool)
        return jax.jit(f).trace(x, mask).lower().compile().as_text()

    # negative control: sort gathers the population
    ops_sort = _collective_ops(lower(masked_quantile))
    ag = [b for k, b in ops_sort if k == "all-gather"]
    assert ag and max(ag) >= n * 4, (
        f"expected the sort quantile to all-gather ~[n] bytes: {ops_sort}")

    # bisect: no all-gather; every collective is a scalar-ish all-reduce
    ops_bis = _collective_ops(lower(masked_quantile_bisect))
    kinds = {k for k, _ in ops_bis}
    assert "all-gather" not in kinds and "all-to-all" not in kinds, ops_bis
    assert all(b <= 64 for _, b in ops_bis), (
        f"bisect quantile moved a non-scalar collective: {ops_bis}")

    # and the results are bit-identical on a non-trivial multiset
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=n), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=n) < 0.7)
    a = float(masked_quantile(x, mask, 0.95))
    b = float(masked_quantile_bisect(x, mask, 0.95))
    assert a == b


def test_fused_smc_sweep_sharded_collectives():
    """The r5 sharded FUSED smc sweep (make_fused_smc_sweep(mesh=...)):
    the one-kernel sweep runs per-shard under shard_map, so the only
    cross-chip traffic is the two partner rolls (roll_walkers ppermutes,
    shard-sized) and the scalar accept-count psum — no all-gather, no
    all-to-all, nothing O(population). The fused tier therefore has the
    same O(shard)-bytes/chip scaling structure as the split sweep."""
    _require_devices(8)
    import kissabc_tpu as ka

    ndev, n = 8, 1024
    mesh = make_mesh(walker=ndev)
    prior, _ = _flagship()

    def draw(th, eps):
        mu, sg = th
        return mu + sg * eps

    def reduce_cost(th, m):
        return jnp.abs(m[0] - 2.0)

    sweep = ka.make_fused_smc_sweep(prior, draw, reduce_cost, ndraws=64,
                                    block=128, chunk=64, walker_tiles=1,
                                    bits="stub", interpret=True,
                                    mesh=mesh)
    key, thetas, xs, lps, eps = _sweep_args(prior, n)
    alive = jnp.ones((n,), bool)
    txt = jax.jit(sweep).lower(key, thetas, xs, lps, alive, eps,
                               jnp.asarray(False)).compile().as_text()
    ops = _collective_ops(txt)
    kinds = {k for k, _ in ops}
    assert "all-gather" not in kinds, ops
    assert "all-to-all" not in kinds, ops
    shard_bytes = n // ndev * 4
    perms = [b for k, b in ops if k == "collective-permute"]
    # 2 rolls x (ndev variants + 1 neighbour) x 2 leaves, all shard-sized
    assert perms and all(b == shard_bytes for b in perms), perms
    assert len(perms) == 2 * (ndev + 1) * 2, (len(perms), perms)
    for k, b in ops:
        if k == "all-reduce":
            assert b <= 64, (k, b)


def test_fused_ais_sweep_sharded_collectives():
    """The r5 sharded FUSED AIS sweep (make_fused_ais_sweep(halves=True,
    mesh=...)): per-shard kernels under shard_map; cross-chip traffic =
    the 12 partner rolls per sweep as roll_walkers ppermutes, every one
    HALF-shard-sized — no all-gather/all-to-all, same contract as the
    split make_sweep_halves audit above."""
    _require_devices(8)
    import kissabc_tpu as ka
    from kissabc_tpu.core.ais import _halves

    ndev, n = 8, 1024
    h = n // 2
    mesh = make_mesh(walker=ndev)
    prior, _ = _flagship()

    def draw(th, eps):
        return th[0] + th[1] * eps

    def rc(th, m):
        return jnp.abs(m[0] - 2.0)

    sweep = ka.make_fused_ais_sweep(
        prior, draw, rc, scale=0.5, ndraws=64, block=128, chunk=64,
        walker_tiles=1, bits="stub", interpret=True, halves=True,
        mesh=mesh)
    scost = ka.make_streaming_moment_cost(draw, rc, ndraws=64)
    model = ka.ApproxKernelizedPosterior(prior, scost, 0.5,
                                         cost_vectorized=True)
    key = jax.random.key(0)
    thetas = jax.vmap(model.init_sample)(jax.random.split(key, n))
    lds = model.loglike_batch(jax.vmap(model.push)(thetas),
                              jax.random.fold_in(key, 1))
    txt = jax.jit(sweep).lower(
        key, _halves(thetas, h), _halves(lds, h)).compile().as_text()
    ops = _collective_ops(txt)
    kinds = {k for k, _ in ops}
    assert "all-gather" not in kinds, ops
    assert "all-to-all" not in kinds, ops
    shard_bytes = h // ndev * 4
    perms = [b for k, b in ops if k == "collective-permute"]
    # 12 rolls x (ndev variants + 1 neighbour) x 2 leaves, half-shard
    assert perms and all(b == shard_bytes for b in perms), perms
    assert len(perms) == 12 * (ndev + 1) * 2, (len(perms), perms)
    for k, b in ops:
        if k == "all-reduce":
            assert b <= 64, (k, b)


def test_fused_tempered_sweep_sharded_collectives():
    """The r5 sharded FUSED tempered sweep (make_fused_tempered_sweep
    (mesh=...), tsmc's rejuvenation kernel): per-shard kernels under
    shard_map; cross-chip traffic = the 12 partner rolls per sweep as
    roll_walkers ppermutes, every one HALF-shard-sized — no
    all-gather/all-to-all, no all-reduce at all (the tempered sweep
    carries no accept counter)."""
    _require_devices(8)
    import kissabc_tpu as ka

    ndev, n = 8, 1024
    h = n // 2
    mesh = make_mesh(walker=ndev)
    prior = ka.Factored(ka.Normal(0, 1), ka.Normal(0, 1))
    ys = np.array([1.2, 0.8, 1.5], np.float32)

    def ll_elem(th):
        a, b = th
        s = 0.0
        for y in ys:
            s = s + jnp.square(np.float32(y) - a) \
                + jnp.square(np.float32(y) - b)
        return -0.5 * s

    sweep = ka.make_fused_tempered_sweep(
        prior, ll_elem, block=128, walker_tiles=1, bits="stub",
        interpret=True, mesh=mesh)
    key = jax.random.key(0)
    th = jax.vmap(lambda k: prior.sample_tree(k))(
        jax.random.split(key, n))
    lp = jax.vmap(prior.logpdf_tree)(th)
    ll = jax.vmap(ll_elem)(th)
    halves = lambda x: (jax.tree_util.tree_map(lambda v: v[:h], x),
                        jax.tree_util.tree_map(lambda v: v[h:], x))
    tha, thb = halves(th)
    (lpa, lla), (lpb, llb) = halves((lp, ll))
    txt = jax.jit(sweep).lower(
        key, (tha, thb), ((lpa, lla), (lpb, llb)),
        jnp.float32(0.5)).compile().as_text()
    ops = _collective_ops(txt)
    kinds = {k for k, _ in ops}
    assert "all-gather" not in kinds, ops
    assert "all-to-all" not in kinds, ops
    assert "all-reduce" not in kinds, ops
    shard_bytes = h // ndev * 4
    perms = [b for k, b in ops if k == "collective-permute"]
    assert perms and all(b == shard_bytes for b in perms), perms
    assert len(perms) == 12 * (ndev + 1) * 2, (len(perms), perms)
