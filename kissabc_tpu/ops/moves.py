"""Batched ensemble proposal kernels.

The reference updates one walker at a time against the live ensemble with a
4:2:1 mixture of stretch / differential-evolution / walk moves
(``src/transition.jl``). Naively vmapping that breaks detailed balance
(SURVEY §7 'hard parts'), so the AIS kernels here use the standard
red/black (complementary half-ensemble) parallelization of Foreman-Mackey
et al. 2013: the half being updated draws its partners exclusively from the
*other* half, which keeps the move valid when applied to all walkers of the
half simultaneously. Statistical parity with the reference is at the level
of posterior moments, not trajectories.

All kernels are shape-static, vmapped over the walkers of one half, and
act on all-float struct-of-arrays pytrees (discrete marginals evolve in
float, types.jl:27-32).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .tree import sample_distinct, tmap, tree_map

_f32 = jnp.float32


def cdf_g_inv(u, a):
    """Inverse cdf of the stretch g-pdf, eq. 10 of Foreman-Mackey et al.
    2013 (reference transition.jl:46)."""
    sa = jnp.sqrt(a)
    return (u * (sa - 1.0 / sa) + 1.0 / sa) ** 2


def sample_g(key, a=3.0):
    return cdf_g_inv(jax.random.uniform(key, (), _f32), a)


def _noise_like(key, tree):
    """Standard-normal noise with the same pytree structure/shape as one
    particle (used by the DE move's elementwise jitter)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    noise = [jax.random.normal(k, jnp.shape(l), _f32)
             for k, l in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, noise)


# --------------------------------------------------------------------------
# Single-walker kernels (vmapped by `propose_half`)
# theta_i : pytree of one walker; comp: pytree with leading axis [Hc]
# --------------------------------------------------------------------------

def stretch_one(key, theta_i, comp, hc, d, a=3.0):
    """Goodman–Weare stretch move (transition.jl:51-59): partner from the
    complementary half, Z ~ g(a), proposal = comp[a] + Z*(theta_i-comp[a]),
    log-Jacobian (d-1) log Z."""
    kp, kz = jax.random.split(key)
    j = jax.random.randint(kp, (), 0, hc, dtype=jnp.int32)
    z = sample_g(kz, a)
    part = tree_map(lambda x: x[j], comp)
    prop = tmap(lambda pa, pi: pa + z * (pi - pa), part, theta_i)
    return prop, (d - 1) * jnp.log(z)


def de_one(key, theta_i, comp, hc, d):
    """ter Braak differential evolution (transition.jl:2-22):
    gamma = 2.38/sqrt(2d) * exp(0.1 N(0,1)), W = gamma*(theta_a - theta_b),
    plus elementwise triangle-scaled jitter gamma/300 * (|a-b|+|i-b|+|a-i|)
    * N(0,1); zero correction."""
    ka, kb, kg, kt = jax.random.split(key, 4)
    ia = jax.random.randint(ka, (), 0, hc, dtype=jnp.int32)
    ib = sample_distinct(kb, hc, (ia,))
    gamma = 2.38 / math.sqrt(2 * d) * jnp.exp(0.1 * jax.random.normal(kg, (), _f32))
    ta = tree_map(lambda x: x[ia], comp)
    tb = tree_map(lambda x: x[ib], comp)
    noise = _noise_like(kt, theta_i)
    def mk(xi, xa, xb, nz):
        tri = jnp.abs(xa - xb) + jnp.abs(xi - xb) + jnp.abs(xa - xi)
        return xi + gamma * (xa - xb) + gamma * tri / 300.0 * nz
    prop = tree_map(mk, theta_i, ta, tb, noise)
    return prop, jnp.asarray(0.0, _f32)


def walk_one(key, theta_i, comp, hc, d):
    """Goodman–Weare walk move over a 3-particle sub-ensemble
    (transition.jl:24-43): centroid of three partners, W = sum_k N(0,1)_k *
    (theta_k - centroid); zero correction."""
    ka, kb, kc, kr = jax.random.split(key, 4)
    ia = jax.random.randint(ka, (), 0, hc, dtype=jnp.int32)
    ib = sample_distinct(kb, hc, (ia,))
    ic = sample_distinct(kc, hc, (ia, ib))
    r = jax.random.normal(kr, (3,), _f32)
    ta = tree_map(lambda x: x[ia], comp)
    tb = tree_map(lambda x: x[ib], comp)
    tc = tree_map(lambda x: x[ic], comp)
    def mk(xi, xa, xb, xc):
        cen = (xa + xb + xc) / 3.0
        w = r[0] * (xa - cen) + r[1] * (xb - cen) + r[2] * (xc - cen)
        return xi + w
    prop = tree_map(mk, theta_i, ta, tb, tc)
    return prop, jnp.asarray(0.0, _f32)


def mixture_one(key, theta_i, comp, hc, d):
    """4:2:1 stretch/DE/walk mixture (transition.jl:61-65). All three
    proposals are computed and one is selected — on TPU the three kernels
    are a handful of fused VPU ops, far cheaper than divergent control
    flow, and the expensive part (the simulator call) runs once on the
    selected proposal."""
    km, k1, k2, k3 = jax.random.split(key, 4)
    # P(stretch)=4/7, P(de)=2/7, P(walk)=1/7  — rand over (1,1,1,1,2,2,3)
    mid = jax.random.randint(km, (), 0, 7, dtype=jnp.int32)
    p1, c1 = stretch_one(k1, theta_i, comp, hc, d)
    p2, c2 = de_one(k2, theta_i, comp, hc, d)
    p3, c3 = walk_one(k3, theta_i, comp, hc, d)
    is_s = mid < 4
    is_d = (mid >= 4) & (mid < 6)
    prop = tree_map(
        lambda a, b, c: jnp.where(is_s, a, jnp.where(is_d, b, c)), p1, p2, p3)
    corr = jnp.where(is_s, c1, jnp.where(is_d, c2, c3))
    return prop, corr


def propose_half(key, half, comp, d, kernel=None, scheme="auto",
                 mesh=None, accept_lu=False):
    """Propose for every walker of `half` (leaves [H, ...]) with partners
    from `comp` (leaves [Hc, ...]). Returns (props [H,...], corr [H]) —
    or, with ``accept_lu=True``, (props, corr, lu) where ``lu`` is a [H]
    log-uniform accept draw fused into the proposal's batched bits call
    when the fast path supports it, else ``None`` (caller draws its own).

    Default is the fully-batched mixture (one batched draw per random
    quantity instead of per-walker key splits — the splits alone dominate
    a sweep at large H). Pass one of the `*_one` kernels to vmap a
    single-walker kernel instead (used by the kernel unit tests).
    ``scheme`` selects rotation vs gather partner choice (see
    ``gaussian_diff_propose``); ``mesh`` routes the rotation scheme's
    partner rolls through shard-sized ppermutes (roll_walkers).
    """
    if kernel is None or kernel is mixture_one:
        return mixture_batched(key, half, comp, d, scheme=scheme,
                               mesh=mesh, accept_lu=accept_lu)
    h = jax.tree_util.tree_leaves(half)[0].shape[0]
    hc = jax.tree_util.tree_leaves(comp)[0].shape[0]
    keys = jax.random.split(key, h)
    def one(k, theta_i):
        return kernel(k, theta_i, comp, hc, d)
    props, corr = jax.vmap(one, in_axes=(0, 0))(keys, half)
    return (props, corr, None) if accept_lu else (props, corr)


def _bshape(w, x):
    """Broadcast a [h] scalar-per-walker against a [h, ...] leaf."""
    return w.reshape(w.shape + (1,) * (x.ndim - 1))


# --------------------------------------------------------------------------
# raw-bits -> variate maps (bit-compatible with the jax.random primitives,
# so deriving many streams from ONE jax.random.bits call keeps the same
# marginal laws as the separate uniform/normal/exponential calls they fuse)
# --------------------------------------------------------------------------

def _bits_to_uniform(bits):
    """uint32 -> U[0,1) via the mantissa-bitcast map jax.random.uniform
    uses for float32 (23-bit resolution)."""
    f = jax.lax.bitcast_convert_type(
        (bits >> np.uint32(9)) | np.uint32(0x3F800000), jnp.float32)
    return f - np.float32(1.0)


_ERFINV_LO = np.float32(np.nextafter(np.float32(-1.0), np.float32(0.0)))


def _bits_to_normal(bits):
    """uint32 -> N(0,1) via sqrt(2)*erfinv(U(-1,1)) — the same inverse-CDF
    construction as jax.random.normal (open interval at -1 like jax's
    nextafter(-1, 0) lower bound, so erfinv never sees -1)."""
    u01 = _bits_to_uniform(bits)
    u = u01 * (np.float32(1.0) - _ERFINV_LO) + _ERFINV_LO
    return np.float32(math.sqrt(2.0)) * jax.lax.erf_inv(u)


def _bits_to_log_uniform(bits):
    """uint32 -> log U (the MH accept draw, == -Exponential): log1p(-u)
    like -jax.random.exponential; bounded in [log(2^-24), 0]."""
    return jnp.log1p(-_bits_to_uniform(bits))


def _partners(keys, comp, h, hc, k, scheme):
    """k mutually-distinct partner trees for h walkers from comp.

    scheme="roll": k distinct random rotations — partner j for walker i
    is comp[(i + r_j) % hc]; contiguous access / ppermute on a mesh.
    scheme="gather": per-walker random distinct indices (reference law).
    """
    def draw_distinct(shape):
        """k mutually-distinct uniform draws over [0, hc): draw the j-th
        from [0, hc-j) and bump past the previous draws in ascending
        order (the sorted-exclude arithmetic of sample_distinct)."""
        if shape == ():
            # roll scheme: ONE threefry call for all k scalar shifts —
            # k separate randint+split ops were pure per-op scheduling
            # overhead around the sweep kernels (profiled r4: batching
            # the scalar draws took the fused AIS row 121.6->136.9M
            # updates/s); modulo draws match randint's bias class
            v = jax.random.bits(keys[0], (k,), jnp.uint32)
            raw = [(v[j] % np.uint32(hc - j)).astype(jnp.int32)
                   for j in range(k)]
        else:
            raw = [jax.random.randint(keys[j], shape, 0, hc - j,
                                      dtype=jnp.int32)
                   for j in range(k)]
        draws = []
        for j in range(k):
            u = raw[j]
            if draws:
                ex = jnp.sort(jnp.stack(draws, axis=0), axis=0)
                for i in range(len(draws)):
                    u = u + (u >= ex[i])
            draws.append(u)
        return draws

    if scheme == "roll" and h <= hc:
        return [
            tree_map(lambda x: jnp.roll(x, -r, axis=0)[:h], comp)
            for r in draw_distinct(())
        ]
    if scheme == "roll":  # odd-split edge: wrap positions explicitly
        pos = np.arange(h, dtype=np.int32)
        return [
            tree_map(lambda x: x[(pos + r) % hc], comp)
            for r in draw_distinct(())
        ]
    return [tree_map(lambda x: x[i], comp) for i in draw_distinct((h,))]


def _distinct_shifts(v, hc, ks):
    """Mutually-distinct rotation shifts from raw uint32 words: for each
    group size k in ``ks``, consume k words and produce k distinct
    uniform draws over [0, hc) via the draw-from-[0,hc-j)-and-bump
    arithmetic of ``sample_distinct`` (same law/bias class as the
    per-move draws in ``_partners``). Returns a flat list of scalars."""
    out = []
    i = 0
    for k in ks:
        draws = []
        for j in range(k):
            u = (v[i] % np.uint32(hc - j)).astype(jnp.int32)
            i += 1
            if draws:
                ex = jnp.sort(jnp.stack(draws), axis=0)
                for t in range(len(draws)):
                    u = u + (u >= ex[t])
            draws.append(u)
        out.extend(draws)
    return out


def _mixture_batched_rollfused(key, half, comp, d, a_stretch, mesh,
                               accept_lu, h):
    """The rotation-scheme mixture with ALL randomness from two bits
    calls: one (6,) call for the partner shifts (stretch 1 + DE 2 +
    walk 3, distinct within each move) and one (R, h) call for every
    per-walker quantity — move id, stretch z, DE gamma, DE jitter noise
    (one row per parameter component), the three walk weights, and
    (optionally) the MH accept log-uniform. The r4 profiles showed each
    scalar randint/split around a sweep kernel costs ~1 us of per-op
    scheduling overhead (~1M updates/s of headline at n=131072); the
    per-walker draws fuse for the same reason (VERDICT r4 next #6:
    measured +2.6% on the split AIS row). Vector/matrix leaves get one
    row per trailing component ((cols, h) -> transpose -> [h, ...]).
    Requires h == hc (the red/black halves case); ``mesh`` routes the 6
    partner rolls through shard-sized ppermutes (roll_walkers) so the
    sweep stays O(shard) bytes/chip."""
    leaves, treedef = jax.tree_util.tree_flatten(half)
    cols = [int(np.prod(l.shape[1:], dtype=np.int64)) for l in leaves]
    C = sum(cols)
    kshift, kvec = jax.random.split(key)
    shifts = _distinct_shifts(jax.random.bits(kshift, (6,), jnp.uint32),
                              h, (1, 2, 3))

    R = 6 + C + (1 if accept_lu else 0)
    w = jax.random.bits(kvec, (R, h), jnp.uint32)
    mid = (w[0] % np.uint32(7)).astype(jnp.int32)
    is_s = mid < 4
    is_d = (mid >= 4) & (mid < 6)
    z = cdf_g_inv(_bits_to_uniform(w[1]), a_stretch)
    gamma = 2.38 / math.sqrt(2 * d) * jnp.exp(
        0.1 * _bits_to_normal(w[2]))
    nleaves, off = [], 0
    for l, c in zip(leaves, cols):
        rows = _bits_to_normal(w[3 + off:3 + off + c])  # (c, h)
        nleaves.append(rows[0] if l.ndim == 1 else
                       jnp.moveaxis(rows.reshape(l.shape[1:] + (h,)),
                                    -1, 0))
        off += c
    noise = jax.tree_util.tree_unflatten(treedef, nleaves)
    r = _bits_to_normal(w[3 + C:6 + C])  # (3, h) walk weights
    lu = _bits_to_log_uniform(w[6 + C]) if accept_lu else None

    def partner(shift):
        """comp[(i + shift) % h] — a rotation; ppermutes on a mesh."""
        if mesh is not None:
            from ..parallel.mesh import roll_walkers
            return roll_walkers(comp, -shift, mesh)
        return tree_map(lambda x: jnp.roll(x, -shift, axis=0), comp)

    s1, d1, d2, w1, w2, w3 = shifts
    part = partner(s1)
    p_s = tree_map(
        lambda pa, pi: pa + _bshape(z, pa) * (pi - pa), part, half)
    c_s = (d - 1) * jnp.log(z)

    ta, tb = partner(d1), partner(d2)
    def mk_de(xi, xa, xb, nz):
        g = _bshape(gamma, xi)
        tri = jnp.abs(xa - xb) + jnp.abs(xi - xb) + jnp.abs(xa - xi)
        return xi + g * (xa - xb) + g * tri / 300.0 * nz
    p_d = tree_map(mk_de, half, ta, tb, noise)

    twa, twb, twc = partner(w1), partner(w2), partner(w3)
    def mk_walk(xi, xa, xb, xc):
        cen = (xa + xb + xc) / 3.0
        return xi + (_bshape(r[0], xi) * (xa - cen)
                     + _bshape(r[1], xi) * (xb - cen)
                     + _bshape(r[2], xi) * (xc - cen))
    p_w = tree_map(mk_walk, half, twa, twb, twc)

    prop = tree_map(
        lambda a, b, c: jnp.where(_bshape(is_s, a), a,
                                  jnp.where(_bshape(is_d, a), b, c)),
        p_s, p_d, p_w)
    corr = jnp.where(is_s, c_s, 0.0)
    return prop, corr, lu


def mixture_batched(key, half, comp, d, a_stretch=3.0, scheme="auto",
                    mesh=None, accept_lu=False):
    """Fully-batched 4:2:1 stretch/DE/walk mixture over one half-ensemble.

    Statistically identical to vmapping ``mixture_one`` (different RNG
    stream): every random quantity is ONE batched draw over the h
    walkers. All three move proposals are computed and selected per
    walker — a handful of fused VPU ops; the expensive simulator runs
    once on the selection. ``scheme="roll"`` draws partners via distinct
    random rotations of the complementary half (uniform marginally,
    state-independent — the Goodman-Weare/ter Braak validity arguments
    only need partner choice independent of the updated walker's state).

    With ``accept_lu=True`` returns (prop, corr, lu): on the fused
    rotation path ``lu`` is a [h] log-uniform accept draw folded into
    the same bits call; elsewhere ``lu`` is None (caller draws its own).
    """
    leaves = jax.tree_util.tree_leaves(half)
    h = leaves[0].shape[0]
    hc = jax.tree_util.tree_leaves(comp)[0].shape[0]
    scheme = _resolve_scheme(scheme, h + hc)
    if scheme == "roll" and h == hc:
        # the production red/black fast path: equal halves -> two bits
        # calls total (see _mixture_batched_rollfused). Unequal halves
        # (odd n) keep the generic draws below (and gather stays
        # byte-stable with r4 streams).
        out = _mixture_batched_rollfused(
            key, half, comp, d, a_stretch, mesh, accept_lu, h)
        return out if accept_lu else out[:2]
    (km, ksj, ksz, kda, kdb, kdg, kdt, kwa, kwb, kwc, kwr) = \
        jax.random.split(key, 11)

    mid = jax.random.randint(km, (h,), 0, 7, dtype=jnp.int32)
    is_s = mid < 4
    is_d = (mid >= 4) & (mid < 6)

    # --- stretch (transition.jl:51-59) --------------------------------
    (part,) = _partners((ksj,), comp, h, hc, 1, scheme)
    z = cdf_g_inv(jax.random.uniform(ksz, (h,), _f32), a_stretch)
    p_s = tree_map(
        lambda pa, pi: pa + _bshape(z, pa) * (pi - pa), part, half)
    c_s = (d - 1) * jnp.log(z)

    # --- DE (transition.jl:2-22) --------------------------------------
    ta, tb = _partners((kda, kdb), comp, h, hc, 2, scheme)
    gamma = 2.38 / math.sqrt(2 * d) * jnp.exp(
        0.1 * jax.random.normal(kdg, (h,), _f32))
    noise = _noise_like(kdt, half)  # elementwise jitter, [h, ...] leaves
    def mk_de(xi, xa, xb, nz):
        g = _bshape(gamma, xi)
        tri = jnp.abs(xa - xb) + jnp.abs(xi - xb) + jnp.abs(xa - xi)
        return xi + g * (xa - xb) + g * tri / 300.0 * nz
    p_d = tree_map(mk_de, half, ta, tb, noise)

    # --- walk (transition.jl:24-43) -----------------------------------
    twa, twb, twc = _partners((kwa, kwb, kwc), comp, h, hc, 3, scheme)
    # (3, h), not (h, 3): a [h,3] f32 tiles as T(4,128) with 125/128
    # lanes padded — profiled at ~35 us/sweep of pure layout waste; the
    # row-major (3, h) draw is dense and each row is a contiguous [h]
    r = jax.random.normal(kwr, (3, h), _f32)
    def mk_walk(xi, xa, xb, xc):
        cen = (xa + xb + xc) / 3.0
        w = (_bshape(r[0], xi) * (xa - cen)
             + _bshape(r[1], xi) * (xb - cen)
             + _bshape(r[2], xi) * (xc - cen))
        return xi + w
    p_w = tree_map(mk_walk, half, twa, twb, twc)

    # --- select -------------------------------------------------------
    prop = tree_map(
        lambda a, b, c: jnp.where(_bshape(is_s, a), a,
                                  jnp.where(_bshape(is_d, a), b, c)),
        p_s, p_d, p_w)
    corr = jnp.where(is_s, c_s, 0.0)
    return (prop, corr, None) if accept_lu else (prop, corr)


# --------------------------------------------------------------------------
# SMC sweep move — full-ensemble snapshot semantics
# --------------------------------------------------------------------------

AUTO_ROLL_MIN = 16384  # below this, per-walker gathers are cheap and the
# reference-exact partner law wins (shared rotations measurably slow
# mixing for small ensembles); above it, gathers dominate the sweep


def _resolve_scheme(scheme, n):
    if scheme == "auto":
        return "roll" if n >= AUTO_ROLL_MIN else "gather"
    if scheme not in ("roll", "gather"):
        raise ValueError(
            f"partner scheme must be 'auto', 'roll' or 'gather', "
            f"got {scheme!r}")
    return scheme


def gaussian_diff_propose(key, ens, d, max_stretch=2.0, scheme="auto",
                          mesh=None):
    """The smc rejuvenation move (smc.jl:160-167): for every particle i,
    two distinct partners a,b != i from the *snapshot* ensemble and
    W = (theta_b - theta_a) * max_stretch * N(0,1) / sqrt(d); correction 0.
    (The smc docstring calls it a stretch move; the code is this
    Gaussian-scaled difference move — SURVEY §3.3.)

    All proposals read the same snapshot, so the whole sweep is one
    batched kernel — and all randomness comes from THREE batched draws
    (no per-walker key splitting).

    Partner selection ``scheme``:

    - ``"roll"`` (default, TPU-native): partners via two random ensemble
      ROTATIONS — partner pair for walker i is ((i+r1)%n, (i+r2)%n) with
      r1 != r2 drawn once per sweep. Marginally each walker's partners
      are uniform over the other walkers and distinct, the proposal is
      symmetric given the snapshot (the difference is snapshot-fixed and
      the Gaussian scale is sign-symmetric), so MH validity is unchanged;
      only the cross-walker correlation structure differs from the
      reference (same statistical-parity level as red/black AIS).
      Contiguous rotations stream at HBM bandwidth and become ppermute
      collectives on a sharded mesh; random-index gathers measured ~2.2x
      slower end-to-end.
    - ``"gather"``: per-walker random distinct partners, exactly the
      reference's selection law.

    ``mesh``: when the ensemble is sharded over a mesh ``walker`` axis,
    pass the mesh so the two rotations run as shard-sized
    collective-permutes (``parallel.mesh.roll_walkers``) instead of
    GSPMD's full-population all-gather lowering of dynamic ``jnp.roll``
    — bit-identical output, O(n/ndev) bytes/chip instead of O(n).
    """
    n = jax.tree_util.tree_leaves(ens)[0].shape[0]
    if n < 3:
        # two distinct partners != i cannot exist for n < 3; without
        # this the roll path hits a silent uint32 modulo-by-zero at
        # n == 2 and the gather path clamps out-of-range indices
        raise ValueError(
            f"gaussian_diff_propose needs an ensemble of >= 3 walkers "
            f"(two distinct partners per walker), got n={n}")
    # NOTE: "auto" resolves from n alone, NEVER from the mesh — the
    # sharded-vs-unsharded bitwise determinism contract (test_parallel)
    # requires identical partner laws across layouts. Small sharded
    # ensembles therefore keep the gather law (its all-gather is cheap
    # at small n); large ones get roll + the ppermute path below. Pass
    # scheme="roll" explicitly to force ppermutes at any size.
    scheme = _resolve_scheme(scheme, n)
    ka, kb, kw = jax.random.split(key, 3)
    w = max_stretch * jax.random.normal(kw, (n,), _f32) / math.sqrt(d)
    if scheme == "roll":
        # one threefry call for both shifts (see _partners note)
        v = jax.random.bits(ka, (2,), jnp.uint32)
        r1 = (v[0] % np.uint32(n - 1)).astype(jnp.int32) + 1
        r2 = (v[1] % np.uint32(n - 2)).astype(jnp.int32) + 1
        r2 = r2 + (r2 >= r1)
        if mesh is not None:
            from ..parallel.mesh import roll_walkers
            ra = roll_walkers(ens, r1, mesh)
            rb = roll_walkers(ens, r2, mesh)
            return tree_map(
                lambda x, xa, xb: x + (xb - xa)
                * w.reshape((n,) + (1,) * (x.ndim - 1)),
                ens, ra, rb)
        return tree_map(
            lambda x: x + (jnp.roll(x, r2, axis=0) - jnp.roll(x, r1, axis=0))
            * w.reshape((n,) + (1,) * (x.ndim - 1)),
            ens)
    i = np.arange(n, dtype=np.int32)
    a = jax.random.randint(ka, (n,), 0, n - 1, dtype=jnp.int32)
    a = a + (a >= i)
    b = jax.random.randint(kb, (n,), 0, n - 2, dtype=jnp.int32)
    lo = jnp.minimum(a, i)
    hi = jnp.maximum(a, i)
    b = b + (b >= lo)
    b = b + (b >= hi)
    ta = tree_map(lambda x: x[a], ens)
    tb = tree_map(lambda x: x[b], ens)
    return tree_map(
        lambda xi, xa, xb: xi + (xb - xa)
        * w.reshape((n,) + (1,) * (xi.ndim - 1)),
        ens, ta, tb)


def masked_index(key, mask, order=None):
    """Uniform random index among the True entries of `mask` (static
    shapes)."""
    if order is None:
        order = jnp.argsort(~mask, stable=True)
    m = jnp.sum(mask)
    u = jax.random.randint(key, (), 0, jnp.maximum(m, 1), dtype=jnp.int32)
    return order[u]


def masked_distinct(key, mask, k, order=None):
    """k distinct uniform indices among True entries of `mask` (requires
    sum(mask) >= k). Positions are drawn distinct in [0, m) and mapped
    through the alive-first stable ordering. Used (vmapped, with a
    precomputed `order`) by pfilter's good-set partner draws
    (smc.jl:309-311)."""
    if order is None:
        order = jnp.argsort(~mask, stable=True)
    m = jnp.sum(mask)
    keys = jax.random.split(key, k)
    pos = []
    for j in range(k):
        pos.append(sample_distinct(keys[j], m, tuple(pos)) if pos
                   else jax.random.randint(keys[j], (), 0, jnp.maximum(m, 1),
                                           dtype=jnp.int32))
    return tuple(order[p] for p in pos)
