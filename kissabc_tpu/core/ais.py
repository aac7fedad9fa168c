"""Affine-Invariant ensemble Sampler (AIS) + the ``sample`` driver.

Reference: the ``AIS`` sampler and AbstractMCMC ``step`` overloads
(``src/KissABC.jl:21-80``) driving ``transition!``
(``src/transition.jl:67-82``).

TPU-native redesign (SURVEY §7):

- The ensemble is a struct-of-arrays float pytree sharded on the walker
  axis; one *sweep* updates the red half against the black half and then
  vice versa — the standard parallelization of the Goodman–Weare moves —
  instead of the reference's one-walker-at-a-time round robin
  (KissABC.jl:74-79). Each half-update is a single fused vmapped kernel:
  mixture proposal + push + loglike (user simulator) + MH accept.

- Emission semantics: the reference records 1 sample per step, visiting
  walkers round-robin with ``ntransitions`` moves in between; over N
  emissions every walker receives ``ntransitions`` moves. Here one
  *block* = ``ntransitions`` full sweeps followed by emitting all N
  walkers — the identical simulator-call budget and recorded-sample count
  for the same (Ns, ntransitions, discard_initial) arguments.

- Init draws the whole ensemble at once and re-draws invalid (non-finite
  density) walkers in bounded masked retry rounds (KissABC.jl:50-61); the
  reference's hard error surfaces as a host-side RuntimeError.

- Multi-chain (the reference's MCMCThreads/MCMCDistributed, KissABC.jl:9)
  is a ``chains=`` kwarg: an extra vmapped chain axis, shardable over the
  mesh; results are stacked like ``chainsstack`` (KissABC.jl:96-104).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.moves import mixture_one, propose_half
from ..ops.tree import tselect, tree_map
from ..particles import particles_from_tree
from ..utils.hostfetch import fetch_tree
from ..utils.rng import as_key

_f32 = jnp.float32


class AIS:
    """Ensemble sampler configuration: ``AIS(nparticles)``
    (KissABC.jl:21-23)."""

    def __init__(self, nparticles: int):
        self.nparticles = int(nparticles)

    def __repr__(self):
        return f"AIS({self.nparticles})"


# --------------------------------------------------------------------------
# ensemble init with bounded invalid-retry (KissABC.jl:50-61)
# --------------------------------------------------------------------------

def _init_ensemble(model, key, n, retry_sampling):
    def draw_all(k):
        kd, kl = jax.random.split(k)
        th = jax.vmap(model.init_sample)(jax.random.split(kd, n))
        # loglike_batch so vectorized/Pallas simulators work at init too
        ld = model.loglike_batch(jax.vmap(model.push)(th), kl)
        return th, ld

    key, k0 = jax.random.split(key)
    thetas, lds = draw_all(k0)
    valid0 = jax.vmap(model.ld_valid)(lds)

    def cond(c):
        t, _, _, valid, _ = c
        return (t < retry_sampling) & ~jnp.all(valid)

    def body(c):
        t, th, ld, valid, k = c
        k, sub = jax.random.split(k)
        nth, nld = draw_all(sub)
        th = tselect(valid, th, nth)
        ld = tselect(valid, ld, nld)
        valid = jax.vmap(model.ld_valid)(ld)
        return t + 1, th, ld, valid, k

    _, thetas, lds, valid, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), thetas, lds, valid0, key))
    return thetas, lds, valid


# --------------------------------------------------------------------------
# red/black sweep
# --------------------------------------------------------------------------

def _half_update(model, key, upd, upd_lds, comp, kernel, scheme,
                 mesh=None):
    """MH-update the walkers of one red/black half (``upd``, leaves [H])
    with partners drawn from the other half (``comp``)."""
    d = model.nparams
    kp, kl, ka = jax.random.split(key, 3)
    props, corr, lu = propose_half(kp, upd, comp, d, kernel=kernel,
                                   scheme=scheme, mesh=mesh,
                                   accept_lu=True)
    pushed = jax.vmap(model.push)(props)
    new_lds = model.loglike_batch(pushed, kl)
    if lu is None:
        acc = model.accept_batch(ka, upd_lds, new_lds, corr)
    else:  # fused rotation path: lu rode the proposal's bits call
        acc = jax.vmap(model.accept_lu)(lu, upd_lds, new_lds, corr)
    # the reference stores the raw float proposal, pushing only at
    # loglike/emission time (transition.jl:77)
    upd = tselect(acc, props, upd)
    upd_lds = tselect(acc, new_lds, upd_lds)
    return upd, upd_lds


def _halves(tree, h):
    return (tree_map(lambda x: x[:h], tree),
            tree_map(lambda x: x[h:], tree))


def _unhalves(pair):
    return tree_map(lambda a, b: jnp.concatenate([a, b]), *pair)


def make_sweep_halves(model, n, kernel=mixture_one,
                      constrain=lambda t: t, partner_scheme="auto",
                      mesh=None):
    """One full red/black sweep with the ensemble carried as TWO explicit
    half trees ``((th_a, th_b), (ld_a, ld_b))`` instead of sliced views
    of one [n] array (VERDICT r4 next #2). This removes the per-half
    dynamic-update-slice/concat data movement (~60 us/sweep single-chip
    at n=131072) and, on a walker mesh, makes each half SHARD-LOCAL: the
    only cross-chip traffic is the partner rotations, which lower to
    shard-sized ppermutes via roll_walkers (``mesh=``) — the same
    O(shard)-bytes/chip collective structure as the smc sweep
    (tests/test_collectives.py) instead of the O(ensemble) resharding
    the slice-into-halves layout paid.

    ``constrain`` pins each half to the mesh walker axis (identity on a
    single chip). ``partner_scheme``: 'roll' (rotation partners,
    TPU-native default at large n) or 'gather' (the reference's
    per-walker random partners) — see ops/moves.py."""

    def sweep(key, th, ld):
        tha, thb = th
        lda, ldb = ld
        ka_, kb = jax.random.split(key)
        tha, lda = _half_update(model, ka_, tha, lda, thb, kernel,
                                partner_scheme, mesh)
        thb, ldb = _half_update(model, kb, thb, ldb, tha, kernel,
                                partner_scheme, mesh)
        return ((constrain(tha), constrain(thb)),
                (constrain(lda), constrain(ldb)))

    return sweep


def make_sweep(model, n, kernel=mixture_one, constrain=lambda t: t,
               partner_scheme="auto", mesh=None):
    """One full red/black sweep over a single [n]-leading ensemble;
    jit/vmap/scan-safe. Back-compat wrapper over ``make_sweep_halves``
    (same RNG stream and, for the gather scheme, bitwise-identical
    output to the r4 sliced layout): splits into halves, sweeps, and
    concatenates. Callers that iterate sweeps should carry the halves
    directly via ``make_sweep_halves`` to skip the per-sweep
    split/concat."""
    h = n // 2
    sweep2 = make_sweep_halves(model, n, kernel, constrain,
                               partner_scheme, mesh)

    def sweep(key, thetas, lds):
        th, ld = sweep2(key, _halves(thetas, h), _halves(lds, h))
        return constrain(_unhalves(th)), constrain(_unhalves(ld))

    return sweep


def _sequential_transition(model, key, thetas, lds, i):
    """EXACT reference semantics (transition.jl:67-82): one MH move of
    walker ``i`` against the CURRENT ensemble (partners exclude i, drawn
    from the live population — the 4:2:1 mixture via the single-walker
    kernels). Used by the ``schedule='sequential'`` mode."""
    from ..ops.moves import mixture_one
    from ..ops.tree import tree_map as tm

    n = jax.tree_util.tree_leaves(thetas)[0].shape[0]
    d = model.nparams
    kp, kl, ka = jax.random.split(key, 3)
    theta_i = tm(lambda x: x[i], thetas)
    old_ld = tm(lambda x: x[i], lds)
    # complement = ensemble with walker i swapped to the last slot, then
    # the first n-1 slots (static shapes; preserves the uniform-over-
    # others partner law)
    idx = jnp.arange(n, dtype=jnp.int32)
    idx = jnp.where(idx == i, n - 1, idx)
    idx = jnp.where(jnp.arange(n) == n - 1, i, idx)
    comp = tm(lambda x: x[idx][: n - 1], thetas)
    prop, corr = mixture_one(kp, theta_i, comp, n - 1, d)
    new_ld = model.loglike(model.push(prop), kl)
    acc = model.accept(ka, old_ld, new_ld, corr)
    thetas = tm(lambda full, p: full.at[i].set(
        jnp.where(acc, p, full[i])), thetas, prop)
    lds = tm(lambda full, p: full.at[i].set(
        jnp.where(acc, p, full[i])), lds, new_ld)
    return thetas, lds


def make_sequential_run(model, sampler: AIS, ns: int, *,
                        ntransitions: int = 1, discard_initial: int = 0,
                        retry_sampling: int = 100, thinning: int = 1):
    """The reference's literal sampling loop (KissABC.jl:66-80): one
    recorded sample per step, walker cursor round-robin, ``ntransitions``
    single-walker moves between records, partners from the LIVE ensemble.
    Exact trajectory semantics (modulo RNG stream); serial per step, so
    use for small ensembles / parity studies — the red/black batched mode
    is the TPU-fast path."""
    n = sampler.nparticles
    if n < model.nparams + 5:
        raise ValueError(
            f"nparticles = {n} is insufficient, set number of particles in "
            f"AIS(.) at least to {model.nparams + 5}")
    if thinning < 1:
        raise ValueError("thinning must be >= 1")
    total = discard_initial + ns * thinning

    def run(key):
        kinit, kloop = jax.random.split(key)
        thetas, lds, valid = _init_ensemble(model, kinit, n, retry_sampling)

        def step(carry, k):
            thetas, lds, i = carry

            def one(c, kk):
                th, ld = c
                th, ld = _sequential_transition(model, kk, th, ld, i)
                return (th, ld), None

            (thetas, lds), _ = jax.lax.scan(
                one, (thetas, lds), jax.random.split(k, ntransitions))
            emit = model.push(
                jax.tree_util.tree_map(lambda x: x[i], thetas))
            return (thetas, lds, (i + 1) % n), emit

        (_, _, _), emits = jax.lax.scan(
            step, (thetas, lds, jnp.int32(0)),
            jax.random.split(kloop, total))
        # AbstractMCMC `thinning`: after the discard, keep the LAST step
        # of each group of `thinning`
        flat = jax.tree_util.tree_map(
            lambda x: x[discard_initial + thinning - 1::thinning], emits)
        return flat, valid

    return run


# --------------------------------------------------------------------------
# the sample driver (the reference's re-exported `sample`, KissABC.jl:106-175)
# --------------------------------------------------------------------------

def make_run(model, sampler: AIS, ns: int, *, ntransitions: int = 1,
             discard_initial: int = 0, retry_sampling: int = 100,
             kernel=mixture_one, mesh=None, partner_scheme="auto",
             progress: bool = False, thinning: int = 1):
    """Build the jittable end-to-end AIS program ``run(key) -> (samples
    [blocks*n, ...], valid [n])``. Shared by the single-chain driver, the
    vmapped multi-chain driver, and the benchmarks."""
    n = sampler.nparticles
    if n < model.nparams + 5:
        raise ValueError(
            f"nparticles = {n} is insufficient, set number of particles in "
            f"AIS(.) at least to {model.nparams + 5}")
    from ..parallel.mesh import constrainer
    # partner rolls as shard-sized ppermutes only on a pure walker mesh:
    # under the vmapped-chain driver (spmd_axis_name='chain') the
    # shard_map inside roll_walkers cannot compose with the batched
    # chain axis, so 2-D chain x walker meshes keep the plain jnp.roll
    # lowering (GSPMD all-gather of the half — the r4 behavior)
    roll_mesh = (mesh if mesh is not None
                 and "chain" not in mesh.axis_names else None)
    sweep = make_sweep_halves(model, n, kernel,
                              constrain=constrainer(mesh, "walker"),
                              partner_scheme=partner_scheme,
                              mesh=roll_mesh)
    h = n // 2

    if thinning < 1:
        raise ValueError("thinning must be >= 1")
    burn_sweeps = max(0, math.ceil(discard_initial * ntransitions / n))
    blocks = max(1, math.ceil(ns / n))
    # AbstractMCMC's `thinning` kwarg (save every t-th step): in block
    # semantics that is t * ntransitions sweeps per emitted block
    sweeps_per_block = ntransitions * thinning

    def run(key):
        kinit, kburn, krun = jax.random.split(key, 3)
        thetas, lds, valid = _init_ensemble(model, kinit, n, retry_sampling)
        # the whole sampling loop carries the red/black halves as two
        # separate shard-local trees; they rejoin only at emission
        th, ld = _halves(thetas, h), _halves(lds, h)

        def do_sweep(carry, k):
            th, ld = carry
            th, ld = sweep(k, th, ld)
            return (th, ld), None

        if burn_sweeps > 0:
            (th, ld), _ = jax.lax.scan(
                do_sweep, (th, ld), jax.random.split(kburn, burn_sweeps))

        def block(carry, kb):
            th, ld, bi = carry
            (th, ld), _ = jax.lax.scan(
                do_sweep, (th, ld), jax.random.split(kb, sweeps_per_block))
            emit = jax.vmap(model.push)(_unhalves(th))
            if progress:
                jax.debug.print(
                    "AIS block {b}/{nb} ({sw} sweeps each)",
                    b=bi + 1, nb=blocks, sw=sweeps_per_block)
            return (th, ld, bi + 1), emit

        (th, ld, _), emits = jax.lax.scan(
            block, (th, ld, jnp.int32(0)),
            jax.random.split(krun, blocks))
        # [blocks, n, ...] -> [blocks*n, ...]
        flat = tree_map(
            lambda x: x.reshape((blocks * n,) + x.shape[2:]), emits)
        return flat, valid

    return run


def sample_raw(model, sampler: AIS, ns: int, *, ntransitions: int = 1,
               discard_initial: int = 0, retry_sampling: int = 100,
               key=0, kernel=mixture_one, mesh=None, progress: bool = False,
               partner_scheme="auto", schedule: str = "red_black",
               thinning: int = 1):
    """Run AIS and return (pushed sample pytree with leading axis [ns],
    valid_mask) — the array-level API under ``sample``.

    ``schedule='sequential'`` switches to the reference's literal
    one-walker round-robin loop (exact trajectory semantics, serial —
    for parity studies/small ensembles)."""
    if schedule == "sequential":
        # the serial round-robin loop has no partner batching, no
        # custom kernel hook, and nothing to shard — reject knobs that
        # would otherwise be silently ignored
        ignored = ([] if partner_scheme == "auto" else ["partner_scheme"])
        ignored += [] if kernel is mixture_one else ["kernel"]
        ignored += [] if mesh is None else ["mesh"]
        ignored += [] if not progress else ["progress"]
        if ignored:
            raise ValueError(
                f"schedule='sequential' does not support {ignored}; "
                "drop them or use the default red_black schedule")
        run = make_sequential_run(
            model, sampler, ns, ntransitions=ntransitions,
            discard_initial=discard_initial, retry_sampling=retry_sampling,
            thinning=thinning)
    elif schedule == "red_black":
        run = make_run(model, sampler, ns, ntransitions=ntransitions,
                       discard_initial=discard_initial,
                       retry_sampling=retry_sampling, kernel=kernel,
                       mesh=mesh, partner_scheme=partner_scheme,
                       progress=progress, thinning=thinning)
    else:
        raise ValueError(
            f"schedule must be 'red_black' or 'sequential', got {schedule!r}")
    flat, valid = jax.jit(run)(as_key(key))
    if not bool(jnp.all(valid)):
        raise RuntimeError(
            "Prior leads to infinite costs too often, tune the prior or "
            "increase `retry_sampling`.")
    flat = fetch_tree(flat)
    return tree_map(lambda x: x[:ns], flat), valid


class MCMCThreads:
    """Positional multi-chain marker — drop-in for the reference's
    re-exported ``MCMCThreads`` (KissABC.jl:175): ``sample(model,
    AIS(N), MCMCThreads(), ns, nchains)`` ports verbatim and routes to
    the ``chains=nchains`` vmapped-chain path."""


class MCMCDistributed:
    """Positional multi-chain marker — drop-in for the reference's
    ``MCMCDistributed`` (KissABC.jl:175). Chains are vmapped like
    MCMCThreads; add ``mesh=make_mesh(chain=...)`` to actually place
    them on separate devices (see docs/migration.md)."""


def sample(model, sampler: AIS, ns, *args, ntransitions: int = 1,
           discard_initial: int = 0, retry_sampling: int = 100,
           chains: int | None = None, key=0, progress: bool = False,
           kernel=mixture_one, mesh=None, partner_scheme="auto",
           schedule: str = "red_black", thinning: int = 1):
    """KissABC-style entry point: returns per-dimension ``Particles``
    (unwrapped when one-dimensional), like bundle_samples
    (KissABC.jl:82-94). ``chains=Nc`` concatenates Nc independent chains
    (the MCMCThreads path, KissABC.jl:96-104); the reference's literal
    positional form ``sample(model, AIS(N), MCMCThreads(), ns, Nc)``
    (or ``MCMCDistributed()``) is also accepted. With a 2-D mesh
    ``make_mesh(chain=..., walker=...)`` the chain axis shards via the
    vmapped dimension and the walker axis via in-run sharding
    constraints. ``progress=True`` prints per-block progress from inside
    the compiled loop (the reference's AbstractMCMC progress knob).
    ``thinning=t`` keeps every t-th step (AbstractMCMC's thinning kwarg,
    available on the reference's re-exported sample): t * ntransitions
    sweeps per emitted block in red/black mode, the last of every t
    recorded steps in sequential mode."""
    if isinstance(ns, (MCMCThreads, MCMCDistributed)) or (
            isinstance(ns, type)
            and issubclass(ns, (MCMCThreads, MCMCDistributed))):
        # reference positional form: sample(model, sampler, marker,
        # ns, nchains)
        if len(args) != 2:
            raise TypeError(
                "sample(model, sampler, MCMCThreads(), ns, nchains) "
                f"needs ns and nchains, got {len(args)} extra args")
        if chains is not None:
            raise TypeError(
                "pass nchains positionally after MCMCThreads() OR as "
                "chains=, not both")
        ns, chains = args
    elif args:
        raise TypeError(
            f"sample() got unexpected positional arguments {args}; did "
            "you mean sample(model, sampler, MCMCThreads(), ns, "
            "nchains)?")
    ns = int(ns)
    if chains is None:
        flat, _ = sample_raw(
            model, sampler, ns, ntransitions=ntransitions,
            discard_initial=discard_initial, retry_sampling=retry_sampling,
            key=key, kernel=kernel, mesh=mesh, progress=progress,
            partner_scheme=partner_scheme, schedule=schedule,
            thinning=thinning)
        return particles_from_tree(flat)
    if schedule != "red_black":
        raise ValueError(
            "schedule='sequential' is single-chain only; drop chains= or "
            "use the default red_black schedule")

    # multi-chain: a vmapped chain axis (the MCMCThreads analogue,
    # KissABC.jl:9), shardable over a mesh `chain` axis.
    key = as_key(key)
    chain_keys = jax.random.split(key, chains)
    chain_mesh = mesh is not None and "chain" in mesh.axis_names
    walker_mesh = mesh is not None and "walker" in mesh.axis_names
    run = make_run(model, sampler, ns, ntransitions=ntransitions,
                   discard_initial=discard_initial,
                   retry_sampling=retry_sampling, kernel=kernel,
                   mesh=mesh if walker_mesh else None,
                   partner_scheme=partner_scheme, thinning=thinning)
    # spmd_axis_name lets the in-run walker constraints compose with the
    # vmapped chain axis being sharded over the mesh 'chain' axis
    vrun = jax.vmap(run, spmd_axis_name="chain") if chain_mesh \
        else jax.vmap(run)
    if chain_mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P
        chain_keys = jax.device_put(
            chain_keys, NamedSharding(mesh, P("chain")))
    flat, valid = jax.jit(vrun)(chain_keys)
    if not bool(jnp.all(valid)):
        raise RuntimeError(
            "Prior leads to infinite costs too often, tune the prior or "
            "increase `retry_sampling`.")
    # [C, blocks*n, ...]: truncate each chain to ns then chainsstack-concat
    flat = fetch_tree(flat)
    flat = tree_map(
        lambda x: x[:, :ns].reshape((chains * ns,) + x.shape[2:]), flat)
    return particles_from_tree(flat)
