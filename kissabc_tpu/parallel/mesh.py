"""Device-mesh helpers.

The reference's only parallelism axes are the particle/walker ensemble and
independent chains (SURVEY §2b). Here those are literal mesh axes:

    mesh = make_mesh(walker=8)            # 1-D: shard the ensemble
    mesh = make_mesh(chain=2, walker=4)   # 2-D: chains x walkers

Population arrays are [nwalkers, ...] (or [nchains, nwalkers, ...]);
``constrainer(mesh, axes)`` returns a function that pins those leading
axes to the mesh so GSPMD partitions every kernel and inserts the
collectives (all_gather for cross-shard partner gathers, psum for
accept/ESS reductions — SURVEY §2b table) automatically. The same jitted
programs run unchanged single-chip when no mesh is given.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(**axes) -> Mesh:
    """make_mesh(chain=2, walker=4) over the first prod(sizes) devices."""
    names = tuple(axes.keys())
    sizes = tuple(int(v) for v in axes.values())
    n = int(np.prod(sizes))
    devs = jax.devices()
    if n > len(devs):
        raise ValueError(f"mesh needs {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]).reshape(sizes), names)


def roll_walkers(tree, shift, mesh: Mesh | None, axis: str = "walker"):
    """Global ``jnp.roll(x, shift, axis=0)`` on walker-sharded leaves via
    collective-permute instead of GSPMD's all-gather lowering.

    ``jnp.roll`` with a TRACED shift on an array sharded over ``axis``
    lowers to a full-population ``all-gather`` per leaf (GSPMD can't
    route a dynamic offset), so every rejuvenation sweep would move the
    whole ensemble to every chip — O(n) bytes/chip/sweep, growing the
    collective share linearly with device count. This helper decomposes
    the global roll under ``shard_map`` into

        r = (-shift) mod n;  q, t = divmod(r, shard)
        y_i = x_{(i+q) mod ndev}   -- ONE collective-permute, switch(q)
        z_i = y_{(i+1) mod ndev}   -- one static collective-permute
        out_i = concat(y_i, z_i)[t : t+shard]

    i.e. exactly TWO executed shard-sized collective-permutes per leaf
    (2·n/ndev·4 bytes/chip, constant in device count; the ``lax.switch``
    embeds ndev permute variants in the program but executes one). Ring
    neighbours ride ICI single-hop. Output is BIT-IDENTICAL to
    ``jnp.roll(x, shift, axis=0)`` for any shift sign/magnitude
    (tests/test_collectives.py), so sharded-vs-unsharded determinism is
    preserved.

    Falls back to plain ``jnp.roll`` when ``mesh`` is None, the axis is
    absent/trivial, or the walker count doesn't divide evenly.
    """
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    n = leaves[0].shape[0]
    ndev = dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis, 1) \
        if mesh is not None else 1
    if ndev <= 1 or n % ndev or any(l.shape[0] != n for l in leaves):
        rolled = [jnp.roll(x, shift, axis=0) for x in leaves]
        return jax.tree_util.tree_unflatten(treedef, rolled)
    s = n // ndev
    P_ = P

    def local(shift, *xs):
        r = jnp.mod(-jnp.asarray(shift, jnp.int32), n)
        q = r // s
        t = r - q * s

        def branch(k):
            perm = [((i + k) % ndev, i) for i in range(ndev)]
            return lambda vs: tuple(
                jax.lax.ppermute(v, axis, perm) for v in vs)

        ys = jax.lax.switch(q, [branch(k) for k in range(ndev)], xs)
        nxt = [((i + 1) % ndev, i) for i in range(ndev)]
        zs = tuple(jax.lax.ppermute(y, axis, nxt) for y in ys)
        return tuple(
            jax.lax.dynamic_slice_in_dim(
                jnp.concatenate([y, z], axis=0), t, s, axis=0)
            for y, z in zip(ys, zs))

    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P_(),) + (P_(axis),) * len(leaves),
        out_specs=(P_(axis),) * len(leaves))(shift, *leaves)
    return jax.tree_util.tree_unflatten(treedef, list(out))


def constrainer(mesh: Mesh | None, *axis_names: str):
    """Return constrain(tree): pins leaves' leading axes to mesh axes.

    With mesh=None it is the identity, so algorithm code can apply it
    unconditionally.
    """
    if mesh is None:
        return lambda tree: tree

    def constrain(tree):
        def pin(x):
            rank = getattr(x, "ndim", 0)
            spec = P(*axis_names[:rank])
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, spec))
        return jax.tree_util.tree_map(pin, tree)

    return constrain
