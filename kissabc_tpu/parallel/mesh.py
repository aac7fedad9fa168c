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
