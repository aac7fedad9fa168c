"""Device→host materialization that works in multi-process runs.

In a ``jax.distributed`` run, result arrays sharded over a global mesh
span devices of several processes; ``np.asarray`` on them raises. This
helper gathers such arrays to every process (the populations are tiny —
O(nparticles·d) — so a full allgather is the right call, matching the
reference's single-address-space result semantics)."""

from __future__ import annotations

import jax
import numpy as np


def fetch(x):
    """np.asarray that transparently allgathers non-addressable arrays."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def fetch_tree(tree):
    return jax.tree_util.tree_map(fetch, tree)
