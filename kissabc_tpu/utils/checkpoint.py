"""Checkpoint / resume.

The reference has no checkpointing (SURVEY §5) — its entire algorithm
state is a tiny pytree (theta arrays, costs, log-priors, eps, key;
O(nparticles * d)). Since user simulators can be expensive, the TPU build
makes state trivially checkpointable: ``save``/``load`` round-trip any
jax/numpy pytree through a single ``.npz`` file, and ``smc_resumable``
runs adaptive SMC in host-stepped segments persisting after each one.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

_SEP = "\x1f"  # key-path separator inside the npz archive


def _is_key(leaf):
    try:
        return jnp.issubdtype(jnp.asarray(leaf).dtype, jax.dtypes.prng_key)
    except Exception:
        return False


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = _SEP.join(str(p) for p in path)
        if _is_key(leaf):  # typed PRNG keys serialize via their raw data
            out[key] = np.asarray(jax.random.key_data(leaf))
        else:
            out[key] = np.asarray(leaf)
    return out, treedef


def save(path: str, tree, meta: dict | None = None) -> None:
    """Persist a pytree of arrays (atomic rename; single file)."""
    arrays, _ = _flatten_with_paths(tree)
    payload = dict(arrays)
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def load(path: str, like):
    """Load a checkpoint into the structure of ``like`` (a template
    pytree with matching treedef). Returns (tree, meta)."""
    with np.load(path) as zf:
        meta = json.loads(bytes(zf["__meta__"]).decode() or "{}")
        arrays = {k: zf[k] for k in zf.files if k != "__meta__"}
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for pathk, leaf in flat:
        key = _SEP.join(str(p) for p in pathk)
        if key not in arrays:
            raise KeyError(
                f"checkpoint missing leaf {key!r} — the file layout does "
                "not match the current state structure (most likely the "
                "checkpoint was written by an older kissabc_tpu version "
                "whose loop state had different fields); delete the "
                "checkpoint and restart, or load it manually with "
                "numpy.load to migrate")
        if _is_key(leaf):
            leaves.append(jax.random.wrap_key_data(
                jnp.asarray(arrays[key])))
        else:
            leaves.append(jnp.asarray(arrays[key]))
    return jax.tree_util.tree_unflatten(treedef, leaves), meta
