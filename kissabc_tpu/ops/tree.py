"""Pytree particle algebra.

The reference wraps one parameter pack in ``Particle`` and routes every
arithmetic operation through the recursive ``op`` combinator
(reference ``src/types.jl:10-25``), which is exactly a pytree ``tree_map``.
Here a particle *is* a pytree whose leaves are arrays:

- ``Factored`` priors -> tuple of scalar leaves (mixed dtype),
- vector priors (MvNormal / Product) -> one ``[d]`` leaf,
- a plain univariate prior -> one ``[]`` leaf.

Ensembles are struct-of-arrays: the same pytree with a leading walker axis
on every leaf — the layout XLA/TPU wants (contiguous per-parameter lanes),
instead of the reference's array-of-structs ``Vector{Particle}``.

Discrete marginals are *evolved in float* and only snapped to int when the
prior/cost is evaluated — the ``push_p`` policy of ``src/types.jl:27-32`` —
so all proposal arithmetic below is float-only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

tree_map = jax.tree_util.tree_map


def tmap(f, *trees):
    """Elementwise map through the particle pytree (the reference's ``op``,
    types.jl:15-25)."""
    return tree_map(f, *trees)


def tadd(a, b):
    return tree_map(jnp.add, a, b)


def tsub(a, b):
    return tree_map(jnp.subtract, a, b)


def tscale(a, s):
    """Multiply every leaf by a scalar (broadcasts over leading axes)."""
    return tree_map(lambda x: x * s, a)


def taxpy(a, x, y):
    """a*x + y over the tree with scalar a."""
    return tree_map(lambda xi, yi: a * xi + yi, x, y)


def tfloat(a):
    """Float shadow of a particle: the reference's ``op(float, ...)`` init
    (KissABC.jl:50, smc.jl:119)."""
    return tree_map(lambda x: jnp.asarray(x, jnp.float32)
                    if not jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                    else jnp.asarray(x), a)


def tgather(tree, idx):
    """Index every leaf's leading (walker) axis by ``idx``.

    1-D leaves sharing a length and dtype are PACKED into one ``[n, K]``
    row gather: a random-index gather on TPU pays a per-element latency
    wall regardless of row width (~0.7 ms per 1M-element gather), so K
    separate gathers cost the wall K times while one packed row gather
    pays it once (measured 2.84 -> 1.56 ms for K=4 at n=1M; the same
    finding that took the ABCDE generation 4.8x — see core/abcde.py).
    Value-identical to the naive per-leaf ``x[idx]``."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    groups = {}
    for i, x in enumerate(leaves):
        if getattr(x, "ndim", None) == 1:
            groups.setdefault((x.dtype, x.shape[0]), []).append(i)
    out = [None] * len(leaves)
    packed_ids = set()
    for ids in groups.values():
        if len(ids) < 2:
            continue
        packed = jnp.stack([leaves[i] for i in ids], axis=1)[idx]
        for k, i in enumerate(ids):
            out[i] = packed[:, k]
        packed_ids.update(ids)
    for i, x in enumerate(leaves):
        if i not in packed_ids:
            out[i] = x[idx]
    return treedef.unflatten(out)


def tselect(mask, a, b):
    """Per-walker select: ``mask`` has shape [n]; leaves have shape [n, ...]."""
    def sel(x, y):
        m = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim))
        return jnp.where(m, x, y)
    return tree_map(sel, a, b)


def tzeros_like(a):
    return tree_map(jnp.zeros_like, a)


def leading_dim(tree):
    return jax.tree_util.tree_leaves(tree)[0].shape[0]


def sample_distinct(key, n, exclude):
    """Draw one index uniformly from {0..n-1} minus ``exclude``.

    ``exclude`` is a sequence of k mutually-distinct traced int scalars.
    Standard rejection-free construction: draw u in [0, n-k), then bump u
    past each excluded value in ascending order. Replaces the reference's
    ``while a in (i,)`` rejection loops (transition.jl:4-10,26-34,52-55)
    with branch-free arithmetic suitable for vmap/XLA.
    """
    k = len(exclude)
    ex = jnp.sort(jnp.stack([jnp.asarray(e, jnp.int32) for e in exclude]))
    u = jax.random.randint(key, (), 0, n - k, dtype=jnp.int32)
    for j in range(k):
        u = u + (u >= ex[j]).astype(jnp.int32)
    return u
