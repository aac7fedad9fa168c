"""Resampling kernels.

Two schemes:

1. ``replicate_alive`` — the reference's *actual* behavior
   (``src/smc.jl:146-152``): deterministically replicate the alive indices
   cyclically until all n slots are filled. Reproduced exactly for parity.

2. ``systematic`` — proper systematic (low-variance) resampling via a
   prefix-sum of weights against a shifted uniform grid; this is the
   *documented intent* of the reference (its residual resampler at
   smc.jl:15-39 is dead code) and the scheme that extends to sharded
   ensembles with a single psum/scan (SURVEY §2 item 23, §5).

Both return an index vector [n] suitable for ``tree gather`` on a
struct-of-arrays ensemble — static shapes, no host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def replicate_alive(alive):
    """idx[j] = (alive indices, cyclically repeated)[j].

    Matches ``repeat(idxalive, ceil(n/len(idxalive)))[1:n]`` in the
    reference. ``alive`` must have at least one True.
    """
    n = alive.shape[0]
    # stable partition: order alive-first preserving index order
    order = jnp.argsort(~alive, stable=True)
    m = jnp.sum(alive)
    j = jnp.arange(n, dtype=jnp.int32)
    return order[j % m]


def systematic(key, weights):
    """Systematic resampling: one uniform offset, n strata.

    weights: [n] nonnegative (need not be normalized). Returns [n] int32
    ancestor indices. Deterministic given the key; stable under sharding
    because the prefix sum and grid are global quantities.
    """
    n = weights.shape[0]
    w = weights / jnp.sum(weights)
    cum = jnp.cumsum(w)
    u0 = jax.random.uniform(key, ())
    # idx[i] = #{j : cum[j] < (u0+i)/n} — classically
    # searchsorted(cum, pts, 'left'), but searchsorted lowers to a
    # log2(n)-iteration binary-search while loop of full-population
    # gathers (~116 us of latency EACH on TPU — the same wall that
    # dominated the ABCDE generation). Because the grid is arithmetic,
    # the crossing counts have a closed form: r_j = #pts in (0, cum_j]
    # = floor(n*cum_j - u0) + 1, and idx[i] = #{j : r_j <= i} is one
    # histogram scatter-add + cumsum. Equal weights still give the
    # exact identity permutation (r_j = j+1).
    r = jnp.clip(jnp.floor(n * cum - u0).astype(jnp.int32) + 1, 0, n)
    h = jnp.zeros((n + 1,), jnp.int32).at[r].add(1)
    idx = jnp.cumsum(h)[:n]
    return jnp.clip(idx, 0, n - 1).astype(jnp.int32)
