"""Counter-based RNG plumbing.

The reference (KissABC.jl) threads a single mutable ``AbstractRNG`` through
every algorithm and tolerates a benign data race under threading
(``src/smc.jl:163-166`` shares the user rng across the threaded sweep). The
TPU-native design replaces that with JAX threefry keys split per
(iteration, particle, stage): deterministic, race-free by construction, and
identical across sharding layouts because every per-particle key is derived
by folding in the *global* particle index.
"""

from __future__ import annotations

import jax


def as_key(seed_or_key):
    """Accept either an int seed or a PRNG key and return a PRNG key.
    Must be called OUTSIDE jit (a traced int cannot be distinguished from
    key data)."""
    import numpy as np
    if isinstance(seed_or_key, (int, np.integer)):
        return jax.random.key(int(seed_or_key))
    return seed_or_key


def fold(key, *data):
    """Fold one or more integers into a key (stage/iteration/particle ids)."""
    for d in data:
        key = jax.random.fold_in(key, d)
    return key


def split_tree(key, n):
    return jax.random.split(key, n)


def randexp(key, shape=()):
    """Standard-exponential draw; ``-randexp() <= lW`` accept draws in the
    reference (types.jl:74,103,127) become ``log(U) <= lW`` with
    ``log(U) = -randexp``."""
    return jax.random.exponential(key, shape)


def log_uniform(key, shape=()):
    """log(U(0,1)) — the MH accept threshold draw (== -randexp)."""
    return -jax.random.exponential(key, shape)
