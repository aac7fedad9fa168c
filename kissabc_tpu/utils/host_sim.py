"""Host-simulator escape hatch.

The engine's fast path requires jittable (JAX-traceable) cost functions.
Some real simulators are external black boxes (C/Fortran codes, ODE
packages, subprocess models). ``host_cost`` wraps such a function into a
jittable *vectorized* cost via ``jax.pure_callback``: the whole pushed
population batch is shipped to the host once per sweep, evaluated with
numpy, and the cost vector returns to the device.

This is the documented fallback of SURVEY §7 ("user simulators:
jittable-by-default with pure_callback escape hatch") — it loses fusion
and pays one device<->host round trip per sweep (NOT per particle:
vectorization amortizes the transfer), so use it only when the simulator
cannot be expressed in JAX.

Usage::

    def my_sim(thetas, seeds):          # numpy in, numpy out
        mu, sigma = thetas              # each np.ndarray [n]
        out = np.empty(len(mu))
        for i in range(len(mu)):
            out[i] = external_code(mu[i], sigma[i], seed=int(seeds[i]))
        return out

    cost = host_cost(my_sim)
    res = smc(prior, cost, cost_vectorized=True)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def host_cost(fn, dtype=jnp.float32):
    """Wrap ``fn(thetas_numpy_tree, seeds_numpy[n]) -> costs_numpy[n]``
    into a batched cost ``(thetas_tree, key) -> costs[n]`` usable with
    ``cost_vectorized=True`` in smc/ABCDE/pfilter and the density models.

    The PRNG key becomes a per-particle uint32 seed array so the host
    simulator stays reproducible. The wrapper receives the whole batch
    already, so it must be installed with ``cost_vectorized=True`` — a
    per-walker (vmapped) call raises a descriptive error.
    """

    def batched(thetas, key):
        lead = jax.tree_util.tree_leaves(thetas)[0]
        if lead.ndim == 0:
            raise ValueError(
                "host_cost produces a BATCHED cost: pass it with "
                "cost_vectorized=True (smc/ABCDE/pfilter) or "
                "cost_vectorized=True on the density model — it cannot "
                "be vmapped per-walker.")
        n = lead.shape[0]
        seeds = jax.random.bits(key, (n,), jnp.uint32)
        result_shape = jax.ShapeDtypeStruct((n,), dtype)

        def callback(thetas_np, seeds_np):
            out = fn(thetas_np, seeds_np)
            return np.asarray(out, dtype.dtype
                              if hasattr(dtype, "dtype") else dtype)

        return jax.pure_callback(callback, result_shape, thetas, seeds)

    return batched
