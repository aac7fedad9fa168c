"""Exponential-mixture benchmark — the reference's commented-out heavy
benchmark (reference ``test/runtests.jl:256-274``): infer (u1, p1) of a
two-scale exponential mixture from std+median summary statistics computed
on n = 10^6 simulated draws per cost call.

With the expected posterior concentrated at u1 ~ 0.49, p1 ~ 0.88
(the reference's recorded early-stop CI: u1 in [0.490, 0.495],
p1 in [0.880, 0.883]).

This is the heavy-simulator stress case: each cost call is 10^6
exponential + uniform draws and a median (device-wide sort). Walkers are
evaluated batched, so a 100-walker AIS sweep simulates 10^8 draws per
half-sweep — all on-device.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import kissabc_tpu as ka

NDRAWS = 10**6


def cost(theta, key, n=NDRAWS):
    u1, p1 = theta
    ka_, kb_ = jax.random.split(key)
    u2 = (1.0 - u1 * p1) / (1.0 - p1)
    a = jax.random.exponential(ka_, (n,))
    b = jax.random.uniform(kb_, (n,))
    x = a * jnp.where(b < p1, u1, u2)
    # Julia std is corrected (ddof=1)
    sd = jnp.std(x, ddof=1)
    med = jnp.median(x)
    return jnp.sqrt(((sd - 2.2) / 2.2) ** 2 + ((med - 0.4) / 0.4) ** 2)


prior = ka.Factored(ka.Uniform(0, 1), ka.Uniform(0.5, 1))

if __name__ == "__main__":
    import sys
    n = int(sys.argv[1]) if len(sys.argv) > 1 else NDRAWS
    c = lambda th, k: cost(th, k, n)
    plan = ka.ApproxPosterior(prior, c, 0.01)
    res = ka.sample(plan, ka.AIS(100), 100, discard_initial=2000, key=1)
    u1p, p1p = res
    print("u1:", u1p, "  (reference CI [0.490, 0.495])")
    print("p1:", p1p, "  (reference CI [0.880, 0.883])")
