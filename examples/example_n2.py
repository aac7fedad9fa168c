"""A Gaussian mixture model — 5-parameter inference.

TPU-native counterpart of the reference's ``examples/example_n2.jl``:
infer (mu1, mu2, sigma1, sigma2, prob) of a two-component mixture from
quantile summary statistics.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import kissabc_tpu as ka

N = 200
QUANTS = jnp.asarray([0.1, 0.2, 0.45, 0.55, 0.8, 0.9])


def model(P, key, n=N):
    mu1, mu2, sg1, sg2, prob = P
    k1, k2 = jax.random.split(key)
    r1 = jax.random.normal(k1, (n,))
    r2 = jax.random.uniform(k2, (n,))
    d1 = r1 * sg1 + mu1
    d2 = r1 * sg2 + mu2
    ps = (1 + jnp.sign(r2 - prob)) / 2
    return d1 + ps * (d2 - d1)


def S(x):
    return jnp.quantile(x, QUANTS)


parameters = (1.0, 0.0, 0.2, 2.0, 0.4)
data = model(parameters, jax.random.key(0))
summ_data = S(data)


def cost(P, key):
    return jnp.sqrt(jnp.mean(jnp.square(summ_data - S(model(P, key)))))


prior = ka.Factored(
    ka.Uniform(0, 2),    # a peak between 0 and 2
    ka.Uniform(-1, 1),   # a smeared distribution centered around 0
    ka.Uniform(0, 1),    # peak width below 1
    ka.Uniform(0, 4),    # smeared width below 4
    ka.Beta(2, 2),       # favor balanced mixture slightly
)

if __name__ == "__main__":
    approx_density = ka.ApproxPosterior(prior, cost, 0.032)
    res = ka.sample(approx_density, ka.AIS(100), 100,
                    discard_initial=4000, ntransitions=10, key=1)
    print("AIS posterior:", res)

    # SMC: tighter CIs, lower simulator budget
    res = ka.smc(prior, cost, nparticles=1000, alpha=0.95, key=2)
    print("smc posterior:", res.P)
