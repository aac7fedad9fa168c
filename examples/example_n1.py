"""Usage guide — Normal(mu, sigma) inference walkthrough.

TPU-native counterpart of the reference's ``examples/example_n1.jl``.
The ingredients of Approximate Bayesian Computation:

1. a simulation depending on parameters, able to generate datasets
   similar to your target dataset when the parameters are right,
2. a prior distribution over the parameters,
3. a distance function comparing generated to observed data.

The only API difference from the Julia reference: stochastic simulators
receive an explicit PRNG ``key`` (no hidden global RNG — every run is
deterministic given the key, on any number of chips).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import kissabc_tpu as ka

# target dataset: Normal draws with unknown (mu, sigma) = (2, 0.04)
tdata = jax.random.normal(jax.random.key(0), (1000,)) * 0.04 + 2


def sim(theta, key):
    mu, sigma = theta
    return jax.random.normal(key, (1000,)) * sigma + mu


def dist(x, y):
    d1 = jnp.mean(x) - jnp.mean(y)
    d2 = jnp.std(x) - jnp.std(y)
    return jnp.hypot(d1, d2 * 50)


def cost(theta, key):
    return dist(tdata, sim(theta, key))


prior = ka.Factored(ka.Uniform(1, 3), ka.TruncatedNormal(0, 0.1, 0, 100))

if __name__ == "__main__":
    # Affine-invariant ensemble MCMC over the ABC density
    approx_density = ka.ApproxPosterior(prior, cost, 0.01)
    res = ka.sample(approx_density, ka.AIS(50), 500,
                    discard_initial=1000, ntransitions=10, key=1)
    print("AIS posterior:   ", res)

    # Sequential Monte Carlo: tighter CIs at lower simulator budget
    ressmc = ka.smc(prior, cost, nparticles=500, epstol=0.01, key=2)
    print("smc posterior:   ", ressmc.P, " eps =", round(ressmc.eps, 5))
