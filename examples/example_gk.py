"""g-and-k quantile-distribution inference — the classic hard ABC
benchmark (BASELINE config 4): the g-and-k distribution has no closed
density, but trivial simulation via its quantile function

    Q(z) = a + b * (1 + 0.8 * tanh(g*z/2)) * (1 + z^2)^k * z,  z ~ N(0,1)

so likelihood-free inference on (a, b, g, k) from octile summary
statistics is the canonical use-case.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import kissabc_tpu as ka

TRUE = (3.0, 1.0, 2.0, 0.5)
NDRAWS = 1000
OCTILES = jnp.asarray([0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875])


def gk_quantile(z, a, b, g, k):
    return a + b * (1 + 0.8 * jnp.tanh(g * z / 2)) * (1 + z * z) ** k * z


def gk_sample(key, theta, n=NDRAWS):
    a, b, g, k = theta
    z = jax.random.normal(key, (n,))
    return gk_quantile(z, a, b, g, k)


def summaries(x):
    return jnp.quantile(x, OCTILES)


DATA_SUMM = summaries(gk_sample(jax.random.key(0), TRUE, 10_000))


def cost(theta, key):
    s = summaries(gk_sample(key, theta))
    return jnp.sqrt(jnp.mean(jnp.square(s - DATA_SUMM)))


prior = ka.Factored(ka.Uniform(0, 10), ka.Uniform(0, 4),
                    ka.Uniform(0, 10), ka.Uniform(0, 4))

if __name__ == "__main__":
    res = ka.smc(prior, cost, nparticles=4096, alpha=0.95, epstol=0.05,
                 key=1)
    names = "abgk"
    for name, p in zip(names, res.P):
        print(f"  {name}: {p}   (true {TRUE[names.index(name)]})")
    print("eps:", round(res.eps, 4), " iterations:", res.iterations)
