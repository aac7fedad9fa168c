"""End-to-end ABC workflow: pilot-data prior via fit_mle, smc inference,
convergence diagnostics, posterior predictive check.

Demonstrates the Distributions.jl function surface the reference
re-exports (``/root/reference/src/KissABC.jl:13-14``) working together
with the samplers: ``fit_mle`` builds a prior from pilot data,
``mean/std/insupport/support`` interrogate it, ``smc`` infers, and
``ess``/``rhat`` + a ``pmap_apply`` posterior predictive close the loop.
The model is the README Normal(mu, sigma) problem (reference
``README.md:30-67``).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import kissabc_tpu as ka


def main():
    # --- observed data (unknown truth mu=2, sigma=0.04) ---------------
    key = jax.random.key(0)
    tdata = jax.random.normal(key, (1000,)) * 0.04 + 2.0

    # --- prior from pilot data (fit_mle, Distributions.jl idiom) ------
    # a small noisy pilot run suggests mu is near 2 with spread ~0.5
    pilot = np.asarray(
        jax.random.normal(jax.random.key(9), (64,)) * 0.5 + 2.1)
    mu_prior = ka.fit_mle(ka.Normal, pilot)
    print("pilot prior for mu:", mu_prior,
          "| mean:", round(ka.mean(mu_prior), 3),
          "std:", round(ka.std(mu_prior), 3))
    prior = ka.Factored(mu_prior, ka.LogUniform(1e-3, 1.0))
    assert bool(np.all(ka.insupport(prior, (jnp.float32(2.0),
                                            jnp.float32(0.04)))))

    # --- ABC ingredients ----------------------------------------------
    def cost(theta, k):
        mu, sigma = theta
        x = jax.random.normal(k, (1000,)) * sigma + mu
        return jnp.hypot(jnp.mean(x) - jnp.mean(tdata),
                         (jnp.std(x) - jnp.std(tdata)) * 50.0)

    # --- inference -----------------------------------------------------
    res = ka.smc(prior, cost, nparticles=512, epstol=0.012, key=42)
    mu_post, sg_post = res.P
    print("posterior:", mu_post, sg_post, "| eps:", round(res.eps, 4))

    # --- convergence diagnostics on an AIS cross-check ------------------
    abc = ka.ApproxPosterior(prior, cost, 0.02)
    chains = 4
    ais = ka.sample(abc, ka.AIS(64), 512, ntransitions=4, chains=chains,
                    key=7)
    mu_chainwise = np.asarray(ais[0].particles).reshape(chains, -1)
    print("AIS mu:", ais[0],
          "| ess:", round(ka.ess(mu_chainwise), 1),
          "rhat:", round(ka.rhat(mu_chainwise), 4))
    assert ka.rhat(mu_chainwise) < 1.2

    # --- posterior predictive check -------------------------------------
    def predictive_mean(mus, sigmas):
        keys = jax.random.split(jax.random.key(3), mus.shape[0])
        sims = jax.vmap(lambda m, s, k: jnp.mean(
            jax.random.normal(k, (1000,)) * s + m))(mus, sigmas, keys)
        return sims

    pp = ka.pmap_apply(predictive_mean, mu_post, sg_post)
    print("posterior predictive mean:", pp,
          "| data mean:", round(float(jnp.mean(tdata)), 4))
    assert pp.approx(float(jnp.mean(tdata)), atol=0.01)
    return res


if __name__ == "__main__":
    main()
