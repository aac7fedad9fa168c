"""Adaptive tempered SMC with evidence estimation (beyond the reference).

Classical Bayesian inference on a conjugate-normal model where posterior
AND marginal likelihood (evidence) have closed forms — tsmc recovers
both, with the temperature ladder chosen adaptively.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as st

import kissabc_tpu as ka

Y = np.array([1.2, 0.8, 1.5, 0.9, 1.1, 1.3, 0.7, 1.0], dtype=np.float32)
K = len(Y)


def loglike(theta):
    return -0.5 * jnp.sum((Y - theta) ** 2) - K / 2 * np.log(2 * np.pi)


if __name__ == "__main__":
    res = ka.tsmc(ka.Normal(0, 1), loglike, nparticles=4000, mcmc_steps=5)
    post_mean = Y.sum() / (K + 1)
    post_sd = 1 / np.sqrt(K + 1)
    logz = st.multivariate_normal(
        np.zeros(K), np.eye(K) + np.ones((K, K))).logpdf(Y)
    print(f"posterior:    {res.P}   (analytic {post_mean:.4f} ± {post_sd:.4f})")
    print(f"log-evidence: {res.log_evidence:.3f}   (analytic {logz:.3f})")
    print(f"temperatures: {res.iterations} adaptive steps, final ESS {res.ess:.0f}")

    # Fused tempered rejuvenation: the same likelihood as elementwise
    # in-kernel math (data as host constants), one Pallas kernel per
    # red/black half-update, temperature as a runtime scalar.
    c = np.float32(K / 2 * np.log(2 * np.pi))

    def loglike_elem(theta):
        s = 0.0
        for y in Y:
            s = s + jnp.square(np.float32(y) - theta)
        return -0.5 * s - c

    on_tpu = jax.devices()[0].platform == "tpu"
    kw = {} if on_tpu else dict(block=128, walker_tiles=2,
                                bits="stub", interpret=True)
    sweep = ka.make_fused_tempered_sweep(ka.Normal(0, 1), loglike_elem,
                                         **kw)
    resf = ka.tsmc(ka.Normal(0, 1), loglike, nparticles=4000,
                   mcmc_steps=5, sweep_fused=sweep)
    print(f"fused:        {resf.P}   log-evidence {resf.log_evidence:.3f}")
