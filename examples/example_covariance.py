"""Covariance-matrix inference with matrix-variate priors.

Estimate the full covariance of correlated bivariate data with a
separation-strategy prior (Barnard-McCulloch-Meng): a correlation matrix
R ~ LKJ(2, eta=1) and per-axis scales s_i ~ LogUniform, combined inside
the cost as Sigma = diag(s) R diag(s). Matrix leaves flow through the
samplers like any other parameter: proposals evolve the d x d leaf
elementwise and `push` projects it back onto the correlation manifold
(symmetrize + unit diagonal), the matrix analogue of the reference's
round-to-int policy for discrete marginals
(reference ``src/types.jl:27-32``).

The cost compares simulated summary statistics (per-axis std and the
correlation coefficient) to the observed ones — no likelihood needed.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import kissabc_tpu as ka

TRUE_R = 0.6
TRUE_S = (1.5, 0.7)
NOBS = 2000


def simulate(key, R, s1, s2, n=NOBS):
    cl = jnp.linalg.cholesky(R)
    z = jax.random.normal(key, (n, 2)) @ cl.T
    return z * jnp.stack([s1, s2])


def summaries(x):
    sd = jnp.std(x, axis=0)
    r = jnp.mean(x[:, 0] * x[:, 1]) / (sd[0] * sd[1])
    return sd[0], sd[1], r


def main():
    true_cov = np.diag(TRUE_S) @ np.array(
        [[1.0, TRUE_R], [TRUE_R, 1.0]]) @ np.diag(TRUE_S)
    rng = np.random.default_rng(1)
    obs = rng.multivariate_normal([0.0, 0.0], true_cov, size=NOBS)
    obs_s1, obs_s2 = np.std(obs, axis=0)
    obs_r = np.corrcoef(obs.T)[0, 1]
    print(f"observed: s1={obs_s1:.3f} s2={obs_s2:.3f} r={obs_r:.3f}")

    prior = ka.Factored(ka.LKJ(2, 1.0),
                        ka.LogUniform(0.1, 10.0),
                        ka.LogUniform(0.1, 10.0))

    o1 = np.float32(obs_s1)
    o2 = np.float32(obs_s2)
    orr = np.float32(obs_r)

    def cost(theta, key):
        R, s1, s2 = theta
        s1h, s2h, rh = summaries(simulate(key, R, s1, s2))
        return (jnp.abs(s1h - o1) / o1 + jnp.abs(s2h - o2) / o2
                + jnp.abs(rh - orr))

    # no epstol: let the reference's own eps-stall stopping rule fire
    # (it does, at ~285 iterations / eps~0.017 — deeper than the old
    # epstol=0.05 target); max_iters stays as a pure safety backstop
    res = ka.smc(prior, cost, nparticles=256, max_iters=400, key=11)
    # P components row-major: [R00, R01, R10, R11, s1, s2]
    r_post, s1_post, s2_post = res.P[1], res.P[4], res.P[5]
    print(f"posterior: r = {r_post}, s1 = {s1_post}, s2 = {s2_post}, "
          f"eps = {float(res.eps):.4f}")
    assert abs(r_post.mean() - obs_r) < 0.1
    assert abs(s1_post.mean() - obs_s1) < 0.15
    assert abs(s2_post.mean() - obs_s2) < 0.1
    return res


if __name__ == "__main__":
    main()
