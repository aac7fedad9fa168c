"""Adaptive tempered SMC: conjugate-normal ground truth for posterior
moments AND the marginal-likelihood (evidence) estimate."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as st

import kissabc_tpu as ka

Y = np.array([1.2, 0.8, 1.5, 0.9, 1.1, 1.3, 0.7, 1.0], dtype=np.float32)
K = len(Y)


def _loglike(theta):
    return -0.5 * jnp.sum((Y - theta) ** 2) - K / 2 * np.log(2 * np.pi)


def _truth():
    post_mean = Y.sum() / (K + 1)
    post_sd = 1.0 / np.sqrt(K + 1)
    cov = np.eye(K) + np.ones((K, K))
    logz = st.multivariate_normal(np.zeros(K), cov).logpdf(Y)
    return post_mean, post_sd, logz


def test_tsmc_conjugate_normal():
    res = ka.tsmc(ka.Normal(0, 1), _loglike, nparticles=4000,
                  mcmc_steps=5, key=1)
    m, sd, logz = _truth()
    assert res.lam == 1.0
    assert abs(res.P.mean() - m) < 0.02
    assert abs(res.P.std() - sd) < 0.02
    assert abs(res.log_evidence - logz) < 0.15, (res.log_evidence, logz)


def test_tsmc_factored_prior_2d():
    """2-D conjugate: independent normals."""
    def ll(theta):
        a, b = theta
        return (-0.5 * jnp.sum((Y - a) ** 2)
                - 0.5 * jnp.sum((Y[:4] - b) ** 2))

    prior = ka.Factored(ka.Normal(0, 1), ka.Normal(0, 1))
    res = ka.tsmc(prior, ll, nparticles=4000, mcmc_steps=5, key=2)
    a_post, b_post = res.P
    assert abs(a_post.mean() - Y.sum() / (K + 1)) < 0.03
    assert abs(b_post.mean() - Y[:4].sum() / 5) < 0.03


def test_tsmc_vectorized_loglike():
    """loglike_vectorized evaluates the whole batch at once (the hook
    for batched/Pallas likelihood kernels) and matches the closed-form
    conjugate posterior + evidence like the scalar path."""
    def ll_vec(thetas, key):
        # thetas: scalar-parameter batch [b]; Y broadcast over it
        return (-0.5 * jnp.sum((Y[None, :] - thetas[:, None]) ** 2, axis=1)
                - K / 2 * np.log(2 * np.pi))

    res = ka.tsmc(ka.Normal(0, 1), ll_vec, nparticles=4000, mcmc_steps=5,
                  loglike_vectorized=True, key=3)
    m, sd, logz = _truth()
    assert res.lam == 1.0
    assert abs(res.P.mean() - m) < 0.02
    assert abs(res.P.std() - sd) < 0.02
    assert abs(res.log_evidence - logz) < 0.15


def test_tsmc_validation():
    import pytest
    with pytest.raises(ValueError):
        ka.tsmc(ka.Normal(0, 1), _loglike, alpha=1.5)
