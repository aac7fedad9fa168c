"""ABCDE + pfilter end-to-end tests."""

import jax
import jax.numpy as jnp
import numpy as np

import kissabc_tpu as ka


def _mixture_cost(x, key):
    """The classical 0.1N+N mixture simulator (runtests.jl:144-146)."""
    k1, k2, k3 = jax.random.split(key, 3)
    sim = x + jnp.where(jax.random.bernoulli(k1),
                        jax.random.normal(k2) * 0.1,
                        jax.random.normal(k3))
    return jnp.abs(sim)


def test_abcde_dirac():
    pri = ka.Normal(1, 0.2)
    cost = lambda x: jnp.abs(x * x + 1 - 1.5)
    res = ka.ABCDE(pri, cost, 0.01, nparticles=100, generations=500,
                   verbose=False, key=1)
    assert res.reached_eps
    assert res.P.approx(np.sqrt(0.5), atol=0.02)
    assert res.nsim > 0


def test_abcde_earlystop():
    pri = ka.Normal(1, 0.2)
    cost = lambda x: jnp.abs(x * x + 1 - 1.5)
    res = ka.ABCDE(pri, cost, 0.05, nparticles=60, generations=2000,
                   earlystop=True, verbose=False, key=2)
    assert res.reached_eps
    assert res.iterations < 2000


def test_abcde_mixture_annealing():
    """alpha-annealed population threshold on the mixture model."""
    pri = ka.Uniform(-10, 10)
    res = ka.ABCDE(pri, _mixture_cost, 0.05, nparticles=150,
                   generations=400, alpha=0.3, verbose=False, key=3)
    assert res.P.approx(0.0, atol=0.2)


def test_pfilter_basic():
    pri = ka.Uniform(-10, 10)
    res = ka.pfilter(pri, _mixture_cost, 400, verbose=False, key=4)
    assert res.P.approx(0.0, atol=0.2)
    assert res.eps < 1.0


def test_pfilter_n_floor():
    """N*q <= 4d forces N = ceil((4d+1)/q) (smc.jl:276-279)."""
    pri = ka.Normal(0, 1)
    cost = lambda x: jnp.abs(x)
    res = ka.pfilter(pri, cost, 5, q=0.7, max_iters=3, verbose=False, key=5)
    # floored to ceil(5/0.7) = 8 particles minimum
    assert len(res.C.particles) >= 8


def test_pfilter_epstol_stop():
    pri = ka.Normal(0, 1)
    cost = lambda x: jnp.abs(x)
    res = ka.pfilter(pri, cost, 100, epstol=0.5, eff_tol=0.0,
                     max_iters=50, verbose=False, key=6)
    assert res.eps < 0.5 or res.iterations >= 50
