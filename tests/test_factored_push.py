"""Factored prior + push_p dtype policy — mirrors the reference's
'Factored' and 'Push' testsets (runtests.jl:8-31)."""

import jax
import jax.numpy as jnp
import numpy as np

import kissabc_tpu as ka

KEY = jax.random.key(7)


def test_factored_basic():
    d = ka.Factored(ka.Uniform(0, 1), ka.Uniform(100, 101))
    s = d.sample_tree(KEY)
    assert 0 <= float(s[0]) <= 1 and 100 <= float(s[1]) <= 101
    assert float(d.pdf((0.0, 0.0))) == 0.0
    assert np.isclose(float(d.pdf((0.5, 100.5))), 1.0)
    assert np.isclose(float(d.logpdf((0.5, 100.5))), 0.0)
    assert float(d.logpdf((0.0, 0.0))) == -np.inf
    assert d.nparams == 2 and len(d) == 2


def test_factored_mixed_support():
    m = ka.Factored(ka.Uniform(0.0, 1.0), ka.DiscreteUniform(1, 2))
    s = m.sample_tree(KEY)
    assert 0 < float(s[0]) < 1
    assert int(s[1]) in (1, 2)
    assert np.isclose(float(m.pdf(s)), 0.5)
    assert np.isclose(float(m.logpdf(s)), np.log(0.5))


def test_push_policy():
    # push_p(Normal(), 1) == 1.0 ; push_p(DiscreteUniform(), 1.0) == 1
    p = ka.Normal(0, 1).push(jnp.asarray(1, jnp.int32))
    assert p.dtype == jnp.float32 and float(p) == 1.0
    p = ka.DiscreteUniform(0, 1).push(jnp.asarray(1.0))
    assert p.dtype == jnp.int32 and int(p) == 1
    # Factored mixed: (2, 1.0) -> (2.0, 1)
    m = ka.Factored(ka.Normal(0, 1), ka.DiscreteUniform(0, 1))
    a, b = m.push_tree((jnp.asarray(2, jnp.int32), jnp.asarray(1.0)))
    assert a.dtype == jnp.float32 and b.dtype == jnp.int32
    # Product continuous: [2, 1] -> [2.0, 1.0]
    pr = ka.Product([ka.Normal(0, 1), ka.Normal(0, 1)])
    v = pr.push(jnp.asarray([2, 1], jnp.int32))
    assert v.dtype == jnp.float32


def test_push_rounds_half_even():
    """Julia round(Int, .) rounds half-to-even; jnp.round matches."""
    d = ka.DiscreteUniform(0, 10)
    vals = d.push(jnp.asarray([0.5, 1.5, 2.5, 3.49]))
    np.testing.assert_array_equal(np.asarray(vals), [0, 2, 2, 3])


def test_factored_vmapped_sampling():
    m = ka.Factored(ka.Normal(0, 1), ka.DiscreteUniform(1, 10))
    keys = jax.random.split(KEY, 1000)
    samples = jax.vmap(m.sample_tree)(keys)
    assert samples[0].shape == (1000,)
    assert samples[1].shape == (1000,)
    lp = jax.vmap(m.logpdf_tree)(samples)
    assert np.all(np.isfinite(np.asarray(lp)))
