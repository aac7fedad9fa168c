"""End-to-end AIS inference tests — the reference's dominant test style
(seeded statistical known-answer problems, runtests.jl:33-254)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kissabc_tpu as ka


def test_dirac_delta_kernelized():
    """Normal dist -> Dirac delta (runtests.jl:77-86): infer mu with
    sim(mu)=mu^2+1 ~= 1.5 -> mu ~= sqrt(0.5)."""
    pri = ka.Normal(1, 0.2)
    cost = lambda x: jnp.abs((x * x + 1) - 1.5)
    abc = ka.ApproxKernelizedPosterior(pri, cost, 0.001)
    res = ka.sample(abc, ka.AIS(12), 500, discard_initial=1000, key=3)
    sim_res = res.map(lambda m: m * m + 1)
    assert sim_res.approx(1.5)
    assert abs(res.mean() - np.sqrt(0.5)) < 0.01


def test_dirac_delta_multichain():
    """MCMCThreads equivalent: chains kwarg (runtests.jl:88-104)."""
    pri = ka.Normal(1, 0.2)
    cost = lambda x: jnp.abs((x * x + 1) - 1.5)
    abc = ka.ApproxKernelizedPosterior(pri, cost, 0.001)
    res = ka.sample(abc, ka.AIS(12), 100, chains=8,
                    discard_initial=600, key=11)
    assert len(res) == 8 * 100
    assert res.map(lambda m: m * m + 1).approx(1.5)


def test_hard_threshold_issue10():
    """ApproxPosterior on truncated normal tail (runtests.jl:177-182)."""
    plan = ka.ApproxPosterior(ka.Normal(0, 1),
                              lambda x: jnp.abs(x - 1.5), 0.01)
    res = ka.sample(plan, ka.AIS(20), 100, discard_initial=2000, key=5)
    assert res.approx(1.5, atol=0.05)


def test_mixed_discrete_continuous():
    """Factored(Normal, DiscreteUniform) with stochastic simulator
    (runtests.jl:106-114): sim((n,du)) = (n^2+du)(n+0.01 eps) ~= 5.5."""
    pri = ka.Factored(ka.Normal(1, 0.5), ka.DiscreteUniform(1, 10))

    def cost(theta, key):
        n, du = theta
        sim = (n * n + du) * (n + jax.random.normal(key) * 0.01)
        return jnp.abs(sim - 5.5)

    model = ka.ApproxPosterior(pri, cost, 0.01)
    res = ka.sample(model, ka.AIS(100), 1000, discard_initial=10_000, key=6)
    n_post, du_post = res
    # emitted discrete marginal is integer-valued
    assert np.allclose(du_post.particles, np.round(du_post.particles))
    sim_vals = (n_post.particles ** 2 + du_post.particles) * n_post.particles
    assert abs(np.mean(sim_vals) - 5.5) < 0.2


def test_rosenbrock_banana():
    """CommonLogDensity banana (runtests.jl:200-218):
    quantile(lpi(res), 0.97) > -0.69."""
    D = ka.CommonLogDensity(
        2, lambda k: jax.random.normal(k, (2,)),
        lambda x: -100 * (x[0] - x[1] ** 2) ** 2 - (x[1] - 1) ** 2)
    assert D.nparams == 2
    res = ka.sample(D, ka.AIS(50), 1000, ntransitions=100,
                    discard_initial=2000, key=7)
    x, y = res
    lpi = -100 * (x.particles - y.particles ** 2) ** 2 \
        - (y.particles - 1) ** 2
    assert np.quantile(lpi, 0.97) > -0.69


def test_infinite_cost_handling_and_error():
    """runtests.jl:221-238: valid-on-disc density works; always -inf
    density raises from the init retry budget."""
    D = ka.CommonLogDensity(
        2, lambda k: jax.random.uniform(k, (2,)) * jnp.asarray([2.0, 1.0])
        - jnp.asarray([1.0, 0.0]),
        lambda x: jnp.where(jnp.sum(x * x) <= 1, 0.0, -jnp.inf))
    res = ka.sample(D, ka.AIS(50), 500, ntransitions=10,
                    discard_initial=1000, key=8)
    x, y = res
    assert np.all(x.particles ** 2 + y.particles ** 2 <= 1 + 1e-6)

    D2 = ka.CommonLogDensity(
        2, lambda k: jax.random.uniform(k, (2,)), lambda x: -jnp.inf)
    with pytest.raises(RuntimeError):
        ka.sample(D2, ka.AIS(50), 10, retry_sampling=5, key=9)


def test_nparticles_validation():
    D = ka.CommonLogDensity(
        2, lambda k: jax.random.normal(k, (2,)), lambda x: 0.0)
    with pytest.raises(ValueError):
        ka.sample(D, ka.AIS(6), 10)  # needs >= nparams+5 = 7


def test_mvnormal_vector_model():
    """MVNormal vector-parameter model (runtests.jl:184-198): posterior on
    the radius-1.5 sphere."""
    plan = ka.ApproxPosterior(
        ka.MvNormal(4, 1.0),
        lambda x: jnp.abs(jnp.sqrt(jnp.sum(x * x)) - 1.5), 0.01)
    res = ka.sample(plan, ka.AIS(20), 100, chains=4,
                    discard_initial=2500, ntransitions=40, key=10)
    assert len(res) == 4
    radii = np.sqrt(sum(p.particles ** 2 for p in res))
    assert np.mean(np.abs(radii - 1.5)) < 0.01


def test_sequential_schedule_exact_reference_semantics():
    """schedule='sequential' runs the reference's literal one-walker
    round-robin loop (KissABC.jl:66-80) and must agree statistically with
    the red/black default (unimodal target — on multimodal ABC bands the
    sequential sampler shows the same walker-trapping the reference
    does)."""
    plan = ka.ApproxPosterior(ka.Normal(0, 1),
                              lambda x: jnp.abs(x - 1.5), 0.01)
    res = ka.sample(plan, ka.AIS(20), 300, ntransitions=3,
                    discard_initial=2000, schedule="sequential", key=21)
    assert res.approx(1.5, atol=0.05)
    assert res.std() < 0.05  # posterior is the tiny ABC band around 1.5
    with pytest.raises(ValueError):
        ka.sample(plan, ka.AIS(12), 10, schedule="zigzag")


def test_thinning_reduces_autocorrelation():
    """AbstractMCMC's `thinning` kwarg (the reference's re-exported
    sample supports it): per-walker chains must carry more effective
    samples per recorded draw when thinned."""
    import numpy as np
    from kissabc_tpu.utils.diagnostics import ess
    pri = ka.Normal(0.0, 1.0)
    mdl = ka.CommonLogDensity(
        1, lambda k: pri.sample(k), lambda x: -0.5 * x * x)
    n, ns = 16, 640  # blocks = 40 per walker

    def walker_chains(thinning):
        flat, _ = ka.sample_raw(mdl, ka.AIS(n), ns, ntransitions=1,
                                thinning=thinning, key=3)
        x = np.asarray(flat, np.float64)  # [blocks*n] block-major
        return x.reshape(-1, n).T         # [n walkers, blocks]

    e8 = ess(walker_chains(8))
    e1 = ess(walker_chains(1))
    assert e8 > 1.5 * e1, (e8, e1)
    # both still target N(0, 1)
    a = ka.sample(mdl, ka.AIS(n), ns, ntransitions=1, thinning=8, key=3)
    assert a.approx(0.0, atol=0.2) and abs(a.std() - 1.0) < 0.25
    # sequential mode budget: total steps = discard + ns*thinning
    c = ka.sample(mdl, ka.AIS(8), 12, schedule="sequential", thinning=3,
                  discard_initial=4, key=4)
    assert len(c) == 12
    import pytest
    with pytest.raises(ValueError):
        ka.sample(mdl, ka.AIS(8), 10, thinning=0)


def test_positional_mcmcthreads_marker():
    """The reference's literal multi-chain call form (KissABC.jl:175
    exports MCMCThreads/MCMCDistributed) ports verbatim:
    sample(model, AIS(N), MCMCThreads(), ns, nchains)."""
    D = ka.CommonLogDensity(1, lambda k: jax.random.normal(k, (1,)),
                            lambda x, key: -0.5 * (x[0] ** 2))
    r = ka.sample(D, ka.AIS(16), ka.MCMCThreads(), 64, 2, key=1)
    rk = ka.sample(D, ka.AIS(16), 64, chains=2, key=1)
    np.testing.assert_array_equal(r.particles, rk.particles)
    # MCMCDistributed marker and the bare-class spelling also route
    r2 = ka.sample(D, ka.AIS(16), ka.MCMCDistributed, 64, 2, key=1)
    np.testing.assert_array_equal(r2.particles, rk.particles)
    with pytest.raises(TypeError, match="not both"):
        ka.sample(D, ka.AIS(16), ka.MCMCThreads(), 64, 2, chains=3)
    with pytest.raises(TypeError, match="unexpected positional"):
        ka.sample(D, ka.AIS(16), 64, 2)
