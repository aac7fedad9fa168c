"""Reference-oracle parity tests (SURVEY §6 table): the socks model,
the 0.1N+N mixture quantile profile, and the drifted Wiener process —
the remaining end-to-end known-answer problems of the reference suite."""

import jax
import jax.numpy as jnp
import numpy as np

import kissabc_tpu as ka

MAXN = 512


def socks_sim(key, n_socks, prop_pairs):
    """Broman's socks simulator (runtests.jl:34-44), static-shape JAX
    version: build the sock multiset (pairs first), pick
    min(n_socks, 11) socks uniformly without replacement via a masked
    random-key argsort, and count picked pairs/odds by sorting ids."""
    n_socks = jnp.asarray(n_socks, jnp.int32)
    n_pairs = jnp.round(
        prop_pairs * jnp.floor(n_socks.astype(jnp.float32) / 2)
    ).astype(jnp.int32)
    idx = np.arange(MAXN, dtype=np.int32)
    ids = jnp.where(idx < 2 * n_pairs, idx // 2, n_pairs + (idx - 2 * n_pairs))
    valid = idx < n_socks
    r = jax.random.uniform(key, (MAXN,))
    order = jnp.argsort(jnp.where(valid, r, jnp.inf))
    npicked = jnp.minimum(n_socks, 11)
    lane = np.arange(11, dtype=np.int32)
    picked = jnp.where(lane < npicked, ids[order[:11]], -(lane + 1))
    s = jnp.sort(picked)
    dup = jnp.sum(s[1:] == s[:-1])  # ids appear at most twice
    sample_pairs = dup
    sample_odds = npicked - 2 * dup
    return sample_pairs, sample_odds


def socks_prior():
    prior_mu, prior_sd = 30, 15
    prior_size = -prior_mu**2 / (prior_mu - prior_sd**2)
    return ka.Factored(
        ka.NegativeBinomial(prior_size, prior_size / (prior_mu + prior_size)),
        ka.Beta(15, 2))


def socks_cost(theta, key):
    n_socks, prop_pairs = theta
    sp, so = socks_sim(key, n_socks, prop_pairs)
    # tinydata = (0 pairs, 11 odds) (runtests.jl:55-57)
    return jnp.abs(sp - 0).astype(jnp.float32) + jnp.abs(so - 11)


def test_socks_smc():
    """Posterior means ~= (46.2, 0.866) (runtests.jl:59-60,73-74)."""
    res = ka.smc(socks_prior(), socks_cost, nparticles=2000, alpha=0.95,
                 r_epstol=0, epstol=0.01, key=11)
    n_post, p_post = res.P
    assert abs(n_post.mean() - 46.2) < 4.0
    assert abs(p_post.mean() - 0.866) < 0.03
    # discrete marginal is integer-valued
    assert np.allclose(n_post.particles, np.round(n_post.particles))


def test_socks_ais():
    """Same posterior via AIS + ApproxPosterior (runtests.jl:57-60)."""
    model = ka.ApproxPosterior(socks_prior(), socks_cost, 0.1)
    res = ka.sample(model, ka.AIS(500), 2000, ntransitions=20,
                    discard_initial=4000, key=12)
    n_post, p_post = res
    assert abs(n_post.mean() - 46.2) < 5.0
    assert abs(p_post.mean() - 0.866) < 0.04


ST_N = np.array([0.0, 0.04680825481526908, 0.1057221226763449,
                 0.2682111969397526, 0.8309228020477986])


def _st(particles):
    """Symmetrized quantile profile (runtests.jl:134-135)."""
    q = particles.quantile(np.arange(0.1, 0.91, 0.1))
    sym = (q - q[::-1]) / 2
    return sym[(len(sym) - 1) // 2:]


def _mixture_cost(x, key):
    k1, k2, k3 = jax.random.split(key, 3)
    sim = x + jnp.where(jax.random.bernoulli(k1),
                        jax.random.normal(k2) * 0.1,
                        jax.random.normal(k3))
    return jnp.abs(sim)


def test_mixture_quantile_profile_ais_hard():
    """mean|st(res) - st_n| < 0.1 for the hard-threshold AIS posterior
    (runtests.jl:144-155,166-175)."""
    prior = ka.Uniform(-10, 10)
    plan = ka.ApproxPosterior(prior, _mixture_cost, 0.01)
    res = ka.sample(plan, ka.AIS(50), 2000, ntransitions=50,
                    discard_initial=5000, key=13)
    m = np.mean(np.abs(_st(res) - ST_N))
    assert m < 0.1, m


def test_mixture_quantile_profile_smc():
    prior = ka.Uniform(-10, 10)
    res = ka.smc(prior, _mixture_cost, nparticles=2000, alpha=0.9,
                 epstol=0.01, mcmc_retrys=500, mcmc_tol=0.9, key=14)
    m = np.mean(np.abs(_st(res.P) - ST_N))
    assert m < 0.1, m


def test_wiener_process():
    """Drifted Wiener RMS inference (runtests.jl:116-131): infer
    (mu, sigma) = (0.5, 2.0) from the rms curve."""
    t = jnp.asarray(np.arange(31, dtype=np.float32))
    params = (0.5, 2.0)

    def brownianrms(theta, key):
        mu, sg = theta
        curve = jnp.sqrt(mu * mu * t * t + sg * sg * t)
        return curve * (0.95 + 0.1 * jax.random.uniform(key))

    tdata = np.sqrt(params[0]**2 * np.asarray(t)**2
                    + params[1]**2 * np.asarray(t))

    def cost(theta, key):
        return jnp.sum(jnp.abs(brownianrms(theta, key) - tdata)) / t.shape[0]

    prior = ka.Factored(ka.Uniform(0, 1), ka.Uniform(0, 4))
    res = ka.smc(prior, cost, min_r_ess=0.55, key=15)
    mu_p, sg_p = res.P
    assert mu_p.approx(0.5, atol=0.05)
    assert sg_p.approx(2.0, atol=0.2)
