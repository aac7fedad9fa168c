"""Karl Broman's socks problem — mixed discrete/continuous prior.

The classic ABC teaching example (reference ``test/runtests.jl:30-75``):
11 socks were picked from the laundry and all 11 were singletons — how
many socks are there, and what fraction are pairs? The prior mixes a
DISCRETE count (NegativeBinomial) with a CONTINUOUS proportion (Beta);
`Factored` handles the mix, and the `push_p` policy keeps the count an
integer wherever the user sees it while the ensemble evolves in float.

Run: `python examples/example_socks.py` (CPU or TPU; a few seconds).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import kissabc_tpu as ka

MAXN = 512  # static upper bound on the sock count (prior mass above ~300 is nil)


def socks_sim(key, n_socks, prop_pairs):
    """Pick min(n_socks, 11) socks without replacement; count pairs/odds.

    Static-shape JAX version of the reference simulator
    (``runtests.jl:34-44``): build the sock multiset (pairs first), pick
    via a masked random argsort, count duplicates by sorting ids.
    """
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
    dup = jnp.sum(s[1:] == s[:-1])
    return dup, npicked - 2 * dup  # (pairs picked, odd socks picked)


def main():
    # prior from the reference: mean 30, sd 15 over the count
    prior_mu, prior_sd = 30, 15
    prior_size = -prior_mu**2 / (prior_mu - prior_sd**2)
    prior = ka.Factored(
        ka.NegativeBinomial(prior_size, prior_size / (prior_mu + prior_size)),
        ka.Beta(15, 2),
    )

    def cost(theta, key):
        n_socks, prop_pairs = theta
        sample_pairs, sample_odds = socks_sim(key, n_socks, prop_pairs)
        # observed: 0 pairs, 11 odd socks
        return (jnp.abs(sample_pairs - 0) + jnp.abs(sample_odds - 11)
                ).astype(jnp.float32)

    res = ka.smc(prior, cost, nparticles=5000, epstol=0.01,
                 max_iters=60, key=0)
    n_socks, prop_pairs = res.P
    print(f"n_socks    = {n_socks}   (reference posterior mean ~46.2)")
    print(f"prop_pairs = {prop_pairs}   (reference posterior mean ~0.866)")
    assert n_socks.approx(46.2, atol=4.0)
    assert prop_pairs.approx(0.866, atol=0.06)
    # the count is an integer in the returned sample (push_p policy)
    assert float(n_socks.particles[0]) == int(n_socks.particles[0])


if __name__ == "__main__":
    main()
