#!/usr/bin/env python
"""Benchmark harness.

Headline metric (BASELINE.md target): particle-updates/s/chip, where one
particle-update = one full MH rejuvenation step for one walker — proposal
+ prior logpdf + simulator cost + accept — on the README Normal(mu, sigma)
flagship model (reference README.md:70-84, a 1000-draw Normal simulator
per cost call, i.e. 1000 fresh normals per update).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is value / 1e6 (the driver-set >=1e6 updates/s/chip target;
the reference itself publishes no formal benchmarks — BASELINE.md).

Timing notes: on the tunneled axon backend ``block_until_ready`` can
return before execution finishes, so every timed region ends with a
scalar readback that forces completion. Sweeps are scanned on-device so
dispatch latency is amortized.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def flagship():
    import kissabc_tpu as ka

    prior = ka.Factored(ka.Uniform(1, 3), ka.TruncatedNormal(0, 0.05, 0, 100))

    def cost(theta, key):
        mu, sigma = theta
        x = mu + sigma * jax.random.normal(key, (1000,))
        d1 = jnp.mean(x) - 2.0
        d2 = jnp.std(x) - 0.04
        return jnp.hypot(d1, d2 * 50)

    return prior, cost


def _sweep_bench(n, iters, cost_batched=None):
    """updates/s of the scanned SMC rejuvenation sweep."""
    import __graft_entry__ as g

    prior, cost = flagship()
    step = g._sweep_fn(prior, cost, n, cost_batched=cost_batched)

    def many(key, thetas, xs, lps, eps):
        def body(carry, k):
            th, x_, lp = carry
            th, x_, lp, acc = step(k, th, x_, lp, eps)
            return (th, x_, lp), acc
        (th, x_, lp), accs = jax.lax.scan(
            body, (thetas, xs, lps), jax.random.split(key, iters))
        return jnp.sum(accs)

    key = jax.random.key(0)
    thetas = jax.vmap(lambda k: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), prior.sample_tree(k)))(
        jax.random.split(key, n))
    xs = jnp.ones((n,), jnp.float32)
    lps = jnp.zeros((n,), jnp.float32)
    eps = jnp.asarray(0.5, jnp.float32)

    fn = jax.jit(many)
    acc = float(fn(key, thetas, xs, lps, eps))  # compile + warm (forced)
    reps = 3
    t0 = time.perf_counter()
    for r in range(reps):
        acc = float(fn(jax.random.fold_in(key, r), thetas, xs, lps, eps))
    dt = (time.perf_counter() - t0) / reps
    return n * iters / dt, acc / (n * iters)


def bench_sweeps():
    n, iters = 131072, 50
    ups_xla, frac = _sweep_bench(n, iters)
    log(f"sweep[XLA threefry cost]    n={n}: {ups_xla:,.0f} updates/s "
        f"(accept {frac:.3f})")
    ups_pl = 0.0
    if jax.devices()[0].platform == "tpu":
        from kissabc_tpu.ops.pallas_kernels import make_flagship_cost_batched
        ups_pl, frac = _sweep_bench(
            n, iters, cost_batched=make_flagship_cost_batched())
        log(f"sweep[Pallas HW-PRNG cost]  n={n}: {ups_pl:,.0f} updates/s "
            f"(accept {frac:.3f})")
    return max(ups_xla, ups_pl)


def bench_smc_to_reference_eps():
    """Wall-clock for full adaptive smc to reach the reference's README
    tolerance (eps <= 0.011113, README.md:84), 1000 particles."""
    import kissabc_tpu as ka

    prior, cost = flagship()
    t0 = time.perf_counter()
    res = ka.smc(prior, cost, nparticles=1000, epstol=0.011113, key=2)
    dt = time.perf_counter() - t0  # smc() materializes results on host
    mu, sig = res.P
    return dt, res, (mu.mean(), mu.std(), sig.mean(), sig.std())


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}")

    ups = bench_sweeps()

    dt_smc, res, (mum, mus, sm, ss) = bench_smc_to_reference_eps()
    log(f"full smc to eps<=0.011113: {dt_smc:.2f}s wall (incl. compile), "
        f"{res.iterations} iterations, final eps={res.eps:.5f}")
    log(f"posterior: mu={mum:.4f}±{mus:.4f} (ref 2.0±0.0062), "
        f"sigma={sm:.5f}±{ss:.5f} (ref 0.0401±0.00081)")
    parity = abs(mum - 2.0) < 0.05 and abs(sm - 0.0401) < 0.005
    log(f"moment parity vs reference oracle: {'PASS' if parity else 'FAIL'}")

    print(json.dumps({
        "metric": "particle_updates_per_s_per_chip",
        "value": ups,
        "unit": "updates/s",
        "vs_baseline": ups / 1e6,
    }))


if __name__ == "__main__":
    main()
