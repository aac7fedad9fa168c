#!/usr/bin/env python
"""Benchmark harness.

Headline metric (BASELINE.md target): particle-updates/s/chip, where one
particle-update = one full MH rejuvenation step for one walker — proposal
+ prior logpdf + simulator cost + accept — on the README Normal(mu, sigma)
flagship model (reference README.md:70-84, a 1000-draw Normal simulator
per cost call, i.e. 1000 fresh normals per update).

Prints the headline JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
as soon as the first headline row lands, then re-prints an improved line
if a faster variant (Pallas cost kernel) finishes in budget — the LAST
JSON line on stdout is the final headline. vs_baseline is value / 1e6
(the driver-set >=1e6 updates/s/chip target; the reference publishes no
formal benchmarks — BASELINE.md).

Robustness (this harness runs under `timeout 590` on a tunneled axon TPU
where a cold remote compile can cost minutes and the tunnel can stall
transiently):
  * The parent process NEVER initializes JAX. ONE child runs every
    row sequentially (`bench.py --rows A,B,...`), emitting incremental
    `STAGE start`/`ROW name {json}` lines; the parent watchdogs the
    stream with row-aware stall windows and, on a stall (cache-miss
    compile, wedged tunnel), kills the child's process group and
    RESTARTS it on the rows after the stalled one, warmup-absorber
    first — one bad row costs its stall window, not the tail.
  * ONE child, not per-row children: per-process attach stalls of
    2-7 min were observed even when a previous child had JUST
    completed device ops (cross-process warmth is unreliable on this
    tunnel), so subprocess-per-row burned minutes per row; a single
    child pays the attach once and runs all 18 rows in one pass.
  * A `warmup` row runs first (420s stall allowance) to absorb the
    attach stall AND pre-compile one small Pallas program so a cold
    Mosaic compile-server's first-build minutes land there too.
  * Every child enables the persistent compilation cache
    (.jax_cache/, committed to the repo) — repeat runs, including the
    driver's end-of-round run, compile in <1 s per program.
  * Row order is information-priority: headline rows first, then the
    README correctness oracle (smc-parity) and the reference wall-clock
    claim, perf diagnostics after, expensive rows last — when the
    budget dies, the important numbers have already landed.

Timing notes: on the tunneled axon backend ``block_until_ready`` can
return before execution finishes, so every timed region ends with a
scalar readback that forces completion. Sweeps are scanned on-device so
dispatch latency is amortized; jitted fns are warmed TWICE before timing
(the first post-compile call carries one-time overhead).
"""

import json
import os
import subprocess
import sys
import time

T0 = time.perf_counter()
REPO = os.path.dirname(os.path.abspath(__file__))
BUDGET_S = float(os.environ.get("KISSABC_BENCH_BUDGET_S", "540"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def remaining():
    return BUDGET_S - (time.perf_counter() - T0)


# --------------------------------------------------------------------------
# Child-side: one bench row per process. Everything below this block runs
# only under `bench.py --row NAME`.
# --------------------------------------------------------------------------

def _child_init():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # Without this, Mosaic kernel payloads embed full caller tracebacks
    # (file:line of everything up the stack) INSIDE the custom-call
    # config, where the cache key's strip-debuginfo pass can't reach —
    # so any edit that shifts a line anywhere invalidated every Pallas
    # program's cache entry (measured: a 5-line shift changed the key;
    # with this flag the key is shift-invariant).
    jax.config.update("jax_include_full_tracebacks_in_locations", False)
    return jax


def flagship():
    import jax
    import jax.numpy as jnp
    import kissabc_tpu as ka

    prior = ka.Factored(ka.Uniform(1, 3), ka.TruncatedNormal(0, 0.05, 0, 100))

    def cost(theta, key):
        mu, sigma = theta
        x = mu + sigma * jax.random.normal(key, (1000,))
        d1 = jnp.mean(x) - 2.0
        d2 = jnp.std(x) - 0.04
        return jnp.hypot(d1, d2 * 50)

    return prior, cost


def _time_scalar_fn(fn, args_fn, reps=5):
    """Best-of-N timing: warm twice (first post-compile call has one-time
    overhead on axon), then take the MINIMUM of `reps` individually timed
    calls, each forced complete by a scalar readback inside `fn`. Minimum,
    not mean: the tunneled TPU shows transient multi-second stalls that
    are scheduler/tunnel noise, not program cost — the fastest clean rep
    is the honest steady-state throughput (same-day swings of 25-40M
    updates/s on an identical cached program traced to this)."""
    fn(*args_fn(101))
    fn(*args_fn(102))
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        fn(*args_fn(r))
        best = min(best, time.perf_counter() - t0)
    return best


def _time_sweep(jax, step, prior, n, iters, label):
    """Shared sweep-row protocol: scan `iters` sweeps on-device, init a
    prior ensemble, warm twice + scalar readback (_time_scalar_fn), and
    report updates/s. `step(key, thetas, xs, lps, eps)` is the per-sweep
    kernel under test.

    iters=500 (not 50): each jitted call over the axon tunnel carries
    ~47 ms of fixed dispatch/readback overhead (measured: 108.5 ms at
    iters=50 vs 353.5 ms at iters=250 — marginal cost 1.22 ms/sweep).
    A 50-sweep scan therefore underreported steady-state throughput by
    ~45%; at 500 sweeps the fixed cost is <8% and the printed number
    approaches the marginal rate a locally-attached chip would see."""
    import jax.numpy as jnp

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
    acc = [0.0]

    def call(key, *rest):
        acc[0] = float(fn(key, *rest))

    dt = _time_scalar_fn(
        call, lambda r: (jax.random.fold_in(key, r), thetas, xs, lps, eps))
    ups = n * iters / dt
    return {"updates_per_s": ups, "accept_frac": acc[0] / (n * iters),
            "n": n, "iters": iters, "cost": label}


def row_sweep(pallas: bool):
    """updates/s of the scanned SMC rejuvenation sweep (headline)."""
    jax = _child_init()
    import __graft_entry__ as g

    n, iters = 131072, 500
    prior, cost = flagship()
    cost_batched = None
    if pallas:
        if jax.devices()[0].platform != "tpu":
            # make_flagship_cost_batched silently falls back to the XLA
            # threefry path off-TPU; without this gate the row would
            # duplicate sweep-xla under the 'pallas-hwprng' label
            raise RuntimeError("pallas sweep row is TPU-only")
        from kissabc_tpu.ops.pallas_kernels import make_flagship_cost_batched
        cost_batched = make_flagship_cost_batched()
    step = g._sweep_fn(prior, cost, n, cost_batched=cost_batched)
    return _time_sweep(jax, step, prior, n, iters,
                       "pallas-hwprng" if pallas else "xla-threefry")


def row_sweep_fused():
    """The fully-fused one-kernel sweep (proposal + prior gate + MH draw
    + simulator + commit inside one pallas_call; partner diffs via two
    contiguous XLA rolls). Since the r3 dense-layout fix this is the
    FASTEST sweep (138.7M vs the split path's 135.5M updates/s) — the
    r2 'loses at 54M' result was the [n,1] boundary-copy tax, not the
    fusion. TPU only."""
    jax = _child_init()
    from kissabc_tpu.ops.pallas_kernels import make_fused_flagship_sweep

    if jax.devices()[0].platform != "tpu":
        raise RuntimeError("fused sweep kernel is TPU-only")
    n, iters = 131072, 500
    prior, _cost = flagship()
    step = make_fused_flagship_sweep(n)
    return _time_sweep(jax, step, prior, n, iters, "fused-one-kernel-sweep")


def row_roofline():
    """Speed-of-light proxy: raw normal generation + reduction with the
    Pallas hardware-PRNG kernel, no sweep around it. The headline's
    utilization = headline_normals_per_s / this. Off-TPU reports the XLA
    threefry generator instead."""
    jax = _child_init()
    import jax.numpy as jnp

    n, ndraws, iters = 131072, 1000, 500
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        from kissabc_tpu.ops.pallas_kernels import normal_summary_cost

        def one(seed):
            return jnp.sum(normal_summary_cost(
                jnp.full((n,), 2.0, jnp.float32),
                jnp.full((n,), 0.05, jnp.float32), seed, ndraws=ndraws))
    else:
        def one(seed):
            k = jax.random.key(seed)
            return jnp.sum(jax.random.normal(k, (n, ndraws // 10)))

    # scan on-device so the tunnel round-trip (~25 ms/call) doesn't
    # swamp the ~3.5 ms kernel
    def gen(seed0):
        def body(c, s):
            return c + one(s), None
        out, _ = jax.lax.scan(
            body, jnp.float32(0.0),
            seed0 + jnp.arange(iters, dtype=jnp.uint32))
        return out

    fn = jax.jit(gen)

    def call(s):
        float(fn(s))

    dt = _time_scalar_fn(call, lambda r: (jnp.uint32(r * iters),), reps=5)
    nps = n * ndraws * iters / dt
    if not on_tpu:
        nps /= 10
    return {"normals_per_s": nps, "kernel":
            "pallas-hwprng+boxmuller+moments" if on_tpu else "xla-threefry"}


def row_ais_sweep():
    """walker-updates/s of the AIS red/black mixture sweep (the second
    headline algorithm) with the Pallas simulator on TPU."""
    jax = _child_init()
    import jax.numpy as jnp

    import kissabc_tpu as ka
    from kissabc_tpu.core.ais import _halves, make_sweep_halves

    n, iters = 131072, 500
    prior, cost = flagship()
    if jax.devices()[0].platform == "tpu":
        from kissabc_tpu.ops.pallas_kernels import make_flagship_cost_batched
        model = ka.ApproxKernelizedPosterior(
            prior, make_flagship_cost_batched(), 0.005,
            cost_vectorized=True)
    else:
        model = ka.ApproxKernelizedPosterior(prior, cost, 0.005)
    # r5: carry the red/black halves as two separate trees through the
    # scan (the production make_run layout) — no per-sweep slice/concat
    sweep = make_sweep_halves(model, n)

    @jax.jit
    def many(key, th, ld):
        def body(c, k):
            th, ld = c
            return sweep(k, th, ld), None
        (th, ld), _ = jax.lax.scan(
            body, (th, ld), jax.random.split(key, iters))
        return jnp.sum(ld[0][0])

    key = jax.random.key(0)
    thetas = jax.vmap(model.init_sample)(jax.random.split(key, n))
    lds = model.loglike_batch(jax.vmap(model.push)(thetas),
                              jax.random.fold_in(key, 1))
    th, ld = _halves(thetas, n // 2), _halves(lds, n // 2)

    def call(k):
        float(many(k, th, ld))

    dt = _time_scalar_fn(call, lambda r: (jax.random.fold_in(key, r),))
    return {"updates_per_s": n * iters / dt, "n": n, "iters": iters}


def row_ais_fused():
    """Fused AIS diagnostic: the ONE-pallas_call whole-sweep variant
    (make_fused_flagship_ais_sweep_onekernel, in-kernel pltpu.roll
    partner rotation — r4, targets the ~150us/sweep inter-kernel gap)
    vs the one-kernel-per-half variant (121.2M at r3) vs the production
    split AIS path (ais-sweep row). Reports both fused variants. TPU
    only."""
    jax = _child_init()
    import jax.numpy as jnp

    import kissabc_tpu as ka
    from kissabc_tpu.ops.pallas_kernels import (
        make_flagship_cost_batched, make_fused_flagship_ais_sweep,
        make_fused_flagship_ais_sweep_onekernel)

    if jax.devices()[0].platform != "tpu":
        raise RuntimeError("fused AIS row is TPU-only")
    n, iters = 131072, 500
    prior, _cost = flagship()
    model = ka.ApproxKernelizedPosterior(
        prior, make_flagship_cost_batched(), 0.005, cost_vectorized=True)

    key = jax.random.key(0)
    thetas = jax.vmap(model.init_sample)(jax.random.split(key, n))
    lds = model.loglike_batch(jax.vmap(model.push)(thetas),
                              jax.random.fold_in(key, 1))

    def rate(sweep):
        @jax.jit
        def many(key, thetas, lds):
            def body(c, k):
                th, ld = c
                return sweep(k, th, ld), None
            (th, ld), _ = jax.lax.scan(
                body, (thetas, lds), jax.random.split(key, iters))
            return jnp.sum(ld[0])

        def call(k):
            float(many(k, thetas, lds))

        dt = _time_scalar_fn(call, lambda r: (jax.random.fold_in(key, r),))
        return n * iters / dt

    half = rate(make_fused_flagship_ais_sweep(n, scale=0.005))
    one = rate(make_fused_flagship_ais_sweep_onekernel(n, scale=0.005))
    return {"updates_per_s": max(half, one), "halfpair_updates_per_s": half,
            "onekernel_updates_per_s": one, "n": n, "iters": iters}


def row_ais_fused_generic():
    """The r5 GENERIC fused AIS sweep (make_fused_ais_sweep): an
    arbitrary user model — the 4-param g-and-k quantile distribution,
    transcendental-heavy draw — through the one-kernel-per-half path,
    vs the split path (make_sweep_halves + make_streaming_moment_cost)
    on the same model. Closes VERDICT r4 gap #2: user models previously
    topped out at the split rate. TPU only."""
    jax = _child_init()
    import jax.numpy as jnp
    import numpy as np

    import kissabc_tpu as ka
    from kissabc_tpu.core.ais import _halves, make_sweep_halves

    if jax.devices()[0].platform != "tpu":
        raise RuntimeError("generic fused AIS row is TPU-only")
    n, iters = 131072, 200
    prior = ka.Factored(ka.Uniform(0, 6), ka.Uniform(0.1, 3),
                        ka.Uniform(-1, 5), ka.Uniform(0.0, 0.9))

    def draw(th, eps):
        a, b, g, k = th
        return a + b * (1.0 + 0.8 * jnp.tanh(g * eps / 2.0)) * eps \
            * jnp.exp(k * jnp.log1p(eps * eps))

    rng = np.random.default_rng(0)
    z = rng.normal(size=100000)
    xs = 3.0 + 1.0 * (1 + 0.8 * np.tanh(z)) * z * np.exp(
        0.5 * np.log1p(z * z))
    t1, t2 = np.float32(xs.mean()), np.float32(xs.std())

    def reduce_cost(th, m):
        var = jnp.maximum(m[1] - m[0] * m[0], 0.0)
        return jnp.hypot(m[0] - t1, (jnp.sqrt(var) - t2) * 0.3)

    scale = 0.05
    fused = ka.make_fused_ais_sweep(prior, draw, reduce_cost, scale=scale)
    scost = ka.make_streaming_moment_cost(draw, reduce_cost)
    model = ka.ApproxKernelizedPosterior(prior, scost, scale,
                                         cost_vectorized=True)
    split = make_sweep_halves(model, n)

    key = jax.random.key(0)
    thetas = jax.vmap(model.init_sample)(jax.random.split(key, n))
    lds = model.loglike_batch(jax.vmap(model.push)(thetas),
                              jax.random.fold_in(key, 1))

    def rate(sweep, th0, ld0, out, its=iters):
        @jax.jit
        def many(k, th, ld):
            def body(c, kk):
                th, ld = c
                return sweep(kk, th, ld), None
            (th, ld), _ = jax.lax.scan(
                body, (th, ld), jax.random.split(k, its))
            return jnp.sum(jax.tree_util.tree_leaves(ld)[0])

        def call(k):
            out[0] = float(many(k, th0, ld0))

        dt = _time_scalar_fn(call, lambda r: (jax.random.fold_in(key, r),))
        return n * its / dt

    o = [0.0]
    f_ups = rate(fused, thetas, lds, o)
    s_ups = rate(split, _halves(thetas, n // 2), _halves(lds, n // 2), o)

    # cheap-draw evidence: the FLAGSHIP model through the GENERIC kernel
    # (g-and-k is simulator-bound at ~86 Gdraws/s, so fused vs split is
    # within ~5% there; the fused win shows on cheap draws — the generic
    # kernel must land in the hard-coded kernel-per-half's class, ~136M)
    fprior, _ = flagship()

    def fdraw(th, eps):
        mu, sg = th
        return mu + sg * eps

    def freduce(th, m):
        var = jnp.maximum(m[1] - m[0] * m[0], 0.0)
        return jnp.sqrt(jnp.square(m[0] - 2.0)
                        + jnp.square((jnp.sqrt(var) - 0.04) * 50.0))

    ffused = ka.make_fused_ais_sweep(fprior, fdraw, freduce, scale=0.005)
    fscost = ka.make_streaming_moment_cost(fdraw, freduce)
    fmodel = ka.ApproxKernelizedPosterior(fprior, fscost, 0.005,
                                          cost_vectorized=True)
    thetas = jax.vmap(fmodel.init_sample)(jax.random.split(key, n))
    lds = fmodel.loglike_batch(jax.vmap(fmodel.push)(thetas),
                               jax.random.fold_in(key, 1))
    # iters=500 like the other headline-class rows: at the ~136M rate a
    # 200-sweep call is ~0.21 s, so the ~47 ms fixed dispatch overhead
    # underreported this number by ~10-15M
    fl_ups = rate(ffused, thetas, lds, o, its=500)
    return {"updates_per_s": f_ups, "split_updates_per_s": s_ups,
            "speedup": f_ups / s_ups, "model": "g-and-k 4-param",
            "flagship_updates_per_s": fl_ups, "n": n, "iters": iters}


def row_smc_fused_generic():
    """The r5 GENERIC fused SMC sweep (make_fused_smc_sweep) plugged
    into the PRODUCTION sampler: (a) full adaptive smc to the README
    tolerance with the one-kernel sweep (posterior parity + warm
    wall-clock vs the 'smc-parity' split-path row), (b) the raw sweep
    rate at n=131072 (vs the hard-coded sweep-fused headline). TPU
    only."""
    jax = _child_init()
    import jax.numpy as jnp

    import kissabc_tpu as ka

    if jax.devices()[0].platform != "tpu":
        raise RuntimeError("generic fused smc row is TPU-only")
    prior, _ = flagship()

    def draw(th, eps):
        mu, sg = th
        return mu + sg * eps

    def reduce_cost(th, m):
        var = jnp.maximum(m[1] - m[0] * m[0], 0.0)
        return jnp.sqrt(jnp.square(m[0] - 2.0)
                        + jnp.square((jnp.sqrt(var) - 0.04) * 50.0))

    scost = ka.make_streaming_moment_cost(draw, reduce_cost)
    fsweep = ka.make_fused_smc_sweep(prior, draw, reduce_cost)

    def run(key):
        return ka.smc(prior, scost, nparticles=1000, cost_vectorized=True,
                      sweep_fused=fsweep, epstol=0.011113, key=key)

    run(11)  # warm: compiles land in the persistent cache
    t0 = time.perf_counter()
    res = run(2)
    wall = time.perf_counter() - t0
    mu, sg = res.P
    parity = (abs(mu.mean() - 2.0) < 0.05
              and abs(sg.mean() - 0.0401) < 0.005)

    # raw sweep rate (bench form: all alive, fixed eps)
    n, iters = 131072, 500
    key = jax.random.key(0)
    thetas = jax.vmap(lambda k: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), prior.sample_tree(k)))(
        jax.random.split(key, n))
    xs = jnp.ones((n,), jnp.float32)
    lps = jnp.zeros((n,), jnp.float32)
    alive = jnp.ones((n,), bool)
    eps = jnp.float32(0.5)

    @jax.jit
    def many(k, th, x_, lp):
        def body(c, kk):
            th, x_, lp = c
            th, x_, lp, acc = fsweep(kk, th, x_, lp, alive, eps,
                                     jnp.asarray(False))
            return (th, x_, lp), acc
        (th, x_, lp), accs = jax.lax.scan(
            body, (th, x_, lp), jax.random.split(k, iters))
        return jnp.sum(accs)

    def call(k):
        float(many(k, thetas, xs, lps))

    dt = _time_scalar_fn(call, lambda r: (jax.random.fold_in(key, r),))
    return {"updates_per_s": n * iters / dt, "wall_s": wall,
            "iterations": int(res.iterations), "eps": float(res.eps),
            "mu": float(mu.mean()), "sigma": float(sg.mean()),
            "parity": bool(parity), "n": n, "iters": iters}


def row_smc_1m():
    """Production-scale evidence: FULL adaptive smc with 2^20 particles
    to the README tolerance, generic fused sweep + ESS/2 resampling
    (min_r_ess=0.5 — the ESS-triggered rule that is the reference's
    documented intent; its literal default resamples EVERY iteration at
    the alpha*ESS <= N*alpha^2 boundary, which at 1M costs ~45-90 ms of
    population gathers per iteration — profiled r5: 12.6 s vs 4.4 s
    warm). Posterior parity asserted. TPU only."""
    jax = _child_init()
    import jax.numpy as jnp

    import kissabc_tpu as ka

    if jax.devices()[0].platform != "tpu":
        raise RuntimeError("1M-particle row is TPU-only")
    prior, _ = flagship()

    def draw(th, eps):
        mu, sg = th
        return mu + sg * eps

    def reduce_cost(th, m):
        var = jnp.maximum(m[1] - m[0] * m[0], 0.0)
        return jnp.sqrt(jnp.square(m[0] - 2.0)
                        + jnp.square((jnp.sqrt(var) - 0.04) * 50.0))

    scost = ka.make_streaming_moment_cost(draw, reduce_cost)
    fsweep = ka.make_fused_smc_sweep(prior, draw, reduce_cost)
    n = 1 << 20

    def run(key):
        return ka.smc(prior, scost, nparticles=n, cost_vectorized=True,
                      sweep_fused=fsweep, min_r_ess=0.5,
                      epstol=0.011113, key=key)

    run(11)
    t0 = time.perf_counter()
    res = run(1)
    wall = time.perf_counter() - t0
    mu, sg = res.P
    parity = (abs(mu.mean() - 2.0) < 0.05
              and abs(sg.mean() - 0.0401) < 0.005)
    return {"wall_s": wall, "nparticles": n,
            "iterations": int(res.iterations), "eps": float(res.eps),
            "mu": float(mu.mean()), "mu_sd": float(mu.std()),
            "sigma": float(sg.mean()), "parity": bool(parity)}


def row_mcmc_sweep():
    """Classical-MCMC mode (no simulator): Rosenbrock banana via
    CommonLogDensity with a vectorized log-density — raw ensemble-kernel
    throughput when the target is cheap."""
    jax = _child_init()
    import jax.numpy as jnp

    import kissabc_tpu as ka
    from kissabc_tpu.core.ais import _halves, make_sweep_halves

    n, iters = 131072, 500
    D = ka.CommonLogDensity(
        2, lambda k: jax.random.normal(k, (2,)),
        lambda xs, key: -100 * (xs[:, 0] - xs[:, 1] ** 2) ** 2
        - (xs[:, 1] - 1) ** 2,
        lpi_vectorized=True)
    sweep = make_sweep_halves(D, n)

    @jax.jit
    def many(key, th, ld):
        def body(c, k):
            th, ld = c
            return sweep(k, th, ld), None
        (th, ld), _ = jax.lax.scan(
            body, (th, ld), jax.random.split(key, iters))
        return jnp.sum(ld[0])

    key = jax.random.key(0)
    thetas = jax.vmap(D.init_sample)(jax.random.split(key, n))
    lds = D.loglike_batch(jax.vmap(D.push)(thetas),
                          jax.random.fold_in(key, 1))
    th, ld = _halves(thetas, n // 2), _halves(lds, n // 2)

    def call(k):
        float(many(k, th, ld))

    dt = _time_scalar_fn(call, lambda r: (jax.random.fold_in(key, r),))
    return {"updates_per_s": n * iters / dt}


def row_rejection():
    """End-to-end simulations/s of abc_rejection (budget mode, Pallas
    simulator): pure prior sampling + batched simulator + streaming
    top-k, i.e. the user-visible throughput ceiling with zero ensemble
    interaction. Timed as the user sees it — full abc_rejection() calls
    including trace/dispatch/host fetch (the jitted program is compile-
    cached across calls)."""
    jax = _child_init()

    import kissabc_tpu as ka

    if jax.devices()[0].platform != "tpu":
        raise RuntimeError("rejection row is TPU-only (Pallas cost)")
    from kissabc_tpu.ops.pallas_kernels import make_flagship_cost_batched

    prior, _ = flagship()
    cost = make_flagship_cost_batched()
    n, batch, nsims = 4096, 131072, 131072 * 1600

    def call(seed):
        res = ka.abc_rejection(prior, cost, n, nsims=nsims, batch=batch,
                               cost_vectorized=True, key=seed)
        assert res.naccept == n
        return res

    dt = _time_scalar_fn(lambda s: call(s), lambda r: (r,), reps=3)
    res = call(7)
    return {"sims_per_s": nsims / dt, "nsims": nsims, "nparticles": n,
            "eps": res.eps, "log_evidence": res.log_evidence}


def row_ais_wallclock():
    """The reference README's only wall-clock claim: AIS(10), 1000
    samples, ntransitions=100 on the Normal model runs in 0:00:02
    (README.md:63, ~1e5 simulator calls). Same sample budget here;
    compile (one-time, persisted in .jax_cache) reported separately."""
    jax = _child_init()
    import jax.numpy as jnp
    import numpy as np

    import kissabc_tpu as ka
    from kissabc_tpu.core.ais import make_run
    from kissabc_tpu.particles import particles_from_tree

    prior, cost = flagship()
    model = ka.ApproxKernelizedPosterior(prior, cost, 0.005)
    run = make_run(model, ka.AIS(10), 1000, ntransitions=100)
    key = jax.random.key(3)
    t0 = time.perf_counter()
    comp = jax.jit(run).trace(key).lower().compile()
    dt_compile = time.perf_counter() - t0
    # warm once: the first post-compile call carries one-time program-load
    # overhead (~20 s over the tunnel); steady state is ~1.5 s, which is
    # the honest wall-clock against the reference's 0:00:02 claim
    w, _ = comp(jax.random.fold_in(key, 1))
    float(jnp.asarray(w[0])[0])
    t0 = time.perf_counter()
    flat, valid = comp(key)
    flat = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1000], flat)
    dt_run = time.perf_counter() - t0
    mu, sig = particles_from_tree(flat)
    return {"compile_s": dt_compile, "run_s": dt_run,
            "mu": float(mu.mean()), "mu_sd": float(mu.std()),
            "sigma": float(sig.mean()), "sigma_sd": float(sig.std())}


def row_gk():
    """g-and-k quantile-distribution inference, 4 params,
    summary-statistic cost, 4096 particles (BASELINE config 4)."""
    _child_init()
    sys.path.insert(0, os.path.join(REPO, "examples"))
    import kissabc_tpu as ka
    from example_gk import TRUE, cost, prior

    t0 = time.perf_counter()
    res = ka.smc(prior, cost, nparticles=4096, alpha=0.95, epstol=0.05,
                 key=4)
    dt = time.perf_counter() - t0
    a, b, g_, k_ = res.P
    ok = abs(a.mean() - TRUE[0]) < 0.3 and abs(b.mean() - TRUE[1]) < 0.5
    return {"wall_s": dt, "eps": float(res.eps), "ok": bool(ok),
            "a": float(a.mean()), "b": float(b.mean()),
            "g": float(g_.mean()), "k": float(k_.mean())}


def row_smc_parity():
    """Full adaptive smc to the reference README tolerance
    (eps <= 0.011113, README.md:84), 1000 particles; posterior-moment
    parity vs the reference oracle."""
    _child_init()
    import kissabc_tpu as ka

    prior, cost = flagship()
    t0 = time.perf_counter()
    res = ka.smc(prior, cost, nparticles=1000, epstol=0.011113, key=2)
    dt = time.perf_counter() - t0  # smc() materializes results on host
    mu, sig = res.P
    parity = abs(mu.mean() - 2.0) < 0.05 and abs(sig.mean() - 0.0401) < 0.005
    return {"wall_s": dt, "iterations": int(res.iterations),
            "eps": float(res.eps), "mu": float(mu.mean()),
            "mu_sd": float(mu.std()), "sigma": float(sig.mean()),
            "sigma_sd": float(sig.std()), "parity": bool(parity)}


def row_streaming():
    """Generic streaming-simulator toolkit rates (make_streaming_moment_
    cost): identity draw (the generic kernel's ceiling) and a tanh/exp-
    heavy g-and-k draw. TPU only — the off-TPU fallback is threefry."""
    jax = _child_init()
    import jax.numpy as jnp

    if jax.devices()[0].platform != "tpu":
        raise RuntimeError("streaming row is TPU-only (hw PRNG)")
    from kissabc_tpu.ops.pallas_kernels import make_streaming_moment_cost

    n, ndraws = 131072, 1000
    out = {}

    def rate(cost, theta, iters):
        def gen(s0):
            def body(c, s):
                return c + jnp.sum(cost(
                    theta, jax.random.fold_in(jax.random.key(1), s))), None
            return jax.lax.scan(body, jnp.float32(0.0),
                                s0 + jnp.arange(iters, dtype=jnp.uint32))[0]
        g = jax.jit(gen)

        def call(s):
            float(g(s))
        dt = _time_scalar_fn(call, lambda r: (jnp.uint32(r * iters),),
                             reps=3)
        return n * ndraws * iters / dt / 1e9

    ident = make_streaming_moment_cost(
        lambda th, z: z, lambda th, m: m[0], ndraws=ndraws)
    out["identity_gdraws_per_s"] = rate(
        ident, (jnp.full((n,), 2.0),), 200)

    def gk_draw(th, z):
        a, b, g, k = th
        return a + b * (1.0 + 0.8 * jnp.tanh(g * z / 2.0)) * z * jnp.exp(
            k * jnp.log1p(z * z))
    gk = make_streaming_moment_cost(gk_draw, lambda th, m: m[0],
                                    nmoments=2, ndraws=ndraws)
    out["gk_gdraws_per_s"] = rate(
        gk, tuple(jnp.full((n,), v) for v in (3.0, 1.0, 2.0, 0.5)), 100)
    return out


def row_streaming_scan():
    """Sequential-simulator toolkit rate (make_streaming_scan_cost):
    AR(1) recurrence, 1000 steps/walker, streamed first moment —
    Gsteps/s of the Markovian kernel plus an end-to-end smc-sweep
    updates/s with the scan cost (the workload class that previously
    only had the ~27M XLA threefry fallback). TPU only."""
    jax = _child_init()
    import jax.numpy as jnp
    import numpy as np

    if jax.devices()[0].platform != "tpu":
        raise RuntimeError("streaming-scan row is TPU-only (hw PRNG)")
    import __graft_entry__ as g
    import kissabc_tpu as ka
    from kissabc_tpu.ops.pallas_kernels import make_streaming_scan_cost

    n, nsteps, iters = 131072, 1000, 100
    A = np.float32(0.2)

    def step(th, x, eps, t):
        mu, s = th
        return (1 - A) * x + A * mu + s * eps

    out = {}
    c1 = make_streaming_scan_cost(step, lambda th: th[0],
                                  lambda th, m: m[0], nsteps=nsteps)
    theta = (jnp.full((n,), 1.0), jnp.full((n,), 1.0))

    def gen(s0):
        def body(cc, s):
            return cc + jnp.sum(c1(
                theta, jax.random.fold_in(jax.random.key(1), s))), None
        return jax.lax.scan(body, jnp.float32(0.0),
                            s0 + jnp.arange(iters, dtype=jnp.uint32))[0]
    gfn = jax.jit(gen)

    def call(s):
        float(gfn(s))
    dt = _time_scalar_fn(call, lambda r: (jnp.uint32(r * iters),), reps=3)
    out["gsteps_per_s"] = n * nsteps * iters / dt / 1e9

    # end-to-end: the smc rejuvenation sweep with the scan cost (vs the
    # 26.9M updates/s the same model gets on the XLA threefry path)
    stat_var = 1.0 / (1.0 - (1.0 - float(A)) ** 2)

    def reduce_cost(th, m):
        var = jnp.maximum(m[1] - m[0] * m[0], 0.0)
        return jnp.hypot(m[0] - 1.0, (var - stat_var) / stat_var)

    cost = make_streaming_scan_cost(step, lambda th: th[0], reduce_cost,
                                    nsteps=nsteps)
    prior = ka.Factored(ka.Uniform(0, 2), ka.Uniform(0.3, 2.0))
    sweep = g._sweep_fn(prior, None, n, cost_batched=cost)
    res = _time_sweep(jax, sweep, prior, n, 200, "streaming-scan-ar1")
    out["sweep_updates_per_s"] = res["updates_per_s"]
    return out


def row_tsmc():
    """Adaptive tempered SMC (likelihood tempering + evidence) on the
    conjugate-normal oracle from tests/test_tsmc.py: warm end-to-end
    wall-clock with posterior moments AND the marginal-likelihood
    estimate checked against closed form (driver-captured TPU evidence
    for the sampler — VERDICT r3 weak #3)."""
    _child_init()
    import jax.numpy as jnp
    import numpy as np
    import scipy.stats as st

    import kissabc_tpu as ka

    Y = np.array([1.2, 0.8, 1.5, 0.9, 1.1, 1.3, 0.7, 1.0], np.float32)
    K = len(Y)

    def ll_vec(thetas, key):
        return (-0.5 * jnp.sum((Y[None, :] - thetas[:, None]) ** 2, axis=1)
                - K / 2 * np.log(2 * np.pi))

    m_true = float(Y.sum() / (K + 1))
    sd_true = float(1.0 / np.sqrt(K + 1))
    logz_true = float(st.multivariate_normal(
        np.zeros(K), np.eye(K) + np.ones((K, K))).logpdf(Y))

    def run(key):
        return ka.tsmc(ka.Normal(0, 1), ll_vec, nparticles=4096,
                       mcmc_steps=5, loglike_vectorized=True, key=key)

    # r5: the fused tempered rejuvenation (one pallas_call per
    # half-update, runtime-lambda SMEM scalar) on the same oracle
    c = np.float32(K / 2 * np.log(2 * np.pi))

    def ll_elem(theta):
        s = 0.0
        for y in Y:
            s = s + jnp.square(np.float32(y) - theta)
        return -0.5 * s - c

    sweepf = ka.make_fused_tempered_sweep(ka.Normal(0, 1), ll_elem)

    def runf(key):
        return ka.tsmc(ka.Normal(0, 1), ll_vec, nparticles=4096,
                       mcmc_steps=5, loglike_vectorized=True,
                       sweep_fused=sweepf, key=key)

    run(11)  # warm: compile lands in the persistent cache
    t0 = time.perf_counter()
    res = run(1)
    dt = time.perf_counter() - t0
    runf(11)
    t0 = time.perf_counter()
    resf = runf(1)
    dtf = time.perf_counter() - t0

    def _ok(r):
        return (float(r.lam) == 1.0
                and abs(r.P.mean() - m_true) < 0.02
                and abs(r.P.std() - sd_true) < 0.02
                and abs(r.log_evidence - logz_true) < 0.15)

    return {"wall_s": dt, "iterations": int(res.iterations),
            "mu": float(res.P.mean()), "mu_truth": m_true,
            "sd": float(res.P.std()), "sd_truth": sd_true,
            "log_evidence": float(res.log_evidence),
            "logz_truth": logz_true,
            "fused_wall_s": dtf,
            "fused_log_evidence": float(resf.log_evidence),
            "fused_ok": bool(_ok(resf)),
            "ok": bool(_ok(res))}


def row_pfilter():
    """Quantile particle filter on the classical 0.1N+N mixture model
    (reference runtests.jl:144-146; posterior centred on 0): warm
    end-to-end wall-clock + posterior check at 4096 particles."""
    jax = _child_init()
    import jax.numpy as jnp

    import kissabc_tpu as ka

    def cost(x, key):
        k1, k2, k3 = jax.random.split(key, 3)
        sim = x + jnp.where(jax.random.bernoulli(k1),
                            jax.random.normal(k2) * 0.1,
                            jax.random.normal(k3))
        return jnp.abs(sim)

    def run(key):
        return ka.pfilter(ka.Uniform(-10, 10), cost, 4096,
                          verbose=False, key=key)

    run(11)
    t0 = time.perf_counter()
    res = run(4)
    dt = time.perf_counter() - t0
    m = float(res.P.mean())
    return {"wall_s": dt, "eps": float(res.eps),
            "iterations": int(res.iterations), "mean": m,
            "ok": bool(abs(m) < 0.25 and float(res.eps) < 1.0)}


def row_abcde():
    """ABC differential evolution on the Dirac test oracle
    (tests/test_abcde_pfilter.py; cost |x^2+1-1.5| -> posterior at
    sqrt(0.5)): warm end-to-end wall-clock with earlystop + posterior
    check at 1024 particles."""
    _child_init()
    import jax.numpy as jnp
    import numpy as np

    import kissabc_tpu as ka

    def cost(x):
        return jnp.abs(x * x + 1 - 1.5)

    def run(key):
        return ka.ABCDE(ka.Normal(1, 0.2), cost, 0.01, nparticles=1024,
                        generations=2000, earlystop=True, verbose=False,
                        key=key)

    run(11)
    t0 = time.perf_counter()
    res = run(1)
    dt = time.perf_counter() - t0
    m = float(res.P.mean())
    ok = bool(res.reached_eps) and abs(m - np.sqrt(0.5)) < 0.02

    # r5: fused-generation throughput (make_fused_abcde_generation) vs
    # the split path on the flagship streaming model at production n —
    # fixed generation count (unreachable eps), walker-updates/s
    prior = ka.Factored(ka.Uniform(1, 3),
                        ka.TruncatedNormal(0, 0.05, 0, 100))

    def draw(th, eps):
        return th[0] + th[1] * eps

    def rc(th, mm):
        var = jnp.maximum(mm[1] - mm[0] * mm[0], 0.0)
        return jnp.sqrt(jnp.square(mm[0] - 2.0)
                        + jnp.square((jnp.sqrt(var) - 0.04) * 50.0))

    scost = ka.make_streaming_moment_cost(draw, rc, ndraws=1000)
    gamma = float(2.38 / np.sqrt(4.0))
    gen = ka.make_fused_abcde_generation(prior, draw, rc, gamma=gamma,
                                         ndraws=1000)
    nb = 16384

    def run2(key, fused, gens):
        return ka.ABCDE(prior, scost, 1e-6, nparticles=nb,
                        generations=gens, cost_vectorized=True,
                        sweep_fused=(gen if fused else None),
                        verbose=False, key=key)

    # MARGINAL generation cost (diff of two generation counts): each
    # ABCDE call re-traces its program (~1 s fixed), so an end-to-end
    # ratio would mostly measure retrace, not device work. 500-gen
    # spread: at ~0.6 ms/gen the signal (~0.3 s) must clear the ~0.1 s
    # retrace jitter
    # median-of-3 per (path, gens): single-shot diffs read up to 2x off
    # (retrace jitter ~0.1 s vs a ~0.3 s signal)
    out = {}
    for label, fused in (("fused", True), ("split", False)):
        times = {}
        for gens in (20, 520):
            run2(12, fused, gens)  # warm (program then cached in-proc)
            ts = []
            for rep in range(3):
                t0 = time.perf_counter()
                r2 = run2(2 + rep, fused, gens)
                ts.append(time.perf_counter() - t0)
            times[gens] = sorted(ts)[1]
        marg = (times[520] - times[20]) / 500
        mu = float(r2.P[0].mean())
        out[f"{label}_updates_per_s"] = nb / marg
        out[f"{label}_mu_ok"] = bool(abs(mu - 2.0) < 0.05)

    return {"wall_s": dt, "generations": int(res.iterations),
            "nsim": int(res.nsim), "reached_eps": bool(res.reached_eps),
            "mean": m, "truth": float(np.sqrt(0.5)), "ok": bool(ok),
            **out}


def row_pallas_tests(core=False):
    """Execute the TPU-hardware-gated statistical tests (hw-PRNG KS
    parity, fused-vs-split sweep moment agreement) on the real chip
    inside the bench evidence chain (VERDICT r3 weak #2: these tests
    skip in CPU CI, so kernel statistical parity had no driver-visible
    artifact). Runs pytest in a subprocess with KISSABC_TESTS_ON_TPU=1
    (the conftest otherwise forces the 8-device CPU mesh) and streams
    per-test lines to stderr so the parent watchdog sees progress.

    ``core=True`` runs the <90 s subset used in the driver's capped
    run (VERDICT r4: the full 6-test row costs ~449 s — 83% of the
    540 s driver budget — so on-chip statistical evidence was
    all-or-nothing): ONE hw-PRNG statistics test per kernel family
    (flagship normal_summary_cost, streaming-moment, streaming-scan).
    The fused-vs-split AIS/SMC moment-parity tests stay in the full
    builder-side row — the driver run still exercises every fused
    kernel through the headline rows themselves."""
    jax = _child_init()
    if jax.devices()[0].platform != "tpu":
        raise RuntimeError("pallas-tests row is TPU-only")
    env = dict(os.environ)
    env["KISSABC_TESTS_ON_TPU"] = "1"
    cmd = [sys.executable, "-m", "pytest", "tests", "-m", "tpu_hw", "-v",
           "-p", "no:cacheprovider", "--no-header"]
    if core:
        cmd += ["-k", ("kernel_statistics_on_tpu or "
                       "hw_statistics_match_flagship_kernel or "
                       "hw_statistics_match_fallback")]
    import re
    p = subprocess.Popen(cmd, cwd=REPO, env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    passed = failed = 0
    for line in p.stdout:
        line = line.rstrip()
        if line:
            log(f"  [pallas-tests] {line}")
        # counts come from pytest's final summary line ("== N passed,
        # M failed in Xs =="): per-test -v lines double-count failures
        # (progress line + short-summary line both contain FAILED)
        m = re.search(r"=+ (.+) in [\d.]+s", line)
        if m:
            body = m.group(1)
            pm = re.search(r"(\d+) passed", body)
            fm = re.search(r"(\d+) failed", body)
            em = re.search(r"(\d+) error", body)
            passed = int(pm.group(1)) if pm else 0
            failed = ((int(fm.group(1)) if fm else 0)
                      + (int(em.group(1)) if em else 0))
    rc = p.wait()
    return {"exit_code": rc, "passed": passed, "failed": failed,
            "ok": rc == 0 and passed > 0 and failed == 0}


def row_warmup():
    """Absorb the tunnel's cold-attach cost AND the compile server's
    cold-Mosaic cost. After the TPU sits idle for a few minutes, the
    FIRST device op of the next process stalls 2-4 min (observed
    123-264 s; `jax.devices()` itself is instant). Separately, the
    remote compile server's FIRST Mosaic/Pallas build after idle can
    take minutes while subsequent ones run in 3-12 s — so this row also
    compiles+runs one small Pallas program: if the server is cold, the
    minutes land HERE (uncapped) instead of inside a watchdog-capped
    real row (the r3 failure mode: killed mid-compile children jammed
    the server and cascade-stalled every later row). Both stalls are
    per-tunnel/per-server, not per-process."""
    jax = _child_init()
    import jax.numpy as jnp
    import threading

    # heartbeat while the first op is (possibly) stalled in the attach:
    # lets the parent/driver log distinguish "attach stall in progress"
    # from a wedged child, and leaves a timeline in the round artifact
    # (VERDICT r4 next #1c)
    done = threading.Event()
    t0 = time.perf_counter()

    def beat():
        while not done.wait(30.0):
            log(f"  warmup heartbeat: first device op still pending "
                f"after {time.perf_counter() - t0:.0f}s (attach stall "
                "in progress; window uncapped)")

    threading.Thread(target=beat, daemon=True).start()
    try:
        v = float((jnp.ones((8, 128)) + 1.0).sum())
    finally:
        done.set()
    attach = time.perf_counter() - t0
    res = {"attach_s": attach, "val": v}
    if jax.devices()[0].platform == "tpu":
        from kissabc_tpu.ops.pallas_kernels import normal_summary_cost
        t0 = time.perf_counter()
        float(jnp.sum(normal_summary_cost(
            jnp.full((2048,), 2.0, jnp.float32),
            jnp.full((2048,), 0.04, jnp.float32), 1, ndraws=200)))
        res["mosaic_warm_s"] = round(time.perf_counter() - t0, 1)
    return res


ROWS = {
    "warmup": row_warmup,
    "sweep-xla": lambda: row_sweep(pallas=False),
    "sweep-pallas": lambda: row_sweep(pallas=True),
    "sweep-fused": row_sweep_fused,
    "roofline": row_roofline,
    "ais-sweep": row_ais_sweep,
    "mcmc-sweep": row_mcmc_sweep,
    "ais-wallclock": row_ais_wallclock,
    "rejection": row_rejection,
    "g-and-k": row_gk,
    "smc-parity": row_smc_parity,
    "streaming": row_streaming,
    "ais-fused": row_ais_fused,
    "ais-fused-generic": row_ais_fused_generic,
    "smc-fused-generic": row_smc_fused_generic,
    "smc-1m": row_smc_1m,
    "streaming-scan": row_streaming_scan,
    "tsmc": row_tsmc,
    "pfilter": row_pfilter,
    "abcde": row_abcde,
    "pallas-tests": row_pallas_tests,
    "pallas-tests-core": lambda: row_pallas_tests(core=True),
}


def _group_main(names):
    """Child-side: run several rows sequentially in ONE process (one
    interpreter start + jax import + cache load for all of them — the
    r2 driver run burned ~5-8 s x 11 children on fixed overhead).
    Emits incremental `STAGE start <row>` / `ROW <row> {json}` /
    `ROWERR <row> msg` lines so the parent can watchdog per-row
    progress and salvage completed rows if a later one wedges."""
    for name in names:
        print(f"STAGE start {name}", flush=True)
        t0 = time.perf_counter()
        try:
            res = ROWS[name]()
        except Exception as e:  # a failed row must not kill its group
            msg = repr(e).replace("\n", " ")[:300]
            print(f"ROWERR {name} {msg}", flush=True)
            continue
        res["_row_s"] = round(time.perf_counter() - t0, 1)
        print(f"ROW {name} " + json.dumps(res), flush=True)


# --------------------------------------------------------------------------
# Parent-side orchestration (no JAX in this process).
# --------------------------------------------------------------------------

_STALL_WINDOWS = {"warmup": 1e9, "sweep-xla": 110.0,
                  "g-and-k": 140.0, "rejection": 110.0,
                  # warm run + timed run back-to-back with no output
                  # tsmc/abcde run split + fused back-to-back
                  "tsmc": 200.0, "pfilter": 150.0, "abcde": 200.0,
                  "streaming-scan": 150.0, "ais-fused-generic": 150.0,
                  "smc-fused-generic": 150.0, "smc-1m": 200.0,
                  # a single statistical test can compile+draw silently
                  # for minutes; the row streams a line per finished test
                  "pallas-tests": 480.0, "pallas-tests-core": 240.0}
# warmup's stall window is unbounded ON PURPOSE: its job is to sit
# through the attach stall (observed up to 7+ min), and killing it at
# any finite window guarantees the run fails while waiting might still
# leave time for the ~15s headline+parity tail — the row CAP (timeout)
# remains the only bound.

_poisoned = [False]
# True after a child was killed mid-row: killing a JAX client mid-op
# leaves the tunnel/device in a state where the NEXT process's first op
# stalls 2-4 min (same signature as the cold-attach stall) — so every
# post-kill child is prepended with a `warmup` absorber row that gets a
# longer stall window (r3 failure mode: each watchdog kill poisoned the
# next row, which got killed too, cascading through the whole tail).


def _drain_readers(p, q, on_line, deadline, stall_for):
    """Pump child output until exit/deadline/stall. Returns
    ('exit', rc) | ('timeout', None) | ('stall', None). ``stall_for()``
    returns the current stall window (row-aware)."""
    import queue as _q
    last_line = time.perf_counter()
    open_streams = 2
    while True:
        now = time.perf_counter()
        if now > deadline:
            return ("timeout", None)
        if now - last_line > stall_for():
            return ("stall", None)
        try:
            tag, line = q.get(timeout=0.5)
        except _q.Empty:
            if p.poll() is not None and open_streams == 0:
                return ("exit", p.returncode)
            continue
        if line is None:
            open_streams -= 1
            continue
        last_line = now
        on_line(tag, line)


def run_rows(names, total_cap, stall_s=75.0, results=None, label=None,
             on_row=None):
    """Run rows (one child process, sequential) with a streaming
    watchdog: if the child goes `stall_s` with no output line — a warm
    row always prints STAGE/ROW lines well inside that — it is killed
    and RESTARTED on the rows after the stalled one, so one cache-miss
    compile costs one row, not the whole tail (the r2 failure mode:
    three 60 s row timeouts burned 164 s for zero numbers). Returns
    {row: result} for rows that landed."""
    import subprocess as sp
    import threading
    import queue as _q

    results = {} if results is None else results
    pending = [n for n in names if n not in results]
    group_deadline = time.perf_counter() + total_cap  # across restarts
    while pending:
        cap = min(group_deadline - time.perf_counter(), remaining() - 10)
        if cap < 20:
            for n in pending:
                log(f"ROW SKIPPED [{n}]: {cap:.0f}s left < 20s floor")
            return results
        # after a kill, absorb the poison stall in a warmup row with a
        # long stall window instead of sacrificing the next real row
        torun = pending
        if _poisoned[0] and pending[0] != "warmup" and remaining() > 60:
            # healthy absorber costs ~1-30s and saves the row behind it
            # from eating the post-kill stall; only skip it when the
            # budget can't even cover a healthy pass
            torun = ["warmup"] + pending
        state = {"row": None, "t0": time.perf_counter()}

        def on_line(tag, line, state=state):
            if tag == "err":
                if "Platform 'axon' is experimental" not in line:
                    log(f"  [{label or state['row'] or '?'}] {line}")
                return
            if line.startswith("STAGE start "):
                state["row"] = line.split()[-1]
                state["t0"] = time.perf_counter()
                return
            if line.startswith("ROWERR "):
                _, name, msg = line.split(" ", 2)
                log(f"ROW FAILED [{name}]: {msg}")
                return
            if line.startswith("ROW "):
                _, name, payload = line.split(" ", 2)
                try:
                    res = json.loads(payload)
                except json.JSONDecodeError:
                    log(f"ROW FAILED [{name}]: bad JSON payload")
                    return
                dt = time.perf_counter() - state["t0"]
                results[name] = res
                log(f"ROW OK [{name}] ({dt:.0f}s): "
                    + json.dumps(res, default=str))
                if on_row is not None:
                    on_row(name, res)

        p = sp.Popen(
            [sys.executable, os.path.abspath(__file__), "--rows",
             ",".join(torun)],
            stdout=sp.PIPE, stderr=sp.PIPE, text=True, cwd=REPO,
            start_new_session=True)
        q = _q.Queue()

        def reader(stream, tag):
            for line in iter(stream.readline, ""):
                q.put((tag, line.rstrip("\n")))
            q.put((tag, None))

        threads = [threading.Thread(target=reader, args=(p.stdout, "out"),
                                    daemon=True),
                   threading.Thread(target=reader, args=(p.stderr, "err"),
                                    daemon=True)]
        for t in threads:
            t.start()

        def stall_for(state=state):
            # row-aware windows (max with stall_s, never less): warmup
            # absorbs attach stalls observed past 380s; the silent-
            # compute rows legitimately print nothing for 50-70s warm
            # (sweep-xla 47-66s, g-and-k up to 70s, rejection ~36s)
            return max(stall_s, _STALL_WINDOWS.get(state["row"], 0.0))

        why, rc = _drain_readers(p, q, on_line,
                                 time.perf_counter() + cap, stall_for)
        if why == "exit":
            pending = [n for n in pending if n not in results]
            if rc == 0 or not pending:
                _poisoned[0] = False
                return results
            # crashed child (native abort, tunnel fatal): log and fall
            # through to the salvage path so the remaining rows still
            # get a restart instead of being silently dropped
            log(f"CHILD EXITED rc={rc} with {len(pending)} rows "
                "pending; restarting on the remainder")
            _poisoned[0] = True
            stuck = state["row"]
            if stuck in pending:
                pending = pending[pending.index(stuck) + 1:]
            elif stuck != "warmup":  # crash before any STAGE line: drop
                # the head so a crash-looping child cannot spin forever
                pending = pending[1:]
            # stuck == "warmup" (died inside the prepended absorber):
            # keep pending intact — the head row never ran, and the
            # group deadline bounds any crash loop (mirrors the stall
            # path below)
            continue
        # timeout/stall: kill the whole child process group (exact pids
        # we own — never pattern kills) and salvage the rows after the
        # one that wedged
        import signal
        try:
            os.killpg(p.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            p.kill()
        p.wait()
        _poisoned[0] = True
        stuck = state["row"] or torun[0]
        log(f"ROW {'TIMEOUT' if why == 'timeout' else 'STALLED'} "
            f"[{stuck}] after "
            f"{time.perf_counter() - state['t0']:.0f}s; salvaging "
            "the rows after it")
        if stuck in pending:
            pending = pending[pending.index(stuck) + 1:]
        elif stuck != "warmup":  # not in pending: drop head for progress
            pending = pending[1:]
        # stuck == "warmup": keep pending intact — the absorber itself
        # stalling means the tunnel needs another (longer) absorb pass;
        # the cap/budget floor still bounds the loop
    return results


def _save_rows(results):
    """Merge this run's row results into the committed bench_rows.json —
    the machine-readable evidence behind docs/benchmarks.md (the doc is
    rendered from it by tools/gen_benchmarks_md.py, and
    tests/test_bench_docs.py fails if the two drift). Merge, don't
    overwrite: a budget-truncated run must not delete evidence for rows
    it never reached."""
    path = os.path.join(REPO, "bench_rows.json")
    rows = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (json.JSONDecodeError, OSError):
            rows = {}
    rows.update({k: v for k, v in results.items() if k != "warmup"})
    with open(path, "w") as f:
        json.dump(rows, f, indent=1, sort_keys=True)
        f.write("\n")
    log(f"row evidence merged into {path} ({len(results)} rows this run)")
    # keep docs/benchmarks.md consistent with the refreshed evidence so
    # a driver-committed bench run can't leave the doc-drift guard
    # (tests/test_bench_docs.py) red for the next session
    try:
        sys.path.insert(0, os.path.join(REPO, "tools"))
        import gen_benchmarks_md
        gen_benchmarks_md.main()
    except Exception as e:  # missing rows on a truncated first-ever run
        log(f"benchmarks.md NOT regenerated: {e!r}")


_printed_headline = [0.0]


def emit_headline(ups):
    """Print the headline JSON line; the LAST such line is the result.
    Only re-print improvements."""
    if ups and ups > _printed_headline[0]:
        _printed_headline[0] = ups
        print(json.dumps({
            "metric": "particle_updates_per_s_per_chip",
            "value": ups,
            "unit": "updates/s",
            "vs_baseline": ups / 1e6,
        }), flush=True)


def log_utilization(roof):
    if roof and _printed_headline[0]:
        # headline updates/s x 1000 normals/update vs the bare kernel
        util = _printed_headline[0] * 1000.0 / roof["normals_per_s"]
        log(f"utilization: headline sweep runs at {util:.0%} of the "
            f"raw {roof['normals_per_s'] / 1e9:.1f} Gnormals/s "
            "generator kernel (speed-of-light proxy for this "
            "simulator-bound workload)")


def main():
    log(f"bench budget: {BUDGET_S:.0f}s; cache dir: "
        f"{os.path.join(REPO, '.jax_cache')}")

    # ONE child runs every row sequentially (r3 redesign): per-process
    # attach stalls of 2-7 min were observed even when a PREVIOUS child
    # had just completed device ops (cross-process warmth is not
    # reliable), so subprocess-per-row burned minutes per row while a
    # single child paid the attach once and ran the rows in one pass.
    # The streaming watchdog still kills+restarts on a per-row stall
    # (salvaging the remainder, absorber-first), so one wedged row
    # costs its stall window, not the tail. Order = information
    # priority: warmup absorber, headline rows, the README correctness
    # oracle + wall-clock claim, diagnostics, expensive rows last.
    # Budget math (VERDICT r4 next #1b): the full matrix summed to
    # ~581 s of row time — it could NOT fit the driver's 540 s budget
    # even stall-free. The default order therefore runs the <90 s
    # pallas-tests CORE subset (~132 s total without it, so headline +
    # parity + every sampler row land even after a 2-4 min attach
    # stall); the full 449 s pallas-tests row is builder-side only —
    # run `KISSABC_BENCH_FULL=1 python bench.py` (with a raised
    # KISSABC_BENCH_BUDGET_S) before a round snapshot to refresh its
    # committed evidence.
    full = bool(os.environ.get("KISSABC_BENCH_FULL"))
    order = ["warmup", "sweep-pallas", "sweep-fused", "smc-parity",
             "ais-wallclock", "roofline", "ais-sweep", "mcmc-sweep",
             "streaming", "streaming-scan", "ais-fused",
             "ais-fused-generic", "smc-fused-generic", "smc-1m", "tsmc", "pfilter",
             "abcde", "rejection", "sweep-xla", "g-and-k",
             "pallas-tests" if full else "pallas-tests-core"]

    results = {}

    def on_row(name, res):
        if name == "warmup":
            log(f"tunnel attach: {res['attach_s']:.0f}s")
        if name in ("sweep-pallas", "sweep-fused"):
            emit_headline(res["updates_per_s"])
        if name == "ais-sweep" and not any(
                r in results for r in ("sweep-pallas", "sweep-fused")):
            emit_headline(res["updates_per_s"])  # degraded fallback

    run_rows(order, total_cap=remaining() - 8, results=results,
             on_row=on_row, label="all")
    log_utilization(results.get("roofline"))

    # second pass for anything salvaged away, if budget remains
    missing = [n for n in order if n not in results and n != "warmup"]
    if missing and remaining() > 40:
        run_rows(missing, total_cap=remaining() - 8, results=results,
                 on_row=on_row, label="retry")
        log_utilization(results.get("roofline"))

    _save_rows(results)

    if not _printed_headline[0]:
        # Nothing measured — emit an explicit zero so the driver records
        # a parseable (failing) value rather than nothing, and say WHY:
        # on this tunnel the per-process cold-attach stall (observed
        # 0.8 s .. 1913 s, independent of device warmth) can consume the
        # whole budget before the first row runs. The last full capture
        # lives in bench_rows.json / docs/benchmarks.md.
        log("ZERO ROWS CAPTURED: the tunnel attach stall consumed the "
            "budget (not a framework failure — every row is green in "
            "the committed bench_rows.json; re-run with a larger "
            "KISSABC_BENCH_BUDGET_S to reproduce).")
        print(json.dumps({
            "metric": "particle_updates_per_s_per_chip",
            "value": 0.0, "unit": "updates/s", "vs_baseline": 0.0,
        }), flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] in ("--row", "--rows"):
        _group_main(sys.argv[2].split(","))
    else:
        main()
