"""Generic fused AIS sweep: bring your own model to the fast kernel.

Demonstrates ``make_fused_ais_sweep`` (r5; no counterpart in the
reference) — the WHOLE AIS half-update fused into one Pallas kernel for
an arbitrary user model: 4:2:1 stretch/DE/walk mixture proposal, the
prior's logpdf (traced in-kernel), a streaming elementwise simulator,
kernelized MH accept, and the commit. On a v5e this runs the flagship
Normal(mu, sigma) model at ~138M walker-updates/s (vs ~124M for the
split XLA-moves + Pallas-cost path) and a transcendental-heavy g-and-k
model at its ~86 Gdraws/s simulator roofline.

Off-TPU this script runs the SAME model through the split path
(``make_sweep_halves`` + ``make_streaming_moment_cost``'s threefry
fallback), which is the recommended portable route — the fused kernel
is a TPU-only fast path with identical statistics (different streams).

Model: Normal location-scale inference from 1000-draw summaries (the
reference README model, README.md:70-84) written in the
bring-your-own-elementwise contract:

    draw(theta, eps)       = mu + sigma * eps
    reduce_cost(theta, m)  = hypot(m1 - 2.0, (sd - 0.04) * 50)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import kissabc_tpu as ka
from kissabc_tpu.core.ais import _halves, make_sweep_halves

ON_TPU = jax.devices()[0].platform == "tpu"


def main():
    prior = ka.Factored(ka.Uniform(1, 3),
                        ka.TruncatedNormal(0, 0.05, 0, 100))

    def draw(th, eps):
        mu, sg = th
        return mu + sg * eps

    def reduce_cost(th, m):
        var = jnp.maximum(m[1] - m[0] * m[0], 0.0)
        return jnp.sqrt(jnp.square(m[0] - 2.0)
                        + jnp.square((jnp.sqrt(var) - 0.04) * 50.0))

    scale = 0.01
    n, sweeps = 4096, 60
    scost = ka.make_streaming_moment_cost(draw, reduce_cost)
    model = ka.ApproxKernelizedPosterior(prior, scost, scale,
                                         cost_vectorized=True)

    key = jax.random.key(0)
    thetas = jax.vmap(model.init_sample)(jax.random.split(key, n))
    lds = model.loglike_batch(jax.vmap(model.push)(thetas),
                              jax.random.fold_in(key, 1))

    if ON_TPU:
        sweep = ka.make_fused_ais_sweep(prior, draw, reduce_cost,
                                        scale=scale)

        @jax.jit
        def many(k, th, ld):
            def body(c, kk):
                th, ld = c
                return sweep(kk, th, ld), None
            (th, ld), _ = jax.lax.scan(body, (th, ld),
                                       jax.random.split(k, sweeps))
            return th

        mu, sg = many(jax.random.fold_in(key, 2), thetas, lds)
        path = "fused one-kernel-per-half (TPU)"
    else:
        sweep = make_sweep_halves(model, n)

        @jax.jit
        def many(k, th, ld):
            def body(c, kk):
                th, ld = c
                return sweep(kk, th, ld), None
            (th, ld), _ = jax.lax.scan(body, (th, ld),
                                       jax.random.split(k, sweeps))
            return jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b]), th[0], th[1])

        mu, sg = many(jax.random.fold_in(key, 2),
                      _halves(thetas, n // 2), _halves(lds, n // 2))
        path = "split make_sweep_halves (portable)"

    mu, sg = np.asarray(mu), np.asarray(sg)
    print(f"path: {path}")
    print(f"mu    = {mu.mean():.4f} +- {mu.std():.4f}   (truth 2.0)")
    print(f"sigma = {sg.mean():.4f} +- {sg.std():.4f}   (truth 0.04)")
    assert abs(mu.mean() - 2.0) < 0.05
    assert abs(sg.mean() - 0.04) < 0.01
    print("OK")


if __name__ == "__main__":
    main()
