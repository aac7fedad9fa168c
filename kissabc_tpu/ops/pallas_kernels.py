"""Pallas TPU kernels for the simulator hot path.

The throughput ceiling of ABC inference is the user simulator: on the
README Normal(mu, sigma) flagship model (reference README.md:70-84) each
cost call draws 1000 normals and reduces them — at 10^7 particle-updates/s
that is 10^10 normals/s, dominated by RNG. XLA's counter-based threefry
costs dozens of integer ops per draw; the TPU core's hardware PRNG
(pltpu.prng_random_bits) generates bits at near-VPU rate.

``normal_summary_cost`` fuses, per walker: hardware-PRNG bit generation ->
Box-Muller -> running mean/std -> cost, entirely in VMEM, one HBM write of
[n] costs. It is the Pallas counterpart of the vmapped

    cost((mu, sigma), key) = hypot(mean(x)-target_mu, (std(x)-target_sd)*w)

flagship cost, exposed through ``smc(..., cost_vectorized=True)``-style
batched costs.

CPU fallback: ``interpret=True`` path used automatically off-TPU so tests
exercise the same code path semantically.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_TWO_PI = np.float32(2.0 * math.pi)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=(
    "ndraws", "block", "chunk", "interpret", "target_mu", "target_sd",
    "sd_weight"))
def normal_summary_cost(mu, sigma, seed, *, ndraws: int = 1000,
                        target_mu: float = 2.0, target_sd: float = 0.04,
                        sd_weight: float = 50.0, block: int = 1024,
                        chunk: int = 512, interpret: bool = False):
    """Batched README-model cost via the TPU hardware PRNG.

    mu, sigma: [n] f32 walker parameters; seed: uint32 scalar.
    Returns costs [n]: hypot(mean(x) - target_mu, (std(x) - target_sd) *
    sd_weight) with x = mu + sigma * N(0,1)^ndraws per walker.

    Grid: one program per block of 1024 walkers (matching the XLA 1-D
    tile layout of the [n] output). Each program seeds the per-core PRNG
    with seed + program_id (independent streams per block) and loops over
    lane-chunks of the draw axis, accumulating z-moment sums in VMEM —
    peak live VMEM stays ~block*chunk floats regardless of ndraws. The
    walker statistics use z-moments (mean/E[z^2]) and apply mu/sigma at
    the end, so there is no catastrophic cancellation against mu.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = mu.shape[0]
    npad = -(-n // block) * block
    # bucket the padded size to the next power of two: bounds the set of
    # distinct kernel shapes (helps compile caches that key on the Mosaic
    # kernel; note the tunneled remote-compile service still recompiles
    # per enclosing XLA module, so first-call latency per new n remains)
    npad = 1 << (npad - 1).bit_length()
    npad = max(npad, block)
    npad = -(-npad // block) * block  # non-pow2 block sizes stay aligned
    nchunks = -(-ndraws // (2 * chunk))  # 2 normals per bit-chunk
    exp_one = np.uint32(0x3F800000)
    inv_n = np.float32(1.0 / ndraws)

    def kernel(seed_ref, mu_ref, sg_ref, out_ref):
        pid = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + pid)
        shape = (block, chunk)

        def body(j, carry):
            s1, s2 = carry
            # prng_random_bits yields int32 — bitcast to uint32 BEFORE the
            # shift or sign-extension corrupts the mantissa trick
            b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            # bits -> U(0,1): 23 mantissa bits via the [1,2) trick
            u1 = pltpu.bitcast((b1 >> 9) | exp_one, jnp.float32) - 1.0
            u2 = pltpu.bitcast((b2 >> 9) | exp_one, jnp.float32) - 1.0
            # Box-Muller, BOTH halves (exact, independent N(0,1) pair):
            # 2*chunk normals per chunk of bits/log/sqrt — the transform
            # cost per normal is halved vs the cos-only form
            r = jnp.sqrt(-2.0 * jnp.log1p(-u1))
            ang = _TWO_PI * u2
            za = r * jnp.cos(ang)
            zb = r * jnp.sin(ang)
            lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            ma = (2 * j * chunk + lane) < ndraws
            mb = ((2 * j + 1) * chunk + lane) < ndraws
            za = jnp.where(ma, za, 0.0)
            zb = jnp.where(mb, zb, 0.0)
            s1 = s1 + jnp.sum(za, axis=1, keepdims=True) \
                + jnp.sum(zb, axis=1, keepdims=True)
            s2 = s2 + jnp.sum(za * za, axis=1, keepdims=True) \
                + jnp.sum(zb * zb, axis=1, keepdims=True)
            return s1, s2

        zero = jnp.zeros((block, 1), jnp.float32)
        s1, s2 = jax.lax.fori_loop(0, nchunks, body, (zero, zero))
        mz = s1 * inv_n                      # mean of z
        vz = s2 * inv_n - mz * mz            # population var of z
        muv = mu_ref[:]                      # (block, 1)
        sgv = sg_ref[:]
        d1 = (muv + sgv * mz) - target_mu
        d2 = (sgv * jnp.sqrt(jnp.maximum(vz, 0.0)) - target_sd) * sd_weight
        out_ref[:] = jnp.sqrt(d1 * d1 + d2 * d2)

    # walkers on the sublane axis, [n, 1] operands: Mosaic-stable layout
    # regardless of the XLA layout chosen for the surrounding program
    mu_p = jnp.pad(mu, (0, npad - n)).reshape(npad, 1)
    sg_p = jnp.pad(sigma, (0, npad - n)).reshape(npad, 1)

    out = pl.pallas_call(
        kernel,
        grid=(npad // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, 1), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.uint32).reshape(1), mu_p, sg_p)
    return out[:n, 0]


def make_flagship_cost_batched(ndraws: int = 1000, target_mu: float = 2.0,
                               target_sd: float = 0.04,
                               sd_weight: float = 50.0, block: int = 1024):
    """Batched flagship cost: (thetas_tree, keys[n]) -> costs[n].

    Uses the Pallas hardware-PRNG kernel on TPU; off-TPU it falls back
    to the plain vmapped XLA threefry path (TPU interpret mode yields
    zero PRNG bits, useless for statistics). Batched costs take ONE key
    — the kernel derives its seed from it, the fallback splits it.
    """
    interpret = not _on_tpu()

    def batched(thetas, key):
        mu, sigma = thetas
        if interpret:
            def one(th, k):
                x = th[0] + th[1] * jax.random.normal(k, (ndraws,))
                d1 = jnp.mean(x) - target_mu
                d2 = (jnp.std(x) - target_sd) * sd_weight
                return jnp.hypot(d1, d2)
            return jax.vmap(one)((mu, sigma),
                                 jax.random.split(key, mu.shape[0]))
        seed = jax.random.bits(key, (), jnp.uint32)
        return normal_summary_cost(
            jnp.asarray(mu, jnp.float32), jnp.asarray(sigma, jnp.float32),
            seed, ndraws=ndraws, target_mu=target_mu, target_sd=target_sd,
            sd_weight=sd_weight, block=block)

    return batched
