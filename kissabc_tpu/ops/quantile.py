"""Masked/weighted quantiles and ESS — jit-safe building blocks.

The reference computes ``quantile(Xs[alive], alpha)`` with Julia's default
type-7 (linear interpolation) quantile (``src/smc.jl:134``) on a
dynamically-sized alive subset. On TPU the subset is a mask over a
static-shape array: we sort once with +inf fill for dead slots and
interpolate at the masked count — bit-identical to the reference's formula
for the same alive multiset.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_quantile(x, mask, q):
    """Type-7 quantile of x[mask] without dynamic shapes.

    x: [n] float array; mask: [n] bool; q: scalar in [0,1].
    Invalid (masked-out) entries are sorted to the end as +inf.
    """
    n = x.shape[0]
    xs = jnp.sort(jnp.where(mask, x, jnp.inf))
    m = jnp.sum(mask)  # number of valid entries (traced)
    # type-7: h = (m-1)*q; result = xs[floor(h)] + frac*(xs[floor(h)+1]-xs[floor(h)])
    h = (m - 1).astype(x.dtype) * q
    lo = jnp.floor(h).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, m - 1)
    lo = jnp.clip(lo, 0, n - 1)
    hi = jnp.clip(hi, 0, n - 1)
    frac = h - lo.astype(x.dtype)
    xlo = xs[lo]
    xhi = xs[hi]
    # if xlo is inf (all-dead or q beyond mass) propagate inf rather than nan
    out = jnp.where(jnp.isfinite(xlo), xlo + frac * (xhi - xlo), xlo)
    return out


def quantile(x, q):
    """Plain type-7 quantile over the full array (smc.jl:299 eps update)."""
    return masked_quantile(x, jnp.ones(x.shape, bool), q)


def ess_count(mask):
    """The reference's actual ESS: number of alive particles (smc.jl:142)."""
    return jnp.sum(mask)


def ess_weights(w):
    """Kish effective sample size sum(w)^2 / sum(w^2) — the documented
    intent (dead code at smc.jl:11-13), used by the sharded SMC variant."""
    s = jnp.sum(w)
    return s * s / jnp.sum(w * w)
