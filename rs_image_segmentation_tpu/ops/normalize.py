"""Percentile / stretch normalization kernels.

``robust_normalize`` is the workhorse called before every index/texture op
(reference indices.py:25-48): clip to [p_lo, p_hi] percentiles then scale to
[0, 1]. On device the percentile is an O(n log n) sort-based reduction —
a single top-k-free ``jnp.sort`` over the flattened band, which XLA lowers to
its parallel sort; the linear-interpolation quantile matches
``np.percentile``'s default method exactly.
"""

from __future__ import annotations

import jax.numpy as jnp


def percentile(x: jnp.ndarray, q) -> jnp.ndarray:
    """np.percentile(method='linear') equivalent over the flattened input.

    ``q`` may be a scalar or a vector of percentiles in [0, 100].
    """
    flat = jnp.ravel(x).astype(jnp.float32)
    srt = jnp.sort(flat)
    n = flat.shape[0]
    q = jnp.asarray(q, dtype=jnp.float32)
    pos = q / 100.0 * (n - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(jnp.float32)
    return srt[lo] * (1.0 - frac) + srt[hi] * frac


def robust_normalize(band: jnp.ndarray, lower_percentile: float = 2.0,
                     upper_percentile: float = 98.0,
                     epsilon: float = 1e-10) -> jnp.ndarray:
    """Percentile clip to [p_lo, p_hi] then scale to [0, 1]
    (reference indices.py:25-48)."""
    band = band.astype(jnp.float32)
    p = percentile(band, jnp.array([lower_percentile, upper_percentile],
                                   dtype=jnp.float32))
    min_val, max_val = p[0], p[1]
    clipped = jnp.clip(band, min_val, max_val)
    return (clipped - min_val) / (max_val - min_val + epsilon)


def minmax01(x: jnp.ndarray, epsilon: float = 1e-10) -> jnp.ndarray:
    """Min-max scale to [0, 1]."""
    x = x.astype(jnp.float32)
    mn = jnp.min(x)
    mx = jnp.max(x)
    return (x - mn) / (mx - mn + epsilon)


def minmax_stretch_u8(band: jnp.ndarray) -> jnp.ndarray:
    """Linear stretch to [0, 255] and truncate to uint8, matching the
    reference's enhancement (preprocessing.py:101-125: float scale then
    ``astype(np.uint8)``, i.e. truncation toward zero, no rounding)."""
    band = band.astype(jnp.float32)
    mn = jnp.min(band)
    mx = jnp.max(band)
    stretched = (band - mn) * 255.0 / (mx - mn)
    return stretched.astype(jnp.uint8)


def quantize_levels(band01: jnp.ndarray, levels: int) -> jnp.ndarray:
    """Scale a [0,1] band to ``levels`` gray levels with truncation, matching
    ``(band * (levels - 1)).astype(np.uint8)`` (reference indices.py:269)."""
    return (band01 * (levels - 1)).astype(jnp.uint8)
