"""Thresholding kernels, including on-device Otsu.

Replaces reference extract.py:344-395 (cv2.threshold + THRESH_OTSU with the
min-max rescale-to-uint8 round trip and median fallback).
"""

from __future__ import annotations

import jax.numpy as jnp

from rs_image_segmentation_tpu.ops.normalize import percentile


def histogram256(x_u8: jnp.ndarray) -> jnp.ndarray:
    """256-bin histogram of a uint8 image (scatter-add; XLA lowers it to a
    sort+segment-reduce on TPU without materializing a one-hot)."""
    flat = x_u8.reshape(-1).astype(jnp.int32)
    return jnp.zeros(256, jnp.float32).at[flat].add(1.0)


def otsu_threshold_u8(x_u8: jnp.ndarray) -> jnp.ndarray:
    """Otsu threshold over a uint8 image, cv2-compatible.

    cv2 maximizes between-class variance and, like this implementation,
    returns the *last* argmax bin on plateaus via its midpoint averaging;
    we return the first maximizing bin — identical on real imagery and
    within 1 bin on pathological plateaus. Pixels classified foreground
    are those with value > threshold.
    """
    hist = histogram256(x_u8)
    total = jnp.sum(hist)
    bins = jnp.arange(256, dtype=jnp.float32)
    w0 = jnp.cumsum(hist)  # count <= t
    sum0 = jnp.cumsum(hist * bins)
    sum_total = sum0[-1]
    w1 = total - w0
    mu0 = jnp.where(w0 > 0, sum0 / jnp.where(w0 > 0, w0, 1.0), 0.0)
    mu1 = jnp.where(w1 > 0, (sum_total - sum0) / jnp.where(w1 > 0, w1, 1.0), 0.0)
    between = w0 * w1 * (mu0 - mu1) ** 2
    valid = (w0 > 0) & (w1 > 0)
    between = jnp.where(valid, between, -1.0)
    return jnp.argmax(between).astype(jnp.float32)


def threshold_binary(x: jnp.ndarray, threshold, above: bool = True) -> jnp.ndarray:
    """Simple comparison mask as uint8, NaNs treated as 0 first
    (reference extract.py:355-395)."""
    x = jnp.nan_to_num(x, nan=0.0)
    mask = (x > threshold) if above else (x < threshold)
    return mask.astype(jnp.uint8)


def threshold_otsu(x: jnp.ndarray, above: bool = True) -> jnp.ndarray:
    """Otsu segmentation of a float image via the reference's min-max
    rescale-to-uint8 protocol (extract.py:363-383). Returns a {0,1} uint8
    mask; degenerate (constant) images yield all-0 for ``above`` else all-1.
    """
    x = jnp.nan_to_num(x, nan=0.0)
    mn = jnp.min(x)
    mx = jnp.max(x)
    degenerate = mx == mn
    scale = jnp.where(degenerate, 1.0, mx - mn + 1e-10)
    norm = jnp.clip((x - mn) / scale * 255.0, 0, 255).astype(jnp.uint8)
    t = otsu_threshold_u8(norm)
    mask = (norm.astype(jnp.float32) > t).astype(jnp.uint8)
    mask = jnp.where(degenerate, jnp.zeros_like(mask), mask)
    if not above:
        mask = (1 - mask).astype(jnp.uint8)
    return mask


def median(x: jnp.ndarray) -> jnp.ndarray:
    """Median of the flattened input (the reference's Otsu-failure fallback,
    extract.py:387-395)."""
    return percentile(x, 50.0)
