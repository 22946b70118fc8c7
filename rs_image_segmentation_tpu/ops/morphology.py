"""Grayscale/binary morphology kernels.

Erode/dilate are min/max stencils. For full rectangular structuring elements
they lower to ``lax.reduce_window``; for sparse elements (OpenCV's ellipse
shapes) they unroll into a static stack of shifted-copy min/max ops that XLA
fuses into one VPU pass. Border semantics match OpenCV's morphology default:
out-of-image pixels never win the min/max (pad with +/- inf).

Replaces cv2.erode/dilate/morphologyEx at reference indices.py:401-442 and
extract.py:299-341.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def ellipse_element(ksize: int) -> Tuple[Tuple[int, int], ...]:
    """Offsets of OpenCV's MORPH_ELLIPSE structuring element of size
    ``ksize`` (cv2.getStructuringElement parity), relative to the anchor."""
    r = c = ksize // 2
    inv_r2 = 1.0 / (r * r) if r else 0.0
    offs = []
    for i in range(ksize):
        dy = i - r
        if abs(dy) <= r:
            dx = c * np.sqrt(max((r * r - dy * dy) * inv_r2, 0.0))
            j1 = max(int(round(c - dx)), 0)
            j2 = min(int(round(c + dx + 1)), ksize)
        else:
            j1 = j2 = 0
        for j in range(j1, j2):
            offs.append((dy, j - c))
    return tuple(offs)


@functools.lru_cache(maxsize=None)
def rect_element(ksize: int) -> Tuple[Tuple[int, int], ...]:
    h = ksize // 2
    return tuple((dy, dx) for dy in range(-h, ksize - h)
                 for dx in range(-h, ksize - h))


def _shift_reduce(x: jnp.ndarray, offsets, reduce_fn, pad_value) -> jnp.ndarray:
    """Reduce over a static set of (dy, dx) shifted copies."""
    h, w = x.shape[-2], x.shape[-1]
    max_dy = max(abs(dy) for dy, _ in offsets)
    max_dx = max(abs(dx) for _, dx in offsets)
    cfg = [(0, 0)] * (x.ndim - 2) + [(max_dy, max_dy), (max_dx, max_dx)]
    xp = jnp.pad(x, cfg, mode="constant", constant_values=pad_value)
    out = None
    for dy, dx in offsets:
        sl = xp[..., max_dy + dy: max_dy + dy + h, max_dx + dx: max_dx + dx + w]
        out = sl if out is None else reduce_fn(out, sl)
    return out


def erode(x: jnp.ndarray, ksize: int, shape: str = "rect") -> jnp.ndarray:
    """Min filter. ``shape``: 'rect' or 'ellipse'."""
    xf = x.astype(jnp.float32)
    offsets = rect_element(ksize) if shape == "rect" else ellipse_element(ksize)
    out = _shift_reduce(xf, offsets, jnp.minimum, jnp.inf)
    return out.astype(x.dtype)


def dilate(x: jnp.ndarray, ksize: int, shape: str = "rect") -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    offsets = rect_element(ksize) if shape == "rect" else ellipse_element(ksize)
    # OpenCV dilate reflects the SE about the anchor; our elements are
    # symmetric so the distinction is moot.
    out = _shift_reduce(xf, offsets, jnp.maximum, -jnp.inf)
    return out.astype(x.dtype)


def opening(x: jnp.ndarray, ksize: int, shape: str = "rect") -> jnp.ndarray:
    return dilate(erode(x, ksize, shape), ksize, shape)


def closing(x: jnp.ndarray, ksize: int, shape: str = "rect") -> jnp.ndarray:
    return erode(dilate(x, ksize, shape), ksize, shape)


def gradient(x: jnp.ndarray, ksize: int, shape: str = "rect") -> jnp.ndarray:
    """Morphological gradient: dilate - erode. For uint8 inputs the
    subtraction happens in a wide type then casts back (no wraparound)."""
    d = dilate(x, ksize, shape).astype(jnp.float32)
    e = erode(x, ksize, shape).astype(jnp.float32)
    return (d - e).astype(x.dtype)
