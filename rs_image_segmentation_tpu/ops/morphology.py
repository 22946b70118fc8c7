"""Grayscale/binary morphology kernels.

Erode/dilate are min/max stencils lowered to ``lax.reduce_window``:

  * rectangular elements are separable -> two 1-D reduce_windows;
  * OpenCV ellipse elements decompose into per-row contiguous spans -> one
    horizontal reduce_window per distinct span width plus a vertical
    min/max over shifted rows (3-6 ops instead of k^2 shifted copies).

Border semantics match OpenCV's morphology default: out-of-image pixels
never win the min/max (pad with +/- inf).

Replaces cv2.erode/dilate/morphologyEx at reference indices.py:401-442 and
extract.py:299-341.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

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
def _ellipse_spans(ksize: int) -> Tuple[Tuple[int, int, int], ...]:
    """Per-row contiguous spans (dy, dx0, dx1) of the ellipse element."""
    rows: Dict[int, List[int]] = {}
    for dy, dx in ellipse_element(ksize):
        rows.setdefault(dy, []).append(dx)
    return tuple((dy, min(dxs), max(dxs)) for dy, dxs in sorted(rows.items()))


def _reduce_window_1d(x: jnp.ndarray, window: int, lo: int, axis: int,
                      reduce_fn, init: float) -> jnp.ndarray:
    """Same-size 1-D reduce over ``axis``: output[i] = reduce(x[i+lo :
    i+lo+window]) with out-of-range treated as ``init``."""
    if window == 1 and lo == 0:
        return x
    dims = [1] * x.ndim
    dims[axis] = window
    pads = [(0, 0)] * x.ndim
    pads[axis] = (-lo, window - 1 + lo)
    return jax.lax.reduce_window(
        x, init, reduce_fn, tuple(dims), (1,) * x.ndim, tuple(pads))


def _morph(x: jnp.ndarray, ksize: int, shape: str, reduce_fn,
           init: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    h_axis, w_axis = x.ndim - 2, x.ndim - 1
    half = ksize // 2
    if shape == "rect":
        out = _reduce_window_1d(xf, ksize, -half, w_axis, reduce_fn, init)
        out = _reduce_window_1d(out, ksize, -half, h_axis, reduce_fn, init)
        return out.astype(x.dtype)
    # ellipse: one horizontal pass per distinct span width, then a vertical
    # combine of rows shifted by dy
    spans = _ellipse_spans(ksize)
    widths = {}
    for dy, dx0, dx1 in spans:
        widths.setdefault((dx0, dx1), []).append(dy)
    h = x.shape[h_axis]
    out = None
    for (dx0, dx1), dys in widths.items():
        row = _reduce_window_1d(xf, dx1 - dx0 + 1, dx0, w_axis, reduce_fn, init)
        # contiguous dy runs share a vertical reduce_window
        dys = sorted(dys)
        runs = [[dys[0], dys[0]]]
        for d in dys[1:]:
            if d == runs[-1][1] + 1:
                runs[-1][1] = d
            else:
                runs.append([d, d])
        for lo, hi in runs:
            v = _reduce_window_1d(row, hi - lo + 1, lo, h_axis, reduce_fn, init)
            out = v if out is None else reduce_fn(out, v)
    return out.astype(x.dtype)


def erode(x: jnp.ndarray, ksize: int, shape: str = "rect") -> jnp.ndarray:
    """Min filter. ``shape``: 'rect' or 'ellipse'."""
    return _morph(x, ksize, shape, jax.lax.min, jnp.inf)


def dilate(x: jnp.ndarray, ksize: int, shape: str = "rect") -> jnp.ndarray:
    # OpenCV dilate reflects the SE about the anchor; our elements are
    # symmetric so the distinction is moot.
    return _morph(x, ksize, shape, jax.lax.max, -jnp.inf)


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
