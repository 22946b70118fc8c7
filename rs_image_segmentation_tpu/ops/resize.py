"""Resize / warp kernels (cv2-parity bilinear + nearest, affine warp).

Replaces cv2.resize (reference indices.py:308, 3_classification.py:351,
extract.py:1002), skimage.transform.resize order=0 (4_evaluate.py:78-80) and
cv2.warpAffine (preprocessing.py:96).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def resize_bilinear(img: jnp.ndarray, out_shape: Tuple[int, int]) -> jnp.ndarray:
    """cv2.INTER_LINEAR-compatible resize of the trailing two dims:
    half-pixel centers, edge clamp."""
    h, w = img.shape[-2], img.shape[-1]
    oh, ow = out_shape
    sy, sx = h / oh, w / ow
    ry = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * sy - 0.5
    rx = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * sx - 0.5
    y0 = jnp.clip(jnp.floor(ry), 0, h - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(rx), 0, w - 1).astype(jnp.int32)
    fy = jnp.clip(ry - y0.astype(jnp.float32), 0.0, 1.0)
    fx = jnp.clip(rx - x0.astype(jnp.float32), 0.0, 1.0)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)

    a = img[..., y0, :][..., :, x0]
    b = img[..., y0, :][..., :, x1]
    c = img[..., y1, :][..., :, x0]
    d = img[..., y1, :][..., :, x1]
    fy = fy[:, None]
    fx = fx[None, :]
    top = a * (1 - fx) + b * fx
    bot = c * (1 - fx) + d * fx
    return top * (1 - fy) + bot * fy


def resize_nearest(img: jnp.ndarray, out_shape: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize with half-pixel centers (cv2.INTER_NEAREST /
    skimage order=0 anti_aliasing=False equivalence on integer maps)."""
    h, w = img.shape[-2], img.shape[-1]
    oh, ow = out_shape
    ry = jnp.minimum((jnp.arange(oh) * h) // oh, h - 1)
    rx = jnp.minimum((jnp.arange(ow) * w) // ow, w - 1)
    return img[..., ry, :][..., :, rx]


def estimate_affine_from_gcps(gcps) -> np.ndarray:
    """Least-squares 2x3 affine from ground control points.

    ``gcps`` is a sequence of ((src_x, src_y), (dst_x, dst_y)) pairs. The
    reference's geometric_correction accepts GCPs but ignores them
    (preprocessing.py:76-99, 'simplified'); this completes the machinery:
    the returned matrix maps src -> dst and plugs into
    :func:`warp_affine_bilinear`.
    """
    gcps = list(gcps)
    if len(gcps) < 3:
        raise ValueError("at least 3 GCPs are required for an affine fit")
    a = np.zeros((2 * len(gcps), 6), np.float64)
    b = np.zeros(2 * len(gcps), np.float64)
    for i, ((sx, sy), (dx, dy)) in enumerate(gcps):
        a[2 * i] = [sx, sy, 1.0, 0.0, 0.0, 0.0]
        a[2 * i + 1] = [0.0, 0.0, 0.0, sx, sy, 1.0]
        b[2 * i] = dx
        b[2 * i + 1] = dy
    coef, *_ = np.linalg.lstsq(a, b, rcond=None)
    return coef.reshape(2, 3)


def warp_affine_bilinear(img: jnp.ndarray, matrix, out_shape=None,
                         border_value: float = 0.0) -> jnp.ndarray:
    """cv2.warpAffine(INTER_LINEAR, BORDER_CONSTANT) equivalent for a
    *static* 2x3 forward matrix: dst(x, y) = src(M^-1 (x, y, 1)).

    The reference's geometric_correction (preprocessing.py:76-99) calls this
    with the identity matrix; arbitrary affines are supported.
    """
    m = np.asarray(matrix, dtype=np.float64).reshape(2, 3)
    full = np.vstack([m, [0.0, 0.0, 1.0]])
    inv = np.linalg.inv(full)
    h, w = img.shape[-2], img.shape[-1]
    oh, ow = out_shape if out_shape is not None else (h, w)
    ys, xs = jnp.meshgrid(jnp.arange(oh, dtype=jnp.float32),
                          jnp.arange(ow, dtype=jnp.float32), indexing="ij")
    src_x = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    src_y = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    fx = src_x - x0
    fy = src_y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def sample(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        v = img[..., yc, xc]
        return jnp.where(inb, v, border_value)

    a = sample(y0i, x0i)
    b = sample(y0i, x0i + 1)
    c = sample(y0i + 1, x0i)
    d = sample(y0i + 1, x0i + 1)
    top = a * (1 - fx) + b * fx
    bot = c * (1 - fx) + d * fx
    return (top * (1 - fy) + bot * fy).astype(img.dtype)
