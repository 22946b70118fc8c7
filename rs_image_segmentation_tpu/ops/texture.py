"""Texture kernels: GLCM co-occurrence props, uniform LBP, windowed entropy.

These are the reference's hottest loops, redesigned for the TPU:

GLCM (reference indices.py:248-318 — an 841-iteration Python loop over
skimage.graycomatrix): all windows are processed in ONE batched contraction.
Each window's co-occurrence count matrix is ``C = A_onehot^T @ B_onehot``
where A/B are the (pairs, levels) one-hot encodings of the offset pixel
pairs — a (levels x pairs) @ (pairs x levels) matmul batched over windows and
offsets that lands directly on the MXU. Symmetrization, normalization and the
five props (contrast / dissimilarity / homogeneity / energy / correlation,
skimage formulas incl. the sigma==0 -> correlation=1 rule) are fused VPU
reductions over the (windows, levels, levels) stack.

LBP (reference indices.py:320-344, skimage.local_binary_pattern 'uniform'):
the 24 circular samples have *static* bilinear weights, so each sample is a
weighted sum of at most 4 shifted copies of the image; the uniform code is a
popcount + transition count — one fused elementwise pass.

Entropy (reference indices.py:544-560, skimage.filters.rank.entropy over a
disk): per-level counts via depthwise SAME convolutions of the one-hot level
planes with the disk footprint (chunked over levels to bound VMEM), then
-sum(p log2 p) with in-bounds normalization identical to skimage's masked
rank filter.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------- GLCM

def _offset_for_angle(distance: int, angle: float) -> Tuple[int, int]:
    """skimage.graycomatrix convention: (row, col) offset =
    (round(sin(a)*d), round(cos(a)*d))."""
    return (int(round(math.sin(angle) * distance)),
            int(round(math.cos(angle) * distance)))


def _extract_windows(q: jnp.ndarray, window: int, step: int) -> jnp.ndarray:
    """(H, W) -> (N, window, window) windows at stride ``step``."""
    h, w = q.shape
    n_i = (h - window) // step + 1
    n_j = (w - window) // step + 1
    if step == window:
        crop = q[: n_i * window, : n_j * window]
        win = crop.reshape(n_i, window, n_j, window).transpose(0, 2, 1, 3)
        return win.reshape(n_i * n_j, window, window)
    i_idx = (jnp.arange(n_i) * step)[:, None, None, None]
    j_idx = (jnp.arange(n_j) * step)[None, :, None, None]
    di = jnp.arange(window)[None, None, :, None]
    dj = jnp.arange(window)[None, None, None, :]
    win = q[i_idx + di, j_idx + dj]
    return win.reshape(n_i * n_j, window, window)


def glcm_matrices(windows: jnp.ndarray, levels: int,
                  distances: Sequence[int], angles: Sequence[float],
                  symmetric: bool = True, normed: bool = True) -> jnp.ndarray:
    """Co-occurrence matrices for a batch of quantized windows.

    windows: (N, ws, ws) int in [0, levels). Returns (N, D, A, levels, levels)
    float32, matching skimage.graycomatrix(symmetric, normed) per window.
    """
    n, ws, _ = windows.shape
    out = []
    for d in distances:
        per_angle = []
        for a in angles:
            dr, dc = _offset_for_angle(d, a)
            r0, r1 = max(0, -dr), min(ws, ws - dr)
            c0, c1 = max(0, -dc), min(ws, ws - dc)
            src = windows[:, r0:r1, c0:c1].reshape(n, -1)
            dst = windows[:, r0 + dr:r1 + dr, c0 + dc:c1 + dc].reshape(n, -1)
            lv = jnp.arange(levels, dtype=windows.dtype)
            # comparison-based one-hot (no gather); bf16 operands are exact
            # for 0/1 and the MXU accumulates in f32
            a_oh = (src[:, :, None] == lv[None, None, :]).astype(jnp.bfloat16)
            b_oh = (dst[:, :, None] == lv[None, None, :]).astype(jnp.bfloat16)
            cm = jnp.einsum("npa,npb->nab", a_oh, b_oh,
                            preferred_element_type=jnp.float32)
            per_angle.append(cm)
        out.append(jnp.stack(per_angle, axis=1))
    glcm = jnp.stack(out, axis=1)                # (N, D, A, L, L)
    if symmetric:
        glcm = glcm + jnp.swapaxes(glcm, -1, -2)
    if normed:
        s = jnp.sum(glcm, axis=(-1, -2), keepdims=True)
        glcm = glcm / jnp.where(s > 0, s, 1.0)
    return glcm


def glcm_properties(glcm: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """The five props over (..., L, L) normalized GLCMs — skimage.graycoprops
    formulas, vectorized over all leading axes."""
    levels = glcm.shape[-1]
    i = jnp.arange(levels, dtype=jnp.float32)[:, None]
    j = jnp.arange(levels, dtype=jnp.float32)[None, :]
    diff = i - j
    contrast = jnp.sum(glcm * diff ** 2, axis=(-1, -2))
    dissimilarity = jnp.sum(glcm * jnp.abs(diff), axis=(-1, -2))
    homogeneity = jnp.sum(glcm / (1.0 + diff ** 2), axis=(-1, -2))
    asm = jnp.sum(glcm * glcm, axis=(-1, -2))
    energy = jnp.sqrt(asm)
    mean_i = jnp.sum(glcm * i, axis=(-1, -2))
    mean_j = jnp.sum(glcm * j, axis=(-1, -2))
    var_i = jnp.sum(glcm * (i - mean_i[..., None, None]) ** 2, axis=(-1, -2))
    var_j = jnp.sum(glcm * (j - mean_j[..., None, None]) ** 2, axis=(-1, -2))
    std = jnp.sqrt(var_i * var_j)
    cov = jnp.sum(glcm * (i - mean_i[..., None, None])
                  * (j - mean_j[..., None, None]), axis=(-1, -2))
    correlation = jnp.where(std < 1e-15, 1.0,
                            cov / jnp.where(std < 1e-15, 1.0, std))
    return {"contrast": contrast, "dissimilarity": dissimilarity,
            "homogeneity": homogeneity, "energy": energy,
            "correlation": correlation}


def glcm_feature_maps(band01: jnp.ndarray, levels: int = 32,
                      window_size: int = 21, step_size: int = 21,
                      distances: Sequence[int] = (1,),
                      angles: Sequence[float] = (0.0, math.pi / 4,
                                                 math.pi / 2, 3 * math.pi / 4),
                      backend: str = "xla",
                      ) -> Dict[str, jnp.ndarray]:
    """Full GLCM stage on an already [0,1]-normalized band: quantize ->
    windowed co-occurrence -> props -> mean over angles -> bilinear resize
    back to the input resolution (reference indices.py:248-318).

    backend='xla' (default): batched one-hot contraction over all windows.
    backend='pallas': per-window VMEM kernel (ops.pallas_kernels), distances
    restricted to (1,) and step == window.
    """
    from rs_image_segmentation_tpu.ops.resize import resize_bilinear

    h, w = band01.shape
    q = (band01 * (levels - 1)).astype(jnp.uint8).astype(jnp.int32)
    n_i = (h - window_size) // step_size + 1
    n_j = (w - window_size) // step_size + 1
    names = ["contrast", "dissimilarity", "homogeneity", "energy",
             "correlation"]
    if backend == "pallas":
        from rs_image_segmentation_tpu.ops.pallas_kernels import (
            glcm_grid_pallas)
        if tuple(distances) != (1,):
            raise ValueError("pallas GLCM supports distance 1 only")
        offsets = tuple(_offset_for_angle(1, a) for a in angles)
        grids = glcm_grid_pallas(q, levels, window_size, step_size, offsets)
        return {name: resize_bilinear(grids[:, :, k], (h, w))
                for k, name in enumerate(names)}
    windows = _extract_windows(q, window_size, step_size)
    glcm = glcm_matrices(windows, levels, distances, angles)
    props = glcm_properties(glcm)
    out = {}
    for name, v in props.items():
        grid = jnp.mean(v, axis=(1, 2)).reshape(n_i, n_j)
        out[name] = resize_bilinear(grid, (h, w))
    return out


# ---------------------------------------------------------------------- LBP

@functools.lru_cache(maxsize=None)
def _lbp_sample_weights(n_points: int, radius: float):
    """Static bilinear taps for each circular sample point
    (skimage convention: rp = -R sin(2 pi i/P), cp = R cos(2 pi i/P),
    coordinates rounded to 5 decimals)."""
    taps = []  # per point: list of ((dy, dx), weight)
    for k in range(n_points):
        rp = round(-radius * math.sin(2 * math.pi * k / n_points), 5)
        cp = round(radius * math.cos(2 * math.pi * k / n_points), 5)
        r0, c0 = math.floor(rp), math.floor(cp)
        fr, fc = rp - r0, cp - c0
        pts = []
        for (dy, dx, wgt) in ((r0, c0, (1 - fr) * (1 - fc)),
                              (r0, c0 + 1, (1 - fr) * fc),
                              (r0 + 1, c0, fr * (1 - fc)),
                              (r0 + 1, c0 + 1, fr * fc)):
            if wgt > 0.0:
                pts.append(((dy, dx), wgt))
        taps.append(tuple(pts))
    return tuple(taps)


def lbp_uniform(band_u8: jnp.ndarray, n_points: int = 24,
                radius: float = 3.0) -> jnp.ndarray:
    """skimage.local_binary_pattern(method='uniform') equivalent.

    Returns float32 codes in [0, n_points + 1]: popcount of the circular
    sign pattern when it has <= 2 transitions (counted over the linear
    sequence, as skimage does), else n_points + 1. Out-of-image samples
    read as 0 (skimage mode 'C', cval 0).
    """
    x = band_u8.astype(jnp.float32)
    h, w = x.shape
    pad = int(math.ceil(radius)) + 1
    xp = jnp.pad(x, pad, mode="constant", constant_values=0.0)

    signs: List[jnp.ndarray] = []
    for taps in _lbp_sample_weights(n_points, radius):
        gp = None
        for (dy, dx), wgt in taps:
            sl = xp[pad + dy: pad + dy + h, pad + dx: pad + dx + w]
            term = sl * np.float32(wgt)
            gp = term if gp is None else gp + term
        signs.append((gp - x) >= 0.0)

    s = jnp.stack(signs, axis=0).astype(jnp.int32)      # (P, H, W)
    changes = jnp.sum(jnp.abs(s[1:] - s[:-1]) > 0, axis=0)
    popcount = jnp.sum(s, axis=0)
    code = jnp.where(changes <= 2, popcount, n_points + 1)
    return code.astype(jnp.float32)


def lbp_feature(band01: jnp.ndarray, n_points: int = 24,
                radius: float = 3.0) -> jnp.ndarray:
    """The reference's LBP feature (indices.py:320-344): scale to uint8,
    uniform LBP, divide by max code present."""
    u8 = (band01 * 255.0).astype(jnp.uint8)
    code = lbp_uniform(u8, n_points, radius)
    return code / jnp.max(code)


# ------------------------------------------------------------------- entropy

@functools.lru_cache(maxsize=None)
def disk_footprint(radius: int) -> np.ndarray:
    """skimage.morphology.disk equivalent."""
    y, x = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    return (x * x + y * y <= radius * radius).astype(np.float32)


def _disk_spans(radius: int):
    """Per-row contiguous spans (dy, half_width) of the disk footprint."""
    fp = disk_footprint(radius)
    spans = []
    for i in range(2 * radius + 1):
        row = np.nonzero(fp[i])[0]
        spans.append((i - radius, int(row.min()) - radius,
                      int(row.max()) - radius))
    return tuple(spans)


def _span_count(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Windowed sum over the disk footprint of (..., H, W), zero outside the
    image: one horizontal reduce_window-add per distinct span width plus a
    vertical shifted accumulate — cheap regardless of the level-axis size."""
    spans = _disk_spans(radius)
    widths = {}
    for dy, dx0, dx1 in spans:
        widths.setdefault((dx0, dx1), []).append(dy)
    h_axis, w_axis = x.ndim - 2, x.ndim - 1
    out = None

    def window_sum(v, window, lo, axis):
        dims = [1] * v.ndim
        dims[axis] = window
        pads = [(0, 0)] * v.ndim
        pads[axis] = (-lo, window - 1 + lo)
        return jax.lax.reduce_window(v, jnp.asarray(0, v.dtype), jax.lax.add,
                                     tuple(dims), (1,) * v.ndim, tuple(pads))

    for (dx0, dx1), dys in widths.items():
        row = window_sum(x, dx1 - dx0 + 1, dx0, w_axis)
        dys = sorted(dys)
        runs = [[dys[0], dys[0]]]
        for d in dys[1:]:
            if d == runs[-1][1] + 1:
                runs[-1][1] = d
            else:
                runs.append([d, d])
        for lo, hi in runs:
            v = window_sum(row, hi - lo + 1, lo, h_axis)
            out = v if out is None else out + v
    return out


def windowed_entropy_u8(band_u8: jnp.ndarray, radius: int,
                        levels: int = 256, chunk: int = 256) -> jnp.ndarray:
    """Local Shannon entropy (bits) over a disk footprint, normalizing by the
    number of in-bounds footprint pixels — skimage.filters.rank.entropy
    semantics.

    Per-level counts come from span-decomposed windowed sums over one-hot
    level planes in bfloat16 (counts <= disk area << 256 are exact in bf16's
    8-bit mantissa), ``chunk`` levels at a time.
    """
    h, w = band_u8.shape
    total = _span_count(jnp.ones((h, w), jnp.float32), radius)
    vals = band_u8.astype(jnp.int32)
    ent = jnp.zeros((h, w), jnp.float32)
    for lo in range(0, levels, chunk):
        c = min(chunk, levels - lo)
        onehot = (vals[None, :, :] ==
                  (lo + jnp.arange(c))[:, None, None]).astype(jnp.bfloat16)
        counts = _span_count(onehot, radius).astype(jnp.float32)
        p = counts / total[None]
        ent = ent - jnp.sum(jnp.where(p > 0,
                                      p * jnp.log2(jnp.where(p > 0, p, 1.0)),
                                      0.0), axis=0)
    return ent


def entropy_feature(band01: jnp.ndarray, radius: int) -> jnp.ndarray:
    """The reference's multi-scale entropy feature (indices.py:544-560):
    uint8 quantize, rank entropy over disk(radius), normalize by max."""
    u8 = (band01 * 255.0).astype(jnp.uint8)
    ent = windowed_entropy_u8(u8, radius)
    return ent / jnp.max(ent)
