"""Fixed-stencil convolution kernels (box, Gaussian, DoG, Laplacian, Sobel,
Gabor bank).

These replace the reference's cv2.blur / boxFilter / GaussianBlur / Laplacian
/ Sobel / filter2D calls (indices.py:444-482, 519-542, 760-776) with
``lax.conv_general_dilated`` stencils over explicit reflect-padded inputs, so
XLA tiles them onto the MXU/VPU and fuses the surrounding elementwise math.

Border conventions (matching OpenCV):
  * ``reflect101`` (cv2.BORDER_DEFAULT, "gfedcb|abcdefgh"): np.pad 'reflect'.
  * ``reflect``    (cv2.BORDER_REFLECT, "fedcba|abcdefgh"): np.pad 'symmetric'.
  * ``constant``   zero fill.

Separable kernels (box, Gaussian) run as two rank-1 convs.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PAD_MODE = {"reflect101": "reflect", "reflect": "symmetric",
             "constant": "constant", "edge": "edge"}


def pad2d(x: jnp.ndarray, pad_h: Tuple[int, int], pad_w: Tuple[int, int],
          border: str = "reflect101", value: float = 0.0) -> jnp.ndarray:
    """Pad the trailing two dims of ``x``."""
    cfg = [(0, 0)] * (x.ndim - 2) + [pad_h, pad_w]
    mode = _PAD_MODE[border]
    if mode == "constant":
        return jnp.pad(x, cfg, mode="constant", constant_values=value)
    return jnp.pad(x, cfg, mode=mode)


def conv2d_same(x: jnp.ndarray, kernel: np.ndarray,
                border: str = "reflect101") -> jnp.ndarray:
    """'Same' 2-D correlation of (..., H, W) with a static 2-D kernel.

    Matches cv2.filter2D semantics (correlation, anchor at kernel center).
    Even-sized kernels put the extra tap on the low side like OpenCV's
    anchor = (k-1)//2 ... actually cv2 uses anchor=k//2; we mirror that.
    """
    kh, kw = kernel.shape
    # cv2 anchor is at (kh//2, kw//2): pad (anchor) before, (k-1-anchor) after
    ah, aw = kh // 2, kw // 2
    xp = pad2d(x, (ah, kh - 1 - ah), (aw, kw - 1 - aw), border).astype(
        jnp.float32)
    h, w = x.shape[-2], x.shape[-1]
    kf = np.asarray(kernel, np.float32)
    terms = []
    if int((kf != 0).sum()) <= 32:
        # shift-and-add: single-channel spatial convs lower terribly on the
        # MXU (C=1 wastes the 128-wide contraction; HIGHEST costs 6x on
        # top — measured 70 ms vs <2 ms for a 3x3 Sobel over 8 scenes).
        # A static small stencil is a handful of fused VPU adds.
        for i in range(kh):
            for j in range(kw):
                wgt = float(kf[i, j])
                if wgt == 0.0:
                    continue
                tap = jax.lax.slice_in_dim(
                    jax.lax.slice_in_dim(xp, i, i + h, axis=xp.ndim - 2),
                    j, j + w, axis=xp.ndim - 1)
                terms.append(tap if wgt == 1.0 else tap * wgt)
        # pairwise tree sum (see _axis_shift_add)
        while len(terms) > 1:
            nxt = [terms[i] + terms[i + 1]
                   for i in range(0, len(terms) - 1, 2)]
            if len(terms) % 2:
                nxt.append(terms[-1])
            terms = nxt
        return terms[0]
    # dense kernels (e.g. the 15x15 Gabor bank) keep the conv lowering:
    # unrolling 225 slice-mul-adds would explode op count and drift
    lead = xp.shape[:-2]
    xin = xp.reshape((-1, 1) + xp.shape[-2:])
    k = jnp.asarray(kf).reshape(1, 1, kh, kw)
    out = jax.lax.conv_general_dilated(
        xin, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)
    return out.reshape(lead + out.shape[-2:])


def _axis_shift_add(x: jnp.ndarray, k: np.ndarray, axis: int,
                    border: str, out_len: int) -> jnp.ndarray:
    """1-D 'same' correlation along ``axis`` as a sum of shifted slices
    (fused VPU adds — see conv2d_same for why not conv_general_dilated)."""
    n = k.shape[0]
    a = n // 2
    pads = (a, n - 1 - a)
    if axis == x.ndim - 2:
        xp = pad2d(x, pads, (0, 0), border)
    else:
        xp = pad2d(x, (0, 0), pads, border)
    xp = xp.astype(jnp.float32)
    kf = np.asarray(k, np.float32)
    terms = []
    for i in range(n):
        wgt = float(kf[i])
        if wgt == 0.0:
            continue
        tap = jax.lax.slice_in_dim(xp, i, i + out_len, axis=axis)
        terms.append(tap if wgt == 1.0 else tap * wgt)
    # pairwise tree sum: sequential accumulation of 15+ taps drifts up to
    # 2 LSB from cv2's fixed-point result; the tree keeps it within 1
    while len(terms) > 1:
        nxt = [terms[i] + terms[i + 1] for i in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def _sep_conv(x: jnp.ndarray, kv: np.ndarray, kh: np.ndarray,
              border: str) -> jnp.ndarray:
    """Separable 'same' conv: column kernel ``kv`` then row kernel ``kh``."""
    out = _axis_shift_add(x, kv, x.ndim - 2, border, x.shape[-2])
    return _axis_shift_add(out, kh, x.ndim - 1, border, x.shape[-1])


def box_filter(x: jnp.ndarray, ksize: int, border: str = "reflect101",
               normalize: bool = True) -> jnp.ndarray:
    """Mean (or sum) filter. cv2.blur uses border reflect101; the reference's
    spatial-context boxFilter uses BORDER_REFLECT ('reflect' here ->
    pass border='reflect')."""
    k = np.ones(ksize, dtype=np.float64)
    if normalize:
        k /= ksize  # separable: (1/k)(1/k) == 1/k^2
    return _sep_conv(x, k, k, border)


_SMALL_GAUSSIAN_TAB = {
    1: np.array([1.0]),
    3: np.array([0.25, 0.5, 0.25]),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625]),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125]),
}


def gaussian_kernel1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """cv2.getGaussianKernel equivalent. For ksize<=7 with sigma<=0 OpenCV
    uses fixed binomial-style tables; otherwise sigma<=0 defaults to
    0.3*((ksize-1)*0.5 - 1) + 0.8."""
    if sigma <= 0 and ksize in _SMALL_GAUSSIAN_TAB:
        return _SMALL_GAUSSIAN_TAB[ksize].copy()
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def gaussian_blur(x: jnp.ndarray, ksize: int, sigma: float = 0.0,
                  border: str = "reflect101") -> jnp.ndarray:
    k = gaussian_kernel1d(ksize, sigma)
    return _sep_conv(x, k, k, border)


def gaussian_blur_u8(x_u8: jnp.ndarray, ksize: int, sigma: float = 0.0) -> jnp.ndarray:
    """GaussianBlur on uint8 with round-to-nearest output, matching cv2's
    uint8 path within 1 LSB (cv2 uses fixed-point arithmetic)."""
    out = gaussian_blur(x_u8.astype(jnp.float32), ksize, sigma)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


_LAPLACIAN_K = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=np.float32)
_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float32)
_SOBEL_Y = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=np.float32)


def laplacian(x: jnp.ndarray, border: str = "reflect101") -> jnp.ndarray:
    """cv2.Laplacian(ksize=1) equivalent."""
    return conv2d_same(x, _LAPLACIAN_K, border)


def sobel_xy(x: jnp.ndarray, border: str = "reflect101"
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cv2.Sobel(dx=1)/(dy=1) with ksize=3."""
    return conv2d_same(x, _SOBEL_X, border), conv2d_same(x, _SOBEL_Y, border)


def sobel_magnitude(x: jnp.ndarray, border: str = "reflect101") -> jnp.ndarray:
    gx, gy = sobel_xy(x, border)
    return jnp.sqrt(gx * gx + gy * gy)


def gabor_kernel(ksize: int, sigma: float, theta: float, lambd: float,
                 gamma: float, psi: float = 0.0) -> np.ndarray:
    """cv2.getGaborKernel equivalent (CV_32F)."""
    half = ksize // 2
    y, x = np.mgrid[-half:half + 1, -half:half + 1].astype(np.float64)
    x_t = x * math.cos(theta) + y * math.sin(theta)
    y_t = -x * math.sin(theta) + y * math.cos(theta)
    k = np.exp(-(x_t ** 2 + (gamma ** 2) * (y_t ** 2)) / (2.0 * sigma ** 2))
    k *= np.cos(2.0 * math.pi * x_t / lambd + psi)
    return k.astype(np.float32)


def gabor_bank_params(num_scales: int = 4, num_orientations: int = 6
                      ) -> List[Tuple[int, float, float, float, float]]:
    """The reference's Gabor bank parameterization (indices.py:365-388):
    scales = logspace(-1, 0.5, 4), thetas = arange(0, pi, pi/6),
    ksize = max(5, odd(int(5*scale))), sigma=scale, lambd=10*scale, gamma=0.5."""
    scales = np.logspace(-1, 0.5, num=num_scales)
    thetas = np.arange(0, np.pi, np.pi / num_orientations)
    params = []
    for s in scales:
        ks = int(5 * s)
        if ks % 2 == 0:
            ks += 1
        ks = max(ks, 5)
        for t in thetas:
            params.append((ks, float(s), float(t), float(10 * s), 0.5))
    return params


def gabor_responses(band_u8: jnp.ndarray, num_scales: int = 4,
                    num_orientations: int = 6) -> List[jnp.ndarray]:
    """24 Gabor filter responses, each min-max normalized to [0,1]
    (reference indices.py:346-399)."""
    x = band_u8.astype(jnp.float32)
    out = []
    for ks, sigma, theta, lambd, gamma in gabor_bank_params(
            num_scales, num_orientations):
        r = conv2d_same(x, gabor_kernel(ks, sigma, theta, lambd, gamma))
        r = (r - jnp.min(r)) / (jnp.max(r) - jnp.min(r) + 1e-10)
        out.append(r)
    return out
