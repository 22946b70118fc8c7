"""Stage 1 — preprocessing: radiometric calibration, geometric correction,
linear-stretch enhancement.

Reference: scripts/1_preprocessing.py:25-93 + modules/features/preprocessing.py.
The three steps fuse into a single jitted device pass over the (C, H, W)
stack; the affine warp accepts arbitrary 2x3 matrices (the reference stubs it
with the identity at 1_preprocessing.py:52).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rs_image_segmentation_tpu.core.config import CalibrationConfig
from rs_image_segmentation_tpu.core.types import Raster
from rs_image_segmentation_tpu.io.tiff import read_tiff, write_tiff
from rs_image_segmentation_tpu.ops.normalize import minmax_stretch_u8
from rs_image_segmentation_tpu.ops.resize import warp_affine_bilinear


def radiometric_calibration(bands: jnp.ndarray,
                            gains: Sequence[float],
                            biases: Sequence[float]) -> jnp.ndarray:
    """DN -> radiance, per-band FMA (reference preprocessing.py:54-74)."""
    g = jnp.asarray(gains, jnp.float32)[:, None, None]
    b = jnp.asarray(biases, jnp.float32)[:, None, None]
    return bands.astype(jnp.float32) * g + b


_IDENTITY = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0)


@functools.partial(jax.jit, static_argnames=("matrix",))
def preprocess_bands_f32(bands: jnp.ndarray,
                         gains: jnp.ndarray, biases: jnp.ndarray,
                         matrix: Tuple[float, ...] = _IDENTITY) -> jnp.ndarray:
    """Pure-device float32 preprocess (general path, works under trace and
    with non-identity warps; truncation boundaries may differ from float64
    by 1 LSB on ~10 % of pixels)."""
    cal = bands.astype(jnp.float32) * gains[:, None, None] + biases[:, None, None]
    if tuple(matrix) != _IDENTITY:
        cal = warp_affine_bilinear(cal, np.asarray(matrix).reshape(2, 3))
    return jax.vmap(minmax_stretch_u8)(cal)


@jax.jit
def _apply_lut(bands_u8: jnp.ndarray, lut: jnp.ndarray) -> jnp.ndarray:
    """Per-band 256-entry table lookup: out[c, y, x] = lut[c, bands[c, y, x]]."""
    idx = bands_u8.astype(jnp.int32)
    return jnp.take_along_axis(lut[:, :, None],
                               idx.reshape(idx.shape[0], -1)[:, :, None],
                               axis=1).reshape(idx.shape).astype(jnp.uint8)


def calibrated_value_table(gains, biases) -> np.ndarray:
    """(C, 256) float32 table of f64-computed calibrated values per DN —
    scene-independent, so a streaming pipeline computes it once."""
    g = np.asarray(gains, np.float64)[:, None]
    b = np.asarray(biases, np.float64)[:, None]
    dn = np.arange(256, dtype=np.float64)[None, :]
    return (g * dn + b).astype(np.float32)


def build_stretch_lut(arr_u8: np.ndarray, gains, biases) -> np.ndarray:
    """Exact (C, 256) f64 calibrate+stretch LUT for a uint8 scene.

    Calibration is monotone increasing per band (all gains positive), so
    the present-value min/max is just the band's min/max DN — ~0.3 ms of
    host work per 0.36 MP scene, cheap enough to overlap with the device
    compute of the previous scene in a streaming pipeline."""
    g = np.asarray(gains, np.float64)
    b = np.asarray(biases, np.float64)
    c = arr_u8.shape[0]
    dn = np.arange(256, dtype=np.float64)
    lut = np.zeros((c, 256), np.float32)
    for i in range(c):
        cal = g[i] * dn + b[i]
        ends = (cal[int(arr_u8[i].min())], cal[int(arr_u8[i].max())])
        mn, mx = min(ends), max(ends)  # handles negative gains too
        lut[i] = ((cal - mn) * 255.0 / (mx - mn)).astype(np.uint8)
    return lut


STRETCH_FIXUPS = 6      # per-band fixup slots in the fixed-point params
_STRETCH_SHIFT = 16


def build_stretch_params(arr_u8: np.ndarray, gains, biases):
    """``(lut, params)``: the exact stretch LUT plus per-band int32
    fixed-point routing for the mixed Pallas preamble kernel.

    ``params`` is ``(C, 3 + 2*STRETCH_FIXUPS)`` int32 — per band
    ``[mode, A32, B32, fix_dn*K, fix_delta*K]``. ``mode=1`` means
    ``clip((A32*dn + B32) >> 16, 0, 255) + fixups == lut[dn]`` for EVERY
    DN present in the band (verified here over the band's [min, max] DN
    range) — the in-kernel table lookup becomes ~6 integer ops instead
    of a 16x16 bilinear one-hot dot (measured ~6x on the preamble).
    ``mode=0`` keeps the bilinear table path for that band — bands whose
    f64 LUT cannot be reproduced within the fixup budget: full-range
    bands have stretch slope exactly 1.0 and the f64 rounding pattern is
    an irregular v/v-1 staircase (the bundled scene's bands 4/6), and
    near-constant bands overflow the fixed point. Unused fixup slots
    hold DN -1 (never matches).

    Like the LUT itself, params are only valid for THIS scene's DN range
    (the turbo contract already requires the lut be built from the
    scene)."""
    lut = build_stretch_lut(arr_u8, gains, biases)
    g = np.asarray(gains, np.float64)
    b = np.asarray(biases, np.float64)
    c = arr_u8.shape[0]
    k = STRETCH_FIXUPS
    params = np.full((c, 3 + 2 * k), -1, np.int32)
    params[:, 0] = 0
    for i in range(c):
        vmin = int(arr_u8[i].min())
        vmax = int(arr_u8[i].max())
        cal_lo = g[i] * vmin + b[i]
        cal_hi = g[i] * vmax + b[i]
        mn, mx = min(cal_lo, cal_hi), max(cal_lo, cal_hi)
        if mx <= mn:
            continue                                    # mode 0
        a = 255.0 * g[i] / (mx - mn)
        off = (b[i] - mn) * 255.0 / (mx - mn)
        a32 = int(round(a * (1 << _STRETCH_SHIFT)))
        if abs(a32) > (1 << 23):     # A32 * 255 must stay in int32
            continue                                    # mode 0
        v = np.arange(vmin, vmax + 1, dtype=np.int64)
        want = lut[i, vmin:vmax + 1].astype(np.int64)
        best = None
        for db in range(-2, 3):
            b32 = int(round(off * (1 << _STRETCH_SHIFT))) + db
            cand = np.clip((a32 * v + b32) >> _STRETCH_SHIFT, 0, 255)
            bad = np.flatnonzero(cand != want)
            if best is None or len(bad) < len(best[1]):
                best = (b32, bad, cand)
        b32, bad, cand = best
        if len(bad) > k:
            continue                                    # mode 0
        params[i, 0] = 1
        params[i, 1] = a32
        params[i, 2] = b32
        for s, j in enumerate(bad):
            params[i, 3 + s] = int(v[j])
            params[i, 3 + k + s] = int(want[j] - cand[j])
    return lut, params


def build_stretch_stats(arr_u8: np.ndarray, gains, biases):
    """``(lut, params, hist_stretched)``: :func:`build_stretch_params`
    plus the EXACT (C, 256) int32 histogram of the stretched scene,
    computed on host as the raw-DN bincount pushed through the LUT
    (hist_stretched[v] = sum of hist_raw over {dn : lut[dn] == v} —
    identical to histogramming the stretched image, since the LUT is a
    per-DN function).

    Precomputing this lets the device preamble skip histogram
    accumulation entirely (ops.pallas_kernels.lut_hist_pallas
    ``skip_hist``): the ~1 ms/scene of host bincount overlaps device
    compute in the streaming protocol, while the device program drops
    the one-hot joint-count planes for every arithmetic-routed band —
    measured 19.5 -> 17.0 ms on the 8-scene turbo batch."""
    from rs_image_segmentation_tpu.io import native as _native

    lut, params = build_stretch_params(arr_u8, gains, biases)
    c = arr_u8.shape[0]
    hist = np.zeros((c, 256), np.int64)
    for i in range(c):
        hist_raw = _native.hist_u8(arr_u8[i])
        if hist_raw is None:
            hist_raw = np.bincount(arr_u8[i].reshape(-1), minlength=256)
        np.add.at(hist[i], lut[i].astype(np.int64), hist_raw)
    return lut, params, hist.astype(np.int32)


@jax.jit
def preprocess_bands_device_lut(bands_u8: jnp.ndarray,
                                calv: jnp.ndarray) -> jnp.ndarray:
    """LUT preprocess with ZERO per-scene host work: per-band DN histogram
    (scatter-add), present-DN min/max of the calibrated-value table,
    stretch LUT, gather — one fused device program.

    NOT bit-faithful to the f64 host path (``preprocess_bands``): the
    stretch maps present DNs to near-exact integers, so f32 truncation
    lands one level below f64 on boundary DNs — 8.3 % of pixels on the
    bundled scene differ by exactly 1/255. Use ``build_stretch_lut`` (host,
    ~0.3 ms/scene) when bit parity with the reference matters."""
    c = bands_u8.shape[0]
    flat = bands_u8.reshape(c, -1).astype(jnp.int32)
    hist = jax.vmap(
        lambda b: jnp.zeros((256,), jnp.int32).at[b].add(1))(flat)
    present = hist > 0
    mn = jnp.min(jnp.where(present, calv, jnp.inf), axis=1, keepdims=True)
    mx = jnp.max(jnp.where(present, calv, -jnp.inf), axis=1, keepdims=True)
    # non-present DNs below mn go negative; they are never gathered (the
    # host f64 path truncates the same way, preprocess_bands below)
    lut = ((calv - mn) * 255.0 / (mx - mn)).astype(jnp.uint8)
    return _apply_lut(bands_u8, lut)


def preprocess_bands(bands, gains, biases,
                     matrix: Tuple[float, ...] = _IDENTITY):
    """calibrate -> affine warp -> per-band min-max stretch to uint8.

    The uint8 output is what stage 2 consumes (the reference persists it as
    Float32 GeoTIFF holding 0..255 values, preprocessing.py:127-155).

    For the identity warp on concrete uint8 input (the reference's only live
    path, 1_preprocessing.py:52) the whole chain is a per-DN lookup table
    computed in float64 on host — BIT-EXACT with the reference's NumPy math
    and identical across CPU/TPU. Traced inputs or real warps fall back to
    the float32 device path.
    """
    if (tuple(matrix) != _IDENTITY
            or isinstance(bands, jax.core.Tracer)
            or np.asarray(bands).dtype != np.uint8):
        return preprocess_bands_f32(bands, gains, biases, matrix)
    arr = np.asarray(bands)
    lut = build_stretch_lut(arr, gains, biases)
    return _apply_lut(jnp.asarray(arr), jnp.asarray(lut))


def run_preprocessing_stage(input_path: str, output_path: str,
                            vis_dir: Optional[str] = None,
                            config: CalibrationConfig = CalibrationConfig(),
                            gcp_matrix: Optional[Sequence[float]] = None,
                            gcps=None) -> Raster:
    """Load -> preprocess on device -> persist Float32 GeoTIFF (+ optional
    false-color before/after PNG), matching the reference stage-1 contract.

    ``gcps``: optional ((src_x, src_y), (dst_x, dst_y)) pairs; when given,
    the affine warp is least-squares-fit from them (the reference accepts
    GCPs but ignores them — preprocessing.py:76-99)."""
    from rs_image_segmentation_tpu.ops.resize import estimate_affine_from_gcps
    arr, info = read_tiff(input_path)
    bands = jnp.asarray(arr)
    if gcps is not None:
        matrix = tuple(estimate_affine_from_gcps(gcps).reshape(-1))
    elif gcp_matrix is not None:
        matrix = tuple(gcp_matrix)
    else:
        matrix = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0)
    out = preprocess_bands(bands, np.asarray(config.gains),
                           np.asarray(config.biases),
                           matrix=matrix)
    out_np = np.asarray(out)

    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    write_tiff(output_path, out_np.astype(np.float32), info.meta)

    if vis_dir:
        os.makedirs(vis_dir, exist_ok=True)
        _false_color_comparison(arr, out_np,
                                os.path.join(vis_dir, "preprocessing_result.png"))
    return Raster(out_np, info.meta)


def _false_color_comparison(before: np.ndarray, after: np.ndarray,
                            path: str) -> None:
    """4-3-2 false-color before/after side-by-side
    (reference 1_preprocessing.py:61-82)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    def composite(stack):
        rgb = np.stack([stack[3], stack[2], stack[1]], axis=-1).astype(np.float32)
        mx = rgb.max() or 1.0
        return rgb / mx

    fig, axes = plt.subplots(1, 2, figsize=(12, 6))
    axes[0].imshow(composite(before))
    axes[0].set_title("Before preprocessing (4-3-2)")
    axes[0].axis("off")
    axes[1].imshow(composite(after))
    axes[1].set_title("After preprocessing (4-3-2)")
    axes[1].axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
