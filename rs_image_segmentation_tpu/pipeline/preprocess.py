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
from rs_image_segmentation_tpu.core.types import GeoMeta, Raster
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


@functools.partial(jax.jit, static_argnames=("matrix",))
def preprocess_bands(bands: jnp.ndarray,
                     gains: jnp.ndarray, biases: jnp.ndarray,
                     matrix: Tuple[float, ...] = (1.0, 0.0, 0.0,
                                                  0.0, 1.0, 0.0)) -> jnp.ndarray:
    """calibrate -> affine warp -> per-band min-max stretch to uint8.

    The uint8 output is what stage 2 consumes (the reference persists it as
    Float32 GeoTIFF holding 0..255 values, preprocessing.py:127-155).
    """
    cal = bands.astype(jnp.float32) * gains[:, None, None] + biases[:, None, None]
    if tuple(matrix) != (1.0, 0.0, 0.0, 0.0, 1.0, 0.0):
        cal = warp_affine_bilinear(cal, np.asarray(matrix).reshape(2, 3))
    return jax.vmap(minmax_stretch_u8)(cal)


def run_preprocessing_stage(input_path: str, output_path: str,
                            vis_dir: Optional[str] = None,
                            config: CalibrationConfig = CalibrationConfig(),
                            gcp_matrix: Optional[Sequence[float]] = None
                            ) -> Raster:
    """Load -> preprocess on device -> persist Float32 GeoTIFF (+ optional
    false-color before/after PNG), matching the reference stage-1 contract."""
    arr, info = read_tiff(input_path)
    bands = jnp.asarray(arr)
    matrix = tuple(gcp_matrix) if gcp_matrix is not None else (
        1.0, 0.0, 0.0, 0.0, 1.0, 0.0)
    out = preprocess_bands(bands, jnp.asarray(config.gains, jnp.float32),
                           jnp.asarray(config.biases, jnp.float32),
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
