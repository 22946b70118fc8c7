"""Pallas kernels vs their XLA/NumPy equivalents (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from rs_image_segmentation_tpu.ops.indices import spectral_indices
from rs_image_segmentation_tpu.ops.pallas_kernels import (
    fused_calibrate_stretch, fused_spectral_indices)

ORDER = ["ndvi", "evi", "msavi", "ndwi", "mndwi", "ndbi", "bsi"]


def test_fused_indices_matches_xla(rng):
    bands = jnp.asarray(rng.random((7, 60, 70)).astype(np.float32))
    ref = spectral_indices(bands)
    out = np.asarray(fused_spectral_indices(bands, interpret=True))
    assert out.shape == (7, 60, 70)
    for i, name in enumerate(ORDER):
        assert np.abs(np.asarray(ref[name]) - out[i]).max() < 5e-6, name


def test_fused_calibrate_stretch_matches_reference_math(rng):
    from rs_image_segmentation_tpu.core.config import CalibrationConfig
    cfg = CalibrationConfig()
    bands = rng.integers(0, 256, (7, 40, 50)).astype(np.float32)
    out = np.asarray(fused_calibrate_stretch(
        jnp.asarray(bands), np.asarray(cfg.gains),
        np.asarray(cfg.biases), interpret=True))
    for i in range(7):
        cal = cfg.gains[i] * bands[i] + cfg.biases[i]
        ref = (cal - cal.min()) * 255.0 / (cal.max() - cal.min())
        assert np.abs(ref - out[i]).max() < 1e-2, i
