"""GLCM / LBP / entropy kernels vs pure-NumPy float64 oracles."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from rs_image_segmentation_tpu.ops import texture as TX
from rs_image_segmentation_tpu.ops.resize import (
    resize_bilinear, resize_nearest, warp_affine_bilinear)

from tests import oracles

ANGLES = (0.0, math.pi / 4, math.pi / 2, 3 * math.pi / 4)


def test_glcm_matrices_match_oracle(rng):
    levels = 8
    wins = rng.integers(0, levels, (5, 9, 9)).astype(np.int32)
    ours = np.asarray(TX.glcm_matrices(jnp.asarray(wins), levels, (1,), ANGLES))
    for n in range(5):
        ref = oracles.graycomatrix(wins[n], [1], list(ANGLES), levels)
        # oracle layout (L, L, D, A) -> ours (N, D, A, L, L)
        ref_t = ref.transpose(2, 3, 0, 1)
        assert np.abs(ref_t - ours[n]).max() < 1e-6


def test_glcm_props_match_oracle(rng):
    levels = 8
    wins = rng.integers(0, levels, (4, 9, 9)).astype(np.int32)
    glcm = TX.glcm_matrices(jnp.asarray(wins), levels, (1,), ANGLES)
    props = {k: np.asarray(v) for k, v in TX.glcm_properties(glcm).items()}
    for n in range(4):
        ref_p = oracles.graycomatrix(wins[n], [1], list(ANGLES), levels)
        for name in ["contrast", "dissimilarity", "homogeneity", "energy",
                     "correlation"]:
            ref = oracles.graycoprops(ref_p, name)  # (D, A)
            assert np.abs(ref - props[name][n]).max() < 1e-4, name


def test_glcm_correlation_constant_window():
    wins = jnp.full((1, 5, 5), 3, dtype=jnp.int32)
    glcm = TX.glcm_matrices(wins, 8, (1,), ANGLES)
    props = TX.glcm_properties(glcm)
    assert float(props["correlation"][0].min()) == 1.0


def test_glcm_feature_maps_shapes(rng):
    band = jnp.asarray(rng.random((64, 64)).astype(np.float32))
    maps = TX.glcm_feature_maps(band, levels=8, window_size=16, step_size=16)
    assert set(maps) == {"contrast", "dissimilarity", "homogeneity",
                         "energy", "correlation"}
    for v in maps.values():
        assert v.shape == (64, 64)


def test_lbp_matches_oracle(rng):
    img = rng.integers(0, 256, (24, 26), dtype=np.uint8)
    ref = oracles.local_binary_pattern_uniform(img, 8, 1.0)
    ours = np.asarray(TX.lbp_uniform(jnp.asarray(img), 8, 1.0))
    mismatch = np.mean(ref != ours)
    assert mismatch < 0.01, f"LBP mismatch rate {mismatch}"


def test_lbp_24_3_matches_oracle(rng):
    img = rng.integers(0, 256, (16, 17), dtype=np.uint8)
    ref = oracles.local_binary_pattern_uniform(img, 24, 3.0)
    ours = np.asarray(TX.lbp_uniform(jnp.asarray(img), 24, 3.0))
    mismatch = np.mean(ref != ours)
    assert mismatch < 0.02, f"LBP mismatch rate {mismatch}"


@pytest.mark.parametrize("radius", [1, 3, 5])
def test_entropy_matches_oracle(rng, radius):
    img = rng.integers(0, 40, (20, 22), dtype=np.uint8)
    ref = oracles.rank_entropy(img, radius)
    ours = np.asarray(TX.windowed_entropy_u8(jnp.asarray(img), radius))
    assert np.abs(ref - ours).max() < 1e-3


# --- resize / warp -----------------------------------------------------------

def test_resize_bilinear_matches_cv2(rng):
    import cv2
    img = rng.random((29, 28)).astype(np.float32)
    ref = cv2.resize(img, (600, 600), interpolation=cv2.INTER_LINEAR)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), (600, 600)))
    assert np.abs(ref - ours).max() < 1e-5


def test_resize_bilinear_downscale_matches_cv2(rng):
    import cv2
    img = rng.random((64, 80)).astype(np.float32)
    ref = cv2.resize(img, (31, 17), interpolation=cv2.INTER_LINEAR)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), (17, 31)))
    assert np.abs(ref - ours).max() < 1e-5


def test_resize_nearest_matches_skimage_order0(rng):
    # skimage.transform.resize(order=0) maps output centers to input via
    # scale; for integer upscales this equals index // scale.
    img = rng.integers(0, 5, (30, 30)).astype(np.int16)
    ours = np.asarray(resize_nearest(jnp.asarray(img), (60, 60)))
    assert np.array_equal(ours, np.repeat(np.repeat(img, 2, 0), 2, 1))


def test_warp_affine_identity(rng):
    import cv2
    img = rng.random((40, 45)).astype(np.float32)
    m = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    ref = cv2.warpAffine(img, m, (45, 40))
    ours = np.asarray(warp_affine_bilinear(jnp.asarray(img), m))
    assert np.abs(ref - ours).max() < 1e-6


def test_warp_affine_shift_scale(rng):
    import cv2
    img = rng.random((40, 45)).astype(np.float32)
    m = np.array([[0.9, 0.1, 3.0], [-0.05, 1.1, -2.0]], np.float32)
    ref = cv2.warpAffine(img, m, (45, 40))
    ours = np.asarray(warp_affine_bilinear(jnp.asarray(img), m))
    # borders may differ by interpolation tie handling; compare interior
    err = np.abs(ref - ours)
    assert np.median(err) < 1e-6
    assert (err < 1e-4).mean() > 0.98


def test_glcm_overlapping_windows(rng):
    """step_size != window_size exercises the gather-based window extraction."""
    band = jnp.asarray(rng.random((40, 40)).astype(np.float32))
    maps = TX.glcm_feature_maps(band, levels=8, window_size=16, step_size=8)
    assert maps["contrast"].shape == (40, 40)
    w16 = TX._extract_windows(jnp.arange(1600).reshape(40, 40), 16, 8)
    assert w16.shape == (16, 16, 16)
    assert int(w16[1, 0, 0]) == 8  # second window starts at col 8
    assert int(w16[4, 0, 0]) == 8 * 40  # second row of windows starts at row 8


def test_estimate_affine_from_gcps():
    # own rng: the shared session fixture makes the noise draw (and thus
    # the 0.05 recovery tolerance) depend on test execution order
    rng = np.random.default_rng(1234)
    from rs_image_segmentation_tpu.ops.resize import estimate_affine_from_gcps
    true = np.array([[0.95, 0.05, 3.0], [-0.02, 1.03, -1.5]])
    src = rng.uniform(0, 100, (12, 2))
    dst = (true[:, :2] @ src.T).T + true[:, 2]
    m = estimate_affine_from_gcps(list(zip(src, dst)))
    assert np.abs(m - true).max() < 1e-9
    # with noise, least squares still recovers closely
    dst_n = dst + rng.normal(0, 0.05, dst.shape)
    m2 = estimate_affine_from_gcps(list(zip(src, dst_n)))
    assert np.abs(m2 - true).max() < 0.05
