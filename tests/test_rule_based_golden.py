"""Rule-based classification: full-chain parity against a cv2/scipy oracle
composed exactly like the reference (extract.py:397-505 +
3_classification.py:335-375)."""

import cv2
import jax.numpy as jnp
import numpy as np
import scipy.ndimage as ndi

from rs_image_segmentation_tpu.core.config import RuleBasedConfig
from rs_image_segmentation_tpu.pipeline.classify import rule_based_classify


def _oracle_post(mask, min_area, k):
    kern = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
    out = cv2.morphologyEx(mask.astype(np.uint8), cv2.MORPH_CLOSE, kern)
    lab, n = ndi.label(out, structure=np.ones((3, 3)))
    if n:
        area = np.bincount(lab.ravel())
        rm = np.where((area < min_area) & (area > 0))[0]
        if rm.size:
            out[np.isin(lab, rm)] = 0
    return cv2.morphologyEx(out, cv2.MORPH_OPEN, kern)


def _oracle_rule_based(ndvi, ndwi, mndwi, ndbi, cfg: RuleBasedConfig):
    h, w = ndvi.shape
    area = h * w
    veg = _oracle_post((np.nan_to_num(ndvi) > cfg.ndvi_threshold),
                       int(area * cfg.veg_min_area_frac), 3)
    water = _oracle_post((np.nan_to_num(mndwi) > cfg.mndwi_threshold),
                         int(area * cfg.water_min_area_frac), 3)
    built = ((np.nan_to_num(ndbi) > cfg.ndbi_threshold)
             & (np.nan_to_num(ndvi) < cfg.ndvi_threshold_for_builtup))
    built = _oracle_post(built, int(area * cfg.builtup_min_area_frac), 5)
    out = np.zeros((h, w), np.uint8)
    out[built == 1] = 3
    out[veg == 1] = 1
    out[water == 1] = 2
    bare = ((out == 0)
            & (np.nan_to_num(ndvi) > cfg.bareland_ndvi_low)
            & (np.nan_to_num(ndvi) < cfg.bareland_ndvi_high)
            & (np.nan_to_num(ndbi) > cfg.bareland_ndbi_low)
            & (np.nan_to_num(ndbi) < cfg.bareland_ndbi_high))
    bare = _oracle_post(bare, int(area * cfg.bareland_min_area_frac), 3)
    out[(bare == 1) & (out == 0)] = 4
    return out


def test_rule_based_full_chain_matches_oracle(rng):
    # synthetic index maps with realistic spatial structure
    base = rng.standard_normal((120, 130)).astype(np.float32)
    smooth = cv2.GaussianBlur(base, (21, 21), 5)
    ndvi = np.clip(smooth * 2.0, -1, 1)
    ndwi = np.clip(-smooth * 1.5 + 0.1, -1, 1)
    mndwi = np.clip(-smooth * 1.8 + 0.05, -1, 1)
    ndbi = np.clip(np.roll(smooth, 31, axis=1) * 1.7, -1, 1)
    cfg = RuleBasedConfig()
    ref = _oracle_rule_based(ndvi, ndwi, mndwi, ndbi, cfg)
    ours = np.asarray(rule_based_classify(
        jnp.asarray(ndvi), jnp.asarray(ndwi), jnp.asarray(mndwi),
        jnp.asarray(ndbi), cfg))
    assert np.array_equal(ref, ours)


def test_rule_based_bundled_scene_matches_oracle(aa_scene):
    from rs_image_segmentation_tpu.core.config import CalibrationConfig
    from rs_image_segmentation_tpu.ops.indices import spectral_indices
    from rs_image_segmentation_tpu.ops.normalize import robust_normalize
    from rs_image_segmentation_tpu.pipeline.preprocess import preprocess_bands
    import jax

    arr, info = aa_scene
    cal = CalibrationConfig()
    pre = preprocess_bands(jnp.asarray(arr),
                           np.asarray(cal.gains),
                           np.asarray(cal.biases))
    bands = jax.vmap(robust_normalize)(pre.astype(jnp.float32))
    idx = spectral_indices(bands)
    cfg = RuleBasedConfig()
    ndvi = np.asarray(idx["ndvi"])
    ndwi = np.asarray(idx["ndwi"])
    mndwi = np.asarray(idx["mndwi"])
    ndbi = np.asarray(idx["ndbi"])
    ref = _oracle_rule_based(ndvi, ndwi, mndwi, ndbi, cfg)
    ours = np.asarray(rule_based_classify(
        idx["ndvi"], idx["ndwi"], idx["mndwi"], idx["ndbi"], cfg))
    mismatch = (ref != ours).mean()
    assert mismatch == 0.0, f"mismatch rate {mismatch}"
