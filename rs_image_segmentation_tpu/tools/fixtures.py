"""Synthetic fixture generation — the reference's built-in fake backend.

Reference: scripts/3_classification.py:556-602 creates a full dummy feature
PKL (random 256x256 indices + hierarchical arrays + synthetic EPSG:32630
georeferencing) when the real artifact is missing, and
run_three_class_evaluation_output (:176-237) substitutes a random
classification map. These power tests and smoke runs without real data.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional, Tuple

import numpy as np

from rs_image_segmentation_tpu.core.types import GeoMeta


def synthetic_geometa(shape: Tuple[int, int] = (256, 256)) -> GeoMeta:
    """EPSG:32630, 30 m pixels at a plausible UTM origin (reference
    3_classification.py:593-594)."""
    return GeoMeta(transform=(30.0, 0.0, 500000.0, 0.0, -30.0, 4000000.0),
                   crs="EPSG:32630")


def make_dummy_feature_pkl(path: Optional[str] = None,
                           shape: Tuple[int, int] = (256, 256),
                           seed: int = 0) -> dict:
    """Random index maps + hierarchical stacks with the stage-2 pickle
    layout (reference 3_classification.py:556-602)."""
    rng = np.random.default_rng(seed)
    h, w = shape
    idx = {name: rng.uniform(-1, 1, (h, w)).astype(np.float32)
           for name in ["ndvi", "ndwi", "mndwi", "ndbi", "bsi", "evi",
                        "msavi"]}
    idx["texture_mean"] = rng.random((h, w)).astype(np.float32)
    level1 = rng.random((h, w, 14)).astype(np.float32)
    level2 = rng.random((h, w, 5)).astype(np.float32)
    meta = synthetic_geometa(shape)
    payload = {
        "all_extracted_features_dict": idx,
        "hierarchical_features": {
            "level_1": level1,
            "level_2": level2,
            "all": np.concatenate([level1, level2], axis=-1),
        },
        "dimensions": (h, w),
        "geo_transform": meta.to_gdal(),
        "crs": meta.crs,
    }
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(payload, f)
    return payload


def make_random_classification_map(shape: Tuple[int, int] = (256, 256),
                                   n_classes: int = 4,
                                   seed: int = 0) -> np.ndarray:
    """Random label map placeholder (reference 3_classification.py:218)."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, n_classes + 1, shape).astype(np.uint8)
