"""Auxiliary feature utilities from the reference's public API surface.

These mirror indices.py functions that scripts don't call but that belong to
the reference's importable API (SURVEY.md §2.2): variance-based selection,
fusion helpers, segmentation prep, water-class merging, and RF-based feature
importance.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from rs_image_segmentation_tpu.ops.normalize import robust_normalize


def feature_selection_by_variance(features: Dict, threshold: float = 0.01
                                  ) -> Dict:
    """Drop features with variance < threshold, recursing into lists/dicts
    (reference indices.py:484-517)."""
    out: Dict = {}
    for name, feat in features.items():
        if isinstance(feat, (np.ndarray, jnp.ndarray)) and feat.ndim == 2:
            if float(jnp.var(jnp.asarray(feat))) >= threshold:
                out[name] = feat
        elif isinstance(feat, list) and all(
                isinstance(f, (np.ndarray, jnp.ndarray)) for f in feat):
            kept = [f for f in feat
                    if float(jnp.var(jnp.asarray(f))) >= threshold]
            if kept:
                out[name] = kept
        elif isinstance(feat, dict):
            sub = {k: v for k, v in feat.items()
                   if isinstance(v, (np.ndarray, jnp.ndarray))
                   and float(jnp.var(jnp.asarray(v))) >= threshold}
            if sub:
                out[name] = sub
    return out


def feature_fusion_for_segmentation(features: Sequence[jnp.ndarray],
                                    weights: Optional[Sequence[float]] = None,
                                    method: str = "weighted_sum"
                                    ) -> jnp.ndarray:
    """Weighted-sum or channel-concat fusion (reference indices.py:630-677)."""
    stack = [jnp.asarray(f, jnp.float32) for f in features]
    if method == "weighted_sum":
        if weights is None:
            weights = [1.0 / len(stack)] * len(stack)
        out = sum(w * f for w, f in zip(weights, stack))
        return out
    if method == "concat":
        return jnp.stack(stack, axis=-1)
    raise ValueError(f"unknown fusion method {method!r}")


def prepare_features_for_segmentation(features: Dict,
                                      keys: Sequence[str]) -> jnp.ndarray:
    """Select, robust-normalize and stack named features to (H, W, F)
    (reference indices.py:679-730)."""
    cols = []
    for k in keys:
        v = features.get(k)
        if v is None:
            continue
        cols.append(robust_normalize(jnp.asarray(v, jnp.float32)))
    if not cols:
        raise ValueError("none of the requested feature keys are present")
    return jnp.stack(cols, axis=-1)


def hierarchical_feature_fusion(features: Dict) -> jnp.ndarray:
    """Stack [ndwi, mndwi, ndvi, evi, ndbi, bsi] (reference
    indices.py:732-758; superseded by prepare_level_1_features)."""
    keys = ["ndwi", "mndwi", "ndvi", "evi", "ndbi", "bsi"]
    return jnp.stack([jnp.asarray(features[k]) for k in keys], axis=-1)


def semantic_merge_water_classes(segmentation: jnp.ndarray,
                                 source_labels=(1, 2),
                                 target_label: int = 1) -> jnp.ndarray:
    """Merge river/lake labels into one water class
    (reference indices.py:778-791)."""
    out = jnp.asarray(segmentation)
    for lab in source_labels:
        out = jnp.where(out == lab, target_label, out)
    return out


def evaluate_feature_importance_for_classes(feature_stack: np.ndarray,
                                            labels: np.ndarray,
                                            n_estimators: int = 50,
                                            seed: int = 42) -> np.ndarray:
    """Throwaway RF feature importances (reference indices.py:793-806),
    using our own trainer's mean impurity decrease."""
    from rs_image_segmentation_tpu.models.forest import fit_random_forest
    x = feature_stack.reshape(-1, feature_stack.shape[-1])
    y = labels.reshape(-1)
    sel = y > 0
    try:
        from sklearn.ensemble import RandomForestClassifier
        clf = RandomForestClassifier(n_estimators=n_estimators,
                                     random_state=seed)
        clf.fit(np.nan_to_num(x[sel]), y[sel])
        return clf.feature_importances_
    except ImportError:
        # fallback: permutation-free proxy via split counts from our trainer
        forest, _ = fit_random_forest(np.nan_to_num(x[sel]), y[sel],
                                      n_estimators, seed=seed)
        feats = np.asarray(forest.feature)
        internal = np.asarray(forest.left) != np.arange(feats.shape[1])[None]
        counts = np.bincount(feats[internal].ravel(),
                             minlength=x.shape[1]).astype(np.float64)
        total = counts.sum()
        return counts / total if total else counts
