"""Stage 3 — classification: rule-based / KMeans / random forest.

Reference: scripts/3_classification.py:267-505 + modules/features/extract.py.
Each method's compute path runs on device end-to-end; host code only moves
artifacts. Device graphs:

  rule_based : index thresholds -> post-process (ellipse morphology +
               8-conn min-area removal on device) -> priority paint
               builtup(3) -> veg(1) -> water(2) -> bareland(4) into the
               remaining unclassified pixels.
  kmeans     : MinMax scale + Lloyd on the MXU (models.kmeans), labels + 1.
  random_forest : tensorized forest traversal over all pixels
               (models.forest), trained from a labeled ROI raster with
               a joblib-compatible model cache.
"""

from __future__ import annotations

import os
import warnings
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from rs_image_segmentation_tpu.core.config import (ClassTables, ForestConfig,
                                                   KMeansConfig,
                                                   RuleBasedConfig)
from rs_image_segmentation_tpu.core.types import GeoMeta
from rs_image_segmentation_tpu.io.artifacts import (load_features,
                                                    normalize_features_structure)
from rs_image_segmentation_tpu.io.tiff import read_tiff, write_tiff
from rs_image_segmentation_tpu.models.forest import (FlatForest,
                                                     fit_random_forest,
                                                     forest_from_sklearn,
                                                     forest_predict)
from rs_image_segmentation_tpu.models.kmeans import (kmeans_fit_predict,
                                                     minmax_scale_features)
from rs_image_segmentation_tpu.ops.components import post_process_mask
from rs_image_segmentation_tpu.ops.threshold import threshold_binary


# ------------------------------------------------------------- rule based

def rule_mask(kind: str, ndvi: jnp.ndarray, ndwi: Optional[jnp.ndarray],
              mndwi: Optional[jnp.ndarray], ndbi: jnp.ndarray,
              cfg: RuleBasedConfig = RuleBasedConfig(),
              cc_impl: str = "auto") -> jnp.ndarray:
    """One post-processed rule mask (``kind`` in vegetation/water/builtup
    — reference extract.py:397-458). Factored out so the large-scene
    resumable path can checkpoint per mask while
    :func:`rule_based_classify` stays the single source of truth."""
    h, w = ndvi.shape
    area = h * w
    if kind == "vegetation":
        veg = threshold_binary(ndvi, cfg.ndvi_threshold)
        return post_process_mask(veg, int(area * cfg.veg_min_area_frac), 3,
                                 cc_impl=cc_impl)
    if kind == "water":
        if cfg.use_mndwi_if_available and mndwi is not None:
            water = threshold_binary(mndwi, cfg.mndwi_threshold)
        else:
            water = threshold_binary(ndwi, cfg.ndwi_threshold)
        return post_process_mask(water, int(area * cfg.water_min_area_frac),
                                 3, cc_impl=cc_impl)
    if kind == "builtup":
        built = threshold_binary(ndbi, cfg.ndbi_threshold)
        non_veg = threshold_binary(ndvi, cfg.ndvi_threshold_for_builtup,
                                   above=False)
        built = (built.astype(bool) & non_veg.astype(bool)).astype(jnp.uint8)
        return post_process_mask(built,
                                 int(area * cfg.builtup_min_area_frac), 5,
                                 cc_impl=cc_impl)
    raise ValueError(f"unknown rule mask kind {kind!r}")


def paint_rule_masks(veg: jnp.ndarray, water: jnp.ndarray,
                     built: jnp.ndarray) -> jnp.ndarray:
    """Priority paint builtup(3) -> vegetation(1) -> water(2) (reference
    3_classification.py:361-363)."""
    out = jnp.zeros(veg.shape, jnp.uint8)
    out = jnp.where(built == 1, 3, out)     # priority paint: builtup
    out = jnp.where(veg == 1, 1, out)       # then vegetation
    out = jnp.where(water == 1, 2, out)     # water wins
    return out


def bare_rule_mask(painted: jnp.ndarray, ndvi: jnp.ndarray,
                   ndbi: jnp.ndarray,
                   cfg: RuleBasedConfig = RuleBasedConfig(),
                   cc_impl: str = "auto") -> jnp.ndarray:
    """Bareland mask from the unclassified remainder of the painted map
    (reference extract.py:460-505)."""
    h, w = ndvi.shape
    area = h * w
    bare = ((painted == 0)
            & (jnp.nan_to_num(ndvi) > cfg.bareland_ndvi_low)
            & (jnp.nan_to_num(ndvi) < cfg.bareland_ndvi_high)
            & (jnp.nan_to_num(ndbi) > cfg.bareland_ndbi_low)
            & (jnp.nan_to_num(ndbi) < cfg.bareland_ndbi_high)
            ).astype(jnp.uint8)
    return post_process_mask(bare, int(area * cfg.bareland_min_area_frac), 3,
                             cc_impl=cc_impl)


def rule_based_classify(ndvi: jnp.ndarray, ndwi: jnp.ndarray,
                        mndwi: Optional[jnp.ndarray], ndbi: jnp.ndarray,
                        cfg: RuleBasedConfig = RuleBasedConfig(),
                        cc_impl: str = "auto") -> jnp.ndarray:
    """Full rule-based device graph (reference 3_classification.py:335-375,
    extract.py:397-505). Returns uint8 labels {0,1=veg,2=water,3=builtup,
    4=bareland}. ``cc_impl`` picks the connected-components backend
    (ops.components.connected_components_best); the default "auto" is
    right both per-scene and under vmap."""
    veg = rule_mask("vegetation", ndvi, ndwi, mndwi, ndbi, cfg, cc_impl)
    water = rule_mask("water", ndvi, ndwi, mndwi, ndbi, cfg, cc_impl)
    built = rule_mask("builtup", ndvi, ndwi, mndwi, ndbi, cfg, cc_impl)
    out = paint_rule_masks(veg, water, built)
    # bareland from the unclassified remainder (extract.py:460-505)
    bare = bare_rule_mask(out, ndvi, ndbi, cfg, cc_impl)
    out = jnp.where((bare == 1) & (out == 0), 4, out)
    return out.astype(jnp.uint8)


# ------------------------------------------------------------------ kmeans

def kmeans_classify(features: Dict[str, np.ndarray], keys, n_clusters: int,
                    seed: int = 42) -> np.ndarray:
    """Stack the selected (2-D or 3-D) feature keys exactly like the
    reference (extract.py:540-567: 3-D stacks flattened per band, NaN -> 0),
    MinMax scale, cluster, reshape, labels + 1."""
    h = features["height"]
    w = features["width"]
    cols = []
    for k in keys:
        v = features.get(k)
        if not isinstance(v, np.ndarray):
            continue
        if v.ndim == 3 and v.shape[:2] == (h, w):
            for i in range(v.shape[2]):
                cols.append(np.nan_to_num(v[:, :, i].reshape(-1)))
        elif v.ndim == 2 and v.shape == (h, w):
            cols.append(np.nan_to_num(v.reshape(-1)))
    if not cols:
        raise ValueError("no usable features for KMeans")
    x = jnp.asarray(np.stack(cols, axis=1).astype(np.float32))
    xs = minmax_scale_features(x)
    labels, _ = kmeans_fit_predict(xs, n_clusters, seed=seed)
    return (np.asarray(labels).reshape(h, w) + 1).astype(np.uint8)


def auto_kmeans_keys(features: Dict[str, np.ndarray]) -> list:
    """The reference's automatic key selection (extract.py:516-533): all 2-D
    arrays matching the image shape, else the default candidates."""
    h, w = features["height"], features["width"]
    meta = {"transform", "crs", "width", "height", "dimensions", "geo_transform"}
    keys = [k for k, v in features.items()
            if isinstance(v, np.ndarray) and v.ndim == 2 and v.shape == (h, w)
            and k not in meta]
    if not keys:
        for k in ["ndvi", "ndwi", "ndbi", "texture_mean", "evi", "savi",
                  "hierarchical_level_1", "hierarchical_level_2",
                  "hierarchical_all"]:
            v = features.get(k)
            if isinstance(v, np.ndarray) and (
                    (v.ndim == 2 and v.shape == (h, w))
                    or (v.ndim == 3 and v.shape[:2] == (h, w))):
                keys.append(k)
    return keys


# ------------------------------------------------------------ random forest

def prepare_training_samples(feature_array: np.ndarray, roi: np.ndarray
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """Pixels where roi != 0 and not NaN (reference extract.py:585-633)."""
    h, w, f = feature_array.shape
    flat = feature_array.reshape(-1, f)
    lab = roi.reshape(-1)
    sel = (lab != 0) & ~np.isnan(lab.astype(np.float64))
    x = np.nan_to_num(flat[sel])
    y = lab[sel].astype(np.int64)
    if x.size == 0:
        raise ValueError("no training samples found in ROI")
    return x, y


def load_roi_raster(path: str, expected_shape=None) -> np.ndarray:
    if path.endswith(".npy"):
        roi = np.load(path)
    else:
        arr, _ = read_tiff(path)
        roi = arr[0]
    if expected_shape is not None and roi.shape != expected_shape:
        raise ValueError(f"ROI shape {roi.shape} != features {expected_shape}")
    return roi


def train_or_load_forest(x: np.ndarray, y: np.ndarray, model_path: str,
                         cfg: ForestConfig = ForestConfig(),
                         use_sklearn: bool = True
                         ) -> Tuple[FlatForest, int]:
    """Model cache semantics of the reference (3_classification.py:459-475):
    reload if present, retrain on feature-count mismatch. Training uses
    sklearn when available (artifact interop) else the NumPy CART trainer."""
    if os.path.exists(model_path):
        try:
            import joblib
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                clf = joblib.load(model_path)
            if getattr(clf, "n_features_in_", -1) == x.shape[1]:
                return forest_from_sklearn(clf)
        except Exception:
            pass
    if use_sklearn:
        try:
            from sklearn.ensemble import RandomForestClassifier
            import joblib
            clf = RandomForestClassifier(n_estimators=cfg.n_estimators,
                                         max_depth=cfg.max_depth,
                                         random_state=cfg.seed, n_jobs=-1)
            clf.fit(x, y)
            os.makedirs(os.path.dirname(model_path) or ".", exist_ok=True)
            joblib.dump(clf, model_path)
            return forest_from_sklearn(clf)
        except ImportError:
            pass
    forest, depth = fit_random_forest(x, y, cfg.n_estimators, cfg.max_depth,
                                      cfg.seed)
    return forest, depth


def forest_classify(feature_array: np.ndarray, forest: FlatForest,
                    depth: int) -> np.ndarray:
    h, w, f = feature_array.shape
    x = jnp.asarray(np.nan_to_num(feature_array.reshape(-1, f)))
    pred = forest_predict(forest, x, depth)
    return np.asarray(pred).reshape(h, w)


# ------------------------------------------------------------ three-class map

def create_three_class_map(result: np.ndarray, method: str = "rule_based",
                           kmeans_mapping: Optional[Dict[str, list]] = None
                           ) -> np.ndarray:
    """Remap method-specific labels to 1=water / 2=vegetation / 3=built-up
    (reference 3_classification.py:32-77)."""
    out = np.zeros_like(result, dtype=np.uint8)
    if method in ("rule_based", "random_forest"):
        out[result == 2] = 1
        out[result == 1] = 2
        out[result == 3] = 3
    elif method == "kmeans":
        mapping = kmeans_mapping or {"water": [1, 2], "vegetation": [3, 4, 5],
                                     "builtup": [6, 7]}
        for c in mapping.get("water", []):
            out[result == c] = 1
        for c in mapping.get("vegetation", []):
            out[result == c] = 2
        for c in mapping.get("builtup", []):
            out[result == c] = 3
    return out


THREE_CLASS_COLORMAP = np.array(
    [[0, 0, 0], [0, 0, 255], [0, 128, 0], [255, 0, 0]], dtype=np.uint8)


def save_three_class_evaluation_tif(result: np.ndarray, meta: GeoMeta,
                                    output_path: str,
                                    method: str = "rule_based") -> np.ndarray:
    """uint8 GeoTIFF + colormap + band description + per-class stats
    (reference 3_classification.py:79-174)."""
    three = create_three_class_map(result, method)
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    write_tiff(output_path, three[None], meta, compression="lzw", tiled=True,
               tile_size=256, colormap=THREE_CLASS_COLORMAP,
               band_names=["Land Cover Classification "
                           "(1=Water, 2=Vegetation, 3=Built-up)"])
    return three


# ------------------------------------------------------------------ rendering

def create_classification_map(result: np.ndarray, class_names: Dict[int, str],
                              class_colors: Dict[int, list], save_path: str,
                              title: str = "Classification") -> None:
    """Colored label map PNG with legend (reference extract.py:723-776)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Patch

    h, w = result.shape
    rgb = np.zeros((h, w, 3), np.uint8)
    present = np.unique(result)
    for cid in present:
        rgb[result == cid] = class_colors.get(int(cid), [128, 128, 128])
    fig, ax = plt.subplots(figsize=(10, 10))
    ax.imshow(rgb)
    ax.set_title(title)
    ax.axis("off")
    patches = [Patch(facecolor=np.array(class_colors.get(int(c), [128] * 3)) / 255.0,
                     label=class_names.get(int(c), str(c)))
               for c in present]
    ax.legend(handles=patches, loc="center left", bbox_to_anchor=(1.0, 0.5))
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, dpi=300, bbox_inches="tight")
    plt.close(fig)


def save_classification_as_geotiff(result: np.ndarray, meta: GeoMeta,
                                   output_path: str) -> None:
    """dtype auto (uint8/uint16/int32), nodata=0, LZW, 256-tiles
    (reference extract.py:778-836)."""
    mx = result.max()
    if mx < 256:
        arr = result.astype(np.uint8)
    elif mx < 65536:
        arr = result.astype(np.uint16)
    else:
        arr = result.astype(np.int32)
    meta = GeoMeta(meta.transform, meta.crs, nodata=0.0)
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    write_tiff(output_path, arr[None], meta, compression="lzw", tiled=True,
               tile_size=256)


def run_three_class_evaluation_output(features_meta: Optional[Dict] = None,
                                      output_dir: str = "output",
                                      method: str = "rule_based",
                                      classification_map: Optional[np.ndarray] = None,
                                      shape=(256, 256)) -> np.ndarray:
    """Demo/smoke workflow (reference 3_classification.py:176-237): produce a
    three-class evaluation GeoTIFF from a given (or random placeholder)
    classification map."""
    from rs_image_segmentation_tpu.tools.fixtures import (
        make_random_classification_map, synthetic_geometa)
    if classification_map is None:
        classification_map = make_random_classification_map(shape)
    if features_meta is not None:
        meta = GeoMeta(transform=features_meta.get("transform"),
                       crs=features_meta.get("crs"))
    else:
        meta = synthetic_geometa(classification_map.shape)
    out = os.path.join(output_dir, f"{method}_three_class_evaluation.tif")
    return save_three_class_evaluation_tif(classification_map, meta, out,
                                           method)


# --------------------------------------------------------------- orchestration

def run_classification_stage(feature_file_path: str, method: str = "rule_based",
                             output_dir: str = "segmentation_outputs",
                             use_hierarchical_all: bool = True,
                             labeled_roi_file: str = "labeled_roi.tif",
                             rule_cfg: RuleBasedConfig = RuleBasedConfig(),
                             kmeans_cfg: KMeansConfig = KMeansConfig(),
                             forest_cfg: ForestConfig = ForestConfig(),
                             tables: ClassTables = ClassTables()
                             ) -> np.ndarray:
    """Reference-compatible stage-3 workflow (3_classification.py:267-505)."""
    os.makedirs(output_dir, exist_ok=True)
    raw = load_features(feature_file_path)
    features = normalize_features_structure(raw)
    # bare-name aliases for prefixed keys, so rule/kmeans paths find indices
    for key in list(features.keys()):
        if key.startswith("all_extracted_features_dict_"):
            features.setdefault(key[len("all_extracted_features_dict_"):],
                                features[key])
    h, w = features["height"], features["width"]
    meta = GeoMeta(transform=features.get("transform"),
                   crs=features.get("crs"))

    if method == "rule_based":
        ndvi = features.get("ndvi")
        ndwi = features.get("ndwi")
        mndwi = features.get("mndwi")
        ndbi = features.get("ndbi")
        if ndvi is None or ndbi is None or (ndwi is None and mndwi is None):
            raise ValueError("rule_based requires ndvi/ndbi and ndwi or mndwi")
        result = np.asarray(rule_based_classify(
            jnp.asarray(ndvi), jnp.asarray(ndwi if ndwi is not None else ndvi),
            jnp.asarray(mndwi) if mndwi is not None else None,
            jnp.asarray(ndbi), rule_cfg))
        title = "Rule-based classification"
    elif method == "kmeans":
        wanted = ["ndvi", "ndwi", "ndbi", "texture_mean", "hierarchical_all"]
        keys = [k for k in wanted
                if isinstance(features.get(k), np.ndarray)
                and features[k].ndim in (2, 3)]
        if not keys:
            keys = auto_kmeans_keys(features)
        result = kmeans_classify(features, keys, kmeans_cfg.n_clusters,
                                 kmeans_cfg.seed)
        title = f"K-Means ({kmeans_cfg.n_clusters} clusters)"
    elif method == "random_forest":
        if use_hierarchical_all and isinstance(
                features.get("hierarchical_all"), np.ndarray):
            fa = features["hierarchical_all"]
        else:
            keys = [k for k, v in features.items()
                    if isinstance(v, np.ndarray) and v.ndim == 2
                    and v.shape == (h, w)]
            if not keys:
                raise ValueError("no 2-D features available for random forest")
            fa = np.stack([features[k] for k in keys], axis=-1)
        roi = load_roi_raster(labeled_roi_file, (h, w))
        x, y = prepare_training_samples(fa, roi)
        model_path = os.path.join(output_dir, "random_forest_model.joblib")
        forest, depth = train_or_load_forest(x, y, model_path, forest_cfg)
        result = forest_classify(fa, forest, depth)
        title = "Random-forest classification"
    else:
        raise ValueError(f"unsupported method {method!r}")

    from rs_image_segmentation_tpu.pipeline.visualize import (
        visualize_combined_indices)
    visualize_combined_indices(
        features, os.path.join(output_dir, "combined_indices.png"))

    map_path = os.path.join(output_dir, f"{method}_classification_map.png")
    create_classification_map(result, tables.names_dict(),
                              tables.colors_dict(), map_path, title)
    tif_path = os.path.join(output_dir, f"{method}_classification_map.tif")
    save_classification_as_geotiff(result, meta, tif_path)
    eval_tif = os.path.join(output_dir, f"{method}_three_class_evaluation.tif")
    save_three_class_evaluation_tif(result, meta, eval_tif, method)
    return result
