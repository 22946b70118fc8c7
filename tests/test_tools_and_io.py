"""Tools (sampling, fixtures, supervised), artifacts, serialization,
streaming, visualization."""

import os
import pickle

import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import REFERENCE_SAMPLES


# --- sampling ----------------------------------------------------------------

def test_sampleset_roundtrip(tmp_path):
    from rs_image_segmentation_tpu.tools.sampling import SampleSet
    fm = np.arange(5 * 6 * 3, dtype=np.float32).reshape(5, 6, 3)
    s = SampleSet(fm)
    s.add(2, 3, 1)
    s.add(5, 0, 2)
    p = str(tmp_path / "samples.pkl")
    s.save(p)
    coords, labels = SampleSet.load(p)
    assert coords.tolist() == [[2, 3], [5, 0]]
    assert labels.tolist() == [1, 2]
    x, y = s.training_matrix()
    assert np.array_equal(x[0], fm[3, 2])  # [y, x] indexing convention
    assert np.array_equal(x[1], fm[0, 5])


def test_bundled_samples_compatible():
    from rs_image_segmentation_tpu.tools.sampling import SampleSet
    coords, labels = SampleSet.load(REFERENCE_SAMPLES)
    assert coords.shape == (33, 2)
    assert sorted(np.unique(labels)) == [1, 2, 3]


def test_generate_roi_mask(tmp_path):
    from rs_image_segmentation_tpu.tools.sampling import (
        SampleSet, generate_roi_mask_from_samples)
    s = SampleSet()
    s.add(2, 3, 1)
    s.add(100, 100, 2)  # out of bounds for 10x10 -> skipped
    p = str(tmp_path / "s.pkl")
    s.save(p)
    out = str(tmp_path / "roi.npy")
    mask = generate_roi_mask_from_samples(p, (10, 10), out)
    assert mask.dtype == np.int16
    assert mask[3, 2] == 1
    assert mask.sum() == 1
    assert np.array_equal(np.load(out), mask)


def test_roi_mask_matches_bundled():
    from rs_image_segmentation_tpu.tools.sampling import (
        generate_roi_mask_from_samples)
    roi_ref = np.load("/root/reference/output/ROI/roi_mask.npy")
    mask = generate_roi_mask_from_samples(REFERENCE_SAMPLES, (600, 600))
    assert np.array_equal(mask, roi_ref)


# --- fixtures -----------------------------------------------------------------

def test_dummy_feature_pkl_flows_through_stage3(tmp_path):
    from rs_image_segmentation_tpu.pipeline.classify import (
        run_classification_stage)
    from rs_image_segmentation_tpu.tools.fixtures import make_dummy_feature_pkl
    p = str(tmp_path / "dummy.pkl")
    make_dummy_feature_pkl(p, shape=(64, 64))
    res = run_classification_stage(p, method="rule_based",
                                   output_dir=str(tmp_path / "out"))
    assert res.shape == (64, 64)


def test_dummy_pkl_kmeans(tmp_path):
    from rs_image_segmentation_tpu.pipeline.classify import (
        run_classification_stage)
    from rs_image_segmentation_tpu.tools.fixtures import make_dummy_feature_pkl
    p = str(tmp_path / "dummy.pkl")
    make_dummy_feature_pkl(p, shape=(48, 48))
    res = run_classification_stage(p, method="kmeans",
                                   output_dir=str(tmp_path / "out"))
    assert res.shape == (48, 48)
    assert res.min() >= 1 and res.max() <= 7


# --- artifacts ------------------------------------------------------------------

def test_normalize_features_structure_nested():
    from rs_image_segmentation_tpu.io.artifacts import (
        normalize_features_structure)
    h = w = 8
    arr = np.zeros((h, w), np.float32)
    loaded = {
        "all_extracted_features_dict": {"ndvi": arr, "glcm": {"contrast": arr}},
        "hierarchical_features": {"all": np.zeros((h, w, 19), np.float32)},
        "lst": [arr, arr],
        "dimensions": (h, w),
        "geo_transform": (500000.0, 30.0, 0.0, 4000000.0, 0.0, -30.0),
        "crs": "EPSG:32630",
    }
    flat = normalize_features_structure(loaded)
    assert "all_extracted_features_dict_ndvi" in flat
    assert "all_extracted_features_dict_glcm_contrast" in flat
    assert flat["hierarchical_all"].shape == (h, w, 19)
    assert "lst_0" in flat and "lst_1" in flat
    assert flat["height"] == h and flat["width"] == w
    assert flat["transform"] == (30.0, 0.0, 500000.0, 0.0, -30.0, 4000000.0)


def test_alias_feature_keys():
    from rs_image_segmentation_tpu.io.artifacts import alias_feature_keys
    f = {"all_extracted_features_dict_ndvi": np.zeros((2, 2))}
    out = alias_feature_keys(f)
    assert "ndvi" in out


# --- serialization ---------------------------------------------------------------

def test_flat_forest_npz_roundtrip(tmp_path, rng):
    from rs_image_segmentation_tpu.models.forest import (fit_random_forest,
                                                         forest_predict)
    from rs_image_segmentation_tpu.models.serialize import (load_flat_forest,
                                                            save_flat_forest)
    x = rng.standard_normal((200, 6)).astype(np.float32)
    y = (x[:, 0] > 0).astype(np.int64) + 1
    forest, depth = fit_random_forest(x, y, n_estimators=9, seed=1)
    p = str(tmp_path / "f.npz")
    save_flat_forest(p, forest, depth)
    f2, d2 = load_flat_forest(p)
    assert d2 == depth
    xq = jnp.asarray(rng.standard_normal((100, 6)).astype(np.float32))
    assert np.array_equal(np.asarray(forest_predict(forest, xq, depth, chunk=64)),
                          np.asarray(forest_predict(f2, xq, d2, chunk=64)))


def test_kmeans_state_roundtrip(tmp_path, rng):
    from rs_image_segmentation_tpu.models.kmeans import kmeans_fit_predict
    from rs_image_segmentation_tpu.models.serialize import (load_kmeans,
                                                            save_kmeans)
    x = jnp.asarray(rng.standard_normal((200, 4)).astype(np.float32))
    _, state = kmeans_fit_predict(x, 3, seed=0)
    p = str(tmp_path / "km.npz")
    save_kmeans(p, state)
    s2 = load_kmeans(p)
    assert np.array_equal(np.asarray(state.centroids), np.asarray(s2.centroids))


# --- streaming -------------------------------------------------------------------

def test_tile_stream_assembles_identity(rng):
    import jax
    from rs_image_segmentation_tpu.io.stream import (assemble_tiles,
                                                     stream_tiles, tile_grid)
    arr = rng.random((3, 50, 70)).astype(np.float32)
    specs = tile_grid(50, 70, tile=32, halo=0)
    fn = jax.jit(lambda t: t * 2.0)
    out = assemble_tiles(stream_tiles(arr, specs, fn), arr.shape)
    assert np.allclose(out, arr * 2.0)


def test_tile_stream_with_halo_stencil(rng):
    import jax
    from rs_image_segmentation_tpu.io.stream import (assemble_tiles,
                                                     stream_tiles, tile_grid)
    from rs_image_segmentation_tpu.ops.stencil import box_filter
    arr = rng.random((1, 48, 64)).astype(np.float32)
    ref = np.asarray(box_filter(jnp.asarray(arr), 5))
    specs = tile_grid(48, 64, tile=16, halo=2)
    fn = jax.jit(lambda t: box_filter(t, 5)[..., 2:-2, 2:-2])
    out = assemble_tiles(stream_tiles(arr, specs, fn), arr.shape)
    # interior tiles exact; borders use reflect pad of the halo read
    assert np.abs(out[..., 4:-4, 4:-4] - ref[..., 4:-4, 4:-4]).max() < 1e-6


# --- visualization -------------------------------------------------------------

def test_visualize_combined_indices(tmp_path, rng):
    from rs_image_segmentation_tpu.pipeline.visualize import (
        visualize_combined_indices)
    h = w = 16
    feats = {"all_extracted_features_dict_bsi": rng.random((h, w)),
             "ndvi": rng.random((h, w)),
             "mndwi": rng.random((h, w))}
    p = str(tmp_path / "combined.png")
    assert visualize_combined_indices(feats, p) == p
    assert os.path.exists(p)


def test_visualize_combined_grayscale_fallback(tmp_path, rng):
    from rs_image_segmentation_tpu.pipeline.visualize import (
        visualize_combined_indices)
    feats = {"ndvi": rng.random((8, 8))}
    p = str(tmp_path / "gray.png")
    assert visualize_combined_indices(feats, p) == p


# --- features aux -----------------------------------------------------------------

def test_feature_selection_by_variance(rng):
    from rs_image_segmentation_tpu.ops.features_aux import (
        feature_selection_by_variance)
    flat = {"keep": rng.random((10, 10)).astype(np.float32),
            "drop": np.full((10, 10), 0.5, np.float32),
            "nested": {"keep": rng.random((10, 10)).astype(np.float32),
                       "drop": np.zeros((10, 10), np.float32)}}
    out = feature_selection_by_variance(flat, 0.01)
    assert "keep" in out and "drop" not in out
    assert "drop" not in out.get("nested", {})


def test_semantic_merge_water():
    from rs_image_segmentation_tpu.ops.features_aux import (
        semantic_merge_water_classes)
    seg = jnp.asarray(np.array([[1, 2], [3, 2]]))
    out = np.asarray(semantic_merge_water_classes(seg))
    assert out.tolist() == [[1, 1], [3, 1]]


# --- guards ---------------------------------------------------------------------

def test_checked_raises_on_nan():
    import jax.numpy as jnp
    from rs_image_segmentation_tpu.utils.guards import checked, sanitize

    def bad(x):
        return jnp.log(x)  # NaN for negative input

    import pytest as _pytest
    with _pytest.raises(Exception):
        checked(bad)(jnp.asarray([-1.0]))
    ok = checked(lambda v: v * 2)(jnp.asarray([1.0]))
    assert float(ok[0]) == 2.0
    assert float(sanitize(jnp.asarray([float("nan")]))[0]) == 0.0


def test_train_with_validation_report(rng):
    from rs_image_segmentation_tpu.tools.supervised import (
        train_with_validation_report)
    centers = rng.standard_normal((3, 8)) * 4
    x = np.concatenate([centers[i] + rng.standard_normal((100, 8))
                        for i in range(3)]).astype(np.float32)
    y = np.repeat([1, 2, 3], 100)
    forest, depth, report = train_with_validation_report(x, y,
                                                         n_estimators=20)
    assert report["n_train"] + report["n_val"] == 300
    assert report["accuracy"] > 0.9
    assert report["kappa"] > 0.85
    assert set(report["per_class"]) == {1, 2, 3}
    assert len(report["feature_importances"]) == 8


def test_batch_workflow(tmp_path, rng):
    from rs_image_segmentation_tpu.core.config import (FeatureStageConfig,
                                                       GLCMConfig)
    from rs_image_segmentation_tpu.core.types import GeoMeta
    from rs_image_segmentation_tpu.io.tiff import write_tiff
    from rs_image_segmentation_tpu.models.forest import fit_random_forest
    from rs_image_segmentation_tpu.tools.batch import run_batch_workflow

    cfg = FeatureStageConfig(glcm=GLCMConfig(window_size=16, step_size=16,
                                             levels=8))
    paths, rois = [], []
    for i in range(3):
        arr = rng.integers(0, 255, (7, 48, 48)).astype(np.uint8)
        p = str(tmp_path / f"scene{i}.tif")
        write_tiff(p, arr, GeoMeta(transform=(30.0, 0, 5e5, 0, -30.0, 4e6)))
        paths.append(p)
        roi = np.zeros((48, 48), np.int16)
        roi[::9, ::9] = rng.integers(1, 4, roi[::9, ::9].shape)
        rp = str(tmp_path / f"roi{i}.npy")
        np.save(rp, roi)
        rois.append(rp)

    x = rng.random((60, 19)).astype(np.float32)
    y = rng.integers(1, 4, 60)
    forest, depth = fit_random_forest(x, y, n_estimators=10, seed=0)
    out = run_batch_workflow(paths, forest, depth, str(tmp_path / "out"),
                             roi_paths=rois, cfg=cfg)
    assert len(out) == 3
    for e in out:
        assert os.path.exists(e["class_map"])
        assert "kappa" in e


def test_batch_workflow_on_mesh(tmp_path, rng):
    from rs_image_segmentation_tpu.core.config import (FeatureStageConfig,
                                                       GLCMConfig)
    from rs_image_segmentation_tpu.io.tiff import write_tiff
    from rs_image_segmentation_tpu.models.forest import fit_random_forest
    from rs_image_segmentation_tpu.parallel.mesh import make_mesh
    from rs_image_segmentation_tpu.tools.batch import run_batch_workflow

    cfg = FeatureStageConfig(glcm=GLCMConfig(window_size=16, step_size=16,
                                             levels=8))
    paths = []
    for i in range(8):
        arr = rng.integers(0, 255, (7, 48, 48)).astype(np.uint8)
        p = str(tmp_path / f"s{i}.tif")
        write_tiff(p, arr)
        paths.append(p)
    x = rng.random((60, 19)).astype(np.float32)
    y = rng.integers(1, 4, 60)
    forest, depth = fit_random_forest(x, y, n_estimators=10, seed=0)
    mesh = make_mesh(axis_names=("data",))
    out = run_batch_workflow(paths, forest, depth, str(tmp_path / "o"),
                             mesh=mesh, cfg=cfg)
    assert len(out) == 8
    for e in out:
        assert os.path.exists(e["class_map"])


def test_evaluator_roi_resize_path(tmp_path, rng):
    """Shape-mismatched ROI is nearest-resized (reference 4_evaluate.py:76-80)."""
    from rs_image_segmentation_tpu.pipeline.evaluate import (
        ClassificationEvaluator)
    cls = rng.integers(1, 4, (60, 60)).astype(np.int64)
    roi_small = np.zeros((30, 30), np.int16)
    roi_small[::5, ::5] = rng.integers(1, 4, roi_small[::5, ::5].shape)
    cpath = str(tmp_path / "c.npy"); np.save(cpath, cls)
    rpath = str(tmp_path / "r.npy"); np.save(rpath, roi_small)
    ev = ClassificationEvaluator()
    m = ev.evaluate_classification(cpath, rpath, str(tmp_path / "out"),
                                   map_clusters=False)
    assert 0.0 <= m["overall_accuracy"] <= 1.0
    assert os.path.exists(str(tmp_path / "out" / "evaluation_report.txt"))


# --- remaining aux API surface ---------------------------------------------

def test_features_aux_surface(rng):
    from rs_image_segmentation_tpu.ops.features_aux import (
        evaluate_feature_importance_for_classes,
        feature_fusion_for_segmentation, hierarchical_feature_fusion,
        prepare_features_for_segmentation)
    h = w = 12
    feats = {k: rng.random((h, w)).astype(np.float32)
             for k in ["ndwi", "mndwi", "ndvi", "evi", "ndbi", "bsi"]}
    fused = np.asarray(hierarchical_feature_fusion(feats))
    assert fused.shape == (h, w, 6)
    stacked = np.asarray(prepare_features_for_segmentation(
        feats, ["ndvi", "ndwi", "missing"]))
    assert stacked.shape == (h, w, 2)
    ws = np.asarray(feature_fusion_for_segmentation(
        [feats["ndvi"], feats["ndwi"]], weights=[0.7, 0.3]))
    assert ws.shape == (h, w)
    cat = np.asarray(feature_fusion_for_segmentation(
        [feats["ndvi"], feats["ndwi"]], method="concat"))
    assert cat.shape == (h, w, 2)
    labels = np.zeros((h, w), np.int64)
    labels[:, : w // 2] = 1
    labels[:, w // 2:] = 2
    imp = evaluate_feature_importance_for_classes(fused, labels,
                                                  n_estimators=5)
    assert imp.shape == (6,)
    assert abs(imp.sum() - 1.0) < 1e-6


def test_stage_timer_and_trace():
    import jax.numpy as jnp
    from rs_image_segmentation_tpu.utils.timing import StageTimer, device_trace
    t = StageTimer()
    x = jnp.ones((4, 4))
    with t.stage("op", sync=x):
        y = x * 2
    rep = t.report()
    assert "op" in rep and "total" in rep
    with device_trace(None):
        pass  # no-op path


def test_batch_workflow_subbatches_and_padding(rng, tmp_path):
    """>8 uniform scenes split into sub-batches; a trailing partial group
    pads to reuse the compiled program and extra outputs are dropped
    (code-review finding: unbounded single-program batches)."""
    import jax.numpy as jnp
    from rs_image_segmentation_tpu.core.config import FeatureStageConfig
    from rs_image_segmentation_tpu.models.forest import fit_random_forest
    from rs_image_segmentation_tpu.pipeline.features import (
        hierarchical_stack_fused)
    from rs_image_segmentation_tpu.io.tiff import write_tiff
    from rs_image_segmentation_tpu.tools.batch import run_batch_workflow

    cfg = FeatureStageConfig(glcm=__import__(
        "rs_image_segmentation_tpu.core.config",
        fromlist=["GLCMConfig"]).GLCMConfig(window_size=16, step_size=16,
                                            levels=8))
    paths = []
    scenes = []
    for i in range(10):  # sub=8 on a meshless run -> groups of 8 and 2->8pad
        s = rng.integers(0, 256, (7, 32, 32)).astype(np.uint8)
        p = str(tmp_path / f"s{i}.tif")
        write_tiff(p, s, None)
        paths.append(p)
        scenes.append(s)
    stack = np.asarray(hierarchical_stack_fused(
        jnp.asarray(scenes[0], jnp.float32),
        FeatureStageConfig(glcm=cfg.glcm)))
    forest, depth = fit_random_forest(
        stack.reshape(-1, 19)[:200], rng.integers(1, 4, 200),
        n_estimators=5, seed=0)
    results = run_batch_workflow(paths, forest, depth,
                                 str(tmp_path / "out"), cfg=cfg)
    assert len(results) == 10
    import os
    for r in results:
        assert os.path.exists(r["class_map"])


def test_batch_workflow_roi_length_mismatch(rng, tmp_path):
    import pytest
    from rs_image_segmentation_tpu.models.forest import fit_random_forest
    from rs_image_segmentation_tpu.tools.batch import run_batch_workflow
    forest, depth = fit_random_forest(
        rng.random((50, 19)).astype(np.float32), rng.integers(1, 4, 50),
        n_estimators=3, seed=0)
    with pytest.raises(ValueError, match="roi_paths"):
        run_batch_workflow(["a.tif", "b.tif"], forest, depth,
                           str(tmp_path), roi_paths=["one.npy"])
