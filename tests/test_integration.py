"""End-to-end integration on the bundled 600x600 TM scene (CPU).

Replays the reference's four-stage pipeline + the bundled supervised
workflow and gates on the reproduced accuracy (BASELINE.md: OA 0.970 /
Kappa 0.953 — ours must be >= those within 0.5%)."""

import os

import numpy as np
import pytest

from tests.conftest import (REFERENCE_CLASS_MAP, REFERENCE_DATA,
                            REFERENCE_ROI, REFERENCE_SAMPLES)


@pytest.fixture(scope="module")
def stage_dirs(tmp_path_factory):
    return tmp_path_factory.mktemp("pipeline")


@pytest.fixture(scope="module")
def preprocessed(stage_dirs, aa_scene):
    from rs_image_segmentation_tpu.pipeline.preprocess import (
        run_preprocessing_stage)
    out = str(stage_dirs / "preprocessed.tif")
    run_preprocessing_stage(REFERENCE_DATA, out, vis_dir=str(stage_dirs))
    return out


@pytest.fixture(scope="module")
def feature_artifacts(stage_dirs, preprocessed):
    from rs_image_segmentation_tpu.pipeline.features import (
        run_feature_extraction_stage)
    outdir = str(stage_dirs / "feature_outputs")
    feats, hier = run_feature_extraction_stage(preprocessed, outdir, vis=False)
    return outdir, feats, hier


def test_stage1_artifact_contract(preprocessed):
    from rs_image_segmentation_tpu.io.tiff import read_tiff
    arr, info = read_tiff(preprocessed)
    assert arr.shape == (7, 600, 600)
    assert arr.dtype == np.float32
    assert arr.min() >= 0 and arr.max() <= 255
    assert os.path.exists(os.path.join(os.path.dirname(preprocessed),
                                       "preprocessing_result.png"))


def test_stage2_artifact_contract(feature_artifacts):
    outdir, feats, hier = feature_artifacts
    assert hier["all"].shape == (600, 600, 19)
    assert hier["level_1"].shape == (600, 600, 14)
    assert hier["level_2"].shape == (600, 600, 5)
    for name in ["level1_features.npy", "level2_features.npy",
                 "all_hierarchical_features.npy",
                 "all_features_and_metadata.pkl",
                 "all_hierarchical_features.tif"]:
        assert os.path.exists(os.path.join(outdir, name)), name
    stack = np.load(os.path.join(outdir, "all_hierarchical_features.npy"))
    assert stack.shape == (600, 600, 19) and stack.dtype == np.float32
    assert not np.isnan(stack).any()
    from rs_image_segmentation_tpu.io.tiff import read_tiff
    tif, info = read_tiff(os.path.join(outdir,
                                       "all_hierarchical_features.tif"))
    assert tif.shape == (19, 600, 600)
    assert np.allclose(np.moveaxis(tif, 0, 2), stack)


def test_stage2_pkl_loads_via_normalize(feature_artifacts):
    from rs_image_segmentation_tpu.io.artifacts import (
        load_features, normalize_features_structure)
    outdir, _, _ = feature_artifacts
    raw = load_features(os.path.join(outdir, "all_features_and_metadata.pkl"))
    flat = normalize_features_structure(raw)
    assert flat["height"] == 600 and flat["width"] == 600
    assert flat["hierarchical_all"].shape == (600, 600, 19)
    assert "all_extracted_features_dict_ndvi" in flat


def test_stage3_rule_based(stage_dirs, feature_artifacts):
    from rs_image_segmentation_tpu.pipeline.classify import (
        run_classification_stage)
    outdir, _, _ = feature_artifacts
    pkl = os.path.join(outdir, "all_features_and_metadata.pkl")
    res = run_classification_stage(pkl, method="rule_based",
                                   output_dir=str(stage_dirs / "rule"))
    assert res.shape == (600, 600)
    assert set(np.unique(res)) <= {0, 1, 2, 3, 4}
    for f in ["rule_based_classification_map.png",
              "rule_based_classification_map.tif",
              "rule_based_three_class_evaluation.tif"]:
        assert os.path.exists(str(stage_dirs / "rule" / f)), f


def test_stage3_kmeans(stage_dirs, feature_artifacts):
    from rs_image_segmentation_tpu.pipeline.classify import (
        run_classification_stage)
    outdir, _, _ = feature_artifacts
    pkl = os.path.join(outdir, "all_features_and_metadata.pkl")
    res = run_classification_stage(pkl, method="kmeans",
                                   output_dir=str(stage_dirs / "km"))
    assert res.shape == (600, 600)
    assert 1 <= res.min() and res.max() <= 7
    assert len(np.unique(res)) == 7


def test_stage3_random_forest_with_roi(stage_dirs, feature_artifacts):
    from rs_image_segmentation_tpu.io.tiff import write_tiff
    from rs_image_segmentation_tpu.pipeline.classify import (
        run_classification_stage)
    outdir, _, _ = feature_artifacts
    pkl = os.path.join(outdir, "all_features_and_metadata.pkl")
    roi = np.load(REFERENCE_ROI)
    roi_tif = str(stage_dirs / "labeled_roi.tif")
    write_tiff(roi_tif, roi.astype(np.int16)[None])
    res = run_classification_stage(pkl, method="random_forest",
                                   output_dir=str(stage_dirs / "rf"),
                                   labeled_roi_file=roi_tif)
    assert res.shape == (600, 600)
    assert set(np.unique(res)) <= {1, 2, 3}


def test_supervised_workflow_beats_baseline(stage_dirs, feature_artifacts):
    """The bundled supervised path: 33 samples -> RF -> full predict.
    Gate: OA/Kappa >= reference replay (0.970/0.953) - 0.5%."""
    from rs_image_segmentation_tpu.pipeline.evaluate import (
        evaluate_classification)
    from rs_image_segmentation_tpu.tools.supervised import (
        run_supervised_workflow)
    outdir, _, _ = feature_artifacts
    class_map = run_supervised_workflow(
        REFERENCE_SAMPLES,
        os.path.join(outdir, "all_hierarchical_features.npy"),
        str(stage_dirs / "sup"))
    roi = np.load(REFERENCE_ROI)
    m = evaluate_classification(class_map, roi)
    assert m["overall_accuracy"] >= 0.970 - 0.005
    assert m["kappa"] >= 0.953 - 0.005
    bundled = np.load(REFERENCE_CLASS_MAP)
    agreement = (class_map == bundled).mean()
    assert agreement > 0.95, agreement


def test_stage4_evaluator(stage_dirs, feature_artifacts):
    from rs_image_segmentation_tpu.pipeline.evaluate import (
        ClassificationEvaluator)
    sup_map = str(stage_dirs / "sup" / "class_map.npy")
    ev = ClassificationEvaluator()
    metrics = ev.evaluate_classification(sup_map, REFERENCE_ROI,
                                         str(stage_dirs / "eval"))
    assert metrics["overall_accuracy"] >= 0.96
    for f in ["confusion_matrix.png", "accuracy_comparison.png",
              "classification_comparison.png", "evaluation_report.txt"]:
        assert os.path.exists(str(stage_dirs / "eval" / f)), f
    report = open(str(stage_dirs / "eval" / "evaluation_report.txt")).read()
    assert "Overall Accuracy" in report and "Kappa" in report


def test_kmeans_through_stage4(stage_dirs, feature_artifacts):
    """KMeans clusters -> majority mapping -> metrics on the bundled ROI."""
    import numpy as np
    from rs_image_segmentation_tpu.pipeline.evaluate import (
        ClassificationEvaluator)
    km_tif = str(stage_dirs / "km" / "kmeans_classification_map.tif")
    if not os.path.exists(km_tif):
        pytest.skip("kmeans stage output missing")
    ev = ClassificationEvaluator()
    metrics = ev.evaluate_classification(km_tif, REFERENCE_ROI,
                                         str(stage_dirs / "eval_km"),
                                         map_clusters=True)
    # unsupervised clusters mapped by majority vote should explain most of
    # the 33 labeled pixels
    assert metrics["overall_accuracy"] > 0.6
    assert os.path.exists(str(stage_dirs / "eval_km" / "evaluation_report.txt"))
