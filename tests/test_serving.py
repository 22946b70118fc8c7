"""Serving layer: dynamic batching engine + HTTP front-end.

Exactness contract under test: a scene's class map from the engine must be
bit-identical to calling the turbo program on that scene alone, regardless
of how requests were coalesced or bucket-padded.
"""

import threading
import time

import numpy as np
import pytest

from rs_image_segmentation_tpu.core.config import (FeatureStageConfig,
                                                   GLCMConfig)
from rs_image_segmentation_tpu.models.forest import fit_random_forest
from rs_image_segmentation_tpu.serving.engine import (EngineConfig,
                                                      InferenceEngine)

SMALL_CFG = FeatureStageConfig(glcm=GLCMConfig(window_size=8, step_size=8,
                                               levels=8))
H = W = 32


def _scenes(n, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (7, H, W)).astype(np.uint8)
            for _ in range(n)]


@pytest.fixture(scope="module")
def forest():
    rng = np.random.default_rng(0)
    x = rng.random((64, 19)).astype(np.float32)
    y = rng.integers(1, 4, 64)
    return fit_random_forest(x, y, n_estimators=10, seed=0)


@pytest.fixture(scope="module")
def engine(forest):
    f, depth = forest
    eng = InferenceEngine(
        f, depth, cfg=SMALL_CFG,
        engine_cfg=EngineConfig(max_batch=4, batch_window_ms=300.0,
                                buckets=(1, 2, 4)))
    yield eng
    eng.shutdown()


def _direct(scene, forest):
    """Single-scene turbo reference result."""
    import jax.numpy as jnp

    from rs_image_segmentation_tpu.core.config import CalibrationConfig
    from rs_image_segmentation_tpu.models.forest import _gemm_for
    from rs_image_segmentation_tpu.pipeline.preprocess import build_stretch_lut
    from rs_image_segmentation_tpu.pipeline.turbo import classify_scenes_turbo
    cal = CalibrationConfig()
    lut = build_stretch_lut(scene, np.asarray(cal.gains),
                            np.asarray(cal.biases)).astype(np.uint8)
    gf = _gemm_for(forest[0], 19)
    return np.asarray(classify_scenes_turbo(
        jnp.asarray(scene[None]), jnp.asarray(lut[None]), gf, SMALL_CFG)[0])


def test_single_request_matches_direct(engine, forest):
    scene = _scenes(1, seed=1)[0]
    out = engine.classify(scene, timeout=600)
    assert out.shape == (H, W) and out.dtype == np.uint8
    np.testing.assert_array_equal(out, _direct(scene, forest))


def test_coalesced_batch_is_padded_and_exact(engine, forest):
    scenes = _scenes(3, seed=2)
    before = engine.stats()
    futs = [engine.submit(s) for s in scenes]
    outs = [f.result(timeout=600) for f in futs]
    after = engine.stats()
    # 3 requests coalesce into one program (window is 300 ms), padded 3->4
    assert after["batches"] == before["batches"] + 1
    assert after["padded_scenes"] == before["padded_scenes"] + 1
    for s, o in zip(scenes, outs):
        np.testing.assert_array_equal(o, _direct(s, forest))


def test_validation_errors_surface_in_future(engine):
    bad_dtype = np.zeros((7, H, W), np.float32)
    with pytest.raises(ValueError, match="uint8"):
        engine.submit(bad_dtype).result(timeout=10)
    with pytest.raises(ValueError, match=r"\(7, H, W\)"):
        engine.submit(np.zeros((3, H, W), np.uint8)).result(timeout=10)
    with pytest.raises(ValueError, match="GLCM window"):
        engine.submit(np.zeros((7, 4, 4), np.uint8)).result(timeout=10)


def test_engine_config_validation():
    with pytest.raises(ValueError, match="sorted unique"):
        EngineConfig(buckets=(4, 2))
    with pytest.raises(ValueError, match="max_batch"):
        EngineConfig(max_batch=0)
    # buckets normalize against max_batch: oversize buckets drop, and
    # max_batch itself is always the top bucket (so rs-seg-serve
    # --max-batch N works for any N and no group can overflow bucketing)
    assert EngineConfig(max_batch=4).buckets == (1, 2, 4)
    assert EngineConfig(max_batch=2, buckets=(1, 8)).buckets == (1, 2)
    assert EngineConfig(max_batch=16).buckets == (1, 2, 4, 8, 16)
    assert EngineConfig(max_batch=3, buckets=(1, 2, 4, 8)).buckets == (1, 2, 3)


def test_shutdown_rejects_new_work(forest):
    f, depth = forest
    eng = InferenceEngine(f, depth, cfg=SMALL_CFG)
    eng.shutdown()
    with pytest.raises(RuntimeError, match="shut down"):
        eng.submit(_scenes(1)[0]).result(timeout=10)


# --------------------------------------------------------------- HTTP layer

@pytest.fixture(scope="module")
def server(engine):
    from rs_image_segmentation_tpu.serving.server import make_server
    httpd = make_server(engine, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    host, port = httpd.server_address[:2]
    yield f"http://{host}:{port}"
    httpd.shutdown()
    httpd.server_close()


def test_http_healthz_and_stats(server):
    from rs_image_segmentation_tpu.serving import client
    hz = client.healthz(server)
    assert hz["ok"] is True
    st = client.stats(server)
    assert st["requests"] >= 1 and st["gemm_forest"] is True


def test_http_npy_roundtrip(server, forest):
    from rs_image_segmentation_tpu.serving import client
    scene = _scenes(1, seed=3)[0]
    out = client.classify_array(server, scene, timeout=600)
    np.testing.assert_array_equal(out, _direct(scene, forest))


def test_http_tiff_roundtrip(server, forest, tmp_path):
    from rs_image_segmentation_tpu.io.tiff import GeoMeta, read_tiff, write_tiff
    from rs_image_segmentation_tpu.serving import client
    scene = _scenes(1, seed=4)[0]
    src = tmp_path / "scene.tif"
    meta = GeoMeta(transform=(30.0, 0.0, 500000.0, 0.0, -30.0, 4000000.0),
                   crs="EPSG:32630")
    write_tiff(str(src), scene, meta)
    # GeoTIFF in -> GeoTIFF out, geo metadata preserved
    dst = tmp_path / "map.tif"
    client.classify_tiff(server, str(src), str(dst), timeout=600)
    arr, info = read_tiff(str(dst))
    np.testing.assert_array_equal(arr[0], _direct(scene, forest))
    assert info.meta.crs == meta.crs
    assert np.allclose(info.meta.transform, meta.transform)
    # ?format=npy variant
    out = client.classify_tiff(server, str(src), timeout=600)
    np.testing.assert_array_equal(out, _direct(scene, forest))


def test_http_bad_requests(server):
    import json
    import urllib.error
    import urllib.request
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(f"{server}/nope", timeout=30)
    assert ei.value.code == 404
    req = urllib.request.Request(
        f"{server}/v1/classify", data=b"junk", method="POST",
        headers={"Content-Type": "text/plain"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 415


def test_concurrent_load_all_exact(engine, forest):
    """Thread-safety under contention: many clients submitting
    concurrently across coalescing windows; every result must equal the
    single-scene reference regardless of how requests were batched."""
    import concurrent.futures as cf

    scenes = _scenes(12, seed=9)
    refs = [_direct(s, forest) for s in scenes]

    def worker(s):
        return engine.classify(s, timeout=600)

    with cf.ThreadPoolExecutor(max_workers=4) as pool:
        outs = list(pool.map(worker, scenes))
    for o, r in zip(outs, refs):
        np.testing.assert_array_equal(o, r)
    st = engine.stats()
    # sanity: the engine actually coalesced at least some of the burst
    assert st["requests"] >= 12
    assert st["padded_scenes"] >= 0 and st["errors"] == 0


def test_kmeans_method_engine():
    """Unsupervised serving (reference stage-3 kmeans branch): engine
    results equal the direct fused program, including under batching."""
    import functools

    import jax
    import jax.numpy as jnp

    from rs_image_segmentation_tpu.core.config import CalibrationConfig
    from rs_image_segmentation_tpu.pipeline.preprocess import build_stretch_lut
    from rs_image_segmentation_tpu.pipeline.turbo import kmeans_scenes_turbo

    cal = CalibrationConfig()
    scenes = _scenes(2, seed=21)
    with InferenceEngine(method="kmeans", n_clusters=4, cfg=SMALL_CFG,
                         engine_cfg=EngineConfig(max_batch=2,
                                                 batch_window_ms=200.0,
                                                 buckets=(1, 2))) as eng:
        futs = [eng.submit(s) for s in scenes]
        outs = [f.result(timeout=600) for f in futs]
    for s, o in zip(scenes, outs):
        lut = build_stretch_lut(s, np.asarray(cal.gains),
                                np.asarray(cal.biases)).astype(np.uint8)
        ref = np.asarray(kmeans_scenes_turbo(
            jnp.asarray(s), jnp.asarray(lut), n_clusters=4, cfg=SMALL_CFG))
        np.testing.assert_array_equal(o, ref)
        assert set(np.unique(o)) <= set(range(1, 5))


def test_rule_based_method_engine():
    """Rule-based serving (reference stage-3 rule branch): engine results
    equal the direct fused program; no model required."""
    import jax.numpy as jnp

    from rs_image_segmentation_tpu.core.config import CalibrationConfig
    from rs_image_segmentation_tpu.pipeline.preprocess import build_stretch_lut
    from rs_image_segmentation_tpu.pipeline.turbo import rule_based_scenes_turbo

    cal = CalibrationConfig()
    scene = _scenes(1, seed=22)[0]
    with InferenceEngine(method="rule_based", cfg=SMALL_CFG,
                         engine_cfg=EngineConfig(max_batch=1,
                                                 buckets=(1,))) as eng:
        out = eng.classify(scene, timeout=600)
    lut = build_stretch_lut(scene, np.asarray(cal.gains),
                            np.asarray(cal.biases)).astype(np.uint8)
    ref = np.asarray(rule_based_scenes_turbo(jnp.asarray(scene),
                                             jnp.asarray(lut),
                                             cfg=SMALL_CFG))
    np.testing.assert_array_equal(out, ref)


def test_method_validation():
    with pytest.raises(ValueError, match="method must be one of"):
        InferenceEngine(method="svm")
    with pytest.raises(ValueError, match="needs a trained forest"):
        InferenceEngine(method="random_forest")
    with pytest.raises(ValueError, match="n_clusters >= 2"):
        InferenceEngine(method="kmeans", n_clusters=0)


def test_engine_survives_batch_failure(forest):
    """A batch that fails in-flight must surface per-request exceptions
    and leave the engine serving (the dispatch thread must not die)."""
    f, depth = forest
    with InferenceEngine(f, depth, cfg=SMALL_CFG,
                         engine_cfg=EngineConfig(max_batch=1,
                                                 buckets=(1,))) as eng:
        boom = {"left": 1}
        orig = eng._run_batch

        def flaky(scenes, bucket=None, record_stats=True):
            if boom["left"]:
                boom["left"] -= 1
                raise RuntimeError("injected device failure")
            return orig(scenes, bucket=bucket, record_stats=record_stats)

        eng._run_batch = flaky
        scene = _scenes(1, seed=30)[0]
        with pytest.raises(RuntimeError, match="injected device failure"):
            eng.classify(scene, timeout=600)
        assert eng.stats()["errors"] == 1
        # next request must succeed on the same engine
        out = eng.classify(scene, timeout=600)
        np.testing.assert_array_equal(out, _direct(scene, forest))
