#!/usr/bin/env python3
"""Production-scale benchmark: classify a 6000x6000x7 scene (36 MP, 100x
the bundled scene) through the memory-bounded tiled pipeline
(pipeline/large_scene.py): exact global statistics, channel-major tile
stacks, transposed forest GEMM, bounded HBM.

The scene is synthesized by tiling the bundled AA scene 10x10 with a
per-tile DN roll so global statistics are non-trivial. Prints one JSON
line with wall-clock and MP/s for stage 1 (tiled preprocess) and the
full classification.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from rs_image_segmentation_tpu.core.config import (CalibrationConfig,
                                                       FeatureStageConfig)
    from rs_image_segmentation_tpu.io.tiff import read_tiff
    from rs_image_segmentation_tpu.models.forest import _gemm_for
    from rs_image_segmentation_tpu.pipeline.features import (
        hierarchical_stack_fused)
    from rs_image_segmentation_tpu.pipeline.large_scene import (
        classify_large_scene, preprocess_large)
    from rs_image_segmentation_tpu.pipeline.preprocess import preprocess_bands
    from rs_image_segmentation_tpu.tools.sampling import SampleSet
    from rs_image_segmentation_tpu.tools.supervised import (
        train_random_forest_from_samples)

    aa, _ = read_tiff("/root/reference/data/raw/AA.tif")
    reps = 10
    h = w = 600 * reps
    big = np.empty((7, h, w), np.uint8)
    for i in range(reps):
        for j in range(reps):
            big[:, i * 600:(i + 1) * 600, j * 600:(j + 1) * 600] = np.roll(
                aa, 13 * (i * reps + j), axis=2)
    mp = h * w / 1e6

    cal = CalibrationConfig()
    gains, biases = np.asarray(cal.gains), np.asarray(cal.biases)
    cfg = FeatureStageConfig()

    # train on the bundled samples over the bundled scene (standard model)
    pre0 = preprocess_bands(aa, gains, biases)
    stack0 = np.asarray(hierarchical_stack_fused(pre0.astype(jnp.float32)))
    coords, labels = SampleSet.load("/root/reference/data/samples.pkl")
    forest, depth = train_random_forest_from_samples(
        np.nan_to_num(stack0[coords[:, 1], coords[:, 0], :]), labels)
    gf = _gemm_for(forest, 19)

    t0 = time.perf_counter()
    pre, hists = preprocess_large(big, cal, return_device=True,
                                  return_hist=True)
    jax.device_get(pre[0, :1, :1])  # force completion for honest timing
    t_pre = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = classify_large_scene(pre, gf, cfg, tile_rows=504, hists=hists)
    t_cls = time.perf_counter() - t0

    assert out.shape == (h, w) and set(np.unique(out)) <= {1, 2, 3}

    # Warm steady-state: a DIFFERENT 36 MP scene through the same process
    # (the deployment shape — long-lived server; the fresh-process figures
    # above are dominated by per-program persistent-cache loads through
    # this environment's compile service, not by device work).
    big2 = np.empty((7, h, w), np.uint8)
    for i in range(reps):
        for j in range(reps):
            big2[:, i * 600:(i + 1) * 600, j * 600:(j + 1) * 600] = np.roll(
                aa, 7 + 13 * (i * reps + j), axis=2)
    t0 = time.perf_counter()
    pre2, hists2 = preprocess_large(big2, cal, return_device=True,
                                    return_hist=True)
    jax.device_get(pre2[0, :1, :1])
    t_pre_w = time.perf_counter() - t0
    t0 = time.perf_counter()
    out2 = classify_large_scene(pre2, gf, cfg, tile_rows=504, hists=hists2)
    t_cls_w = time.perf_counter() - t0
    assert out2.shape == (h, w) and set(np.unique(out2)) <= {1, 2, 3}

    # e2e WITH GeoTIFF write, streamed vs serial (round-4 VERDICT #7):
    # the tile-stream writer LZW-encodes completed tile rows while the
    # device computes the next tile, so classify+write should cost ~the
    # classify alone; the serial figure pays the encode after the loop
    import tempfile

    from rs_image_segmentation_tpu.core.types import GeoMeta
    from rs_image_segmentation_tpu.io.tiff import (TiffTileStreamWriter,
                                                   write_tiff)
    meta = GeoMeta(transform=(30.0, 0.0, 0.0, 0.0, -30.0, 0.0),
                   crs="EPSG:32650", nodata=0.0)
    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        with TiffTileStreamWriter(os.path.join(td, "s.tif"), h, w,
                                  np.uint8, meta, compression="lzw") as sw:
            out3 = classify_large_scene(pre2, gf, cfg, tile_rows=504,
                                        hists=hists2, writer=sw)
        t_cls_stream_write = time.perf_counter() - t0
        t0 = time.perf_counter()
        out4 = classify_large_scene(pre2, gf, cfg, tile_rows=504,
                                    hists=hists2)
        write_tiff(os.path.join(td, "n.tif"), out4.astype(np.uint8)[None],
                   meta, compression="lzw", tiled=True)
        t_cls_serial_write = time.perf_counter() - t0
    assert np.array_equal(out3, out2) and np.array_equal(out4, out2)

    # model-free methods on the warm scene (the other two stage-3
    # branches at 36 MP: rule-based is one device program over the full
    # scene — the CC strip kernel is internally tiled)
    from rs_image_segmentation_tpu.pipeline.large_scene import (
        kmeans_large_scene, rule_based_large_scene)
    rule_np = np.asarray(rule_based_large_scene(
        np.asarray(pre2).astype(np.uint8), cfg, hists=np.asarray(hists2)))
    t0 = time.perf_counter()
    out_r = rule_based_large_scene(np.asarray(pre2).astype(np.uint8), cfg,
                                   hists=np.asarray(hists2))
    t_rule = time.perf_counter() - t0
    assert out_r.shape == (h, w) and np.array_equal(out_r, rule_np)
    t0 = time.perf_counter()
    out_k = kmeans_large_scene(np.asarray(pre2).astype(np.uint8),
                               n_clusters=7, cfg=cfg, tile_rows=504)
    t_km = time.perf_counter() - t0
    assert out_k.shape == (h, w) and out_k.min() >= 1 and out_k.max() <= 7

    # spot-check: the first 600x600 block is the bundled scene unrolled
    print(json.dumps({
        "metric": "large-scene tiled classification",
        "scene_mp": mp,
        "preprocess_s": round(t_pre, 2),
        "classify_s": round(t_cls, 2),
        "classify_mp_per_s": round(mp / t_cls, 3),
        "e2e_mp_per_s": round(mp / (t_pre + t_cls), 3),
        "vs_baseline": round(mp / (t_pre + t_cls) / 0.058, 1),
        "warm_preprocess_s": round(t_pre_w, 2),
        "warm_classify_s": round(t_cls_w, 2),
        "warm_e2e_mp_per_s": round(mp / (t_pre_w + t_cls_w), 3),
        "warm_vs_baseline": round(mp / (t_pre_w + t_cls_w) / 0.058, 1),
        "warm_classify_streamed_write_s": round(t_cls_stream_write, 2),
        "warm_classify_serial_write_s": round(t_cls_serial_write, 2),
        "rule_based_s": round(t_rule, 2),
        "rule_based_mp_per_s": round(mp / t_rule, 3),
        "kmeans_s": round(t_km, 2),
        "kmeans_mp_per_s": round(mp / t_km, 3),
    }), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
