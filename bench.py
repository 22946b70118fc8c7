#!/usr/bin/env python3
"""Benchmark: sustained end-to-end scene-classification throughput.

Measures BASELINE.json config #5 (multi-scene batch) for ALL THREE
reference stage-3 method branches (3_classification.py:335-485), plus a
36 MP large-scene measurement:

  * random_forest (headline): batches of 8 TM scenes ship host->device
    as ONE transfer and classify in ONE device program (uint8 scenes ->
    exact-LUT preprocess -> full 19-channel feature stack incl.
    GLCM/LBP/entropy -> random-forest GEMM over every pixel), several
    batches in flight so transfers, host LUT prep, and device compute
    overlap. Best of THREE stream repetitions insulates the recorded
    figure from single tunnel stalls. The bench also measures the
    tunnel's own H2D line rate for the exact batch payload and records
    it (h2d_line_rate_mb_per_s / tunnel_cap_mp_per_s /
    stream_h2d_efficiency): the stream runs at ~96-100% of line rate,
    so the recorded sustained figure IS the environment's transfer cap
    (~61 MB/s = 8.7 MP/s on 2026-08-19; device compute is 2.27 ms/scene
    = 158 MP/s), and run-to-run movement in it is tunnel state.
  * rule_based / kmeans: the same sustained 8-scene-batch protocol ->
    *_sustained_mp_per_s fields. rule uses the fused batched program
    (pipeline.turbo.rule_based_scenes_turbo_batch); kmeans dispatches
    per-scene single programs — the serving engine's shipping route
    (round 5: the batched fit runs every vmapped Lloyd lane to the
    slowest lane's iteration count and its f32 reduction order varies
    with the bucket; singles are 2x faster AND bit-stable) —
    plus resident-input device compute per scene (*_device_ms_per_scene,
    same enqueue-20 RTT-subtracted protocol as the RF figure — the
    sustained streams are tunnel-transfer-capped, so the device figures
    are the ones that track code changes).
  * large scene: a 6000x6000x7 scene (100x the bundled scene, tiled
    from AA.tif with per-tile DN rolls) through the transfer-overlapped
    tiled pipeline (classify_large_scene_streamed: raw chunks stream
    two-deep ahead of the LUT + pass-B/C programs — the 252 MB H2D
    hides the preprocess and global passes; bit-identical to the
    monolithic path, tested); the recorded figure is the warm
    steady-state of a SECOND distinct 36 MP scene in the same process
    (the long-lived deployment shape) -> large_scene_* fields.

Accuracy gates (ALL must pass or the process exits 2):
  - random_forest: Kappa vs the bundled 33-px ROI within 0.5% of the
    sklearn replay (BASELINE.md: OA 0.970 / Kappa 0.953), AND >= 99.9%
    full-scene agreement with the bundled output/class_map.npy.
  - kmeans: cluster-majority-mapped Kappa vs the ROI >= 0.75 for the
    BATCHED program (measures 0.906; the single-scene full-fit program
    measures 0.765 = the sklearn-anchored figure, see
    tests/test_models.py::test_kmeans_sklearn_scene_anchor).
  - rule_based: the BATCHED fused program must agree >= 99.9% with the
    standard rule graph on the full scene (measures 100%).
  - large_scene: warm steady-state e2e >= 2.9 MP/s (the 50x north star;
    measures ~5-8 depending on tunnel state).

Prints ONE JSON line:
  {"metric": ..., "value": <sustained MP/s>, "unit": "MP/s",
   "vs_baseline": ..., ...}
vs_baseline compares against the reference CPU throughput of 0.058 MP/s
(BASELINE.md "end-to-end excl. GLCM/LBP/entropy" — conservative: our
pipeline INCLUDES those stages).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MP_PER_S = 0.058
SCENE = "/root/reference/data/raw/AA.tif"
SAMPLES = "/root/reference/data/samples.pkl"
ROI = "/root/reference/output/ROI/roi_mask.npy"
CLASS_MAP = "/root/reference/output/class_map.npy"

BATCH = 8      # scenes per device program (BASELINE config #5)
ROUNDS = 5     # timed batches in the sustained headline stream
ROUNDS_M = 3   # timed batches per secondary-method stream
STREAMS = 4    # stream repetitions, best-of (headline)
LARGE_REPS = 10  # 6000x6000 = (600*LARGE_REPS)^2


def _kappa(y_true, y_pred):
    # the package's own sklearn-bit-parity metrics — the bench gate and
    # the evaluation stage must agree by construction
    from rs_image_segmentation_tpu.ops.stats import (cohen_kappa,
                                                     confusion_matrix,
                                                     overall_accuracy)
    labels = sorted(set(np.unique(y_true)) | set(np.unique(y_pred)))
    cm = confusion_matrix(y_true, y_pred, labels)
    return overall_accuracy(cm), cohen_kappa(cm)


def _tiled_scene(aa: np.ndarray, reps: int, roll0: int) -> np.ndarray:
    """(7, 600r, 600r) scene tiled from the bundled one with per-tile DN
    rolls so global statistics are non-trivial."""
    h = w = 600 * reps
    big = np.empty((7, h, w), np.uint8)
    for i in range(reps):
        for j in range(reps):
            big[:, i * 600:(i + 1) * 600, j * 600:(j + 1) * 600] = np.roll(
                aa, roll0 + 13 * (i * reps + j), axis=2)
    return big


def main() -> None:
    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from rs_image_segmentation_tpu.core.config import (CalibrationConfig,
                                                       FeatureStageConfig)
    from rs_image_segmentation_tpu.io.tiff import read_tiff
    from rs_image_segmentation_tpu.models.forest import _gemm_for
    from rs_image_segmentation_tpu.pipeline.features import (
        hierarchical_stack_fused)
    from rs_image_segmentation_tpu.pipeline.preprocess import (
        build_stretch_lut, build_stretch_stats,
        preprocess_bands)
    from rs_image_segmentation_tpu.pipeline.turbo import classify_scenes_turbo
    from rs_image_segmentation_tpu.tools.supervised import (
        train_random_forest_from_samples)
    from rs_image_segmentation_tpu.tools.sampling import SampleSet

    arr, info = read_tiff(SCENE)
    h, w = arr.shape[1], arr.shape[2]
    mp = h * w / 1e6
    cal = CalibrationConfig()
    gains = np.asarray(cal.gains)
    biases = np.asarray(cal.biases)
    cfg = FeatureStageConfig()

    # train once (host-side fit on the 33 bundled samples, exact-LUT stack)
    pre0 = preprocess_bands(arr, gains, biases)
    stack0 = np.asarray(hierarchical_stack_fused(pre0.astype(jnp.float32)))
    coords, labels = SampleSet.load(SAMPLES)
    x_train = np.nan_to_num(stack0[coords[:, 1], coords[:, 0], :])
    forest, depth = train_random_forest_from_samples(x_train, labels)
    gf = _gemm_for(forest, stack0.shape[-1])

    def build_stats(scenes_np):
        # host stretch-stats build: exact f64 LUTs + fixed-point params +
        # native-bincount stretched histograms, ~12 ms per 8-scene batch
        stats = [build_stretch_stats(s, gains, biases) for s in scenes_np]
        return (np.stack([p[0] for p in stats]).astype(np.uint8),
                np.stack([p[1] for p in stats]),
                np.stack([p[2] for p in stats]))

    def run_batch_pre(scenes_np, st):
        # one H2D + ONE device program for all 8 scenes (pipeline.turbo:
        # channel-major, sort-free, gather-free; arithmetic stretch
        # preamble with NO in-kernel histogram accumulation)
        luts, sps, hists = st
        return classify_scenes_turbo(
            jax.device_put(scenes_np), jax.device_put(luts), gf, cfg,
            stretch_params=jax.device_put(sps),
            stretch_hists=jax.device_put(hists))

    def run_batch(scenes_np):
        # full e2e per batch (stats build on the critical path — the
        # sustained stream below overlaps it instead, see _stream)
        return run_batch_pre(scenes_np, build_stats(scenes_np))

    def classify_one(scene_np):
        lut, sp, hh = build_stretch_stats(scene_np, gains, biases)
        return classify_scenes_turbo(
            jax.device_put(scene_np[None]),
            jax.device_put(lut[None].astype(np.uint8)), gf, cfg,
            stretch_params=jax.device_put(sp[None]),
            stretch_hists=jax.device_put(hh[None]))[0]

    def sync(o):
        # On this environment's remote device tunnel, block_until_ready
        # returns BEFORE execution finishes (verified: a 1-TFLOP matmul
        # "blocks" in 0.03 ms); only a real D2H forces completion. Programs
        # execute in launch order on the single stream, so fetching one
        # element of an output proves everything enqueued before it ran.
        if isinstance(o, (list, tuple)):
            o = o[-1]
        np.asarray(jax.device_get(o.ravel()[-1:]))

    # distinct buffers so every round pays its own H2D
    batches = [np.ascontiguousarray(
        np.broadcast_to(arr, (BATCH,) + arr.shape)).copy()
        for _ in range(ROUNDS)]

    # warmup / compile
    out = run_batch(batches[0])
    sync(out)
    sync(classify_one(arr))

    # --- tunnel H2D line rate ----------------------------------------------
    # The sustained streams below ship 2.52 MB of raw uint8 per scene over
    # this environment's remote-device tunnel; measure the tunnel's own
    # transfer rate for the exact batch payload so the recorded figure can
    # be read against the physical cap (stream_h2d_efficiency ~= 1.0 means
    # the stream is at line rate and any run-to-run delta is tunnel state,
    # not code). Measured 2026-08-19: ~61 MB/s -> 8.7 MP/s hard cap.
    batch_bytes = batches[0].nbytes
    put_ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(jax.device_put(batches[0]))
        put_ts.append(time.perf_counter() - t0)
    line_rate = batch_bytes / min(put_ts)                   # bytes/s

    # --- sustained stream: all ROUNDS batches in flight -------------------
    # (best of STREAMS repetitions — guards the recorded figure against a
    # tunnel stall hitting one stream). Batch i+1's host stats build runs
    # in a worker thread while batch i's H2D streams (round-5 VERDICT #5:
    # ~12 ms/batch of host work was serial on the critical path, most of
    # the gap between the recorded stream and the tunnel line rate); the
    # build is still INSIDE the timed stream — overlapped, not excluded.
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(1)

    def _stream():
        t0 = time.perf_counter()
        fut = pool.submit(build_stats, batches[0])
        outs = []
        for i, b in enumerate(batches):
            st = fut.result()
            if i + 1 < len(batches):
                fut = pool.submit(build_stats, batches[i + 1])
            outs.append(run_batch_pre(b, st))
        for o in outs:
            sync(o)
        return time.perf_counter() - t0, outs

    stream_times = []
    for _ in range(STREAMS):
        dt, outs = _stream()
        stream_times.append(dt)
    dt_stream = min(stream_times)
    sustained = ROUNDS * BATCH * mp / dt_stream
    # line rate again AFTER the streams: tunnel state drifts within a run,
    # so gauge the stream against the better of the two measurements (a
    # conservative efficiency — never flattered by a mid-run dip)
    put_ts2 = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(jax.device_put(batches[0]))
        put_ts2.append(time.perf_counter() - t0)
    line_rate = max(line_rate, batch_bytes / min(put_ts2))
    stream_h2d_eff = (ROUNDS * batch_bytes / dt_stream) / line_rate

    # --- per-batch blocking rounds (min + median) -------------------------
    times = []
    for b in batches:
        t1 = time.perf_counter()
        sync(run_batch(b))
        times.append((time.perf_counter() - t1) / BATCH)
    batch_min = float(np.min(times))
    batch_med = float(np.median(times))

    # --- single-scene blocking latency ------------------------------------
    lat = []
    for _ in range(6):
        t1 = time.perf_counter()
        sync(classify_one(arr))
        lat.append(time.perf_counter() - t1)

    # --- pure device compute (inputs resident; enqueue-20, RTT-subtracted) -
    # the sustained figure above is bounded by this environment's tunnel
    # bandwidth; on hardware-attached HBM the H2D of 2.5 MB/scene is
    # microseconds, so this is the deployment-relevant throughput
    batch_d = jax.device_put(batches[0])
    stats0 = [build_stretch_stats(s, gains, biases) for s in batches[0]]
    luts_d = jax.device_put(np.stack([p[0] for p in stats0]
                                     ).astype(np.uint8))
    sps0 = jax.device_put(np.stack([p[1] for p in stats0]))
    hists0 = jax.device_put(np.stack([p[2] for p in stats0]))
    run_resident = lambda: classify_scenes_turbo(batch_d, luts_d, gf, cfg,
                                                 stretch_params=sps0,
                                                 stretch_hists=hists0)
    out_r = run_resident()
    sync(out_r)
    rtts = []
    for _ in range(5):
        t1 = time.perf_counter()
        sync(out_r)
        rtts.append(time.perf_counter() - t1)
    rtt = min(rtts)
    compute_dt = None
    for _ in range(3):
        t1 = time.perf_counter()
        outs_r = [run_resident() for _ in range(20)]
        sync(outs_r[-1])
        d = (time.perf_counter() - t1 - rtt) / 20
        compute_dt = d if compute_dt is None else min(compute_dt, d)
    compute_mps = BATCH * mp / compute_dt

    # --- accuracy gates ----------------------------------------------------
    class_map = np.asarray(outs[0][0])
    roi = np.load(ROI)
    valid = roi > 0
    oa, kappa = _kappa(roi[valid].astype(np.int64),
                       class_map[valid].astype(np.int64))
    agreement = float((class_map == np.load(CLASS_MAP)).mean())
    rf_gate = (kappa >= 0.953 - 0.005) and (agreement >= 0.999)

    # --- kmeans: sustained batched stream + quality gate --------------------
    # (cluster-majority mapping = the reference's own evaluation
    # semantics, 4_evaluate.py:97-128, absorbing label permutation)
    from rs_image_segmentation_tpu.pipeline.evaluate import (
        ClassificationEvaluator)
    from rs_image_segmentation_tpu.pipeline.turbo import (
        kmeans_scenes_turbo, kmeans_scenes_turbo_batch,
        rule_based_scenes_turbo, rule_based_scenes_turbo_batch)

    def run_km_pre(scenes_np, st):
        # per-scene programs, the serving engine's shipping route
        # (round 5): the bucket-shaped batched fit runs every vmapped
        # Lloyd lane to the slowest lane's iteration count (8.70 vs
        # 4.27 ms/scene) and its f32 reduction order varies with the
        # bucket; singles pipeline through the stream just as well
        luts, sps, hists = st
        bd = jax.device_put(scenes_np)
        ld = jax.device_put(luts)
        sd = jax.device_put(sps)
        hd = jax.device_put(hists)
        return [kmeans_scenes_turbo_batch(
            bd[i:i + 1], ld[i:i + 1], n_clusters=7, cfg=cfg,
            stretch_params=sd[i:i + 1], stretch_hists=hd[i:i + 1])
            for i in range(scenes_np.shape[0])]

    def run_km_batch(scenes_np):
        return run_km_pre(scenes_np, build_stats(scenes_np))

    def _method_stream(run_pre, bs):
        # same overlapped-stats stream protocol as the headline stream
        t0 = time.perf_counter()
        fut = pool.submit(build_stats, bs[0])
        outs_ = []
        for i, b in enumerate(bs):
            st = fut.result()
            if i + 1 < len(bs):
                fut = pool.submit(build_stats, bs[i + 1])
            outs_.append(run_pre(b, st))
        for o in outs_:
            sync(o)
        return time.perf_counter() - t0, outs_

    def _device_ms_per_scene(run_fn):
        """Enqueue-20 RTT-subtracted device time of a resident-input
        batched program (same protocol as the RF device figure)."""
        out0 = run_fn()
        sync(out0)
        best = None
        for _ in range(3):
            t1 = time.perf_counter()
            outs_ = [run_fn() for _ in range(20)]
            sync(outs_[-1])
            d = (time.perf_counter() - t1 - rtt) / 20
            best = d if best is None else min(best, d)
        return best / BATCH * 1e3

    km_out = run_km_batch(batches[0])
    sync(km_out)
    km_streams = []
    for _ in range(3):
        dt, outs_k = _method_stream(run_km_pre, batches[:ROUNDS_M])
        km_streams.append(dt)
    km_sustained = ROUNDS_M * BATCH * mp / min(km_streams)
    ev = ClassificationEvaluator()
    km_map = np.asarray(outs_k[0][0]).reshape(arr.shape[1], arr.shape[2])
    km_pred, km_truth = ev.extract_valid_samples(km_map, roi)
    km_mapped = ev.map_clusters_to_classes(km_pred, km_truth)
    _, km_kappa = _kappa(km_truth, km_mapped)
    km_gate = km_kappa >= 0.75

    km_dev_ms = _device_ms_per_scene(
        lambda: [kmeans_scenes_turbo_batch(
            batch_d[i:i + 1], luts_d[i:i + 1], n_clusters=7, cfg=cfg,
            stretch_params=sps0[i:i + 1], stretch_hists=hists0[i:i + 1])
            for i in range(BATCH)])

    # single-scene full-fit figure (back-compat field + sklearn anchor)
    lut0 = jax.device_put(build_stretch_lut(arr, gains, biases
                                            ).astype(np.uint8))
    arr_d = jax.device_put(arr)
    sync(kmeans_scenes_turbo(arr_d, lut0, n_clusters=7))
    t1 = time.perf_counter()
    km1 = np.asarray(kmeans_scenes_turbo(arr_d, lut0, n_clusters=7))
    km_dt = time.perf_counter() - t1

    # --- rule_based: sustained batched stream + agreement gate --------------
    def run_rb_pre(scenes_np, st):
        luts, sps, hists = st
        return rule_based_scenes_turbo_batch(
            jax.device_put(scenes_np), jax.device_put(luts), cfg,
            stretch_params=jax.device_put(sps),
            stretch_hists=jax.device_put(hists))

    def run_rb_batch(scenes_np):
        return run_rb_pre(scenes_np, build_stats(scenes_np))

    rb_out = run_rb_batch(batches[0])
    sync(rb_out)
    rb_streams = []
    for _ in range(3):
        dt, outs_b = _method_stream(run_rb_pre, batches[:ROUNDS_M])
        rb_streams.append(dt)
    rb_sustained = ROUNDS_M * BATCH * mp / min(rb_streams)

    from rs_image_segmentation_tpu.ops.indices import spectral_indices
    from rs_image_segmentation_tpu.ops.normalize import robust_normalize
    from rs_image_segmentation_tpu.pipeline.classify import (
        rule_based_classify)
    bands01 = jnp.stack([robust_normalize(b.astype(jnp.float32))
                         for b in jax.device_put(pre0)])
    sidx = spectral_indices(bands01)
    rb_std = np.asarray(rule_based_classify(sidx["ndvi"], sidx["ndwi"],
                                            sidx["mndwi"], sidx["ndbi"]))
    rb_agreement = float((np.asarray(outs_b[0][0]) == rb_std).mean())
    rb_gate = rb_agreement >= 0.999

    rb_dev_ms = _device_ms_per_scene(
        lambda: rule_based_scenes_turbo_batch(
            batch_d, luts_d, cfg,
            stretch_params=sps0, stretch_hists=hists0))

    # single-scene fused figure (back-compat field)
    sync(rule_based_scenes_turbo(arr_d, lut0))
    t1 = time.perf_counter()
    np.asarray(rule_based_scenes_turbo(arr_d, lut0))
    rb_dt = time.perf_counter() - t1

    # --- 36 MP large scene: warm steady-state ------------------------------
    # (reference large-raster surface: the tiled 19-band GeoTIFF writer,
    # 2_feature_extraction.py:240-258; SURVEY §6 north star >= 50x).
    # Round 5: the transfer-overlapped e2e path — raw chunks stream
    # two-deep ahead of the LUT + pass-B/C programs, global stats from
    # host raw histograms, pass D from resident stretched chunks
    # (pipeline.large_scene.classify_large_scene_streamed; bit-identical
    # to the monolithic preprocess_large -> classify_large_scene path,
    # tested). The monolithic path measured 4.53 s warm on the same day
    # this path measured ~3.1 s (profile_large_scene.py).
    from rs_image_segmentation_tpu.pipeline.large_scene import (
        classify_large_scene_streamed)
    big = _tiled_scene(arr, LARGE_REPS, 0)
    mp_large = big.shape[1] * big.shape[2] / 1e6
    t0 = time.perf_counter()
    out_l = classify_large_scene_streamed(big, gf, cal, cfg, tile_rows=504)
    t_large_first = time.perf_counter() - t0
    ok_labels = set(np.unique(out_l)) <= {1, 2, 3}
    del big, out_l
    # warm steady-state: a DIFFERENT 36 MP scene in the same process
    big2 = _tiled_scene(arr, LARGE_REPS, 7)
    t0 = time.perf_counter()
    out_l2 = classify_large_scene_streamed(big2, gf, cal, cfg,
                                           tile_rows=504)
    t_large_warm = time.perf_counter() - t0
    large_mps = mp_large / t_large_warm
    large_gate = bool(ok_labels
                      and set(np.unique(out_l2)) <= {1, 2, 3}
                      and large_mps >= 2.9)
    del big2, out_l2

    gate_ok = rf_gate and km_gate and rb_gate and large_gate

    result = {
        "metric": "sustained e2e scene classification "
                  "(preprocess+19ch features+RF, 8-scene batches)",
        "value": round(sustained, 3),
        "unit": "MP/s",
        "vs_baseline": round(sustained / BASELINE_MP_PER_S, 2),
        "seconds_per_scene_sustained": round(dt_stream / (ROUNDS * BATCH), 5),
        "h2d_line_rate_mb_per_s": round(line_rate / 1e6, 1),
        "stream_h2d_efficiency": round(stream_h2d_eff, 3),
        "tunnel_cap_mp_per_s": round(line_rate / (arr.nbytes / mp), 3),
        "seconds_per_scene_batched_min": round(batch_min, 5),
        "seconds_per_scene_batched_median": round(batch_med, 5),
        "seconds_per_scene_single_min": round(float(np.min(lat)), 5),
        "seconds_per_scene_single_median": round(float(np.median(lat)), 5),
        "device_compute_ms_per_scene": round(compute_dt / BATCH * 1e3, 3),
        "device_compute_mp_per_s": round(compute_mps, 1),
        "device_compute_vs_baseline": round(compute_mps / BASELINE_MP_PER_S,
                                            1),
        "oa": round(oa, 4),
        "kappa": round(kappa, 4),
        "kappa_baseline": 0.953,
        "fullscene_agreement": round(agreement, 5),
        "kmeans_sustained_mp_per_s": round(km_sustained, 3),
        "kmeans_sustained_vs_baseline": round(
            km_sustained / BASELINE_MP_PER_S, 1),
        "kmeans_roi_kappa": round(float(km_kappa), 4),
        "kmeans_seconds_per_scene": round(km_dt, 5),
        "kmeans_device_ms_per_scene": round(km_dev_ms, 3),
        "rule_sustained_mp_per_s": round(rb_sustained, 3),
        "rule_sustained_vs_baseline": round(
            rb_sustained / BASELINE_MP_PER_S, 1),
        "rule_agreement_vs_standard": round(rb_agreement, 5),
        "rule_seconds_per_scene": round(rb_dt, 5),
        "rule_device_ms_per_scene": round(rb_dev_ms, 3),
        "large_scene_mp": round(mp_large, 1),
        "large_scene_warm_e2e_s": round(t_large_warm, 2),
        "large_scene_mp_per_s": round(large_mps, 3),
        "large_scene_vs_baseline": round(large_mps / BASELINE_MP_PER_S, 1),
        "large_scene_first_e2e_s": round(t_large_first, 2),
        "gates": {"random_forest": rf_gate, "kmeans": bool(km_gate),
                  "rule_based": rb_gate, "large_scene": large_gate},
        "gate_ok": bool(gate_ok),
    }
    print(json.dumps(result), flush=True)
    # skip jax/runtime teardown: the device tunnel in this environment can
    # hang atexit handlers for minutes after the result is already printed
    os._exit(0 if gate_ok else 2)


if __name__ == "__main__":
    main()
