"""pipeline.turbo (channel-major sort-free classifier) vs the standard path."""

import jax.numpy as jnp
import numpy as np

from rs_image_segmentation_tpu.core.config import (CalibrationConfig,
                                                   FeatureStageConfig)
from rs_image_segmentation_tpu.models.forest import (_gemm_chunk, _gemm_for,
                                                     fit_random_forest,
                                                     gemm_forest_predict)
from rs_image_segmentation_tpu.pipeline.features import hierarchical_stack_fused
from rs_image_segmentation_tpu.pipeline.preprocess import (build_stretch_lut,
                                                           preprocess_bands)
from rs_image_segmentation_tpu.pipeline.turbo import (
    apply_u8_lut_mxu, classify_scenes_turbo, gemm_labels_cm,
    hierarchical_stack_turbo_cm, histogram256, percentiles_from_counts)


def test_apply_u8_lut_mxu_exact(rng):
    planes = rng.integers(0, 256, (7, 33, 47)).astype(np.uint8)
    lut = rng.integers(0, 256, (7, 256)).astype(np.uint8)
    ref = np.stack([lut[i][planes[i]] for i in range(7)])
    got = np.asarray(apply_u8_lut_mxu(jnp.asarray(planes), jnp.asarray(lut)))
    assert np.array_equal(ref, got)


def test_histogram256(rng):
    planes = rng.integers(0, 256, (3, 50, 60)).astype(np.uint8)
    got = np.asarray(histogram256(jnp.asarray(planes)))
    ref = np.stack([np.bincount(p.ravel(), minlength=256) for p in planes])
    assert np.array_equal(ref, got.astype(np.int64))


def test_percentiles_from_counts_matches_numpy(rng):
    vals = rng.integers(0, 256, (2, 4000)).astype(np.uint8)
    counts = np.stack([np.bincount(v, minlength=256) for v in vals])
    values = np.broadcast_to(np.arange(256, dtype=np.float32), (2, 256))
    qs = (2.0, 25.0, 50.0, 75.0, 98.0)
    got = np.asarray(percentiles_from_counts(
        jnp.asarray(counts.astype(np.float32)), jnp.asarray(values.copy()),
        qs, 4000))
    for qi, q in enumerate(qs):
        for c in range(2):
            ref = np.percentile(vals[c].astype(np.float64), q)
            assert abs(got[qi, c] - ref) < 1e-3, (q, c)


def test_gemm_labels_cm_bitmatch_rowmajor(rng):
    x = rng.random((5000, 19)).astype(np.float32)
    y = rng.integers(1, 4, 5000)
    forest, depth = fit_random_forest(x[:200], y[:200], n_estimators=20,
                                      seed=0)
    gf = _gemm_for(forest, 19)
    row = np.asarray(gemm_forest_predict(gf, jnp.asarray(x),
                                         _gemm_chunk(gf.path.shape[1])))
    cm = np.asarray(gemm_labels_cm(gf, jnp.asarray(x.T), chunk=1024))
    assert np.array_equal(row, cm)


def test_turbo_stack_matches_fused(rng, aa_scene):
    arr, _ = aa_scene
    arr = np.ascontiguousarray(arr[:, :252, :252])
    cal = CalibrationConfig()
    gains, biases = np.asarray(cal.gains), np.asarray(cal.biases)
    cfg = FeatureStageConfig()
    slut = build_stretch_lut(arr, gains, biases).astype(np.uint8)

    pre = preprocess_bands(arr, gains, biases)
    std = np.asarray(hierarchical_stack_fused(pre.astype(jnp.float32), cfg))
    turbo = np.asarray(hierarchical_stack_turbo_cm(
        jnp.asarray(arr), jnp.asarray(slut), cfg))
    assert np.abs(std - np.moveaxis(turbo, 0, -1)).max() < 1e-4


def test_turbo_classify_agrees_with_standard(rng, aa_scene):
    arr, _ = aa_scene
    arr = np.ascontiguousarray(arr[:, :252, :252])
    cal = CalibrationConfig()
    gains, biases = np.asarray(cal.gains), np.asarray(cal.biases)
    cfg = FeatureStageConfig()

    pre = preprocess_bands(arr, gains, biases)
    stack = np.asarray(hierarchical_stack_fused(pre.astype(jnp.float32), cfg))
    sel = rng.integers(0, 252, (60, 2))
    forest, depth = fit_random_forest(stack[sel[:, 0], sel[:, 1], :],
                                      rng.integers(1, 4, 60),
                                      n_estimators=15, seed=0)
    gf = _gemm_for(forest, 19)
    ref = np.asarray(gemm_forest_predict(
        gf, jnp.asarray(stack.reshape(-1, 19)),
        _gemm_chunk(gf.path.shape[1]))).reshape(252, 252)

    slut = build_stretch_lut(arr, gains, biases).astype(np.uint8)
    # 2-scene batch exercises the vmap + batched GEMM path
    scenes = np.stack([arr, arr])
    luts = np.stack([slut, slut])
    got = np.asarray(classify_scenes_turbo(
        jnp.asarray(scenes), jnp.asarray(luts), gf, cfg))
    assert got.shape == (2, 252, 252)
    assert np.array_equal(got[0], got[1])
    agreement = (got[0] == ref).mean()
    assert agreement > 0.999, agreement


def test_preprocess_device_lut_documented_deviation(rng, aa_scene):
    """The zero-host-work device-LUT preprocess is NOT bit-faithful to the
    f64 host path (f32 truncation on the stretch's integer boundaries);
    its docstring promises at most one level of deviation — pin that."""
    from rs_image_segmentation_tpu.pipeline.preprocess import (
        calibrated_value_table, preprocess_bands_device_lut)
    arr, _ = aa_scene
    cal = CalibrationConfig()
    gains, biases = np.asarray(cal.gains), np.asarray(cal.biases)
    host = np.asarray(preprocess_bands(arr, gains, biases))
    calv = jnp.asarray(calibrated_value_table(gains, biases))
    dev = np.asarray(preprocess_bands_device_lut(jnp.asarray(arr), calv))
    diff = np.abs(host.astype(np.int16) - dev.astype(np.int16))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.15  # measured 8.3% on the bundled scene


def test_histogram256_chunked_path(rng):
    """Planes beyond 2^21 px take the lax.map block path with bin-0 pad
    correction (review finding: previously untested)."""
    plane = rng.integers(0, 256, (1, 2049, 1024)).astype(np.uint8)
    got = np.asarray(histogram256(jnp.asarray(plane)))
    ref = np.bincount(plane.ravel(), minlength=256)
    assert np.array_equal(got[0].astype(np.int64), ref)


def test_histogram256_counts_exact_past_f32(rng):
    """A single bin above 2^24 must stay exact (int32 counts; f32 would
    round)."""
    n = (1 << 24) + 4099
    plane = np.full((1, n), 7, np.uint8)
    got = np.asarray(histogram256(jnp.asarray(plane.reshape(1, 1, n))))
    assert got[0, 7] == n


def test_kmeans_scenes_turbo(rng, aa_scene):
    """Fused unsupervised route (BASELINE config #2): sane cluster map
    with real structure, 1-based labels."""
    from rs_image_segmentation_tpu.pipeline.turbo import kmeans_scenes_turbo
    arr, _ = aa_scene
    arr = np.ascontiguousarray(arr[:, :252, :252])
    cal = CalibrationConfig()
    slut = build_stretch_lut(arr, np.asarray(cal.gains),
                             np.asarray(cal.biases)).astype(np.uint8)
    labels = np.asarray(kmeans_scenes_turbo(
        jnp.asarray(arr), jnp.asarray(slut), n_clusters=5))
    assert labels.shape == (252, 252)
    assert labels.min() >= 1 and labels.max() <= 5
    assert len(np.unique(labels)) >= 3


def test_rule_based_scenes_turbo_matches_standard(rng, aa_scene):
    """Fused rule route == the standard rule graph over the standard
    normalized indices (BASELINE config #1)."""
    from rs_image_segmentation_tpu.ops.indices import spectral_indices
    from rs_image_segmentation_tpu.ops.normalize import robust_normalize
    from rs_image_segmentation_tpu.pipeline.classify import rule_based_classify
    from rs_image_segmentation_tpu.pipeline.turbo import (
        rule_based_scenes_turbo)
    arr, _ = aa_scene
    arr = np.ascontiguousarray(arr[:, :252, :252])
    cal = CalibrationConfig()
    gains, biases = np.asarray(cal.gains), np.asarray(cal.biases)
    slut = build_stretch_lut(arr, gains, biases).astype(np.uint8)

    pre = preprocess_bands(arr, gains, biases)
    bands01 = jnp.stack([robust_normalize(b.astype(jnp.float32))
                         for b in pre])
    idx = spectral_indices(bands01)
    ref = np.asarray(rule_based_classify(idx["ndvi"], idx["ndwi"],
                                         idx["mndwi"], idx["ndbi"]))
    got = np.asarray(rule_based_scenes_turbo(jnp.asarray(arr),
                                             jnp.asarray(slut)))
    agreement = (ref == got).mean()
    assert agreement > 0.999, agreement
    assert set(np.unique(got)) <= {0, 1, 2, 3, 4}


def test_rule_based_scenes_turbo_batch_matches_single(rng, aa_scene):
    """Batched rule route (round 4): per-scene results identical to the
    single-scene fused program AND >=99.9% of the standard graph, for a
    heterogeneous 2-scene batch."""
    from rs_image_segmentation_tpu.pipeline.turbo import (
        rule_based_scenes_turbo, rule_based_scenes_turbo_batch)
    arr, _ = aa_scene
    a0 = np.ascontiguousarray(arr[:, :180, :200])
    a1 = np.ascontiguousarray(arr[:, 300:480, 200:400])
    cal = CalibrationConfig()
    gains, biases = np.asarray(cal.gains), np.asarray(cal.biases)
    batch = np.stack([a0, a1])
    luts = np.stack([build_stretch_lut(s, gains, biases).astype(np.uint8)
                     for s in batch])
    got = np.asarray(rule_based_scenes_turbo_batch(jnp.asarray(batch),
                                                   jnp.asarray(luts)))
    for i, s in enumerate(batch):
        single = np.asarray(rule_based_scenes_turbo(
            jnp.asarray(s), jnp.asarray(luts[i])))
        assert np.array_equal(got[i], single), i


def test_remove_small_components_batch_exact(rng):
    """Batched min-area removal (tall-stack run-rank ids + MXU one-hot
    histogram) == the per-mask scatter path, both backends."""
    import jax

    from rs_image_segmentation_tpu.ops.components import (
        remove_small_components, remove_small_components_batch)
    masks = (rng.random((4, 70, 90))
             < np.array([0.3, 0.5, 0.7, 0.9])[:, None, None]).astype(np.uint8)
    areas = np.array([5, 17, 40, 3], np.int32)
    want = np.stack([
        np.asarray(remove_small_components(jnp.asarray(masks[i]),
                                           int(areas[i])))
        for i in range(4)])
    for impl in ("xla", "pallas"):
        got = np.asarray(remove_small_components_batch(
            jnp.asarray(masks), jnp.asarray(areas), impl=impl))
        assert np.array_equal(got, want), impl


def test_remove_small_components_batch_bins_cap(rng):
    """Components beyond the per-mask bins cap are dropped (documented
    fast-path behavior), never miscounted into other components."""
    from rs_image_segmentation_tpu.ops.components import (
        remove_small_components_batch)
    # 3-px-spaced dots: 12x15 = 180 single-pixel components (= runs)
    m = np.zeros((1, 36, 45), np.uint8)
    m[0, ::3, ::3] = 1
    got = np.asarray(remove_small_components_batch(
        jnp.asarray(m), jnp.asarray([1], np.int32), bins=128,
        impl="pallas"))
    # first 128 run-ranks survive (area 1 >= 1), the tail is dropped
    assert got.sum() == 128
    # with enough bins everything survives
    got = np.asarray(remove_small_components_batch(
        jnp.asarray(m), jnp.asarray([1], np.int32), bins=256,
        impl="pallas"))
    assert got.sum() == 180


def test_kmeans_scenes_turbo_batch(rng, aa_scene):
    """Batched unsupervised route (round 4): per-scene cluster maps with
    real structure; a duplicated scene clusters identically across the
    batch (fits are per-scene and deterministic given the seed)."""
    from rs_image_segmentation_tpu.pipeline.turbo import (
        kmeans_scenes_turbo_batch)
    arr, _ = aa_scene
    a0 = np.ascontiguousarray(arr[:, :180, :200])
    cal = CalibrationConfig()
    gains, biases = np.asarray(cal.gains), np.asarray(cal.biases)
    batch = np.stack([a0, a0])
    luts = np.stack([build_stretch_lut(s, gains, biases).astype(np.uint8)
                     for s in batch])
    got = np.asarray(kmeans_scenes_turbo_batch(
        jnp.asarray(batch), jnp.asarray(luts), n_clusters=5, fit_stride=4))
    assert got.shape == (2, 180, 200)
    assert got.min() >= 1 and got.max() <= 5
    assert len(np.unique(got[0])) >= 3
    assert np.array_equal(got[0], got[1])


def test_host_stretch_stats_bit_exact(rng, aa_scene):
    """build_stretch_stats' host histogram (native bincount pushed
    through the LUT) equals the device-accumulated stretched-value
    histogram, and the hist-skipping turbo program returns bit-identical
    class maps (round-4: the preamble drops in-kernel histogramming)."""
    from rs_image_segmentation_tpu.io import native as _native
    from rs_image_segmentation_tpu.ops.pallas_kernels import lut_hist_pallas
    from rs_image_segmentation_tpu.pipeline.preprocess import (
        build_stretch_stats)
    arr, _ = aa_scene
    arr = np.ascontiguousarray(arr[:, :120, :136])
    cal = CalibrationConfig()
    lut, sp, hist = build_stretch_stats(arr, np.asarray(cal.gains),
                                        np.asarray(cal.biases))
    # native bincount == numpy bincount
    if _native.available():
        for i in range(arr.shape[0]):
            got = _native.hist_u8(arr[i])
            want = np.bincount(arr[i].reshape(-1), minlength=256)
            assert np.array_equal(got, want)
    # host stretched hist == device kernel hist
    st_d, hist_d = lut_hist_pallas(jnp.asarray(arr),
                                   jnp.asarray(lut.astype(np.uint8)),
                                   interpret=True, sp=jnp.asarray(sp))
    assert np.array_equal(np.asarray(hist_d), hist)
    # skip-hist stretched output identical
    st_s = lut_hist_pallas(jnp.asarray(arr),
                           jnp.asarray(lut.astype(np.uint8)),
                           interpret=True, sp=jnp.asarray(sp),
                           skip_hist=True)
    assert np.array_equal(np.asarray(st_s), np.asarray(st_d))


def test_method_batches_host_hist_bit_identical(rng, aa_scene):
    """The kmeans/rule batched programs with host-precomputed stretched
    histograms (build_stretch_stats -> stretch_hists) return maps
    bit-identical to the in-kernel-histogram path (round 4: the same
    skip-hist fast path classify_scenes_turbo already had)."""
    from rs_image_segmentation_tpu.pipeline.preprocess import (
        build_stretch_stats)
    from rs_image_segmentation_tpu.pipeline.turbo import (
        kmeans_scenes_turbo_batch, rule_based_scenes_turbo_batch)
    arr, _ = aa_scene
    a0 = np.ascontiguousarray(arr[:, :180, :200])
    a1 = np.ascontiguousarray(arr[:, 300:480, 200:400])
    cal = CalibrationConfig()
    gains, biases = np.asarray(cal.gains), np.asarray(cal.biases)
    batch = np.stack([a0, a1])
    stats = [build_stretch_stats(s, gains, biases) for s in batch]
    luts = np.stack([p[0] for p in stats]).astype(np.uint8)
    sps = np.stack([p[1] for p in stats])
    hists = np.stack([p[2] for p in stats])

    rb_plain = np.asarray(rule_based_scenes_turbo_batch(
        jnp.asarray(batch), jnp.asarray(luts)))
    rb_hist = np.asarray(rule_based_scenes_turbo_batch(
        jnp.asarray(batch), jnp.asarray(luts),
        stretch_params=jnp.asarray(sps), stretch_hists=jnp.asarray(hists)))
    assert np.array_equal(rb_plain, rb_hist)

    km_plain = np.asarray(kmeans_scenes_turbo_batch(
        jnp.asarray(batch), jnp.asarray(luts), n_clusters=5, fit_stride=4))
    km_hist = np.asarray(kmeans_scenes_turbo_batch(
        jnp.asarray(batch), jnp.asarray(luts), n_clusters=5, fit_stride=4,
        stretch_params=jnp.asarray(sps), stretch_hists=jnp.asarray(hists)))
    assert np.array_equal(km_plain, km_hist)


def test_kmeans_shared_fit_batch(rng, aa_scene):
    """shared_fit=True fits ONE model per batch: duplicated scenes get
    bit-identical maps (same centroids, same data), different scenes get
    maps labeled in ONE shared cluster space, and quality on the bundled
    scene holds the same cluster-majority-mapped kappa gate as the
    per-scene mode (round 4, opt-in departure from the reference's
    per-scene fits — 3_classification.py:377-400)."""
    from rs_image_segmentation_tpu.pipeline.evaluate import (
        ClassificationEvaluator)
    from rs_image_segmentation_tpu.pipeline.turbo import (
        kmeans_scenes_turbo_batch)
    arr, _ = aa_scene
    cal = CalibrationConfig()
    gains, biases = np.asarray(cal.gains), np.asarray(cal.biases)
    batch = np.stack([arr, np.roll(arr, 17, axis=2)])
    luts = np.stack([build_stretch_lut(s, gains, biases).astype(np.uint8)
                     for s in batch])
    got = np.asarray(kmeans_scenes_turbo_batch(
        jnp.asarray(batch), jnp.asarray(luts), n_clusters=7,
        shared_fit=True))
    assert got.shape == (2,) + arr.shape[1:]
    assert got.min() >= 1 and got.max() <= 7
    # the rolled copy contains the same pixel population; in a SHARED
    # cluster space its map must be (nearly) the roll of the first map —
    # per-scene fits cannot promise this (each scene gets its own ids)
    agree = (np.roll(got[0], 17, axis=1) == got[1]).mean()
    assert agree >= 0.98, agree

    roi = np.load("/root/reference/output/ROI/roi_mask.npy")
    valid = roi > 0
    ev = ClassificationEvaluator()
    pred, truth = ev.extract_valid_samples(got[0], roi)
    mapped = ev.map_clusters_to_classes(pred, truth)
    from rs_image_segmentation_tpu.ops.stats import (cohen_kappa,
                                                     confusion_matrix)
    labels = sorted(set(np.unique(truth)) | set(np.unique(mapped)))
    kappa = cohen_kappa(confusion_matrix(truth, mapped, labels))
    assert kappa >= 0.75, kappa
