"""Pallas kernels vs their XLA/NumPy equivalents (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from rs_image_segmentation_tpu.ops.indices import spectral_indices
from rs_image_segmentation_tpu.ops.pallas_kernels import (
    fused_calibrate_stretch, fused_spectral_indices)

ORDER = ["ndvi", "evi", "msavi", "ndwi", "mndwi", "ndbi", "bsi"]


def test_fused_indices_matches_xla():
    # dedicated rng: the shared session rng's state depends on test order,
    # and EVI's guarded denominator can sit near the 1e-3 cutoff where fp
    # reassociation between the XLA and Pallas programs is amplified
    local = np.random.default_rng(123)
    bands = jnp.asarray(local.random((7, 60, 70)).astype(np.float32))
    ref = spectral_indices(bands)
    out = np.asarray(fused_spectral_indices(bands, interpret=True))
    assert out.shape == (7, 60, 70)
    for i, name in enumerate(ORDER):
        r = np.asarray(ref[name])
        # absolute tolerance tight in [-1,1]; relax only where the guard
        # denominator amplifies rounding (values pinned near the clip)
        diff = np.abs(r - out[i])
        assert np.median(diff) < 1e-6, name
        assert diff.max() < 1e-3, name


def test_fused_calibrate_stretch_matches_reference_math(rng):
    from rs_image_segmentation_tpu.core.config import CalibrationConfig
    cfg = CalibrationConfig()
    bands = rng.integers(0, 256, (7, 40, 50)).astype(np.float32)
    out = np.asarray(fused_calibrate_stretch(
        jnp.asarray(bands), np.asarray(cfg.gains),
        np.asarray(cfg.biases), interpret=True))
    for i in range(7):
        cal = cfg.gains[i] * bands[i] + cfg.biases[i]
        ref = (cal - cal.min()) * 255.0 / (cal.max() - cal.min())
        assert np.abs(ref - out[i]).max() < 1e-2, i


def test_glcm_pallas_matches_xla(rng):
    import math
    from rs_image_segmentation_tpu.ops.pallas_kernels import glcm_grid_pallas
    from rs_image_segmentation_tpu.ops.texture import (
        _extract_windows, _offset_for_angle, glcm_matrices, glcm_properties)

    levels, window = 8, 12
    angles = (0.0, math.pi / 4, math.pi / 2, 3 * math.pi / 4)
    offsets = tuple(_offset_for_angle(1, a) for a in angles)
    q = jnp.asarray(rng.integers(0, levels, (48, 60)).astype(np.int32))

    ref_windows = _extract_windows(q, window, window)
    glcm = glcm_matrices(ref_windows, levels, (1,), angles)
    props = glcm_properties(glcm)
    n_i, n_j = 4, 5
    ref = np.stack([np.asarray(jnp.mean(props[k], axis=(1, 2))).reshape(n_i, n_j)
                    for k in ["contrast", "dissimilarity", "homogeneity",
                              "energy", "correlation"]], axis=-1)
    got = np.asarray(glcm_grid_pallas(q, levels, window, window, offsets,
                                      interpret=True))
    assert got.shape == (n_i, n_j, 5)
    assert np.abs(ref - got).max() < 1e-4


def test_lut_hist_pallas_matches_xla(rng):
    """Fused LUT+histogram kernel == apply_u8_lut_mxu + histogram256,
    bit-exact, including pad-correction on non-tile-aligned shapes."""
    import jax.numpy as jnp
    from rs_image_segmentation_tpu.ops.pallas_kernels import lut_hist_pallas
    from rs_image_segmentation_tpu.pipeline.turbo import (apply_u8_lut_mxu,
                                                          histogram256)
    # the last shape exceeds 2^22 px, exercising the large-block branch
    # (blkr=256: different padding and per-block count bounds)
    for shape in [(7, 50, 77), (3, 128, 128), (1, 600, 600),
                  (1, 2050, 2048)]:
        scene = rng.integers(0, 256, shape).astype(np.uint8)
        lut = rng.integers(0, 256, (shape[0], 256)).astype(np.uint8)
        st, hist = lut_hist_pallas(jnp.asarray(scene), jnp.asarray(lut),
                                   interpret=True)
        ref_st = np.asarray(apply_u8_lut_mxu(jnp.asarray(scene),
                                             jnp.asarray(lut)))
        ref_h = np.asarray(histogram256(jnp.asarray(ref_st)))
        assert np.array_equal(np.asarray(st), ref_st.astype(np.float32)), shape
        assert np.array_equal(np.asarray(hist).astype(np.int64),
                              ref_h.astype(np.int64)), shape
        # uint8-output variant (whole-scene preprocess path): same values
        st8, hist8 = lut_hist_pallas(jnp.asarray(scene), jnp.asarray(lut),
                                     interpret=True, out_u8=True)
        assert st8.dtype == jnp.uint8
        assert np.array_equal(np.asarray(st8), ref_st.astype(np.uint8)), shape
        assert np.array_equal(np.asarray(hist8), np.asarray(hist)), shape


def test_forest_labels_pallas_matches_gemm_route():
    """Fused forest kernel == the XLA three-matmul route, bit-for-bit,
    including argmax tie-breaking (Mosaic's argmax breaks ties by last
    index; the kernel implements first-index explicitly)."""
    from rs_image_segmentation_tpu.models.forest import (_gemm_for,
                                                         fit_random_forest)
    from rs_image_segmentation_tpu.ops.pallas_kernels import (
        forest_block_n, forest_labels_pallas)
    from rs_image_segmentation_tpu.pipeline.turbo import gemm_labels_cm

    rng = np.random.default_rng(7)
    x = rng.random((64, 19)).astype(np.float32)
    y = rng.integers(1, 4, 64)
    forest, _ = fit_random_forest(x, y, n_estimators=20, seed=0)
    gf = _gemm_for(forest, 19)
    assert forest_block_n(gf.selector.shape[1], gf.leaf_dist.shape[0]) > 0

    xc = jnp.asarray(rng.random((19, 7000)).astype(np.float32))
    ref = np.asarray(gemm_labels_cm(gf, xc, 2048))
    out = np.asarray(forest_labels_pallas(gf, xc, block_n=256,
                                          interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_forest_labels_pallas_tie_break_is_first_index():
    """Even-tree forests produce exact vote ties; sklearn (and the XLA
    route) resolve them to the lowest class index."""
    from rs_image_segmentation_tpu.models.forest import (_gemm_for,
                                                         fit_random_forest)
    from rs_image_segmentation_tpu.ops.pallas_kernels import (
        forest_labels_pallas)
    from rs_image_segmentation_tpu.pipeline.turbo import gemm_labels_cm

    rng = np.random.default_rng(11)
    # 2 estimators + random labels -> frequent 1-1 vote splits
    x = rng.random((32, 19)).astype(np.float32)
    y = rng.integers(1, 4, 32)
    forest, _ = fit_random_forest(x, y, n_estimators=2, seed=1)
    gf = _gemm_for(forest, 19)
    xc = jnp.asarray(rng.random((19, 4096)).astype(np.float32))
    ref = np.asarray(gemm_labels_cm(gf, xc, 1024))
    out = np.asarray(forest_labels_pallas(gf, xc, block_n=128,
                                          interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_forest_labels_pallas_fractional_leaf_dist():
    """Impure leaves (contradictory duplicate samples) give fractional
    leaf distributions; the kernel's VPU contraction must still match."""
    from rs_image_segmentation_tpu.models.forest import (_gemm_for,
                                                         fit_random_forest)
    from rs_image_segmentation_tpu.ops.pallas_kernels import (
        forest_labels_pallas)
    from rs_image_segmentation_tpu.pipeline.turbo import gemm_labels_cm

    rng = np.random.default_rng(3)
    x_half = rng.random((24, 19)).astype(np.float32)
    x = np.concatenate([x_half, x_half])        # duplicates...
    y = rng.integers(1, 4, 48)                  # ...with clashing labels
    forest, _ = fit_random_forest(x, y, n_estimators=10, seed=2)
    gf = _gemm_for(forest, 19)
    assert not np.all(np.isin(np.asarray(gf.leaf_dist), (0.0, 1.0))), \
        "fixture failed to produce impure leaves"
    xc = jnp.asarray(rng.random((19, 4096)).astype(np.float32))
    ref = np.asarray(gemm_labels_cm(gf, xc, 1024))
    out = np.asarray(forest_labels_pallas(gf, xc, block_n=128,
                                          interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_forest_tree_plan_covers_forest():
    """The grouping plan must partition internal-node columns and leaf
    rows exactly, with every group covering whole trees (block-diagonal
    support: no leaf references a column outside its group)."""
    from rs_image_segmentation_tpu.models.forest import (_gemm_for,
                                                         fit_random_forest,
                                                         forest_tree_plan)

    rng = np.random.default_rng(17)
    x = rng.random((200, 19)).astype(np.float32)
    y = rng.integers(1, 4, 200)
    forest, _ = fit_random_forest(x, y, n_estimators=60, seed=0)
    gf = _gemm_for(forest, 19)
    plan = forest_tree_plan(gf)
    assert plan is not None and len(plan) > 1
    m, l = gf.path.shape[0], gf.path.shape[1]
    assert plan[0][0] == 0 and plan[0][2] == 0
    for i in range(1, len(plan)):
        assert plan[i][0] == plan[i - 1][0] + plan[i - 1][1]
        assert plan[i][2] == plan[i - 1][2] + plan[i - 1][3]
    assert plan[-1][0] + plan[-1][1] == m
    assert plan[-1][2] + plan[-1][3] == l
    path = np.asarray(gf.path.astype(jnp.float32))
    for mo, mc, lo, lc in plan:
        block = path[:, lo:lo + lc]
        cols = np.flatnonzero((block != 0).any(axis=1))
        assert cols.min() >= mo and cols.max() < mo + mc


def test_forest_labels_grouped_matches_dense():
    """The tree-grouped block-diagonal kernel == the dense kernel == the
    XLA route, bit-for-bit (pure and impure leaves, tie-breaking)."""
    from rs_image_segmentation_tpu.models.forest import (_gemm_for,
                                                         fit_random_forest,
                                                         forest_tree_plan)
    from rs_image_segmentation_tpu.ops.pallas_kernels import (
        forest_block_n, forest_labels_pallas)
    from rs_image_segmentation_tpu.pipeline.turbo import gemm_labels_cm

    rng = np.random.default_rng(23)
    x = rng.random((120, 19)).astype(np.float32)
    y = rng.integers(1, 4, 120)
    forest, _ = fit_random_forest(x, y, n_estimators=40, seed=0)
    gf = _gemm_for(forest, 19)
    plan = forest_tree_plan(gf)
    assert plan is not None and len(plan) > 1
    assert forest_block_n(gf.selector.shape[1], gf.leaf_dist.shape[0],
                          plan=plan) > 0
    xc = jnp.asarray(rng.random((19, 7000)).astype(np.float32))
    ref = np.asarray(gemm_labels_cm(gf, xc, 2048))
    dense = np.asarray(forest_labels_pallas(gf, xc, block_n=256,
                                            interpret=True))
    grouped = np.asarray(forest_labels_pallas(gf, xc, block_n=256,
                                              interpret=True, plan=plan))
    np.testing.assert_array_equal(dense, ref)
    np.testing.assert_array_equal(grouped, ref)


def test_build_stretch_params_reproduces_lut():
    """mode=1 bands' fixed-point params must reproduce the exact f64 LUT
    for every DN PRESENT in the band (the turbo contract: luts/params
    are built from the scene they preprocess); unfittable bands must be
    routed to mode=0 rather than approximated."""
    from rs_image_segmentation_tpu.core.config import CalibrationConfig
    from rs_image_segmentation_tpu.pipeline.preprocess import (
        STRETCH_FIXUPS, build_stretch_params)

    cal = CalibrationConfig()
    k = STRETCH_FIXUPS
    # narrow-range scenes: generic slopes, every band fits (mode 1)
    for seed in range(4):
        scene = np.random.default_rng(seed).integers(
            17, 201, (7, 64, 64)).astype(np.uint8)
        lut, sp = build_stretch_params(scene, np.asarray(cal.gains),
                                       np.asarray(cal.biases))
        assert sp.shape == (7, 3 + 2 * k)
        assert (sp[:, 0] == 1).all(), sp[:, 0]
        for i in range(7):
            v = np.arange(int(scene[i].min()), int(scene[i].max()) + 1,
                          dtype=np.int64)
            cand = np.clip((int(sp[i, 1]) * v + int(sp[i, 2])) >> 16,
                           0, 255)
            for f in range(k):
                cand = cand + np.where(v == sp[i, 3 + f],
                                       sp[i, 3 + k + f], 0)
            np.testing.assert_array_equal(cand, lut[i, v].astype(np.int64))

    # full-range bands: stretch slope exactly 1.0, f64 staircase is
    # irregular -> must fall back to the table path (mode 0)
    wide = np.random.default_rng(9).integers(0, 256, (7, 64, 64)
                                             ).astype(np.uint8)
    wide[:, 0, 0] = 0
    wide[:, 0, 1] = 255
    _, spw = build_stretch_params(wide, np.asarray(cal.gains),
                                  np.asarray(cal.biases))
    assert (spw[:, 0] == 0).any()

    # a constant band has no stretch slope -> mode 0
    flat = np.full((7, 16, 16), 7, np.uint8)
    _, spf = build_stretch_params(flat, np.asarray(cal.gains),
                                  np.asarray(cal.biases))
    assert (spf[:, 0] == 0).all()


def test_lut_hist_mixed_kernel_matches_table_kernel():
    """The mixed (per-band arithmetic/table) kernel must equal the pure
    table kernel bit-for-bit (stretched values AND histogram), f32 and
    u8 outputs, including scenes that mix mode-1 and mode-0 bands."""
    from rs_image_segmentation_tpu.core.config import CalibrationConfig
    from rs_image_segmentation_tpu.ops.pallas_kernels import lut_hist_pallas
    from rs_image_segmentation_tpu.pipeline.preprocess import (
        build_stretch_params)

    cal = CalibrationConfig()
    rng = np.random.default_rng(31)
    # narrow bands (all arith) AND a full-range band (table fallback)
    scene = rng.integers(17, 201, (7, 70, 90)).astype(np.uint8)
    scene[4, 0, 0] = 0
    scene[4, 0, 1] = 255
    lut, sp = build_stretch_params(scene, np.asarray(cal.gains),
                                   np.asarray(cal.biases))
    assert (sp[:, 0] == 1).any() and (sp[:, 0] == 0).any()
    lut_u8 = jnp.asarray(lut.astype(np.uint8))
    sd = jnp.asarray(scene)
    st_t, h_t = lut_hist_pallas(sd, lut_u8, interpret=True)
    st_a, h_a = lut_hist_pallas(sd, lut_u8, interpret=True,
                                sp=jnp.asarray(sp))
    np.testing.assert_array_equal(np.asarray(st_t), np.asarray(st_a))
    np.testing.assert_array_equal(np.asarray(h_t), np.asarray(h_a))
    st8_t, h8_t = lut_hist_pallas(sd, lut_u8, interpret=True, out_u8=True)
    st8_a, h8_a = lut_hist_pallas(sd, lut_u8, interpret=True, out_u8=True,
                                  sp=jnp.asarray(sp))
    assert st8_a.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(st8_t), np.asarray(st8_a))
    np.testing.assert_array_equal(np.asarray(h8_t), np.asarray(h8_a))


def test_cc_pallas_matches_xla_random(rng):
    from rs_image_segmentation_tpu.ops.components import connected_components
    from rs_image_segmentation_tpu.ops.pallas_kernels import cc_pallas
    for shape, p in [((64, 64), 0.5), ((200, 300), 0.6), ((130, 257), 0.4)]:
        m = jnp.asarray(rng.random(shape) < p)
        for conn in (8, 4):
            ref = np.asarray(connected_components(m, connectivity=conn))
            got = np.asarray(cc_pallas(m, connectivity=conn, interpret=True))
            assert np.array_equal(ref, got), (shape, conn)


def test_cc_pallas_structured_masks():
    # adversarial geometries: labels must cross strip boundaries many
    # times (spiral), plus degenerate empty/full masks
    from rs_image_segmentation_tpu.ops.components import connected_components
    from rs_image_segmentation_tpu.ops.pallas_kernels import cc_pallas

    def spiral(h, w):
        m = np.zeros((h, w), bool)
        top, bot, lef, rig = 0, h - 1, 0, w - 1
        while top <= bot and lef <= rig:
            m[top, lef:rig + 1] = True
            m[top:bot + 1, rig] = True
            m[bot, lef:rig + 1] = True
            m[top:bot + 1, lef] = True
            top += 2
            bot -= 2
            lef += 2
            rig -= 2
        return m

    serp = np.zeros((300, 140), bool)
    serp[::2, :] = True
    serp[1::4, -1] = True
    serp[3::4, 0] = True
    for m in [spiral(300, 300), np.zeros((150, 150), bool),
              np.ones((150, 150), bool), serp]:
        mj = jnp.asarray(m)
        for conn in (8, 4):
            ref = np.asarray(connected_components(mj, connectivity=conn))
            got = np.asarray(cc_pallas(mj, connectivity=conn, interpret=True))
            assert np.array_equal(ref, got), conn


def test_rule_based_cc_impl_choices_agree(rng):
    # the cc_impl knob must not change the class map
    import cv2
    from rs_image_segmentation_tpu.core.config import RuleBasedConfig
    from rs_image_segmentation_tpu.pipeline.classify import rule_based_classify

    base = rng.standard_normal((120, 130)).astype(np.float32)
    smooth = cv2.GaussianBlur(base, (21, 21), 5)
    ndvi = jnp.asarray(np.clip(smooth * 2.0, -1, 1))
    ndwi = jnp.asarray(np.clip(-smooth * 1.5 + 0.1, -1, 1))
    mndwi = jnp.asarray(np.clip(-smooth * 1.8 + 0.05, -1, 1))
    ndbi = jnp.asarray(np.clip(np.roll(smooth, 31, axis=1) * 1.7, -1, 1))
    cfg = RuleBasedConfig()
    a = np.asarray(rule_based_classify(ndvi, ndwi, mndwi, ndbi, cfg,
                                       cc_impl="xla"))
    b = np.asarray(rule_based_classify(ndvi, ndwi, mndwi, ndbi, cfg,
                                       cc_impl="pallas"))
    assert np.array_equal(a, b)


def test_cc_pallas_wide_mask_adaptive_strips(rng):
    # >4096-wide masks shrink the strip height to stay inside scoped
    # VMEM (_cc_strip_rows); exercise the bh<128 path with several strips
    from rs_image_segmentation_tpu.ops.components import connected_components
    from rs_image_segmentation_tpu.ops.pallas_kernels import (_cc_strip_rows,
                                                              cc_pallas)
    assert _cc_strip_rows(640) == 256
    assert _cc_strip_rows(6016) < 256
    w = 4224
    assert _cc_strip_rows(w) < 256
    m = np.zeros((130, w), bool)
    m[::3, :] = True            # row stripes spanning the full width
    m[:, ::97] = True           # columns stitching them into one component
    m[60:70, 1000:3000] = False
    mj = jnp.asarray(m)
    ref = np.asarray(connected_components(mj))
    got = np.asarray(cc_pallas(mj, interpret=True))
    assert np.array_equal(ref, got)


def test_remove_small_components_batch_bins_cap():
    """The bins cap drops components whose first-run rank reaches bins —
    pinned with a tiny bins: heavy run-noise ranked before a large blob
    pushes the blob's id past the cap (dropped despite its area), while
    the default 32768 keeps it. impl="pallas" because the cap lives in
    the scatter-free TPU route (interpret mode off-TPU); the XLA
    fallback has no cap."""
    from rs_image_segmentation_tpu.ops.components import (
        remove_small_components_batch)

    m = np.zeros((1, 40, 64), np.uint8)
    m[0, 0:20, ::2] = 1            # 20 rows x 32 isolated 1-px runs = 640 runs
    m[0, 30:40, 10:40] = 1         # a 300-px blob ranked AFTER the noise
    ma = jnp.asarray([50], jnp.int32)

    kept_default = np.asarray(remove_small_components_batch(
        jnp.asarray(m), ma, impl="pallas"))
    assert kept_default[0, 30:40, 10:40].all()      # blob survives min-area
    assert not kept_default[0, 0:20].any()          # noise dropped (area 1)

    kept_capped = np.asarray(remove_small_components_batch(
        jnp.asarray(m), ma, bins=128, impl="pallas"))
    assert not kept_capped.any()   # blob's rank (640) >= 128: dropped too


def test_remove_small_components_batch_overflow_flag():
    """return_overflow marks exactly the masks where the bins cap
    engaged (a propagated first-run rank >= bins); the uncapped XLA
    route never flags; a non-multiple-of-128 bins raises (the (hi, lo)
    one-hot decomposition works in 128-wide lane tiles)."""
    import pytest

    from rs_image_segmentation_tpu.ops.components import (
        remove_small_components_batch)

    m = np.zeros((2, 40, 64), np.uint8)
    m[0, 0:20, ::2] = 1            # 640 noise runs ranked first
    m[0, 30:40, 10:40] = 1         # a blob ranked past bins=128
    m[1, 5:15, 5:25] = 1           # mask-relative rank 0: no overflow
    ma = jnp.asarray([50, 50], jnp.int32)

    kept, ov = remove_small_components_batch(
        jnp.asarray(m), ma, bins=128, impl="pallas", return_overflow=True)
    assert np.asarray(ov).tolist() == [True, False]
    assert not np.asarray(kept)[0, 30:40].any()      # blob wrongly dropped
    assert np.asarray(kept)[1, 5:15, 5:25].all()     # clean mask exact

    _, ov_xla = remove_small_components_batch(
        jnp.asarray(m), ma, bins=128, impl="xla", return_overflow=True)
    assert not np.asarray(ov_xla).any()

    with pytest.raises(ValueError, match="multiple of 128"):
        remove_small_components_batch(jnp.asarray(m), ma, bins=100,
                                      impl="pallas")


def test_ccmin_prop_coarse_seed_bit_identical(rng):
    """Coarse-to-fine seeding (round-5 VERDICT #2): a min-propagation
    over the solid-cell coarse graph refines the seed without changing
    the fixed point — outputs must be bit-identical to the unseeded
    propagation for any factor and connectivity."""
    import jax

    from rs_image_segmentation_tpu.ops.pallas_kernels import (
        ccmin_prop_pallas)
    interp = jax.default_backend() != "tpu"
    base = rng.random((16, 16)) > 0.45
    m = np.kron(base, np.ones((8, 8), bool))
    m ^= rng.random((128, 128)) > 0.97          # speckle edges
    m = m.astype(np.uint8)
    v = rng.integers(0, 1000, (128, 128)).astype(np.int32)
    for conn in (8, 4):
        ref = np.asarray(ccmin_prop_pallas(jnp.asarray(m), jnp.asarray(v),
                                           connectivity=conn,
                                           interpret=interp))
        for f in (2, 4):
            got = np.asarray(ccmin_prop_pallas(
                jnp.asarray(m), jnp.asarray(v), connectivity=conn,
                interpret=interp, coarse=f))
            np.testing.assert_array_equal(ref, got)


def test_ccmin_prop_sweep_bit_identical(rng):
    """The sequential down/up boundary sweep (round-5 VERDICT #2; the
    production setting of remove_small_components_batch) must be
    bit-identical to the pure halo-exchange schedule on a MULTI-STRIP
    mask, including at a low inner-round bound (the chg-flag threading
    that a skipped up-sweep strip must preserve — the round-5 bug this
    pins)."""
    import jax

    from rs_image_segmentation_tpu.ops.pallas_kernels import (
        _cc_strip_rows, ccmin_prop_pallas)
    interp = jax.default_backend() != "tpu"
    h, w = 600, 128
    assert h > 2 * _cc_strip_rows(w)        # sweep path really engages
    base = rng.random((75, 16)) > 0.4
    m = np.kron(base, np.ones((8, 8), bool))
    m ^= rng.random((h, w)) > 0.97
    m = m.astype(np.uint8)
    v = rng.integers(0, 30000, (h, w)).astype(np.int32)
    for conn, n_inner in ((8, 16), (8, 2), (4, 16)):
        ref = np.asarray(ccmin_prop_pallas(
            jnp.asarray(m), jnp.asarray(v), connectivity=conn,
            interpret=interp, n_inner=n_inner))
        got = np.asarray(ccmin_prop_pallas(
            jnp.asarray(m), jnp.asarray(v), connectivity=conn,
            interpret=interp, n_inner=n_inner, sweep=True))
        np.testing.assert_array_equal(ref, got)
