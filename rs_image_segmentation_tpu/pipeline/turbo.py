"""Deployment-shape fused classifier: channel-major, sort-free, gather-free.

The standard stage graphs (``pipeline.features`` / ``pipeline.classify``)
mirror the reference's artifact contract: HWC feature stacks, per-family
device programs, percentile ops over raw pixels. Those shapes are exactly
what a TPU dislikes:

  * (H, W, 19) f32 stacks put 19 in the lane (minor) dimension, which the
    TPU pads to 128 — a 6.7x memory/bandwidth tax on every materialization
    (measured: the final HWC assembly dominated the fused stack's runtime).
  * ``jnp.percentile`` sorts 360k pixels per band.
  * 256-entry LUT application via gather lowers to an XLA gather that runs
    at <100 MB/s on TPU (measured 17-27 ms/scene).

This module keeps the entire classification program in the TPU's preferred
shapes, exploiting the stage-1 contract that scenes are uint8-valued
(preprocessing.py:101-125 stretches to 0..255):

  * LUT application is an exact one-hot @ table matmul on the MXU: the
    one-hot and a u8-valued table are both exactly representable in bf16,
    so the gather-equivalent result is bit-exact at ~15x the gather speed.
  * Every percentile (robust-normalize p2/p98, RobustScaler median/IQR,
    the texture re-normalize) is computed from a 256-bin histogram
    (eq-reduce, no sort, no scatter) with np.percentile's linear
    interpolation — the same histogram trick ``pipeline.large_scene`` uses
    on the host (pass A), here fused into the device program.
  * All imagery stays (C, H, W) channel-major; the 19-channel stack is
    never interleaved into HWC. The forest GEMM (models/forest.py) runs
    transposed — sel^T @ X, path^T @ S, dist^T @ F over (19, pixels)
    column blocks — so no layout change ever materializes.

Numerics: identical formulas to the standard path; only summation orders
differ (histogram-weighted vs sorted-pairwise percentile interpolation at
f32), so feature values match to ~1e-6 and class maps to >99.9 %
(tested against the standard path and the bundled reference artifacts).

Reference call sites covered: scripts/2_feature_extraction.py:27-133,
modules/features/indices.py:25-246,760-865, extract.py:690-719.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rs_image_segmentation_tpu.core.config import FeatureStageConfig
from rs_image_segmentation_tpu.models.forest import GemmForest
from rs_image_segmentation_tpu.ops.indices import spectral_indices
from rs_image_segmentation_tpu.ops.morphology import gradient
from rs_image_segmentation_tpu.ops.stencil import box_filter, sobel_magnitude
from rs_image_segmentation_tpu.ops.texture import glcm_feature_maps

_HIGH = jax.lax.Precision.HIGHEST


def _mm_dtype():
    """bf16 on the MXU; f32 elsewhere (XLA:CPU's DotThunk rejects
    bf16 x bf16 -> f32 for some shapes). Both are exact for the 0/1 and
    integer-valued operands used here."""
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


# ------------------------------------------------------------ primitives

def apply_u8_lut_mxu(planes_u8: jnp.ndarray, lut_u8: jnp.ndarray
                     ) -> jnp.ndarray:
    """Exact (C, H, W) uint8 -> uint8 LUT application as a one-hot matmul.

    Integers 0..255 and {0,1} indicators are exact in bf16, and the f32
    accumulation of a single non-zero product is exact, so this equals the
    gather bit-for-bit while running on the MXU (~15x faster than XLA's
    TPU gather lowering for this shape)."""
    c, h, w = planes_u8.shape
    dt = _mm_dtype()
    oh = (planes_u8.reshape(c, -1)[:, :, None]
          == jnp.arange(256, dtype=planes_u8.dtype)).astype(dt)
    out = jnp.einsum("cnk,ck->cn", oh, lut_u8.astype(dt),
                     preferred_element_type=jnp.float32)
    return out.astype(jnp.uint8).reshape(c, h, w)


def histogram256(planes_u8: jnp.ndarray) -> jnp.ndarray:
    """(C, H, W) uint8 -> (C, 256) int32 counts via eq-reduce (no scatter).

    int32, not f32: counts and their cumsum must stay exact for scenes
    beyond 2^24 pixels (f32 integers saturate there), and the percentile
    rank comparisons below are integer comparisons.

    Planes beyond 2^21 px reduce in lax.map blocks: XLA does not fuse the
    (C, 256, N) compare into the reduction at large N (it tried to
    materialize 20+ GB for a 21 MP tile)."""
    c = planes_u8.shape[0]
    n = planes_u8.size // c
    levels = jnp.arange(256, dtype=planes_u8.dtype)
    if n <= (1 << 21):
        flat = planes_u8.reshape(c, 1, -1)
        return jnp.sum((flat == levels.reshape(1, 256, 1)).astype(jnp.int32),
                       axis=2)
    blk = 1 << 20
    pad = (-n) % blk
    # pad with 0 and subtract the padding from bin 0 afterwards
    flat = jnp.pad(planes_u8.reshape(c, -1), ((0, 0), (0, pad)))
    blocks = jnp.moveaxis(flat.reshape(c, -1, blk), 1, 0)   # (nb, C, blk)
    part = jax.lax.map(
        lambda b: jnp.sum((b[:, None, :] == levels[None, :, None]
                           ).astype(jnp.int32), axis=2), blocks)
    hist = jnp.sum(part, axis=0)
    return hist.at[:, 0].add(-pad)


def percentiles_from_counts(counts: jnp.ndarray, values: jnp.ndarray,
                            qs: Sequence[float], n: int) -> jnp.ndarray:
    """np.percentile(method='linear') over per-band value multisets.

    counts: (C, 256) integer occurrence counts; values: (C, 256) ASCENDING
    values per band; qs: static percentiles; n: static total count. Returns
    (len(qs), C). Interpolation form matches ops.normalize.percentile
    (v_lo*(1-frac) + v_hi*frac). Ranks compare as exact int32 (scenes up
    to 2^31 px)."""
    cum = jnp.cumsum(counts.astype(jnp.int32), axis=1)
    out = []
    for q in qs:
        pos = q / 100.0 * (n - 1)
        lo = math.floor(pos)
        hi = math.ceil(pos)
        frac = np.float32(pos - lo)
        idx_lo = jnp.sum((cum < lo + 1).astype(jnp.int32), axis=1)
        idx_hi = jnp.sum((cum < hi + 1).astype(jnp.int32), axis=1)
        v_lo = jnp.take_along_axis(values, idx_lo[:, None], axis=1)[:, 0]
        v_hi = jnp.take_along_axis(values, idx_hi[:, None], axis=1)[:, 0]
        out.append(v_lo * (1.0 - frac) + v_hi * frac)
    return jnp.stack(out)


# ------------------------------------------------------- feature stack

def _preamble(scene_u8: jnp.ndarray, stretch_lut_u8: jnp.ndarray,
              sp=None, hist=None):
    """Stretch LUT + histogram. On TPU this is ONE fused Pallas pass over
    the scene (ops.pallas_kernels.lut_hist_pallas — the one-hot feeding
    the exact LUT matmul yields the histogram for free, bit-identical and
    measured 1.7x the two-pass XLA lowering); elsewhere the XLA pair.
    ``sp``: optional fixed-point stretch params
    (``pipeline.preprocess.build_stretch_params``) — the arithmetic
    kernel variant, ~6x faster, bit-exact for the scene's DNs.
    ``hist``: optional host-precomputed (C, 256) int32 stretched-value
    histogram (``build_stretch_stats``, exact) — the kernel then skips
    histogram accumulation, and arithmetic-routed bands skip their
    one-hot planes (the bulk of the remaining preamble cost)."""
    if jax.default_backend() == "tpu":
        from rs_image_segmentation_tpu.ops.pallas_kernels import (
            lut_hist_pallas)
        if hist is not None and sp is not None:
            st = lut_hist_pallas(scene_u8, stretch_lut_u8, sp=sp,
                                 skip_hist=True)
            return st, hist
        return lut_hist_pallas(scene_u8, stretch_lut_u8, sp=sp)
    st = apply_u8_lut_mxu(scene_u8, stretch_lut_u8)
    return st.astype(jnp.float32), (histogram256(st) if hist is None
                                    else hist)


def _stack_cm_from_stretched(stretched_u8: jnp.ndarray,
                             cfg: FeatureStageConfig) -> jnp.ndarray:
    """(7, H, W) stretched-uint8 scene -> (19, H, W) hierarchical stack,
    channel-major, no sorts/gathers. Channel order identical to
    ``pipeline.features.hierarchical_stack_fused`` (reference
    indices.py:808-865,760-776)."""
    return _stack_cm_from_parts(stretched_u8.astype(jnp.float32),
                                histogram256(stretched_u8), cfg)


def _stack_cm_from_parts(stretched_f32: jnp.ndarray, hist: jnp.ndarray,
                         cfg: FeatureStageConfig) -> jnp.ndarray:
    """Stack core over a pre-stretched scene (f32 holding exact uint8
    levels) and its per-band 256-bin histogram — the two artifacts the
    fused Pallas preamble produces in one HBM pass."""
    c, h, w = stretched_f32.shape
    n = h * w
    eps = cfg.normalize.epsilon
    levels = jnp.arange(256, dtype=jnp.float32)

    vals = jnp.broadcast_to(levels, (c, 256))
    p = percentiles_from_counts(hist, vals,
                                (cfg.normalize.lower_percentile,
                                 cfg.normalize.upper_percentile), n)
    lo, hi = p[0][:, None, None], p[1][:, None, None]
    x = stretched_f32
    bands01 = (jnp.clip(x, lo, hi) - lo) / (hi - lo + eps)
    # per-level normalized values (for histogram-space stats downstream)
    norm_vals = ((jnp.clip(vals, p[0][:, None], p[1][:, None])
                  - p[0][:, None])
                 / (p[1][:, None] - p[0][:, None] + eps))   # (7, 256)

    idx = spectral_indices(bands01)

    # --- PCA: RobustScaler stats from the histogram, Gram on the MXU ----
    q = percentiles_from_counts(hist, norm_vals, (25.0, 50.0, 75.0), n)
    iqr = q[2] - q[0]
    scale = jnp.where(iqr > 0, iqr, 1.0)
    xs = (bands01 - q[1][:, None, None]) / scale[:, None, None]
    xs_vals = (norm_vals - q[1][:, None]) / scale[:, None]
    mean = jnp.sum(hist.astype(jnp.float32) * xs_vals, axis=1) / n  # (7,)
    xc = xs - mean[:, None, None]
    flat = xc.reshape(c, -1)
    cov = jnp.dot(flat, flat.T, preferred_element_type=jnp.float32,
                  precision=_HIGH) / (n - 1)
    eigvals, eigvecs = jnp.linalg.eigh(cov)
    comp0 = eigvecs[:, jnp.argmax(eigvals)]
    sign = jnp.sign(comp0[jnp.argmax(jnp.abs(comp0))])
    comp0 = comp0 * jnp.where(sign == 0, 1.0, sign)         # svd_flip
    pc1 = jnp.einsum("c,chw->hw", comp0, xc, precision=_HIGH)

    # --- texture branch (NIR; reference hardcodes it, 2_feature:84) ------
    tb = cfg.texture_band_index
    tq = percentiles_from_counts(hist[tb:tb + 1], norm_vals[tb:tb + 1],
                                 (cfg.normalize.lower_percentile,
                                  cfg.normalize.upper_percentile), n)
    tlo, thi = tq[0, 0], tq[1, 0]
    tex01 = (jnp.clip(bands01[tb], tlo, thi) - tlo) / (thi - tlo + eps)

    glcm = glcm_feature_maps(tex01, cfg.glcm.levels, cfg.glcm.window_size,
                             cfg.glcm.step_size, cfg.glcm.distances,
                             cfg.glcm.angles)
    u8t = (tex01 * 255.0).astype(jnp.uint8)
    grad5 = gradient(u8t, 5).astype(jnp.float32) / 255.0
    mean5 = box_filter(tex01, 5)
    std5 = jnp.sqrt(jnp.maximum(box_filter(tex01 * tex01, 5)
                                - mean5 * mean5, 0.0))
    smag = sobel_magnitude(u8t.astype(jnp.float32)) / 255.0
    smag = smag / (jnp.max(smag) + 1e-10)

    level_1 = jnp.stack([idx["ndwi"], idx["mndwi"], idx["ndvi"], idx["evi"],
                         idx["ndbi"], idx["bsi"], pc1])     # (7, H, W)
    ctx = box_filter(level_1, cfg.context.window_size, border="reflect")
    level_2 = jnp.stack([glcm["contrast"], glcm["homogeneity"], grad5,
                         std5, smag])                       # (5, H, W)
    return jnp.concatenate([level_1, ctx, level_2])         # (19, H, W)


@functools.partial(jax.jit, static_argnames=("cfg",))
def hierarchical_stack_turbo_cm(scene_u8: jnp.ndarray,
                                stretch_lut_u8: jnp.ndarray,
                                cfg: FeatureStageConfig = FeatureStageConfig()
                                ) -> jnp.ndarray:
    """(7, H, W) RAW uint8 scene + (7, 256) exact stretch LUT (see
    ``pipeline.preprocess.build_stretch_lut``) -> (19, H, W) stack."""
    stretched, hist = _preamble(scene_u8, stretch_lut_u8)
    return _stack_cm_from_parts(stretched, hist, cfg)


# ------------------------------------------------- transposed forest GEMM

def gemm_labels_cm(gf: GemmForest, x_cm: jnp.ndarray,
                   chunk: int = 32768, plan=None) -> jnp.ndarray:
    """Forest predict over channel-major features: (F, N) -> (N,) labels.

    Same three-matmul chain as ``models.forest._gemm_block_proba`` but
    transposed, so the pixel axis stays in lanes and the (*, F=19) operand
    never materializes. Bit-matches the row-major GEMM (tested).

    On TPU, forests whose padded working set fits VMEM route to the fused
    Pallas kernel (ops.pallas_kernels.forest_labels_pallas): XLA cannot
    fuse across the chain's two matmuls, so this lowering materializes the
    (M, N) comparison and (L, N) vote tensors in HBM — measured 45 ms vs
    5.6 ms fused at the 8-scene bench shape (identical labels).

    ``plan``: static tree-group plan (models.forest.forest_tree_plan) for
    the block-diagonal kernel; auto-derived here when ``gf`` is concrete
    (traced callers must thread it from outside the trace)."""
    if jax.default_backend() == "tpu" and gf.leaf_dist.shape[1] <= 8:
        # >8 classes would need a wider pad in the kernel's (L_pad, 8)
        # dist layout; such forests take the XLA route below
        from rs_image_segmentation_tpu.models.forest import forest_tree_plan
        from rs_image_segmentation_tpu.ops.pallas_kernels import (
            forest_block_n, forest_labels_pallas)
        if plan is None:
            plan = forest_tree_plan(gf)   # None under an active trace
        bn = forest_block_n(gf.selector.shape[1], gf.leaf_dist.shape[0],
                            plan=plan)
        if bn:
            return forest_labels_pallas(gf, x_cm, block_n=bn, plan=plan)
    f, n = x_cm.shape
    pad = (-n) % chunk
    xp = jnp.pad(x_cm, ((0, 0), (0, pad)))
    blocks = jnp.moveaxis(xp.reshape(f, -1, chunk), 1, 0)   # (nb, F, chunk)
    dt = _mm_dtype()
    sel_t = gf.selector.astype(jnp.float32).T               # (M, F)
    path_t = gf.path.T.astype(dt)                           # (L, M)
    dist_t = gf.leaf_dist.T                                 # (C, L)

    def one(xb):
        xv = jnp.dot(sel_t, xb.astype(jnp.float32),
                     preferred_element_type=jnp.float32, precision=_HIGH)
        s = jnp.where(xv <= gf.thresholds[:, None], 1.0, -1.0
                      ).astype(dt)
        votes = jnp.dot(path_t, s, preferred_element_type=jnp.float32)
        fired = (votes == gf.path_len[:, None]).astype(jnp.float32)
        total = jnp.dot(dist_t, fired, preferred_element_type=jnp.float32,
                        precision=_HIGH) * gf.inv_trees
        return gf.classes[jnp.argmax(total, axis=0)]

    out = jax.lax.map(one, blocks)
    return out.reshape(-1)[:n]


# ---------------------------------------------------------- full program

def classify_scenes_turbo(scenes_u8: jnp.ndarray, stretch_luts_u8: jnp.ndarray,
                          gf: GemmForest,
                          cfg: FeatureStageConfig = FeatureStageConfig(),
                          chunk: int = 32768,
                          stretch_params=None,
                          stretch_hists=None) -> jnp.ndarray:
    """ONE device program: (B, 7, H, W) raw uint8 scenes + (B, 7, 256)
    stretch LUTs -> (B, H, W) uint8 class maps. Preprocess, 19-channel
    feature extraction, and forest inference fused, channel-major
    throughout. Thin wrapper: derives the static tree-group plan from a
    concrete forest (None under an outer trace) and dispatches to the
    jitted program. ``stretch_params``: optional (B, 7, 2+2K) int32
    fixed-point stretch params (build_stretch_params) for the ~6x
    faster arithmetic preamble. ``stretch_hists``: optional (B, 7, 256)
    int32 host-precomputed stretched-value histograms
    (build_stretch_stats) — drops in-kernel histogram accumulation
    (19.5 -> 17.0 ms on the 8-scene batch, bit-identical outputs)."""
    from rs_image_segmentation_tpu.models.forest import forest_tree_plan
    return _classify_scenes_turbo(scenes_u8, stretch_luts_u8, gf, cfg,
                                  chunk, forest_tree_plan(gf),
                                  stretch_params, stretch_hists)


@functools.partial(jax.jit, static_argnames=("cfg", "chunk", "plan"))
def _classify_scenes_turbo(scenes_u8: jnp.ndarray,
                           stretch_luts_u8: jnp.ndarray,
                           gf: GemmForest,
                           cfg: FeatureStageConfig = FeatureStageConfig(),
                           chunk: int = 32768, plan=None,
                           stretch_params=None,
                           stretch_hists=None) -> jnp.ndarray:
    b, c, h, w = scenes_u8.shape
    if stretch_params is not None and stretch_hists is not None:
        stacks = jax.vmap(
            lambda s, l, p, hh: _stack_cm_from_parts(
                *_preamble(s, l, p, hh), cfg)
        )(scenes_u8, stretch_luts_u8, stretch_params, stretch_hists)
    elif stretch_params is not None:
        stacks = jax.vmap(
            lambda s, l, p: _stack_cm_from_parts(*_preamble(s, l, p), cfg)
        )(scenes_u8, stretch_luts_u8, stretch_params)       # (B, 19, H, W)
    else:
        stacks = jax.vmap(
            lambda s, l: _stack_cm_from_parts(*_preamble(s, l), cfg)
        )(scenes_u8, stretch_luts_u8)                       # (B, 19, H, W)
    if jax.default_backend() == "tpu" and gf.leaf_dist.shape[1] <= 8:
        from rs_image_segmentation_tpu.ops.pallas_kernels import (
            forest_block_n, forest_labels_pallas)
        bn = forest_block_n(gf.selector.shape[1], gf.leaf_dist.shape[0],
                            plan=plan)
        if bn:
            # vmap the fused forest kernel per scene: batching the grid
            # beats transposing the (B, 19, H, W) stacks into one
            # (19, B*H*W) matrix (the moveaxis materializes 2x 110 MB;
            # measured 28.9 -> 23.0 ms on the 8-scene bench batch)
            flat = stacks.reshape(b, stacks.shape[1], h * w)
            labels = jax.vmap(
                lambda x: forest_labels_pallas(gf, x, block_n=bn,
                                               plan=plan))(flat)
            return labels.reshape(b, h, w).astype(jnp.uint8)
    x_cm = jnp.moveaxis(stacks, 1, 0).reshape(19, -1)       # (19, B*H*W)
    labels = gemm_labels_cm(gf, x_cm, chunk, plan=plan)
    return labels.reshape(b, h, w).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("cfg", "n_clusters", "seed"))
def kmeans_scenes_turbo(scene_u8: jnp.ndarray, stretch_lut_u8: jnp.ndarray,
                        n_clusters: int = 7,
                        cfg: FeatureStageConfig = FeatureStageConfig(),
                        seed: int = 42) -> jnp.ndarray:
    """Unsupervised counterpart of :func:`classify_scenes_turbo` for ONE
    scene (BASELINE config #2 fused end-to-end): raw uint8 scene + exact
    stretch LUT -> channel-major 19-channel stack -> MinMax scale ->
    on-device KMeans (k-means++ + Lloyd) -> (H, W) 1-based labels, all in
    one device program. Matches the stage-3 semantics of clustering the
    hierarchical_all stack (reference 3_classification.py:377-400 with
    use_hierarchical_all=True; cluster ids are seed-dependent, absorbed
    by evaluation's cluster->class majority mapping)."""
    from rs_image_segmentation_tpu.models.kmeans import (
        kmeans_fit_predict, minmax_scale_features)

    c, h, w = scene_u8.shape
    stack = _stack_cm_from_parts(*_preamble(scene_u8, stretch_lut_u8), cfg)
    x = stack.reshape(stack.shape[0], -1).T                 # (N, 19)
    xs = minmax_scale_features(x)
    labels, _ = kmeans_fit_predict(xs, n_clusters, seed=seed)
    return (labels.reshape(h, w) + 1).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("cfg", "n_clusters", "seed",
                                              "fit_stride", "shared_fit",
                                              "return_cents"))
def kmeans_scenes_turbo_batch(scenes_u8: jnp.ndarray,
                              stretch_luts_u8: jnp.ndarray,
                              n_clusters: int = 7,
                              cfg: FeatureStageConfig = FeatureStageConfig(),
                              seed: int = 42, fit_stride: int = 8,
                              stretch_params=None,
                              stretch_hists=None,
                              shared_fit: bool = False,
                              init_cents=None,
                              return_cents: bool = False):
    """Batched unsupervised classification: (B, 7, H, W) raw uint8
    scenes -> (B, H, W) 1-based cluster maps in ONE device program.

    Per scene: 19-channel stack (channel-major), MinMax scale, k-means++
    + Lloyd fit on a ``fit_stride``-strided systematic subsample (a
    strided slice, not a gather — the same bounded-fit design as
    pipeline.large_scene), then ONE full-pixel assignment against the
    converged centroids. Lloyd-to-convergence on all 360k pixels was
    ~46 ms/scene device and refit per scene in the old single-scene
    loop; the subsampled fit is ~fit_stride x cheaper per iteration
    while the final assignment stays exact over every pixel. Cluster
    quality is gated by the bench (cluster-majority-mapped kappa vs the
    bundled ROI; the sklearn-anchored 0.765 holds at stride 8, tested).

    Fits stay per-scene by default (reference 3_classification.py:377-400
    clusters each scene independently); cluster ids remain seed-dependent
    and are absorbed by evaluation's cluster->class majority mapping.

    ``shared_fit=True`` (opt-in, a deliberate departure from the
    reference's per-scene fits): ONE k-means model is fitted on a
    subsample drawn evenly across ALL scenes in the batch and every
    scene is assigned against it. For same-distribution batches (one
    sensor/region) this is the production pattern — cluster ids become
    comparable ACROSS the batch (per-scene fits give every scene its own
    arbitrary labeling) — and it drops the dominant per-scene fit cost:
    one fit amortizes over B scenes. Quality is gated the same way
    (cluster-majority-mapped kappa; tested >= 0.75 on the bundled scene).

    ``init_cents`` (shared_fit only): optional (K, F) warm start — the
    shared fit's Lloyd loop starts from these centroids instead of
    k-means++ seeding, still convergence-gated (models.kmeans tol
    semantics). The serving engine threads the previous batch's
    converged centroids through here so steady-state traffic pays a few
    Lloyd iterations instead of a full seed + fit. ``return_cents=True``
    additionally returns the converged (K, F) shared-fit centroids (the
    state the engine carries to the next batch).

    ``stretch_params`` / ``stretch_hists``: the same fixed-point routing
    + host-precomputed stretched-histogram fast paths as
    :func:`classify_scenes_turbo` (bit-identical outputs, tested)."""
    from rs_image_segmentation_tpu.models.kmeans import kmeans_fit_predict

    b, c, h, w = scenes_u8.shape
    if stretch_params is not None and stretch_hists is not None:
        stacks = jax.vmap(
            lambda s, l, p, hh: _stack_cm_from_parts(
                *_preamble(s, l, p, hh), cfg)
        )(scenes_u8, stretch_luts_u8, stretch_params, stretch_hists)
    elif stretch_params is not None:
        stacks = jax.vmap(
            lambda s, l, p: _stack_cm_from_parts(*_preamble(s, l, p), cfg)
        )(scenes_u8, stretch_luts_u8, stretch_params)
    else:
        stacks = jax.vmap(
            lambda s, l: _stack_cm_from_parts(*_preamble(s, l), cfg)
        )(scenes_u8, stretch_luts_u8)                       # (B, 19, H, W)
    f = stacks.shape[1]
    x_cm = stacks.reshape(b, f, h * w)
    mn = jnp.min(x_cm, axis=2, keepdims=True)
    rng_ = jnp.max(x_cm, axis=2, keepdims=True) - mn
    xs_cm = (x_cm - mn) / jnp.where(rng_ > 0, rng_, 1.0)    # MinMaxScaler

    if init_cents is not None and not shared_fit:
        raise ValueError("init_cents warm start requires shared_fit=True")
    if shared_fit:
        # one fit over a batch-wide systematic subsample of the SAME total
        # size as a single scene's fit sample (stride scales with B), so
        # the fit cost is constant in B instead of linear
        xfit = jnp.swapaxes(xs_cm[:, :, ::fit_stride * b],
                            1, 2).reshape(-1, f)            # (~Nf, F)
        _, state = kmeans_fit_predict(xfit, n_clusters, seed=seed,
                                      init_centroids=init_cents)
        cents = jnp.broadcast_to(state.centroids[None],
                                 (b,) + state.centroids.shape)
        fit_cents = state.centroids
    else:
        xfit = jnp.swapaxes(xs_cm[:, :, ::fit_stride], 1, 2)  # (B, Nf, F)
        _, states = jax.vmap(
            lambda xf: kmeans_fit_predict(xf, n_clusters, seed=seed))(xfit)
        cents = states.centroids                            # (B, K, F)
        fit_cents = cents

    # full assignment: argmin_k ||x - c_k||^2 = argmin_k (|c_k|^2 - 2 c_k.x)
    cross = jnp.einsum("bkf,bfn->bkn", cents, xs_cm,
                       preferred_element_type=jnp.float32, precision=_HIGH)
    cn = jnp.sum(cents * cents, axis=2)                     # (B, K)
    labels = jnp.argmin(cn[:, :, None] - 2.0 * cross, axis=1)
    maps = (labels.reshape(b, h, w) + 1).astype(jnp.uint8)
    if return_cents:
        return maps, fit_cents
    return maps


def _rule_front(scene_u8, stretch_lut_u8, cfg, sp=None, hist_in=None):
    """Preamble + robust-normalize + the four rule indices for one scene
    (reference 3_classification.py:335-375 never touches PCA/texture).
    ``hist_in``: optional host-precomputed stretched histogram
    (build_stretch_stats) — the preamble then skips accumulation."""
    from rs_image_segmentation_tpu.ops.indices import mndwi as mndwi_fn
    from rs_image_segmentation_tpu.ops.indices import ndbi as ndbi_fn
    from rs_image_segmentation_tpu.ops.indices import ndvi as ndvi_fn
    from rs_image_segmentation_tpu.ops.indices import ndwi as ndwi_fn

    c, h, w = scene_u8.shape
    stretched, hist = _preamble(scene_u8, stretch_lut_u8, sp, hist_in)
    n = h * w
    vals = jnp.broadcast_to(jnp.arange(256, dtype=jnp.float32), (c, 256))
    p = percentiles_from_counts(hist, vals,
                                (cfg.normalize.lower_percentile,
                                 cfg.normalize.upper_percentile), n)
    lo, hi = p[0][:, None, None], p[1][:, None, None]
    b = ((jnp.clip(stretched, lo, hi) - lo)
         / (hi - lo + cfg.normalize.epsilon))
    return (ndvi_fn(b[3], b[2]), ndwi_fn(b[1], b[3]),
            mndwi_fn(b[1], b[4]), ndbi_fn(b[4], b[3]))


@functools.partial(jax.jit, static_argnames=("cfg", "rule_cfg",
                                             "return_overflow"))
def rule_based_scenes_turbo_batch(scenes_u8: jnp.ndarray,
                                  stretch_luts_u8: jnp.ndarray,
                                  cfg: FeatureStageConfig = FeatureStageConfig(),
                                  rule_cfg=None,
                                  stretch_params=None,
                                  stretch_hists=None,
                                  return_overflow: bool = False):
    """Batched rule-based classification: (B, 7, H, W) raw uint8 scenes +
    (B, 7, 256) stretch LUTs -> (B, H, W) uint8 labels in ONE device
    program, bit-identical per scene to the standard rule graph
    (pipeline.classify.rule_based_classify; tested).

    The per-scene rule program was dominated by connected-components
    convergence plus XLA's scatter/gather for min-area removal (28.4 ms
    device: CC 4.8 + areas 9.4 + keep 7.2); here ALL masks of the batch
    (3 per scene, then the bareland masks) stack into one tall image and
    flow through the scatter-free batched min-area machinery
    (ops.components.remove_small_components_batch: one gated Pallas
    propagation + two one-hot MXU contractions per stage).

    Sizing note: the min-area machinery caps component ids at 32768 per
    mask (remove_small_components_batch's ``bins``; the bundled scene's
    noisiest mask has ~15.4k row-runs). That fits the stage-3 scene
    class this program serves (reference scenes are 600^2); arbitrarily
    large rasters go through pipeline.large_scene.rule_based_large_scene,
    whose whole-image post-processing has no id cap.
    ``return_overflow=True`` additionally returns a (B,) bool marking
    scenes where ANY of the four min-area stages actually hit the cap
    (output possibly wrong for that scene) — the serving engine uses it
    to reroute exactly those scenes to the uncapped path instead of
    silently returning a truncated label map.

    Reference: scripts/3_classification.py:335-375, extract.py:299-505.
    """
    from rs_image_segmentation_tpu.core.config import RuleBasedConfig
    from rs_image_segmentation_tpu.ops.components import (
        remove_small_components_batch)
    from rs_image_segmentation_tpu.ops.morphology import closing, opening
    from rs_image_segmentation_tpu.ops.threshold import threshold_binary

    rc = rule_cfg if rule_cfg is not None else RuleBasedConfig()
    b, c, h, w = scenes_u8.shape
    area = h * w
    if stretch_params is not None and stretch_hists is not None:
        nd = jax.vmap(lambda s, l, p, hh: _rule_front(s, l, cfg, p, hh))(
            scenes_u8, stretch_luts_u8, stretch_params, stretch_hists)
    elif stretch_params is not None:
        nd = jax.vmap(lambda s, l, p: _rule_front(s, l, cfg, p))(
            scenes_u8, stretch_luts_u8, stretch_params)
    else:
        nd = jax.vmap(lambda s, l: _rule_front(s, l, cfg))(
            scenes_u8, stretch_luts_u8)
    ndvi, ndwi, mndwi, ndbi = nd

    veg = threshold_binary(ndvi, rc.ndvi_threshold)
    if rc.use_mndwi_if_available:
        water = threshold_binary(mndwi, rc.mndwi_threshold)
    else:
        water = threshold_binary(ndwi, rc.ndwi_threshold)
    built = (threshold_binary(ndbi, rc.ndbi_threshold).astype(bool)
             & threshold_binary(ndvi, rc.ndvi_threshold_for_builtup,
                                above=False).astype(bool)).astype(jnp.uint8)

    # post-process: close -> min-area (ONE batched pass over 3B masks)
    # -> open, kernel 3/3/5 like advanced_post_processing's callers
    veg = closing(veg, 3, shape="ellipse")
    water = closing(water, 3, shape="ellipse")
    built = closing(built, 5, shape="ellipse")
    stack3 = jnp.concatenate([veg, water, built])           # (3B, H, W)
    min_areas = jnp.concatenate([
        jnp.full((b,), int(area * rc.veg_min_area_frac), jnp.int32),
        jnp.full((b,), int(area * rc.water_min_area_frac), jnp.int32),
        jnp.full((b,), int(area * rc.builtup_min_area_frac), jnp.int32)])
    kept = remove_small_components_batch(stack3, min_areas,
                                         return_overflow=return_overflow)
    if return_overflow:
        kept, ov3 = kept
    veg = opening(kept[:b], 3, shape="ellipse")
    water = opening(kept[b:2 * b], 3, shape="ellipse")
    built = opening(kept[2 * b:], 5, shape="ellipse")

    out = jnp.zeros((b, h, w), jnp.uint8)
    out = jnp.where(built == 1, 3, out)     # priority paint: builtup
    out = jnp.where(veg == 1, 1, out)       # then vegetation
    out = jnp.where(water == 1, 2, out)     # water wins

    # bareland from the unclassified remainder (extract.py:460-505)
    bare = ((out == 0)
            & (jnp.nan_to_num(ndvi) > rc.bareland_ndvi_low)
            & (jnp.nan_to_num(ndvi) < rc.bareland_ndvi_high)
            & (jnp.nan_to_num(ndbi) > rc.bareland_ndbi_low)
            & (jnp.nan_to_num(ndbi) < rc.bareland_ndbi_high)
            ).astype(jnp.uint8)
    bare = closing(bare, 3, shape="ellipse")
    bare = remove_small_components_batch(
        bare, jnp.full((b,), int(area * rc.bareland_min_area_frac),
                       jnp.int32), return_overflow=return_overflow)
    if return_overflow:
        bare, ov_bare = bare
    bare = opening(bare, 3, shape="ellipse")
    out = jnp.where((bare == 1) & (out == 0), 4, out)
    if return_overflow:
        overflow = ov3[:b] | ov3[b:2 * b] | ov3[2 * b:] | ov_bare
        return out.astype(jnp.uint8), overflow
    return out.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("cfg", "rule_cfg", "cc_impl"))
def rule_based_scenes_turbo(scene_u8: jnp.ndarray,
                            stretch_lut_u8: jnp.ndarray,
                            cfg: FeatureStageConfig = FeatureStageConfig(),
                            rule_cfg=None, cc_impl: str = "auto") -> jnp.ndarray:
    """Rule-based counterpart of :func:`classify_scenes_turbo` for ONE
    scene (BASELINE config #1 fused end-to-end): raw uint8 scene + exact
    stretch LUT -> normalized bands -> NDVI/NDWI/MNDWI/NDBI -> threshold
    rules with on-device morphology/connected-component post-processing
    and priority paint (pipeline.classify.rule_based_classify), all in
    one device program. Only the four index planes are computed — the
    rules never touch PCA/texture (reference 3_classification.py:335-375)."""
    from rs_image_segmentation_tpu.core.config import RuleBasedConfig
    from rs_image_segmentation_tpu.ops.indices import mndwi as mndwi_fn
    from rs_image_segmentation_tpu.ops.indices import ndbi as ndbi_fn
    from rs_image_segmentation_tpu.ops.indices import ndvi as ndvi_fn
    from rs_image_segmentation_tpu.ops.indices import ndwi as ndwi_fn
    from rs_image_segmentation_tpu.pipeline.classify import rule_based_classify

    rule_cfg = rule_cfg if rule_cfg is not None else RuleBasedConfig()
    c, h, w = scene_u8.shape
    stretched, hist = _preamble(scene_u8, stretch_lut_u8)
    n = h * w
    vals = jnp.broadcast_to(jnp.arange(256, dtype=jnp.float32), (c, 256))
    p = percentiles_from_counts(hist, vals,
                                (cfg.normalize.lower_percentile,
                                 cfg.normalize.upper_percentile), n)
    lo, hi = p[0][:, None, None], p[1][:, None, None]
    bands01 = ((jnp.clip(stretched, lo, hi) - lo)
               / (hi - lo + cfg.normalize.epsilon))
    green, red, nir, swir1 = bands01[1], bands01[2], bands01[3], bands01[4]
    return rule_based_classify(ndvi_fn(nir, red), ndwi_fn(green, nir),
                               mndwi_fn(green, swir1), ndbi_fn(swir1, nir),
                               rule_cfg, cc_impl=cc_impl)
