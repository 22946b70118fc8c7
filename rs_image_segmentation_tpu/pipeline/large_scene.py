"""Memory-bounded large-scene classification with GLOBAL semantics.

The monolithic stage graphs hold the whole scene in HBM. This pipeline
streams row-tile blocks through the device while keeping every global
statistic exact, so a scene of any size classifies (near-)identically to the
monolithic path. It consumes the STAGE-1 OUTPUT — the preprocessed scene
whose values are stretched uint8 levels (the reference's artifact contract,
preprocessing.py:101-155) — which makes all global percentiles exact
functions of integer-valued 256-bin histograms:

  pass A (host)   : per-band histograms -> robust-normalize p2/p98,
                    RobustScaler median/IQR, texture re-normalize bounds
                    (the whole chain is monotone per band).
  pass B (device) : per-tile accumulation of RobustScaler'd band sums and the
                    Gram matrix -> global PCA via float64 host eigh (sklearn
                    svd_flip signs).
  pass C (device) : per-tile GLCM window-grid props (tile heights aligned to
                    the 21-px window grid so windows never straddle a tile)
                    plus the global Sobel-magnitude max.
  pass D (device) : per-tile 19-channel stack assembly — elementwise indices,
                    PC1 projection, halo'd stencils (morph gradient, windowed
                    std, Sobel, 7x7 context), rows of the globally-resized
                    GLCM maps — and GEMM forest prediction written straight
                    into the output label map.

Preprocessing a huge raw scene tiles trivially too (`preprocess_large`):
the stretch only needs the global per-band DN min/max.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rs_image_segmentation_tpu.core.config import (CalibrationConfig,
                                                   FeatureStageConfig)
from rs_image_segmentation_tpu.models.forest import (GemmForest, _gemm_chunk,
                                                     gemm_forest_predict)
from rs_image_segmentation_tpu.ops.indices import spectral_indices
from rs_image_segmentation_tpu.ops.morphology import gradient
from rs_image_segmentation_tpu.ops.stencil import box_filter, sobel_magnitude
from rs_image_segmentation_tpu.ops.texture import glcm_matrices, glcm_properties


# -------------------------------------------------- histogram percentiles

def band_histograms_u8(arr: np.ndarray) -> np.ndarray:
    """(C, H, W) uint8-valued array -> (C, 256) int64 counts (host)."""
    c = arr.shape[0]
    return np.stack([np.bincount(arr[i].reshape(-1).astype(np.uint8),
                                 minlength=256) for i in range(c)])


def percentile_from_hist(hist: np.ndarray, values: np.ndarray, q: float
                         ) -> float:
    """np.percentile(method='linear') over a value-multiset given counts.

    ``values`` are the sorted distinct values corresponding to hist bins.
    """
    n = int(hist.sum())
    pos = q / 100.0 * (n - 1)
    lo = int(np.floor(pos))
    hi = int(np.ceil(pos))
    cum = np.cumsum(hist)
    v_lo = values[np.searchsorted(cum, lo + 1)]
    v_hi = values[np.searchsorted(cum, hi + 1)]
    frac = pos - lo
    return float(v_lo * (1 - frac) + v_hi * frac)


class GlobalStats:
    """Per-band global statistics driving the tile kernels."""

    def __init__(self, c: int):
        self.p_lo = np.zeros(c, np.float32)
        self.p_hi = np.zeros(c, np.float32)
        self.median = np.zeros(c, np.float32)
        self.iqr = np.zeros(c, np.float32)
        self.tex_lo = None
        self.tex_hi = None
        self.pca_mean = None       # (C,) mean of RobustScaler'd bands
        self.pca_comp1 = None      # (C,) first principal axis
        self.sobel_max = None


def compute_global_stats(arr: np.ndarray,
                         cfg: FeatureStageConfig,
                         hists: Optional[np.ndarray] = None) -> GlobalStats:
    """Pass A over a preprocessed (uint8-valued) scene."""
    if hists is None:
        hists = band_histograms_u8(arr)
    c = hists.shape[0]
    stats = GlobalStats(c)
    lo_q = cfg.normalize.lower_percentile
    hi_q = cfg.normalize.upper_percentile
    eps = cfg.normalize.epsilon
    levels = np.arange(256, dtype=np.float64)
    tb = cfg.texture_band_index
    for i in range(c):
        stats.p_lo[i] = np.float32(
            percentile_from_hist(hists[i], levels, lo_q))
        stats.p_hi[i] = np.float32(
            percentile_from_hist(hists[i], levels, hi_q))
    # normalized value per level with the tile kernel's f32 arithmetic —
    # ONE vectorized device program + one fetch for all bands (a per-band
    # loop was 2x c tunnel round trips, ~1.9 s at 36 MP; values identical:
    # same elementwise ops, denominators still formed in host f32)
    denom = (stats.p_hi.astype(np.float32) - stats.p_lo.astype(np.float32)
             + np.float32(eps))
    lv = jnp.arange(256, dtype=jnp.float32)
    norm = (jnp.clip(lv[None, :], stats.p_lo[:, None], stats.p_hi[:, None])
            - stats.p_lo[:, None]) / denom[:, None]
    norm_np = np.asarray(norm, np.float64)
    for i in range(c):
        stats.median[i] = np.float32(
            percentile_from_hist(hists[i], norm_np[i], 50.0))
        q1 = percentile_from_hist(hists[i], norm_np[i], 25.0)
        q3 = percentile_from_hist(hists[i], norm_np[i], 75.0)
        stats.iqr[i] = np.float32((q3 - q1) if (q3 - q1) > 0 else 1.0)
        if i == tb:
            stats.tex_lo = np.float32(
                percentile_from_hist(hists[i], norm_np[i], lo_q))
            stats.tex_hi = np.float32(
                percentile_from_hist(hists[i], norm_np[i], hi_q))
    return stats


# -------------------------------------------------- tiled preprocessing

def preprocess_large(arr: np.ndarray,
                     cal: CalibrationConfig = CalibrationConfig(),
                     tile_rows: int = 2048,
                     return_device: bool = False,
                     return_hist: bool = False):
    """Stage 1 for scenes of any size: calibrate + global min/max stretch as
    an exact float64 per-DN lookup table (the uint8-input chain is a pure
    function of the DN; identical to ``pipeline.preprocess.preprocess_bands``
    and to the reference's NumPy float64 math), applied tile-wise.

    ``return_hist=True`` returns ``(out, hists)`` where ``hists`` is the
    (C, 256) int64 histogram of the STRETCHED scene when the backend
    computes it for free (the Pallas LUT kernel's one-HBM-pass byproduct),
    else ``(out, None)``. Feeding it to :func:`classify_large_scene` skips
    that pipeline's whole histogram pass (8.5 s at 36 MP) — the counts are
    identical by construction (tested against histogram256)."""
    from rs_image_segmentation_tpu.pipeline.preprocess import (
        _apply_lut, build_stretch_lut)
    c, h, w = arr.shape
    # calibration is monotone per band, so the LUT needs only min/max DN
    # (same argument as build_stretch_lut) — no full histogram pass
    lut_dev = jnp.asarray(build_stretch_lut(arr, cal.gains, cal.biases))

    if jax.default_backend() == "tpu":
        # XLA's TPU gather runs <100 MB/s on this access pattern; the
        # bilinear Pallas LUT kernel is bit-identical and bandwidth-bound
        # (measured 2.5x the one-hot matmul, ~30x the gather)
        from rs_image_segmentation_tpu.ops.pallas_kernels import (
            lut_hist_pallas)
        lut_u8 = lut_dev.astype(jnp.uint8)

        def apply(tile):
            # out_u8: the kernel writes uint8 directly — an f32
            # intermediate would peak at ~10x scene bytes near the 2 GiB
            # device-resident cap
            return lut_hist_pallas(tile, lut_u8, out_u8=True)
    else:
        def apply(tile):
            return _apply_lut(tile, lut_dev), None

    src = _tile_src(arr)
    if isinstance(src, jnp.ndarray):
        # device-resident scene: ONE program, one optional fetch.
        # return_device keeps the result in HBM so a downstream
        # classify_large_scene skips a full D2H+H2D round trip
        out, hist = apply(src)
        if not return_device:
            out = np.asarray(out)
        if return_hist:
            hist = (np.asarray(hist).astype(np.int64)
                    if hist is not None else None)
            return out, hist
        return out
    # streaming (> DEVICE_RESIDENT_MAX_BYTES): per-tile host writeback so
    # device memory stays bounded — the whole point of this mode. One-tile
    # lookahead: tile i+1's H2D + kernel dispatch is issued BEFORE tile i's
    # result is fetched, so transfer and compute overlap (dispatch is
    # async); at most two tiles + two outputs are in flight.
    out = np.zeros((c, h, w), np.uint8)
    hsum = None

    def drain(item):
        nonlocal hsum
        p0, pe, p_out, p_hist = item
        out[:, p0:pe, :] = np.asarray(p_out)
        if p_hist is not None:
            p_hist = np.asarray(p_hist).astype(np.int64)
            hsum = p_hist if hsum is None else hsum + p_hist

    prev = None
    for y0 in range(0, h, tile_rows):
        ye = min(h, y0 + tile_rows)
        cur = (y0, ye, *apply(_get_tile(src, y0, ye)))
        if prev is not None:
            drain(prev)
        prev = cur
    if prev is not None:
        drain(prev)
    return (out, hsum) if return_hist else out


# -------------------------------------------------- per-tile device kernels

def _normalize_tile(tile: jnp.ndarray, p_lo, p_hi,
                    eps: float = 1e-10) -> jnp.ndarray:
    """Stretched-u8 tile -> globally robust-normalized [0,1] bands."""
    x = tile.astype(jnp.float32)
    lo = p_lo[:, None, None]
    hi = p_hi[:, None, None]
    return (jnp.clip(x, lo, hi) - lo) / (hi - lo + eps)


def _fit_global_pca(arr: np.ndarray, stats: GlobalStats,
                    tile_rows: int, src=None) -> None:
    """Host-driven global PCA fit over RobustScaler'd bands (fills
    ``stats.pca_mean`` / ``stats.pca_comp1``). Used by
    ``parallel.spatial``'s SPMD setup; the tiled classify pipeline folds
    this into its merged pass B/C (:func:`_global_passes`), which
    produces identical values."""
    src = _tile_src(arr) if src is None else src
    c, h, w = arr.shape
    p_lo = jnp.asarray(stats.p_lo)
    p_hi = jnp.asarray(stats.p_hi)
    med = jnp.asarray(stats.median)
    iqr = jnp.asarray(stats.iqr)

    @jax.jit
    def accumulate(tile):
        norm = _normalize_tile(tile, p_lo, p_hi)
        xs = (norm - med[:, None, None]) / iqr[:, None, None]
        flat = xs.reshape(c, -1)
        return (jnp.sum(flat, axis=1),
                jnp.dot(flat, flat.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST))

    s1 = np.zeros(c, np.float64)
    s2 = np.zeros((c, c), np.float64)
    n = 0
    resident = isinstance(src, jnp.ndarray)
    pending = []
    for y0 in range(0, h, tile_rows):
        ye = min(h, y0 + tile_rows)
        res = accumulate(_get_tile(src, y0, ye))
        n += (ye - y0) * w
        if resident:
            pending.append(res)
        else:   # streaming: fetch per tile so in-flight buffers stay bounded
            s1 += np.asarray(res[0], np.float64)
            s2 += np.asarray(res[1], np.float64)
    if pending:  # ONE fetch; f64 accumulation still per tile in order
        for t1 in np.asarray(jnp.stack([r[0] for r in pending]), np.float64):
            s1 += t1
        for t2 in np.asarray(jnp.stack([r[1] for r in pending]), np.float64):
            s2 += t2
    mean = s1 / n
    cov = (s2 - n * np.outer(mean, mean)) / (n - 1)
    eigvals, eigvecs = np.linalg.eigh(cov)
    comp1 = eigvecs[:, np.argsort(-eigvals)[0]]
    if comp1[np.argmax(np.abs(comp1))] < 0:  # svd_flip sign convention
        comp1 = -comp1
    stats.pca_mean = mean.astype(np.float32)
    stats.pca_comp1 = comp1.astype(np.float32)


# -------------------------------------------------- GLCM global grid

@functools.partial(jax.jit,
                   static_argnames=("lo", "rows", "glcm_rows", "levels",
                                    "window", "step", "angles", "tb",
                                    "n_j"))
def _tile_globals(tile, p_lo, p_hi, med, iqr, tex_lo, tex_hi, *,
                  lo: int, rows: int, glcm_rows: int, levels: int,
                  window: int, step: int, angles, tb: int, n_j: int):
    """Merged pass-B/C per-tile program (PCA sums + GLCM grid + sobel
    max). The tile spans [max(0, y0-1), min(h, y0+rows+1)); the interior
    rows [lo, lo+rows) are exactly the PCA/GLCM rows of the unmerged
    passes and the full slice is exactly the old sobel-pass slice.

    Statistics arrive as ARGUMENTS, not closure constants: a closed-over
    concrete array is embedded in the HLO, so every new scene would be a
    persistent-cache miss and a full recompile (minutes through this
    environment's remote compile service)."""
    c = tile.shape[0]
    interior = tile[:, lo:lo + rows, :]
    norm = _normalize_tile(interior, p_lo, p_hi)
    xs = (norm - med[:, None, None]) / iqr[:, None, None]
    flat = xs.reshape(c, -1)
    s1 = jnp.sum(flat, axis=1)
    s2 = jnp.dot(flat, flat.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)

    nir_full = _normalize_tile(tile, p_lo, p_hi)[tb]
    tex_full = (jnp.clip(nir_full, tex_lo, tex_hi) - tex_lo) \
        / (tex_hi - tex_lo + 1e-10)
    u8 = (tex_full * 255.0).astype(jnp.uint8)
    smax = jnp.max(sobel_magnitude(u8.astype(jnp.float32)) / 255.0)

    if glcm_rows > 0:
        con, hom = _tile_glcm_grid(tex_full[lo:lo + rows],
                                   levels, window, step, angles)
    else:
        con = jnp.zeros((0, n_j), jnp.float32)
        hom = jnp.zeros((0, n_j), jnp.float32)
    return s1, s2, con, hom, smax


@functools.partial(jax.jit, static_argnames=("levels", "window", "step",
                                             "angles"))
def _tile_glcm_grid(tex01_tile, levels: int, window: int, step: int,
                    angles) -> Tuple[jnp.ndarray, jnp.ndarray]:
    from rs_image_segmentation_tpu.ops.texture import _extract_windows
    q = (tex01_tile * (levels - 1)).astype(jnp.uint8).astype(jnp.int32)
    windows = _extract_windows(q, window, step)
    glcm = glcm_matrices(windows, levels, (1,), angles)
    props = glcm_properties(glcm)
    n_i = (tex01_tile.shape[0] - window) // step + 1
    n_j = (tex01_tile.shape[1] - window) // step + 1
    return (jnp.mean(props["contrast"], axis=(1, 2)).reshape(n_i, n_j),
            jnp.mean(props["homogeneity"], axis=(1, 2)).reshape(n_i, n_j))


def _resize_rows(grid: jnp.ndarray, out_hw: Tuple[int, int],
                 row0, rows: int) -> jnp.ndarray:
    """Rows [row0, row0+rows) of resize_bilinear(grid, out_hw) without
    materializing the full map (row0 may be traced)."""
    h, w = grid.shape
    oh, ow = out_hw
    sy, sx = h / oh, w / ow
    ry = (jnp.arange(rows, dtype=jnp.float32) + row0 + 0.5) * sy - 0.5
    rx = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * sx - 0.5
    y0 = jnp.clip(jnp.floor(ry), 0, h - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(rx), 0, w - 1).astype(jnp.int32)
    fy = jnp.clip(ry - y0, 0, 1)[:, None]
    fx = jnp.clip(rx - x0, 0, 1)[None, :]
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    a = grid[y0][:, x0]
    b = grid[y0][:, x1]
    c = grid[y1][:, x0]
    d = grid[y1][:, x1]
    return (a * (1 - fx) + b * fx) * (1 - fy) + (c * (1 - fx) + d * fx) * fy


# -------------------------------------------------- the driver

HALO = 8  # >= max stencil reach in the stack path (7x7 context -> 3,
#            grad5/std5 -> 2, sobel -> 1; 8 rounds up for alignment)

DEVICE_RESIDENT_MAX_BYTES = 2 << 30


def _label_transfer_dtype(gf: GemmForest):
    """uint8 label D2H (4x less transfer) only when every class id fits;
    arbitrary class ids (e.g. land-cover codes > 255) keep int32."""
    classes = np.asarray(gf.classes)
    if classes.min() >= 0 and classes.max() <= 255:
        return jnp.uint8
    return jnp.int32


def _tile_src(arr_np: np.ndarray):
    """One H2D for the whole scene when it fits comfortably in HBM.

    The streaming mode re-ships every tile on every pass (4 passes x
    n_tiles transfers, each serialized on this environment's tunnel RTT —
    measured 20x slower than compute at 36 MP). Scenes <= 2 GB (u8) live
    on device whole and tiles are device-side slices; larger scenes keep
    the bounded-memory streaming behavior.

    Large resident scenes ship as ~25 MB row chunks rather than one
    monolithic put: chunked transfers pipeline through this
    environment's tunnel measurably faster (252 MB measured 113 vs 82
    MB/s, benchmarks/profile_large_scene.py) and the device concat is
    one HBM copy (~ms); bytes identical either way."""
    if arr_np.nbytes <= DEVICE_RESIDENT_MAX_BYTES:
        if arr_np.nbytes < (64 << 20):
            return jnp.asarray(arr_np)
        c, h, w = arr_np.shape
        rows = max(1, (25 << 20) // (c * w * arr_np.itemsize))
        parts = [jax.device_put(np.ascontiguousarray(
            arr_np[:, y0:y0 + rows])) for y0 in range(0, h, rows)]
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                                axis=1)
    return arr_np


def _get_tile(src, ys: int, ye: int) -> jnp.ndarray:
    if isinstance(src, jnp.ndarray):
        return src[:, ys:ye, :]
    return jnp.asarray(np.ascontiguousarray(src[:, ys:ye, :]))


def _fit_sample_plan(h: int, w: int, tile_rows: int, fit_fraction: float,
                     max_fit_pixels: int) -> list:
    """Per-tile sample counts for the KMeans fit subsample.

    The total is snapped DOWN to a power of two so the fit program's HLO
    (``kmeans_fit_predict`` at (N, F)) is keyed by a small fixed set of
    shapes instead of the scene-size continuum — on this environment a
    fit-shape persistent-cache miss is a multi-minute remote compile, so
    without the snap every new scene size paid one. Counts sum to the
    snapped total exactly and never exceed a tile's pixel count."""
    n_fit = min(max_fit_pixels, int(h * w * fit_fraction) or h * w, h * w)
    if n_fit >= 2:
        n_fit = 1 << (n_fit.bit_length() - 1)
    tile_px = [min(tile_rows, h - y0) * w for y0 in range(0, h, tile_rows)]
    counts = []
    remaining = n_fit
    for i, npx in enumerate(tile_px):
        want = -(-remaining // (len(tile_px) - i))  # ceil of an even share
        take = min(npx, want, remaining)
        counts.append(take)
        remaining -= take
    for i, npx in enumerate(tile_px):  # capacity-starved early tiles
        if not remaining:
            break
        add = min(npx - counts[i], remaining)
        counts[i] += add
        remaining -= add
    assert remaining == 0, (h, w, tile_rows, n_fit)
    return counts


def _kmeans_tiles(arr: np.ndarray, cfg: FeatureStageConfig, tile_rows: int,
                  src, stack_tile):
    c, h, w = arr.shape
    for y0 in range(0, h, tile_rows):
        rows = min(tile_rows, h - y0)
        ys = max(0, y0 - HALO)
        ye = min(h, y0 + rows + HALO)
        tile = _get_tile(src, ys, ye)
        yield y0, rows, stack_tile(tile, y0, y0 - ys, rows)


def _kmeans_fit_large(arr: np.ndarray, n_clusters: int,
                      cfg: FeatureStageConfig, tile_rows: int, seed: int,
                      fit_fraction: float, max_fit_pixels: int,
                      src, stack_tile):
    """Pass 1 of the out-of-core KMeans: global MinMax bounds + a
    deterministic systematic subsample + the centroid fit, all ON
    DEVICE. History of this pass at 36 MP: fetching each tile's full
    stack to host for min/max was ~2.7 GB of D2H (the path's original
    96 s); a random device gather of the sample columns was ~1.4 s
    PER TILE (166k-column gather from (19, 3M)). A strided slice is
    a pure memory op, and systematic every-Nth-pixel sampling is a
    textbook subsample for out-of-core KMeans fitting (spatially
    auto-correlated imagery loses nothing to the stride).

    Returns (mins, rng, centroids) device arrays — the complete fit
    state (what the resumable path checkpoints)."""
    from rs_image_segmentation_tpu.models.kmeans import kmeans_fit_predict

    c, h, w = arr.shape
    counts = _fit_sample_plan(h, w, tile_rows, fit_fraction, max_fit_pixels)

    @functools.partial(jax.jit, static_argnames=("stride", "count"))
    def tile_stats(stack, *, stride, count):
        flat = jnp.reshape(stack, (stack.shape[0], -1))          # (F, N)
        smp = jax.lax.slice_in_dim(flat, 0, count * stride, stride,
                                   axis=1).T
        return flat.min(axis=1), flat.max(axis=1), smp

    acc = []
    for (y0, rows, stack), count in zip(
            _kmeans_tiles(arr, cfg, tile_rows, src, stack_tile), counts):
        n_px = rows * w
        acc.append(tile_stats(stack, stride=max(1, n_px // max(1, count)),
                              count=count))
    # combine, normalize, and FIT on device — round-tripping the 2M x 19
    # f32 subsample through the host (D2H + re-upload for the fit) was
    # ~300 MB of tunnel traffic, most of the measured 8.6 s pass-1 tail
    # at 36 MP
    mins_d = jnp.min(jnp.stack([a[0] for a in acc]), axis=0)
    maxs_d = jnp.max(jnp.stack([a[1] for a in acc]), axis=0)
    rng_d = jnp.where(maxs_d - mins_d <= 0, 1.0, maxs_d - mins_d)
    smp = jnp.concatenate([a[2] for a in acc], axis=0)
    fit = ((smp - mins_d) / rng_d).astype(jnp.float32)
    _, state = kmeans_fit_predict(fit, n_clusters, seed=seed)
    return mins_d, rng_d, state.centroids


def _kmeans_assign_fn(mins_d, rng_d, cents, n_clusters: int):
    from rs_image_segmentation_tpu.models.kmeans import lloyd_step

    @jax.jit
    def assign(stack):
        flat = jnp.reshape(stack, (stack.shape[0], -1)).T
        xs = (flat - mins_d) / rng_d
        _, labels, _ = lloyd_step(xs, cents)
        # 1-based like stage 3; uint8 on the wire (k <= 255 always in
        # practice — reference default 7) quarters the label D2H
        return (labels + 1).astype(jnp.uint8 if n_clusters < 255
                                   else jnp.int32)

    return assign


def kmeans_large_scene(arr: np.ndarray, n_clusters: int = 7,
                       cfg: FeatureStageConfig = FeatureStageConfig(),
                       tile_rows: int = 504, seed: int = 42,
                       fit_fraction: float = 0.1,
                       max_fit_pixels: int = 2_000_000) -> np.ndarray:
    """Unsupervised classification of an arbitrarily large preprocessed
    scene: global MinMax bounds and centroids are fit on a deterministic
    systematic pixel subsample (:func:`_kmeans_fit_large`), then every
    tile is assigned against the fixed centroids. Labels are 1-based
    like stage 3 (reference 3_classification.py:393). Memory stays
    bounded: tiles are recomputed in the assignment pass rather than
    cached."""
    c, h, w = arr.shape
    src = _tile_src(arr)
    stack_tile, _ = _make_stack_fn(arr, cfg, tile_rows, src=src)
    mins_d, rng_d, cents = _kmeans_fit_large(
        arr, n_clusters, cfg, tile_rows, seed, fit_fraction,
        max_fit_pixels, src, stack_tile)
    assign = _kmeans_assign_fn(mins_d, rng_d, cents, n_clusters)
    parts = [assign(stack).reshape(rows, w)
             for _, rows, stack in _kmeans_tiles(arr, cfg, tile_rows, src,
                                                 stack_tile)]
    return np.asarray(jnp.concatenate(parts, axis=0), np.int32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _rule_indices(stretched_u8: jnp.ndarray, hist: jnp.ndarray,
                  cfg: FeatureStageConfig):
    """Stretched scene + per-band histograms -> the four rule index
    planes (ndvi, ndwi, mndwi, ndbi) with exact global percentile
    normalization — the turbo rule preamble's downstream math."""
    from rs_image_segmentation_tpu.ops.indices import mndwi as mndwi_fn
    from rs_image_segmentation_tpu.ops.indices import ndbi as ndbi_fn
    from rs_image_segmentation_tpu.ops.indices import ndvi as ndvi_fn
    from rs_image_segmentation_tpu.ops.indices import ndwi as ndwi_fn
    from rs_image_segmentation_tpu.pipeline.turbo import (
        percentiles_from_counts)

    c, h, w = stretched_u8.shape
    vals = jnp.broadcast_to(jnp.arange(256, dtype=jnp.float32), (c, 256))
    p = percentiles_from_counts(hist, vals,
                                (cfg.normalize.lower_percentile,
                                 cfg.normalize.upper_percentile), h * w)
    lo, hi = p[0][:, None, None], p[1][:, None, None]
    bands01 = ((jnp.clip(stretched_u8, lo, hi) - lo)
               / (hi - lo + cfg.normalize.epsilon))
    green, red, nir, swir1 = bands01[1], bands01[2], bands01[3], bands01[4]
    return (ndvi_fn(nir, red), ndwi_fn(green, nir),
            mndwi_fn(green, swir1), ndbi_fn(swir1, nir))


@functools.partial(jax.jit, static_argnames=("cfg", "rule_cfg", "cc_impl"))
def _rule_from_stretched(stretched_u8: jnp.ndarray, hist: jnp.ndarray,
                         cfg: FeatureStageConfig, rule_cfg,
                         cc_impl: str) -> jnp.ndarray:
    """The turbo rule program from its preamble outputs onward — the same
    device math as pipeline.turbo.rule_based_scenes_turbo, taking the
    stretched scene + its histograms instead of raw DNs + LUT."""
    from rs_image_segmentation_tpu.pipeline.classify import rule_based_classify

    ndvi, ndwi, mndwi, ndbi = _rule_indices(stretched_u8, hist, cfg)
    return rule_based_classify(ndvi, ndwi, mndwi, ndbi,
                               rule_cfg, cc_impl=cc_impl)


def rule_based_large_scene(arr: np.ndarray,
                           cfg: FeatureStageConfig = FeatureStageConfig(),
                           rule_cfg=None,
                           hists: Optional[np.ndarray] = None,
                           cc_impl: str = "auto") -> np.ndarray:
    """Rule-based classification of an arbitrarily large PREPROCESSED
    scene (stretched uint8 levels, stage-1 contract), with global
    semantics (reference 3_classification.py:335-375).

    Every global quantity the rules need is exact from per-band 256-bin
    histograms (robust-normalize p2/p98), the four index planes are
    pointwise, and the post-processing (ellipse morphology + min-area
    connected components, both relative to the FULL image area) runs
    on-device over the whole scene — the CC strip kernel is internally
    tiled (VMEM-bounded strips), so unlike the forest path no host-side
    tile loop is needed. Memory is device-bound at O(HW) int32, not
    host-bound; a 6000x6000 mask labels in ~0.7 s on a v5e chip.

    Bit-identical to ``rule_based_scenes_turbo`` on the same scene: the
    stretched levels and histogram from ``preprocess_large`` match the
    turbo preamble's exactly, and everything downstream is the same
    device program. ``hists`` accepts the ``preprocess_large(...,
    return_hist=True)`` byproduct to skip the histogram pass."""
    from rs_image_segmentation_tpu.core.config import RuleBasedConfig

    if hists is None:
        hists = band_histograms_u8(arr)
    rule_cfg = rule_cfg if rule_cfg is not None else RuleBasedConfig()
    out = _rule_from_stretched(jnp.asarray(arr, jnp.uint8),
                               jnp.asarray(hists.astype(np.int32)),
                               cfg, rule_cfg, cc_impl)
    return np.asarray(out)


def _global_passes(arr: np.ndarray, cfg: FeatureStageConfig,
                   tile_rows: int, src=None,
                   hists: Optional[np.ndarray] = None) -> dict:
    """Passes A-C as a dict of plain numpy arrays — checkpointable, so a
    resumed run skips them (SURVEY §5 failure-detection row).

    ``hists``: precomputed (C, 256) stretched-value histograms (e.g. the
    Pallas preprocess byproduct from ``preprocess_large(return_hist=True)``)
    — skips the whole pass-A histogram sweep.

    Passes B and C run as ONE program per tile (PCA sums + GLCM window
    grid + tile sobel max from a single tile read): per-program dispatch
    costs ~100+ ms on this environment's device tunnel, so three separate
    sweeps were 3x the round trips for identical math. Every per-tile
    quantity is computed from exactly the rows the separate passes read
    (interior for PCA/GLCM, +-1-row slice for sobel), so results are
    bit-identical to the unmerged passes."""
    step = cfg.glcm.step_size
    if tile_rows % step:
        raise ValueError(f"tile_rows must be a multiple of {step}")
    c, h, w = arr.shape
    src = _tile_src(arr) if src is None else src
    if hists is None:
        if isinstance(src, jnp.ndarray):
            # device eq-reduce histogram beats host bincount over big
            # scenes (measured 4s -> ms at 36 MP), exact int32 counts
            # either way. Tiled: the eq-reduce does not fuse at
            # whole-scene sizes (XLA tried to materialize the (C,256,N)
            # compare — 60 GB at 36 MP)
            from rs_image_segmentation_tpu.pipeline.turbo import histogram256
            parts = [histogram256(_get_tile(src, y0, min(h, y0 + tile_rows)))
                     for y0 in range(0, h, tile_rows)]
            hists = np.asarray(
                jnp.sum(jnp.stack(parts), axis=0)).astype(np.int64)
        else:
            hists = band_histograms_u8(arr)
    stats = compute_global_stats(arr, cfg, hists=hists)

    window = cfg.glcm.window_size
    n_i = (h - window) // step + 1
    n_j = (w - window) // step + 1
    contrast_grid = np.zeros((n_i, n_j), np.float32)
    homog_grid = np.zeros((n_i, n_j), np.float32)
    p_lo = jnp.asarray(stats.p_lo)
    p_hi = jnp.asarray(stats.p_hi)
    med = jnp.asarray(stats.median)
    iqr = jnp.asarray(stats.iqr)
    tex_lo = np.float32(stats.tex_lo)
    tex_hi = np.float32(stats.tex_hi)
    tb = cfg.texture_band_index

    def tile_globals(tile, lo: int, rows: int, glcm_rows: int):
        return _tile_globals(tile, p_lo, p_hi, med, iqr,
                             jnp.float32(tex_lo), jnp.float32(tex_hi),
                             lo=lo, rows=rows, glcm_rows=glcm_rows,
                             levels=cfg.glcm.levels, window=window,
                             step=step, angles=cfg.glcm.angles, tb=tb,
                             n_j=n_j)

    resident = isinstance(src, jnp.ndarray)
    s1_acc = np.zeros(c, np.float64)
    s2_acc = np.zeros((c, c), np.float64)
    n = 0
    sobel_max = 0.0
    pending = []

    def drain_streaming(item):
        nonlocal s1_acc, s2_acc, sobel_max
        y0, glcm_rows, res = item
        s1_acc += np.asarray(res[0], np.float64)
        s2_acc += np.asarray(res[1], np.float64)
        gi = y0 // step
        contrast_grid[gi:gi + glcm_rows] = np.asarray(res[2])[:glcm_rows]
        homog_grid[gi:gi + glcm_rows] = np.asarray(res[3])[:glcm_rows]
        sobel_max = max(sobel_max, float(res[4]))

    prev = None
    for y0 in range(0, h, tile_rows):
        rows = min(tile_rows, h - y0)
        ys = max(0, y0 - 1)
        ye = min(h, y0 + rows + 1)
        glcm_rows = max(0, (rows - window) // step + 1) \
            if y0 <= h - window else 0
        res = tile_globals(_get_tile(src, ys, ye), y0 - ys, rows,
                           glcm_rows)
        n += rows * w
        if resident:
            pending.append((y0, glcm_rows, res))
        else:
            # streaming: one-tile lookahead — tile i+1's H2D + dispatch is
            # issued before tile i's small result tuple is fetched, so
            # transfer overlaps compute; two tiles in flight, bounded
            if prev is not None:
                drain_streaming(prev)
            prev = (y0, glcm_rows, res)
    if prev is not None:
        drain_streaming(prev)
    if pending:
        # drain with ONE fetch per output kind (stacked on device); f64
        # accumulation still happens here on host, per tile, in order
        for t1 in np.asarray(jnp.stack([r[0] for _, _, r in pending]),
                             np.float64):
            s1_acc += t1
        for t2 in np.asarray(jnp.stack([r[1] for _, _, r in pending]),
                             np.float64):
            s2_acc += t2
        sobel_max = float(jnp.max(jnp.stack([r[4] for _, _, r in pending])))
        full = [(y0, g, r) for y0, g, r in pending
                if r[2].shape[0] == pending[0][2][2].shape[0] and g > 0]
        rest = [(y0, g, r) for y0, g, r in pending
                if r[2].shape[0] != pending[0][2][2].shape[0] and g > 0]
        for group in (full, rest):
            if not group:
                continue
            cons = np.asarray(jnp.stack([r[2] for _, _, r in group]))
            homs = np.asarray(jnp.stack([r[3] for _, _, r in group]))
            for k, (y0, g, _) in enumerate(group):
                gi = y0 // step
                contrast_grid[gi:gi + g] = cons[k][:g]
                homog_grid[gi:gi + g] = homs[k][:g]

    mean = s1_acc / n
    cov = (s2_acc - n * np.outer(mean, mean)) / (n - 1)
    eigvals, eigvecs = np.linalg.eigh(cov)
    comp1 = eigvecs[:, np.argsort(-eigvals)[0]]
    if comp1[np.argmax(np.abs(comp1))] < 0:  # svd_flip sign convention
        comp1 = -comp1
    stats.pca_mean = mean.astype(np.float32)
    stats.pca_comp1 = comp1.astype(np.float32)

    return {"p_lo": stats.p_lo, "p_hi": stats.p_hi, "median": stats.median,
            "iqr": stats.iqr, "tex_lo": np.float32(stats.tex_lo),
            "tex_hi": np.float32(stats.tex_hi), "pca_mean": stats.pca_mean,
            "pca_comp1": stats.pca_comp1,
            "sobel_max": np.float32(sobel_max),
            "contrast_grid": contrast_grid, "homog_grid": homog_grid}


def _globals_device(g: dict) -> dict:
    """The pass A-C statistics as a device pytree, passed as ARGUMENTS to
    the tile programs (closure constants would embed scene content in the
    HLO — every new scene would recompile instead of hitting the
    persistent cache)."""
    return {
        "p_lo": jnp.asarray(g["p_lo"]), "p_hi": jnp.asarray(g["p_hi"]),
        "median": jnp.asarray(g["median"]), "iqr": jnp.asarray(g["iqr"]),
        "pca_mean": jnp.asarray(g["pca_mean"]),
        "pca_comp1": jnp.asarray(g["pca_comp1"]),
        "tex_lo": jnp.asarray(np.float32(g["tex_lo"])),
        "tex_hi": jnp.asarray(np.float32(g["tex_hi"])),
        # same host arithmetic as the pre-refactor constant
        "smax": jnp.asarray(np.float32(float(g["sobel_max"]) + 1e-10)),
        "con": jnp.asarray(g["contrast_grid"]),
        "hom": jnp.asarray(g["homog_grid"]),
    }


@functools.partial(jax.jit, static_argnames=("lo", "rows", "out_hw", "tb"))
def _stack_tile_cm(tile, row0, gd: dict, *, lo: int, rows: int,
                   out_hw: Tuple[int, int], tb: int):
    """(7, rows+halo, w) tile -> (19, rows, w) CHANNEL-MAJOR stack.
    (HWC would put 19 in the lane dim, which the TPU pads to 128 —
    a 6.7x materialization tax; see pipeline.turbo.)"""
    bands01 = _normalize_tile(tile, gd["p_lo"], gd["p_hi"])
    idx = spectral_indices(bands01)
    med, iqr = gd["median"], gd["iqr"]
    xs = (bands01 - med[:, None, None]) / iqr[:, None, None]
    pc1 = jnp.einsum("chw,c->hw", xs - gd["pca_mean"][:, None, None],
                     gd["pca_comp1"],
                     precision=jax.lax.Precision.HIGHEST)
    nir = bands01[tb]
    tex_lo, tex_hi = gd["tex_lo"], gd["tex_hi"]
    tex = (jnp.clip(nir, tex_lo, tex_hi) - tex_lo) / (tex_hi - tex_lo + 1e-10)
    u8 = (tex * 255.0).astype(jnp.uint8)
    grad5 = gradient(u8, 5).astype(jnp.float32) / 255.0
    mean5 = box_filter(tex, 5)
    std5 = jnp.sqrt(jnp.maximum(box_filter(tex * tex, 5) - mean5 ** 2, 0.0))
    smag = sobel_magnitude(u8.astype(jnp.float32)) / 255.0 / gd["smax"]
    level_1 = jnp.stack([idx["ndwi"], idx["mndwi"], idx["ndvi"],
                         idx["evi"], idx["ndbi"], idx["bsi"], pc1])
    ctx = box_filter(level_1, 7, border="reflect")
    glcm_con = _resize_rows(gd["con"], out_hw, row0, rows)
    glcm_hom = _resize_rows(gd["hom"], out_hw, row0, rows)

    def crop(x):
        return jax.lax.dynamic_slice_in_dim(x, lo, rows, axis=x.ndim - 2)

    return jnp.concatenate([
        crop(level_1), crop(ctx),
        jnp.stack([glcm_con, glcm_hom, crop(grad5), crop(std5),
                   crop(smag)])])


def _make_stack_fn(arr: np.ndarray, cfg: FeatureStageConfig,
                   tile_rows: int, globals_dict: Optional[dict] = None,
                   src=None, hists: Optional[np.ndarray] = None):
    """Per-tile 19-channel stack function over the pass A-C global
    statistics (computed here unless a checkpointed dict is supplied).
    The returned callable routes through the module-level jitted kernel
    with the statistics as device arguments (scene-independent HLO)."""
    c, h, w = arr.shape
    g = globals_dict if globals_dict is not None else _global_passes(
        arr, cfg, tile_rows, src=src, hists=hists)
    gd = _globals_device(g)
    tb = cfg.texture_band_index

    def stack_tile(tile, row0, lo, rows: int):
        return _stack_tile_cm(tile, row0, gd, lo=int(lo), rows=rows,
                              out_hw=(h, w), tb=tb)

    return stack_tile, g


@functools.partial(jax.jit, static_argnames=("lo", "rows", "out_hw", "tb",
                                             "chunk", "out_dt", "plan"))
def _classify_tile_cm(tile, row0, gd: dict, gf: GemmForest, *, lo: int,
                      rows: int, out_hw: Tuple[int, int], tb: int,
                      chunk: int, out_dt, plan=None):
    """One fused tile program: 19-channel stack + transposed forest GEMM.
    Globals and forest arrive as pytree arguments so the compiled
    executable is reusable across scenes and models of the same shape."""
    from rs_image_segmentation_tpu.pipeline.turbo import gemm_labels_cm
    stack = _stack_tile_cm(tile, row0, gd, lo=lo, rows=rows,
                           out_hw=out_hw, tb=tb)           # (19, rows, w)
    pred = gemm_labels_cm(gf, stack.reshape(19, -1), chunk, plan=plan)
    return pred.reshape(rows, out_hw[1]).astype(out_dt)


def classify_large_scene(arr: np.ndarray, gf: GemmForest,
                         cfg: FeatureStageConfig = FeatureStageConfig(),
                         tile_rows: int = 504,
                         hists: Optional[np.ndarray] = None,
                         writer=None) -> np.ndarray:
    """Classify a PREPROCESSED (7, H, W) uint8-valued scene of any size in
    row tiles. ``tile_rows`` must be a multiple of the GLCM step so texture
    windows align with the global window grid. ``hists``: precomputed
    per-band histograms of ``arr`` (``preprocess_large(return_hist=True)``)
    to skip the pass-A histogram sweep.

    ``writer``: optional ``io.tiff.TiffTileStreamWriter`` — completed
    label rows stream into it AS TILES DRAIN, so the host LZW encode
    (thread pool, GIL-free native codec) overlaps the device computing
    the next tile instead of serializing after the loop; the caller
    still gets the full map and must ``close()`` the writer. Measured at
    36 MP: e2e-with-write within noise of e2e-without (vs +3-4 s serial
    encode)."""
    c, h, w = arr.shape
    src = _tile_src(arr)
    stack_tile, g = _make_stack_fn(arr, cfg, tile_rows, src=src,
                                   hists=hists)
    gd = _globals_device(g)
    chunk = _gemm_chunk(gf.path.shape[1])
    out_dt = _label_transfer_dtype(gf)
    tb = cfg.texture_band_index
    from rs_image_segmentation_tpu.models.forest import forest_tree_plan
    plan = forest_tree_plan(gf)

    def classify_tile(tile, row0, lo, rows: int):
        return _classify_tile_cm(tile, row0, gd, gf, lo=int(lo), rows=rows,
                                 out_hw=(h, w), tb=tb, chunk=chunk,
                                 out_dt=out_dt, plan=plan)

    resident = isinstance(src, jnp.ndarray)
    pending = []
    out = np.zeros((h, w), np.int32)
    prev = None
    for y0 in range(0, h, tile_rows):
        rows = min(tile_rows, h - y0)
        ys = max(0, y0 - HALO)
        ye = min(h, y0 + rows + HALO)
        tile = _get_tile(src, ys, ye)
        dev = classify_tile(tile, y0, y0 - ys, rows)
        if resident:
            pending.append((y0, rows, dev))
        else:
            # streaming: one-tile lookahead (H2D of tile i+1 + dispatch
            # before tile i's label fetch) — overlaps transfer with
            # compute while device memory stays bounded at two tiles
            if prev is not None:
                p0, prows, pdev = prev
                out[p0:p0 + prows] = np.asarray(pdev)
                if writer is not None:
                    writer.write_rows(out[p0:p0 + prows])
            prev = (y0, rows, dev)
    if prev is not None:
        p0, prows, pdev = prev
        out[p0:p0 + prows] = np.asarray(pdev)
        if writer is not None:
            writer.write_rows(out[p0:p0 + prows])
    for y0, rows, dev in pending:  # drain once: tiles pipeline on device
        out[y0:y0 + rows] = np.asarray(dev)
        if writer is not None:
            writer.write_rows(out[y0:y0 + rows])
    return out


def classify_large_scene_streamed(arr: np.ndarray, gf: GemmForest,
                                  cal: CalibrationConfig = CalibrationConfig(),
                                  cfg: FeatureStageConfig = FeatureStageConfig(),
                                  tile_rows: int = 504,
                                  writer=None) -> np.ndarray:
    """RAW (7, H, W) uint8 HOST scene -> (H, W) labels, with the scene's
    H2D transfer tile-streamed UNDER preprocess + pass-B/C compute.

    The monolithic warm path (``preprocess_large(return_device=True)`` ->
    ``classify_large_scene``) serializes one whole-scene ``device_put``
    (252 MB at 36 MP — ~2.5 s through this environment's tunnel) before
    any compute starts. Here (round-5 VERDICT #7):

      * global statistics come from the HOST raw histograms
        (``build_stretch_stats`` — native bincount, ~100 ms at 36 MP,
        overlapped with the first chunk transfers), which are exact: the
        stretched-value histogram is the raw-DN bincount pushed through
        the per-DN LUT, bit-identical to the device histogram pass
        (tested at stage shapes);
      * raw row chunks ship two-deep ahead of the compute stream, each
        followed immediately by its LUT kernel and (one chunk behind) the
        merged pass-B/C tile program — programs execute in launch order,
        so chunk i+1's DMA overlaps chunk i's kernels with no host syncs
        until the tiny pass-B/C drains;
      * pass D then classifies from the device-resident stretched chunks
        (tiles assembled by edge-row concat, never re-shipped).

    Labels are bit-identical to the monolithic warm path: same LUT, same
    histograms, same per-tile program signatures with identical inputs
    (tested on a multi-tile scene).

    ``writer``: optional ``io.tiff.TiffTileStreamWriter``, same contract
    as :func:`classify_large_scene`."""
    from rs_image_segmentation_tpu.pipeline.preprocess import (
        _apply_lut, build_stretch_stats)

    c, h, w = arr.shape
    step = cfg.glcm.step_size
    if tile_rows % step:
        raise ValueError(f"tile_rows must be a multiple of {step}")
    y0s = list(range(0, h, tile_rows))
    n_chunks = len(y0s)

    def put(i):
        y0 = y0s[i]
        return jax.device_put(np.ascontiguousarray(
            arr[:, y0:min(h, y0 + tile_rows), :]))

    # first transfers fly while the host builds the exact global stats
    raw = {0: put(0)}
    if n_chunks > 1:
        raw[1] = put(1)
    lut, sp, hists = build_stretch_stats(arr, cal.gains, cal.biases)
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from rs_image_segmentation_tpu.ops.pallas_kernels import (
            lut_hist_pallas)
        lut_d = jax.device_put(lut.astype(np.uint8))
        sp_d = jax.device_put(sp)

        def apply_lut(chunk):
            return lut_hist_pallas(chunk, lut_d, out_u8=True, sp=sp_d,
                                   skip_hist=True)
    else:
        lut_d = jax.device_put(jnp.asarray(lut))

        def apply_lut(chunk):
            return _apply_lut(chunk, lut_d)

    stats = compute_global_stats(arr, cfg, hists=hists.astype(np.int64))
    p_lo, p_hi = jnp.asarray(stats.p_lo), jnp.asarray(stats.p_hi)
    med, iqr = jnp.asarray(stats.median), jnp.asarray(stats.iqr)
    window = cfg.glcm.window_size
    n_i = (h - window) // step + 1
    n_j = (w - window) // step + 1
    tb = cfg.texture_band_index

    def bc_tile(tile, y0, rows, glcm_rows):
        return _tile_globals(tile, p_lo, p_hi, med, iqr,
                             jnp.float32(stats.tex_lo),
                             jnp.float32(stats.tex_hi),
                             lo=y0 - max(0, y0 - 1), rows=rows,
                             glcm_rows=glcm_rows, levels=cfg.glcm.levels,
                             window=window, step=step,
                             angles=cfg.glcm.angles, tb=tb, n_j=n_j)

    st = []                       # device-resident stretched chunks
    pending_bc = []

    def dispatch_bc(i):
        y0 = y0s[i]
        rows = min(tile_rows, h - y0)
        parts = []
        if i > 0:
            parts.append(st[i - 1][:, -1:, :])
        parts.append(st[i])
        if i + 1 < n_chunks:
            parts.append(st[i + 1][:, :1, :])
        tile = parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                                axis=1)
        glcm_rows = max(0, (rows - window) // step + 1) \
            if y0 <= h - window else 0
        pending_bc.append((y0, glcm_rows,
                           bc_tile(tile, y0, rows, glcm_rows)))

    for i in range(n_chunks):
        if i + 2 < n_chunks:
            raw[i + 2] = put(i + 2)       # keep two transfers in flight
        st.append(apply_lut(raw.pop(i)))
        if i >= 1:
            dispatch_bc(i - 1)
    dispatch_bc(n_chunks - 1)

    # drain pass B/C with ONE stacked fetch per output kind; f64
    # accumulation on host, per tile, in order (matches _global_passes)
    contrast_grid = np.zeros((n_i, n_j), np.float32)
    homog_grid = np.zeros((n_i, n_j), np.float32)
    s1_acc = np.zeros(c, np.float64)
    s2_acc = np.zeros((c, c), np.float64)
    for t1 in np.asarray(jnp.stack([r[0] for _, _, r in pending_bc]),
                         np.float64):
        s1_acc += t1
    for t2 in np.asarray(jnp.stack([r[1] for _, _, r in pending_bc]),
                         np.float64):
        s2_acc += t2
    sobel_max = float(jnp.max(jnp.stack([r[4] for _, _, r in pending_bc])))
    full = [(y0, g, r) for y0, g, r in pending_bc
            if r[2].shape[0] == pending_bc[0][2][2].shape[0] and g > 0]
    rest = [(y0, g, r) for y0, g, r in pending_bc
            if r[2].shape[0] != pending_bc[0][2][2].shape[0] and g > 0]
    for group in (full, rest):
        if not group:
            continue
        cons = np.asarray(jnp.stack([r[2] for _, _, r in group]))
        homs = np.asarray(jnp.stack([r[3] for _, _, r in group]))
        for k, (y0, gl, _) in enumerate(group):
            gi = y0 // step
            contrast_grid[gi:gi + gl] = cons[k][:gl]
            homog_grid[gi:gi + gl] = homs[k][:gl]
    n = h * w
    mean = s1_acc / n
    cov = (s2_acc - n * np.outer(mean, mean)) / (n - 1)
    eigvals, eigvecs = np.linalg.eigh(cov)
    comp1 = eigvecs[:, np.argsort(-eigvals)[0]]
    if comp1[np.argmax(np.abs(comp1))] < 0:   # svd_flip sign convention
        comp1 = -comp1
    g = {"p_lo": stats.p_lo, "p_hi": stats.p_hi, "median": stats.median,
         "iqr": stats.iqr, "tex_lo": np.float32(stats.tex_lo),
         "tex_hi": np.float32(stats.tex_hi),
         "pca_mean": mean.astype(np.float32),
         "pca_comp1": comp1.astype(np.float32),
         "sobel_max": np.float32(sobel_max),
         "contrast_grid": contrast_grid, "homog_grid": homog_grid}

    # ---- pass D over the resident stretched chunks
    gd = _globals_device(g)
    chunk = _gemm_chunk(gf.path.shape[1])
    out_dt = _label_transfer_dtype(gf)
    from rs_image_segmentation_tpu.models.forest import forest_tree_plan
    plan = forest_tree_plan(gf)
    pending = []
    for i, y0 in enumerate(y0s):
        rows = min(tile_rows, h - y0)
        ys = max(0, y0 - HALO)
        ye = min(h, y0 + rows + HALO)
        parts = []
        if i > 0:
            parts.append(st[i - 1][:, -(y0 - ys):, :])
        parts.append(st[i])
        if i + 1 < n_chunks and ye > y0 + rows:
            parts.append(st[i + 1][:, :ye - (y0 + rows), :])
        tile = parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                                axis=1)
        dev = _classify_tile_cm(tile, y0, gd, gf, lo=int(y0 - ys),
                                rows=rows, out_hw=(h, w), tb=tb,
                                chunk=chunk, out_dt=out_dt, plan=plan)
        pending.append((y0, rows, dev))
    out = np.zeros((h, w), np.int32)
    for y0, rows, dev in pending:   # tiles pipeline on device
        out[y0:y0 + rows] = np.asarray(dev)
        if writer is not None:
            writer.write_rows(out[y0:y0 + rows])
    return out


# ------------------------------------------------------- resumable runs

class TileInterrupt(RuntimeError):
    """Raised by the fault-injection hook (SURVEY §5: failure detection /
    fault injection) after N tiles, to test crash-resume paths."""


def _scene_fingerprint(arr: np.ndarray, extra) -> str:
    """Checkpoint binding: content hash (full up to 64 MB, strided sample
    + shape beyond — hashing a multi-GB scene per run would dwarf a
    resume) + the run parameters that change the output."""
    import hashlib

    hsh = hashlib.sha1()
    hsh.update(repr((arr.shape, str(arr.dtype)) + tuple(extra)).encode())
    if arr.nbytes <= (64 << 20):
        hsh.update(np.ascontiguousarray(arr).tobytes())
    else:
        step = max(1, arr.nbytes // (16 << 20))
        hsh.update(np.ascontiguousarray(arr.reshape(-1)[::step]).tobytes())
    return hsh.hexdigest()


def _open_manifest(checkpoint_dir: str, fingerprint: str, fresh: dict,
                   data_files) -> dict:
    """Load the manifest if it matches ``fingerprint``; otherwise discard
    any stale checkpoint files and return ``fresh`` (with the fingerprint
    stamped in). A partial checkpoint without a manifest is
    unverifiable and also discarded."""
    import json
    import os

    os.makedirs(checkpoint_dir, exist_ok=True)
    mpath = os.path.join(checkpoint_dir, "manifest.json")
    fresh = dict(fresh, fingerprint=fingerprint)
    stale = False
    if os.path.exists(mpath):
        with open(mpath) as f:
            saved = json.load(f)
        if saved.get("fingerprint") == fingerprint:
            return saved
        stale = True
    else:
        stale = any(os.path.exists(os.path.join(checkpoint_dir, p))
                    for p in data_files)
    if stale:
        for p in data_files:
            full = os.path.join(checkpoint_dir, p)
            if os.path.exists(full):
                os.remove(full)
    return fresh


def _save_manifest(checkpoint_dir: str, manifest: dict) -> None:
    import json
    import os

    mpath = os.path.join(checkpoint_dir, "manifest.json")
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mpath)


def kmeans_large_scene_resumable(
        arr: np.ndarray, checkpoint_dir: str, n_clusters: int = 7,
        cfg: FeatureStageConfig = FeatureStageConfig(),
        tile_rows: int = 504, seed: int = 42, fit_fraction: float = 0.1,
        max_fit_pixels: int = 2_000_000,
        interrupt_after: Optional[int] = None) -> np.ndarray:
    """:func:`kmeans_large_scene` with a resumable cursor (SURVEY §2.7
    elastic row — checkpointed per-tile progress as a framework
    property, not a per-method one).

    Checkpoints to ``checkpoint_dir``:
      * ``kmeans_fit.npz`` — the complete pass-1 fit state (global
        MinMax bounds + converged centroids), computed once;
      * ``partial.npy``   — the label map, flushed per assignment tile;
      * ``manifest.json`` — fingerprint + completed tile rows, written
        atomically after every tile.

    A restarted run skips the fit and every completed tile and is
    bit-identical to an uninterrupted run (assignment tiles are
    independent given the fit state). The checkpoint is fingerprint-
    bound to the scene content and every parameter that changes the
    output."""
    import os

    c, h, w = arr.shape
    fingerprint = _scene_fingerprint(
        arr, (tile_rows, cfg, "kmeans", n_clusters, seed, fit_fraction,
              max_fit_pixels))
    fpath = os.path.join(checkpoint_dir, "kmeans_fit.npz")
    ppath = os.path.join(checkpoint_dir, "partial.npy")
    manifest = _open_manifest(
        checkpoint_dir, fingerprint,
        {"shape": [h, w], "tile_rows": tile_rows, "done": []},
        ("kmeans_fit.npz", "partial.npy"))

    src = _tile_src(arr)
    stack_tile, _ = _make_stack_fn(arr, cfg, tile_rows, src=src)
    if os.path.exists(fpath):
        with np.load(fpath) as z:
            mins_d = jnp.asarray(z["mins"])
            rng_d = jnp.asarray(z["rng"])
            cents = jnp.asarray(z["centroids"])
    else:
        mins_d, rng_d, cents = _kmeans_fit_large(
            arr, n_clusters, cfg, tile_rows, seed, fit_fraction,
            max_fit_pixels, src, stack_tile)
        tmp = fpath + ".tmp.npz"
        np.savez(tmp, mins=np.asarray(mins_d), rng=np.asarray(rng_d),
                 centroids=np.asarray(cents))
        os.replace(tmp, fpath)

    if os.path.exists(ppath):
        out = np.lib.format.open_memmap(ppath, mode="r+")
    else:
        out = np.lib.format.open_memmap(ppath, mode="w+", dtype=np.int32,
                                        shape=(h, w))

    assign = _kmeans_assign_fn(mins_d, rng_d, cents, n_clusters)
    done = set(manifest["done"])
    fresh_tiles = 0
    for y0 in range(0, h, tile_rows):
        if y0 in done:
            continue
        if interrupt_after is not None and fresh_tiles >= interrupt_after:
            raise TileInterrupt(f"injected fault after {fresh_tiles} tiles")
        rows = min(tile_rows, h - y0)
        ys = max(0, y0 - HALO)
        ye = min(h, y0 + rows + HALO)
        tile = _get_tile(src, ys, ye)
        stack = stack_tile(tile, y0, y0 - ys, rows)
        out[y0:y0 + rows] = np.asarray(assign(stack).reshape(rows, w))
        out.flush()
        done.add(y0)
        manifest["done"] = sorted(done)
        _save_manifest(checkpoint_dir, manifest)
        fresh_tiles += 1
    return np.asarray(out)


def rule_based_large_scene_resumable(
        arr: np.ndarray, checkpoint_dir: str,
        cfg: FeatureStageConfig = FeatureStageConfig(),
        rule_cfg=None, hists: Optional[np.ndarray] = None,
        interrupt_after: Optional[int] = None,
        cc_impl: str = "auto") -> np.ndarray:
    """:func:`rule_based_large_scene` with a resumable PER-MASK cursor.

    The rule path is one device program per mask rather than a host tile
    loop, so the natural checkpoint unit is the post-processed mask:
    ``mask_vegetation/water/builtup/bareland.npy`` are flushed as each
    completes (uint8, ~HW bytes each), with the fingerprint-bound
    manifest recording completion. A resumed run recomputes only the
    missing masks and paints the same final map bit-for-bit (masks are
    deterministic functions of the scene + config; bareland depends only
    on the three painted masks, which are loaded from the checkpoint).
    ``interrupt_after=N`` raises :class:`TileInterrupt` after N freshly
    computed masks (the fault-injection hook)."""
    import os

    from rs_image_segmentation_tpu.core.config import RuleBasedConfig
    from rs_image_segmentation_tpu.pipeline.classify import (bare_rule_mask,
                                                             paint_rule_masks,
                                                             rule_mask)

    rule_cfg = rule_cfg if rule_cfg is not None else RuleBasedConfig()
    if hists is None:
        hists = band_histograms_u8(arr)
    c, h, w = arr.shape
    fingerprint = _scene_fingerprint(arr, (cfg, "rule_based", rule_cfg))
    stages = ("vegetation", "water", "builtup", "bareland")
    files = tuple(f"mask_{s}.npy" for s in stages)
    manifest = _open_manifest(
        checkpoint_dir, fingerprint,
        {"shape": [h, w], "done": []}, files)

    nd = None  # the four index planes, computed lazily once per run
    masks = {}
    done = set(manifest["done"])
    fresh_masks = 0
    for stage in stages:
        path = os.path.join(checkpoint_dir, f"mask_{stage}.npy")
        if stage in done and os.path.exists(path):
            masks[stage] = np.load(path)
            continue
        if interrupt_after is not None and fresh_masks >= interrupt_after:
            raise TileInterrupt(f"injected fault after {fresh_masks} masks")
        if nd is None:
            nd = _rule_indices(jnp.asarray(arr, jnp.uint8),
                               jnp.asarray(hists.astype(np.int32)), cfg)
        if stage == "bareland":
            painted = paint_rule_masks(jnp.asarray(masks["vegetation"]),
                                       jnp.asarray(masks["water"]),
                                       jnp.asarray(masks["builtup"]))
            m = bare_rule_mask(painted, nd[0], nd[3], rule_cfg,
                               cc_impl=cc_impl)
        else:
            m = rule_mask(stage, nd[0], nd[1], nd[2], nd[3], rule_cfg,
                          cc_impl=cc_impl)
        masks[stage] = np.asarray(m, np.uint8)
        tmp = path + ".tmp.npy"
        np.save(tmp, masks[stage])
        os.replace(tmp, path)
        done.add(stage)
        manifest["done"] = sorted(done)
        _save_manifest(checkpoint_dir, manifest)
        fresh_masks += 1

    out = paint_rule_masks(jnp.asarray(masks["vegetation"]),
                           jnp.asarray(masks["water"]),
                           jnp.asarray(masks["builtup"]))
    out = jnp.where((jnp.asarray(masks["bareland"]) == 1) & (out == 0), 4,
                    out)
    return np.asarray(out.astype(jnp.uint8))


def classify_large_scene_resumable(
        arr: np.ndarray, gf: GemmForest, checkpoint_dir: str,
        cfg: FeatureStageConfig = FeatureStageConfig(),
        tile_rows: int = 504,
        interrupt_after: Optional[int] = None,
        hists: Optional[np.ndarray] = None) -> np.ndarray:
    """``classify_large_scene`` with a resumable tile cursor.

    Checkpoints to ``checkpoint_dir``:
      * ``globals.npz``   — the pass A-C statistics (computed once);
      * ``partial.npy``   — the output label map, flushed per tile (memmap);
      * ``manifest.json`` — tile geometry + the set of completed tile rows,
        written atomically (tmp + rename) after every tile.

    A restarted run with the same arguments skips the global passes and
    every completed tile, producing a map bit-identical to an uninterrupted
    run (tiles are independent given the globals). The checkpoint is bound
    to the INPUT: a fingerprint of the scene content + tile geometry + cfg
    is stored in the manifest, and any mismatch (different scene, shape,
    tile_rows, or feature config) discards the stale checkpoint instead of
    silently returning another scene's map. ``interrupt_after=N`` raises
    :class:`TileInterrupt` after N newly-computed tiles — the
    fault-injection hook the resume test uses. Reference analog: per-stage
    artifact persistence + model cache (3_classification.py:459-475)."""
    import hashlib
    import json
    import os

    os.makedirs(checkpoint_dir, exist_ok=True)
    gpath = os.path.join(checkpoint_dir, "globals.npz")
    ppath = os.path.join(checkpoint_dir, "partial.npy")
    mpath = os.path.join(checkpoint_dir, "manifest.json")
    c, h, w = arr.shape

    # scene fingerprint: full content hash up to 64 MB, strided sample +
    # shape beyond (hashing a multi-GB scene per run would dwarf a resume)
    hsh = hashlib.sha1()
    hsh.update(repr((arr.shape, str(arr.dtype), tile_rows, cfg)).encode())
    if arr.nbytes <= (64 << 20):
        hsh.update(np.ascontiguousarray(arr).tobytes())
    else:
        step = max(1, arr.nbytes // (16 << 20))
        hsh.update(np.ascontiguousarray(arr.reshape(-1)[::step]).tobytes())
    fingerprint = hsh.hexdigest()

    manifest = {"shape": [h, w], "tile_rows": tile_rows,
                "fingerprint": fingerprint, "done": []}
    stale = False
    if os.path.exists(mpath):
        with open(mpath) as f:
            saved = json.load(f)
        if saved.get("fingerprint") == fingerprint:
            manifest = saved
        else:
            stale = True
    elif os.path.exists(gpath) or os.path.exists(ppath):
        stale = True  # partial checkpoint with no manifest: unverifiable
    if stale:
        for p in (gpath, ppath):
            if os.path.exists(p):
                os.remove(p)

    src = _tile_src(arr)
    if os.path.exists(gpath) and not stale:
        with np.load(gpath) as z:
            globals_dict = {k: z[k] for k in z.files}
    else:
        globals_dict = _global_passes(arr, cfg, tile_rows, src=src,
                                      hists=hists)
        tmp = gpath + ".tmp.npz"
        np.savez(tmp, **globals_dict)
        os.replace(tmp, gpath)

    if os.path.exists(ppath):
        out = np.lib.format.open_memmap(ppath, mode="r+")
        if out.shape != (h, w):          # unreachable after the fingerprint
            raise ValueError(f"checkpoint partial.npy shape {out.shape} "
                             f"!= scene {(h, w)}")
    else:
        out = np.lib.format.open_memmap(ppath, mode="w+", dtype=np.int32,
                                        shape=(h, w))

    gd = _globals_device(globals_dict)
    chunk = _gemm_chunk(gf.path.shape[1])
    out_dt = _label_transfer_dtype(gf)
    tb = cfg.texture_band_index
    from rs_image_segmentation_tpu.models.forest import forest_tree_plan
    plan = forest_tree_plan(gf)

    def classify_tile(tile, row0, lo, rows: int):
        return _classify_tile_cm(tile, row0, gd, gf, lo=int(lo), rows=rows,
                                 out_hw=(h, w), tb=tb, chunk=chunk,
                                 out_dt=out_dt, plan=plan)

    done = set(manifest["done"])
    fresh = 0
    for y0 in range(0, h, tile_rows):
        if y0 in done:
            continue
        if interrupt_after is not None and fresh >= interrupt_after:
            raise TileInterrupt(f"injected fault after {fresh} tiles")
        rows = min(tile_rows, h - y0)
        ys = max(0, y0 - HALO)
        ye = min(h, y0 + rows + HALO)
        tile = _get_tile(src, ys, ye)
        out[y0:y0 + rows] = np.asarray(classify_tile(tile, y0, y0 - ys, rows))
        out.flush()
        done.add(y0)
        manifest["done"] = sorted(done)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
        fresh += 1
    return np.asarray(out)
