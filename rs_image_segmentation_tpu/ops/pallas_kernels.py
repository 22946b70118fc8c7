"""Pallas TPU kernels for fused hot paths.

XLA already fuses most of this pipeline well; these kernels exist where
explicit control of the memory pattern beats the default lowering:

  * ``fused_spectral_indices``: all 7 guarded-ratio indices in ONE pass over
    the band stack — each (8, 128) tile of the 5 input bands is read from
    HBM into VMEM once and all 7 outputs are produced from registers,
    instead of 7 separate elementwise graphs re-reading the bands.
  * ``fused_calibrate_stretch``: stage-1 calibrate + min/max stretch with the
    band min/max passed in SMEM, one pass per band tile.

Both run in interpreter mode off-TPU so CPU tests exercise the same code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUBLANE = 8


def _pad_hw(x: jnp.ndarray):
    h, w = x.shape[-2], x.shape[-1]
    ph = (-h) % _SUBLANE
    pw = (-w) % _LANE
    if ph or pw:
        cfg = [(0, 0)] * (x.ndim - 2) + [(0, ph), (0, pw)]
        x = jnp.pad(x, cfg)
    return x, h, w


def _indices_kernel(bands_ref, out_ref):
    blue = bands_ref[0]
    green = bands_ref[1]
    red = bands_ref[2]
    nir = bands_ref[3]
    swir1 = bands_ref[4]

    def guarded(num, den):
        ok = den > 1e-3
        r = jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0)
        return jnp.clip(r, -1.0, 1.0)

    out_ref[0] = guarded(nir - red, nir + red)                      # ndvi
    out_ref[1] = guarded(2.5 * (nir - red),
                         nir + 6.0 * red - 7.5 * blue + 1.0)        # evi
    t = 2.0 * nir + 1.0
    out_ref[2] = jnp.clip((t - jnp.sqrt(t * t - 8.0 * (nir - red))) / 2.0,
                          -1.0, 1.0)                                # msavi
    out_ref[3] = guarded(green - nir, green + nir)                  # ndwi
    out_ref[4] = guarded(green - swir1, green + swir1)              # mndwi
    out_ref[5] = guarded(swir1 - nir, swir1 + nir)                  # ndbi
    sr = swir1 + red
    nb = nir + blue
    out_ref[6] = guarded(sr - nb, sr + nb)                          # bsi


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_spectral_indices(bands: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """(>=5, H, W) normalized bands -> (7, H, W) stack
    [ndvi, evi, msavi, ndwi, mndwi, ndbi, bsi] in one fused pass.

    Semantics identical to ops.indices.spectral_indices (guarded divide at
    den > 1e-3, clip to [-1, 1])."""
    x, h, w = _pad_hw(bands[:5].astype(jnp.float32))
    hp, wp = x.shape[-2], x.shape[-1]
    grid = (hp // _SUBLANE, wp // _LANE)
    out = pl.pallas_call(
        _indices_kernel,
        out_shape=jax.ShapeDtypeStruct((7, hp, wp), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((5, _SUBLANE, _LANE),
                               lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((7, _SUBLANE, _LANE),
                               lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)
    return out[:, :h, :w]


_GLCM_BLOCK = 8  # windows per program (sublane-aligned)


def _glcm_pairs_kernel(levels: int, n_offsets: int, src_ref, dst_ref,
                       out_ref):
    """8 windows x n_offsets per grid step. Refs hold the flattened
    (pair-padded) src/dst level sequences as (8*n_offsets, P) rows; every
    op stays 2-D (Mosaic-friendly): one-hot rows via (L, 1) == (1, P)
    compares, co-occurrence via an (L, P) x (L, P)^T contraction on the
    MXU, props as elementwise reductions. Padding pairs carry -1 and
    one-hot to zero, so they contribute nothing."""
    lv_col = jax.lax.broadcasted_iota(jnp.int32, (levels, 1), 0)
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (levels, levels), 0
                                     ).astype(jnp.float32)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (levels, levels), 1
                                     ).astype(jnp.float32)
    diff = i_idx - j_idx

    rows = []
    for k in range(_GLCM_BLOCK):
        contrast = jnp.float32(0.0)
        dissim = jnp.float32(0.0)
        homog = jnp.float32(0.0)
        energy = jnp.float32(0.0)
        corr = jnp.float32(0.0)
        for o in range(n_offsets):
            r = k * n_offsets + o
            src = src_ref[r:r + 1, :]                   # (1, P)
            dst = dst_ref[r:r + 1, :]
            a = (lv_col == src).astype(jnp.bfloat16)    # (L, P)
            b = (lv_col == dst).astype(jnp.bfloat16)
            cm = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            cm = cm + cm.T
            total = jnp.sum(cm)
            p = cm / jnp.where(total > 0, total, 1.0)
            contrast += jnp.sum(p * diff * diff)
            dissim += jnp.sum(p * jnp.abs(diff))
            homog += jnp.sum(p / (1.0 + diff * diff))
            energy += jnp.sqrt(jnp.sum(p * p))
            mean_i = jnp.sum(p * i_idx)
            mean_j = jnp.sum(p * j_idx)
            var_i = jnp.sum(p * (i_idx - mean_i) ** 2)
            var_j = jnp.sum(p * (j_idx - mean_j) ** 2)
            std = jnp.sqrt(var_i * var_j)
            cov = jnp.sum(p * (i_idx - mean_i) * (j_idx - mean_j))
            corr += jnp.where(std < 1e-15, 1.0,
                              cov / jnp.where(std < 1e-15, 1.0, std))
        n = float(n_offsets)
        rows.append(jnp.stack([contrast, dissim, homog, energy, corr]) / n)
    out_ref[:, :] = jnp.stack(rows)  # one vector store for the whole block


@functools.partial(jax.jit, static_argnames=("levels", "window", "step",
                                             "offsets", "interpret"))
def glcm_grid_pallas(q: jnp.ndarray, levels: int, window: int, step: int,
                     offsets, interpret: bool = False) -> jnp.ndarray:
    """Per-window GLCM props as a Pallas kernel.

    The offset pixel pairs are pre-flattened by XLA into lane-aligned
    (windows*offsets, P) sequences (pad = -1); each Pallas program then
    reduces 8 windows entirely in VMEM — no HBM co-occurrence tensors.

    q: (H, W) int32 quantized band. Returns (n_i, n_j, 5) float32 in the
    order [contrast, dissimilarity, homogeneity, energy, correlation]
    (mean over offsets), matching ops.texture.glcm_matrices+properties.
    """
    if step != window:
        raise ValueError("pallas GLCM supports the reference's "
                         "non-overlapping grid (step == window) only")
    from rs_image_segmentation_tpu.ops.texture import _extract_windows

    h, w = q.shape
    n_i = (h - window) // step + 1
    n_j = (w - window) // step + 1
    n = n_i * n_j
    windows = _extract_windows(q.astype(jnp.int32), window, step)

    p_max = max((min(window, window - dr) - max(0, -dr))
                * (min(window, window - dc) - max(0, -dc))
                for dr, dc in offsets)
    p_pad = -(-p_max // _LANE) * _LANE

    src_rows = []
    dst_rows = []
    for dr, dc in offsets:
        r0, r1 = max(0, -dr), min(window, window - dr)
        c0, c1 = max(0, -dc), min(window, window - dc)
        s = windows[:, r0:r1, c0:c1].reshape(n, -1)
        d = windows[:, r0 + dr:r1 + dr, c0 + dc:c1 + dc].reshape(n, -1)
        pad = p_pad - s.shape[1]
        src_rows.append(jnp.pad(s, ((0, 0), (0, pad)), constant_values=-1))
        dst_rows.append(jnp.pad(d, ((0, 0), (0, pad)), constant_values=-1))
    # interleave: rows (window k, offset o) at index k*n_offsets + o
    n_off = len(offsets)
    src = jnp.stack(src_rows, axis=1).reshape(n * n_off, p_pad)
    dst = jnp.stack(dst_rows, axis=1).reshape(n * n_off, p_pad)
    pn = (-n) % _GLCM_BLOCK
    if pn:
        src = jnp.pad(src, ((0, pn * n_off), (0, 0)), constant_values=-1)
        dst = jnp.pad(dst, ((0, pn * n_off), (0, 0)), constant_values=-1)

    kern = functools.partial(_glcm_pairs_kernel, levels, n_off)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n + pn, 5), jnp.float32),
        grid=((n + pn) // _GLCM_BLOCK,),
        in_specs=[
            pl.BlockSpec((_GLCM_BLOCK * n_off, p_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_GLCM_BLOCK * n_off, p_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_GLCM_BLOCK, 5), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(src, dst)
    return out[:n].reshape(n_i, n_j, 5)


def _calib_stretch_kernel(gain_ref, bias_ref, mn_ref, mx_ref, band_ref,
                          out_ref):
    g = gain_ref[0]
    b = bias_ref[0]
    mn = mn_ref[0]
    mx = mx_ref[0]
    cal = band_ref[:] * g + b
    out_ref[:] = (cal - mn) * (255.0 / (mx - mn))


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_calibrate_stretch(bands: jnp.ndarray, gains: jnp.ndarray,
                            biases: jnp.ndarray,
                            interpret: bool = False) -> jnp.ndarray:
    """Stage-1 calibrate + per-band min-max stretch (identity warp), fused:
    returns float32 in [0, 255] (caller truncates to uint8 to match the
    reference's astype)."""
    c = bands.shape[0]
    x, h, w = _pad_hw(bands.astype(jnp.float32))
    hp, wp = x.shape[-2], x.shape[-1]
    # per-band min/max of the CALIBRATED values = gain*min+bias etc. (gain>0)
    flat_min = jnp.min(bands.reshape(c, -1), axis=1).astype(jnp.float32)
    flat_max = jnp.max(bands.reshape(c, -1), axis=1).astype(jnp.float32)
    mn = gains * flat_min + biases
    mx = gains * flat_max + biases

    grid = (c, hp // _SUBLANE, wp // _LANE)
    out = pl.pallas_call(
        _calib_stretch_kernel,
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1,), lambda b, i, j: (b,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda b, i, j: (b,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda b, i, j: (b,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda b, i, j: (b,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _SUBLANE, _LANE), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _SUBLANE, _LANE),
                               lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(gains.astype(jnp.float32), biases.astype(jnp.float32), mn, mx, x)
    return out[:, :h, :w]


# ------------------------------------------------- fused LUT + histogram

_LUTHIST_BLKR = 40  # 128-px rows per program


def _lut_hist_kernel(dt, out_dt, t_ref, px_ref, out_ref, hist_ref):
    """One HBM pass producing the LUT-stretched block (out_dt holding
    exact integer levels) AND the raw-DN histogram partial for the band.

    Bilinear 16x16 decomposition of the 256-entry table: a DN splits as
    x = 16*h + l, so lut[x] = A_h^T T B_l with A/B 16-wide one-hots and
    T = lut.reshape(16, 16). That is 32 one-hot planes per pixel instead
    of 256 (measured 2.5x the full one-hot form, exactness unchanged):
      * selection U[l] = sum_h T[h, l] A[h] is an MXU dot whose products
        are exact (one-hot bf16 x u8-int-valued-bf16) and whose f32
        accumulation has one nonzero term;
      * the pixel value sum_l U[l] B[l] again has one nonzero term;
      * the raw histogram is the joint count J[h, l] = A @ B^T, a
        batched MXU matmul with integer-exact f32 accumulation
        (block counts < 2^24), accumulated int32 across grid steps.
    Pixels arrive pre-shaped (BLKR, 128) with the one-hot class dim in
    SUBLANES — no lane-padding waste and no in-kernel reshapes (Mosaic
    rejects sublane/lane-merging reshapes)."""
    x = px_ref[0].astype(jnp.int32)                         # (BLKR, 128)
    hi = x >> 4
    lo = x & 15
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (x.shape[0], 16, 128), 1)
    # dt = bf16 on TPU; f32 under interpret (XLA:CPU's DotThunk rejects
    # bf16 x bf16 -> f32). Both are exact for 0/1 and u8-int operands.
    a = (hi[:, None, :] == iota).astype(dt)                 # (BLKR,16,128)
    b = (lo[:, None, :] == iota).astype(dt)
    t = t_ref[0, :16, :16]                                  # (16h, 16l) f32
    u = jax.lax.dot_general(t.astype(dt), a,
                            (((0,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (16l,BLKR,128)
    val = jnp.sum(jnp.moveaxis(u, 0, 1) * b.astype(jnp.float32),
                  axis=1)                                   # (BLKR, 128)
    if out_dt == jnp.uint8:
        # Mosaic has no direct f32->u8 cast; values are exact ints 0..255
        val = val.astype(jnp.int32)
    out_ref[0] = val.astype(out_dt)
    j = jnp.sum(jax.lax.dot_general(a, b, (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32),
                axis=0)                                     # (16h, 16l)
    counts = jnp.concatenate(
        [j, jnp.zeros((16, 112), jnp.float32)], axis=1).astype(jnp.int32)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        hist_ref[0] = counts

    @pl.when(pl.program_id(1) != 0)
    def _acc():
        hist_ref[0] += counts


def _lut_hist_mixed_kernel(dt, out_dt, k_fix, with_hist, sp_ref, t_ref,
                           px_ref, *refs):
    """Per-band-routed variant of :func:`_lut_hist_kernel`: bands whose
    stretch admits a host-verified int32 fixed-point affine
    (``pipeline.preprocess.build_stretch_params``, mode=1) compute the
    stretched value with ~6 integer VPU ops plus <= k_fix DN fixups;
    the rest (mode=0: full-range bands with slope exactly 1.0 whose f64
    rounding staircase is irregular, and near-constant bands) keep the
    bilinear one-hot table dot. Measured 8.57 -> 1.4 ms on the 8-scene
    preamble when every band fits; bit-exact for every DN present in
    the scene (the LUT contract). With ``with_hist`` the raw-DN
    joint-count histogram shares the one-hot planes with the table
    branch; WITHOUT it (the host precomputed the stretched histogram —
    pipeline.preprocess.build_stretch_stats) arithmetic-routed bands
    skip the one-hot planes entirely, which is most of the remaining
    preamble cost (measured 5.2 -> 2.6 ms on the 8-scene batch)."""
    out_ref = refs[0]
    hist_ref = refs[1] if with_hist else None
    x = px_ref[0].astype(jnp.int32)                         # (BLKR, 128)
    hi = x >> 4
    lo = x & 15
    iota = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 16, 128), 1)
    if with_hist:
        a = (hi[:, None, :] == iota).astype(dt)             # (BLKR,16,128)
        b = (lo[:, None, :] == iota).astype(dt)
    # sp rides whole in SMEM (per-band blocks would violate the TPU
    # block-shape rules); the band index is the grid's first dimension
    band = pl.program_id(0)

    def cast_out(val_i32_or_f32):
        if out_dt == jnp.uint8:
            return val_i32_or_f32.astype(jnp.int32).astype(jnp.uint8)
        return val_i32_or_f32.astype(jnp.float32)

    @pl.when(sp_ref[band, 0] == 1)
    def _arith():
        a32 = sp_ref[band, 1]
        b32 = sp_ref[band, 2]
        val = jnp.clip((a32 * x + b32) >> 16, 0, 255)
        for k in range(k_fix):
            fv = sp_ref[band, 3 + k]
            fd = sp_ref[band, 3 + k_fix + k]
            val = val + jnp.where(x == fv, fd, 0)
        out_ref[0] = cast_out(val)

    @pl.when(sp_ref[band, 0] != 1)
    def _table():
        aa = a if with_hist else (hi[:, None, :] == iota).astype(dt)
        bb = b if with_hist else (lo[:, None, :] == iota).astype(dt)
        t = t_ref[0, :16, :16]                              # (16h, 16l) f32
        u = jax.lax.dot_general(t.astype(dt), aa,
                                (((0,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        val = jnp.sum(jnp.moveaxis(u, 0, 1) * bb.astype(jnp.float32),
                      axis=1)                               # (BLKR, 128)
        out_ref[0] = cast_out(val)

    if not with_hist:
        return
    j = jnp.sum(jax.lax.dot_general(a, b, (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32),
                axis=0)                                     # (16h, 16l)
    counts = jnp.concatenate(
        [j, jnp.zeros((16, 112), jnp.float32)], axis=1).astype(jnp.int32)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        hist_ref[0] = counts

    @pl.when(pl.program_id(1) != 0)
    def _acc():
        hist_ref[0] += counts


@functools.partial(jax.jit, static_argnames=("interpret", "out_u8",
                                             "skip_hist"))
def lut_hist_pallas(scene_u8: jnp.ndarray, lut_u8: jnp.ndarray,
                    interpret: bool = False, out_u8: bool = False,
                    sp: "jnp.ndarray | None" = None,
                    skip_hist: bool = False):
    """(C, H, W) uint8 scene + (C, 256) uint8 LUT ->
    (stretched (C, H, W) holding exact uint8 levels,
     stretched-value histogram (C, 256) int32).

    The stretched output is f32 by default (what the turbo stack
    consumes); ``out_u8=True`` writes uint8 straight from the kernel —
    identical values, but a whole-scene preprocess avoids materializing
    a 4x-sized f32 copy (at the 2 GiB device-resident cap the f32
    intermediate plus its cast pass would overflow HBM).

    Padding reads as DN 0; the pad count is subtracted from the raw bin 0
    before the (tiny) raw->stretched histogram remap, so the outputs
    match apply_u8_lut_mxu + histogram256 exactly (tested, incl. the
    large-block branch).

    ``sp``: optional (C, 3 + 2*STRETCH_FIXUPS) int32 per-band stretch
    routing (``pipeline.preprocess.build_stretch_params``) — bands with
    mode=1 take the ~6x-faster arithmetic path, the rest the table path
    (bit-exact for the scene's DNs either way).

    ``skip_hist=True`` (requires ``sp``) returns the stretched scene
    ONLY — for callers holding a host-precomputed stretched-value
    histogram (``build_stretch_stats``); arithmetic-routed bands then
    skip the one-hot planes entirely."""
    c, h, w = scene_u8.shape
    n = h * w
    # per-step fixed overhead is ~20-30 us; small scenes keep blocks small
    # (less padding), huge scenes need big blocks or the grid overhead
    # shows (measured at 36 MP x 7 bands: 49k steps at BLKR=40 vs 7.7k at
    # 256, several seconds apart). 256 is the VMEM ceiling: 512 tripped
    # the 16 MB scoped-vmem limit at 23 MB
    blkr = _LUTHIST_BLKR if n <= (1 << 22) else 256
    blk = blkr * 128
    pad = (-n) % blk
    flat = jnp.pad(scene_u8.reshape(c, -1), ((0, 0), (0, pad)))
    px = flat.reshape(c, -1, 128)                           # (C, R, 128)
    # T[h, l] = lut[16h + l], embedded in a (16, 128)-tiled buffer
    lut_t = jnp.zeros((c, 16, 128), jnp.float32
                      ).at[:, :, :16].set(
        lut_u8.astype(jnp.float32).reshape(c, 16, 16))

    grid = (c, px.shape[1] // blkr)
    dt = jnp.float32 if interpret else jnp.bfloat16
    out_dt = jnp.uint8 if out_u8 else jnp.float32
    out_shapes = (jax.ShapeDtypeStruct(px.shape, out_dt),
                  jax.ShapeDtypeStruct((c, 16, 128), jnp.int32))
    data_specs = [
        pl.BlockSpec((1, blkr, 128), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((1, blkr, 128), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 16, 128), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    if sp is not None:
        k_fix = (sp.shape[1] - 3) // 2
        res = pl.pallas_call(
            functools.partial(_lut_hist_mixed_kernel, dt, out_dt, k_fix,
                              not skip_hist),
            out_shape=(out_shapes[0] if skip_hist else out_shapes),
            grid=grid,
            in_specs=[
                pl.BlockSpec((c, sp.shape[1]), lambda b, i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 16, 128), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + data_specs,
            out_specs=(out_specs[0] if skip_hist else out_specs),
            interpret=interpret,
        )(sp.astype(jnp.int32), lut_t, px)
        if skip_hist:
            return res.reshape(c, -1)[:, :n].reshape(c, h, w)
        stretched_p, hist_t = res
    elif skip_hist:
        raise ValueError("skip_hist requires sp (the mixed kernel)")
    else:
        stretched_p, hist_t = pl.pallas_call(
            functools.partial(_lut_hist_kernel, dt, out_dt),
            out_shape=out_shapes,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 16, 128), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + data_specs,
            out_specs=out_specs,
            interpret=interpret,
        )(lut_t, px)

    hist_raw = hist_t[:, :, :16].reshape(c, 256)
    if pad:
        hist_raw = hist_raw.at[:, 0].add(-pad)
    # raw-DN -> stretched-value histogram: exact int32 scatter-add over
    # 256 bins (a f32 einsum here would round totals past 2^24)
    hist = jax.vmap(lambda hr, l: jnp.zeros(256, jnp.int32)
                    .at[l.astype(jnp.int32)].add(hr))(hist_raw, lut_u8)
    stretched = stretched_p.reshape(c, -1)[:, :n].reshape(c, h, w)
    return stretched, hist


# --------------------------------------------- fused forest inference

def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _forest_kernel(n_inner: int, bn: int, n_classes: int, sel_ref, thr_ref,
                   path_ref, plen_ref, dist_ref, inv_ref, x_ref, out_ref):
    """VMEM-resident GemmForest chain over one (F, n_inner*bn) strip.

    The XLA lowering of models.forest's three-matmul chain materializes
    the (M, N) comparison and (L, N) vote tensors in HBM (~15 GB at the
    8-scene bench shape) because XLA cannot fuse across two matmuls;
    measured 45 ms against ~6 ms of useful MXU work. Here the whole chain
    lives in VMEM: only x is read and the argmax row written. The inner
    fori_loop processes n_inner sub-blocks of bn pixels per grid step —
    one grid step per sub-block was measured at ~30 us of fixed pipeline
    overhead each, 5x the compute.

    Exactness: the selector dot is a single bf16 pass over a 3-term
    bf16-exact split of x stacked along K (one-hot selector tripled) —
    bit-equal to f32 selection, verified on hardware; the path dot runs
    on the int8 MXU path with int32 accumulation (operands in {-1,0,+1},
    exact); the leaf-dist reduction is an exact f32 VPU sum."""
    def body(j, _):
        x = x_ref[:, pl.ds(j * bn, bn)]                    # (F, BN)
        # exact selection in ONE single-pass bf16 dot: split x into three
        # bf16-exact terms (8+8+8 mantissa bits covers f32's 24) stacked
        # along K against a tripled one-hot selector — every product is
        # exact and the f32 MXU accumulation reconstructs the selected
        # feature bit-for-bit, at 1/6 the passes of precision=HIGHEST
        x_hi = x.astype(jnp.bfloat16)
        r = x - x_hi.astype(jnp.float32)
        x_mid = r.astype(jnp.bfloat16)
        x_lo = (r - x_mid.astype(jnp.float32)).astype(jnp.bfloat16)
        x3 = jnp.concatenate([x_hi, x_mid, x_lo])          # (3F, BN)
        acc = jnp.dot(sel_ref[:], x3,
                      preferred_element_type=jnp.float32)  # (M_pad, BN)
        # votes on the int8 MXU path (2x bf16 throughput): operands are
        # {-1,0,+1}, accumulation int32 — exact by construction
        s = jnp.where(acc <= thr_ref[:], 1, -1).astype(jnp.int8)
        votes = jnp.dot(path_ref[:], s,
                        preferred_element_type=jnp.int32)  # (L_pad, BN)
        fired = (votes == plen_ref[:]).astype(jnp.float32)
        # leaf-dist contraction on the VPU: C is tiny, so the MXU form
        # wastes >90% of its 128x128 output tile AND needs a 6-pass f32
        # decomposition. dist rides as (L_pad, 8) so the per-class column
        # broadcasts against fired with no transpose. Products are exact
        # (dist f32 x fired in {0,1}); pad leaves have fired == 0
        total = jnp.concatenate(
            [jnp.sum(dist_ref[:, c:c + 1] * fired, axis=0, keepdims=True)
             for c in range(n_classes)], axis=0)            # (C, BN)
        total = total * inv_ref[0, 0]
        # first-index argmax: Mosaic's jnp.argmax breaks ties by LAST
        # index (measured: 1035/360k scene pixels flipped vs XLA/numpy/
        # sklearn, exactly the top-2 tie population), so take min row
        # among the maxima
        mx = jnp.max(total, axis=0, keepdims=True)
        row = jax.lax.broadcasted_iota(jnp.int32, total.shape, 0)
        out_ref[:, pl.ds(j * bn, bn)] = jnp.min(
            jnp.where(total == mx, row, total.shape[0]),
            axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, n_inner, body, 0)


def _forest_grouped_kernel(n_inner: int, bn: int, n_classes: int,
                           n_groups: int, sel_ref, thr_ref, path_ref,
                           plen_ref, dist_ref, inv_ref, x_ref, out_ref):
    """Tree-grouped block-diagonal variant of :func:`_forest_kernel`.

    The dense path matmul runs every leaf against every internal node,
    but the path matrix is block-diagonal by tree — measured ~1% useful
    occupancy on the bundled 100-tree model. Weights arrive stacked per
    tree GROUP (forest_tree_plan): the G small (Lg_pad, Mg_pad) matmuls
    do ~1/G the MACs and VMEM of the dense (L_pad, M_pad) one, and the
    per-class totals accumulate across groups (exact: leaf-dist sums
    stay integer-valued f32 for pure-leaf forests, and the comparison /
    vote arithmetic is unchanged per group)."""
    def body(j, _):
        x = x_ref[:, pl.ds(j * bn, bn)]                    # (F, BN)
        x_hi = x.astype(jnp.bfloat16)
        r = x - x_hi.astype(jnp.float32)
        x_mid = r.astype(jnp.bfloat16)
        x_lo = (r - x_mid.astype(jnp.float32)).astype(jnp.bfloat16)
        x3 = jnp.concatenate([x_hi, x_mid, x_lo])          # (3F, BN)
        total = None
        for g in range(n_groups):
            acc = jnp.dot(sel_ref[g], x3,
                          preferred_element_type=jnp.float32)
            s = jnp.where(acc <= thr_ref[g], 1, -1).astype(jnp.int8)
            votes = jnp.dot(path_ref[g], s,
                            preferred_element_type=jnp.int32)
            fired = (votes == plen_ref[g]).astype(jnp.float32)
            part = jnp.concatenate(
                [jnp.sum(dist_ref[g, :, c:c + 1] * fired, axis=0,
                         keepdims=True)
                 for c in range(n_classes)], axis=0)        # (C, BN)
            total = part if total is None else total + part
        total = total * inv_ref[0, 0]
        mx = jnp.max(total, axis=0, keepdims=True)
        row = jax.lax.broadcasted_iota(jnp.int32, total.shape, 0)
        out_ref[:, pl.ds(j * bn, bn)] = jnp.min(
            jnp.where(total == mx, row, total.shape[0]),
            axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, n_inner, body, 0)


_FOREST_VMEM_BUDGET = 10 << 20   # leave headroom under the ~16 MB/core
_FOREST_INNER = 16       # sub-blocks per grid step (amortizes step overhead)


def _plan_pads(plan) -> tuple:
    """(G, Mg_pad, Lg_pad) for a forest_tree_plan tuple."""
    mg = _round_up(max(p[1] for p in plan), _LANE)
    lg = _round_up(max(p[3] for p in plan), _LANE)
    return len(plan), mg, lg


def forest_block_n(n_internal: int, n_leaves: int, plan=None) -> int:
    """Largest pixel sub-block size (multiple of 128, <= 1024) whose VMEM
    working set fits the budget; 0 if even 128 does not fit (caller
    falls back to the XLA route). Working set per sub-block column:
    acc f32 + s bf16 over M_pad, votes+fired f32 over L_pad, plus the
    double-buffered (F, bn*inner) input strip. With a tree-group plan
    the weights stack per group but the per-column working set shrinks
    to the padded GROUP sizes."""
    if plan is not None:
        g, m_pad, l_pad = _plan_pads(plan)
        fixed = g * (m_pad * l_pad + m_pad * (2 * 24 * 3 + 4)
                     + l_pad * (4 + 32)) + 4096
    else:
        m_pad = _round_up(max(n_internal, 1), _LANE)
        l_pad = _round_up(max(n_leaves, 1), _LANE)
        fixed = m_pad * l_pad * 2 + m_pad * 4 * 32          # weights + slack
    for bn in (1024, 512, 256, 128):
        work = bn * (m_pad * 6 + l_pad * 8 + 64 * 4)
        strip = 2 * bn * _FOREST_INNER * 24 * 4             # x in/out buffers
        if fixed + work + strip <= _FOREST_VMEM_BUDGET:
            return bn
    return 0


@functools.partial(jax.jit, static_argnames=("block_n", "interpret", "plan"))
def forest_labels_pallas(gf, x_cm: jnp.ndarray, block_n: int = 1024,
                         interpret: bool = False,
                         plan=None) -> jnp.ndarray:
    """GemmForest predict over channel-major features: (F, N) f32 ->
    (N,) class labels, fused in one Pallas pass (no HBM intermediates).

    Same decision chain as ``pipeline.turbo.gemm_labels_cm`` (reference
    predict semantics: sklearn majority vote with lowest-class tie-break,
    modules/features/extract.py:690-719); bit-equality with the XLA route
    is asserted in tests on random forests and feature blocks.

    ``plan`` (static; from ``models.forest.forest_tree_plan``) switches
    the dense votes matmul to the tree-grouped block-diagonal kernel —
    identical labels, ~1/len(plan) the MACs on the dominant matmul."""
    f, n = x_cm.shape
    m = gf.selector.shape[1]
    l, c = gf.leaf_dist.shape
    bn = block_n
    strip = bn * _FOREST_INNER
    n_pad = (-n) % strip
    xp = jnp.pad(x_cm, ((0, 0), (0, n_pad)))
    grid = (xp.shape[1] // strip,)
    inv = jnp.reshape(gf.inv_trees.astype(jnp.float32), (1, 1))
    sel_t = gf.selector.astype(jnp.bfloat16).T              # (M, F)
    thr_c = gf.thresholds.astype(jnp.float32)[:, None]      # (M, 1)
    path_t = gf.path.T.astype(jnp.int8)                     # (L, M)
    plen_c = gf.path_len.astype(jnp.int32)[:, None]         # (L, 1)
    dist_f = gf.leaf_dist.astype(jnp.float32)               # (L, C)

    if plan is not None:
        g_n, mg_pad, lg_pad = _plan_pads(plan)

        def grp(t, r0, rl, c0, cl, rp, cp, cv=0):
            return jnp.pad(t[r0:r0 + rl, c0:c0 + cl],
                           ((0, rp - rl), (0, cp - cl)),
                           constant_values=cv)

        sel_g = jnp.stack([
            jnp.concatenate([grp(sel_t, mo, mc, 0, f, mg_pad, f)] * 3,
                            axis=1)
            for mo, mc, _, _ in plan])                       # (G, Mg, 3F)
        thr_g = jnp.stack([grp(thr_c, mo, mc, 0, 1, mg_pad, 1)
                           for mo, mc, _, _ in plan])
        path_g = jnp.stack([grp(path_t, lo, lc, mo, mc, lg_pad, mg_pad)
                            for mo, mc, lo, lc in plan])
        plen_g = jnp.stack([grp(plen_c, lo, lc, 0, 1, lg_pad, 1, cv=-1)
                            for _, _, lo, lc in plan])
        dist_g = jnp.stack([grp(dist_f, lo, lc, 0, c, lg_pad, 8)
                            for _, _, lo, lc in plan])
        idx = pl.pallas_call(
            functools.partial(_forest_grouped_kernel, _FOREST_INNER, bn,
                              c, g_n),
            out_shape=jax.ShapeDtypeStruct((1, xp.shape[1]), jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((g_n, mg_pad, 3 * f), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g_n, mg_pad, 1), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g_n, lg_pad, mg_pad), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g_n, lg_pad, 1), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g_n, lg_pad, 8), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((f, strip), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, strip), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=2 * xp.shape[1] * g_n * (mg_pad * f
                                               + lg_pad * mg_pad
                                               + 8 * lg_pad),
                bytes_accessed=xp.size * 4 + xp.shape[1] * 4,
                transcendentals=0),
            interpret=interpret,
        )(sel_g, thr_g, path_g, plen_g, dist_g, inv, xp)
    else:
        m_pad = _round_up(m, _LANE)
        l_pad = _round_up(l, _LANE)
        sel1 = jnp.pad(sel_t, ((0, m_pad - m), (0, 0)))     # (M_pad, F)
        sel_p = jnp.concatenate([sel1, sel1, sel1], axis=1)  # (M_pad, 3F)
        thr_p = jnp.pad(thr_c, ((0, m_pad - m), (0, 0)))    # (M_pad, 1)
        path_p = jnp.pad(path_t,
                         ((0, l_pad - l), (0, m_pad - m)))  # (L_pad, M_pad)
        # pad leaves get path_len -1: their zero vote rows never "fire"
        plen_p = jnp.pad(plen_c, ((0, l_pad - l), (0, 0)),
                         constant_values=-1)
        # (L_pad, 8): pad leaves never fire, pad class cols are never read
        dist_p = jnp.pad(dist_f, ((0, l_pad - l), (0, 8 - c)))
        idx = pl.pallas_call(
            functools.partial(_forest_kernel, _FOREST_INNER, bn, c),
            out_shape=jax.ShapeDtypeStruct((1, xp.shape[1]), jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((m_pad, 3 * f), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m_pad, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((l_pad, m_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((l_pad, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((l_pad, 8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((f, strip), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, strip), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=2 * xp.shape[1] * (m_pad * f + l_pad * m_pad
                                         + 8 * l_pad),
                bytes_accessed=xp.size * 4 + xp.shape[1] * 4,
                transcendentals=0),
            interpret=interpret,
        )(sel_p, thr_p, path_p, plen_p, dist_p, inv, xp)

    # classes lookup without a gather: C <= 8 equality-select
    cls = gf.classes.astype(jnp.int32)
    out = jnp.zeros((idx.shape[1],), jnp.int32)
    for k in range(c):
        out = jnp.where(idx[0] == k, cls[k], out)
    return out[:n]


# --------------------------------------------- connected components
#
# Block-strip min-label propagation. The XLA path in ops.components pays
# ~3.7 ms per while-loop round over the whole image (4 associative
# scans + a 360k-element pointer-jump gather) and needs 10-21 rounds on
# the bundled masks. Here each (128, W) strip iterates to LOCAL
# convergence entirely in VMEM (a round of shifted mins + doubling
# segmented scans costs microseconds at VMEM bandwidth), and only
# cross-strip propagation pays HBM passes: labels flow between strips
# through one-row halos re-read each outer pass. Min-label propagation
# is monotone (labels only ever decrease, lower-bounded by the component
# minimum), so ANY schedule — block-local, stale halos, any interleaving
# — converges to the same fixed point as the global iteration; the
# result is bit-identical to ops.components.connected_components.

_CC_BH = 256  # max strip rows: sublane-aligned, (bh, W) i32 strips in VMEM


def _cc_strip_rows(wp: int, cache_masks: bool = True) -> int:
    """Strip height that keeps the kernel inside scoped VMEM: ~8.5 live
    i32 buffers of (bh, wp) plus, when ``cache_masks``, ~36 cached int8
    scan masks (70 vs ~34 bytes/px total), halved until <=14 MB; the
    floor of 8 rows covers masks up to ~25k px wide. 256 beats 128 on
    multi-strip images (fewer outer passes: 30.1 -> 25.0 ms on the
    24-mask tall stack) and is neutral on single 600-px masks.

    ``cache_masks=False`` recomputes the scan blocked-masks on the fly
    (2x the scan ops) but the freed VMEM doubles the strip height —
    round-5 tracing showed per-pass cost is dominated by per-grid-step
    fixed overhead (~59 us/strip at 57 strips), not scan arithmetic, so
    fewer/taller strips win on tall multi-mask stacks."""
    bh = _CC_BH if cache_masks else 2 * _CC_BH
    bytes_px = 70 if cache_masks else 34
    while bh > 8 and bh * wp * bytes_px > 14e6:
        bh //= 2
    return bh


def _cc_shift(x, d: int, axis: int, rev: bool, fill):
    """Shift ``x`` by ``d`` along ``axis`` (toward lower index when
    ``rev``), filling vacated positions with ``fill``."""
    pad_shape = (x.shape[:1] + (d,)) if axis == 1 else ((d,) + x.shape[1:])
    pad = jnp.full(pad_shape, fill, x.dtype)
    if axis == 1:
        return (jnp.concatenate([x[:, d:], pad], axis=1) if rev
                else jnp.concatenate([pad, x[:, :-d]], axis=1))
    return (jnp.concatenate([x[d:], pad], axis=0) if rev
            else jnp.concatenate([pad, x[:-d]], axis=0))


def _cc_reach_masks(fg, axis: int, limit: int, rev: bool):
    """Per-doubling-distance 'blocked' masks for one scan direction:
    fwd blk_k[p] = 1 iff a run break (background) lies in (p - 2^k, p];
    bwd blk_k[p] = 1 iff one lies in [p, p + 2^k). Either includes the
    position itself, so background sentinels never update. These depend
    only on fg, which never changes, so each strip activation computes
    them ONCE and every inner round reuses them (the doubling step
    shrinks from 6 vector ops to ~3). int8 — Mosaic packs 4x more lanes
    per vreg than i32."""
    blk = jnp.logical_not(fg).astype(jnp.int8)
    out = []
    d = 1
    while d < limit:
        out.append(blk)
        # bitwise OR: Mosaic has no maxsi for i8 vectors
        blk = blk | _cc_shift(blk, d, axis, rev, 0)
        d *= 2
    return out


def _vmin(a, b):
    """Elementwise min that Mosaic can legalize at int16: there is no
    arith.minsi for sub-32-bit vectors, but compare+select lowers fine
    (i32 keeps the native minsi)."""
    if a.dtype == jnp.int16:
        return jnp.where(a < b, a, b)
    return jnp.minimum(a, b)


def _cc_seg_min(v, fg, axis: int, limit: int, masks_fwd, masks_bwd):
    """Forward+backward segmented min along ``axis`` via doubling with
    precomputed blocked-masks: values cross a whole contiguous fg run in
    log2(limit) steps. Dtype-generic: int16 labels pack 2x the lanes per
    vreg, halving the scan cost (used by the min-area batch path, whose
    mask-relative ids are < 2^15 by construction)."""
    big = jnp.asarray(jnp.iinfo(v.dtype).max, v.dtype)

    def scan(v0, rev, masks):
        v_ = v0
        d = 1
        k = 0
        while d < limit:
            v_sh = _cc_shift(v_, d, axis, rev, big)
            v_ = jnp.where(masks[k] != 0, v_, _vmin(v_, v_sh))
            d *= 2
            k += 1
        return v_

    return jnp.where(fg, _vmin(scan(v, False, masks_fwd),
                               scan(v, True, masks_bwd)), big)


def _cc_seg_min_nocache(v, fg, axis: int, limit: int):
    """:func:`_cc_seg_min` with the blocked-masks computed inline (the
    classic fused segmented doubling scan): ~2x the vector ops per step,
    but no (log2(limit) x strip) int8 mask storage — the freed VMEM lets
    the caller double the strip height, which round-5 tracing showed is
    the dominant cost axis (per-grid-step overhead, not scan math)."""
    big = jnp.asarray(jnp.iinfo(v.dtype).max, v.dtype)

    def scan(v0, rev):
        v_ = v0
        blk = jnp.logical_not(fg).astype(jnp.int8)
        d = 1
        while d < limit:
            v_sh = _cc_shift(v_, d, axis, rev, big)
            v_ = jnp.where(blk != 0, v_, _vmin(v_, v_sh))
            d *= 2
            if d < limit:
                blk = blk | _cc_shift(blk, d // 2, axis, rev, 0)
        return v_

    return jnp.where(fg, _vmin(scan(v, False), scan(v, True)), big)


def _cc_shift_r(x, fill):
    return jnp.concatenate(
        [jnp.full(x.shape[:-1] + (1,), fill, x.dtype), x[..., :-1]],
        axis=-1)


def _cc_shift_l(x, fill):
    return jnp.concatenate(
        [x[..., 1:], jnp.full(x.shape[:-1] + (1,), fill, x.dtype)],
        axis=-1)


def _cc_strip_converge(n_inner: int, conn: int, cache_masks: bool,
                       fg, lab0, top, bot):
    """Inner convergence of ONE strip given frozen (1, WP) halo rows
    (big where absent). ``lab0`` already big at background. Returns
    (labels, changing-at-inner-exit). Shared by the halo-exchange kernel
    and the fused sweep kernel."""
    ldt = lab0.dtype
    big = jnp.asarray(jnp.iinfo(ldt).max, ldt)
    bh, wp = lab0.shape

    # halos are FROZEN during the inner loop, so their full
    # contribution (vertical + diagonal for 8-conn) is injected into
    # the boundary rows ONCE; min-propagation carries it from there
    if conn == 8:
        top_c = _vmin(top, _vmin(_cc_shift_r(top, big),
                                 _cc_shift_l(top, big)))
        bot_c = _vmin(bot, _vmin(_cc_shift_r(bot, big),
                                 _cc_shift_l(bot, big)))
    else:
        top_c, bot_c = top, bot
    lab0 = jnp.where(
        fg,
        jnp.concatenate([_vmin(lab0[:1], top_c), lab0[1:-1],
                         _vmin(lab0[-1:], bot_c)], axis=0),
        big)

    # scan blocked-masks depend only on fg: build once per activation
    # (cache_masks=False trades 2x scan ops for 2x-taller strips —
    # the per-grid-step overhead dominates on tall stacks)
    if cache_masks:
        rows_f = _cc_reach_masks(fg, 1, wp, False)
        rows_b = _cc_reach_masks(fg, 1, wp, True)
        cols_f = _cc_reach_masks(fg, 0, bh, False)
        cols_b = _cc_reach_masks(fg, 0, bh, True)

    def one_round(lab):
        # within-strip vertical/horizontal adjacency is subsumed by
        # the segmented scans (fg runs); only the four diagonals
        # need explicit mins for 8-conn
        if conn == 8:
            up = jnp.concatenate(
                [jnp.full((1, wp), big, ldt), lab[:-1]], axis=0)
            dn = jnp.concatenate(
                [lab[1:], jnp.full((1, wp), big, ldt)], axis=0)
            diag = _vmin(_vmin(_cc_shift_r(up, big),
                               _cc_shift_l(up, big)),
                         _vmin(_cc_shift_r(dn, big),
                               _cc_shift_l(dn, big)))
            nm = jnp.where(fg, _vmin(lab, diag), big)
        else:
            nm = lab
        if cache_masks:
            nm = _cc_seg_min(nm, fg, 1, wp, rows_f, rows_b)
            return _cc_seg_min(nm, fg, 0, bh, cols_f, cols_b)
        nm = _cc_seg_min_nocache(nm, fg, 1, wp)
        return _cc_seg_min_nocache(nm, fg, 0, bh)

    def body(state):
        lab, _, it = state
        new = one_round(lab)
        return new, jnp.any(new != lab), it + 1

    lab, changing, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < n_inner), body,
        (lab0, jnp.asarray(True), 0))
    return lab, changing


def _cc_strip_kernel(n_inner: int, conn: int, cache_masks: bool, act_ref,
                     top_ref, bot_ref, fg_ref, lab_ref, out_ref, chg_ref):
    ldt = lab_ref.dtype
    big = jnp.asarray(jnp.iinfo(ldt).max, ldt)
    # halo/activity arrays ride whole ((n_strips, WP) is KB-scale; a
    # (1, WP) block would violate the TPU block-shape rules) — pick this
    # strip's row
    i = pl.program_id(0)
    chg_ref[i, 0] = 0

    @pl.when(act_ref[i, 0] == 0)
    def _skip():
        # inactive strip: labels AND consumed halos unchanged since it
        # last locally converged — rerunning would be an exact no-op
        out_ref[...] = lab_ref[...]

    @pl.when(act_ref[i, 0] != 0)
    def _run():
        fg = fg_ref[...] != 0                              # (BH, WP)
        lab0 = jnp.where(fg, lab_ref[...], big)
        # halo arrays ride as int32 regardless of the label dtype: Mosaic
        # rejects dynamically-indexed (1, WP) sub-lane i16 loads, and the
        # values fit either way (big == iinfo(ldt).max round-trips)
        top = top_ref[pl.ds(i, 1), :].astype(ldt)          # (1, WP)
        bot = bot_ref[pl.ds(i, 1), :].astype(ldt)
        lab, changing = _cc_strip_converge(n_inner, conn, cache_masks,
                                           fg, lab0, top, bot)
        out_ref[...] = lab
        # chg = "still changing at inner exit" (hit the n_inner bound):
        # such a strip must rerun even with identical halos
        chg_ref[i, 0] = changing.astype(jnp.int32)


def _cc_sweep_kernel(n_inner: int, conn: int, cache_masks: bool,
                     n_strips: int, down: bool, pchg_ref, fg_ref,
                     lab_ref, out_ref, chg_ref, carry_ref):
    """Fused sequential sweep: grid steps execute IN ORDER on the TPU
    core, so the converged boundary row rides a VMEM scratch from one
    strip to the next — the whole down (or up) sweep is ONE pallas_call
    instead of n_strips separate dispatches (the lax.scan form paid
    ~n_strips kernel launches + block reloads per sweep).

    ``down``: grid step i processes strip i top-down, the carry is the
    previous strip's UPDATED bottom row entering as this strip's top
    halo; the up sweep reverses both (index_map n_strips-1-i, carry =
    top row entering as bottom halo). ``pchg_ref``: per-strip
    still-changing flags from the previous sweep — an up-sweep strip is
    skipped as an exact no-op iff the carried boundary offers no
    strictly smaller candidate than its adjacent row AND it converged
    within the previous sweep's inner bound."""
    ldt = lab_ref.dtype
    big = jnp.asarray(jnp.iinfo(ldt).max, ldt)
    big32 = jnp.int32(jnp.iinfo(jnp.int32).max)
    i = pl.program_id(0)
    strip = i if down else n_strips - 1 - i

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = jnp.full(carry_ref.shape, big32, jnp.int32)

    fg = fg_ref[...] != 0
    lab0 = jnp.where(fg, lab_ref[...], big)
    carry = carry_ref[...]                              # (1, WP) int32

    def _run():
        top = carry.astype(ldt) if down else jnp.full(carry.shape, big, ldt)
        bot = jnp.full(carry.shape, big, ldt) if down else carry.astype(ldt)
        lab, changing = _cc_strip_converge(n_inner, conn, cache_masks,
                                           fg, lab0, top, bot)
        out_ref[...] = lab
        chg_ref[strip, 0] = changing.astype(jnp.int32)
        carry_ref[...] = (lab[-1:] if down else lab[:1]).astype(jnp.int32)

    if down:
        _run()          # first pass over fresh seeds: every strip runs
    else:
        # diagonal-inclusive carried candidate vs the adjacent edge row
        cand = (_vmin(carry, _vmin(_cc_shift_r(carry, big32),
                                   _cc_shift_l(carry, big32)))
                if conn == 8 else carry)
        edge = lab0[-1:].astype(jnp.int32)
        act = (jnp.any((edge != big32) & (cand < edge))
               | (pchg_ref[strip, 0] != 0))

        @pl.when(jnp.logical_not(act))
        def _skip():
            out_ref[...] = lab_ref[...]
            # a skipped strip keeps its previous still-changing flag and
            # passes its (unchanged) edge row along the carry
            chg_ref[strip, 0] = pchg_ref[strip, 0]
            carry_ref[...] = lab0[:1].astype(jnp.int32)

        pl.when(act)(_run)


def _ccmin_run(fg: jnp.ndarray, lab: jnp.ndarray, w_orig: int,
               connectivity: int, max_outer: int, n_inner: int,
               jump: bool, interpret: bool,
               cache_masks: bool = True, sweep: bool = False) -> jnp.ndarray:
    """Shared driver: min-propagate ``lab`` over fg-connected regions.

    ``fg``/``lab``: padded (hp, wp) with hp a multiple of the strip
    height and lab == int32 max at background. ``jump=True`` enables the
    halo pointer-jump (valid ONLY when the propagated values are linear
    indices in an original (h, w_orig) coordinate system).

    Activity gating (round 4): a strip reruns only while it is still
    changing at its inner-iteration bound OR a current halo row offers a
    STRICTLY SMALLER label than the strip's adjacent boundary pixel
    (including diagonal offsets for 8-conn). Skipping is exact: halo
    values are the only entry points of outside information, labels only
    ever decrease, and a halo candidate >= the boundary label cannot
    change anything — so "no strip still changing and no boundary
    improvement available" IS the global fixed point. The criterion is
    memoryless (a function of the current labels only), so no
    consumed-halo bookkeeping is needed."""
    ldt = lab.dtype
    assert not jump or ldt == jnp.int32  # pointer-jump needs linear indices
    big = jnp.asarray(jnp.iinfo(ldt).max, ldt)
    hp, wp = lab.shape
    bh = _cc_strip_rows(wp, cache_masks)
    n_strips = hp // bh
    fg_u8 = fg.astype(jnp.uint8)

    grid = (n_strips,)
    call = pl.pallas_call(
        functools.partial(_cc_strip_kernel, n_inner, connectivity,
                          cache_masks),
        out_shape=(jax.ShapeDtypeStruct((hp, wp), ldt),
                   jax.ShapeDtypeStruct((n_strips, 1), jnp.int32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_strips, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),     # active flags
            pl.BlockSpec((n_strips, wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),     # all top halo rows
            pl.BlockSpec((n_strips, wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),     # all bottom halos
            pl.BlockSpec((bh, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),     # fg
            pl.BlockSpec((bh, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),     # labels
        ],
        out_specs=(
            pl.BlockSpec((bh, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_strips, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )

    def halos(lab):
        # rows i*bh - 1 and (i+1)*bh of each strip, big beyond the image
        ext = jnp.concatenate([jnp.full((1, wp), big, ldt), lab,
                               jnp.full((1, wp), big, ldt)], axis=0)
        top = ext[0:-2:bh][:n_strips]                  # row i*bh - 1
        bot = ext[bh + 1::bh][:n_strips]               # row (i+1)*bh
        return top, bot

    def jump_rows(rows, lab):
        # pointer-jump the halo rows one hop through the full label
        # image (labels are linear indices in ORIGINAL (h, w_orig)
        # coordinates; map back to array positions to index). Only
        # 2*n_strips rows gather, not the image.
        ok = rows != big
        r = jnp.where(ok, rows // w_orig, 0)
        c = jnp.where(ok, rows % w_orig, 0)
        return jnp.where(ok, jnp.minimum(rows, lab[r, c]), big)

    def shift_r1(x):
        return jnp.concatenate(
            [jnp.full((n_strips, 1), big, ldt), x[:, :-1]], axis=1)

    def shift_l1(x):
        return jnp.concatenate(
            [x[:, 1:], jnp.full((n_strips, 1), big, ldt)], axis=1)

    def next_active(new, still):
        # strip i must rerun iff it hit its inner bound while changing,
        # or a halo candidate (with diagonal offsets for 8-conn) is
        # strictly smaller than the adjacent boundary label
        lab3 = new.reshape(n_strips, bh, wp)
        first, last = lab3[:, 0], lab3[:, -1]
        top_n, bot_n = halos(new)
        if connectivity == 8:
            top_n = jnp.minimum(top_n, jnp.minimum(shift_r1(top_n),
                                                   shift_l1(top_n)))
            bot_n = jnp.minimum(bot_n, jnp.minimum(shift_r1(bot_n),
                                                   shift_l1(bot_n)))
        trig = (jnp.any((first != big) & (top_n < first), axis=1)
                | jnp.any((last != big) & (bot_n < last), axis=1))
        return ((still[:, 0] != 0) | trig).astype(jnp.int32)

    def body(state):
        lab, act, it = state
        top_raw, bot_raw = halos(lab)
        if jump:
            top_f = jump_rows(top_raw, lab)
            bot_f = jump_rows(bot_raw, lab)
        else:
            top_f, bot_f = top_raw, bot_raw
        new, still = call(act[:, None], top_f.astype(jnp.int32),
                          bot_f.astype(jnp.int32), fg_u8, lab)
        return new, next_active(new, still), it + 1

    if sweep and n_strips > 1:
        # SEQUENTIAL down then up sweep: strip i consumes strip i-1's
        # UPDATED labels within ONE pass, so information crosses the
        # whole image in two sweeps instead of one strip boundary per
        # halo-exchange pass. Round-5 convergence profiling showed the
        # gated passes 2-4 still re-converge most strips (9.2 + 7.4 +
        # 4.9 + 2.1 + 0.5 ms on the 24-mask stack); the sweeps do that
        # work once. Monotone min-propagation converges to the same
        # fixed point under ANY schedule; the gated loop below then
        # starts from the sweep-derived activity (usually all-inactive)
        # instead of all-active, so a converged sweep pays ZERO extra
        # kernel passes. Each sweep is ONE pallas_call — TPU grid steps
        # execute in order on the core, so the boundary row rides a
        # (1, WP) VMEM scratch between strips. (Measured perf-neutral
        # vs the earlier lax.scan-of-single-strip-calls form on the
        # 24-mask stack — per-strip cost is the inner scan rounds, not
        # dispatch — but the HLO is 2 calls instead of 2 x n_strips,
        # and compile/launch cost scales with that.)
        def sweep_call(down: bool):
            if down:
                idx = lambda i: (i, 0)
            else:
                idx = lambda i: (n_strips - 1 - i, 0)
            return pl.pallas_call(
                functools.partial(_cc_sweep_kernel, n_inner, connectivity,
                                  cache_masks, n_strips, down),
                out_shape=(jax.ShapeDtypeStruct((hp, wp), ldt),
                           jax.ShapeDtypeStruct((n_strips, 1), jnp.int32)),
                grid=(n_strips,),
                in_specs=[
                    pl.BlockSpec((n_strips, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),   # prev chg
                    pl.BlockSpec((bh, wp), idx,
                                 memory_space=pltpu.VMEM),   # fg
                    pl.BlockSpec((bh, wp), idx,
                                 memory_space=pltpu.VMEM),   # labels
                ],
                out_specs=(
                    pl.BlockSpec((bh, wp), idx,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((n_strips, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                ),
                scratch_shapes=[pltpu.VMEM((1, wp), jnp.int32)],
                interpret=interpret,
            )

        zeros = jnp.zeros((n_strips, 1), jnp.int32)
        lab, chgs_d = sweep_call(True)(zeros, fg_u8, lab)
        lab, chgs = sweep_call(False)(chgs_d, fg_u8, lab)
        act0 = next_active(lab, chgs)
    else:
        act0 = jnp.ones((n_strips,), jnp.int32)        # all active first

    state = (lab, act0, 0)
    lab, _, _ = jax.lax.while_loop(
        lambda s: jnp.any(s[1] != 0) & (s[2] < max_outer), body, state)
    return lab


@functools.partial(jax.jit, static_argnames=("connectivity", "max_outer",
                                             "n_inner", "interpret"))
def cc_pallas(mask: jnp.ndarray, connectivity: int = 8,
              max_outer: int = 128, n_inner: int = 16,
              interpret: bool = False) -> jnp.ndarray:
    """Connected-component labels of a binary mask, bit-identical to
    ops.components.connected_components (background -1, each component
    labelled with the minimum linear index of its pixels).

    One outer pass = every ACTIVE (128, W) strip iterated to local
    convergence in VMEM with frozen one-row halos; outer passes repeat
    until no strip is active (see _ccmin_run's gating note), so labels
    cross strip boundaries one halo exchange per pass. Before each pass
    the HALO ROWS (only — 2*n_strips rows, not the image) are
    pointer-jumped one hop, which teleports already-converged chains
    across distant strips; a whole-image jump was measured at ~95 % of
    the kernel's runtime on the bundled rule masks (a 360k-element 2-D
    gather per pass: veg 22.0 -> 1.6 ms, built 17.9 -> 1.9 ms with the
    halo-only jump, labels identical — min-propagation is monotone, so
    jumping fewer elements only changes the schedule, never the fixed
    point)."""
    h, w = mask.shape
    fg_hw = mask != 0
    big = jnp.asarray(jnp.iinfo(jnp.int32).max, jnp.int32)
    bh = _cc_strip_rows(w + (-w) % _LANE)
    hp = h + (-h) % bh
    wp = w + (-w) % _LANE
    fg = jnp.pad(fg_hw, ((0, hp - h), (0, wp - w)))
    row = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
    lab = jnp.where(fg, row * w + col, big)
    lab = _ccmin_run(fg, lab, w, connectivity, max_outer, n_inner,
                     jump=True, interpret=interpret)
    return jnp.where(fg_hw, lab[:h, :w], -1)


def _coarse_seed(fg: jnp.ndarray, v: jnp.ndarray, connectivity: int,
                 factor: int, max_outer: int, n_inner: int,
                 interpret: bool) -> jnp.ndarray:
    """Refine ``v`` (big at bg) by a min-propagation over the SOLID-CELL
    coarse graph: cell = factor x factor block, solid iff every pixel is
    foreground; coarse value = min over the cell. Solid-cell adjacency
    under-approximates fine connectivity (two edge-adjacent solid cells
    share a factor-long fine border; diagonal solid cells touch at
    corner pixels, which are 8-adjacent), so every value a cell receives
    is the min over a fine-connected set containing it — >= the fine
    component minimum, <= the original seed. Min-propagation is monotone,
    so seeding fine pixels of solid cells with the coarse result leaves
    the fixed point unchanged while starting the fine pass ~factor x
    closer to convergence (VERDICT r4 #2: long chains crossed at 1/16th
    the per-round cost). Returns the improved fine seed."""
    ldt = v.dtype
    big = jnp.asarray(jnp.iinfo(ldt).max, ldt)
    hp, wp = v.shape                      # multiples of factor by callers
    f = factor
    solid = jax.lax.reduce_window(fg, True, jax.lax.bitwise_and,
                                  (f, f), (f, f), "VALID")
    vc = jax.lax.reduce_window(v, big, jax.lax.min, (f, f), (f, f), "VALID")
    vc = jnp.where(solid, vc, big)
    hc, wc = vc.shape
    bh = _cc_strip_rows(wc + (-wc) % _LANE)
    hcp = hc + (-hc) % bh
    wcp = wc + (-wc) % _LANE
    solid_p = jnp.pad(solid, ((0, hcp - hc), (0, wcp - wc)))
    vc_p = jnp.where(solid_p,
                     jnp.pad(vc, ((0, hcp - hc), (0, wcp - wc)),
                             constant_values=big), big)
    vc_out = _ccmin_run(solid_p, vc_p, wc, connectivity, max_outer,
                        n_inner, jump=False,
                        interpret=interpret)[:hc, :wc]
    up = jnp.repeat(jnp.repeat(vc_out, f, axis=0), f, axis=1)
    take = jnp.repeat(jnp.repeat(solid, f, axis=0), f, axis=1) & fg
    return jnp.where(take, _vmin(v, up), v)


@functools.partial(jax.jit, static_argnames=("connectivity", "max_outer",
                                             "n_inner", "interpret",
                                             "dtype", "coarse",
                                             "cache_masks", "sweep"))
def ccmin_prop_pallas(mask: jnp.ndarray, values: jnp.ndarray,
                      connectivity: int = 8, max_outer: int = 128,
                      n_inner: int = 16,
                      interpret: bool = False,
                      dtype=jnp.int32, coarse: int = 0,
                      cache_masks: bool = True,
                      sweep: bool = False) -> jnp.ndarray:
    """Per-component minimum of ``values`` over the connected components
    of ``mask``: every foreground pixel gets min(values over its
    component); background -1. Same strip kernel as :func:`cc_pallas`
    (values need not be positions, so no halo pointer-jump — convergence
    follows the component geometry exactly like the label pass).

    ``dtype=jnp.int16`` would run the propagation on int16 vectors (2x
    lanes per vreg; values are clipped to the iinfo(dtype).max sentinel
    so out-of-range inputs come back as the sentinel, never aliased) —
    but TPU v5e Mosaic legalizes NEITHER arith.minsi NOR vector
    compares below 32 bits ("Target does not support this comparison"),
    so on this hardware only the default int32 actually compiles; the
    parameter is kept for future targets.

    Used by ops.components.remove_small_components_batch to spread each
    component's dense id (the root-flag cumsum evaluated at the root,
    which is the component minimum of that cumsum because the cumsum is
    nondecreasing over linear index and the root is the component's
    minimum linear index).

    ``coarse``: 0 disables; a factor f (e.g. 4) first min-propagates over
    the f x f SOLID-CELL coarse graph and seeds solid-cell pixels with
    the result (:func:`_coarse_seed` — exact: the fixed point is
    unchanged), so large blobby components converge in coarse rounds at
    1/f^2 the cost and the fine pass only cleans up boundaries.
    Measured neutral on the rule-batch stacks (the cost there is
    per-grid-step overhead, not convergence) — kept for pathological
    geometries.

    ``cache_masks=False`` recomputes scan blocked-masks inline, freeing
    enough VMEM to double the strip height (fewer grid steps AND fewer
    outer passes — see :func:`_cc_strip_rows`)."""
    h, w = mask.shape
    fg_hw = mask != 0
    big = jnp.asarray(jnp.iinfo(dtype).max, dtype)
    bh = _cc_strip_rows(w + (-w) % _LANE, cache_masks)
    hp = h + (-h) % bh
    wp = w + (-w) % _LANE
    fg = jnp.pad(fg_hw, ((0, hp - h), (0, wp - w)))
    v32 = jnp.minimum(values.astype(jnp.int32),
                      jnp.int32(jnp.iinfo(dtype).max))
    v = jnp.pad(v32.astype(dtype), ((0, hp - h), (0, wp - w)))
    v = jnp.where(fg, v, big)
    if coarse:
        # hp is a strip-height multiple and wp a lane multiple, both
        # divisible by any power-of-two factor <= 128; padding is bg
        v = _coarse_seed(fg, v, connectivity, coarse, max_outer, n_inner,
                         interpret)
    v = _ccmin_run(fg, v, w, connectivity, max_outer, n_inner,
                   jump=False, interpret=interpret,
                   cache_masks=cache_masks, sweep=sweep)
    return jnp.where(fg_hw, v[:h, :w].astype(jnp.int32), -1)


# -------------------------------------------------- dense-id histogram + LUT
#
# Scatter-free component-area machinery for min-area removal
# (ops.components.remove_small_components_batch). Per-pixel component
# ids in [0, bins) are histogrammed and looked up through a (hi, lo)
# two-level decomposition (id = hi * 128 + lo) where BOTH levels are
# exact one-hot contractions on the MXU — XLA's scatter-add measured
# 92 ms and its gather 63 ms for an 8-scene batch at 600^2; these two
# kernels replace both with ~4 ms of bf16 matmuls (0/1 indicators and
# counts < 2^24 are exact in bf16 operands with f32 accumulation).
# Ids >= bins (or the caller's background sentinel) fall outside every
# one-hot and silently contribute/read nothing.

_HIST_LO = 128  # low-level bins == one lane tile


def _hist_dense_kernel(n_chunks: int, bins_hi: int, ids_ref, counts_ref):
    dt = jnp.bfloat16
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (bins_hi, 1), 0)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (_HIST_LO, 1), 0)

    def body(j, acc):
        row = ids_ref[0, pl.ds(j, 1), :]                    # (1, K)
        # BOTH one-hots lane-major (pixels on lanes) and the dot in
        # A @ B^T form (contract lanes vs lanes): the earlier (K, 128)
        # lo one-hot needed a (1, K) -> (K, 1) row relayout per chunk
        # that cost ~3x the whole matmul — 4.75 -> 1.77 ms/batch on the
        # 24-mask rule stack at the 16k tier, bit-identical (round 5,
        # benchmarks/minarea_exp.py E2)
        oh_hi = (iota_hi == (row >> 7)).astype(dt)          # (bins_hi, K)
        oh_lo_t = (iota_lo == (row & 127)).astype(dt)       # (128, K)
        return acc + jax.lax.dot_general(
            oh_hi, oh_lo_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = jnp.zeros((bins_hi, _HIST_LO), jnp.float32)
    counts_ref[0] = jax.lax.fori_loop(0, n_chunks, body, acc)


def hist_dense_pallas(ids: jnp.ndarray, bins_hi: int = 256,
                      interpret: bool = False) -> jnp.ndarray:
    """(M, NC, K) int32 ids -> (M, bins_hi, 128) f32 exact counts of each
    id value in [0, bins_hi*128) per leading index. K must be a multiple
    of 128; out-of-range ids are not counted."""
    m, nc, k = ids.shape
    call = pl.pallas_call(
        functools.partial(_hist_dense_kernel, nc, bins_hi),
        out_shape=jax.ShapeDtypeStruct((m, bins_hi, _HIST_LO), jnp.float32),
        grid=(m,),
        in_specs=[pl.BlockSpec((1, nc, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, bins_hi, _HIST_LO), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    return call(ids)


def _keep_lut_kernel(n_chunks: int, bins_hi: int, ids_ref, kmt_ref, out_ref):
    dt = jnp.bfloat16
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (bins_hi, 1), 0)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (_HIST_LO, 1), 0)
    kmt = kmt_ref[0].astype(dt)                             # (128, bins_hi)

    def body(j, _):
        row = ids_ref[0, pl.ds(j, 1), :]                    # (1, K)
        oh_hi = (iota_hi == (row >> 7)).astype(dt)          # (bins_hi, K)
        # t1[l, p] = km[hi(p), l] — one matmul selects each pixel's
        # keep-column; the lo one-hot then selects the row, summing over
        # sublanes back to the (1, K) pixel row
        t1 = jax.lax.dot_general(kmt, oh_hi, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        oh_lo = (iota_lo == (row & 127)).astype(jnp.float32)  # (128, K)
        keep = jnp.sum(t1 * oh_lo, axis=0, keepdims=True)   # (1, K)
        # int32 store: Mosaic cannot store i8 rows at arbitrary sublane
        # offsets (int8 packs 4 sublanes per vreg row)
        out_ref[0, pl.ds(j, 1), :] = (keep > 0.5).astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def keep_lut_pallas(ids: jnp.ndarray, keepmat_t: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """(M, NC, K) int32 ids + (M, 128, bins_hi) 0/1 keep table
    (TRANSPOSED: [lo, hi]) -> (M, NC, K) int32 keep bits; ids outside
    [0, bins_hi*128) read 0."""
    m, nc, k = ids.shape
    bins_hi = keepmat_t.shape[2]
    call = pl.pallas_call(
        functools.partial(_keep_lut_kernel, nc, bins_hi),
        out_shape=jax.ShapeDtypeStruct((m, nc, k), jnp.int32),
        grid=(m,),
        in_specs=[
            pl.BlockSpec((1, nc, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _HIST_LO, bins_hi), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nc, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    return call(ids, keepmat_t.astype(jnp.float32))
