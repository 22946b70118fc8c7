"""Spatially-sharded scene classification — one SPMD program per chip.

The scene's rows are sharded over a 'tile' mesh axis; a single ``shard_map``
program computes the full 19-channel stack and forest prediction per shard,
with the only cross-chip traffic being:

  * a bidirectional ``ppermute`` halo exchange of the normalized bands
    (stencil reach <= HALO rows),
  * an ``all_gather`` of the per-shard GLCM window-grid rows (tiny:
    H/21 x W/21 floats) so each shard can bilinearly resize the *global*
    texture maps for its own rows,
  * a ``pmax`` for the global Sobel-magnitude normalizer.

Global statistics (percentiles / PCA axis) are histogram-exact scalars
computed once on host (pipeline.large_scene) and baked into the program as
constants — by construction identical to the monolithic path.

Constraint: shard height must be a multiple of the GLCM step so texture
windows align with the global window grid.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rs_image_segmentation_tpu.core.config import FeatureStageConfig
from rs_image_segmentation_tpu.models.forest import (GemmForest, _gemm_chunk,
                                                     gemm_forest_predict)
from rs_image_segmentation_tpu.ops.indices import spectral_indices
from rs_image_segmentation_tpu.ops.morphology import gradient
from rs_image_segmentation_tpu.ops.stencil import box_filter, sobel_magnitude
from rs_image_segmentation_tpu.pipeline.large_scene import (
    GlobalStats, _fit_global_pca, _normalize_tile, _resize_rows,
    _tile_glcm_grid, compute_global_stats, HALO)


def sharded_classify_scene(pre: np.ndarray, gf: GemmForest, mesh: Mesh,
                           cfg: FeatureStageConfig = FeatureStageConfig(),
                           axis_name: str = "tile") -> jnp.ndarray:
    """Classify a preprocessed (7, H, W) uint8-valued scene with rows
    sharded across the mesh. Returns the (H, W) label map (sharded)."""
    n = mesh.shape[axis_name]
    c, h, w = pre.shape
    rows = h // n
    if h % n or rows % cfg.glcm.step_size:
        raise ValueError(
            f"H={h} must split into {n} shards of a multiple of "
            f"{cfg.glcm.step_size} rows")

    stats = compute_global_stats(pre, cfg)
    _fit_global_pca(pre, stats, tile_rows=rows)

    p_lo = jnp.asarray(stats.p_lo)
    p_hi = jnp.asarray(stats.p_hi)
    med = jnp.asarray(stats.median)
    iqr = jnp.asarray(stats.iqr)
    mean = jnp.asarray(stats.pca_mean)
    comp1 = jnp.asarray(stats.pca_comp1)
    tex_lo = np.float32(stats.tex_lo)
    tex_hi = np.float32(stats.tex_hi)
    tb = cfg.texture_band_index
    step = cfg.glcm.step_size
    window = cfg.glcm.window_size
    grid_rows = (rows - window) // step + 1
    chunk = _gemm_chunk(gf.path.shape[1])

    def halo_pad(x, idx):
        """Exchange HALO rows of (..., rows, W) with ring neighbors;
        reflect-101 at the global top/bottom."""
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        from_above = jax.lax.ppermute(x[..., -HALO:, :], axis_name, fwd)
        from_below = jax.lax.ppermute(x[..., :HALO, :], axis_name, bwd)
        top_reflect = x[..., 1:HALO + 1, :][..., ::-1, :]
        bot_reflect = x[..., -HALO - 1:-1, :][..., ::-1, :]
        top = jnp.where(idx == 0, top_reflect, from_above)
        bot = jnp.where(idx == n - 1, bot_reflect, from_below)
        return jnp.concatenate([top, x, bot], axis=-2)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(None, axis_name, None),),
                       out_specs=P(axis_name, None))
    def run(shard):
        idx = jax.lax.axis_index(axis_name)
        row0 = idx * rows
        bands01 = _normalize_tile(shard, p_lo, p_hi)

        # ---- local GLCM grid rows -> global grid via all_gather ----------
        tex = (jnp.clip(bands01[tb], tex_lo, tex_hi) - tex_lo) \
            / (tex_hi - tex_lo + 1e-10)
        con, hom = _tile_glcm_grid(tex, cfg.glcm.levels, window, step,
                                   cfg.glcm.angles)
        con_g = jax.lax.all_gather(con, axis_name).reshape(n * grid_rows, -1)
        hom_g = jax.lax.all_gather(hom, axis_name).reshape(n * grid_rows, -1)

        # ---- halo'd stencil inputs --------------------------------------
        bands_h = halo_pad(bands01, idx)
        tex_h = (jnp.clip(bands_h[tb], tex_lo, tex_hi) - tex_lo) \
            / (tex_hi - tex_lo + 1e-10)
        u8 = (tex_h * 255.0).astype(jnp.uint8)
        smag_h = sobel_magnitude(u8.astype(jnp.float32)) / 255.0
        smax = jax.lax.pmax(jnp.max(smag_h[HALO:-HALO]), axis_name) + 1e-10

        grad5 = gradient(u8, 5).astype(jnp.float32) / 255.0
        mean5 = box_filter(tex_h, 5)
        std5 = jnp.sqrt(jnp.maximum(box_filter(tex_h * tex_h, 5)
                                    - mean5 ** 2, 0.0))

        idx_maps = spectral_indices(bands_h)
        xs = (bands_h - med[:, None, None]) / iqr[:, None, None]
        pc1 = jnp.einsum("chw,c->hw", xs - mean[:, None, None], comp1,
                         precision=jax.lax.Precision.HIGHEST)
        level_1 = jnp.stack([idx_maps["ndwi"], idx_maps["mndwi"],
                             idx_maps["ndvi"], idx_maps["evi"],
                             idx_maps["ndbi"], idx_maps["bsi"], pc1],
                            axis=-1)
        ctx = jnp.moveaxis(box_filter(jnp.moveaxis(level_1, -1, 0), 7,
                                      border="reflect"), 0, -1)

        glcm_con = _resize_rows(con_g, (h, w), row0, rows)
        glcm_hom = _resize_rows(hom_g, (h, w), row0, rows)

        sl = slice(HALO, HALO + rows)
        stack = jnp.concatenate([
            level_1[sl], ctx[sl],
            jnp.stack([glcm_con, glcm_hom, grad5[sl], std5[sl],
                       smag_h[sl] / smax], axis=-1)], axis=-1)
        pred = gemm_forest_predict(gf, stack.reshape(-1, stack.shape[-1]),
                                   chunk)
        return pred.reshape(rows, w)

    dev = jax.device_put(
        jnp.asarray(pre), NamedSharding(mesh, P(None, axis_name, None)))
    return run(dev)
