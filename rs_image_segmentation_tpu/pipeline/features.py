"""Stage 2 — feature extraction: indices, PCA, texture, hierarchical stack.

Reference: scripts/2_feature_extraction.py:27-133 + modules/features/indices.py.
The entire stage compiles to ONE jitted device graph over the (7, H, W)
stack: normalization, the 7 indices, PCA, GLCM/LBP/multi-scale/morphology/
filter-bank texture on the NIR band, the level-1/level-2 stacks, and the 7x7
spatial context. Output is a flat dict of named device arrays plus the
canonical 19-channel hierarchical feature stack:

  channels 0-6  : level-1 [ndwi, mndwi, ndvi, evi, ndbi, bsi, pc1]
                  (reference indices.py:808-835)
  channels 7-13 : 7x7 box-filtered copies of 0-6 (indices.py:760-776)
  channels 14-18: level-2 [glcm_contrast, glcm_homogeneity,
                  morph_gradient_5, std_dev_scale_5, sobel_mag]
                  (indices.py:837-865)

Known reference quirk preserved: ``texture_band_index`` is accepted but the
texture band is always NIR (reference 2_feature_extraction.py:27,84 ignores
its own parameter).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rs_image_segmentation_tpu.core.config import FeatureStageConfig
from rs_image_segmentation_tpu.models.pca import pca_bands
from rs_image_segmentation_tpu.ops.indices import spectral_indices
from rs_image_segmentation_tpu.ops.morphology import (
    closing, dilate, erode, gradient, opening)
from rs_image_segmentation_tpu.ops.multiscale import multi_scale_features
from rs_image_segmentation_tpu.ops.normalize import robust_normalize
from rs_image_segmentation_tpu.ops.stencil import (
    box_filter, gabor_responses, gaussian_blur_u8, laplacian, sobel_magnitude)
from rs_image_segmentation_tpu.ops.texture import glcm_feature_maps, lbp_feature


def morphological_features(band01: jnp.ndarray,
                           kernel_sizes=(3, 5, 7)) -> Dict[str, jnp.ndarray]:
    """uint8 erode/dilate/open/close/gradient per kernel size, /255
    (reference indices.py:401-442)."""
    u8 = (band01 * 255.0).astype(jnp.uint8)
    out = {}
    for k in kernel_sizes:
        out[f"erosion_{k}"] = erode(u8, k).astype(jnp.float32) / 255.0
        out[f"dilation_{k}"] = dilate(u8, k).astype(jnp.float32) / 255.0
        out[f"opening_{k}"] = opening(u8, k).astype(jnp.float32) / 255.0
        out[f"closing_{k}"] = closing(u8, k).astype(jnp.float32) / 255.0
        out[f"gradient_{k}"] = gradient(u8, k).astype(jnp.float32) / 255.0
    return out


def filter_responses(band01: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Gaussian 5/15, DoG, Laplacian, Sobel magnitude on the uint8-quantized
    band (reference indices.py:444-482)."""
    u8 = (band01 * 255.0).astype(jnp.uint8)
    g5 = gaussian_blur_u8(u8, 5).astype(jnp.float32) / 255.0
    g15 = gaussian_blur_u8(u8, 15).astype(jnp.float32) / 255.0
    dog = g5 - g15
    dog = (dog - jnp.min(dog)) / (jnp.max(dog) - jnp.min(dog) + 1e-10)
    lap = laplacian(u8.astype(jnp.float32)) / 255.0
    lap = (lap - jnp.min(lap)) / (jnp.max(lap) - jnp.min(lap) + 1e-10)
    smag = sobel_magnitude(u8.astype(jnp.float32)) / 255.0
    smag = smag / (jnp.max(smag) + 1e-10)
    return {"gaussian_5": g5, "gaussian_15": g15, "dog": dog,
            "laplacian": lap, "sobel_mag": smag}


def add_spatial_context(stack_hwc: jnp.ndarray, window_size: int = 7
                        ) -> jnp.ndarray:
    """Concat per-channel 7x7 box means (BORDER_REFLECT), doubling channels
    (reference indices.py:760-776)."""
    chw = jnp.moveaxis(stack_hwc, -1, 0)
    ctx = box_filter(chw, window_size, border="reflect")
    return jnp.concatenate([stack_hwc, jnp.moveaxis(ctx, 0, -1)], axis=-1)


# Per-family jits: compiling the whole stage as ONE XLA program makes
# compile time superlinear (measured: >10 min on the remote-compile TPU path
# vs ~90 s for the families separately), while steady-state loses nothing —
# cross-family fusion opportunities are negligible. Intermediates stay on
# device between the sub-jits.
_normalize_all = jax.jit(
    lambda b, lo, hi, eps: jax.vmap(
        lambda x: robust_normalize(x, lo, hi, eps))(b),
    static_argnums=(1, 2, 3))
_indices_jit = jax.jit(spectral_indices)
_pca_jit = jax.jit(pca_bands, static_argnames=("n_components",
                                               "use_robust_scaling"))
_tex_norm_jit = jax.jit(robust_normalize)
_glcm_jit = jax.jit(glcm_feature_maps,
                    static_argnames=("levels", "window_size", "step_size",
                                     "distances", "angles"))
_lbp_jit = jax.jit(lbp_feature, static_argnames=("n_points", "radius"))
_multiscale_jit = jax.jit(multi_scale_features,
                          static_argnames=("scales", "entropy_max_scale",
                                           "include_entropy"))
_morph_jit = jax.jit(morphological_features, static_argnames=("kernel_sizes",))
_filters_jit = jax.jit(filter_responses)


@functools.partial(jax.jit, static_argnames=("window_size",))
def _assemble_jit(ndwi, mndwi, ndvi, evi, ndbi, bsi, pc1,
                  glcm_contrast, glcm_homogeneity, morph_gradient_5,
                  std_dev_scale_5, sobel_mag, window_size: int = 7):
    level_1 = jnp.stack([ndwi, mndwi, ndvi, evi, ndbi, bsi, pc1], axis=-1)
    level_2 = jnp.stack([glcm_contrast, glcm_homogeneity, morph_gradient_5,
                         std_dev_scale_5, sobel_mag], axis=-1)
    level_1_ctx = add_spatial_context(level_1, window_size)
    return {
        "level_1": level_1_ctx,
        "level_2": level_2,
        "all": jnp.concatenate([level_1_ctx, level_2], axis=-1),
    }


def extract_features(bands: jnp.ndarray,
                     cfg: FeatureStageConfig = FeatureStageConfig(),
                     normalize_input: bool = True,
                     include_entropy: bool = True):
    """The stage-2 graph: (7, H, W) raw/preprocessed bands ->
    (features dict, hierarchical dict with 'level_1' 14ch / 'level_2' 5ch /
    'all' 19ch H x W x C stacks). Composed of per-family jits; everything
    stays on device end to end."""
    bands = bands.astype(jnp.float32)
    if normalize_input:
        bands = _normalize_all(bands, cfg.normalize.lower_percentile,
                               cfg.normalize.upper_percentile,
                               cfg.normalize.epsilon)

    feats: Dict[str, jnp.ndarray] = {}
    feats.update(_indices_jit(bands))

    pca_imgs, variance_ratio = _pca_jit(bands, use_robust_scaling=True)
    feats["pca_result"] = pca_imgs
    feats["variance_ratio"] = variance_ratio

    nir01 = bands[cfg.texture_band_index]
    # each texture family re-normalizes its input, as the reference does
    tex01 = _tex_norm_jit(nir01)

    glcm = _glcm_jit(tex01, cfg.glcm.levels, cfg.glcm.window_size,
                     cfg.glcm.step_size, cfg.glcm.distances, cfg.glcm.angles)
    feats["glcm_features"] = glcm
    feats["lbp_feature"] = _lbp_jit(tex01, n_points=cfg.lbp.n_points,
                                    radius=float(cfg.lbp.radius))
    ms = _multiscale_jit(tex01, scales=cfg.multiscale.scales,
                         entropy_max_scale=cfg.multiscale.entropy_max_scale,
                         include_entropy=include_entropy)
    feats["multi_scale_features"] = ms
    morph = _morph_jit(tex01, kernel_sizes=cfg.morphology.kernel_sizes)
    feats["morphological_features"] = morph
    filt = _filters_jit(tex01)
    feats["filter_features"] = filt
    if cfg.include_gabor:
        feats["gabor_features"] = gabor_responses((tex01 * 255).astype(jnp.uint8))

    hierarchical = _assemble_jit(
        feats["ndwi"], feats["mndwi"], feats["ndvi"], feats["evi"],
        feats["ndbi"], feats["bsi"], pca_imgs[0],
        glcm["contrast"], glcm["homogeneity"], morph["gradient_5"],
        ms["std_dev_scale_5"], filt["sobel_mag"],
        window_size=cfg.context.window_size)
    return feats, hierarchical


def hierarchical_stack(bands: jnp.ndarray,
                       cfg: FeatureStageConfig = FeatureStageConfig()
                       ) -> jnp.ndarray:
    """Just the canonical (H, W, 19) stack — the classification input."""
    _, hier = extract_features(bands, cfg)
    return hier["all"]


@functools.partial(jax.jit, static_argnames=("cfg", "include_entropy"))
def hierarchical_stack_fused(bands: jnp.ndarray,
                             cfg: FeatureStageConfig = FeatureStageConfig(),
                             include_entropy: bool = True) -> jnp.ndarray:
    """Single-program variant of :func:`hierarchical_stack`.

    One XLA program = one dispatch, which matters when per-dispatch latency
    is high (remote-attached TPU). Compiles slower than the per-family jits
    (one big program) but the persistent compilation cache amortizes that to
    a single cold run. Only the ops feeding the 19-channel stack are traced,
    so the program is much smaller than full ``extract_features``.
    """
    bands = bands.astype(jnp.float32)
    bands = jax.vmap(lambda b: robust_normalize(
        b, cfg.normalize.lower_percentile, cfg.normalize.upper_percentile,
        cfg.normalize.epsilon))(bands)
    idx = spectral_indices(bands)
    pca_imgs, _ = pca_bands(bands, use_robust_scaling=True)
    tex01 = robust_normalize(bands[cfg.texture_band_index])
    glcm = glcm_feature_maps(tex01, cfg.glcm.levels, cfg.glcm.window_size,
                             cfg.glcm.step_size, cfg.glcm.distances,
                             cfg.glcm.angles)
    u8 = (tex01 * 255.0).astype(jnp.uint8)
    grad5 = gradient(u8, 5).astype(jnp.float32) / 255.0
    mean5 = box_filter(tex01, 5)
    var5 = jnp.maximum(box_filter(tex01 * tex01, 5) - mean5 * mean5, 0.0)
    std5 = jnp.sqrt(var5)
    smag = sobel_magnitude(u8.astype(jnp.float32)) / 255.0
    smag = smag / (jnp.max(smag) + 1e-10)
    level_1 = jnp.stack([idx["ndwi"], idx["mndwi"], idx["ndvi"], idx["evi"],
                         idx["ndbi"], idx["bsi"], pca_imgs[0]], axis=-1)
    level_2 = jnp.stack([glcm["contrast"], glcm["homogeneity"], grad5,
                         std5, smag], axis=-1)
    level_1_ctx = add_spatial_context(level_1, cfg.context.window_size)
    return jnp.concatenate([level_1_ctx, level_2], axis=-1)


def run_feature_extraction_stage(
    input_path: str,
    output_dir: str,
    cfg: FeatureStageConfig = FeatureStageConfig(),
    vis: bool = True,
    include_entropy: bool = True,
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Host orchestration matching scripts/2_feature_extraction.py __main__
    (:137-408): read the preprocessed GeoTIFF (NoData -> NaN), run the fused
    graph, persist .npy x3 + pickle + 19-band LZW tiled GeoTIFF (+ plots)."""
    from rs_image_segmentation_tpu.io.artifacts import save_feature_artifacts
    from rs_image_segmentation_tpu.io.tiff import read_tiff

    arr, info = read_tiff(input_path)
    data = arr.astype(np.float32)
    if info.meta.nodata is not None:
        data[data == info.meta.nodata] = np.nan
    feats, hier = extract_features(jnp.asarray(np.nan_to_num(data)), cfg,
                                   include_entropy=include_entropy)
    feats_np = jax.tree_util.tree_map(np.asarray, feats)
    hier_np = {k: np.asarray(v) for k, v in hier.items()}

    # the reference stores pca_result as a list of 2-D arrays
    if "pca_result" in feats_np:
        feats_np["pca_result"] = [feats_np["pca_result"][i]
                                  for i in range(feats_np["pca_result"].shape[0])]

    save_feature_artifacts(output_dir, feats_np, hier_np, info.meta)
    if vis:
        visualize_features(feats_np, hier_np, output_dir)
    return feats_np, hier_np


def visualize_features(feats: Dict, hier: Dict, output_dir: str) -> None:
    """Index maps, PCA composite + variance bar, level-1/2 feature grids
    (reference 2_feature_extraction.py:267-385, indices.py:867-936)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(output_dir, exist_ok=True)
    index_cmaps = {"ndvi": "RdYlGn", "ndwi": "Blues", "mndwi": "Blues",
                   "ndbi": "RdGy_r", "bsi": "YlOrBr"}
    fig, axes = plt.subplots(1, 5, figsize=(25, 5))
    for ax, (name, cmap) in zip(axes, index_cmaps.items()):
        im = ax.imshow(np.asarray(feats[name]), cmap=cmap, vmin=-1, vmax=1)
        ax.set_title(name.upper())
        ax.axis("off")
        fig.colorbar(im, ax=ax, fraction=0.046)
    fig.tight_layout()
    fig.savefig(os.path.join(output_dir, "index_maps.png"), dpi=120)
    plt.close(fig)

    pca = feats.get("pca_result")
    if pca is not None:
        pca = np.stack(pca) if isinstance(pca, list) else np.asarray(pca)
        rgb = np.stack([(p - p.min()) / (p.max() - p.min() + 1e-10)
                        for p in pca[:3]], axis=-1)
        fig, axes = plt.subplots(1, 2, figsize=(13, 6))
        axes[0].imshow(rgb)
        axes[0].set_title("PCA PC1-3 composite")
        axes[0].axis("off")
        vr = np.asarray(feats["variance_ratio"])
        axes[1].bar(np.arange(1, len(vr) + 1), vr)
        axes[1].set_title("Explained variance ratio")
        axes[1].set_xlabel("component")
        fig.tight_layout()
        fig.savefig(os.path.join(output_dir, "feature_pca.png"), dpi=120)
        plt.close(fig)

        # the reference also emits the variance bar as its OWN file
        # (scripts/2_feature_extraction.py:377-381)
        fig, ax = plt.subplots(figsize=(8, 5))
        ax.bar(np.arange(1, len(vr) + 1), vr)
        ax.set_title("PCA explained variance ratio")
        ax.set_xlabel("component")
        ax.set_ylabel("ratio")
        fig.tight_layout()
        fig.savefig(os.path.join(output_dir, "pca_variance_explained.png"),
                    dpi=120)
        plt.close(fig)

    for key, fname in (("level_1", "level_1_features.png"),
                       ("level_2", "level_2_features.png"),
                       ("all", "combined_features.png")):
        stack = np.asarray(hier[key])
        n = stack.shape[-1]
        cols = min(n, 7)
        rows = -(-n // cols)
        fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows))
        axes = np.atleast_2d(axes)
        for i in range(rows * cols):
            ax = axes[i // cols, i % cols]
            ax.axis("off")
            if i < n:
                ax.imshow(stack[:, :, i], cmap="viridis")
                ax.set_title(f"ch {i}", fontsize=8)
        fig.tight_layout()
        fig.savefig(os.path.join(output_dir, fname), dpi=100)
        plt.close(fig)
