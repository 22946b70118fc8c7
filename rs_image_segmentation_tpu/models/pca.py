"""PCA with robust (median/IQR) or min-max scaling — all on device.

Replaces the reference's RobustScaler + sklearn.PCA SVD path
(indices.py:205-246), the single slowest non-texture stage in the baseline
(3.7 s on CPU, dominated by percentile computation). Here: per-band
percentiles via device sort, covariance as an (F x N)(N x F) MXU matmul, and
the eigendecomposition of the tiny F x F Gram matrix via ``jnp.linalg.eigh``
— mathematically identical to the SVD of the centered data.

Sign convention matches sklearn's ``svd_flip(u_based_decision=False)``: each
component is flipped so its largest-|coefficient| entry is positive.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rs_image_segmentation_tpu.ops.normalize import percentile


class PCAResult(NamedTuple):
    components: jnp.ndarray          # (k, F) principal axes (rows)
    explained_variance: jnp.ndarray  # (k,)
    explained_variance_ratio: jnp.ndarray  # (k,)
    transformed: jnp.ndarray         # (N, k) projected data
    mean: jnp.ndarray                # (F,) center used by PCA


def robust_scale(x: jnp.ndarray) -> jnp.ndarray:
    """sklearn.RobustScaler (median center, IQR scale; zero IQR -> 1)."""
    cols = []
    for f in range(x.shape[1]):
        q = percentile(x[:, f], jnp.array([25.0, 50.0, 75.0]))
        iqr = q[2] - q[0]
        scale = jnp.where(iqr > 0, iqr, 1.0)
        cols.append((x[:, f] - q[1]) / scale)
    return jnp.stack(cols, axis=1)


def minmax_scale(x: jnp.ndarray) -> jnp.ndarray:
    mn = jnp.min(x, axis=0, keepdims=True)
    mx = jnp.max(x, axis=0, keepdims=True)
    return (x - mn) / jnp.where(mx - mn > 0, mx - mn, 1.0)


def pca_fit_transform(x: jnp.ndarray, n_components: Optional[int] = None,
                      use_robust_scaling: bool = True) -> PCAResult:
    """Full PCA pipeline on (N, F) data (sklearn-equivalent up to fp error).

    The reference scales with RobustScaler (or MinMax) before PCA
    (indices.py:224-238); PCA itself centers by the mean.
    """
    x = x.astype(jnp.float32)
    n, f = x.shape
    k = n_components or f
    xs = robust_scale(x) if use_robust_scaling else minmax_scale(x)
    mean = jnp.mean(xs, axis=0)
    xc = xs - mean
    # covariance via MXU: (F, N) @ (N, F) / (N - 1)
    cov = jnp.dot(xc.T, xc, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST) / (n - 1)
    eigvals, eigvecs = jnp.linalg.eigh(cov)          # ascending
    order = jnp.argsort(-eigvals)
    eigvals = jnp.maximum(eigvals[order], 0.0)
    total_var = jnp.sum(eigvals)
    comps = eigvecs[:, order].T                      # (F, F) rows = components
    # svd_flip(u_based_decision=False): sign of max-|v| entry per row -> +
    max_idx = jnp.argmax(jnp.abs(comps), axis=1)
    signs = jnp.sign(comps[jnp.arange(f), max_idx])
    signs = jnp.where(signs == 0, 1.0, signs)
    comps = comps * signs[:, None]
    comps = comps[:k]
    eigvals = eigvals[:k]
    ratio = eigvals / total_var
    transformed = jnp.dot(xc, comps.T, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    return PCAResult(comps, eigvals, ratio, transformed, mean)


def pca_bands(bands: jnp.ndarray, n_components: Optional[int] = None,
              use_robust_scaling: bool = True
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """PCA over a (C, H, W) band stack; returns ((k, H, W) component images,
    (k,) explained variance ratio) — the reference's perform_pca output
    layout (indices.py:205-246)."""
    c, h, w = bands.shape
    flat = bands.reshape(c, h * w).T
    res = pca_fit_transform(flat, n_components, use_robust_scaling)
    k = res.transformed.shape[1]
    imgs = res.transformed.T.reshape(k, h, w)
    return imgs, res.explained_variance_ratio
