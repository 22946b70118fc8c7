"""Spectral index kernels.

All seven indices share the guarded-divide + clip pattern of the reference
(indices.py:50-203): where the denominator is <= 1e-3 the output is 0, and the
result is clipped to [-1, 1]. They are pure elementwise VPU ops; under jit the
whole family fuses into one pass over the band stack.

Band order convention (TM bands 1-7, reference 2_feature_extraction.py:49-56):
  0 blue, 1 green, 2 red, 3 NIR, 4 SWIR1, 5 thermal, 6 SWIR2.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def _guarded_ratio(num: jnp.ndarray, den: jnp.ndarray,
                   threshold: float = 1e-3) -> jnp.ndarray:
    mask = den > threshold
    safe_den = jnp.where(mask, den, 1.0)
    out = jnp.where(mask, num / safe_den, 0.0)
    return jnp.clip(out, -1.0, 1.0).astype(jnp.float32)


def ndvi(nir: jnp.ndarray, red: jnp.ndarray) -> jnp.ndarray:
    """(NIR-R)/(NIR+R), guarded + clipped (reference indices.py:50-71)."""
    return _guarded_ratio(nir - red, nir + red)


def evi(nir: jnp.ndarray, red: jnp.ndarray, blue: jnp.ndarray,
        L: float = 1.0, C1: float = 6.0, C2: float = 7.5,
        G: float = 2.5) -> jnp.ndarray:
    """G*(NIR-R)/(NIR + C1*R - C2*B + L) (reference indices.py:73-95)."""
    return _guarded_ratio(G * (nir - red), nir + C1 * red - C2 * blue + L)


def msavi(nir: jnp.ndarray, red: jnp.ndarray) -> jnp.ndarray:
    """MSAVI2 closed form, clipped, no divide guard
    (reference indices.py:97-114)."""
    t = 2.0 * nir + 1.0
    out = (t - jnp.sqrt(t * t - 8.0 * (nir - red))) / 2.0
    return jnp.clip(out, -1.0, 1.0).astype(jnp.float32)


def ndwi(green: jnp.ndarray, nir: jnp.ndarray) -> jnp.ndarray:
    """(G-NIR)/(G+NIR) (reference indices.py:116-137)."""
    return _guarded_ratio(green - nir, green + nir)


def mndwi(green: jnp.ndarray, swir1: jnp.ndarray) -> jnp.ndarray:
    """(G-SWIR1)/(G+SWIR1) (reference indices.py:139-158)."""
    return _guarded_ratio(green - swir1, green + swir1)


def ndbi(swir1: jnp.ndarray, nir: jnp.ndarray) -> jnp.ndarray:
    """(SWIR1-NIR)/(SWIR1+NIR) (reference indices.py:160-179)."""
    return _guarded_ratio(swir1 - nir, swir1 + nir)


def bsi(blue: jnp.ndarray, red: jnp.ndarray, nir: jnp.ndarray,
        swir1: jnp.ndarray) -> jnp.ndarray:
    """((S+R)-(N+B))/((S+R)+(N+B)) (reference indices.py:181-203)."""
    sr = swir1 + red
    nb = nir + blue
    return _guarded_ratio(sr - nb, sr + nb)


def spectral_indices(bands: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """All seven indices from a ``(C>=5, H, W)`` normalized band stack, in the
    order the reference computes them (2_feature_extraction.py:60-73)."""
    blue, green, red, nir, swir1 = (bands[0], bands[1], bands[2],
                                    bands[3], bands[4])
    return {
        "ndvi": ndvi(nir, red),
        "evi": evi(nir, red, blue),
        "msavi": msavi(nir, red),
        "ndwi": ndwi(green, nir),
        "mndwi": mndwi(green, swir1),
        "ndbi": ndbi(swir1, nir),
        "bsi": bsi(blue, red, nir, swir1),
    }
