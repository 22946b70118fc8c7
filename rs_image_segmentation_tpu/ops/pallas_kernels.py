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
