"""Core array containers.

Device data convention: multi-band rasters are band-stacked ``(C, H, W)``
float32 (or uint8) arrays — channel-major so per-band stencils map onto XLA's
NCHW convolution layout and the trailing (H, W) dims tile cleanly onto the
TPU's (8, 128) vector registers.

Geo metadata (affine transform, CRS, nodata) rides along as *static* aux data
in a pytree so jitted stage graphs can close over it without retracing on
value changes that don't affect shapes.

Reference parity: the reference carries ``(geotransform, projection)`` from
GDAL (`modules/features/preprocessing.py:19-52`) and rasterio's
``transform``/``crs`` (`modules/features/extract.py:82-121`); ``GeoMeta``
canonicalizes both spellings.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import numpy as np


@dataclasses.dataclass(frozen=True)
class GeoMeta:
    """Geo-referencing metadata for a raster.

    ``transform`` uses the Affine coefficient order ``(a, b, c, d, e, f)``
    mapping pixel (col, row) -> world (x, y):
        x = a * col + b * row + c
        y = d * col + e * row + f
    GDAL's geotransform ``(c, a, b, f, d, e)`` converts via
    :meth:`from_gdal` / :meth:`to_gdal`.
    """

    transform: Optional[Tuple[float, float, float, float, float, float]] = None
    crs: Optional[str] = None  # WKT or "EPSG:xxxx"
    nodata: Optional[float] = None

    @classmethod
    def from_gdal(cls, geotransform, projection=None, nodata=None) -> "GeoMeta":
        if geotransform is None:
            return cls(None, projection or None, nodata)
        c, a, b, f, d, e = geotransform
        return cls((a, b, c, d, e, f), projection or None, nodata)

    def to_gdal(self):
        if self.transform is None:
            return None
        a, b, c, d, e, f = self.transform
        return (c, a, b, f, d, e)

    @property
    def pixel_size(self) -> Optional[Tuple[float, float]]:
        if self.transform is None:
            return None
        a, _, _, _, e, _ = self.transform
        return (a, e)

    def is_identity(self) -> bool:
        return self.transform is None or self.transform == (1.0, 0.0, 0.0, 0.0, 1.0, 0.0)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Raster:
    """A band-stacked raster: ``data`` is ``(C, H, W)`` (or ``(H, W)``).

    Registered as a pytree: ``data`` is the traced leaf, ``meta`` and
    ``band_names`` are static aux, so a ``Raster`` flows through ``jax.jit``
    boundaries directly.
    """

    data: Any  # jnp/np array, (C, H, W) or (H, W)
    meta: GeoMeta = dataclasses.field(default_factory=GeoMeta)
    band_names: Optional[Tuple[str, ...]] = None

    @property
    def shape(self):
        return self.data.shape

    @property
    def count(self) -> int:
        return 1 if self.data.ndim == 2 else int(self.data.shape[0])

    @property
    def height(self) -> int:
        return int(self.data.shape[-2])

    @property
    def width(self) -> int:
        return int(self.data.shape[-1])

    def band(self, i: int):
        """0-based band accessor."""
        return self.data if self.data.ndim == 2 else self.data[i]

    def with_data(self, data) -> "Raster":
        return Raster(data, self.meta, self.band_names)

    def numpy(self) -> np.ndarray:
        return np.asarray(self.data)

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.data,), (self.meta, self.band_names)

    @classmethod
    def tree_unflatten(cls, aux, children):
        meta, band_names = aux
        return cls(children[0], meta, band_names)
