"""Device mesh construction and sharding helpers.

Axes convention:
  data : scenes / pixel blocks (pure data parallelism, psum collectives)
  tile : spatial image tiles (halo exchange via ppermute / padded collect)

The reference is single-process (SURVEY.md §2.7); scaling here is native
jax.sharding over ICI — no external communication backend.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Build a mesh over all (or the given) devices. Default: 1-D 'data'
    mesh over every addressable device."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != #devices {len(devices)}")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0,
                  mesh_axis: str = "data") -> NamedSharding:
    """Shard array dim ``axis`` over ``mesh_axis``, replicate the rest."""
    spec = [None] * ndim
    spec[axis] = mesh_axis
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh, ndim: int = 0) -> NamedSharding:
    return NamedSharding(mesh, P(*([None] * ndim)))
