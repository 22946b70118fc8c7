"""Double-buffered host->device tile streaming.

For scenes larger than device memory (or multi-scene batches), tiles are
decoded on host and shipped to the device with ``jax.device_put`` while the
previous tile computes — ``jax.Array`` dispatch is async, so issuing the
next transfer before blocking on the current result overlaps DMA with
compute. The reference reads whole scenes into RAM (SURVEY.md L0); this
layer is what lets the framework scale past that.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Iterator, List, Optional, Tuple

import jax
import numpy as np


@dataclasses.dataclass(frozen=True)
class TileSpec:
    """A tile of a (C, H, W) raster with its halo-inclusive read window."""
    y0: int
    x0: int
    height: int
    width: int
    halo: int

    @property
    def read_window(self) -> Tuple[int, int, int, int]:
        return (self.y0 - self.halo, self.x0 - self.halo,
                self.height + 2 * self.halo, self.width + 2 * self.halo)


def tile_grid(height: int, width: int, tile: int,
              halo: int = 0) -> List[TileSpec]:
    """Cover (height, width) with tiles of side <= ``tile``."""
    specs = []
    for y0 in range(0, height, tile):
        for x0 in range(0, width, tile):
            specs.append(TileSpec(y0, x0, min(tile, height - y0),
                                  min(tile, width - x0), halo))
    return specs


def read_tile(arr: np.ndarray, spec: TileSpec,
              pad_mode: str = "reflect") -> np.ndarray:
    """Slice a halo-padded tile out of a (C, H, W) array, reflect-padding
    where the halo crosses the image border."""
    c, h, w = arr.shape if arr.ndim == 3 else (1, *arr.shape)
    y, x, th, tw = spec.read_window
    ys, xs = max(y, 0), max(x, 0)
    ye, xe = min(y + th, h), min(x + tw, w)
    tile = arr[..., ys:ye, xs:xe]
    pads = [(0, 0)] * (arr.ndim - 2) + [(ys - y, (y + th) - ye),
                                        (xs - x, (x + tw) - xe)]
    if any(p != (0, 0) for p in pads):
        tile = np.pad(tile, pads, mode=pad_mode)
    return tile


def stream_tiles(arr: np.ndarray, specs: Iterable[TileSpec],
                 fn: Callable, device=None,
                 pad_mode: str = "reflect") -> Iterator[Tuple[TileSpec, jax.Array]]:
    """Run ``fn`` over tiles with double buffering: the next tile's H2D
    transfer is issued before the current tile's result is awaited."""
    specs = list(specs)
    device = device or jax.devices()[0]
    if not specs:
        return
    pending: Optional[Tuple[TileSpec, jax.Array]] = None
    next_buf = jax.device_put(read_tile(arr, specs[0], pad_mode), device)
    for i, spec in enumerate(specs):
        buf = next_buf
        out = fn(buf)  # async dispatch
        if i + 1 < len(specs):
            next_buf = jax.device_put(read_tile(arr, specs[i + 1], pad_mode),
                                      device)
        if pending is not None:
            jax.block_until_ready(pending[1])
            yield pending
        pending = (spec, out)
    jax.block_until_ready(pending[1])
    yield pending


def assemble_tiles(results: Iterable[Tuple[TileSpec, jax.Array]],
                   out_shape: Tuple[int, ...],
                   dtype=np.float32) -> np.ndarray:
    """Stitch (spec, tile_result) pairs (halo already cropped by fn or
    crop here if result still carries it) into a full array."""
    out = np.zeros(out_shape, dtype)
    for spec, res in results:
        r = np.asarray(res)
        eh = r.shape[-2] - spec.height
        ew = r.shape[-1] - spec.width
        if eh or ew:  # crop centered halo
            r = r[..., eh // 2: eh // 2 + spec.height,
                  ew // 2: ew // 2 + spec.width]
        out[..., spec.y0:spec.y0 + spec.height,
            spec.x0:spec.x0 + spec.width] = r
    return out
