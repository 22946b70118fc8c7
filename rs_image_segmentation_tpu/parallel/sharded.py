"""Sharded execution: multi-scene data parallelism, spatial halo exchange,
distributed KMeans/forest.

Strategy mapping (SURVEY.md §2.7):
  * DP   : scenes batched on a 'data' mesh axis; stage graphs are
           embarrassingly parallel per scene (per-scene percentiles keep all
           reductions local — no cross-device traffic).
  * "SP" : the spatial analog — 1-D tiling of the image rows over a 'tile'
           axis with halo exchange via ``lax.ppermute`` (the reference's
           stencils need <= 10-row halos: 7x7 box context, 21-px GLCM
           windows handled at the grid level).
  * KMeans: pixels sharded over 'data'; Lloyd's centroid sums/counts and the
           k-means++ picks ride ``psum``/``pmax`` (models.kmeans hooks).
  * Forest: pixels sharded; traversal is per-pixel independent.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rs_image_segmentation_tpu.core.config import FeatureStageConfig
from rs_image_segmentation_tpu.models.forest import FlatForest, forest_predict
from rs_image_segmentation_tpu.models.kmeans import kmeans_fit_predict
from rs_image_segmentation_tpu.pipeline.features import hierarchical_stack


# ------------------------------------------------------ multi-scene DP

def sharded_hierarchical_stack(scenes: jnp.ndarray, mesh: Mesh,
                               cfg: FeatureStageConfig = FeatureStageConfig(),
                               include_entropy: bool = True) -> jnp.ndarray:
    """(S, 7, H, W) scene batch -> (S, H, W, 19) feature stacks, scenes
    sharded over the 'data' mesh axis. Per-scene reductions (percentiles,
    PCA) stay shard-local, so the graph partitions with zero collectives."""
    in_sharding = NamedSharding(mesh, P("data", None, None, None))
    out_sharding = NamedSharding(mesh, P("data", None, None, None))
    scenes = jax.device_put(scenes, in_sharding)

    @functools.partial(jax.jit, out_shardings=out_sharding)
    def run(batch):
        return jax.vmap(lambda b: hierarchical_stack(b, cfg))(batch)

    return run(scenes)


# ------------------------------------------------------ halo exchange

def halo_map(fn: Callable[[jnp.ndarray], jnp.ndarray], x: jnp.ndarray,
             halo: int, mesh: Mesh, axis_name: str = "tile") -> jnp.ndarray:
    """Apply a same-shape spatial op to a row-sharded image with halo
    exchange.

    ``x`` is (..., H, W) sharded along H over ``axis_name``. Each shard
    receives ``halo`` boundary rows from its neighbors via a bidirectional
    ``ppermute`` ring; the global top/bottom shards fall back to reflect-101
    padding of their own rows, so the tiled result equals the monolithic op
    for any stencil with reach <= halo using reflect-101 borders.
    """
    n = mesh.shape[axis_name]
    spec = P(*([None] * (x.ndim - 2) + [axis_name, None]))

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(spec,),
                       out_specs=spec)
    def run(xs):
        idx = jax.lax.axis_index(axis_name)
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        from_above = jax.lax.ppermute(xs[..., -halo:, :], axis_name, fwd)
        from_below = jax.lax.ppermute(xs[..., :halo, :], axis_name, bwd)
        # global boundary shards: reflect-101 pad from own rows
        top_reflect = xs[..., 1:halo + 1, :][..., ::-1, :]
        bot_reflect = xs[..., -halo - 1:-1, :][..., ::-1, :]
        top = jnp.where(idx == 0, top_reflect, from_above)
        bot = jnp.where(idx == n - 1, bot_reflect, from_below)
        padded = jnp.concatenate([top, xs, bot], axis=-2)
        out = fn(padded)
        return out[..., halo:-halo, :]

    return run(x)


# ------------------------------------------------------ distributed models

def sharded_kmeans_fit_predict(x: jnp.ndarray, k: int, mesh: Mesh,
                               seed: int = 42, max_iter: int = 300,
                               tol: float = 1e-4,
                               axis_name: str = "data"):
    """KMeans over (N, F) pixels sharded across the mesh. Lloyd centroid
    statistics and k-means++ candidate picks ride psum/pmax over ICI."""
    spec = P(axis_name, None)

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(spec,),
                       out_specs=(P(axis_name), P(None, None)))
    def run(xs):
        labels, state = kmeans_fit_predict(xs, k, seed=seed,
                                           max_iter=max_iter, tol=tol,
                                           axis_name=axis_name)
        return labels, state.centroids

    labels, centroids = run(x)
    return labels, centroids


def sharded_forest_predict(forest: FlatForest, x: jnp.ndarray, depth: int,
                           mesh: Mesh, axis_name: str = "data",
                           chunk: int = 65536) -> jnp.ndarray:
    """Forest inference over pixels sharded across the mesh (no collectives;
    the forest tensors replicate)."""
    n = x.shape[0]
    d = mesh.shape[axis_name]
    pad = (-n) % d
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    xp = jax.device_put(xp, NamedSharding(mesh, P(axis_name, None)))

    @functools.partial(jax.jit,
                       out_shardings=NamedSharding(mesh, P(axis_name)))
    def run(xs):
        return forest_predict(forest, xs, depth, chunk)

    return run(xp)[:n]


# ------------------------------------- DP for the batch-coupled programs

def sharded_method_batch(scenes: jnp.ndarray, luts: jnp.ndarray, mesh: Mesh,
                         method: str = "rule_based",
                         cfg: FeatureStageConfig = FeatureStageConfig(),
                         axis_name: str = "data", **kw) -> jnp.ndarray:
    """Scene-parallel execution of the BATCH-COUPLED round-4 programs.

    ``rule_based_scenes_turbo_batch`` and ``kmeans_scenes_turbo_batch``
    are deliberately batch-coupled on one chip (all of a batch's masks
    stack into one tall image for the gated CC/min-area machinery; the
    kmeans fits vmap over the batch), so plain jit auto-partitioning
    would gather the batch to one device. The multi-chip form is
    ``shard_map`` over the scene axis: each chip runs the full batch
    program on ITS sub-batch — zero collectives, and per-scene results
    are bit-identical to a single-device run because every per-scene
    quantity already is (rule: exact by construction, tested; kmeans:
    per-scene fits with frozen converged lanes).

    scenes: (S, 7, H, W) uint8 with S divisible by the mesh axis size;
    luts: (S, 7, 256) uint8. ``kw`` forwards to the method's program
    (e.g. n_clusters / fit_stride for kmeans)."""
    from rs_image_segmentation_tpu.pipeline.turbo import (
        kmeans_scenes_turbo_batch, rule_based_scenes_turbo_batch)

    n = mesh.shape[axis_name]
    if scenes.shape[0] % n:
        raise ValueError(f"scene count {scenes.shape[0]} must divide "
                         f"evenly into {n} shards")
    if method == "rule_based":
        fn = lambda s, l: rule_based_scenes_turbo_batch(s, l, cfg, **kw)
    elif method == "kmeans":
        fn = lambda s, l: kmeans_scenes_turbo_batch(s, l, cfg=cfg, **kw)
    else:
        raise ValueError(f"unsupported method {method!r}")

    spec = P(axis_name, None, None, None)
    # check_vma=False: the programs' internal while_loops initialize
    # carries from replicated constants (converged flags, iteration
    # counters) while the bodies compute varying values — sound here
    # because every computation is shard-local (no collectives)
    run = jax.shard_map(lambda s, l: fn(s, l), mesh=mesh,
                        in_specs=(spec, P(axis_name, None, None)),
                        out_specs=P(axis_name, None, None),
                        check_vma=False)
    scenes = jax.device_put(scenes, NamedSharding(mesh, spec))
    luts = jax.device_put(luts, NamedSharding(mesh, P(axis_name, None, None)))
    return run(scenes, luts)
