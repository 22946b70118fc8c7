"""Tensor parallelism for the GEMM forest: leaves sharded over the mesh.

SURVEY.md §2.7 TP row: the reference's only analog is sklearn's
``n_jobs=-1`` thread-parallel trees (supervised_classifiers.py:74). Here
the forest's leaf axis — the large dimension of the GEMM formulation
(models/forest.py): path (M, L), path_len (L,), leaf_dist (L, C) — is
partitioned across a ``model`` mesh axis. Every device holds the full
(small) selector/thresholds, scores its local leaf block, and the
per-class totals meet in ONE ``psum``:

    proba = psum_over_model( fired_local @ leaf_dist_local ) / n_trees

Exactness: exactly one leaf fires per (pixel, tree), and leaf distribution
rows are per-tree counts-normalized vectors; for forests grown to purity
(max_depth=None — the reference's setting) the rows are one-hot, so the
partial sums are small integers in f32 and the psum is bit-exact against
the single-device matmul. Composes with data parallelism: pixels shard
over ``data`` while leaves shard over ``model`` on a 2-D mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rs_image_segmentation_tpu.models.forest import GemmForest

_HIGH = jax.lax.Precision.HIGHEST


def pad_gemm_leaves(gf: GemmForest, n_shards: int) -> GemmForest:
    """Pad the leaf axis to a multiple of ``n_shards``.

    Pad columns have an all-zero path and path_len = -1, so their vote sum
    (0) never equals their path length: they can never fire."""
    l = gf.path.shape[1]
    pad = (-l) % n_shards
    if pad == 0:
        return gf
    path = jnp.pad(gf.path, ((0, 0), (0, pad)))
    path_len = jnp.pad(gf.path_len, (0, pad), constant_values=-1.0)
    leaf_dist = jnp.pad(gf.leaf_dist, ((0, pad), (0, 0)))
    return gf._replace(path=path, path_len=path_len, leaf_dist=leaf_dist)


def tp_forest_proba(gf: GemmForest, x: jnp.ndarray, mesh: Mesh,
                    model_axis: str = "model",
                    data_axis: str | None = None) -> jnp.ndarray:
    """Mean forest proba for (N, F) rows with leaves sharded over
    ``model_axis`` (and rows over ``data_axis`` if given)."""
    n_model = mesh.shape[model_axis]
    gf = pad_gemm_leaves(gf, n_model)
    row_spec = P(data_axis) if data_axis else P()
    in_specs = (
        row_spec + P(None),                  # x: rows over data (or repl.)
        P(),                                 # selector (replicated)
        P(),                                 # thresholds
        P(None, model_axis),                 # path: leaves sharded
        P(model_axis),                       # path_len
        P(model_axis, None),                 # leaf_dist
    )
    out_spec = row_spec + P(None)

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
                       out_specs=out_spec)
    def run(xb, selector, thresholds, path, path_len, leaf_dist):
        xv = jnp.dot(xb.astype(jnp.float32), selector.astype(jnp.float32),
                     preferred_element_type=jnp.float32, precision=_HIGH)
        s = jnp.where(xv <= thresholds[None, :], 1.0, -1.0
                      ).astype(jnp.bfloat16)
        votes = jnp.dot(s, path, preferred_element_type=jnp.float32)
        fired = (votes == path_len[None, :]).astype(jnp.float32)
        partial = jnp.dot(fired, leaf_dist,
                          preferred_element_type=jnp.float32,
                          precision=_HIGH)
        return jax.lax.psum(partial, model_axis)

    proba = run(x, gf.selector, gf.thresholds, gf.path, gf.path_len,
                gf.leaf_dist)
    return proba * gf.inv_trees


def tp_forest_predict(gf: GemmForest, x: jnp.ndarray, mesh: Mesh,
                      model_axis: str = "model",
                      data_axis: str | None = None) -> jnp.ndarray:
    """sklearn .predict parity with the forest sharded across the mesh."""
    proba = tp_forest_proba(gf, x, mesh, model_axis, data_axis)
    return gf.classes[jnp.argmax(proba, axis=1)]


def shard_gemm_forest(gf: GemmForest, mesh: Mesh,
                      model_axis: str = "model") -> GemmForest:
    """Physically place the forest's leaf-axis tensors sharded over the
    mesh (NamedSharding), so very large forests never materialize whole on
    one device. The returned GemmForest feeds ``tp_forest_predict``."""
    n = mesh.shape[model_axis]
    gf = pad_gemm_leaves(gf, n)
    return gf._replace(
        path=jax.device_put(gf.path,
                            NamedSharding(mesh, P(None, model_axis))),
        path_len=jax.device_put(gf.path_len,
                                NamedSharding(mesh, P(model_axis))),
        leaf_dist=jax.device_put(gf.leaf_dist,
                                 NamedSharding(mesh, P(model_axis, None))),
    )
