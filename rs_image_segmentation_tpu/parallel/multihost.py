"""Multi-host (multi-slice / DCN) execution support.

SURVEY §2.7's collective-backend plan: XLA collectives ride ICI within a
slice and DCN across slices via the jax distributed runtime — no external
NCCL/MPI backend. This module wraps that runtime:

* :func:`init_multihost` — process bootstrap. On a TPU pod slice the
  environment provides everything (call with no arguments); for CPU-based
  rehearsal (tests, CI) pass coordinator/process counts explicitly and
  the per-process virtual device count.
* :func:`global_mesh` — a Mesh over ALL processes' devices.
* :func:`shard_local_batch` — per-host scene batches to one global array
  sharded over the mesh's 'data' axis
  (``jax.make_array_from_process_local_data``).
* :func:`classify_batch_multihost` — the turbo classifier over a global
  scene batch; every host feeds its local scenes and reads back exactly
  its own class maps.

The cross-process collective backend on CPU is Gloo (verified in this
environment: 2 processes x 4 virtual devices form an 8-device global
mesh; tests/test_multihost.py rehearses the full path).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def free_local_port() -> int:
    """An ephemeral 127.0.0.1 port for a rehearsal coordinator.

    Inherently TOCTOU-racy (the port is released before the coordinator
    rebinds it) — fine for local rehearsal, where a collision just fails
    the run visibly; real pods get the coordinator address from the
    environment instead."""
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None,
                   local_device_count: Optional[int] = None,
                   platform: Optional[str] = None) -> None:
    """Initialize the jax distributed runtime for this process.

    On a real TPU pod slice, call with no arguments (the TPU environment
    supplies coordinator/process topology). For CPU rehearsal pass all
    of coordinator_address/num_processes/process_id and optionally
    ``local_device_count`` virtual CPU devices per process."""
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    if local_device_count:
        flag = f"--xla_force_host_platform_device_count={local_device_count}"
        if flag not in os.environ.get("XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                       + " " + flag)
        jax.config.update("jax_num_cpu_devices", local_device_count)
    if coordinator_address is None:
        jax.distributed.initialize()          # TPU pod: env-provided
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def global_mesh(axis_names: Tuple[str, ...] = ("data",),
                shape: Optional[Tuple[int, ...]] = None):
    """Mesh over every device of every process (row-major device order).

    With the default 1-D shape the single axis spans all global devices;
    multi-axis shapes must multiply to the global device count."""
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices())
    if shape is None:
        shape = (devs.size,) + (1,) * (len(axis_names) - 1)
    return Mesh(devs.reshape(shape), axis_names)


def shard_local_batch(local_arrays: np.ndarray, mesh, axis: str = "data"):
    """Per-host ``(B_local, ...)`` batch -> global jax.Array sharded over
    ``axis`` (global batch = concatenation over process index order)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(axis, *([None] * (np.ndim(local_arrays) - 1)))
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local_arrays))


def local_shards(global_array) -> np.ndarray:
    """This process's rows of a batch-sharded global array, in batch
    order (the inverse of :func:`shard_local_batch`). Replicated mesh
    axes produce one shard per replica; duplicates are dropped."""
    seen = set()
    shards = []
    for s in global_array.addressable_shards:
        key = (s.index[0].start, s.index[0].stop)
        if key not in seen:
            seen.add(key)
            shards.append(s)
    shards.sort(key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards])


# compiled-program cache: (cfg, mesh, forest shapes, scene shape) -> fn.
# Rebuilding jax.jit per call would re-trace every batch.
_CLASSIFY_CACHE: dict = {}


def classify_batch_multihost(scenes_local: np.ndarray,
                             luts_local: np.ndarray,
                             gf, cfg, mesh,
                             pad_to: Optional[int] = None) -> np.ndarray:
    """Turbo-classify a multi-host scene batch.

    Every process passes its local ``(B_local, 7, H, W)`` uint8 scenes
    and ``(B_local, 7, 256)`` stretch LUTs; the batch shards over the
    mesh's 'data' axis (DP across hosts AND devices), the forest rides
    replicated, and each process receives its own ``(B_local, H, W)``
    class maps back. The global batch must divide the 'data' axis size.
    Reference semantics identical to
    ``pipeline.turbo.classify_scenes_turbo`` (tested bit-equal).

    UNEVEN per-host batches: hosts agree on ``pad_to`` (the max local
    count); lighter hosts pad up by repeating their last scene and
    receive only their true scenes' maps back. Padding is exact — the
    turbo program vmaps every per-scene statistic, so scene i's map is
    independent of the rest of the batch (same argument as the serving
    engine's bucket padding).

    The per-device body runs under ``jax.shard_map`` (not GSPMD
    auto-partitioning): on TPU the forest inference is a ``pallas_call``,
    which has no SPMD partitioning rule — shard_map hands each device its
    local block so the kernel never needs one."""
    import functools

    import jax
    from jax.sharding import PartitionSpec as P

    from rs_image_segmentation_tpu.pipeline.turbo import classify_scenes_turbo

    b_local = scenes_local.shape[0]
    if pad_to is not None:
        if b_local > pad_to or b_local < 1:
            raise ValueError(f"local batch {b_local} must be in "
                             f"[1, pad_to={pad_to}]")
        if b_local < pad_to:
            reps = [scenes_local[-1:]] * (pad_to - b_local)
            scenes_local = np.concatenate([scenes_local] + reps)
            luts_local = np.concatenate(
                [luts_local] + [luts_local[-1:]] * (pad_to - b_local))

    scenes_g = shard_local_batch(scenes_local, mesh)
    luts_g = shard_local_batch(luts_local, mesh)
    n_data = mesh.shape["data"]
    if scenes_g.shape[0] % n_data:
        raise ValueError(
            f"global batch {scenes_g.shape[0]} does not divide the 'data' "
            f"axis ({n_data} devices); pad the per-host batches")

    key = (cfg, mesh, scenes_g.shape, gf.selector.shape, gf.path.shape,
           gf.leaf_dist.shape)
    fn = _CLASSIFY_CACHE.get(key)
    if fn is None:
        gf_specs = jax.tree.map(lambda _: P(), gf)

        @jax.jit
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P("data"), P("data"), gf_specs),
            out_specs=P("data"),
            # pallas_call outputs carry no varying-mesh-axes annotation,
            # which the default vma check rejects; the body is purely
            # per-device (no collectives), so the check adds nothing
            check_vma=False)
        def fn(scenes, luts, gf_):
            return classify_scenes_turbo(scenes, luts, gf_, cfg)

        _CLASSIFY_CACHE[key] = fn
    maps = fn(scenes_g, luts_g, gf)
    return local_shards(maps)[:b_local]
