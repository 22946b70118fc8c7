"""One distributed process of a multi-host (DCN) rehearsal run.

Runnable module: each process executes
``python -m rs_image_segmentation_tpu.parallel.multihost_worker
<process_id> <num_processes> <port> [devices_per_process] [mode]`` — it
joins the coordinator, builds the global mesh, classifies its local
share of a deterministic scene batch through
:func:`multihost.classify_batch_multihost`, and checks bit-equality
with the single-process turbo program.

Modes:
  ``even``   (default) — every process feeds devices_per_process scenes.
  ``uneven`` — process 0 feeds one MORE scene and process 1 one FEWER
  (same global batch), exercising the pad_to bucket-padding path.

Failure injection: if the env var ``RS_SEG_MULTIHOST_FAIL_PID`` equals
this process id, the worker exits 3 right after joining the coordinator
— peers then block in collectives, and the spawning CLI's
kill-peers-on-first-failure path must end the run loudly (tested).
"""

from __future__ import annotations

import os
import sys

import numpy as np


def run(pid: int, nproc: int, port: str,
        devices_per_process: int = 2, mode: str = "even") -> None:
    from rs_image_segmentation_tpu.parallel.multihost import (
        classify_batch_multihost, global_mesh, init_multihost)
    init_multihost(f"127.0.0.1:{port}", nproc, pid,
                   local_device_count=devices_per_process, platform="cpu")

    if os.environ.get("RS_SEG_MULTIHOST_FAIL_PID") == str(pid):
        print(f"MULTIHOST_INJECTED_FAILURE {pid}", flush=True)
        raise SystemExit(3)

    import jax
    import jax.numpy as jnp

    from rs_image_segmentation_tpu.core.config import (CalibrationConfig,
                                                       FeatureStageConfig,
                                                       GLCMConfig)
    from rs_image_segmentation_tpu.models.forest import (_gemm_for,
                                                         fit_random_forest)
    from rs_image_segmentation_tpu.pipeline.preprocess import build_stretch_lut
    from rs_image_segmentation_tpu.pipeline.turbo import classify_scenes_turbo

    # explicit raises, not assert: the rehearsal's pass/fail signal must
    # survive python -O (asserts compile out and would turn the CLI and
    # tests/test_multihost.py into a false pass)
    if jax.device_count() != devices_per_process * nproc:
        raise RuntimeError(
            f"[{pid}] expected {devices_per_process * nproc} global "
            f"devices, got {jax.device_count()}: {jax.devices()}")
    if jax.process_count() != nproc:
        raise RuntimeError(f"[{pid}] expected {nproc} processes, "
                           f"got {jax.process_count()}")

    cfg = FeatureStageConfig(glcm=GLCMConfig(window_size=8, step_size=8,
                                             levels=8))
    cal = CalibrationConfig()
    rng = np.random.default_rng(0)          # same stream on every process

    # per-process true batch sizes (every process derives the same table)
    counts = [devices_per_process] * nproc
    pad_to = None
    if mode == "uneven":
        if nproc < 2 or devices_per_process < 2:
            raise RuntimeError("uneven mode needs >= 2 processes and "
                               ">= 2 devices/process")
        counts[0] += 1
        counts[1] -= 1
        # bucket: smallest multiple of devices_per_process covering the
        # heaviest host, so the padded global batch tiles the data axis
        pad_to = (-(-max(counts) // devices_per_process)
                  * devices_per_process)
    elif mode != "even":
        raise RuntimeError(f"unknown mode {mode!r}")

    total = sum(counts)
    scenes = rng.integers(0, 256, (total, 7, 32, 32)).astype(np.uint8)
    xt = rng.random((64, 19)).astype(np.float32)
    yt = rng.integers(1, 4, 64)
    forest, _ = fit_random_forest(xt, yt, n_estimators=10, seed=0)
    gf = _gemm_for(forest, 19)

    luts = np.stack([build_stretch_lut(s, np.asarray(cal.gains),
                                       np.asarray(cal.biases))
                     for s in scenes]).astype(np.uint8)
    lo = sum(counts[:pid])
    hi = lo + counts[pid]

    mesh = global_mesh(("data",))
    maps_local = classify_batch_multihost(scenes[lo:hi], luts[lo:hi],
                                          gf, cfg, mesh, pad_to=pad_to)

    # reference: the same scenes through the single-process turbo program
    ref = np.asarray(classify_scenes_turbo(jnp.asarray(scenes[lo:hi]),
                                           jnp.asarray(luts[lo:hi]),
                                           gf, cfg))
    if maps_local.shape != ref.shape:
        raise RuntimeError(f"[{pid}] multihost shape mismatch: "
                           f"{maps_local.shape} vs {ref.shape}")
    if not np.array_equal(maps_local, ref):
        raise RuntimeError(f"[{pid}] multihost maps diverge: "
                           f"{(maps_local != ref).sum()} px")
    print(f"MULTIHOST_OK {pid} mode={mode} local={counts[pid]}",
          flush=True)


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    devs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    mode = sys.argv[5] if len(sys.argv) > 5 else "even"
    run(pid, nproc, port, devs, mode)


if __name__ == "__main__":
    main()
