#!/usr/bin/env python3
"""Measure cross-device stage pipelining: stage-2 feature extraction on
the TPU, stage-3 forest classification on the host CPU device
(SURVEY §2.7 PP).

serial   : per scene, stack on TPU -> fetch -> classify on CPU, blocking.
pipelined: all scene chains enqueued back-to-back; the TPU computes
           scene i+1's stack and streams it down while the CPU classifies
           scene i. One drain at the end.

Prints one JSON line with both wall-clocks and the speedup.

MEASURED RESULT ON THIS ENVIRONMENT (recorded 2026-08-16): speedup
0.925 — pipelining LOSES here, and the reason is structural: the host
has ONE physical core, which must simultaneously run the XLA:CPU
stage-3 programs, the Python dispatch loop, and the RPC client driving
the remote TPU tunnel. When stage 3 executes, the tunnel starves. The
same applies to the 8-virtual-CPU test mesh (all eight "devices" share
the one core), which is why tests/test_pipeline_pp.py gates its
wall-clock assertion on os.cpu_count() >= 2. The placement machinery
(parallel/pipeline_pp.py) is correct and parity-tested; on hardware
where stages own separate execution resources (a real multi-chip slice,
or any multi-core host) the enqueue-everything-drain-once schedule is
what produces the overlap.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main() -> None:
    import jax
    jax.config.update("jax_platforms", "axon,cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from rs_image_segmentation_tpu.core.config import FeatureStageConfig
    from rs_image_segmentation_tpu.io.tiff import read_tiff
    from rs_image_segmentation_tpu.models.forest import (_gemm_chunk,
                                                         _gemm_for,
                                                         fit_random_forest,
                                                         gemm_forest_predict)
    from rs_image_segmentation_tpu.pipeline.features import (
        hierarchical_stack_fused)

    tpu = jax.devices("tpu")[0]
    cpu = jax.devices("cpu")[0]
    cfg = FeatureStageConfig()

    arr, _ = read_tiff("/root/reference/data/raw/AA.tif")
    rng = np.random.default_rng(0)
    n_scenes = 8
    scenes = [np.ascontiguousarray(arr).astype(np.float32)
              for _ in range(n_scenes)]

    stack0 = np.asarray(hierarchical_stack_fused(
        jax.device_put(jnp.asarray(scenes[0]), tpu), cfg))
    x = stack0.reshape(-1, 19)
    sel = rng.integers(0, x.shape[0], 400)
    forest, depth = fit_random_forest(x[sel], rng.integers(1, 4, 400),
                                      n_estimators=20, seed=0)
    gf = _gemm_for(forest, 19)
    gf_cpu = jax.tree_util.tree_map(lambda t: jax.device_put(t, cpu), gf)
    chunk = _gemm_chunk(gf.path.shape[1])

    stage2 = jax.jit(lambda s: hierarchical_stack_fused(s, cfg))
    stage3 = jax.jit(lambda st: gemm_forest_predict(
        gf_cpu, st.reshape(-1, st.shape[-1]), chunk).reshape(st.shape[:2]))

    def chain(arr_np, drain):
        s = jax.device_put(jnp.asarray(arr_np), tpu)
        stack = stage2(s)                       # TPU
        stack_c = jax.device_put(stack, cpu)    # TPU -> host stream
        pred = stage3(stack_c)                  # CPU
        if drain:
            np.asarray(pred)
        return pred

    chain(scenes[0], drain=True)  # compile both stages

    t0 = time.perf_counter()
    for s in scenes:
        chain(s, drain=True)      # serial: block after every scene
    serial_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    preds = [chain(s, drain=False) for s in scenes]
    for p in preds:
        np.asarray(p)             # single drain
    pipe_s = time.perf_counter() - t0

    print(json.dumps({
        "metric": "PP overlap (stage2 TPU / stage3 host CPU)",
        "n_scenes": n_scenes,
        "serial_s": round(serial_s, 3),
        "pipelined_s": round(pipe_s, 3),
        "speedup": round(serial_s / pipe_s, 3),
    }), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
