#!/usr/bin/env python3
"""Component-level device benchmarks for the turbo pipeline.

Measures each fused program with the forced-completion protocol
(enqueue-N, fetch one element of the last output, subtract one measured
RPC round-trip — see docs/BENCHMARKS.md: `block_until_ready` does not
block on this environment's tunnel). Prints one JSON line per component
so rounds can A/B kernels with a single command:

    python benchmarks/kernel_bench.py [--reps 20]

Components: LUT+histogram preamble (Pallas bilinear), 19-channel stack
core, fused forest inference (Pallas), full turbo program, and the
single-scene kmeans / rule-based fused routes.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

BASELINE_MP_PER_S = 0.058


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from rs_image_segmentation_tpu.core.config import (CalibrationConfig,
                                                       FeatureStageConfig)
    from rs_image_segmentation_tpu.io.tiff import read_tiff
    from rs_image_segmentation_tpu.models.forest import _gemm_for
    from rs_image_segmentation_tpu.ops.pallas_kernels import (
        forest_block_n, forest_labels_pallas)
    from rs_image_segmentation_tpu.pipeline import turbo as T
    from rs_image_segmentation_tpu.pipeline.features import (
        hierarchical_stack_fused)
    from rs_image_segmentation_tpu.pipeline.preprocess import (
        build_stretch_lut, preprocess_bands)
    from rs_image_segmentation_tpu.tools.sampling import SampleSet
    from rs_image_segmentation_tpu.tools.supervised import (
        train_random_forest_from_samples)

    arr, _ = read_tiff("/root/reference/data/raw/AA.tif")
    cal = CalibrationConfig()
    gains, biases = np.asarray(cal.gains), np.asarray(cal.biases)
    cfg = FeatureStageConfig()
    mp_scene = arr.shape[1] * arr.shape[2] / 1e6

    pre0 = preprocess_bands(arr, gains, biases)
    stack0 = np.asarray(hierarchical_stack_fused(pre0.astype(jnp.float32)))
    coords, labels = SampleSet.load("/root/reference/data/samples.pkl")
    x_train = np.nan_to_num(stack0[coords[:, 1], coords[:, 0], :])
    forest, depth = train_random_forest_from_samples(x_train, labels)
    gf = _gemm_for(forest, 19)

    batch = np.ascontiguousarray(np.broadcast_to(arr, (8,) + arr.shape)).copy()
    luts = np.stack([build_stretch_lut(s, gains, biases)
                     for s in batch]).astype(np.uint8)
    bd, ld = jnp.asarray(batch), jnp.asarray(luts)
    lut1 = jnp.asarray(luts[0])
    a1 = jnp.asarray(arr)
    rng = np.random.default_rng(0)
    x_cm = jnp.asarray(rng.random((19, 8 * arr.shape[1] * arr.shape[2])
                                  ).astype(np.float32))

    def fetch1(o):
        leaf = jax.tree.leaves(o)[0]
        return np.asarray(jax.device_get(jnp.ravel(leaf)[-1:]))

    def enqn(f, n):
        o = f()
        fetch1(o)
        rtts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fetch1(o)
            rtts.append(time.perf_counter() - t0)
        rtt = min(rtts)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [f() for _ in range(n)]
            fetch1(outs[-1])
            d = (time.perf_counter() - t0 - rtt) / n
            best = d if best is None else min(best, d)
        return best

    bn = forest_block_n(gf.selector.shape[1], gf.leaf_dist.shape[0])
    pre_fn = jax.jit(lambda b, l: jax.vmap(
        lambda s, li: T._preamble(s, li)[0])(b, l))
    stack_fn = jax.jit(lambda b, l: jax.vmap(
        lambda s, li: T._stack_cm_from_parts(*T._preamble(s, li), cfg)
    )(b, l)[:, :, ::97, ::97])
    components = [
        ("preamble_lut_hist_x8", 8 * mp_scene,
         lambda: pre_fn(bd, ld)),
        ("preamble_plus_stack_x8", 8 * mp_scene,
         lambda: stack_fn(bd, ld)),
        ("forest_inference_2.88Mpx", 8 * mp_scene,
         lambda: forest_labels_pallas(gf, x_cm, block_n=bn)
         if bn and jax.default_backend() == "tpu"
         else T.gemm_labels_cm(gf, x_cm)),
        ("turbo_full_x8", 8 * mp_scene,
         lambda: T.classify_scenes_turbo(bd, ld, gf, cfg)),
        ("kmeans_turbo_x1", mp_scene,
         lambda: T.kmeans_scenes_turbo(a1, lut1, cfg=cfg)),
        ("rule_based_turbo_x1", mp_scene,
         lambda: T.rule_based_scenes_turbo(a1, lut1, cfg)),
    ]
    for name, mp, f in components:
        try:
            dt = enqn(f, args.reps)
            mps = mp / dt
            print(json.dumps({
                "component": name, "ms": round(dt * 1e3, 2),
                "mp_per_s": round(mps, 1),
                "vs_baseline": round(mps / BASELINE_MP_PER_S, 1)}),
                flush=True)
        except Exception as e:   # keep the table going
            print(json.dumps({"component": name,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
