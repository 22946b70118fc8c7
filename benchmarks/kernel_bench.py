#!/usr/bin/env python3
"""Component-level device benchmarks for the turbo pipeline.

Measures each fused program with the forced-completion protocol
(enqueue-N, fetch one element of the last output, subtract one measured
RPC round-trip — see docs/BENCHMARKS.md: `block_until_ready` does not
block on this environment's tunnel). Prints one JSON line per component
so rounds can A/B kernels with a single command:

    python benchmarks/kernel_bench.py [--reps 20]

Components: LUT+histogram preamble (Pallas bilinear), 19-channel stack
core, fused forest inference (Pallas), full turbo program (incl. the
host-histogram fast path), the single-scene kmeans / rule-based fused
routes, and the batch-8 method programs (incl. shared-fit kmeans).
"""

import argparse
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from benchmarks._common import (BASELINE_MP_PER_S, enqueue_n,  # noqa: E402
                                load_bundled_forest)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from rs_image_segmentation_tpu.ops.pallas_kernels import (
        forest_block_n, forest_labels_pallas)
    from rs_image_segmentation_tpu.pipeline import turbo as T
    from rs_image_segmentation_tpu.pipeline.preprocess import (
        build_stretch_lut, build_stretch_stats)

    arr, cal, cfg, forest, depth, gf = load_bundled_forest()
    gains, biases = np.asarray(cal.gains), np.asarray(cal.biases)
    mp_scene = arr.shape[1] * arr.shape[2] / 1e6

    batch = np.ascontiguousarray(np.broadcast_to(arr, (8,) + arr.shape)).copy()
    stats = [build_stretch_stats(s, gains, biases) for s in batch]
    luts = np.stack([p[0] for p in stats]).astype(np.uint8)
    sps = np.stack([p[1] for p in stats])
    hists = np.stack([p[2] for p in stats])
    bd, ld, sd = jnp.asarray(batch), jnp.asarray(luts), jnp.asarray(sps)
    hd = jnp.asarray(hists)
    lut1 = jnp.asarray(luts[0])
    a1 = jnp.asarray(arr)
    rng = np.random.default_rng(0)
    x_cm = jnp.asarray(rng.random((19, 8 * arr.shape[1] * arr.shape[2])
                                  ).astype(np.float32))

    from rs_image_segmentation_tpu.models.forest import forest_tree_plan

    bn = forest_block_n(gf.selector.shape[1], gf.leaf_dist.shape[0])
    use_pallas_forest = bool(bn) and jax.default_backend() == "tpu"
    forest_fn = (functools.partial(forest_labels_pallas, gf, x_cm, block_n=bn)
                 if use_pallas_forest
                 else functools.partial(T.gemm_labels_cm, gf, x_cm))
    plan = forest_tree_plan(gf)
    bn_g = forest_block_n(gf.selector.shape[1], gf.leaf_dist.shape[0],
                          plan=plan) if plan else 0
    forest_grouped_fn = (
        functools.partial(forest_labels_pallas, gf, x_cm, block_n=bn_g,
                          plan=plan)
        if use_pallas_forest and plan and bn_g
        else functools.partial(T.gemm_labels_cm, gf, x_cm, plan=plan))
    pre_fn = jax.jit(lambda b, l: jax.vmap(
        lambda s, li: T._preamble(s, li)[0])(b, l))
    pre_fp_fn = jax.jit(lambda b, l, p: jax.vmap(
        lambda s, li, pi: T._preamble(s, li, pi)[0])(b, l, p))
    stack_fn = jax.jit(lambda b, l: jax.vmap(
        lambda s, li: T._stack_cm_from_parts(*T._preamble(s, li), cfg)
    )(b, l)[:, :, ::97, ::97])
    components = [
        ("preamble_lut_hist_x8", 8 * mp_scene, lambda: pre_fn(bd, ld)),
        ("preamble_fixedpoint_x8", 8 * mp_scene,
         lambda: pre_fp_fn(bd, ld, sd)),
        ("preamble_plus_stack_x8", 8 * mp_scene, lambda: stack_fn(bd, ld)),
        ("forest_inference_2.88Mpx", 8 * mp_scene, forest_fn),
        ("forest_inference_grouped_2.88Mpx", 8 * mp_scene,
         forest_grouped_fn),
        ("turbo_full_x8", 8 * mp_scene,
         lambda: T.classify_scenes_turbo(bd, ld, gf, cfg)),
        ("turbo_full_fixedpoint_x8", 8 * mp_scene,
         lambda: T.classify_scenes_turbo(bd, ld, gf, cfg,
                                         stretch_params=sd)),
        ("turbo_full_hosthist_x8", 8 * mp_scene,
         lambda: T.classify_scenes_turbo(bd, ld, gf, cfg,
                                         stretch_params=sd,
                                         stretch_hists=hd)),
        ("kmeans_turbo_x1", mp_scene,
         lambda: T.kmeans_scenes_turbo(a1, lut1, cfg=cfg)),
        ("rule_based_turbo_x1", mp_scene,
         lambda: T.rule_based_scenes_turbo(a1, lut1, cfg)),
        ("kmeans_turbo_batch_x8", 8 * mp_scene,
         lambda: T.kmeans_scenes_turbo_batch(bd, ld, cfg=cfg,
                                             stretch_params=sd,
                                             stretch_hists=hd)),
        ("kmeans_turbo_batch_sharedfit_x8", 8 * mp_scene,
         lambda: T.kmeans_scenes_turbo_batch(bd, ld, cfg=cfg,
                                             stretch_params=sd,
                                             stretch_hists=hd,
                                             shared_fit=True)),
        ("rule_based_turbo_batch_x8", 8 * mp_scene,
         lambda: T.rule_based_scenes_turbo_batch(bd, ld, cfg,
                                                 stretch_params=sd,
                                                 stretch_hists=hd)),
    ]
    for name, mp, f in components:
        try:
            dt = enqueue_n(f, args.reps)
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
