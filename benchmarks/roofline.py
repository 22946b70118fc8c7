#!/usr/bin/env python3
"""Roofline accounting for the three method programs (VERDICT r4 #4).

For each stage: XLA's own cost model (``compiled.cost_analysis()`` —
flops + bytes accessed) or a hand-counted Pallas traffic model, against
the measured enqueue-N time, expressed as achieved HBM bandwidth and
MXU throughput vs TPU v5e peaks (819 GB/s HBM, 197 TFLOP/s bf16 MXU;
f32 `precision=HIGHEST` dots run as 6 MXU passes -> ~32.8 TFLOP/s
effective peak).

"% of roofline" here = max(bw_frac, mxu_frac): a stage at >=70 % of
EITHER ceiling has little headroom left; a stage far below both is
latency-, VPU-, or serialization-bound and is where optimization pays.

    python benchmarks/roofline.py [--reps 20]

Results and the per-stage byte/flop models are written up in
docs/BENCHMARKS.md ("Roofline" section).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from benchmarks._common import enqueue_n  # noqa: E402

HBM_PEAK = 819e9          # bytes/s, TPU v5e
MXU_BF16_PEAK = 197e12    # FLOP/s
MXU_F32H_PEAK = MXU_BF16_PEAK / 6  # precision=HIGHEST: 6-pass f32 dots


def report(name, dt, bytes_acc=None, flops=None, note=""):
    row = {"stage": name, "ms": round(dt * 1e3, 3)}
    frac = 0.0
    if bytes_acc:
        bw = bytes_acc / dt
        row["gb_per_s"] = round(bw / 1e9, 1)
        row["hbm_frac"] = round(bw / HBM_PEAK, 3)
        frac = max(frac, bw / HBM_PEAK)
    if flops:
        fl = flops / dt
        row["tflop_per_s"] = round(fl / 1e12, 2)
        row["mxu_bf16_frac"] = round(fl / MXU_BF16_PEAK, 3)
        frac = max(frac, fl / MXU_BF16_PEAK)
    row["roofline_frac"] = round(frac, 3)
    if note:
        row["note"] = note
    print(json.dumps(row), flush=True)
    return row


def cost(jitted_call):
    """flops + bytes accessed from XLA's cost model for an already-traced
    call: returns (flops, bytes) or (None, None)."""
    try:
        ca = jitted_call.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return ca.get("flops"), ca.get("bytes accessed")
    except Exception:
        return None, None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from benchmarks._common import load_bundled_forest
    from rs_image_segmentation_tpu.models.forest import forest_tree_plan
    from rs_image_segmentation_tpu.ops.pallas_kernels import (
        forest_block_n, forest_labels_pallas)
    from rs_image_segmentation_tpu.pipeline import turbo as T
    from rs_image_segmentation_tpu.pipeline.preprocess import (
        build_stretch_stats)

    arr, cal, cfg, forest, depth, gf = load_bundled_forest()
    gains, biases = np.asarray(cal.gains), np.asarray(cal.biases)
    b = 8
    batch = np.stack([np.roll(arr, 5 * i, axis=2) for i in range(b)])
    stats = [build_stretch_stats(s, gains, biases) for s in batch]
    luts = jnp.asarray(np.stack([p[0] for p in stats]).astype(np.uint8))
    sps = jnp.asarray(np.stack([p[1] for p in stats]))
    hists = jnp.asarray(np.stack([p[2] for p in stats]))
    bd = jnp.asarray(batch)
    n_px = b * arr.shape[1] * arr.shape[2]        # 2.88M

    # ---------------- RF program stages ----------------
    pre_fn = jax.jit(lambda s, l, p, hh: jax.vmap(
        lambda si, li, pi, hi: T._preamble(si, li, pi, hi)[0]
    )(s, l, p, hh))
    stack_fn = jax.jit(lambda s, l, p, hh: jax.vmap(
        lambda si, li, pi, hi: T._stack_cm_from_parts(
            *T._preamble(si, li, pi, hi), cfg))(s, l, p, hh))

    # preamble (Pallas): reads u8 scene 7N, writes f32 stretched 28N
    dt = enqueue_n(lambda: pre_fn(bd, luts, sps, hists), args.reps)
    report("rf.preamble_pallas_fp", dt, bytes_acc=35 * n_px,
           note="hand model: 7N u8 in + 28N f32 out")

    # preamble+stack: XLA cost model covers the stack graph; the Pallas
    # preamble inside shows as a custom call (operand bytes only)
    tr = stack_fn.lower(bd, luts, sps, hists).compile()
    fl, by = cost(tr)
    dt_stack = enqueue_n(lambda: stack_fn(bd, luts, sps, hists), args.reps)
    report("rf.preamble+stack", dt_stack, bytes_acc=by, flops=fl,
           note="XLA cost model")

    plan = forest_tree_plan(gf)
    bn = forest_block_n(gf.selector.shape[1], gf.leaf_dist.shape[0],
                        plan=plan)
    rng = np.random.default_rng(0)
    x_cm = jnp.asarray(rng.random((19, n_px)).astype(np.float32))
    m, lv = gf.selector.shape[1], gf.leaf_dist.shape[0]
    # flops: sel (M,19)@(19,N) f32-HIGHEST + path (L,M)@(M,N) bf16 +
    # dist (C,L)@(L,N); traffic: 76N in + 4N out (weights VMEM-resident)
    # plan entries: (m_off, m_cnt, l_off, l_cnt) per tree group
    lm = (sum(g[3] * g[1] for g in plan) if plan else lv * m)
    fl_forest = (m * 19 + lm + gf.leaf_dist.shape[1] * lv) * n_px * 2
    dt = enqueue_n(lambda: forest_labels_pallas(gf, x_cm, block_n=bn,
                                                plan=plan), args.reps)
    report("rf.forest_pallas", dt, bytes_acc=80 * n_px, flops=fl_forest,
           note=f"hand model; M={m} L={lv} plan_lm={lm}")

    full = lambda: T.classify_scenes_turbo(bd, luts, gf, cfg,
                                           stretch_params=sps,
                                           stretch_hists=hists)
    dt_full = enqueue_n(full, args.reps)
    report("rf.full_turbo_x8", dt_full,
           note=f"{dt_full / b * 1e3:.3f} ms/scene")

    # ---------------- rule program stages ----------------
    rb = lambda: T.rule_based_scenes_turbo_batch(bd, luts, cfg,
                                                 stretch_params=sps,
                                                 stretch_hists=hists)
    dt_rb = enqueue_n(rb, args.reps)
    report("rule.full_batch_x8", dt_rb,
           note=f"{dt_rb / b * 1e3:.3f} ms/scene")

    # ---------------- kmeans program stages ----------------
    km = lambda: T.kmeans_scenes_turbo_batch(bd, luts, cfg=cfg,
                                             stretch_params=sps,
                                             stretch_hists=hists)
    dt_km = enqueue_n(km, args.reps)
    report("kmeans.full_batch_x8", dt_km,
           note=f"{dt_km / b * 1e3:.3f} ms/scene")

    os._exit(0)


if __name__ == "__main__":
    main()
