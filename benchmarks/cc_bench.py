#!/usr/bin/env python3
"""Isolate the rule batch's connected-component propagation cost.

The round-4 split of `rule_based_scenes_turbo_batch` at batch 8 put the
two `ccmin_prop_pallas` calls (24-mask + 8-mask tall stacks) at 24.5 of
45.96 ms. This harness measures them on the REAL masks the batch
produces (thresholds + closings of the bundled scene), so seed / kernel
experiments (round-5 VERDICT #2) A/B against the truth, not synthetic
blobs.

    python benchmarks/cc_bench.py [--reps 20]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from benchmarks._common import enqueue_n, fetch_one  # noqa: E402


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
                                                       FeatureStageConfig,
                                                       RuleBasedConfig)
    from rs_image_segmentation_tpu.io.tiff import read_tiff
    from rs_image_segmentation_tpu.ops.components import (
        remove_small_components_batch)
    from rs_image_segmentation_tpu.ops.morphology import closing
    from rs_image_segmentation_tpu.ops.threshold import threshold_binary
    from rs_image_segmentation_tpu.pipeline import turbo as T
    from rs_image_segmentation_tpu.pipeline.preprocess import (
        build_stretch_stats)

    arr, _ = read_tiff("/root/reference/data/raw/AA.tif")
    cal = CalibrationConfig()
    cfg = FeatureStageConfig()
    rc = RuleBasedConfig()
    gains, biases = np.asarray(cal.gains), np.asarray(cal.biases)
    b = 8
    # vary scenes slightly (rolls) so the batch isn't 8 identical masks
    batch = np.stack([np.roll(arr, 5 * i, axis=2) for i in range(b)])
    stats = [build_stretch_stats(s, gains, biases) for s in batch]
    luts = jnp.asarray(np.stack([p[0] for p in stats]).astype(np.uint8))
    sps = jnp.asarray(np.stack([p[1] for p in stats]))
    hists = jnp.asarray(np.stack([p[2] for p in stats]))
    bd = jnp.asarray(batch)

    @jax.jit
    def front(scenes_u8, luts_u8, sps_, hists_):
        nd = jax.vmap(lambda s, l, p, hh: T._rule_front(s, l, cfg, p, hh))(
            scenes_u8, luts_u8, sps_, hists_)
        ndvi, ndwi, mndwi, ndbi = nd
        veg = threshold_binary(ndvi, rc.ndvi_threshold)
        water = threshold_binary(mndwi, rc.mndwi_threshold)
        built = (threshold_binary(ndbi, rc.ndbi_threshold).astype(bool)
                 & threshold_binary(ndvi, rc.ndvi_threshold_for_builtup,
                                    above=False).astype(bool)
                 ).astype(jnp.uint8)
        veg = closing(veg, 3, shape="ellipse")
        water = closing(water, 3, shape="ellipse")
        built = closing(built, 5, shape="ellipse")
        return jnp.concatenate([veg, water, built])

    stack3 = front(bd, luts, sps, hists)          # (24, 600, 600)
    stack3 = jnp.asarray(np.asarray(stack3))      # resident, detached
    h, w = stack3.shape[1:]
    area = h * w
    min_areas3 = jnp.concatenate([
        jnp.full((b,), int(area * rc.veg_min_area_frac), jnp.int32),
        jnp.full((b,), int(area * rc.water_min_area_frac), jnp.int32),
        jnp.full((b,), int(area * rc.builtup_min_area_frac), jnp.int32)])

    # a stand-in bareland stack: the remainder mask after the paint —
    # approximate with (not veg/water/built) of one run, 8 masks
    kept = remove_small_components_batch(stack3, min_areas3)
    fetch_one(kept)
    bare = jnp.asarray(
        1 - np.asarray(kept[:b]) | np.asarray(kept[b:2 * b])
        | np.asarray(kept[2 * b:]))
    bare = jnp.asarray((np.asarray(bare) == 1).astype(np.uint8))
    min_areas1 = jnp.full((b,), int(area * rc.bareland_min_area_frac),
                          jnp.int32)

    # run counts for context
    for name, st in [("stack3", np.asarray(stack3)), ("bare", np.asarray(bare))]:
        fg = st != 0
        starts = fg & ~np.pad(fg, ((0, 0), (0, 0), (1, 0)))[:, :, :w]
        print(json.dumps({"stack": name, "masks": int(st.shape[0]),
                          "fg_frac": round(float(fg.mean()), 4),
                          "max_runs_per_mask":
                              int(starts.sum(axis=(1, 2)).max())}),
              flush=True)

    from rs_image_segmentation_tpu.ops import components as C

    def seeded_ids(masks):
        """The id-prep part of remove_small_components_batch (host copy of
        the seeding math) -> (tall, rel0) device arrays."""
        m = masks.shape[0]
        hs = h + 1
        tall = jnp.pad(masks, ((0, 0), (0, 1), (0, 0))).reshape(m * hs, w)
        fg = tall != 0
        left_fg = jnp.pad(fg, ((0, 0), (1, 0)))[:, :w]
        starts = fg & ~left_fg
        s32 = starts.astype(jnp.int32)
        row_tot = jnp.sum(s32, axis=1)
        row_off = jnp.cumsum(row_tot) - row_tot
        r0 = jnp.cumsum(s32, axis=1) + row_off[:, None]
        base = (r0 - s32).reshape(m, hs, w)[:, 0, 0]
        rel0 = (r0.reshape(m, hs, w) - 1
                - base[:, None, None]).reshape(m * hs, w)
        return tall, rel0

    from rs_image_segmentation_tpu.ops.pallas_kernels import ccmin_prop_pallas

    tall3, rel3 = seeded_ids(stack3)
    tall3, rel3 = jnp.asarray(np.asarray(tall3)), jnp.asarray(np.asarray(rel3))
    tall1, rel1 = seeded_ids(bare)
    tall1, rel1 = jnp.asarray(np.asarray(tall1)), jnp.asarray(np.asarray(rel1))

    # correctness first: seed/kernel variants must be bit-identical
    ref3 = np.asarray(ccmin_prop_pallas(tall3, rel3))
    for name, kw in [("coarse4", dict(coarse=4)),
                     ("nocache", dict(cache_masks=False)),
                     ("nocache_coarse4",
                      dict(cache_masks=False, coarse=4))]:
        got = np.asarray(ccmin_prop_pallas(tall3, rel3, **kw))
        print(json.dumps({"check": f"{name}_bit_identical",
                          "ok": bool((got == ref3).all())}), flush=True)

    # tiered hist/keep (lax.cond on the batch's max id) must match the
    # uncapped XLA scatter/gather route exactly
    got_t = np.asarray(remove_small_components_batch(stack3, min_areas3))
    ref_x = np.asarray(remove_small_components_batch(stack3, min_areas3,
                                                     impl="xla"))
    print(json.dumps({"check": "tiered_batch_vs_xla",
                      "ok": bool((got_t == ref_x).all())}), flush=True)

    entries = [
        ("ccmin_prop_24masks", lambda: ccmin_prop_pallas(tall3, rel3)),
        ("ccmin_prop_24masks_coarse4",
         lambda: ccmin_prop_pallas(tall3, rel3, coarse=4)),
        ("ccmin_prop_24masks_nocache",
         lambda: ccmin_prop_pallas(tall3, rel3, cache_masks=False)),
        ("ccmin_prop_24masks_nocache_coarse4",
         lambda: ccmin_prop_pallas(tall3, rel3, cache_masks=False,
                                   coarse=4)),
        ("ccmin_prop_8masks", lambda: ccmin_prop_pallas(tall1, rel1)),
        ("ccmin_prop_8masks_nocache",
         lambda: ccmin_prop_pallas(tall1, rel1, cache_masks=False)),
        ("remove_small_batch_24", lambda: remove_small_components_batch(
            stack3, min_areas3)),
        ("remove_small_batch_8", lambda: remove_small_components_batch(
            bare, min_areas1)),
        ("rule_batch_full", lambda: T.rule_based_scenes_turbo_batch(
            bd, luts, cfg, stretch_params=sps, stretch_hists=hists)),
    ]
    for name, f in entries:
        try:
            dt = enqueue_n(f, args.reps)
            print(json.dumps({"component": name,
                              "ms": round(dt * 1e3, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"component": name,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
