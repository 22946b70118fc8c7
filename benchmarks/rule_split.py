"""One-off stage-split profile of rule_based_scenes_turbo_batch.

Measures cumulative prefixes of the rule batch program (front ->
thresholds+closings -> min-area pass 1 -> openings+paint -> bareland
close -> bareland min-area -> full) so each stage's marginal cost is
the difference of adjacent rows. Protocol: enqueue-N + fetch-last with
RTT subtracted (benchmarks/_common.enqueue_n).
"""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))
from _common import enqueue_n, load_bundled_forest  # noqa: E402


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from rs_image_segmentation_tpu.core.config import RuleBasedConfig
    from rs_image_segmentation_tpu.ops.components import (
        remove_small_components_batch)
    from rs_image_segmentation_tpu.ops.morphology import closing, opening
    from rs_image_segmentation_tpu.ops.threshold import threshold_binary
    from rs_image_segmentation_tpu.pipeline import turbo as T
    from rs_image_segmentation_tpu.pipeline.preprocess import (
        build_stretch_stats)

    arr, cal, cfg, forest, depth, gf = load_bundled_forest()
    gains, biases = np.asarray(cal.gains), np.asarray(cal.biases)
    batch = np.ascontiguousarray(np.broadcast_to(arr, (8,) + arr.shape)).copy()
    stats = [build_stretch_stats(s, gains, biases) for s in batch]
    luts = np.stack([p[0] for p in stats]).astype(np.uint8)
    sps = np.stack([p[1] for p in stats])
    hists = np.stack([p[2] for p in stats])
    bd, ld = jnp.asarray(batch), jnp.asarray(luts)
    sd, hd = jnp.asarray(sps), jnp.asarray(hists)
    rc = RuleBasedConfig()
    b, c, h, w = batch.shape
    area = h * w

    def front(scenes, luts_, sp, hh):
        return jax.vmap(lambda s, l, p, hhh: T._rule_front(
            s, l, cfg, p, hhh))(scenes, luts_, sp, hh)

    def upto(stage):
        @jax.jit
        def f(scenes, luts_, sp, hh):
            ndvi, ndwi, mndwi, ndbi = front(scenes, luts_, sp, hh)
            if stage == "front":
                return ndvi
            veg = threshold_binary(ndvi, rc.ndvi_threshold)
            water = threshold_binary(mndwi, rc.mndwi_threshold)
            built = (threshold_binary(ndbi, rc.ndbi_threshold).astype(bool)
                     & threshold_binary(ndvi, rc.ndvi_threshold_for_builtup,
                                        above=False).astype(bool)
                     ).astype(jnp.uint8)
            veg = closing(veg, 3, shape="ellipse")
            water = closing(water, 3, shape="ellipse")
            built = closing(built, 5, shape="ellipse")
            if stage == "close":
                return veg + water + built
            stack3 = jnp.concatenate([veg, water, built])
            min_areas = jnp.concatenate([
                jnp.full((b,), int(area * rc.veg_min_area_frac), jnp.int32),
                jnp.full((b,), int(area * rc.water_min_area_frac), jnp.int32),
                jnp.full((b,), int(area * rc.builtup_min_area_frac),
                         jnp.int32)])
            kept = remove_small_components_batch(stack3, min_areas)
            if stage == "minarea1":
                return kept
            veg = opening(kept[:b], 3, shape="ellipse")
            water = opening(kept[b:2 * b], 3, shape="ellipse")
            built = opening(kept[2 * b:], 5, shape="ellipse")
            out = jnp.zeros((b, h, w), jnp.uint8)
            out = jnp.where(built == 1, 3, out)
            out = jnp.where(veg == 1, 1, out)
            out = jnp.where(water == 1, 2, out)
            if stage == "paint":
                return out
            bare = ((out == 0)
                    & (jnp.nan_to_num(ndvi) > rc.bareland_ndvi_low)
                    & (jnp.nan_to_num(ndvi) < rc.bareland_ndvi_high)
                    & (jnp.nan_to_num(ndbi) > rc.bareland_ndbi_low)
                    & (jnp.nan_to_num(ndbi) < rc.bareland_ndbi_high)
                    ).astype(jnp.uint8)
            bare = closing(bare, 3, shape="ellipse")
            if stage == "bareclose":
                return bare
            bare = remove_small_components_batch(
                bare, jnp.full((b,), int(area * rc.bareland_min_area_frac),
                               jnp.int32))
            if stage == "bareminarea":
                return bare
            bare = opening(bare, 3, shape="ellipse")
            out = jnp.where((bare == 1) & (out == 0), 4, out)
            return out.astype(jnp.uint8)
        return f

    stages = ["front", "close", "minarea1", "paint", "bareclose",
              "bareminarea", "full"]
    prev = 0.0
    for st in stages:
        f = upto(st)
        dt = enqueue_n(lambda: f(bd, ld, sd, hd), n=20, repeats=3) * 1e3
        print(f"{st:12s} cumulative {dt:7.2f} ms/batch  marginal "
              f"{dt - prev:7.2f}")
        prev = dt
    full = enqueue_n(lambda: T.rule_based_scenes_turbo_batch(
        bd, ld, cfg, stretch_params=sd, stretch_hists=hd),
        n=20, repeats=3) * 1e3
    print(f"{'shipping':12s} cumulative {full:7.2f} ms/batch  "
          f"({full / 8:.3f} ms/scene)")


if __name__ == "__main__":
    main()
