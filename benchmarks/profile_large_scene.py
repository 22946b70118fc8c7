#!/usr/bin/env python3
"""Profile the 36 MP large-scene path stage by stage on the real chip.

Decomposes `large_scene_warm_e2e_s` (bench.py protocol) into:
  - monolithic 252 MB H2D
  - chunked H2D aggregate rate (is pipelined put faster/slower?)
  - preprocess LUT+hist kernel (resident)
  - _global_passes (B/C merged pass)
  - pass D classify loop (incl. label D2H)
so the round-5 overlap work (VERDICT #7) attacks the real costs.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

from rs_image_segmentation_tpu.core.config import (CalibrationConfig,
                                                   FeatureStageConfig)
from rs_image_segmentation_tpu.io.tiff import read_tiff
from rs_image_segmentation_tpu.models.forest import _gemm_for
from rs_image_segmentation_tpu.pipeline.features import hierarchical_stack_fused
from rs_image_segmentation_tpu.pipeline.preprocess import preprocess_bands
from rs_image_segmentation_tpu.tools.supervised import (
    train_random_forest_from_samples)
from rs_image_segmentation_tpu.tools.sampling import SampleSet

SCENE = "/root/reference/data/raw/AA.tif"
SAMPLES = "/root/reference/data/samples.pkl"
REPS = 10


def _tiled_scene(aa, reps, roll0):
    h = w = 600 * reps
    big = np.empty((7, h, w), np.uint8)
    for i in range(reps):
        for j in range(reps):
            big[:, i * 600:(i + 1) * 600, j * 600:(j + 1) * 600] = np.roll(
                aa, roll0 + 13 * (i * reps + j), axis=2)
    return big


def sync(o):
    np.asarray(jax.device_get(jnp.ravel(o)[-1:]))


def main():
    arr, _ = read_tiff(SCENE)
    cal = CalibrationConfig()
    cfg = FeatureStageConfig()
    gains = np.asarray(cal.gains)
    biases = np.asarray(cal.biases)

    pre0 = preprocess_bands(arr, gains, biases)
    stack0 = np.asarray(hierarchical_stack_fused(pre0.astype(jnp.float32)))
    coords, labels = SampleSet.load(SAMPLES)
    x_train = np.nan_to_num(stack0[coords[:, 1], coords[:, 0], :])
    forest, depth = train_random_forest_from_samples(x_train, labels)
    gf = _gemm_for(forest, stack0.shape[-1])

    from rs_image_segmentation_tpu.pipeline.large_scene import (
        classify_large_scene, preprocess_large, _global_passes)

    big = _tiled_scene(arr, REPS, 0)
    print(f"scene: {big.shape} = {big.nbytes/1e6:.0f} MB", flush=True)

    # ---- warm all programs once (first pass = compiles)
    t0 = time.perf_counter()
    pre_l, hists_l = preprocess_large(big, cal, return_device=True,
                                      return_hist=True)
    jax.device_get(pre_l[0, :1, :1])
    out_l = classify_large_scene(pre_l, gf, cfg, tile_rows=504, hists=hists_l)
    print(f"cold first scene e2e: {time.perf_counter()-t0:.2f}s", flush=True)
    del pre_l, hists_l, out_l

    big2 = _tiled_scene(arr, REPS, 7)

    # ---- 1. monolithic H2D
    for tag, payload in [("monolithic 252MB", big2)]:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            d = jax.device_put(payload)
            sync(d)
            ts.append(time.perf_counter() - t0)
            del d
        print(f"H2D {tag}: min {min(ts):.2f}s = "
              f"{payload.nbytes/1e6/min(ts):.0f} MB/s  {ts}", flush=True)

    # ---- 2. chunked H2D (sequential puts, one stream)
    for rows in (600, 1200, 3000):
        chunks = [np.ascontiguousarray(big2[:, y:y + rows])
                  for y in range(0, big2.shape[1], rows)]
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            ds = [jax.device_put(c) for c in chunks]
            sync(ds[-1])
            ts.append(time.perf_counter() - t0)
            del ds
        print(f"H2D chunked rows={rows} ({len(chunks)} puts): min {min(ts):.2f}s"
              f" = {big2.nbytes/1e6/min(ts):.0f} MB/s  {ts}", flush=True)

    # ---- 3. stage decomposition of warm e2e
    t0 = time.perf_counter()
    pre_l2, hists_l2 = preprocess_large(big2, cal, return_device=True,
                                        return_hist=True)
    jax.device_get(pre_l2[0, :1, :1])
    t_pre = time.perf_counter() - t0
    print(f"preprocess_large (H2D + LUT/hist kernel, forced): {t_pre:.2f}s",
          flush=True)

    t0 = time.perf_counter()
    g = _global_passes(None if False else np.empty((7, big2.shape[1],
                                                    big2.shape[2]), np.uint8)
                       if False else big2, cfg, 504,
                       src=pre_l2, hists=hists_l2)
    t_bc = time.perf_counter() - t0
    print(f"_global_passes (B/C): {t_bc:.2f}s", flush=True)

    t0 = time.perf_counter()
    out = classify_large_scene(pre_l2, gf, cfg, tile_rows=504, hists=hists_l2)
    t_cls = time.perf_counter() - t0
    print(f"classify_large_scene (B/C again + D + D2H): {t_cls:.2f}s", flush=True)
    print(f"  -> implied pass D + D2H: {t_cls - t_bc:.2f}s", flush=True)
    mp = big2.shape[1] * big2.shape[2] / 1e6
    print(f"warm e2e = {t_pre + t_cls:.2f}s = {mp/(t_pre+t_cls):.2f} MP/s",
          flush=True)

    # ---- 4. label D2H alone
    lab_d = jnp.asarray(out.astype(np.uint8))
    sync(lab_d)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(lab_d)
        ts.append(time.perf_counter() - t0)
    print(f"label D2H 36MB uint8: min {min(ts):.2f}s  {ts}", flush=True)

    os._exit(0)


if __name__ == "__main__":
    main()
