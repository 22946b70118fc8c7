"""Shared setup/measurement helpers for the benchmark scripts.

``bench.py`` at the repo root intentionally does NOT import this module:
the driver runs it standalone and it must stay self-contained; its copy
of the protocol is the reference implementation (docs/BENCHMARKS.md)."""

from __future__ import annotations

import time

import numpy as np

BASELINE_MP_PER_S = 0.058
SCENE = "/root/reference/data/raw/AA.tif"
SAMPLES = "/root/reference/data/samples.pkl"


def load_bundled_forest():
    """Bundled scene + a forest trained exactly like the reference's
    supervised workflow. Returns (arr, cal, cfg, forest, depth, gf);
    raises if the forest exceeds the GEMM leaf cap (cannot happen for
    the 33-sample bundled training set)."""
    import jax.numpy as jnp

    from rs_image_segmentation_tpu.core.config import (CalibrationConfig,
                                                       FeatureStageConfig)
    from rs_image_segmentation_tpu.io.tiff import read_tiff
    from rs_image_segmentation_tpu.models.forest import _gemm_for
    from rs_image_segmentation_tpu.pipeline.features import (
        hierarchical_stack_fused)
    from rs_image_segmentation_tpu.pipeline.preprocess import preprocess_bands
    from rs_image_segmentation_tpu.tools.sampling import SampleSet
    from rs_image_segmentation_tpu.tools.supervised import (
        train_random_forest_from_samples)

    arr, _ = read_tiff(SCENE)
    cal = CalibrationConfig()
    cfg = FeatureStageConfig()
    pre = preprocess_bands(arr, np.asarray(cal.gains), np.asarray(cal.biases))
    stack = np.asarray(hierarchical_stack_fused(pre.astype(jnp.float32)))
    coords, labels = SampleSet.load(SAMPLES)
    x = np.nan_to_num(stack[coords[:, 1], coords[:, 0], :])
    forest, depth = train_random_forest_from_samples(x, labels)
    gf = _gemm_for(forest, 19)
    if gf is None:
        raise RuntimeError("bundled forest exceeded the GEMM leaf cap — "
                           "benchmark setup assumption violated")
    return arr, cal, cfg, forest, depth, gf


def fetch_one(o):
    """Force completion of everything enqueued before ``o`` (programs run
    in launch order; block_until_ready does not block on this tunnel)."""
    import jax
    import jax.numpy as jnp
    leaf = jax.tree.leaves(o)[0]
    return np.asarray(jax.device_get(jnp.ravel(leaf)[-1:]))


def enqueue_n(f, n: int = 20, repeats: int = 3) -> float:
    """Best per-iteration wall time of ``f`` via enqueue-N + fetch-last,
    with one measured RPC round-trip subtracted (docs/BENCHMARKS.md)."""
    o = f()
    fetch_one(o)
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fetch_one(o)
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [f() for _ in range(n)]
        fetch_one(outs[-1])
        d = (time.perf_counter() - t0 - rtt) / n
        best = d if best is None else min(best, d)
    return best
