"""Cross-device stage pipelining (PP): features on one device, classifier
on another, with scenes streaming through both.

SURVEY.md §2.7 PP row: the reference's stages are sequential scripts
communicating via files. Here the two compute stages of the scene
pipeline are PLACED on different devices:

    device A : stage-2 feature extraction of scene i+1
    device B : stage-3 forest prediction of scene i  (+ A->B activation
               transfer of the 19-channel stack between them)

JAX dispatch is asynchronous and computation follows data placement, so
issuing the per-scene chains back-to-back overlaps A's work on scene
i+1 with B's work on scene i automatically — the host never blocks
until the final fetch. Wall-clock approaches
max(sum(stage2), sum(stage3)) + pipeline fill, instead of the serial
sum (measured in tests/test_pipeline_pp.py on a 2-device CPU mesh).

On real hardware the A->B hop rides ICI; the same placement pattern
extends to longer chains (one stage per device) or combines with the
data-parallel batch axis (half the scenes on each A/B pair).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rs_image_segmentation_tpu.core.config import FeatureStageConfig
from rs_image_segmentation_tpu.models.forest import (GemmForest, _gemm_chunk,
                                                     gemm_forest_predict)
from rs_image_segmentation_tpu.pipeline.features import hierarchical_stack_fused


def pp_classify_scenes(scenes: Sequence[np.ndarray], gf: GemmForest,
                       cfg: FeatureStageConfig = FeatureStageConfig(),
                       devices: Optional[Sequence] = None,
                       ) -> List[np.ndarray]:
    """Classify scenes with stage 2 on ``devices[0]`` and stage 3 on
    ``devices[1]``. Returns the per-scene (H, W) label maps (host)."""
    devices = list(devices) if devices is not None else jax.devices()[:2]
    if len(devices) < 2:
        raise ValueError("stage pipelining needs >= 2 devices")
    dev_a, dev_b = devices[0], devices[1]
    chunk = _gemm_chunk(gf.path.shape[1])
    gf_b = jax.tree_util.tree_map(lambda t: jax.device_put(t, dev_b), gf)

    stage2 = jax.jit(lambda s: hierarchical_stack_fused(s, cfg))

    def stage3(stack):
        pred = gemm_forest_predict(gf_b, stack.reshape(-1, stack.shape[-1]),
                                   chunk)
        return pred.reshape(stack.shape[:2])

    stage3 = jax.jit(stage3)

    preds = []
    for arr in scenes:
        s = jax.device_put(jnp.asarray(arr, jnp.float32), dev_a)
        stack = stage2(s)                        # runs on A (async)
        stack_b = jax.device_put(stack, dev_b)   # A -> B activation hop
        preds.append(stage3(stack_b))            # runs on B (async)
    # single drain at the end: everything above pipelined
    return [np.asarray(p) for p in preds]
