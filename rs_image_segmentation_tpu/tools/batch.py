"""Multi-scene batch workflow: classify N scenes across a device mesh and
emit a GeoTIFF + accuracy report per scene (BASELINE config #5).

Scenes shard over the mesh's 'data' axis (parallel.sharded); on a single
chip the same code streams scenes through the one device with async
dispatch. Kappa reports are produced for scenes that come with a ROI.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from rs_image_segmentation_tpu.core.config import (CalibrationConfig,
                                                   FeatureStageConfig)
from rs_image_segmentation_tpu.io.tiff import read_tiff, write_tiff
from rs_image_segmentation_tpu.models.forest import (_gemm_chunk, _gemm_for,
                                                     gemm_forest_predict)
from rs_image_segmentation_tpu.pipeline.evaluate import evaluate_classification
from rs_image_segmentation_tpu.pipeline.features import hierarchical_stack_fused
from rs_image_segmentation_tpu.pipeline.preprocess import preprocess_bands


def run_batch_workflow(
    scene_paths: Sequence[str],
    forest,
    depth: int,
    output_dir: str,
    roi_paths: Optional[Sequence[Optional[str]]] = None,
    mesh: Optional[Mesh] = None,
    cal: CalibrationConfig = CalibrationConfig(),
    cfg: FeatureStageConfig = FeatureStageConfig(),
) -> List[Dict]:
    """Classify every scene; returns per-scene result dicts
    (path, class map path, metrics when a ROI was given)."""
    os.makedirs(output_dir, exist_ok=True)
    if roi_paths and len(roi_paths) != len(scene_paths):
        raise ValueError(f"{len(roi_paths)} roi_paths for "
                         f"{len(scene_paths)} scenes")
    roi_paths = roi_paths or [None] * len(scene_paths)
    gains = np.asarray(cal.gains)
    biases = np.asarray(cal.biases)

    scenes = []
    metas = []
    for p in scene_paths:
        arr, info = read_tiff(p)
        scenes.append(arr)
        metas.append(info.meta)

    shapes = {a.shape for a in scenes}
    results: List[Dict] = []

    gf = (_gemm_for(forest, 19)
          if len(shapes) == 1 and all(a.dtype == np.uint8 for a in scenes)
          else None)
    if gf is not None:
        # uniform uint8 scenes + GEMM-compilable forest -> the turbo path:
        # ONE device program per sub-batch (channel-major, sort-free,
        # gather-free; pipeline.turbo), optionally sharded over the mesh's
        # 'data' axis. Sub-batches bound memory: a (B,19,H,W) f32 stack
        # materializes per program, so B stays <= 8 per device.
        # Forests beyond GEMM_MAX_LEAVES (gf is None) take the streaming
        # traversal fallback below.
        from jax.sharding import NamedSharding, PartitionSpec as P
        from rs_image_segmentation_tpu.pipeline.preprocess import (
            build_stretch_lut)
        from rs_image_segmentation_tpu.pipeline.turbo import (
            classify_scenes_turbo)
        n_dev = mesh.devices.size if mesh is not None else 1
        sub = 8 * n_dev
        preds = []
        pending = []
        for i in range(0, len(scenes), sub):
            group = scenes[i:i + sub]
            real = len(group)
            if real < sub and i > 0:
                # pad a trailing partial group to the full sub-batch size so
                # it reuses the already-compiled program (a fresh compile
                # through the remote service costs minutes)
                group = list(group) + [group[-1]] * (sub - real)
            batch = np.stack(group)
            luts = np.stack([build_stretch_lut(a, gains, biases)
                             for a in group]).astype(np.uint8)
            if mesh is not None and len(group) % n_dev == 0:
                sh = NamedSharding(mesh, P("data"))
                batch_d = jax.device_put(jnp.asarray(batch), sh)
                luts_d = jax.device_put(jnp.asarray(luts), sh)
            else:
                batch_d, luts_d = jnp.asarray(batch), jnp.asarray(luts)
            pending.append(
                (classify_scenes_turbo(batch_d, luts_d, gf, cfg), real))
        for maps, real in pending:    # drain once: sub-batches pipeline
            preds.extend(np.asarray(maps)[:real])
    elif mesh is not None and len(shapes) == 1 and len(scenes) >= mesh.devices.size:
        # uniform shapes -> shard the batch over the mesh
        from rs_image_segmentation_tpu.parallel.sharded import (
            sharded_hierarchical_stack)
        batch = np.stack([np.asarray(preprocess_bands(a, gains, biases))
                          for a in scenes]).astype(np.float32)
        stacks = np.asarray(sharded_hierarchical_stack(
            jnp.asarray(batch), mesh, cfg))
        preds = []
        gf = _gemm_for(forest, stacks.shape[-1])
        chunk = _gemm_chunk(gf.path.shape[1])
        for s in stacks:
            pred = gemm_forest_predict(gf, jnp.asarray(s.reshape(-1, s.shape[-1])),
                                       chunk)
            preds.append(np.asarray(pred).reshape(s.shape[:2]))
    else:
        # stream scenes through the device (async dispatch pipelines them)
        gf = None
        pending = []
        for arr in scenes:
            pre = preprocess_bands(arr, gains, biases)
            stack = hierarchical_stack_fused(pre.astype(jnp.float32), cfg)
            if gf is None:
                gf = _gemm_for(forest, stack.shape[-1])
                chunk = _gemm_chunk(gf.path.shape[1])
            pred = gemm_forest_predict(gf, stack.reshape(-1, stack.shape[-1]),
                                       chunk)
            pending.append((pred, stack.shape[:2]))
        preds = [np.asarray(p).reshape(shp) for p, shp in pending]

    seen_stems: Dict[str, int] = {}
    for i, (path, pred, meta) in enumerate(zip(scene_paths, preds, metas)):
        stem = os.path.splitext(os.path.basename(path))[0]
        # disambiguate duplicate basenames (e.g. same-named scenes from
        # different directories) so outputs never overwrite each other
        n = seen_stems.get(stem, 0)
        seen_stems[stem] = n + 1
        if n:
            stem = f"{stem}_{n}"
        out_tif = os.path.join(output_dir, f"{stem}_class_map.tif")
        write_tiff(out_tif, pred.astype(np.uint8)[None], meta,
                   compression="lzw", tiled=True)
        entry = {"scene": path, "class_map": out_tif}
        if roi_paths[i]:
            roi = (np.load(roi_paths[i]) if roi_paths[i].endswith(".npy")
                   else read_tiff(roi_paths[i])[0][0])
            m = evaluate_classification(pred, roi)
            entry["overall_accuracy"] = m["overall_accuracy"]
            entry["kappa"] = m["kappa"]
            with open(os.path.join(output_dir, f"{stem}_report.txt"),
                      "w") as f:
                f.write(f"scene: {path}\nOA: {m['overall_accuracy']:.4f}\n"
                        f"Kappa: {m['kappa']:.4f}\n")
        results.append(entry)
    return results
