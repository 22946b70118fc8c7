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

    if len(shapes) == 1 and all(a.dtype == np.uint8 for a in scenes):
        # uniform uint8 scenes -> the turbo path: ONE device program per
        # batch (channel-major, sort-free, gather-free; pipeline.turbo),
        # optionally sharded over the mesh's 'data' axis
        from jax.sharding import NamedSharding, PartitionSpec as P
        from rs_image_segmentation_tpu.pipeline.preprocess import (
            build_stretch_lut)
        from rs_image_segmentation_tpu.pipeline.turbo import (
            classify_scenes_turbo)
        gf = _gemm_for(forest, 19)
        batch = np.stack(scenes)
        luts = np.stack([build_stretch_lut(a, gains, biases)
                         for a in scenes]).astype(np.uint8)
        if mesh is not None and len(scenes) % mesh.devices.size == 0:
            sh = NamedSharding(mesh, P("data"))
            batch_d = jax.device_put(jnp.asarray(batch), sh)
            luts_d = jax.device_put(jnp.asarray(luts), sh)
        else:
            batch_d, luts_d = jnp.asarray(batch), jnp.asarray(luts)
        maps = np.asarray(classify_scenes_turbo(batch_d, luts_d, gf, cfg))
        preds = [m for m in maps]
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
