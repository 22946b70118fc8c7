"""Model serialization: compiled forest tensors + KMeans state.

The reference checkpoints models via joblib pickles
(3_classification.py:459-475, supervised_classifiers.py:77-92); we keep that
interop (sklearn models load through forest_from_sklearn) and add a native
npz format for the tensorized forms so inference never needs sklearn.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from rs_image_segmentation_tpu.models.forest import FlatForest
from rs_image_segmentation_tpu.models.kmeans import KMeansState


def save_flat_forest(path: str, forest: FlatForest, max_depth: int) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(
        path,
        feature=np.asarray(forest.feature),
        threshold=np.asarray(forest.threshold),
        left=np.asarray(forest.left),
        right=np.asarray(forest.right),
        leaf_proba=np.asarray(forest.leaf_proba),
        classes=np.asarray(forest.classes),
        max_depth=np.asarray(max_depth),
    )


def load_flat_forest(path: str) -> Tuple[FlatForest, int]:
    z = np.load(path)
    forest = FlatForest(
        jnp.asarray(z["feature"]), jnp.asarray(z["threshold"]),
        jnp.asarray(z["left"]), jnp.asarray(z["right"]),
        jnp.asarray(z["leaf_proba"]), jnp.asarray(z["classes"]))
    return forest, int(z["max_depth"])


def save_kmeans(path: str, state: KMeansState) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, centroids=np.asarray(state.centroids),
                        inertia=np.asarray(state.inertia),
                        n_iter=np.asarray(state.n_iter))


def load_kmeans(path: str) -> KMeansState:
    z = np.load(path)
    return KMeansState(jnp.asarray(z["centroids"]),
                       jnp.asarray(z["inertia"]),
                       jnp.asarray(z["n_iter"]))


def save_run_manifest(path: str, **fields) -> None:
    """Stage-progress manifest for resumable pipelines: which artifacts are
    complete, their hashes/shapes — the explicit form of the reference's
    implicit file-based resume (SURVEY.md §5 checkpoint row)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(fields, f, indent=2, default=str)


def load_run_manifest(path: str) -> dict:
    with open(path) as f:
        return json.load(f)
