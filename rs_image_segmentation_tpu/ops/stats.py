"""Evaluation metric kernels — sklearn-bit-comparable.

The confusion matrix is computed as a one-hot x one-hot matmul so it runs on
the MXU in a single pass (no scatter); OA / Cohen's kappa / per-class
precision-recall-F1 are closed-form reductions over it, matching
``sklearn.metrics`` (reference 4_evaluate.py:130-160, evaluation.py:48-50)
exactly for integer label inputs.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def confusion_matrix(y_true: jnp.ndarray, y_pred: jnp.ndarray,
                     labels: Sequence[int]) -> jnp.ndarray:
    """Counts C[i, j] = #{y_true == labels[i] and y_pred == labels[j]}.

    One-hot encodings contracted on the MXU: C = T^T @ P with T, P in
    {0,1}^(N x L). Exact for N < 2^24 in float32; uses int32 accumulation
    via float32 matmul then round, safe for raster-scale N.
    """
    labels_arr = jnp.asarray(list(labels))
    t = (y_true.reshape(-1, 1) == labels_arr.reshape(1, -1)).astype(jnp.float32)
    p = (y_pred.reshape(-1, 1) == labels_arr.reshape(1, -1)).astype(jnp.float32)
    cm = jnp.dot(t.T, p, preferred_element_type=jnp.float32)
    return cm.astype(jnp.int32)


def overall_accuracy(cm) -> float:
    """Exact float64 OA from an integer confusion matrix (host scalar math:
    the counting already happened on device)."""
    cm = np.asarray(cm, dtype=np.float64)
    total = cm.sum()
    return float(np.trace(cm) / total) if total > 0 else 0.0


def cohen_kappa(cm) -> float:
    """Cohen's kappa, unweighted — sklearn.cohen_kappa_score formula
    (normalized expected matrix) for bit-parity."""
    cm = np.asarray(cm, dtype=np.float64)
    n = cm.sum()
    sum0 = cm.sum(axis=0)
    sum1 = cm.sum(axis=1)
    expected = np.outer(sum1, sum0) / n
    w_mat = np.ones_like(cm)
    np.fill_diagonal(w_mat, 0)
    k = np.sum(w_mat * cm) / np.sum(w_mat * expected)
    return float(1.0 - k)


def per_class_metrics(cm) -> Dict[str, np.ndarray]:
    """precision / recall / f1 / support per class with sklearn's
    zero-division=0 semantics (float64 host math over the int cm)."""
    cm = np.asarray(cm, dtype=np.float64)
    tp = np.diagonal(cm)
    pred_tot = cm.sum(axis=0)
    true_tot = cm.sum(axis=1)
    precision = np.divide(tp, pred_tot, out=np.zeros_like(tp), where=pred_tot > 0)
    recall = np.divide(tp, true_tot, out=np.zeros_like(tp), where=true_tot > 0)
    denom = precision + recall
    f1 = np.divide(2.0 * precision * recall, denom,
                   out=np.zeros_like(tp), where=denom > 0)
    return {"precision": precision, "recall": recall, "f1": f1,
            "support": true_tot.astype(np.int64)}


def evaluate_predictions(
    y_true: jnp.ndarray, y_pred: jnp.ndarray, labels: Sequence[int]
) -> Tuple[np.ndarray, float, float, Dict[str, np.ndarray]]:
    """Full metric bundle on host-friendly types (cm, OA, kappa, per-class)."""
    cm = np.asarray(confusion_matrix(y_true, y_pred, labels))
    return cm, overall_accuracy(cm), cohen_kappa(cm), per_class_metrics(cm)


def map_clusters_to_classes(pred: jnp.ndarray, truth: jnp.ndarray,
                            n_pred_labels: int, n_true_labels: int) -> jnp.ndarray:
    """Per-cluster majority vote: each predicted label -> most frequent true
    class among its pixels with truth > 0 (reference 4_evaluate.py:97-128).

    Ties resolve to the lowest true label (np.argmax semantics). Clusters
    with no labeled pixels map to 0. Labels are assumed in [0, n).
    """
    valid = truth > 0
    pred_oh = ((pred.reshape(-1, 1) ==
                jnp.arange(n_pred_labels).reshape(1, -1)) & valid.reshape(-1, 1)
               ).astype(jnp.float32)
    true_oh = (truth.reshape(-1, 1) ==
               jnp.arange(n_true_labels).reshape(1, -1)).astype(jnp.float32)
    counts = jnp.dot(pred_oh.T, true_oh, preferred_element_type=jnp.float32)
    mapping = jnp.argmax(counts, axis=1).astype(pred.dtype)
    has_any = jnp.sum(counts, axis=1) > 0
    mapping = jnp.where(has_any, mapping, 0)
    return mapping[pred]
