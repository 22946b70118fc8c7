"""Stage 4 — evaluation: cluster mapping, OA/Kappa/confusion matrix, plots,
text report.

Reference: scripts/4_evaluate.py (ClassificationEvaluator) +
modules/evaluation.py. Metric math runs on device (ops.stats, MXU one-hot
contractions) and bit-matches sklearn; plotting/report generation stays on
host.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from rs_image_segmentation_tpu.core.config import (EVAL_CLASS_COLORS,
                                                   EVAL_CLASS_NAMES)
from rs_image_segmentation_tpu.io.tiff import read_tiff
from rs_image_segmentation_tpu.ops.resize import resize_nearest
from rs_image_segmentation_tpu.ops.stats import (cohen_kappa,
                                                 confusion_matrix,
                                                 map_clusters_to_classes,
                                                 overall_accuracy,
                                                 per_class_metrics)


def _load_label_raster(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    arr, _ = read_tiff(path)
    return arr[0]


class ClassificationEvaluator:
    """Reference-parity evaluator (4_evaluate.py:28-402)."""

    def __init__(self, class_names: Optional[Dict[int, str]] = None,
                 class_colors: Optional[Dict[int, tuple]] = None):
        self.class_names = class_names or dict(EVAL_CLASS_NAMES)
        self.class_colors = class_colors or dict(EVAL_CLASS_COLORS)

    # -- loading -----------------------------------------------------------
    def load_classification_result(self, path: str) -> np.ndarray:
        return _load_label_raster(path)

    def load_roi_mask(self, path: str) -> np.ndarray:
        return _load_label_raster(path)

    def extract_valid_samples(self, classification: np.ndarray,
                              roi: np.ndarray
                              ) -> Tuple[np.ndarray, np.ndarray]:
        """valid = roi > 0; ROI nearest-resized on shape mismatch
        (reference 4_evaluate.py:72-95)."""
        if roi.shape != classification.shape:
            roi = np.asarray(resize_nearest(jnp.asarray(roi),
                                            classification.shape))
        valid = roi > 0
        return classification[valid].astype(np.int64), roi[valid].astype(np.int64)

    # -- mapping + metrics ---------------------------------------------------
    def map_clusters_to_classes(self, pred: np.ndarray, truth: np.ndarray
                                ) -> np.ndarray:
        n_pred = int(pred.max()) + 1
        n_true = int(truth.max()) + 1
        return np.asarray(map_clusters_to_classes(
            jnp.asarray(pred), jnp.asarray(truth), n_pred, n_true))

    def calculate_metrics(self, y_true: np.ndarray, y_pred: np.ndarray
                          ) -> Dict:
        labels = sorted(set(np.unique(y_true)) | set(np.unique(y_pred)))
        cm = np.asarray(confusion_matrix(jnp.asarray(y_true),
                                         jnp.asarray(y_pred), labels))
        per = per_class_metrics(cm)
        return {
            "labels": labels,
            "confusion_matrix": cm,
            "overall_accuracy": overall_accuracy(cm),
            "kappa": cohen_kappa(cm),
            "per_class": {
                int(lab): {
                    "precision": float(per["precision"][i]),
                    "recall": float(per["recall"][i]),
                    "f1": float(per["f1"][i]),
                    "support": int(per["support"][i]),
                }
                for i, lab in enumerate(labels)
            },
        }

    # -- plots -----------------------------------------------------------------
    def plot_confusion_matrix(self, metrics: Dict, path: str) -> None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        cm = metrics["confusion_matrix"]
        labels = metrics["labels"]
        names = [self.class_names.get(int(l), str(l)) for l in labels]
        row_sum = cm.sum(axis=1, keepdims=True).astype(np.float64)
        pct = np.divide(cm, row_sum, out=np.zeros_like(cm, np.float64),
                        where=row_sum > 0) * 100
        fig, ax = plt.subplots(figsize=(7, 6))
        im = ax.imshow(cm, cmap="Blues")
        for i in range(cm.shape[0]):
            for j in range(cm.shape[1]):
                ax.text(j, i, f"{cm[i, j]}\n{pct[i, j]:.1f}%",
                        ha="center", va="center", fontsize=9,
                        color="white" if cm[i, j] > cm.max() / 2 else "black")
        ax.set_xticks(range(len(names)), names, rotation=45, ha="right")
        ax.set_yticks(range(len(names)), names)
        ax.set_xlabel("Predicted")
        ax.set_ylabel("True")
        ax.set_title("Confusion matrix")
        fig.colorbar(im, ax=ax)
        fig.tight_layout()
        fig.savefig(path, dpi=150)
        plt.close(fig)

    def plot_accuracy_comparison(self, metrics: Dict, path: str) -> None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        labels = metrics["labels"]
        names = [self.class_names.get(int(l), str(l)) for l in labels]
        per = metrics["per_class"]
        fig, axes = plt.subplots(1, 2, figsize=(13, 5))
        axes[0].bar(["OA", "Kappa"],
                    [metrics["overall_accuracy"], metrics["kappa"]],
                    color=["tab:blue", "tab:orange"])
        axes[0].set_ylim(0, 1.05)
        axes[0].set_title("Overall accuracy / Kappa")
        for i, (m, c) in enumerate((("precision", "tab:blue"),
                                    ("recall", "tab:orange"),
                                    ("f1", "tab:green"))):
            axes[1].bar(np.arange(len(labels)) + (i - 1) * 0.25,
                        [per[int(l)][m] for l in labels], width=0.25,
                        label=m, color=c)
        axes[1].set_xticks(range(len(names)), names, rotation=30, ha="right")
        axes[1].set_ylim(0, 1.05)
        axes[1].legend()
        axes[1].set_title("Per-class metrics")
        fig.tight_layout()
        fig.savefig(path, dpi=150)
        plt.close(fig)

    def plot_classification_comparison(self, classification: np.ndarray,
                                       mapped: np.ndarray, roi: np.ndarray,
                                       path: str) -> None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.colors import ListedColormap

        max_lab = int(max(classification.max(), mapped.max(), roi.max()))
        colors = [self.class_colors.get(i, (0.5, 0.5, 0.5))
                  for i in range(max_lab + 1)]
        cmap = ListedColormap(colors)
        fig, axes = plt.subplots(1, 3, figsize=(18, 6))
        for ax, (img, title) in zip(axes, [
                (classification, "Raw classification"),
                (mapped, "Mapped to classes"),
                (roi, "Reference ROI")]):
            ax.imshow(img, cmap=cmap, vmin=0, vmax=max_lab,
                      interpolation="nearest")
            ax.set_title(title)
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(path, dpi=150)
        plt.close(fig)

    # -- report ------------------------------------------------------------------
    def generate_evaluation_report(self, metrics: Dict, path: str) -> str:
        lines = ["=" * 60,
                 "Classification accuracy evaluation report",
                 "=" * 60, "",
                 f"Overall Accuracy (OA): {metrics['overall_accuracy']:.4f}",
                 f"Cohen's Kappa:         {metrics['kappa']:.4f}", "",
                 "Per-class metrics:",
                 f"{'class':<16}{'precision':>10}{'recall':>10}"
                 f"{'f1':>10}{'support':>10}"]
        for lab in metrics["labels"]:
            p = metrics["per_class"][int(lab)]
            name = self.class_names.get(int(lab), str(lab))
            lines.append(f"{name:<16}{p['precision']:>10.3f}"
                         f"{p['recall']:>10.3f}{p['f1']:>10.3f}"
                         f"{p['support']:>10d}")
        lines += ["", "Confusion matrix (rows=true, cols=predicted):"]
        for row in metrics["confusion_matrix"]:
            lines.append("  " + " ".join(f"{v:>8d}" for v in row))
        report = "\n".join(lines) + "\n"
        with open(path, "w") as f:
            f.write(report)
        return report

    # -- orchestration -------------------------------------------------------------
    def evaluate_classification(self, classification_file: str,
                                roi_file: str, output_dir: str,
                                map_clusters: bool = True) -> Dict:
        """Full stage-4 flow (reference 4_evaluate.py:345-402)."""
        os.makedirs(output_dir, exist_ok=True)
        classification = self.load_classification_result(classification_file)
        roi = self.load_roi_mask(roi_file)
        if roi.shape != classification.shape:
            roi = np.asarray(resize_nearest(jnp.asarray(roi),
                                            classification.shape))
        y_pred_raw, y_true = self.extract_valid_samples(classification, roi)
        if map_clusters:
            mapped_full = self.map_clusters_to_classes(
                classification.astype(np.int64), roi.astype(np.int64))
            y_pred = mapped_full[roi > 0]
        else:
            mapped_full = classification
            y_pred = y_pred_raw
        metrics = self.calculate_metrics(y_true, y_pred)
        self.plot_confusion_matrix(
            metrics, os.path.join(output_dir, "confusion_matrix.png"))
        self.plot_accuracy_comparison(
            metrics, os.path.join(output_dir, "accuracy_comparison.png"))
        self.plot_classification_comparison(
            classification, mapped_full, roi,
            os.path.join(output_dir, "classification_comparison.png"))
        self.generate_evaluation_report(
            metrics, os.path.join(output_dir, "evaluation_report.txt"))
        return metrics


def evaluate_classification(pred: np.ndarray, gt: np.ndarray,
                            class_names=None, save_dir: Optional[str] = None
                            ) -> Dict:
    """modules/evaluation.py:32-84 equivalent: mask gt>0, labels=[1..n],
    confusion matrix + OA + Kappa (+ heatmap when save_dir given)."""
    mask = gt > 0
    y_true = gt[mask].astype(np.int64)
    y_pred = pred[mask].astype(np.int64)
    n = int(max(y_true.max(), y_pred.max()))
    labels = list(range(1, n + 1))
    cm = np.asarray(confusion_matrix(jnp.asarray(y_true), jnp.asarray(y_pred),
                                     labels))
    out = {"confusion_matrix": cm,
           "overall_accuracy": overall_accuracy(cm),
           "kappa": cohen_kappa(cm)}
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        ev = ClassificationEvaluator(class_names=class_names)
        ev.plot_confusion_matrix({"confusion_matrix": cm, "labels": labels},
                                 os.path.join(save_dir, "confusion_matrix.png"))
    return out
