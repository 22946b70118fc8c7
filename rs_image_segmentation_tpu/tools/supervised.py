"""The bundled supervised workflow: samples.pkl -> train RF -> full-scene
predict -> class_map.npy + PNG.

Reference: modules/supervised_classifiers.py __main__ (:118-163), the exact
path that produced the bundled ``output/rf_samples_model.pkl`` and
``output/class_map.npy`` artifacts. Includes the reference's grid-search
trainer (GridSearchCV over max_depth, supervised_classifiers.py:57-83) as a
host-side fold loop.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from rs_image_segmentation_tpu.models.forest import (FlatForest,
                                                     fit_random_forest,
                                                     forest_from_sklearn,
                                                     forest_predict)
from rs_image_segmentation_tpu.tools.sampling import (
    training_matrix_from_samples)


def train_random_forest_from_samples(x: np.ndarray, y: np.ndarray,
                                     n_estimators: int = 100,
                                     max_depth: Optional[int] = None,
                                     seed: int = 42,
                                     use_sklearn: bool = True,
                                     model_path: Optional[str] = None
                                     ) -> Tuple[FlatForest, int]:
    """Plain RF(100, None, rs=42) like supervised_classifiers.py:85-97,
    persisting a joblib model when sklearn is available."""
    if use_sklearn:
        try:
            from sklearn.ensemble import RandomForestClassifier
            clf = RandomForestClassifier(n_estimators=n_estimators,
                                         max_depth=max_depth,
                                         random_state=seed)
            clf.fit(x, y)
            if model_path:
                import joblib
                os.makedirs(os.path.dirname(model_path) or ".", exist_ok=True)
                joblib.dump(clf, model_path)
            return forest_from_sklearn(clf)
        except ImportError:
            pass
    return fit_random_forest(x, y, n_estimators, max_depth, seed)


def train_random_forest_grid(x: np.ndarray, y: np.ndarray,
                             max_depth_grid=(10, 20, None),
                             n_estimators: int = 100, seed: int = 42,
                             cv: int = 3) -> Tuple[FlatForest, int, dict]:
    """GridSearchCV(RandomForestClassifier, {'max_depth': [10, 20, None]},
    cv=3) equivalent (reference supervised_classifiers.py:57-83):
    stratified-ish k-fold accuracy per grid point, refit on the winner."""
    n = len(y)
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    folds = np.array_split(order, cv)
    scores = {}
    for depth in max_depth_grid:
        accs = []
        for i in range(cv):
            val = folds[i]
            trn = np.concatenate([folds[j] for j in range(cv) if j != i])
            if len(np.unique(y[trn])) < 2:
                continue
            forest, d = fit_random_forest(x[trn], y[trn], n_estimators,
                                          depth, seed)
            pred = np.asarray(forest_predict(forest, jnp.asarray(x[val]), d,
                                             chunk=max(64, len(val))))
            accs.append(float((pred == y[val]).mean()))
        scores[depth] = float(np.mean(accs)) if accs else 0.0
    best = max(scores, key=lambda k: scores[k])
    forest, d = fit_random_forest(x, y, n_estimators, best, seed)
    return forest, d, {"best_max_depth": best, "cv_scores": scores}


def train_with_validation_report(x: np.ndarray, y: np.ndarray,
                                 feature_names=None, n_estimators: int = 100,
                                 test_size: float = 0.3, seed: int = 42
                                 ) -> Tuple[FlatForest, int, dict]:
    """The reference's train_random_forest_classifier behavior
    (extract.py:635-688): stratified 70/30 split, fit, validation accuracy /
    Kappa / per-class report / sorted feature importances. Returns
    (forest, depth, report_dict)."""
    import jax.numpy as jnp
    from rs_image_segmentation_tpu.ops.stats import evaluate_predictions

    rng = np.random.default_rng(seed)
    classes, counts = np.unique(y, return_counts=True)
    # stratified split when every class has >= 2 samples
    if len(classes) > 1 and counts.min() >= 2:
        tr_idx, va_idx = [], []
        for c in classes:
            idx = rng.permutation(np.where(y == c)[0])
            n_val = max(1, int(round(len(idx) * test_size)))
            va_idx.append(idx[:n_val])
            tr_idx.append(idx[n_val:])
        tr = np.concatenate(tr_idx)
        va = np.concatenate(va_idx)
    else:
        perm = rng.permutation(len(y))
        n_val = int(len(y) * test_size)
        va, tr = perm[:n_val], perm[n_val:]

    forest, depth = train_random_forest_from_samples(
        x[tr], y[tr], n_estimators=n_estimators, seed=seed)
    report: dict = {"n_train": int(len(tr)), "n_val": int(len(va))}
    if len(va):
        pred = np.asarray(forest_predict(forest, jnp.asarray(x[va]), depth,
                                         chunk=max(64, len(va))))
        labels = sorted(set(np.unique(y[va])) | set(np.unique(pred)))
        cm, oa, kappa, per = evaluate_predictions(
            jnp.asarray(y[va]), jnp.asarray(pred), labels)
        report.update(accuracy=oa, kappa=kappa, confusion_matrix=cm,
                      labels=labels,
                      per_class={int(l): {k: float(v[i]) for k, v in
                                          per.items()}
                                 for i, l in enumerate(labels)})
    # impurity-based importances from the full-data sklearn fit when present
    try:
        from sklearn.ensemble import RandomForestClassifier
        clf = RandomForestClassifier(n_estimators=n_estimators,
                                     random_state=seed).fit(x[tr], y[tr])
        imp = clf.feature_importances_
        names = feature_names or [f"feature_{i}" for i in range(x.shape[1])]
        order = np.argsort(imp)[::-1]
        report["feature_importances"] = [(names[i], float(imp[i]))
                                         for i in order]
    except ImportError:
        pass
    return forest, depth, report


def predict_image(forest: FlatForest, depth: int,
                  feature_map: np.ndarray) -> np.ndarray:
    """Full-scene device predict (reference supervised_classifiers.py:99-115)."""
    h, w, f = feature_map.shape
    x = jnp.asarray(np.nan_to_num(feature_map.reshape(-1, f),
                                  nan=0.0).astype(np.float32))
    pred = forest_predict(forest, x, depth)
    return np.asarray(pred).reshape(h, w)


def run_supervised_workflow(samples_path: str, features_npy: str,
                            output_dir: str,
                            use_sklearn: bool = True) -> np.ndarray:
    """samples.pkl + all_hierarchical_features.npy -> rf_samples_model.pkl +
    class_map.npy + coarse_supervised_classification PNG
    (reference supervised_classifiers.py:118-163)."""
    feature_map = np.load(features_npy)
    x, y = training_matrix_from_samples(samples_path, feature_map)
    model_path = os.path.join(output_dir, "rf_samples_model.pkl")
    forest, depth = train_random_forest_from_samples(
        x, y, use_sklearn=use_sklearn, model_path=model_path)
    class_map = predict_image(forest, depth, feature_map)
    os.makedirs(output_dir, exist_ok=True)
    np.save(os.path.join(output_dir, "class_map.npy"), class_map)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.imshow(class_map, cmap="tab10")
    ax.set_title("Supervised classification")
    ax.axis("off")
    fig.savefig(os.path.join(output_dir,
                             "coarse_supervised_classification_AA.png"),
                dpi=150)
    plt.close(fig)
    return class_map
