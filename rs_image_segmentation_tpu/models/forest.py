"""Random forest: host-side training, tensorized on-device inference.

The reference's hot path is RandomForestClassifier.predict over every pixel
(360k x 19 x 100 trees, extract.py:690-719 / supervised_classifiers.py:99).
Here the fitted forest is compiled to padded tensors — per-tree node arrays
(feature, threshold, left, right, leaf distribution) — and evaluated as a
vectorized level-synchronous traversal: ``max_depth`` rounds of
gather + compare + select over all (pixel, tree) pairs at once, then a mean
over per-tree leaf distributions and an argmax (sklearn predict semantics:
average of predict_proba, ties -> lowest class index). Pixels stream through
in fixed-size chunks via ``lax.map`` so the working set stays in VMEM-sized
blocks.

Training: 33..1e4-sample fits are not a TPU problem. ``fit_random_forest``
is a self-contained NumPy CART trainer (gini, bootstrap, sqrt feature
subsampling — sklearn's defaults); ``forest_from_sklearn`` additionally
tensorizes an existing sklearn model (e.g. the bundled
output/rf_samples_model.pkl) for exact-parity inference.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class FlatForest(NamedTuple):
    """Padded tensor form of a forest (T trees, up to N nodes, C classes).

    Leaves are self-looping: left == right == own index and threshold = +inf,
    so a fixed-depth traversal parks at the leaf.
    """
    feature: jnp.ndarray     # (T, N) int32
    threshold: jnp.ndarray   # (T, N) float32
    left: jnp.ndarray        # (T, N) int32
    right: jnp.ndarray       # (T, N) int32
    leaf_proba: jnp.ndarray  # (T, N, C) float32 (class distribution at node)
    classes: jnp.ndarray     # (C,) original class labels

    @property
    def n_trees(self) -> int:
        return self.feature.shape[0]


def _pack_trees(trees: Sequence[dict], classes: np.ndarray,
                max_depth: int) -> "tuple[FlatForest, int]":
    t = len(trees)
    max_nodes = max(tr["feature"].shape[0] for tr in trees)
    c = len(classes)
    feature = np.zeros((t, max_nodes), np.int32)
    threshold = np.full((t, max_nodes), np.inf, np.float32)
    left = np.tile(np.arange(max_nodes, dtype=np.int32), (t, 1))
    right = left.copy()
    proba = np.zeros((t, max_nodes, c), np.float32)
    for i, tr in enumerate(trees):
        n = tr["feature"].shape[0]
        is_leaf = tr["left"] < 0
        feature[i, :n] = np.where(is_leaf, 0, tr["feature"])
        threshold[i, :n] = np.where(is_leaf, np.inf, tr["threshold"])
        left[i, :n] = np.where(is_leaf, np.arange(n), tr["left"])
        right[i, :n] = np.where(is_leaf, np.arange(n), tr["right"])
        proba[i, :n] = tr["value"]
    forest = FlatForest(jnp.asarray(feature), jnp.asarray(threshold),
                        jnp.asarray(left), jnp.asarray(right),
                        jnp.asarray(proba), jnp.asarray(classes))
    return forest, max_depth


def forest_from_sklearn(clf) -> "tuple[FlatForest, int]":
    """Tensorize a fitted sklearn RandomForestClassifier.

    Per-tree leaf value -> normalized class distribution, matching
    predict_proba; returns (forest, max_depth)."""
    trees = []
    max_depth = 1
    for est in clf.estimators_:
        tr = est.tree_
        value = tr.value[:, 0, :].astype(np.float64)
        norm = value.sum(axis=1, keepdims=True)
        norm[norm == 0] = 1
        trees.append({
            "feature": tr.feature.astype(np.int32),
            "threshold": tr.threshold.astype(np.float32),
            "left": tr.children_left.astype(np.int32),
            "right": tr.children_right.astype(np.int32),
            "value": (value / norm).astype(np.float32),
        })
        max_depth = max(max_depth, int(est.tree_.max_depth))
    return _pack_trees(trees, clf.classes_.copy(), max_depth)


@functools.partial(jax.jit, static_argnames=("max_depth", "chunk"))
def forest_predict_proba(forest: FlatForest, x: jnp.ndarray,
                         max_depth: int, chunk: int = 65536) -> jnp.ndarray:
    """Mean per-tree leaf distribution for each row of (N, F) ``x``.

    Level-synchronous traversal: each of ``max_depth`` rounds advances every
    (pixel, tree) pair one level via two gathers and a select.
    """
    n, f = x.shape
    t = forest.n_trees
    pad = (-n) % chunk
    xp = jnp.pad(x.astype(jnp.float32), ((0, pad), (0, 0)))
    blocks = xp.reshape(-1, chunk, f)

    def one_block(xb):
        idx = jnp.zeros((chunk, t), jnp.int32)

        def step(_, idx):
            feat = jnp.take_along_axis(forest.feature, idx.T, axis=1).T
            thr = jnp.take_along_axis(forest.threshold, idx.T, axis=1).T
            xv = jnp.take_along_axis(xb, feat, axis=1)
            go_left = xv <= thr
            lft = jnp.take_along_axis(forest.left, idx.T, axis=1).T
            rgt = jnp.take_along_axis(forest.right, idx.T, axis=1).T
            return jnp.where(go_left, lft, rgt)

        idx = jax.lax.fori_loop(0, max_depth, step, idx)
        # gather leaf distributions: (chunk, T, C) mean over T
        leaf = forest.leaf_proba[jnp.arange(t)[None, :], idx]
        return jnp.mean(leaf, axis=1)

    out = jax.lax.map(one_block, blocks)
    return out.reshape(-1, forest.leaf_proba.shape[-1])[:n]


def forest_predict(forest: FlatForest, x: jnp.ndarray,
                   max_depth: int, chunk: int = 65536) -> jnp.ndarray:
    """sklearn .predict parity: argmax of mean proba, mapped to class labels."""
    proba = forest_predict_proba(forest, x, max_depth, chunk)
    return forest.classes[jnp.argmax(proba, axis=1)]


# ----------------------------------------------------------------- training

@dataclasses.dataclass
class _TreeBuilder:
    x: np.ndarray
    y: np.ndarray          # class indices 0..C-1
    n_classes: int
    max_features: int
    max_depth: Optional[int]
    rng: np.random.Generator
    min_samples_split: int = 2
    min_samples_leaf: int = 1

    def __post_init__(self):
        self.feature = []
        self.threshold = []
        self.left = []
        self.right = []
        self.value = []

    def _add_node(self):
        self.feature.append(0)
        self.threshold.append(0.0)
        self.left.append(-1)
        self.right.append(-1)
        self.value.append(None)
        return len(self.feature) - 1

    def build(self, idx: np.ndarray, depth: int = 0) -> int:
        node = self._add_node()
        y = self.y[idx]
        counts = np.bincount(y, minlength=self.n_classes).astype(np.float64)
        self.value[node] = counts
        n = idx.size
        if (n < self.min_samples_split
                or (self.max_depth is not None and depth >= self.max_depth)
                or counts.max() == n):
            return node
        best = self._best_split(idx)
        if best is None:
            return node
        f, thr = best
        go_left = self.x[idx, f] <= thr
        if go_left.all() or not go_left.any():
            return node
        self.feature[node] = f
        self.threshold[node] = thr
        self.left[node] = self.build(idx[go_left], depth + 1)
        self.right[node] = self.build(idx[~go_left], depth + 1)
        return node

    def _best_split(self, idx: np.ndarray):
        n = idx.size
        feats = self.rng.permutation(self.x.shape[1])
        best_gain = -np.inf
        best = None
        y = self.y[idx]
        total = np.bincount(y, minlength=self.n_classes).astype(np.float64)
        gini_parent = 1.0 - ((total / n) ** 2).sum()
        tried = 0
        for f in feats:
            v = self.x[idx, f]
            order = np.argsort(v, kind="stable")
            vs = v[order]
            ys = y[order]
            # candidate splits between distinct values
            distinct = vs[1:] != vs[:-1]
            if not distinct.any():
                continue
            tried += 1
            onehot = np.zeros((n, self.n_classes), np.float64)
            onehot[np.arange(n), ys] = 1
            cum = onehot.cumsum(axis=0)
            nl = np.arange(1, n, dtype=np.float64)
            cl = cum[:-1]
            cr = total[None, :] - cl
            nr = n - nl
            gini_l = 1.0 - ((cl / nl[:, None]) ** 2).sum(axis=1)
            gini_r = 1.0 - ((cr / nr[:, None]) ** 2).sum(axis=1)
            w = (nl * gini_l + nr * gini_r) / n
            w[~distinct] = np.inf
            k = int(np.argmin(w))
            gain = gini_parent - w[k]
            if gain > best_gain:
                best_gain = gain
                thr = (vs[k] + vs[k + 1]) / 2.0
                best = (int(f), float(thr))
            if tried >= self.max_features and best_gain > 0:
                break
        return best


def fit_random_forest(x: np.ndarray, y: np.ndarray, n_estimators: int = 100,
                      max_depth: Optional[int] = None, seed: int = 42,
                      bootstrap: bool = True) -> "tuple[FlatForest, int]":
    """Self-contained RF trainer (NumPy CART, gini, bootstrap, sqrt feature
    subsampling). Returns (FlatForest, max_depth) ready for device predict."""
    x = np.asarray(x, np.float32)
    y = np.asarray(y)
    classes, y_idx = np.unique(y, return_inverse=True)
    c = len(classes)
    n, f = x.shape
    max_features = max(1, int(np.sqrt(f)))
    rng = np.random.default_rng(seed)
    trees = []
    depth_seen = 1
    for _ in range(n_estimators):
        idx = (rng.integers(0, n, n) if bootstrap
               else np.arange(n))
        tb = _TreeBuilder(x, y_idx, c, max_features, max_depth,
                          np.random.default_rng(rng.integers(0, 2 ** 31)))
        tb.build(idx)
        val = np.stack(tb.value)
        norm = val.sum(axis=1, keepdims=True)
        norm[norm == 0] = 1
        trees.append({
            "feature": np.asarray(tb.feature, np.int32),
            "threshold": np.asarray(tb.threshold, np.float32),
            "left": np.asarray(tb.left, np.int32),
            "right": np.asarray(tb.right, np.int32),
            "value": (val / norm).astype(np.float32),
        })
        depth_seen = max(depth_seen, _tree_depth(trees[-1]))
    return _pack_trees(trees, classes, depth_seen)


def _tree_depth(tr: dict) -> int:
    left, right = tr["left"], tr["right"]

    def depth(i):
        if left[i] < 0:
            return 1
        return 1 + max(depth(left[i]), depth(right[i]))

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(100000)
    try:
        return depth(0)
    finally:
        sys.setrecursionlimit(old)
