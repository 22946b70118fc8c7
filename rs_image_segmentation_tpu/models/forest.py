"""Random forest: host-side training, tensorized on-device inference.

The reference's hot path is RandomForestClassifier.predict over every pixel
(360k x 19 x 100 trees, extract.py:690-719 / supervised_classifiers.py:99).
Two device strategies:

  * GEMM mode (default for forests with a bounded leaf count): the whole
    forest compiles to three static matrices — a (F, nodes) one-hot feature
    selector, a (nodes, leaves) signed path matrix, and a (leaves, classes)
    distribution table — and inference is three MXU matmuls plus two
    comparisons. ZERO gathers; a leaf fires iff the signed sum of its path
    decisions equals its path length. This is the TPU-shaped formulation of
    tree inference (cf. Hummingbird's GEMM strategy).
  * Level-synchronous traversal (fallback for very large forests where the
    leaf dimension would blow up): ``max_depth`` rounds of flat-index
    gather + compare + select over all (pixel, tree) pairs.

Both match sklearn's predict semantics: average of per-tree predict_proba,
argmax with ties -> lowest class index.

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


class GemmForest(NamedTuple):
    """All-matmul forest form: zero gathers on device.

    For pixel row x: s = sign(x @ selector <= thresholds)  in {+1, -1};
    leaf l fires iff (s @ path)[l] == path_len[l]; output proba =
    indicator @ leaf_dist (leaf_dist pre-divided by n_trees)."""
    selector: jnp.ndarray    # (F, M) one-hot feature picker, bf16
    thresholds: jnp.ndarray  # (M,) float32
    path: jnp.ndarray        # (M, L) in {-1, 0, +1}, bf16
    path_len: jnp.ndarray    # (L,) float32
    leaf_dist: jnp.ndarray   # (L, C) float32 per-tree distributions (raw);
    # summed exactly then divided once by n_trees (keeps one-hot leaf sums
    # integer-exact in f32 -> argmax parity with sklearn's f64 mean)
    inv_trees: jnp.ndarray   # () float32, 1 / n_trees
    classes: jnp.ndarray     # (C,)


def forest_to_gemm(forest: FlatForest, n_features: int) -> GemmForest:
    """Compile a FlatForest into its GEMM form (host-side, static)."""
    feature = np.asarray(forest.feature)
    threshold = np.asarray(forest.threshold)
    left = np.asarray(forest.left)
    right = np.asarray(forest.right)
    proba = np.asarray(forest.leaf_proba)
    t_count = feature.shape[0]

    sel_rows = []      # feature index per internal node
    thr_vals = []
    paths = []         # per leaf: list of (node_col, sign)
    leaf_dists = []

    for t in range(t_count):
        node_col: dict = {}

        def walk(node, trail):
            if left[t, node] == node:  # leaf (self-loop)
                paths.append(list(trail))
                leaf_dists.append(proba[t, node])
                return
            if node not in node_col:
                node_col[node] = len(sel_rows)
                sel_rows.append(feature[t, node])
                thr_vals.append(threshold[t, node])
            col = node_col[node]
            walk(left[t, node], trail + [(col, 1.0)])
            walk(right[t, node], trail + [(col, -1.0)])

        import sys
        old = sys.getrecursionlimit()
        sys.setrecursionlimit(100000)
        try:
            walk(0, [])
        finally:
            sys.setrecursionlimit(old)

    m = len(sel_rows)
    l = len(paths)
    selector = np.zeros((n_features, max(m, 1)), np.float32)
    for col, f in enumerate(sel_rows):
        selector[f, col] = 1.0
    thresholds = np.asarray(thr_vals, np.float32) if m else np.zeros(1, np.float32)
    path = np.zeros((max(m, 1), l), np.float32)
    path_len = np.zeros(l, np.float32)
    for li, trail in enumerate(paths):
        path_len[li] = len(trail)
        for col, sign in trail:
            path[col, li] = sign
    leaf_dist = np.stack(leaf_dists).astype(np.float32)
    classes = np.asarray(forest.classes)
    # force concrete arrays even if we were invoked under an active trace
    # (the GemmForest is cached and reused across programs)
    with jax.ensure_compile_time_eval():
        return GemmForest(jnp.asarray(selector, jnp.bfloat16),
                          jnp.asarray(thresholds),
                          jnp.asarray(path, jnp.bfloat16),
                          jnp.asarray(path_len),
                          jnp.asarray(leaf_dist),
                          jnp.asarray(1.0 / t_count, jnp.float32),
                          jnp.asarray(classes))


def _gemm_block_proba(gf: GemmForest, xb: jnp.ndarray) -> jnp.ndarray:
    # feature pick: one-hot matmul in f32 HIGHEST -> exact value copy, so
    # the <= threshold comparison is bit-identical to sklearn's
    xv = jnp.dot(xb.astype(jnp.float32), gf.selector.astype(jnp.float32),
                 preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    s = jnp.where(xv <= gf.thresholds[None, :], 1.0, -1.0).astype(jnp.bfloat16)
    # +/-1 and {-1,0,1} operands are exact in bf16; f32 accumulation keeps
    # the vote sums (<= max depth) exact
    votes = jnp.dot(s, gf.path, preferred_element_type=jnp.float32)
    fired = (votes == gf.path_len[None, :]).astype(jnp.float32)
    total = jnp.dot(fired, gf.leaf_dist, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return total * gf.inv_trees


@functools.partial(jax.jit, static_argnames=("chunk",))
def gemm_forest_proba(gf: GemmForest, x: jnp.ndarray,
                      chunk: int = 8192) -> jnp.ndarray:
    """Mean forest proba for (N, F) rows — three matmuls, no gathers.
    Pixels stream in ``chunk`` blocks so the (chunk, leaves) intermediates
    stay modest."""
    n, f = x.shape
    if n <= chunk:
        return _gemm_block_proba(gf, x)
    pad = (-n) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    blocks = xp.reshape(-1, chunk, f)
    out = jax.lax.map(lambda xb: _gemm_block_proba(gf, xb), blocks)
    return out.reshape(-1, gf.leaf_dist.shape[-1])[:n]


@functools.partial(jax.jit, static_argnames=("chunk",))
def gemm_forest_predict(gf: GemmForest, x: jnp.ndarray,
                        chunk: int = 8192) -> jnp.ndarray:
    proba = gemm_forest_proba(gf, x, chunk)
    return gf.classes[jnp.argmax(proba, axis=1)]


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
def _traversal_proba(forest: FlatForest, x: jnp.ndarray,
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


# host-side cache: FlatForest buffers -> compiled GemmForest
_GEMM_CACHE: dict = {}
GEMM_MAX_LEAVES = 16384


def _gemm_for(forest: FlatForest, n_features: int) -> Optional[GemmForest]:
    if isinstance(forest.feature, jax.core.Tracer):
        # called under an outer trace: the host-side GEMM compilation can't
        # read values; fall back to the pure-device traversal
        return None
    key = (id(forest.feature), n_features)
    if key in _GEMM_CACHE:
        return _GEMM_CACHE[key][1]
    gf = forest_to_gemm(forest, n_features)
    if gf.path.shape[1] > GEMM_MAX_LEAVES:
        gf = None
    # keep a strong reference to the keyed buffer: id() of a collected
    # array can be recycled, which would silently serve the wrong forest
    _GEMM_CACHE[key] = (forest.feature, gf)
    return gf


_PLAN_CACHE: dict = {}


def forest_tree_plan(gf: GemmForest, min_block: int = 128,
                     max_groups: int = 32):
    """Static tree-grouping plan for the block-diagonal Pallas forest
    kernel: a tuple of ``(m_off, m_cnt, l_off, l_cnt)`` per group, where
    trees are packed contiguously so each group's internal-node columns
    ``[m_off, m_off+m_cnt)`` and leaf rows ``[l_off, l_off+l_cnt)`` cover
    whole trees.

    The path matrix is block-diagonal by tree (a leaf only references its
    own tree's internal nodes — forest_to_gemm walks trees in order), so
    a dense (L, M) votes matmul does ~n_trees x the useful work (measured
    ~1% path occupancy on the bundled model). Grouping G balanced blocks
    cuts the dominant matmul's FLOPs and VMEM by ~G.

    Returns None (caller keeps the dense kernel) when: the forest is a
    tracer (plans need concrete values — thread the plan from a concrete
    caller), any tree is a bare leaf (no root column to detect), or the
    forest is too small to split at ``min_block`` columns per group.
    Cached by buffer identity like ``_gemm_for``."""
    if gf is None or isinstance(gf.path, jax.core.Tracer):
        return None
    key = (id(gf.path), min_block, max_groups)
    if key in _PLAN_CACHE:
        return _PLAN_CACHE[key][1]
    path = np.asarray(gf.path.astype(jnp.float32))
    m, l = path.shape
    plan = None
    if m >= 2 * min_block and float(np.asarray(gf.path_len).min()) >= 1:
        nz = path != 0
        # every leaf's path includes its tree's root (walk starts there),
        # so the first nonzero row per leaf column is the tree root
        root = nz.argmax(axis=0)
        starts_l = np.concatenate(
            [[0], np.flatnonzero(np.diff(root) != 0) + 1])
        roots = root[starts_l]
        if roots[0] == 0:
            tree_m = np.diff(np.concatenate([roots, [m]]))
            tree_l = np.diff(np.concatenate([starts_l, [l]]))
            # pack trees while BOTH the group's internal-node and leaf
            # counts stay within one lane tile (128): padded group dims
            # drive the kernel's per-column elementwise work, so spilling
            # into a 256 pad doubles the VPU cost of compare/fired even
            # as the MXU MACs shrink (measured: 256-pad groups gave only
            # 12% vs the ~2x of 128-pad ones). A single oversized tree
            # raises the bound to its own padded size.
            bound = max(min_block,
                        int(max(tree_m.max(), tree_l.max())))
            bound = ((bound + min_block - 1) // min_block) * min_block
            groups = []
            t0 = 0
            m_acc = l_acc = 0
            for t in range(len(roots)):
                if (m_acc and (m_acc + int(tree_m[t]) > bound
                               or l_acc + int(tree_l[t]) > bound)
                        and len(groups) < max_groups - 1):
                    m_off = int(roots[t0])
                    l_off = int(starts_l[t0])
                    groups.append((m_off, int(roots[t]) - m_off,
                                   l_off, int(starts_l[t]) - l_off))
                    t0 = t
                    m_acc = l_acc = 0
                m_acc += int(tree_m[t])
                l_acc += int(tree_l[t])
            m_off = int(roots[t0])
            l_off = int(starts_l[t0])
            groups.append((m_off, m - m_off, l_off, l - l_off))
            if len(groups) > 1:
                plan = tuple(groups)
    _PLAN_CACHE[key] = (gf.path, plan)
    return plan


def _gemm_chunk(n_leaves: int) -> int:
    """Block size keeping the (chunk, leaves) f32 intermediate <= ~64 MB."""
    return max(512, min(65536, (64 << 20) // max(4 * n_leaves, 1)))


def forest_predict_proba(forest: FlatForest, x: jnp.ndarray,
                         max_depth: int, chunk: int = 65536) -> jnp.ndarray:
    """Mean forest proba; auto-dispatches to the all-matmul GEMM form when
    the forest's leaf count is bounded, else the level traversal."""
    gf = _gemm_for(forest, x.shape[1])
    if gf is not None:
        return gemm_forest_proba(gf, x, _gemm_chunk(gf.path.shape[1]))
    return _traversal_proba(forest, x, max_depth, chunk)


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
