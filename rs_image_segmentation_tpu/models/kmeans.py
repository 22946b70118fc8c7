"""KMeans — Lloyd iterations entirely on device, MXU-shaped.

Replaces sklearn.KMeans (reference extract.py:508-581: MinMaxScaler +
KMeans(random_state=42, n_init='auto') on 360k x 19). Design:

  * distances: ||x||^2 - 2 x @ C^T + ||c||^2 — the N x K pairwise matrix is
    one (N, F) @ (F, K) MXU matmul per iteration.
  * assignment: row argmin.
  * update: counts and sums via one-hot contraction (K, N) @ (N, F) — again
    the MXU, no scatter.
  * init: k-means++ via the Gumbel-max trick so the *same code* works under
    ``shard_map`` with pixels sharded across a mesh axis: per-candidate
    weights only need a global max (``lax.pmax``) and sums a ``psum``.
  * empty clusters: relocated to the point farthest from its centroid
    (sklearn's strategy, deterministic variant).

Bit-parity with sklearn's RNG is impossible by construction; the pipeline
absorbs label permutation through the evaluation stage's cluster->class
majority mapping (reference 4_evaluate.py:97-128), and tests assert
assignment-quality parity (inertia within 1%).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class KMeansState(NamedTuple):
    centroids: jnp.ndarray  # (K, F)
    inertia: jnp.ndarray    # scalar
    n_iter: jnp.ndarray     # scalar int


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name else x


def _pmax(x, axis_name):
    return jax.lax.pmax(x, axis_name) if axis_name else x


def _sq_dists(x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    xn = jnp.sum(x * x, axis=1, keepdims=True)
    cn = jnp.sum(c * c, axis=1)[None, :]
    cross = jnp.dot(x, c.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(xn - 2.0 * cross + cn, 0.0)


def kmeans_plus_plus_init(key: jax.Array, x: jnp.ndarray, k: int,
                          axis_name: Optional[str] = None) -> jnp.ndarray:
    """k-means++ seeding. Sampling 'index ~ weights' is done with the
    Gumbel-max trick so a sharded global argmax suffices; ties cannot occur
    (continuous perturbation). Runs fine single-device (axis_name=None)."""
    n, f = x.shape
    shard_off = 0
    if axis_name:
        shard_off = jax.lax.axis_index(axis_name) * n

    def pick(weights, subkey):
        # gumbel-max over log weights; -inf where weight == 0
        g = jax.random.gumbel(subkey, (n,), dtype=jnp.float32)
        logits = jnp.where(weights > 0, jnp.log(jnp.where(weights > 0, weights, 1.0)), -jnp.inf)
        scores = logits + g
        best = jnp.argmax(scores)
        best_score = scores[best]
        global_best = _pmax(best_score, axis_name)
        mine = best_score == global_best
        cand = jnp.where(mine, x[best], 0.0)
        # exactly one shard wins (continuous scores) -> sum selects it
        return _psum(cand, axis_name) if axis_name else cand

    keys = jax.random.split(key, k)
    first = pick(jnp.ones((n,), jnp.float32), keys[0])
    cents = jnp.zeros((k, f), jnp.float32).at[0].set(first)

    def body(i, carry):
        cents, d2 = carry
        new_d2 = jnp.minimum(d2, _sq_dists(x, cents[i - 1][None, :])[:, 0])
        c = pick(new_d2, keys[i])
        return cents.at[i].set(c), new_d2

    d2 = jnp.full((n,), jnp.inf, jnp.float32)
    if axis_name:
        # mark the carry as varying over the mesh axis for shard_map's
        # varying-manual-axes type system
        d2 = jax.lax.pcast(d2, axis_name, to="varying")
    cents, _ = jax.lax.fori_loop(1, k, body, (cents, d2))
    return cents


def lloyd_step(x: jnp.ndarray, centroids: jnp.ndarray,
               axis_name: Optional[str] = None,
               xn: Optional[jnp.ndarray] = None):
    """One Lloyd iteration. Returns (new_centroids, labels, inertia).

    ``xn``: optional precomputed per-row squared norms (N, 1). ``x`` is
    loop-invariant across Lloyd iterations but XLA does not hoist the
    norm reduction out of the ``while_loop`` body, so recomputing it
    cost one full pass over ``x`` per iteration (~0.3 ms of the 3.3 ms
    65-iteration fit on the stride-8 subsample); the caller computes it
    once. Bit-identical: the same reduction on the same input."""
    k = centroids.shape[0]
    if xn is None:
        xn = jnp.sum(x * x, axis=1, keepdims=True)
    cn = jnp.sum(centroids * centroids, axis=1)[None, :]
    cross = jnp.dot(x, centroids.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(xn - 2.0 * cross + cn, 0.0)
    labels = jnp.argmin(d2, axis=1)
    mind2 = jnp.min(d2, axis=1)
    inertia = _psum(jnp.sum(mind2), axis_name)
    onehot = (labels[:, None] == jnp.arange(k)[None, :]).astype(jnp.float32)
    counts = _psum(jnp.sum(onehot, axis=0), axis_name)
    sums = _psum(jnp.dot(onehot.T, x, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST), axis_name)
    new = sums / jnp.where(counts > 0, counts, 1.0)[:, None]

    # relocate empty clusters to the globally farthest point
    far = jnp.argmax(mind2)
    far_val = mind2[far]
    gfar = _pmax(far_val, axis_name)
    far_pt = jnp.where(far_val == gfar, x[far], 0.0)
    if axis_name:
        far_pt = jax.lax.psum(far_pt, axis_name)
        # if several shards tie (unlikely), normalize by the tie count
        ties = jax.lax.psum(jnp.where(far_val == gfar, 1.0, 0.0), axis_name)
        far_pt = far_pt / jnp.maximum(ties, 1.0)
    new = jnp.where((counts > 0)[:, None], new, far_pt[None, :])
    return new, labels, inertia


@functools.partial(jax.jit, static_argnames=("k", "max_iter", "axis_name"))
def kmeans_fit_predict(x: jnp.ndarray, k: int, seed: int = 42,
                       max_iter: int = 300, tol: float = 1e-4,
                       axis_name: Optional[str] = None,
                       init_centroids: Optional[jnp.ndarray] = None):
    """Fit + predict. ``x`` is (N, F) float32, pre-scaled by the caller.

    tol semantics follow sklearn: convergence when the squared centroid
    shift <= tol * mean per-feature variance of the data.

    ``init_centroids``: optional (K, F) warm start — Lloyd starts from
    these instead of k-means++ seeding (still convergence-gated by
    ``tol``/``max_iter``). The serving engine uses it to seed each batch
    from the previous batch's converged shared-fit centroids.
    """
    x = x.astype(jnp.float32)
    n = x.shape[0]
    n_total = _psum(jnp.asarray(n, jnp.float32), axis_name)
    mean = _psum(jnp.sum(x, axis=0), axis_name) / n_total
    var = _psum(jnp.sum((x - mean) ** 2, axis=0), axis_name) / n_total
    tol_abs = tol * jnp.mean(var)

    if init_centroids is not None:
        init = init_centroids.astype(jnp.float32)
        if init.shape[0] != k:
            raise ValueError(f"init_centroids has {init.shape[0]} rows, "
                             f"expected k={k}")
    else:
        key = jax.random.PRNGKey(seed)
        init = kmeans_plus_plus_init(key, x, k, axis_name)

    def cond(carry):
        _, shift, it = carry
        return (shift > tol_abs) & (it < max_iter)

    xn = jnp.sum(x * x, axis=1, keepdims=True)   # hoisted loop invariant

    def body(carry):
        cents, _, it = carry
        # the in-loop inertia is NOT carried: the final lloyd_step below
        # recomputes it on the converged centroids (the returned value),
        # and XLA cannot dead-code a while-loop carry element
        new, _, _ = lloyd_step(x, cents, axis_name, xn=xn)
        shift = jnp.sum((new - cents) ** 2)
        return new, shift, it + 1

    cents, _, n_iter = jax.lax.while_loop(
        cond, body, (init, jnp.asarray(jnp.inf), 0))
    # final assignment against converged centroids
    _, labels, inertia = lloyd_step(x, cents, axis_name, xn=xn)
    return labels, KMeansState(cents, inertia, n_iter)


def minmax_scale_features(x: jnp.ndarray) -> jnp.ndarray:
    """sklearn.MinMaxScaler equivalent (reference extract.py:572-574)."""
    mn = jnp.min(x, axis=0, keepdims=True)
    mx = jnp.max(x, axis=0, keepdims=True)
    rng = mx - mn
    return (x - mn) / jnp.where(rng > 0, rng, 1.0)
