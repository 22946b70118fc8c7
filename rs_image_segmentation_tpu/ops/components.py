"""Connected components, hole filling, and mask post-processing — on device.

The reference delegates these to scipy.ndimage / cv2 on host
(extract.py:299-341). Here they run inside jit:

  * ``connected_components``: iterative min-label propagation (3x3 or cross
    neighborhood min) accelerated with pointer jumping (label <- label[label])
    inside a ``lax.while_loop``; convergence in O(log diameter) rounds for
    typical masks instead of O(diameter).
  * ``remove_small_components``: component areas via scatter-add over the
    (stable) root labels, then a gather-compare — no host sync.
  * ``fill_holes``: border flood over the background inside a while_loop.
  * ``post_process_mask``: the reference's close -> min-area -> open chain
    (advanced_post_processing, extract.py:299-341) with OpenCV-parity
    ellipse elements.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rs_image_segmentation_tpu.ops.morphology import closing, opening


def _neighbor_min(lab: jnp.ndarray, connectivity: int) -> jnp.ndarray:
    big = jnp.asarray(jnp.iinfo(jnp.int32).max, jnp.int32)
    p = jnp.pad(lab, 1, mode="constant", constant_values=big)
    h, w = lab.shape
    views = [lab,
             p[:h, 1:1 + w], p[2:2 + h, 1:1 + w],      # up, down
             p[1:1 + h, :w], p[1:1 + h, 2:2 + w]]      # left, right
    if connectivity == 8:
        views += [p[:h, :w], p[:h, 2:2 + w],
                  p[2:2 + h, :w], p[2:2 + h, 2:2 + w]]
    out = views[0]
    for v in views[1:]:
        out = jnp.minimum(out, v)
    return out


def _seg_min_scan(lab: jnp.ndarray, fg: jnp.ndarray,
                  axis: int) -> jnp.ndarray:
    """Segmented min along ``axis`` within contiguous foreground runs
    (forward + backward associative scans): labels propagate across an
    entire straight run in ONE O(log n) step instead of one pixel per
    while-loop iteration."""
    big = jnp.asarray(jnp.iinfo(jnp.int32).max, jnp.int32)

    def combine(a, b):
        v1, r1 = a
        v2, r2 = b
        return jnp.where(r2, v2, jnp.minimum(v1, v2)), r1 | r2

    resets = ~fg  # background breaks runs and carries big
    v = jnp.where(fg, lab, big)
    fwd, _ = jax.lax.associative_scan(combine, (v, resets), axis=axis)
    bwd, _ = jax.lax.associative_scan(combine, (v, resets), axis=axis,
                                      reverse=True)
    return jnp.where(fg, jnp.minimum(fwd, bwd), big)


@partial(jax.jit, static_argnames=("connectivity", "max_iters"))
def connected_components(mask: jnp.ndarray, connectivity: int = 8,
                         max_iters: int = 4096) -> jnp.ndarray:
    """Label connected components of a binary mask.

    Returns int32 labels where background = -1 and each component carries the
    minimum linear index of its pixels (stable, deterministic IDs; use
    :func:`relabel_sequential` for 1..N ids matching ndimage.label ordering).

    Per while-loop round: 3x3 neighbor min (handles diagonals), segmented
    min-scans along columns then rows (whole straight runs per step), one
    pointer-jump hop. Convergence rounds track the component geometry's
    number of "turns", not its pixel diameter — measured 12/10/21 rounds
    (44/37/74 ms) on the bundled scene's veg/water/built-up masks vs
    83-200 rounds for plain neighbor-min + jumping."""
    h, w = mask.shape
    big = jnp.asarray(jnp.iinfo(jnp.int32).max, jnp.int32)
    fg = mask.astype(bool)
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    lab = jnp.where(fg, idx, big)

    def body(state):
        lab, _, it = state
        nm = _neighbor_min(lab, connectivity)
        nm = jnp.where(fg, nm, big)
        nm = _seg_min_scan(nm, fg, 0)
        nm = _seg_min_scan(nm, fg, 1)
        # pointer jumping: follow the current parent one hop
        flat = nm.reshape(-1)
        safe = jnp.where(flat == big, 0, flat)
        jumped = jnp.where(flat == big, big, flat[safe])
        new = jnp.minimum(flat, jumped).reshape(h, w)
        new = jnp.where(fg, new, big)
        changed = jnp.any(new != lab)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    lab, _, _ = jax.lax.while_loop(cond, body, (lab, jnp.asarray(True), 0))
    return jnp.where(fg, lab, -1)


def connected_components_best(mask: jnp.ndarray, connectivity: int = 8,
                              impl: str = "auto") -> jnp.ndarray:
    """Backend-dispatched connected components, bit-identical across
    implementations.

    ``impl``:
      * ``"auto"`` — the Pallas strip kernel on TPU (veg mask 60 -> 1.6
        ms, built 120 -> 1.9 ms on the bundled scene with the halo-only
        pointer jump), the XLA while-loop graph elsewhere. Also the
        right choice under ``vmap``: the kernel batches as a leading
        grid dim and measured 33.8 ms/scene vs 208.6 for the batched
        XLA graph on a x4 rule-based batch (the vmapped ``while_loop``
        runs every scene to the max round count either way, but a
        Pallas round is ~100x cheaper).
      * ``"xla"`` — always the XLA graph.
      * ``"pallas"`` — always the Pallas kernel (interpreted off-TPU;
        slow, for tests).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from rs_image_segmentation_tpu.ops.pallas_kernels import cc_pallas
        return cc_pallas(mask, connectivity=connectivity,
                         interpret=jax.default_backend() != "tpu")
    return connected_components(mask, connectivity)


def component_areas(labels: jnp.ndarray) -> jnp.ndarray:
    """Pixel count per root label (flat array of size H*W; zero elsewhere)."""
    h, w = labels.shape
    flat = labels.reshape(-1)
    valid = flat >= 0
    safe = jnp.where(valid, flat, 0)
    counts = jnp.zeros(h * w, dtype=jnp.int32).at[safe].add(
        valid.astype(jnp.int32))
    return counts


def remove_small_components(mask: jnp.ndarray, min_area: int,
                            connectivity: int = 8,
                            cc_impl: str = "auto") -> jnp.ndarray:
    """Zero out components with area < min_area (reference extract.py:320-330)."""
    labels = connected_components_best(mask, connectivity, impl=cc_impl)
    counts = component_areas(labels)
    flat = labels.reshape(-1)
    area = jnp.where(flat >= 0, counts[jnp.where(flat >= 0, flat, 0)], 0)
    keep = (area >= min_area).reshape(mask.shape)
    return (mask.astype(bool) & keep).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("connectivity", "bins", "impl",
                                   "return_overflow"))
def remove_small_components_batch(masks: jnp.ndarray, min_areas: jnp.ndarray,
                                  connectivity: int = 8, bins: int = 32768,
                                  impl: str = "auto",
                                  return_overflow: bool = False):
    """Batched :func:`remove_small_components` over (M, H, W) masks with
    per-mask ``min_areas`` (M,), exact vs the per-mask path.

    The TPU route is scatter- and gather-free (XLA's TPU scatter-add
    measured 92 ms and its gather 63 ms for 24 masks at 600^2 — both
    effectively serialized):

      1. all masks stack into ONE tall image with 1-row background
         separators, so one gated Pallas propagation serves the batch;
      2. per-pixel component ids come from a single min-propagation of
         the ROW-RUN-RANK cumsum (run-start flags are elementwise; their
         inclusive cumsum is nondecreasing over the linear order, so its
         per-component min is the rank of the component's FIRST run —
         constant on the component, distinct across components, and
         near-dense within each mask's run range);
      3. areas and keep bits then come from two exact one-hot MXU
         contractions over a (hi, lo) decomposition of the mask-relative
         id (ops.pallas_kernels.hist_dense_pallas / keep_lut_pallas).

    ``bins`` caps ids per mask (must be a multiple of 128 — the
    (hi, lo) one-hot decomposition works in 128-wide lane tiles, so a
    ragged cap would silently disagree with the ``rel < bins`` filter):
    components whose first-run rank within their mask reaches bins are
    dropped as if too small (the bundled scene's noisiest mask has
    ~15.4k runs vs the default 32768). ``return_overflow=True``
    additionally returns an (M,) bool marking masks where the cap was
    actually hit (some component's first-run rank >= bins, i.e. the
    output for that mask may drop large components) — callers reroute
    those masks to the uncapped whole-image path (serving does;
    pipeline.turbo.rule_based_scenes_turbo_batch threads the flag).
    Replaces reference extract.py:320-330 at stage-3 batch shapes."""
    if bins % 128:
        raise ValueError(f"bins must be a multiple of 128, got {bins}")
    m, h, w = masks.shape
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        out = jax.vmap(
            lambda mk, ar: (mk.astype(bool)
                            & (component_areas_per_pixel(
                                mk, connectivity) >= ar)).astype(jnp.uint8)
        )(masks, jnp.asarray(min_areas))
        if return_overflow:   # the XLA path is uncapped — never overflows
            return out, jnp.zeros((m,), bool)
        return out

    from rs_image_segmentation_tpu.ops.pallas_kernels import (
        ccmin_prop_pallas, hist_dense_pallas, keep_lut_pallas)

    interpret = jax.default_backend() != "tpu"
    hs = h + 1                                   # 1-row bg separator
    tall = jnp.pad(masks, ((0, 0), (0, 1), (0, 0))).reshape(m * hs, w)
    fg = tall != 0
    # row-run starts: fg with background (or row edge) on the left
    left_fg = jnp.pad(fg, ((0, 0), (1, 0)))[:, :w]
    starts = fg & ~left_fg
    # inclusive cumsum over the linear order, evaluated as per-row scans
    # plus a tiny row-offset scan — identical values to the flat 8.6M
    # cumsum, ~5x faster (the flat scan serializes; rows vectorize)
    s32 = starts.astype(jnp.int32)
    row_tot = jnp.sum(s32, axis=1)                          # (m*hs,)
    row_off = jnp.cumsum(row_tot) - row_tot                 # exclusive
    r0 = jnp.cumsum(s32, axis=1) + row_off[:, None]
    # seed with MASK-RELATIVE 0-based run ranks (subtract each mask's
    # exclusive run count BEFORE propagating): adding a per-mask constant
    # preserves the min structure and the separator rows stop cross-mask
    # flow, so propagating rel ids is exactly equivalent to propagating
    # the global cumsum. (An int16 propagation — rel ids fit — was built
    # and REJECTED: TPU v5e Mosaic has no sub-32-bit vector minsi OR
    # compare, so int16 labels cannot be min-propagated at all.)
    base = (r0 - s32).reshape(m, hs, w)[:, 0, 0]
    rel0 = (r0.reshape(m, hs, w) - 1 - base[:, None, None]).reshape(m * hs, w)
    # sweep=True: sequential down/up boundary sweeps before the gated
    # halo-exchange passes — information crosses the whole tall stack in
    # two passes instead of one strip per pass (24.2 -> 14.9 ms on the
    # bundled 24-mask stack, bit-identical; round-5 VERDICT #2)
    ids_rel = ccmin_prop_pallas(tall, rel0, connectivity=connectivity,
                                interpret=interpret, sweep=True)
    rel = ids_rel.reshape(m, hs, w)[:, :h, :]
    # exact cap-hit flag: a component is mislabeled iff its propagated
    # first-run rank reaches bins (run COUNT > bins alone is fine — many
    # runs can merge into few low-rank components) — one cheap reduction
    rel_max = jnp.max(jnp.where(masks != 0, rel, -1), axis=(1, 2))
    overflow = rel_max >= bins
    rel = jnp.where((masks != 0) & (rel < bins), rel, bins)
    npix = h * w
    k = 4096
    pad = (-npix) % k
    rel_rows = jnp.pad(rel.reshape(m, npix), ((0, 0), (0, pad)),
                       constant_values=bins).reshape(m, -1, k)
    ma = jnp.asarray(min_areas, jnp.float32)

    def hist_keep(b):
        # the one-hot area histogram and keep-LUT both cost ~b MACs per
        # pixel; in the branch below ids are < b by the cond predicate
        # (background/filtered pixels carry id == bins — out of every
        # tier's range, contributing nothing, exactly like before)
        def run():
            counts = hist_dense_pallas(rel_rows, bins_hi=b // 128,
                                       interpret=interpret)
            keepmat_t = (counts >= ma[:, None, None]).astype(jnp.float32)
            keepmat_t = jnp.swapaxes(keepmat_t, 1, 2)   # (M, 128, b//128)
            return keep_lut_pallas(rel_rows, keepmat_t,
                                   interpret=interpret)
        return run

    # tiered bins (round 5): the batch's actual max id is already on
    # device (the overflow reduction), so a lax.cond dispatches the
    # histogram/keep pair at the smallest sufficient power-of-two tier —
    # the bundled rule stacks (max rank ~15.7k / ~6.6k) take the 16k /
    # 8k tiers, halving/quartering the two dominant MXU stages, while a
    # pathological stack still gets the full-bins exact path. Branches
    # return the same (M, n_chunks, k) keep shape, so this is shape-
    # static; only the executed branch's FLOPs are paid.
    tiers = [t for t in (bins // 4, bins // 2)
             if t >= 128 and t % 128 == 0]
    if interpret or not tiers:   # tests: one traced pallas path, not 3
        keep = hist_keep(bins)()
    else:
        mx = jnp.max(rel_max)
        branch = hist_keep(bins)
        for t in reversed(tiers):           # smallest tier innermost
            branch = (lambda tt, inner: lambda: jax.lax.cond(
                mx < tt, hist_keep(tt), inner))(t, branch)
        keep = branch()
    keep = keep.reshape(m, npix + pad)[:, :npix].reshape(m, h, w)
    out = (masks.astype(bool) & (keep != 0)).astype(jnp.uint8)
    if return_overflow:
        return out, overflow
    return out


def component_areas_per_pixel(mask: jnp.ndarray, connectivity: int = 8
                              ) -> jnp.ndarray:
    """Area of each pixel's component (0 at background) via the XLA
    labels + scatter/gather path — the off-TPU reference implementation
    for :func:`remove_small_components_batch`."""
    labels = connected_components(mask, connectivity)
    counts = component_areas(labels)
    flat = labels.reshape(-1)
    area = jnp.where(flat >= 0, counts[jnp.where(flat >= 0, flat, 0)], 0)
    return area.reshape(mask.shape)


@partial(jax.jit, static_argnames=("max_iters",))
def fill_holes(mask: jnp.ndarray, max_iters: int = 4096) -> jnp.ndarray:
    """scipy.ndimage.binary_fill_holes equivalent: holes are background
    regions not 4-connected to the border."""
    fg = mask.astype(bool)
    bg = ~fg
    h, w = fg.shape
    border = jnp.zeros_like(bg).at[0, :].set(True).at[-1, :].set(True) \
        .at[:, 0].set(True).at[:, -1].set(True)
    reach = bg & border

    def seg_or_scan(v, axis):
        # segmented OR within contiguous bg runs (fwd+bwd): reachability
        # crosses a whole straight corridor per step
        def combine(a, b):
            v1, r1 = a
            v2, r2 = b
            return jnp.where(r2, v2, v1 | v2), r1 | r2
        resets = fg
        fwd, _ = jax.lax.associative_scan(combine, (v, resets), axis=axis)
        bwd, _ = jax.lax.associative_scan(combine, (v, resets), axis=axis,
                                          reverse=True)
        return (fwd | bwd) & bg

    def body(state):
        reach, _, it = state
        p = jnp.pad(reach, 1)
        grown = (reach | p[:h, 1:1 + w] | p[2:, 1:1 + w]
                 | p[1:1 + h, :w] | p[1:1 + h, 2:]) & bg
        grown = seg_or_scan(grown, 0)
        grown = seg_or_scan(grown, 1)
        return grown, jnp.any(grown != reach), it + 1

    reach, _, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < max_iters), body,
        (reach, jnp.asarray(True), 0))
    return (fg | (bg & ~reach)).astype(jnp.uint8)


def post_process_mask(mask: jnp.ndarray, min_area: int = 100,
                      smooth_kernel_size: int = 3,
                      do_fill_holes: bool = True,
                      cc_impl: str = "auto") -> jnp.ndarray:
    """The reference's ``advanced_post_processing`` (extract.py:299-341):
    ellipse close (as its hole filler when the kernel is odd) -> remove
    small 8-connected components -> ellipse open."""
    out = mask.astype(jnp.uint8)
    odd = smooth_kernel_size > 0 and smooth_kernel_size % 2 == 1
    if do_fill_holes and odd:
        out = closing(out, smooth_kernel_size, shape="ellipse")
    elif do_fill_holes:
        out = fill_holes(out)
    if min_area > 0:
        out = remove_small_components(out, min_area, connectivity=8,
                                      cc_impl=cc_impl)
    if odd:
        out = opening(out, smooth_kernel_size, shape="ellipse")
    return out
