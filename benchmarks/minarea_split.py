"""Micro-split of the rule batch's dominant min-area pass + kmeans singles.

Stages of remove_small_components_batch on the REAL 24-mask rule stack
(veg/water/built after closing, 8 bundled scenes), each measured as a
standalone jitted program via enqueue-N: id-prep (cumsums), CC
propagation, hist, keep. Then the kmeans single-scene program split:
stack, minmax, fit, assignment.
"""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))
from _common import enqueue_n, load_bundled_forest  # noqa: E402


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        _HERE, "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from rs_image_segmentation_tpu.core.config import RuleBasedConfig
    from rs_image_segmentation_tpu.ops.morphology import closing
    from rs_image_segmentation_tpu.ops.pallas_kernels import (
        ccmin_prop_pallas, hist_dense_pallas, keep_lut_pallas)
    from rs_image_segmentation_tpu.ops.threshold import threshold_binary
    from rs_image_segmentation_tpu.pipeline import turbo as T
    from rs_image_segmentation_tpu.pipeline.preprocess import (
        build_stretch_stats)

    arr, cal, cfg, forest, depth, gf = load_bundled_forest()
    gains, biases = np.asarray(cal.gains), np.asarray(cal.biases)
    batch = np.ascontiguousarray(np.broadcast_to(arr, (8,) + arr.shape)).copy()
    stats = [build_stretch_stats(s, gains, biases) for s in batch]
    luts = np.stack([p[0] for p in stats]).astype(np.uint8)
    sps = np.stack([p[1] for p in stats])
    hists = np.stack([p[2] for p in stats])
    bd, ld = jnp.asarray(batch), jnp.asarray(luts)
    sd, hd = jnp.asarray(sps), jnp.asarray(hists)
    rc = RuleBasedConfig()
    b, c, h, w = batch.shape

    # build the real 24-mask stack once on host
    @jax.jit
    def build_stack(scenes, luts_, sp, hh):
        ndvi, ndwi, mndwi, ndbi = jax.vmap(
            lambda s, l, p, hhh: T._rule_front(s, l, cfg, p, hhh)
        )(scenes, luts_, sp, hh)
        veg = closing(threshold_binary(ndvi, rc.ndvi_threshold), 3,
                      shape="ellipse")
        water = closing(threshold_binary(mndwi, rc.mndwi_threshold), 3,
                        shape="ellipse")
        built = closing(
            (threshold_binary(ndbi, rc.ndbi_threshold).astype(bool)
             & threshold_binary(ndvi, rc.ndvi_threshold_for_builtup,
                                above=False).astype(bool)).astype(jnp.uint8),
            5, shape="ellipse")
        return jnp.concatenate([veg, water, built])

    stack3 = jax.device_get(build_stack(bd, ld, sd, hd))
    masks = jnp.asarray(stack3)                     # (24, 600, 600)
    m = masks.shape[0]
    bins = 32768
    hs = h + 1

    @jax.jit
    def idprep(masks_):
        tall = jnp.pad(masks_, ((0, 0), (0, 1), (0, 0))).reshape(m * hs, w)
        fg = tall != 0
        left_fg = jnp.pad(fg, ((0, 0), (1, 0)))[:, :w]
        starts = fg & ~left_fg
        s32 = starts.astype(jnp.int32)
        row_tot = jnp.sum(s32, axis=1)
        row_off = jnp.cumsum(row_tot) - row_tot
        r0 = jnp.cumsum(s32, axis=1) + row_off[:, None]
        base = (r0 - s32).reshape(m, hs, w)[:, 0, 0]
        rel0 = (r0.reshape(m, hs, w) - 1
                - base[:, None, None]).reshape(m * hs, w)
        return tall, rel0

    tall_h, rel0_h = jax.device_get(idprep(masks))
    tall, rel0 = jnp.asarray(tall_h), jnp.asarray(rel0_h)

    @jax.jit
    def ccprop(tall_, rel0_):
        return ccmin_prop_pallas(tall_, rel0_, connectivity=8, sweep=True)

    ids_rel = jax.device_get(ccprop(tall, rel0))
    rel = jnp.asarray(ids_rel).reshape(m, hs, w)[:, :h, :]
    relmax_pm = np.asarray(jax.device_get(
        jnp.max(jnp.where(masks != 0, rel, -1), axis=(1, 2))))
    print("per-mask max rel id:", relmax_pm.reshape(3, 8)[:, 0],
          "(veg/water/built, scene 0)")

    relc = jnp.where((masks != 0) & (rel < bins), rel, bins)
    npix = h * w
    k = 4096
    pad = (-npix) % k
    rel_rows_h = jax.device_get(jnp.pad(
        relc.reshape(m, npix), ((0, 0), (0, pad)),
        constant_values=bins).reshape(m, -1, k))
    rel_rows = jnp.asarray(rel_rows_h)
    tier = 16384                                    # the executed tier
    ma = jnp.full((m,), 100.0, jnp.float32)

    @jax.jit
    def hist_only(rr):
        return hist_dense_pallas(rr, bins_hi=tier // 128)

    counts_h = jax.device_get(hist_only(rel_rows))
    counts = jnp.asarray(counts_h)

    @jax.jit
    def keep_only(rr, cnts):
        kt = (cnts >= ma[:, None, None]).astype(jnp.float32)
        return keep_lut_pallas(rr, jnp.swapaxes(kt, 1, 2))

    mp8 = 8 * h * w / 1e6
    rows = [
        ("idprep(cumsums)", lambda: idprep(masks)),
        ("ccprop(sweep)", lambda: ccprop(tall, rel0)),
        ("hist@16k", lambda: hist_only(rel_rows)),
        ("keep@16k", lambda: keep_only(rel_rows, counts)),
    ]
    for name, f in rows:
        dt = enqueue_n(f, n=20, repeats=3) * 1e3
        print(f"{name:18s} {dt:7.2f} ms/batch")

    # ---- kmeans single-scene split
    a1, l1, s1, h1 = bd[0], ld[0], sd[0], hd[0]

    @jax.jit
    def km_stack(s, l, p, hh):
        return T._stack_cm_from_parts(*T._preamble(s, l, p, hh), cfg)

    stk = km_stack(a1, l1, s1, h1)

    @jax.jit
    def km_scale(stk_):
        f = stk_.shape[0]
        x_cm = stk_.reshape(1, f, h * w)
        mn = jnp.min(x_cm, axis=2, keepdims=True)
        rng_ = jnp.max(x_cm, axis=2, keepdims=True) - mn
        return (x_cm - mn) / jnp.where(rng_ > 0, rng_, 1.0)

    xs_cm = km_scale(stk)

    from rs_image_segmentation_tpu.models.kmeans import kmeans_fit_predict

    @jax.jit
    def km_fit(xs):
        xfit = jnp.swapaxes(xs[:, :, ::8], 1, 2)[0]
        _, state = kmeans_fit_predict(xfit, 7, seed=42)
        return state.centroids

    cents = km_fit(xs_cm)

    @jax.jit
    def km_assign(xs, cents_):
        cross = jnp.einsum("kf,bfn->bkn", cents_, xs,
                           preferred_element_type=jnp.float32,
                           precision=T._HIGH)
        cn = jnp.sum(cents_ * cents_, axis=1)
        return jnp.argmin(cn[None, :, None] - 2.0 * cross, axis=1)

    def km_full():
        return T.kmeans_scenes_turbo_batch(
            bd[:1], ld[:1], cfg=cfg, stretch_params=sd[:1],
            stretch_hists=hd[:1])

    rows = [
        ("km_stack_x1", lambda: km_stack(a1, l1, s1, h1)),
        ("km_scale_x1", lambda: km_scale(stk)),
        ("km_fit_s8_x1", lambda: km_fit(xs_cm)),
        ("km_assign_x1", lambda: km_assign(xs_cm, cents)),
        ("km_full_b1", km_full),
    ]
    for name, f in rows:
        dt = enqueue_n(f, n=20, repeats=3) * 1e3
        print(f"{name:18s} {dt:7.2f} ms/scene")


if __name__ == "__main__":
    main()
