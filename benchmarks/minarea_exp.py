"""Experiments on the rule min-area pass's two dominant stages.

E1: ccmin_prop cache_masks=False (2x-taller strips) on the real 24-mask
    rule stack — docstring says per-grid-step overhead dominates.
E2: hist_dense variant that builds BOTH one-hots lane-major and lets the
    MXU contract lanes-vs-lanes (A @ B^T form) — the shipping kernel
    transposes the (1, K) id row to (K, 1) per chunk to feed the lo
    one-hot, suspected to be the 3 ms gap vs keep_lut at equal MACs.
Correctness is asserted vs the shipping outputs.
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rs_image_segmentation_tpu.core.config import RuleBasedConfig
    from rs_image_segmentation_tpu.ops.morphology import closing
    from rs_image_segmentation_tpu.ops.pallas_kernels import (
        ccmin_prop_pallas, hist_dense_pallas)
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

    masks = jnp.asarray(jax.device_get(build_stack(bd, ld, sd, hd)))
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

    ref_ids = jax.device_get(jax.jit(lambda t, r: ccmin_prop_pallas(
        t, r, connectivity=8, sweep=True))(tall, rel0))

    # ---- E1: cache_masks=False
    @jax.jit
    def cc_nocache(t, r):
        return ccmin_prop_pallas(t, r, connectivity=8, sweep=True,
                                 cache_masks=False)

    got = jax.device_get(cc_nocache(tall, rel0))
    assert (got == ref_ids).all(), "E1 mismatch"
    dt = enqueue_n(lambda: cc_nocache(tall, rel0), n=20, repeats=3) * 1e3
    print(f"E1 ccprop nocache   {dt:7.2f} ms/batch (shipping 14.3)")

    # ---- E2: lane-major hist (A @ B^T)
    _HIST_LO = 128

    def _hist_kernel_v2(n_chunks, bins_hi, ids_ref, counts_ref):
        dt_ = jnp.bfloat16
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (bins_hi, 1), 0)
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (_HIST_LO, 1), 0)

        def body(j, acc):
            row = ids_ref[0, pl.ds(j, 1), :]                # (1, K)
            oh_hi = (iota_hi == (row >> 7)).astype(dt_)     # (bins_hi, K)
            oh_lo_t = (iota_lo == (row & 127)).astype(dt_)  # (128, K)
            return acc + jax.lax.dot_general(
                oh_hi, oh_lo_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        acc = jnp.zeros((bins_hi, _HIST_LO), jnp.float32)
        counts_ref[0] = jax.lax.fori_loop(0, n_chunks, body, acc)

    def hist_v2(ids, bins_hi):
        m_, nc, k = ids.shape
        return pl.pallas_call(
            functools.partial(_hist_kernel_v2, nc, bins_hi),
            out_shape=jax.ShapeDtypeStruct((m_, bins_hi, _HIST_LO),
                                           jnp.float32),
            grid=(m_,),
            in_specs=[pl.BlockSpec((1, nc, k), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, bins_hi, _HIST_LO),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(ids)

    rel = jnp.asarray(ref_ids).reshape(m, hs, w)[:, :h, :]
    relc = jnp.where((masks != 0) & (rel < bins), rel, bins)
    npix = h * w
    k = 4096
    pad = (-npix) % k
    rel_rows = jnp.asarray(jax.device_get(jnp.pad(
        relc.reshape(m, npix), ((0, 0), (0, pad)),
        constant_values=bins).reshape(m, -1, k)))
    tier = 16384

    ref_counts = jax.device_get(jax.jit(
        lambda rr: hist_dense_pallas(rr, bins_hi=tier // 128))(rel_rows))
    got_counts = jax.device_get(jax.jit(
        lambda rr: hist_v2(rr, tier // 128))(rel_rows))
    assert (got_counts == ref_counts).all(), "E2 mismatch"
    f2 = jax.jit(lambda rr: hist_v2(rr, tier // 128))
    dt = enqueue_n(lambda: f2(rel_rows), n=20, repeats=3) * 1e3
    print(f"E2 hist v2 lane-major {dt:7.2f} ms/batch (shipping 4.75)")

    # ---- E3: kmeans seeding vs Lloyd split
    from rs_image_segmentation_tpu.models.kmeans import (
        kmeans_fit_predict, kmeans_plus_plus_init, lloyd_step)

    @jax.jit
    def km_stack(s, l, p, hh):
        return T._stack_cm_from_parts(*T._preamble(s, l, p, hh), cfg)

    stk = km_stack(bd[0], ld[0], sd[0], hd[0])
    f = stk.shape[0]
    x_cm = stk.reshape(1, f, h * w)
    mn = jnp.min(x_cm, axis=2, keepdims=True)
    rng_ = jnp.max(x_cm, axis=2, keepdims=True) - mn
    xs_cm = (x_cm - mn) / jnp.where(rng_ > 0, rng_, 1.0)
    xfit = jnp.asarray(jax.device_get(
        jnp.swapaxes(xs_cm[:, :, ::8], 1, 2)[0]))

    @jax.jit
    def seed_only(xf):
        return kmeans_plus_plus_init(jax.random.PRNGKey(42), xf, 7)

    cents0 = seed_only(xfit)

    @jax.jit
    def lloyd10(xf, c0):
        def body(_, c):
            new, _, _ = lloyd_step(xf, c)
            return new
        return jax.lax.fori_loop(0, 10, body, c0)

    @jax.jit
    def fit_only(xf):
        _, st = kmeans_fit_predict(xf, 7, seed=42)
        return st.centroids, st.n_iter

    _, n_iter = jax.device_get(fit_only(xfit))
    print(f"E3 lloyd converged in {int(n_iter)} iterations")
    for name, fn in [("seed_only", lambda: seed_only(xfit)),
                     ("lloyd10", lambda: lloyd10(xfit, cents0)),
                     ("fit_full", lambda: fit_only(xfit))]:
        dt = enqueue_n(fn, n=20, repeats=3) * 1e3
        print(f"E3 {name:12s} {dt:7.2f} ms")


if __name__ == "__main__":
    main()
