#!/usr/bin/env python3
"""Device-trace the rule batch's CC propagation: where do 24 ms go?

Captures a jax.profiler trace of ccmin_prop_pallas on the real 24-mask
stack and prints the longest device-lane events, so the round-5 kernel
work attacks measured costs (outer-pass overheads vs inner rounds).
"""
import gzip
import glob
import json
import os
import sys
import collections

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from rs_image_segmentation_tpu.ops.pallas_kernels import ccmin_prop_pallas

    rng = np.random.default_rng(0)
    # synthetic stand-in shaped like the real 24-mask stack (smooth blobs
    # + speckle; run counts in the real range)
    base = rng.random((24 * 601 // 8, 600 // 8)) > 0.45
    m = np.kron(base, np.ones((8, 8), bool)) ^ (
        rng.random((24 * 601 // 8 * 8, 600 // 8 * 8)) > 0.97)
    tall = np.zeros((24 * 601, 600), np.uint8)
    tall[:m.shape[0], :m.shape[1]] = m
    tall[600::601, :] = 0
    v = rng.integers(0, 32000, size=tall.shape).astype(np.int32)
    tall_d, v_d = jnp.asarray(tall), jnp.asarray(v)

    out = ccmin_prop_pallas(tall_d, v_d)
    np.asarray(out.ravel()[-1:])

    tdir = "/tmp/cc_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(5):
            out = ccmin_prop_pallas(tall_d, v_d)
        np.asarray(out.ravel()[-1:])

    files = sorted(glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not files:
        print("NO TRACE FILES — profiler not supported on this tunnel")
        os._exit(1)
    with gzip.open(files[-1]) as f:
        events = json.load(f)["traceEvents"]
    process_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            process_names[e["pid"]] = e["args"].get("name", "")
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = process_names.get(e.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname:
            continue
        agg[e["name"]] += e.get("dur", 0)
        cnt[e["name"]] += 1
    print(f"TPU processes: {set(v for v in process_names.values() if 'PU' in v)}")
    for name, dur in agg.most_common(25):
        print(f"{dur/1e3/5:9.3f} ms/call x{cnt[name]/5:6.1f}  {name[:110]}")
    os._exit(0)


if __name__ == "__main__":
    main()
