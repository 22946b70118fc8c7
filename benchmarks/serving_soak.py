#!/usr/bin/env python3
"""Serving saturation + latency decomposition (round-5 VERDICT #6).

Drives the CURRENT engine (LRU program cache + batched method programs +
round-5 guards) over real HTTP:

  1. warm single-request latency, 40 sequential requests, BOTH through
     per-request connections (the round-4 protocol) and a keep-alive
     ServingSession — plus the server's X-Decode/Engine/Encode-Ms
     decomposition, so the client-server gap (connect + wire) is
     attributable;
  2. a 200-request concurrent soak (16 client threads), mixed methods
     (RF + kmeans + rule_based), bit-equality asserted against the
     single-request path per method.

    python benchmarks/serving_soak.py [--requests 200] [--threads 16]
"""

import argparse
import json
import os
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=200)
    ap.add_argument("--threads", type=int, default=16)
    ap.add_argument("--port", type=int, default=8473)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from benchmarks._common import load_bundled_forest
    from rs_image_segmentation_tpu.serving import client as C
    from rs_image_segmentation_tpu.serving.engine import (EngineConfig,
                                                          InferenceEngine)
    from rs_image_segmentation_tpu.serving.server import make_server

    arr, cal, cfg, forest, depth, gf = load_bundled_forest()
    engine = InferenceEngine(forest, depth, engine_cfg=EngineConfig())
    srv = make_server(engine, "127.0.0.1", args.port)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{args.port}"

    # warm all three method programs at bucket 1 and the soak bucket
    engine.warmup([(600, 600)], buckets=None,
                  methods=["random_forest", "kmeans", "rule_based"])

    # reference outputs per method through the single-request path
    ref = {m: C.classify_array(base, arr, method=m)
           for m in ("random_forest", "kmeans", "rule_based")}

    # ---- 1. warm sequential latency: fresh-connection vs keep-alive ----
    n_seq = 40
    lat_fresh = []
    for _ in range(n_seq):
        t0 = time.perf_counter()
        C.classify_array(base, arr, method="random_forest")
        lat_fresh.append(time.perf_counter() - t0)
    with C.ServingSession(base) as sess:
        sess.classify_array(arr, method="random_forest")   # prime
        lat_keep = []
        for _ in range(n_seq):
            t0 = time.perf_counter()
            sess.classify_array(arr, method="random_forest")
            lat_keep.append(time.perf_counter() - t0)
        timing = dict(sess.last_timing)

    def pct(xs, q):
        return float(np.percentile(np.asarray(xs) * 1e3, q))

    print(json.dumps({
        "warm_fresh_conn_p50_ms": round(pct(lat_fresh, 50), 1),
        "warm_fresh_conn_p90_ms": round(pct(lat_fresh, 90), 1),
        "warm_keepalive_p50_ms": round(pct(lat_keep, 50), 1),
        "warm_keepalive_p90_ms": round(pct(lat_keep, 90), 1),
        "server_decompose_ms": timing}), flush=True)

    # ---- 2. mixed-method concurrent soak ------------------------------
    methods = ("random_forest", "kmeans", "rule_based")
    scenes = [np.roll(arr, i % 11, axis=2) for i in range(args.requests)]
    ref_rolled = {m: {} for m in methods}
    results = [None] * args.requests
    sessions = [C.ServingSession(base) for _ in range(args.threads)]
    free = list(range(args.threads))
    lock = threading.Lock()

    def one(i):
        with lock:
            sid = free.pop()
        try:
            m = methods[i % 3]
            t0 = time.perf_counter()
            out = sessions[sid].classify_array(scenes[i], method=m)
            results[i] = (m, i % 11, out, time.perf_counter() - t0)
        finally:
            with lock:
                free.append(sid)

    t0 = time.perf_counter()
    with ThreadPoolExecutor(args.threads) as pool:
        list(pool.map(one, range(args.requests)))
    dt = time.perf_counter() - t0
    for s in sessions:
        s.close()

    mp = arr.shape[1] * arr.shape[2] / 1e6
    lats = [r[3] for r in results]
    # bit-equality: every response equals the single-request path for
    # its method+roll (compute refs lazily per distinct roll)
    mismatches = 0
    for m, roll, out, _ in results:
        if roll not in ref_rolled[m]:
            ref_rolled[m][roll] = C.classify_array(
                base, np.roll(arr, roll, axis=2), method=m)
        if not np.array_equal(out, ref_rolled[m][roll]):
            mismatches += 1
    st = C.stats(base)
    print(json.dumps({
        "soak_requests": args.requests,
        "soak_threads": args.threads,
        "soak_seconds": round(dt, 2),
        "soak_scenes_per_s": round(args.requests / dt, 2),
        "soak_mp_per_s": round(args.requests * mp / dt, 3),
        "soak_p50_ms": round(pct(lats, 50), 0),
        "soak_p90_ms": round(pct(lats, 90), 0),
        "bit_mismatches": mismatches,
        "engine_batches": st.get("batches"),
        "engine_scenes": st.get("scenes")}), flush=True)
    os._exit(0 if mismatches == 0 else 2)


if __name__ == "__main__":
    main()
