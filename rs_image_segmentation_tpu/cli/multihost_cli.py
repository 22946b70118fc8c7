"""``rs-seg-multihost-rehearse``: run the multi-host (DCN) path locally.

Spawns N real distributed processes (Gloo CPU collectives, M virtual
devices each), forms the N*M-device global mesh, classifies a scene
batch sharded across all of them, and checks bit-equality with the
single-process program. On a real TPU pod the same code path runs with
``parallel.multihost.init_multihost()`` (no arguments) per host.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time


def multihost_rehearse_cli(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Local multi-host (DCN) rehearsal over Gloo CPU "
                    "collectives")
    p.add_argument("--nproc", type=int, default=2,
                   help="distributed processes to spawn")
    p.add_argument("--devices-per-process", type=int, default=2,
                   help="virtual CPU devices per process")
    p.add_argument("--timeout", type=float, default=900.0,
                   help="overall wall-clock budget for the whole run")
    args = p.parse_args(argv)

    from rs_image_segmentation_tpu.parallel.multihost import free_local_port
    port = free_local_port()

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)      # workers pin cpu via jax.config
    procs = [subprocess.Popen(
        [sys.executable, "-m",
         "rs_image_segmentation_tpu.parallel.multihost_worker",
         str(pid), str(args.nproc), str(port),
         str(args.devices_per_process)], env=env)
        for pid in range(args.nproc)]

    # one shared deadline; the moment any worker fails, kill the rest —
    # peers blocked in jax.distributed.initialize would otherwise hang
    # out the full timeout each
    deadline = time.monotonic() + args.timeout
    failed = None
    live = list(procs)
    while live and failed is None:
        if time.monotonic() > deadline:
            failed = ("timeout", None)
            break
        for pr in list(live):
            rc = pr.poll()
            if rc is None:
                continue
            live.remove(pr)
            if rc != 0:
                failed = (f"worker {procs.index(pr)}", rc)
                break
        time.sleep(0.2)
    if failed:
        for pr in live:
            pr.kill()
        reason, rc = failed
        print(f"multihost rehearsal FAILED ({reason}"
              + (f", rc={rc}" if rc is not None else "") + ")",
              file=sys.stderr)
        return 2 if rc is None else (rc if rc > 0 else 1)
    print("multihost rehearsal OK")
    return 0


if __name__ == "__main__":
    sys.exit(multihost_rehearse_cli())
