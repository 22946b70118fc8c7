"""``rs-seg-multihost-rehearse``: run the multi-host (DCN) path locally.

Spawns N real distributed processes (Gloo CPU collectives, M virtual
devices each), forms the N*M-device global mesh, classifies a scene
batch sharded across all of them, and checks bit-equality with the
single-process program. On a real TPU pod the same code path runs with
``parallel.multihost.init_multihost()`` (no arguments) per host.
"""

from __future__ import annotations

import argparse
import socket
import subprocess
import sys


def multihost_rehearse_cli(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Local multi-host (DCN) rehearsal over Gloo CPU "
                    "collectives")
    p.add_argument("--nproc", type=int, default=2,
                   help="distributed processes to spawn")
    p.add_argument("--devices-per-process", type=int, default=2,
                   help="virtual CPU devices per process")
    p.add_argument("--timeout", type=float, default=900.0)
    args = p.parse_args(argv)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    import os
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)      # workers pin cpu via jax.config
    procs = [subprocess.Popen(
        [sys.executable, "-m",
         "rs_image_segmentation_tpu.parallel.multihost_worker",
         str(pid), str(args.nproc), str(port),
         str(args.devices_per_process)], env=env)
        for pid in range(args.nproc)]
    rc = 0
    try:
        for pr in procs:
            pr.wait(timeout=args.timeout)
            rc |= pr.returncode
    except subprocess.TimeoutExpired:
        for pr in procs:
            pr.kill()
        print("rehearsal timed out", file=sys.stderr)
        return 2
    print("multihost rehearsal", "OK" if rc == 0 else f"FAILED rc={rc}")
    return rc


if __name__ == "__main__":
    sys.exit(multihost_rehearse_cli())
