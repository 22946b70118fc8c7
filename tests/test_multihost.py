"""Multi-host (DCN) rehearsal: N distributed processes x M virtual CPU
devices form an N*M-device global mesh; the turbo classifier runs DP
over it and every process gets back exactly its local scenes' class
maps, bit-equal to the single-process program (SURVEY §2.7
collective-backend plan: jax distributed runtime, no external
NCCL/MPI). Covers 2 and 3 processes, uneven per-host batches (bucket
padding), and the worker-failure path (VERDICT r2 #8)."""

import os
import subprocess
import sys
import time

import pytest

from rs_image_segmentation_tpu.parallel.multihost import free_local_port

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _spawn(nproc, mode="even", devices=2, extra_env=None):
    port = free_local_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)       # worker sets cpu via jax.config
    env.update(extra_env or {})
    return [subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nproc), str(port),
         str(devices), mode],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env)
        for pid in range(nproc)]


def _drain(procs, timeout=840):
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))
    return outs


@pytest.mark.parametrize("nproc,mode", [(2, "even"), (3, "even"),
                                        (2, "uneven")])
def test_global_mesh_classify(nproc, mode):
    procs = _spawn(nproc, mode)
    outs = _drain(procs)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK {pid} mode={mode}" in out, out[-3000:]
    if mode == "uneven":   # process 0 carried 3 true scenes, process 1 one
        assert "local=3" in outs[0] and "local=1" in outs[1]


def test_worker_failure_fails_loudly_and_kills_peers():
    """One worker exits right after joining; the rehearsal CLI must
    surface a non-zero exit and terminate the peers (which would
    otherwise block in collectives) well before the run budget."""
    from rs_image_segmentation_tpu.cli.multihost_cli import (
        multihost_rehearse_cli)
    os.environ["RS_SEG_MULTIHOST_FAIL_PID"] = "1"
    try:
        t0 = time.monotonic()
        rc = multihost_rehearse_cli(["--nproc", "2", "--timeout", "600"])
        took = time.monotonic() - t0
    finally:
        os.environ.pop("RS_SEG_MULTIHOST_FAIL_PID", None)
    assert rc != 0
    assert took < 300, f"failure took {took:.0f}s to surface"
