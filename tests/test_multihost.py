"""Multi-host (DCN) rehearsal: 2 distributed processes x 2 virtual CPU
devices form a 4-device global mesh; the turbo classifier runs DP over
it and every process gets back exactly its local scenes' class maps,
bit-equal to the single-process program (SURVEY §2.7 collective-backend
plan: jax distributed runtime, no external NCCL/MPI)."""

import os
import subprocess
import sys

import pytest

from rs_image_segmentation_tpu.parallel.multihost import free_local_port

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def test_two_process_global_mesh_classify():
    port = free_local_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)       # worker sets cpu via jax.config
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=840)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK {pid}" in out, out[-3000:]
