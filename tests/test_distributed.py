"""Multi-process jax.distributed bring-up test (round-1 verdict item 4).

Launches real OS processes, each with its own set of virtual CPU devices,
initializes jax.distributed against a local coordinator, builds a GLOBAL
mesh spanning both processes, and runs the sharded forward with
cross-process collectives. This is the closest single-machine rehearsal of
the multi-host pod-slice path (one engine per host, docs/PARALLELISM.md).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("nproc,local_devices", [(2, 4)])
def test_multiprocess_global_mesh_forward(nproc, local_devices):
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_NUM_PROCESSES", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, str(nproc), str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {pid} failed (rc={p.returncode}):\n{out[-3000:]}"
        )
        assert f"WORKER_OK {pid}" in out, out[-3000:]
        assert f"PP_OK {pid}" in out, out[-3000:]
        assert f"global_devices={nproc * local_devices}" in out
