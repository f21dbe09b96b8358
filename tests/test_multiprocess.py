"""Multi-host/multi-slice simulation: 2 processes x 4 CPU devices running
data-parallel training over the `dcn` mesh axis, with sharded Orbax
save/restore (VERDICT r1 missing #4; SURVEY §2.8 multi-host mapping).

Launches tests/mp_worker.py in two real subprocesses joined through
jax.distributed — the CPU-simulated equivalent of two TPU slices.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # 2-process jax.distributed job: minutes



def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dcn_training(tmp_path):
    port = _free_port()
    nproc = 2
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        env.update({
            "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "NUM_PROCESSES": str(nproc),
            "PROCESS_ID": str(pid),
            "MACAW_MP_CKPT": str(tmp_path / "ckpt"),
        })
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "CKPT_OK" in out, f"proc {pid}:\n{out}"
        assert "'dcn': 2" in out

    # both processes computed the same global losses (the dcn all-reduce
    # really synchronized the replicas)
    loss_lines = [
        [ln for ln in out.splitlines() if ln.startswith("LOSS")][0]
        for out in outs
    ]
    assert loss_lines[0] == loss_lines[1], loss_lines
