"""Multi-host (DCN) scaling proof: 2 real jax.distributed processes.

BASELINE.md scaling row ("near-linear 1 chip -> 2+ hosts"): parallel/multihost
is validated by actually spawning two processes (4 virtual CPU devices each),
joining a distributed runtime over a localhost coordinator, building the
global (bands, time) mesh with the DCN-bands / ICI-time placement policy,
feeding disjoint band sets from each process, and checking the sharded scan
output against single-device oracles (tests/multihost_child.py).
"""

import os
import socket
import subprocess
import sys

import pytest

CHILD = os.path.join(os.path.dirname(__file__), "multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_scan():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # children pin CPU themselves
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo = os.path.dirname(os.path.dirname(CHILD))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=os.path.dirname(os.path.dirname(CHILD)),
        )
        for pid in range(2)
    ]
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=480)
            outputs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:  # kill the exact PIDs we started
            p.kill()
        for p in procs:
            out, _ = p.communicate()
            outputs.append(out)
        pytest.fail("multihost children timed out:\n" + "\n---\n".join(outputs))

    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f"child failed:\n{out}"
        assert "MULTIHOST_OK" in out, out
    # both processes owned bands and cross-checked them
    assert "process=0/2" in "".join(outputs)
    assert "process=1/2" in "".join(outputs)
