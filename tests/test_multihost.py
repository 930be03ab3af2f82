"""True multi-process mesh test: 2 processes × 4 virtual devices.

The closest a single machine gets to real multi-host: ``jax.distributed``
joins two OS processes into one 8-device global mesh (cross-process
collectives run over Gloo), and the V-trace ``DistributedLearner`` executes
the same SPMD train step from both processes. Replicated training metrics
must agree across processes — the multi-host analogue of the reference's
simulated-two-device strategy tests (modules/test_utils.py:76-108).
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


@pytest.mark.slow
def test_two_process_mesh_trains_identically():
    port = str(_free_port())
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = ""
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(worker))),
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    lines = [
        line
        for out in outs
        for line in out.splitlines()
        if line.startswith("METRICS")
    ]
    assert len(lines) == 2, outs
    # METRICS <pid> <loss> <entropy> <step>
    vals = sorted(tuple(line.split()[1:]) for line in lines)
    assert vals[0][0] == "0" and vals[1][0] == "1"
    assert vals[0][1:] == vals[1][1:], lines  # bitwise-identical metrics
    assert float(vals[0][1]) == float(vals[0][1])  # finite (not NaN)
    assert vals[0][3] == "3"

    # R2D2 with cross-host sharded replay: the risky per-host-semantics
    # path (round-1 review weak #7) — insert/sample/priority write-back as
    # one global program must agree bitwise across processes too.
    qlines = [
        line
        for out in outs
        for line in out.splitlines()
        if line.startswith("R2D2_METRICS")
    ]
    assert len(qlines) == 2, outs
    qvals = sorted(tuple(line.split()[1:]) for line in qlines)
    assert qvals[0][0] == "0" and qvals[1][0] == "1"
    assert qvals[0][1:] == qvals[1][1:], qlines
    assert qvals[0][4] == "2"
    import math

    assert math.isfinite(float(qvals[0][1]))
