"""Multi-process distributed execution (SURVEY.md §5.8).

The reference has no distributed backend (parallelism is comments only,
src/sd_algorithm/algorithm.jl:7-11). Here two OS processes, each with 4
virtual CPU devices, form one 8-device global mesh over Gloo collectives
and run the sharded SD trajectory; it must match the same 8-device mesh
run inside a single process — proving the step function is process-count
invariant (cross-host collectives insert transparently).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from conftest import require_instance

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_mesh_matches_single_process(tmp_path):
    require_instance("lands")
    port = _free_port()
    out = tmp_path / "p0.npz"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(pid), str(port), str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, cwd=_REPO) for pid in (0, 1)]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        logs.append(stdout)
    assert all(p.returncode == 0 for p in procs), \
        "\n".join(f"--- worker {i}:\n{log[-3000:]}"
                  for i, log in enumerate(logs))
    dist = np.load(out)

    # identical workload on one process, 8 virtual devices (conftest)
    from _distributed_worker import run_trajectory

    cand, x_inc, ub = run_trajectory()

    np.testing.assert_allclose(dist["cand_est"], cand, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(dist["x_incumbent"], x_inc,
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(dist["mc_ub"], ub, rtol=1e-9, atol=1e-9)
