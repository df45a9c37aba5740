"""2-process jax.distributed exercise (VERDICT r1 item 4).

Launches two REAL OS processes that join one jax.distributed runtime over a
localhost coordinator, build a global mesh spanning both processes' virtual
CPU devices, and render through the production sharded path
(parallel/render_sharded.py).  Each process asserts the all-gathered global
image equals its own single-device render — the same invariant
tests/test_sharding.py proves for single-process meshes, now across a
process (host) boundary with gloo standing in for ICI/DCN.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "mp_render_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_render(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the workers force the cpu platform themselves (conftest's platform
    # override does not apply to subprocesses)
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"proc{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER,
             "--process-id", str(pid), "--num-processes", "2",
             "--coordinator", f"127.0.0.1:{port}",
             "--local-devices", "2", "--size", "16", "--spp", "2",
             "--bounces", "2", "--out", str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multiprocess worker timed out")
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    for out in outs:
        res = json.loads(out.read_text())
        assert res["ok"], res
        assert res["process_count"] == 2
        assert res["global_devices"] == 4
        assert res["max_abs_diff_vs_single"] < 1e-5
