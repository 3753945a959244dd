"""Multi-process jax.distributed BA test (SURVEY §4.4; VERDICT r4 #6).

Two local processes, DCN-style coordinator init, 4 virtual CPU devices
each -> one 8-device global mesh running distributed_global_ba on the
shared synthetic problem. Opt-in (spawns processes, ~1-2 min):

    RUN_DIST_TESTS=1 python -m pytest tests/test_multiprocess.py -q
"""
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_DIST_TESTS", "") in ("", "0"),
    reason="multi-process distributed test is opt-in (RUN_DIST_TESTS=1)",
)

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_gba():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-u",
             os.path.join(REPO, "tools", "dist_worker.py"),
             str(i), "2", str(port)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"DIST_OK {i}" in out, out[-3000:]
