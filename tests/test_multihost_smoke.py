"""Multi-host smoke: 2 REAL processes (jax.distributed + Gloo CPU
collectives) drive a cross-process chain-partitioned BA on the global
mesh — the runnable artifact behind the BASELINE "≥80% @ 2 hosts"
scaling claim (scripts/multihost_worker.py is the same entry real
hosts launch)."""
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_chain_ba():
    port = _free_port()
    env_base = dict(os.environ)
    # the workers configure their own JAX_PLATFORMS/XLA_FLAGS; drop the
    # conftest's 8-device forcing so each process contributes 2 devices
    env_base.pop("XLA_FLAGS", None)
    env_base["PLVIO_COORDINATOR"] = f"127.0.0.1:{port}"
    env_base["PLVIO_NUM_PROCS"] = "2"
    procs = []
    for pid in range(2):
        env = dict(env_base)
        env["PLVIO_PROC_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(ROOT, "scripts",
                                          "multihost_worker.py")],
            env=env, cwd=ROOT, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out, out[-3000:]
        assert "4 global devices" in out, out[-2000:]
