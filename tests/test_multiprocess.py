"""True multi-process validation: two jax.distributed CPU processes
(round-2 item 5). The reference runs every test at 1..N MPI ranks
(``/root/reference/tests/CMakeLists.txt:9-25``); here two coordinated
processes exercise per-process addressable shards of the sharded executor,
the per-process sharded checkpoint, and cross-process plan determinism —
things the single-process virtual mesh cannot."""
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count (4)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"worker {pid} ok" in out
    # cross-process plan determinism: identical plan hashes
    h0 = (tmp_path / "planhash_0.txt").read_text()
    h1 = (tmp_path / "planhash_1.txt").read_text()
    assert h0 == h1
