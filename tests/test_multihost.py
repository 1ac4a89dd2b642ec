"""Multi-host (DCN) sharded seeding: 2 real jax.distributed processes
on the CPU backend (4 virtual devices each, global mesh of 8) must
produce the exact seed set of the single-process 8-device run.

This exercises the code path the sharded driver takes on a real TPU
pod: init_distributed, global-mesh argument placement, shard_map over
hosts, and the tiled process_allgather seed merge."""
from __future__ import annotations

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

from tests.mh_problem import run_problem

HERE = Path(__file__).resolve().parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_matches_single(tmp_path):
    single = run_problem()
    assert len(single) > 0

    coord = f"localhost:{_free_port()}"
    out = tmp_path / "mh"
    procs = [
        subprocess.Popen(
            [sys.executable, str(HERE / "mh_worker.py"),
             str(rank), coord, str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env={"PATH": "/usr/bin:/bin:/usr/local/bin"},
        )
        for rank in (0, 1)
    ]
    logs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]

    for rank in (0, 1):
        rows = np.load(f"{out}.rank{rank}.npz")["rows"]
        assert np.array_equal(rows, single), rank
