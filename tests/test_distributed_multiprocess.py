"""Real 2-process jax.distributed smoke test (CPU backend).

Launches two python subprocesses that initialize jax.distributed against a
local coordinator, then exercise the full multi-host window path:
``init_distributed`` -> ``host_window_slice`` -> ``gather_matches``. The
root process must see both hosts' match shards concatenated.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import sys
sys.path.insert(0, sys.argv[4])
import numpy as np
import pandas as pd
import jax
jax.config.update("jax_platforms", "cpu")

from same_tpu.parallel import distributed

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
addr = sys.argv[3]

is_multi = distributed.init_distributed(
    coordinator_address=addr, num_processes=nproc, process_id=pid
)
assert is_multi, "expected multi-process runtime"
assert jax.process_count() == nproc

sl = distributed.host_window_slice(5)
spans = {0: (0, 2), 1: (2, 5)} if nproc == 2 else None
assert (sl.start, sl.stop) == spans[pid], (pid, sl)

local = pd.DataFrame(
    {"window_id": list(range(sl.start, sl.stop)), "host": pid}
)
merged = distributed.gather_matches(local)
if pid == 0:
    assert merged is not None
    assert sorted(merged["window_id"].tolist()) == [0, 1, 2, 3, 4]
    assert set(merged["host"].tolist()) == {0, 1}
    print("GATHER_OK", len(merged))
else:
    assert merged is None
jax.distributed.shutdown()
"""


@pytest.mark.slow
def test_two_process_gather(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    addr = f"localhost:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", addr, repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    assert "GATHER_OK 5" in outs[0]
