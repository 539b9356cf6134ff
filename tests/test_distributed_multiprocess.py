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


PIPELINE_WORKER = r"""
import sys
sys.path.insert(0, sys.argv[4])
import numpy as np
import pandas as pd
import jax
jax.config.update("jax_platforms", "cpu")

from same_tpu import (
    init_optim_params, merge_window_matches_unique_ref,
    sliding_window_matching,
)
from same_tpu.parallel import distributed

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
addr = sys.argv[3]

# Deterministic dataset, built identically on every host.
rng = np.random.default_rng(42)
n_side = 10
g = np.stack(
    np.meshgrid(np.arange(n_side), np.arange(n_side)), -1
).reshape(-1, 2).astype(float)
cts = ["a", "b"]
ct = rng.choice(cts, len(g))
def mkdf(seed):
    r = np.random.default_rng(seed)
    df = pd.DataFrame({
        "X": g[:, 0] + r.normal(0, 0.05, len(g)),
        "Y": g[:, 1] + r.normal(0, 0.05, len(g)),
        "cell_type": ct,
        "Cell_Num_Old": np.arange(len(g)),
    })
    for c in cts:
        df[c] = np.where(ct == c, 100.0, 0.0)
    return df
ref, qry = mkdf(1), mkdf(2)
optim = init_optim_params(
    radius=2.5, knn=4, delaunay_penalty=2, no_match_penalty=100,
    window_size=6, overlap=2, min_cells_per_window=4,
)

is_multi = distributed.init_distributed(
    coordinator_address=addr, num_processes=nproc, process_id=pid
)
assert is_multi and jax.process_count() == nproc

local = sliding_window_matching(
    ref, qry, commonCT=cts, optim_params=optim, host_shard=True,
    verbose=False,
)
gathered = distributed.gather_matches(local)
if pid == 0:
    assert gathered is not None
    merged = merge_window_matches_unique_ref([gathered])
    # Single-process reference result, computed in the same process.
    full = sliding_window_matching(
        ref, qry, commonCT=cts, optim_params=optim, verbose=False,
    )
    merged_full = merge_window_matches_unique_ref([full])
    key = ["Aligned_Cell_Num_Old", "Ref_Cell_Num_Old", "window_id"]
    a = merged[key].sort_values(key).reset_index(drop=True)
    b = merged_full[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    print("PIPELINE_OK", len(merged))
else:
    assert gathered is None
jax.distributed.shutdown()
"""


@pytest.mark.slow
def test_two_process_pipeline(tmp_path):
    """The docs/tutorials/multichip.md multi-host recipe, executed: two
    processes each run sliding_window_matching(host_shard=True) on their
    window slice, the root gathers + uniqueness-merges, and the result
    equals the single-process pipeline's."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    addr = f"localhost:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    script = tmp_path / "pipeline_worker.py"
    script.write_text(PIPELINE_WORKER)
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
        out, _ = p.communicate(timeout=540)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    assert "PIPELINE_OK" in outs[0]
