"""Warm-start wiring, time-limit enforcement, and stage-time instrumentation.

Covers the reference behaviors:
- MIP starts applied inside the solve (reference src/same.py:1201-1215,
  src/init_helpers.py:180-237) — here as initial auction slot prices.
- time_limit terminating the solve with partial results flagged via the
  ``time_limit_reached`` column (reference src/same.py:1245,1278).
"""

import numpy as np
import pandas as pd
import pytest

from same_tpu import run_same
from same_tpu.core import prepare_window, solve_prepared
from same_tpu.models.assignment import build_assignment_problem
from same_tpu.solver.auction import solve_assignment
from same_tpu.warmstart import compute_warm_start_pairs, warm_start_prices


def _grid_dataset(rng, n_side=9, jitter=0.06):
    g = (
        np.stack(np.meshgrid(np.arange(n_side), np.arange(n_side)), -1)
        .reshape(-1, 2)
        .astype(float)
    )
    types = (g.sum(1) % 3).astype(int)
    probs = np.eye(3)[types] * 100.0

    def mk(coords):
        df = pd.DataFrame(coords, columns=["X", "Y"])
        for c in range(3):
            df[f"ct{c}"] = probs[:, c]
        df["cell_type"] = [f"ct{t}" for t in types]
        df["Cell_Num_Old"] = np.arange(len(df))
        return df

    ref = mk(g + rng.normal(0, jitter, g.shape))
    qry = mk(g + rng.normal(0, jitter, g.shape))
    return ref, qry, [f"ct{c}" for c in range(3)]


COMMON = dict(radius=3.0, knn=6, delaunay_penalty=5, no_match_penalty=100)


def test_warm_start_wired_into_run_same(rng):
    ref, qry, commonCT = _grid_dataset(rng)
    out = {}
    for method in (None, "greedy", "hungarian", "sinkhorn"):
        matches, var_out = run_same(
            ref, qry, commonCT,
            optim_params=dict(COMMON),
            solver_params={"init_method": method},
            verbose=False,
        )
        out[method] = (matches, var_out)
        wi = var_out["tpu"]["warm_start"]
        if method is None:
            # Automatic greedy warm start is on by default.
            assert wi["method"] == "greedy-auto"
        else:
            assert wi["method"] == method
        if method != "sinkhorn":
            assert wi["n_seeded"] > 0
    # Same final objective (warm start must not change the solution quality).
    objs = {m: v[1]["tpu"]["objective"] for m, v in out.items()}
    assert objs["greedy"] == pytest.approx(objs[None], rel=0.02)
    assert objs["hungarian"] == pytest.approx(objs[None], rel=0.02)
    assert objs["sinkhorn"] == pytest.approx(objs[None], rel=0.02)


def test_warm_start_reduces_auction_rounds(rng):
    # Pure assignment level: warm prices from the greedy matching should cut
    # the number of bidding rounds on a cold solve of the same problem.
    n = 200
    coords = rng.uniform(0, 30, (n, 2))
    ref = coords + rng.normal(0, 0.1, coords.shape)
    pairs, costs = [], []
    for i in range(n):
        d = np.abs(ref - coords[i]).sum(1)
        for j in np.argsort(d)[:6]:
            pairs.append((i, int(j)))
            costs.append(float(d[j]))
    pairs, costs = np.asarray(pairs), np.asarray(costs)
    problem = build_assignment_problem(
        pairs, costs, n, n, np.ones(n, np.int64), 100.0, np.full(n, 50.0)
    )
    _, _, info_cold = solve_assignment(problem, eps_final=1e-2)
    chosen, _ = compute_warm_start_pairs(
        valid_pairs=[tuple(p) for p in pairs], costs=costs, n_aligned=n,
        n_ref=n, aligned_sizes=np.ones(n), no_match_penalty=50.0,
        max_matches=1, init_method="greedy", verbose=False,
    )
    prices0 = warm_start_prices(problem, chosen)
    mr_w, _, info_warm = solve_assignment(problem, eps_final=1e-2, prices0=prices0)
    assert info_warm["rounds"] < info_cold["rounds"]
    # Warm solve still matches nearly everything.
    assert (mr_w >= 0).mean() > 0.95


def test_time_limit_returns_flagged_partial(rng):
    ref, qry, commonCT = _grid_dataset(rng, n_side=8)
    matches, var_out = run_same(
        ref, qry, commonCT,
        optim_params=dict(COMMON),
        solver_params={"time_limit": 1e-9},
        verbose=False,
    )
    # A result is still produced, flagged as time-limited.
    assert len(matches) > 0
    assert matches["time_limit_reached"].all()

    # Without a limit the same problem is not flagged.
    matches2, _ = run_same(
        ref, qry, commonCT,
        optim_params=dict(COMMON),
        solver_params={"time_limit": None},
        verbose=False,
    )
    assert not matches2["time_limit_reached"].any()


def test_stage_times_recorded(rng):
    ref, qry, commonCT = _grid_dataset(rng, n_side=7)
    _, var_out = run_same(
        ref, qry, commonCT, optim_params=dict(COMMON), verbose=False
    )
    st = var_out["tpu"]["stage_times"]
    for key in (
        "candidates", "triangulate", "filter_triangles", "costs",
        "build_problem", "solve", "verify", "separation_time",
        "repair_time", "incumbent_eval_time", "host_queue_time",
    ):
        assert key in st, f"missing stage time: {key}"
        assert st[key] >= 0.0


def test_prepare_solve_finalize_matches_run_same(rng):
    ref, qry, commonCT = _grid_dataset(rng, n_side=7)
    m1, v1 = run_same(ref, qry, commonCT, optim_params=dict(COMMON), verbose=False)
    pw = prepare_window(ref, qry, commonCT, optim_params=dict(COMMON), verbose=False)
    res = solve_prepared(pw, verbose=False)
    from same_tpu.core import finalize_window

    m2, v2 = finalize_window(pw, res, verbose=False)
    pd.testing.assert_frame_equal(
        m1.drop(columns=["run_time"]), m2.drop(columns=["run_time"])
    )
    assert v1["tpu"]["objective"] == pytest.approx(v2["tpu"]["objective"])
