"""Golden-output regression tests against the reference's committed artifacts.

The reference repo commits complete ``run_same`` solve artifacts for two
simulated datasets (reference examples/simulated_st/ and
examples/simulated_elastic/: aligned_df.csv, ref_df.csv, matches_df.csv,
var_out.npy) — the only ground-truth parity oracle against *actual reference
output* available offline (SURVEY §4 item 1). These tests feed the golden
inputs through our ``run_same`` and assert:

- the golden column schema is reproduced (ours is a superset: the current
  reference also emits size/ref_size, reference src/same.py:1270-1274);
- our matching's objective is at least as good as the golden matching's
  under the exact MIP objective (Gurobi stopped at mip_gap=0.05, so ours
  must land within that envelope or better);
- match count and pair agreement are at reference level;
- violation flags are comparable.
"""

import os

import numpy as np
import pandas as pd
import pytest

from same_tpu import run_same
from same_tpu.core import pair_costs_for
from same_tpu.geometry import (
    delaunay_simplices,
    filter_triangles_by_radius,
    orientation_signs_np,
)

REF_ROOT = "/root/reference/examples"
DATASETS = ["simulated_st", "simulated_elastic"]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference artifacts not available"
)

# The golden runs predate explicit per-dataset configs; defaults apply
# (reference src/same.py:106-242). The grid spans ~[-5, 5] so the default
# radius=250 admits every pair, capped at knn=8.
PARAMS = dict(radius=250, knn=8, delaunay_penalty=5, no_match_penalty=100)


def _load(ds):
    aligned = pd.read_csv(f"{REF_ROOT}/{ds}/aligned_df.csv")
    ref = pd.read_csv(f"{REF_ROOT}/{ds}/ref_df.csv")
    golden = pd.read_csv(f"{REF_ROOT}/{ds}/matches_df.csv")
    commonCT = ["0", "1"]
    return aligned, ref, golden, commonCT


_SOLVED = {}


def _solve(ds, outprefix=None):
    """Run run_same once per dataset per session (solves are the slow part)."""
    if ds not in _SOLVED:
        aligned, ref, golden, commonCT = _load(ds)
        out, var_out = run_same(
            ref, aligned, commonCT,
            optim_params=dict(PARAMS),
            outprefix=outprefix,
            verbose=False,
        )
        _SOLVED[ds] = (aligned, ref, golden, commonCT, out, var_out)
    return _SOLVED[ds]


def _mip_objective(aligned, ref, pairs_ij, commonCT, tris, source_signs,
                   delaunay_penalty=5.0, penalty_coeff=100.0,
                   no_match_penalty=100.0):
    """Exact MIP objective of a matching given as (aligned_idx, ref_idx) rows.

    Mirrors reference src/same.py:1183-1197: pair costs + congestion +
    no-match + delaunay_penalty per flipped checked triangle (q_t = 1 exactly
    when the orientation constraint x_a+x_b+x_c <= 2+q_t is tight).
    """
    n = len(aligned)
    costs = pair_costs_for(aligned, ref, pairs_ij, commonCT, 1.0)
    base = float(costs.sum())
    u = np.bincount(pairs_ij[:, 1], minlength=len(ref))
    congestion = 100.0 * float(np.maximum(u - 1, 0).sum())
    matched = np.zeros(n, bool)
    matched[pairs_ij[:, 0]] = True
    no_match = no_match_penalty * float((~matched).sum())
    # Tearing term.
    match_ref = np.full(n, -1, dtype=np.int64)
    match_ref[pairs_ij[:, 0]] = pairs_ij[:, 1]
    tear = 0.0
    if len(tris):
        ref_xy = ref[["X", "Y"]].to_numpy(float)
        tm = match_ref[tris]
        ok = (tm >= 0).all(axis=1)
        sub = tris[ok]
        p = ref_xy[tm[ok]]
        cross = (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1]) - (
            p[:, 1, 1] - p[:, 0, 1]
        ) * (p[:, 2, 0] - p[:, 0, 0])
        rs = np.sign(cross)
        src = source_signs[ok]
        flipped = (rs != 0) & (src != 0) & (rs != src)
        w = aligned["size"].to_numpy(float)[sub].sum(axis=1) if "size" in aligned \
            else 3.0 * np.ones(len(sub))
        tear = delaunay_penalty * float(w[flipped].sum())
    return base + congestion + no_match + tear


@pytest.mark.parametrize("ds", DATASETS)
def test_golden_parity(ds, tmp_path):
    aligned, ref, golden, commonCT, out, var_out = _solve(
        ds, outprefix=str(tmp_path / ds)
    )

    # --- Schema: every golden column present, same dtype family ------------
    missing = [c for c in golden.columns if c not in out.columns]
    assert not missing, f"columns missing vs golden: {missing}"

    # --- Match count: golden matched everything ----------------------------
    assert len(out) == len(golden)

    # --- Pair agreement -----------------------------------------------------
    golden_pairs = set(zip(golden["aligned_idx"], golden["ref_idx"]))
    our_pairs = set(zip(out["aligned_idx"], out["ref_idx"]))
    agreement = len(golden_pairs & our_pairs) / len(golden_pairs)
    assert agreement >= 0.95, f"pair agreement {agreement:.2%}"

    # --- Objective: ours must be within Gurobi's gap of the golden ---------
    # (and typically equal or better; Gurobi ran at mip_gap=0.05).
    aligned2 = aligned.copy()
    aligned2["size"] = 1
    coords = aligned2[["X", "Y"]].to_numpy(float)
    tris = delaunay_simplices(coords)
    tris = np.asarray(
        filter_triangles_by_radius(coords, tris, PARAMS["radius"],
                                   min_angle_deg=15, verbose=False)
    ).reshape(-1, 3)
    src = orientation_signs_np(coords, tris)
    golden_obj = _mip_objective(
        aligned2, ref, golden[["aligned_idx", "ref_idx"]].to_numpy(int),
        commonCT, tris, src,
    )
    our_obj = _mip_objective(
        aligned2, ref, out[["aligned_idx", "ref_idx"]].to_numpy(int),
        commonCT, tris, src,
    )
    assert our_obj <= golden_obj * 1.05 + 1e-6, (
        f"objective {our_obj:.3f} vs golden {golden_obj:.3f}"
    )

    # --- Violations: golden has none; we should be as clean ----------------
    assert out["triangle_violation"].sum() <= golden["triangle_violation"].sum()

    # --- Artifact files written with the reference layout -------------------
    # (solver_state.json is the analog of the reference's matching_model.lp.)
    for fname in (
        "matches_df.csv", "aligned_df.csv", "ref_df.csv", "var_out.npy",
        "solver_state.json",
    ):
        assert (tmp_path / ds / fname).exists()


@pytest.mark.parametrize("ds", DATASETS)
def test_golden_var_out_keys(ds):
    golden_var = np.load(
        f"{REF_ROOT}/{ds}/var_out.npy", allow_pickle=True
    ).item()
    *_rest, var_out = _solve(ds)
    # Reference var_out keys we commit to (reference src/same.py:1410-1432).
    for key in golden_var:
        assert key in var_out, f"var_out missing reference key {key!r}"
