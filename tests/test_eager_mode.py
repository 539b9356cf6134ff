"""Selectable eager constraint mode (``lazy_constraints=False``).

The reference's eager path builds every candidate-triple orientation
constraint up front (reference src/helpers.py:444-573) instead of adding
lazy callback cuts. Small windows route to the complete eager MILP solved
exactly by HiGHS (core._solve_eager_exact); larger ones fall back to the
documented zero-budget tearing emulation. These tests pin the routing, the
fallback, and that the exact eager solution is no worse than the emulation
on the same objective.
"""

import numpy as np
import pandas as pd
import pytest

from same_tpu import run_same


def _swap_grid(n_side=7, seed=5):
    """Jittered grid pair with one adjacent swap in the query → one
    guaranteed orientation flip for identity-style matchings."""
    rng = np.random.default_rng(seed)
    xs, ys = np.meshgrid(
        np.arange(n_side, dtype=float), np.arange(n_side, dtype=float)
    )
    base = pd.DataFrame({"X": xs.ravel(), "Y": ys.ravel()})
    types = ["a", "b", "c"]
    base["cell_type"] = [types[i % 3] for i in range(len(base))]
    for t in types:
        base[t] = np.where(base["cell_type"] == t, 90.0, 5.0)
        base[t] += rng.uniform(0, 1, len(base))
    ref = base.copy()
    qry = base.copy()
    qry[["X", "Y"]] += rng.normal(0, 0.05, (len(qry), 2))
    # Swap two horizontally adjacent query points' coordinates so their
    # best-cost matches cross: triangles spanning them flip.
    i, j = 24, 25
    qi = qry.loc[i, ["X", "Y"]].copy()
    qry.loc[i, ["X", "Y"]] = qry.loc[j, ["X", "Y"]].to_numpy()
    qry.loc[j, ["X", "Y"]] = qi.to_numpy()
    ref["Cell_Num_Old"] = np.arange(len(ref))
    qry["Cell_Num_Old"] = np.arange(len(qry))
    return ref, qry, types


def _solve(ref, qry, types, **solver_overrides):
    solver = dict(mip_gap=0.01, lazy_allowed_flip_fraction=0.0)
    solver.update(solver_overrides)
    return run_same(
        ref_df=ref,
        aligned_df=qry,
        commonCT=types,
        optim_params=dict(
            radius=2.0, knn=8, no_match_penalty=100, delaunay_penalty=8,
            lazy_constraints=False,
        ),
        gurobi_params=solver,
        verbose=False,
    )


def test_eager_routes_small_window_to_exact_milp():
    ref, qry, types = _swap_grid()
    matches, var_out = _solve(ref, qry, types)
    assert var_out["lazy_constraints"] is False
    assert var_out["tpu"]["eager_exact"] is True
    # Output contract intact through the eager path.
    for col in ("triangle_violation", "filtered_violation", "run_time"):
        assert col in matches.columns
    assert len(matches) >= 0.9 * len(qry)
    # Per-aligned uniqueness still holds.
    assert matches["Aligned_Cell_Num_Old"].is_unique


def test_eager_exact_no_worse_than_emulation():
    ref, qry, types = _swap_grid()
    _m1, v_exact = _solve(ref, qry, types)
    _m2, v_emul = _solve(ref, qry, types, tpu_eager_max_n=None)
    assert v_exact["tpu"]["eager_exact"] is True
    assert v_emul["tpu"]["eager_exact"] is False
    # Both score the same flips-pay objective; the complete model solved
    # exactly must not lose to the lazy emulation (mip_gap slack allowed).
    assert (
        v_exact["tpu"]["objective"]
        <= v_emul["tpu"]["objective"] * 1.011 + 1e-6
    )


def test_eager_gate_falls_back_above_max_n():
    ref, qry, types = _swap_grid()
    _m, v = _solve(ref, qry, types, tpu_eager_max_n=10)
    assert v["tpu"]["eager_exact"] is False


def test_lazy_default_never_routes_eager():
    ref, qry, types = _swap_grid()
    matches, v = run_same(
        ref_df=ref,
        aligned_df=qry,
        commonCT=types,
        optim_params=dict(radius=2.0, knn=8, no_match_penalty=100,
                          delaunay_penalty=8),
        gurobi_params=dict(mip_gap=0.01),
        verbose=False,
    )
    assert v["lazy_constraints"] is True
    assert v["tpu"]["eager_exact"] is False
