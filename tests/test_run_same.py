"""End-to-end run_same on the synthetic 4-quadrant benchmark.

Mirrors the reference's flagship demo (examples/synthetic/run_same.sh):
MS=1 metacell pass (filtered Delaunay only), then matching with the paper's
parameters. Since round 3 the generator regenerates the committed paper
dataset under seed 8899 (tests/test_synthetic_regen.py), so this IS the
411/372 dataset the reference reports 372/372 matched at 100% cell-type
accuracy on; the assertions allow the mip_gap-sized slack.
"""

import numpy as np
import pandas as pd
import pytest

import same_tpu
from same_tpu import (
    create_full_benchmark,
    greedy_triangle_collapse,
    run_same,
)


@pytest.fixture(scope="module")
def benchmark():
    return create_full_benchmark(seed=8899)


@pytest.fixture(scope="module")
def synthetic_result(benchmark):
    ref_df, query_df, _q, gt, _e = benchmark
    mc_align = greedy_triangle_collapse(
        query_df, cell_type_col="cell_type", original_idx_col="cell_idx",
        x_col="X", y_col="Y", max_metacell_size=1, r_max=5, min_angle_deg=5,
        return_object=True, verbose=False,
    )
    optim = dict(
        max_matches=2, radius=5, knn=8, no_match_penalty=10000,
        dist_ct_coeff=1, min_angle_deg=5, penalty_coeff=100,
        delaunay_penalty=10, cell_id_col="metacell_id",
        ref_metacell_match_multiplier=1, ignore_same_type_triangles=False,
    )
    solver = dict(mip_gap=0.025, lazy_allowed_flip_fraction=0.0)
    ref_in = ref_df.copy()
    ref_in["metacell_id"] = np.arange(len(ref_in))
    matches, var_out = run_same(
        ref_df=ref_in,
        aligned_df=mc_align,
        commonCT=["c1", "c2", "c3"],
        optim_params=optim,
        gurobi_params=solver,
        verbose=False,
    )
    return matches, var_out, ref_df, query_df, gt


def test_all_query_cells_matched(synthetic_result):
    matches, _v, ref_df, query_df, _gt = synthetic_result
    # The paper result matches every query cell (372/372 there).
    assert len(matches) >= 0.97 * len(query_df)


def test_cell_type_accuracy(synthetic_result):
    matches, _v, ref_df, query_df, _gt = synthetic_result
    ref_types = ref_df["cell_type"].to_numpy()
    qry_types = query_df["cell_type"].to_numpy()
    acc = (
        qry_types[matches["Aligned_metacell_id"].to_numpy()]
        == ref_types[matches["Ref_metacell_id"].to_numpy()]
    ).mean()
    assert acc >= 0.97  # paper: 100%


def test_output_columns_contract(synthetic_result):
    matches, var_out, *_ = synthetic_result
    expected = [
        "aligned_idx", "ref_idx", "c1", "c2", "c3", "X", "Y", "ref_X",
        "ref_Y", "size", "ref_size", "Ref_metacell_id", "Aligned_metacell_id",
        "time_limit_reached", "triangle_violation", "filtered_violation",
        "run_time",
    ]
    assert list(matches.columns) == expected
    for key in [
        "x", "no_match_vars", "penalty_vars", "area_penalty_vars",
        "violations", "violation_penalty_comparison", "triangle_data",
        "lazy_constraints", "lazy_cuts_added",
    ]:
        assert key in var_out
    td = var_out["triangle_data"]
    for key in [
        "triangles", "triangle_info", "aligned_simplex_map", "areas_before",
        "areas_after", "flipped_triangles", "matched_vertices",
    ]:
        assert key in td


def test_constraints_satisfied(synthetic_result):
    matches, _v, ref_df, _q, _gt = synthetic_result
    # per-aligned <= 1 match
    assert matches["aligned_idx"].is_unique
    # per-ref <= max_matches (=2 here, multiplier 1)
    assert matches["ref_idx"].value_counts().max() <= 2


def test_one_nn_alignment_metric(synthetic_result):
    """The paper's headline metric: 1-NN cell-type agreement of the mapped
    positions against the reference template (check_alignment,
    reference src/eval_utils.py:6)."""
    matches, _v, ref_df, query_df, _gt = synthetic_result
    mapped = pd.DataFrame(
        {
            "X": matches["ref_X"].to_numpy(),
            "Y": matches["ref_Y"].to_numpy(),
            "cell_type": query_df["cell_type"].to_numpy()[
                matches["Aligned_metacell_id"].to_numpy()
            ],
        }
    )
    _qdf, score = same_tpu.check_alignment(
        mapped, ref_df, xcol="X", ycol="Y", ctype_col="cell_type", kNN=1
    )
    assert score >= 0.9


def test_artifacts_roundtrip(tmp_path, benchmark):
    ref_df, query_df, _q, _gt, _e = benchmark
    sub_r = ref_df[ref_df["quadrant"] == "top_right"].reset_index(drop=True)
    sub_q = query_df[query_df["quadrant"] == "top_right"].reset_index(drop=True)
    out = tmp_path / "res"
    matches, var_out = run_same(
        ref_df=sub_r,
        aligned_df=sub_q,
        commonCT=["c1", "c2", "c3"],
        optim_params=dict(radius=5, knn=8, cell_id_col="cell_idx",
                          min_angle_deg=5, no_match_penalty=10000),
        outprefix=str(out),
        verbose=False,
    )
    assert (out / "matches_df.csv").exists()
    assert (out / "var_out.npy").exists()
    assert (out / "aligned_df.csv").exists()
    assert (out / "ref_df.csv").exists()
    loaded = np.load(out / "var_out.npy", allow_pickle=True).item()
    assert loaded["lazy_constraints"] == True
    df = pd.read_csv(out / "matches_df.csv")
    assert len(df) == len(matches)
    # load_matching_results (reference src/helpers.py:667-689) round-trip.
    v2, aligned2, ref2, matches2 = same_tpu.io.load_matching_results(str(out))
    assert v2.keys() == var_out.keys()
    assert len(aligned2) == len(sub_q) or len(aligned2) <= len(sub_q)
    assert len(ref2) <= len(sub_r)
    assert list(matches2.columns) == list(df.columns)


def test_no_pairs_raises(benchmark):
    ref_df, query_df, *_ = benchmark
    far_ref = ref_df.copy()
    far_ref["X"] += 1e6
    with pytest.raises(ValueError, match="No valid_pairs"):
        run_same(
            ref_df=far_ref,
            aligned_df=query_df.copy(),
            commonCT=["c1", "c2", "c3"],
            optim_params=dict(radius=5, knn=8, cell_id_col="cell_idx"),
            verbose=False,
        )
