"""Quadrant-local violation checker on the synthetic benchmark."""

import numpy as np
import pandas as pd

from same_tpu import create_full_benchmark, greedy_triangle_collapse
from same_tpu.synthetic import check_triangle_violations_within_quadrants


def test_ground_truth_flips_localized_to_fold_quadrant():
    ref_df, query_df, quadrants, gt, _ = create_full_benchmark(seed=8899)
    mc = greedy_triangle_collapse(
        query_df, cell_type_col="cell_type", original_idx_col="cell_idx",
        x_col="X", y_col="Y", max_metacell_size=1, r_max=5, min_angle_deg=5,
        return_object=True,
    )
    # The feature-optimal matching is the per-quadrant positional identity
    # (each query cell keeps its own class), not the ground truth (which
    # follows the swapped positions and is flip-free by construction —
    # reference src/synthetic_datagen.py:307-348). Under identity, the
    # fold quadrant's swapped pairs flip their incident triangles.
    quad_of_query = query_df["quadrant"].to_numpy()
    quad_of_ref = ref_df["quadrant"].to_numpy()
    rows = []
    for name in ("top_right", "bottom_right"):
        q_idx = np.flatnonzero(quad_of_query == name)
        r_idx = np.flatnonzero(quad_of_ref == name)
        m = min(len(q_idx), len(r_idx))
        rows.append(pd.DataFrame({"aligned_idx": q_idx[:m], "ref_idx": r_idx[:m]}))
    matches = pd.concat(rows, ignore_index=True)
    matches["Aligned_metacell_id"] = matches["aligned_idx"]
    matches["X"] = query_df["X"].to_numpy()[matches["aligned_idx"]]
    matches["Y"] = query_df["Y"].to_numpy()[matches["aligned_idx"]]
    matches["ref_X"] = ref_df["X"].to_numpy()[matches["ref_idx"]]
    matches["ref_Y"] = ref_df["Y"].to_numpy()[matches["ref_idx"]]

    out = check_triangle_violations_within_quadrants(matches, mc)
    assert "triangle_violation" in out.columns
    by_quad = (
        out.assign(quadrant=quad_of_query[out["aligned_idx"]])
        .groupby("quadrant")["triangle_violation"]
        .sum()
    )
    # Swapped pairs in the fold quadrant flip under identity; the
    # noisy-probabilities quadrant distorts features, not geometry.
    assert by_quad.get("bottom_right", 0) > 0
    assert by_quad.get("top_right", 1) == 0
