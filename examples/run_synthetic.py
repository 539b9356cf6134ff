#!/usr/bin/env python
"""Synthetic 4-quadrant benchmark, end to end (reference Fig 2 workflow).

Mirrors the reference's examples/synthetic/run_same.sh parameterization:
MS=1 metacell pass (filtered Delaunay only), window=100/overlap=0 (here the
tissue fits one window), max_matches=2, radius=5, knn=8, dp configurable.

Usage: python examples/run_synthetic.py [--dp 10] [--out results/synthetic]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dp", type=float, default=10.0)
    ap.add_argument("--seed", type=int, default=8899)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from same_tpu import (
        check_alignment,
        create_full_benchmark,
        greedy_triangle_collapse,
        run_same,
    )

    ref_df, query_df, _quadrants, gt, _expr = create_full_benchmark(seed=args.seed)
    print(f"Benchmark: {len(ref_df)} template / {len(query_df)} query cells")

    mc_align = greedy_triangle_collapse(
        query_df, cell_type_col="cell_type", original_idx_col="cell_idx",
        x_col="X", y_col="Y", max_metacell_size=1, r_max=5, min_angle_deg=5,
        return_object=True,
    )

    ref_in = ref_df.copy()
    ref_in["metacell_id"] = np.arange(len(ref_in))
    t0 = time.time()
    matches, var_out = run_same(
        ref_df=ref_in,
        aligned_df=mc_align,
        commonCT=["c1", "c2", "c3"],
        optim_params=dict(
            max_matches=2, radius=5, knn=8, no_match_penalty=10000,
            dist_ct_coeff=1, min_angle_deg=5, penalty_coeff=100,
            delaunay_penalty=args.dp, cell_id_col="metacell_id",
            ref_metacell_match_multiplier=1, ignore_same_type_triangles=False,
        ),
        solver_params=dict(mip_gap=0.025, lazy_allowed_flip_fraction=0.0),
        outprefix=args.out,
    )
    elapsed = time.time() - t0

    acc = (
        query_df["cell_type"].to_numpy()[matches["Aligned_metacell_id"]]
        == ref_df["cell_type"].to_numpy()[matches["Ref_metacell_id"]]
    ).mean()
    mapped = matches.rename(columns={"ref_X": "X2", "ref_Y": "Y2"})
    mapped = mapped.assign(X=mapped["X2"], Y=mapped["Y2"])
    mapped["cell_type"] = query_df["cell_type"].to_numpy()[
        matches["Aligned_metacell_id"]
    ]
    _q, nn_score = check_alignment(mapped, ref_df, "X", "Y")

    print(
        json.dumps(
            {
                "matches": int(len(matches)),
                "query_cells": int(len(query_df)),
                "cell_type_accuracy": round(float(acc), 4),
                "one_nn_alignment": round(float(nn_score), 4),
                "violation_nodes": int(matches["triangle_violation"].sum()),
                "objective": var_out["tpu"]["objective"],
                "seconds": round(elapsed, 2),
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
