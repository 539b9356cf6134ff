"""Benchmark: 5,000-cell single-window SAME solve on TPU.

Baseline: the reference's scale table — 5,000 cells, no metacells/windows,
Gurobi on a 32-core / 128 GB server: **5 minutes (300 s)**
(reference docs/tutorials/large_datasets.md:228-235; BASELINE.md row 1).

This benchmark builds an equivalent-scale instance (two jittered copies of a
5,000-cell tissue with 8 cell types, probability columns x100, knn=8,
dp=10 — the ISS-heart-like configuration) and runs the full ``run_same``
pipeline (candidate gen, triangulation + filtering, auction solve with
space-tearing separation, violation verification, output assembly).

Reported value: end-to-end wall-clock of the second run (compile cached —
one-time XLA compilation is excluded, matching how a production sweep
amortizes it across hundreds of windows). Prints ONE JSON line.
"""

import json
import time

import numpy as np
import pandas as pd

BASELINE_SECONDS = 300.0  # Gurobi, 5k cells, 32-core server


def make_instance(n_cells=5000, n_types=8, seed=7):
    rng = np.random.default_rng(seed)
    side = int(np.sqrt(n_cells))
    extent = side * 25.0  # ~25 units spacing, heart-like density
    xy = rng.uniform(0, extent, (n_cells, 2))
    # Spatially coherent cell types: blobby Voronoi-ish regions.
    centers = rng.uniform(0, extent, (n_types * 3, 2))
    center_type = rng.integers(0, n_types, len(centers))
    d = ((xy[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    types = center_type[np.argmin(d, axis=1)]

    type_names = [f"T{t}" for t in range(n_types)]
    probs = np.full((n_cells, n_types), 2.0)
    probs[np.arange(n_cells), types] = 86.0
    probs += rng.uniform(0, 2, probs.shape)
    probs = probs / probs.sum(1, keepdims=True) * 100.0

    def frame(jitter_seed):
        r = np.random.default_rng(jitter_seed)
        df = pd.DataFrame(xy + r.normal(0, 4.0, xy.shape), columns=["X", "Y"])
        df["cell_type"] = [type_names[t] for t in types]
        for k, name in enumerate(type_names):
            df[name] = probs[:, k]
        df["Cell_Num_Old"] = np.arange(n_cells)
        return df

    return frame(1), frame(2), type_names


def main():
    from same_tpu import run_same

    ref_df, qry_df, type_names = make_instance()
    optim = dict(
        radius=50, knn=8, delaunay_penalty=10, no_match_penalty=100,
        penalty_coeff=100, dist_ct_coeff=1, min_angle_deg=15,
        cell_id_col="Cell_Num_Old",
    )
    solver = dict(mip_gap=0.05, lazy_allowed_flip_fraction=0.05)

    # Warm-up run: triggers XLA compilation for this shape bucket.
    run_same(
        ref_df, qry_df, type_names, optim_params=optim,
        gurobi_params=solver, verbose=False,
    )
    # Measured run.
    t0 = time.time()
    matches, var_out = run_same(
        ref_df, qry_df, type_names, optim_params=optim,
        gurobi_params=solver, verbose=False,
    )
    elapsed = time.time() - t0

    print(
        json.dumps(
            {
                "metric": "5k-cell window solve wall-clock (vs Gurobi 32-core 300s)",
                "value": round(elapsed, 3),
                "unit": "s",
                "vs_baseline": round(BASELINE_SECONDS / elapsed, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
