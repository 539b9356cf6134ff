#!/usr/bin/env python
"""Run SAME-TPU on the paper datasets (heart / tongue / luad).

Input CSVs come from the SAME Zenodo archive (zenodo.org/records/19056915);
this script reproduces the per-dataset preprocessing and parameterization of
the reference run scripts (examples/{heart,tongue,luad}/run_same.sh):

  heart : ISS serial sections, 8 types, `_percentage` prob columns,
          coords = spot_x + 75; window=4000/overlap=100/radius=50, MS sweep.
  tongue: MERSCOPE RNA template vs PCF protein query, 5 types, probs x100;
          window=4000/overlap=300/radius=300, MS=1.
  luad  : Xenium RNA template vs PCF protein query, 5 types, probs x100;
          MS=3 metacells both sides, window=13000/overlap=250/radius=250.

Usage:
  python examples/run_dataset.py heart  --data DIR [--dp 10 --knn 8 --ms 1]
  python examples/run_dataset.py tongue --data DIR [--dp 10]
  python examples/run_dataset.py luad   --data DIR [--dp 10 --ms 3]
"""

import argparse
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 2)[0])

HEART_TYPES = [
    "Smooth muscle cells", "Fibroblast", "Atrial cardiomyocytes",
    "Cardiomyocytes", "Endothelium", "Epicardium", "Schwan progenitors",
    "Ventricular cardiomyocytes",
]
LUAD_TYPES = ["B cell", "Epithelial", "Mesenchymal", "Myeloid", "T cell"]


def load_heart(data_dir):
    align = pd.read_csv(f"{data_dir}/queryAD_valis.csv")
    ref = pd.read_csv(f"{data_dir}/refAD_valis.csv")
    for df in (align, ref):
        df["X"] = df["spot_x"] + 75
        df["Y"] = df["spot_y"] + 75
        df["cell_type"] = df[HEART_TYPES].idxmax(axis=1)
    return ref, align, HEART_TYPES, dict(
        window_size=4000, overlap=100, radius=50, r_max=50, id_col="Cell_Num"
    )


def load_tongue(data_dir):
    ref = pd.read_csv(f"{data_dir}/mer_df.csv", index_col=0)
    align = pd.read_csv(f"{data_dir}/prot_df.csv", index_col=0)
    common = sorted(set(ref["cell_type"].unique()))
    for df in (ref, align):
        df["Cell_Num_Old"] = df.index.values
        df[common] = df[common] * 100
    return ref, align, common, dict(
        window_size=4000, overlap=300, radius=300, r_max=300,
        id_col="Cell_Num_Old",
    )


def load_luad(data_dir):
    align = pd.read_csv(f"{data_dir}/align_pcf.csv", index_col=0)
    ref = pd.read_csv(f"{data_dir}/ref_xen.csv", index_col=0)
    for df in (align, ref):
        df["Cell_Num_Old"] = df.index.values
        df["cell_type"] = df[LUAD_TYPES].idxmax(axis=1)
        df[LUAD_TYPES] = df[LUAD_TYPES] * 100
    return ref, align, LUAD_TYPES, dict(
        window_size=13000, overlap=250, radius=250, r_max=250,
        id_col="Cell_Num_Old",
    )


LOADERS = {"heart": load_heart, "tongue": load_tongue, "luad": load_luad}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", choices=sorted(LOADERS))
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--dp", type=float, default=10)
    ap.add_argument("--knn", type=int, default=8)
    ap.add_argument("--ms", type=int, default=None)
    args = ap.parse_args()

    from same_tpu import greedy_triangle_collapse, sliding_window_matching

    ref, align, common, cfg = LOADERS[args.dataset](args.data)
    ms = args.ms if args.ms is not None else (3 if args.dataset == "luad" else 1)
    print(f"{args.dataset}: ref={ref.shape}, align={align.shape}, MS={ms}")

    mc_align = greedy_triangle_collapse(
        align, cell_type_col="cell_type", original_idx_col=cfg["id_col"],
        x_col="X", y_col="Y", max_metacell_size=ms, r_max=cfg["r_max"],
        min_angle_deg=15, use_alpha_shape=False, return_object=True,
    )
    mc_ref = greedy_triangle_collapse(
        ref, cell_type_col="cell_type", original_idx_col=cfg["id_col"],
        x_col="X", y_col="Y", max_metacell_size=ms, r_max=cfg["r_max"],
        min_angle_deg=15, use_alpha_shape=False, return_object=True,
    )

    optim = dict(
        window_size=cfg["window_size"], overlap=cfg["overlap"],
        min_cells_per_window=30, max_matches=1, radius=cfg["radius"],
        knn=args.knn, no_match_penalty=10000, dist_ct_coeff=1,
        penalty_coeff=100, delaunay_penalty=args.dp,
        cell_id_col="metacell_id", ref_metacell_match_multiplier=ms,
    )
    solver = dict(mip_gap=0.05, lazy_allowed_flip_fraction=0.05)

    t0 = time.time()
    matches = sliding_window_matching(
        mc_ref, mc_align, outprefix=args.out,
        optim_params=optim, solver_params=solver,
    )
    print(
        f"Done in {(time.time() - t0) / 60:.1f} min — {len(matches)} matches, "
        f"{matches['triangle_violation'].mean():.1%} violation nodes"
    )


if __name__ == "__main__":
    main()
