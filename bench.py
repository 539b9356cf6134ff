"""Benchmark: LUAD-scale single-window SAME solve at dp=25 on TPU.

Baseline: the reference's headline blow-up case — the LUAD33 dataset
(~100K + ~94K cells, MS=3 metacells, window_size=13000) at
delaunay_penalty=25 takes Gurobi **249.9 minutes** of total solve time
(reference examples/luad/luad_benchmark.html cell 9 / Fig S18; BASELINE.md).
At 13000-unit windows over the ~26000-unit tissue the grid is 3x3 = 9
windows, so the per-window Gurobi baseline is 249.9 / 9 = **27.8 minutes**.

This benchmark builds one equivalent window — a LUAD-like synthetic tissue
(5 spatially coherent cell types, probabilities x100) over a 13000-unit
extent, ~25k cells per side collapsed to MS=3 metacells (~11k points) —
and runs the full ``run_same`` pipeline: candidate generation,
triangulation + filtering, auction solve with space-tearing separation at
dp=25, incremental + exact-component repair, violation verification,
output assembly.

Reported value: end-to-end wall-clock of the second run (XLA compilation
cached, matching how a production sweep amortizes it across windows).
Prints ONE JSON line.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np
import pandas as pd


def _wait_for_backend(max_wait_s=900.0, poll_s=45.0, probe_timeout_s=150.0):
    """Block until a JAX backend can initialize, probing in subprocesses.

    The tunneled TPU worker occasionally crashes and takes ~5 minutes to
    recover ("kernel fault" mode); a bench launched into that window would
    die (or hang) at backend init. JAX caches a failed plugin init for the
    life of the process, so the probe runs in a fresh subprocess each time;
    this process only touches jax after a probe succeeds.
    """
    import subprocess
    import sys

    t0 = time.time()
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout_s,
                capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() - t0 > max_wait_s:
            print(
                "backend probe never succeeded; falling back to CPU",
                file=sys.stderr,
                flush=True,
            )
            import jax

            jax.config.update("jax_platforms", "cpu")
            return False
        print(
            f"backend unavailable; retrying in {poll_s:.0f}s",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(poll_s)

# Reference: 249.9 min total at dp=25 over a 3x3 window grid.
BASELINE_SECONDS = 249.9 * 60.0 / 9.0

LUAD_TYPES = ["B cell", "Epithelial", "Mesenchymal", "Myeloid", "T cell"]


def make_instance(n_cells=25000, extent=13000.0, seed=3):
    """One window of LUAD-like tissue: blobby type regions, probs x100."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, extent, (n_cells, 2))
    centers = rng.uniform(0, extent, (len(LUAD_TYPES) * 6, 2))
    center_type = rng.integers(0, len(LUAD_TYPES), len(centers))
    d = ((xy[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    types = center_type[np.argmin(d, axis=1)]
    probs = np.full((n_cells, len(LUAD_TYPES)), 2.0)
    probs[np.arange(n_cells), types] = 86.0
    probs += rng.uniform(0, 2, probs.shape)
    probs = probs / probs.sum(1, keepdims=True) * 100.0

    def frame(jseed, keep_frac=1.0):
        r = np.random.default_rng(jseed)
        keep = r.random(n_cells) < keep_frac
        df = pd.DataFrame(
            xy[keep] + r.normal(0, 15.0, (int(keep.sum()), 2)),
            columns=["X", "Y"],
        )
        df["cell_type"] = np.asarray(LUAD_TYPES)[types[keep]]
        for k, nm in enumerate(LUAD_TYPES):
            df[nm] = probs[keep, k]
        df["Cell_Num_Old"] = np.arange(len(df))
        return df

    return frame(1), frame(2, keep_frac=0.94), list(LUAD_TYPES)


def run_once(mc_ref, mc_align, type_names, dp=25.0):
    import sys

    from same_tpu import run_same

    t0 = time.time()
    matches, var_out = run_same(
        ref_df=mc_ref.metacell_df,
        aligned_df=mc_align,
        commonCT=type_names,
        optim_params=dict(
            max_matches=1, radius=250, knn=8, no_match_penalty=10000,
            dist_ct_coeff=1, penalty_coeff=100, delaunay_penalty=dp,
            cell_id_col="metacell_id", ref_metacell_match_multiplier=3,
        ),
        solver_params=dict(
            mip_gap=0.05, lazy_allowed_flip_fraction=0.05,
            # Relative plateau margin, measured to pay on LUAD-grid-scale
            # windows only (BENCH_NOTES); the library default is 0.0
            # (exact improvement test) because a nonzero margin shifts
            # the heart/tongue incumbents off the parity numbers.
            tpu_tear_plateau_tol=1e-4,
            # Auction natural termination (opt-in, like the plateau margin
            # above): cuts warm re-solve rounds ~6x on these windows; the
            # library default 0 keeps exact termination for the
            # parity-pinned datasets.
            tpu_auction_patience=128,
        ),
        verbose=False,
    )
    stage = var_out.get("tpu", {}).get("stage_times", {})
    print(
        "stage_times: "
        + " ".join(f"{k}={v:.1f}" for k, v in stage.items() if v > 0.05),
        file=sys.stderr,
    )
    return time.time() - t0, matches, var_out


def _platform():
    import jax

    return jax.default_backend()


def main():
    import argparse

    from same_tpu import greedy_triangle_collapse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--dp", type=float, default=25.0,
        help="delaunay_penalty (25 = headline row; 50 = Fig S18 blow-up row)",
    )
    args = ap.parse_args()
    _wait_for_backend()
    # Reference baselines per dp from Fig S18 (total min / 9 windows).
    baselines = {25.0: 249.9 * 60.0 / 9.0, 50.0: 608.9 * 60.0 / 9.0}
    baseline_s = baselines.get(args.dp, BASELINE_SECONDS)

    ref_df, qry_df, type_names = make_instance()
    mc_align = greedy_triangle_collapse(
        qry_df, original_idx_col="Cell_Num_Old", max_metacell_size=3,
        r_max=250, min_angle_deg=15, return_object=True, verbose=False,
    )
    mc_ref = greedy_triangle_collapse(
        ref_df, original_idx_col="Cell_Num_Old", max_metacell_size=3,
        r_max=250, min_angle_deg=15, return_object=True, verbose=False,
    )

    # Warm-up run: XLA compilation for this shape bucket.
    run_once(mc_ref, mc_align, type_names, dp=args.dp)
    # Median of 3 measured runs: tunneled-TPU throughput varies up to ~2x
    # run-to-run (BENCH_NOTES), so a single draw makes the headline number
    # hostage to one tunnel hiccup.
    iters = []
    for _ in range(3):
        iters.append(run_once(mc_ref, mc_align, type_names, dp=args.dp))
    iters.sort(key=lambda t: t[0])
    elapsed, matches, var_out = iters[len(iters) // 2]
    walls = [round(t[0], 1) for t in iters]

    # Device-duty telemetry: wall seconds the device/tunnel was executing
    # vs host-side repair+eval, and auction bidding-round throughput.
    tpu = var_out["tpu"]
    stage = tpu.get("stage_times", {})
    dev_s = float(tpu.get("device_time") or stage.get("device_time") or 0.0)
    host_s = float(stage.get("repair_time", 0.0)) + float(
        stage.get("incumbent_eval_time", 0.0)
    )
    rounds_total = int(tpu.get("auction_rounds_total") or 0)

    print(
        json.dumps(
            {
                "metric": (
                    f"LUAD-scale window (MS=3, ~11k metacells) dp={args.dp:g} "
                    f"solve wall-clock (vs Gurobi "
                    f"{baseline_s / 60:.1f} min/window, Fig S18)"
                ),
                "value": round(elapsed, 3),
                "unit": "s",
                "vs_baseline": round(baseline_s / elapsed, 2),
                "iterations_s": walls,
                "spread_pct": round(
                    100.0 * (walls[-1] - walls[0]) / max(walls[0], 1e-9), 1
                ),
                "matches": int(len(matches)),
                "flip_fraction": round(
                    float(var_out["tpu"]["flip_fraction"]), 4
                ),
                "objective": round(float(var_out["tpu"]["objective"]), 1),
                "device_busy_s": round(dev_s, 1),
                "host_busy_s": round(host_s, 1),
                "device_duty": round(dev_s / max(elapsed, 1e-9), 3),
                "auction_rounds_total": rounds_total,
                "auction_rounds_per_s": (
                    round(rounds_total / dev_s, 1) if dev_s > 0 else None
                ),
                "platform": _platform(),
            }
        )
    )


if __name__ == "__main__":
    main()
