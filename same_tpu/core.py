"""``run_same`` — the core single-window matching pipeline.

Drop-in replacement for the reference entry point (reference
src/same.py:706-1489) with the Gurobi MIP swapped for the TPU auction +
space-tearing solver. The DataFrame contract is preserved end to end:

- inputs: ``ref_df`` / ``aligned_df`` with X, Y, cell_type, probability
  columns named by ``commonCT``, optional ``size``; ``aligned_df`` may be a
  MetaCell object (duck-typed, reference src/same.py:891-899);
- outputs: ``(matches_df, var_out)`` with the reference's column set
  (aligned_idx, ref_idx, prob cols, X, Y, ref_X, ref_Y, size, ref_size,
  Ref_/Aligned_{cell_id_col}, time_limit_reached, triangle_violation,
  filtered_violation, run_time — reference src/same.py:1259-1278,1464-1472)
  and ``var_out`` diagnostics keys (reference src/same.py:1410-1432);
- artifacts: var_out.npy, aligned_df.csv, ref_df.csv, matches_df.csv under
  ``outprefix`` (reference src/same.py:1455-1481).

Internally the window is arrays, not DataFrames: padded candidate tensors,
triangle arrays, and the slot-expanded assignment problem, solved on device.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import numpy as np
import pandas as pd

from .candidates import find_knn_with_cell_type_priority, find_knn_within_radius
from .eval import (
    precompute_triangle_info,
    print_violation_report,
    verify_spatial_preservation,
)
from .geometry import (
    calculate_signed_area,
    delaunay_simplices,
    filter_triangles_by_radius,
    orientation_signs_np,
)
from .models.assignment import build_assignment_problem
from .solver.tearing import solve_with_tearing
from .utils.params import init_optim_params, init_solver_params


def _as_triangle_array(delaunay_like):
    """Normalize triangulation-like input to an int [T, 3] array."""
    if delaunay_like is None:
        return None
    if isinstance(delaunay_like, np.ndarray):
        tri = delaunay_like
    elif isinstance(delaunay_like, pd.DataFrame):
        tri = delaunay_like.iloc[:, :3].to_numpy()
    else:
        tri = np.asarray(delaunay_like)
    if tri.size == 0:
        return np.array([], dtype=int).reshape(0, 3)
    if tri.ndim != 2 or tri.shape[1] != 3:
        raise ValueError(f"aligned_delaunay must have shape (n, 3); got {tri.shape}")
    return tri.astype(int, copy=False)


def _remap_triangles_by_vertex_ids(triangles, vertex_ids):
    """Map vertex-ID-space triangles to 0..n-1 rows, dropping missing ones.

    Parity with reference src/same.py:262-290.
    """
    tri = _as_triangle_array(triangles)
    if tri is None or tri.size == 0:
        return tri
    id_to_row = {v: i for i, v in enumerate(vertex_ids)}
    flat = tri.reshape(-1)
    remapped = np.fromiter(
        (id_to_row.get(v, -1) for v in flat), dtype=np.int64, count=flat.size
    ).reshape(tri.shape)
    return remapped[(remapped >= 0).all(axis=1)]


def pair_costs_for(
    aligned_df, ref_df, pairs, commonCT, dist_ct_coeff: float
) -> np.ndarray:
    """Objective costs per candidate pair (reference src/same.py:1183-1189).

    c = dist_ct_coeff * L1(prob columns) + 0.001 * dist_ct_coeff * L1(coords)
    """
    pairs = np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
    probs_a = aligned_df[list(commonCT)].to_numpy(dtype=np.float64)
    probs_r = ref_df[list(commonCT)].to_numpy(dtype=np.float64)
    xy_a = aligned_df[["X", "Y"]].to_numpy(dtype=np.float64)
    xy_r = ref_df[["X", "Y"]].to_numpy(dtype=np.float64)
    dist_ct = np.abs(probs_a[pairs[:, 0]] - probs_r[pairs[:, 1]]).sum(axis=1)
    dist_xy = np.abs(xy_a[pairs[:, 0]] - xy_r[pairs[:, 1]]).sum(axis=1)
    return dist_ct_coeff * dist_ct + (0.001 * dist_ct_coeff) * dist_xy


def run_same(
    ref_df,
    aligned_df,
    commonCT,
    outprefix: Optional[str] = None,
    aligned_delaunay=None,
    aligned_delaunay_vertex_col: Optional[str] = None,
    optim_params: Optional[Dict[str, Any]] = None,
    gurobi_params: Optional[Dict[str, Any]] = None,
    solver_params: Optional[Dict[str, Any]] = None,
    ignore_precomputed_triangulation: bool = False,
    verbose: bool = True,
):
    """Find optimal spatial matches between aligned and reference cells.

    See module docstring for the I/O contract. ``gurobi_params`` is accepted
    for API parity and merged with ``solver_params``.
    """
    t_start = time.time()
    if solver_params is None:
        solver_params = gurobi_params or {}
    elif gurobi_params:
        merged = dict(gurobi_params)
        merged.update(solver_params)
        solver_params = merged
    if optim_params is None:
        optim_params = {}

    # MetaCell duck-typing (reference src/same.py:891-899).
    if hasattr(aligned_df, "metacell_df") and hasattr(aligned_df, "metacell_delaunay"):
        mc = aligned_df
        aligned_df = mc.metacell_df
        if aligned_delaunay is None and not ignore_precomputed_triangulation:
            aligned_delaunay = mc.metacell_delaunay
        if aligned_delaunay_vertex_col is None and hasattr(mc, "metacell_idx_col"):
            aligned_delaunay_vertex_col = mc.metacell_idx_col
        if (optim_params.get("cell_id_col") is None) and hasattr(
            mc, "metacell_idx_col"
        ):
            optim_params = dict(optim_params)
            optim_params["cell_id_col"] = mc.metacell_idx_col

    optim = init_optim_params(**(optim_params or {}))
    solver = init_solver_params(**(solver_params or {}))

    max_matches = optim["max_matches"]
    ref_metacell_match_multiplier = optim["ref_metacell_match_multiplier"]
    radius = optim["radius"]
    penalty_coeff = optim["penalty_coeff"]
    no_match_penalty = optim["no_match_penalty"]
    delaunay_penalty = optim["delaunay_penalty"]
    dist_ct_coeff = optim["dist_ct_coeff"]
    knn = optim["knn"]
    hard_spatial = optim["hard_spatial_constraints"]
    ignore_same_type = optim["ignore_same_type_triangles"]
    lazy_constraints = optim["lazy_constraints"]
    min_angle_deg = optim.get("min_angle_deg", 15)
    cell_id_col = optim["cell_id_col"]

    # Default size column (metacell auto-detection, reference :933-939).
    aligned_df = aligned_df.copy()
    ref_df = ref_df.copy()
    if "size" not in aligned_df.columns:
        aligned_df["size"] = 1
    if "size" not in ref_df.columns:
        ref_df["size"] = 1
    if "__orig_idx" not in aligned_df.columns:
        aligned_df["__orig_idx"] = aligned_df.index.to_numpy()
    if "__orig_idx" not in ref_df.columns:
        ref_df["__orig_idx"] = ref_df.index.to_numpy()

    # Stable vertex IDs for precomputed-triangulation remapping (:962-970).
    if aligned_delaunay_vertex_col is None:
        aligned_df["__tri_vid"] = aligned_df.index.to_numpy()
    else:
        if aligned_delaunay_vertex_col not in aligned_df.columns:
            raise ValueError(
                f"aligned_delaunay_vertex_col='{aligned_delaunay_vertex_col}' "
                "not in aligned_df"
            )
        aligned_df["__tri_vid"] = aligned_df[aligned_delaunay_vertex_col].to_numpy()

    if verbose:
        print(
            f"Aligned points: {len(aligned_df)} "
            f"(cells: {aligned_df['size'].sum():.0f}); "
            f"ref points: {len(ref_df)} (cells: {ref_df['size'].sum():.0f})"
        )

    # Candidate generation (:972-979).
    if optim["ignore_knn_if_matched"]:
        aligned_df, ref_df, valid_pairs = find_knn_with_cell_type_priority(
            aligned_df, ref_df, radius, knn=knn
        )
    else:
        aligned_df, ref_df, valid_pairs = find_knn_within_radius(
            aligned_df, ref_df, radius, knn=knn
        )
    valid_pairs = np.asarray(valid_pairs, dtype=np.int64).reshape(-1, 2)
    if len(valid_pairs) == 0:
        raise ValueError(
            "No valid_pairs after KNN filtering. Increase radius and/or knn."
        )
    n_aligned = len(aligned_df)
    n_ref = len(ref_df)

    # Triangulation: fresh or precomputed+remapped (:1016-1031).
    aligned_coords = aligned_df[["X", "Y"]].to_numpy(dtype=np.float64)
    using_precomputed = False
    if aligned_delaunay is None or ignore_precomputed_triangulation:
        tris = delaunay_simplices(aligned_coords)
    else:
        using_precomputed = True
        tris = _remap_triangles_by_vertex_ids(
            aligned_delaunay, aligned_df["__tri_vid"].to_numpy()
        )

    cell_types = (
        aligned_df["cell_type"].to_numpy()
        if "cell_type" in aligned_df.columns
        else None
    )
    unconstrained_nodes: set = set()
    if using_precomputed:
        tris, unconstrained_nodes = filter_triangles_by_radius(
            aligned_coords,
            tris,
            radius,
            cell_types=cell_types,
            ignore_same_type_triangles=ignore_same_type,
            remove_unconstrained_nodes=True,
            min_angle_deg=min_angle_deg,
            verbose=verbose,
        )
    else:
        tris = filter_triangles_by_radius(
            aligned_coords,
            tris,
            radius,
            cell_types=cell_types,
            ignore_same_type_triangles=ignore_same_type,
            min_angle_deg=min_angle_deg,
            verbose=verbose,
        )
    tris = np.asarray(tris, dtype=np.int64).reshape(-1, 3)

    # Remove unconstrained nodes (precomputed path only, :1055-1085).
    if unconstrained_nodes:
        if verbose:
            print(
                f"Removing {len(unconstrained_nodes)} unconstrained nodes "
                "from optimization"
            )
        keep = np.array(
            [i for i in range(n_aligned) if i not in unconstrained_nodes],
            dtype=np.int64,
        )
        old_to_new = np.full(n_aligned, -1, dtype=np.int64)
        old_to_new[keep] = np.arange(len(keep))
        pair_keep = old_to_new[valid_pairs[:, 0]] >= 0
        valid_pairs = np.column_stack(
            [old_to_new[valid_pairs[pair_keep, 0]], valid_pairs[pair_keep, 1]]
        )
        if tris.size:
            tri_ok = (old_to_new[tris] >= 0).all(axis=1)
            tris = old_to_new[tris[tri_ok]]
        aligned_df = aligned_df.iloc[keep].reset_index(drop=True)
        aligned_coords = aligned_df[["X", "Y"]].to_numpy(dtype=np.float64)
        n_aligned = len(aligned_df)
        if len(valid_pairs) == 0:
            raise ValueError("No valid_pairs after unconstrained-node removal.")

    # Simplex map + triangle info (:1095-1108).
    aligned_simplex_map = {i: set() for i in range(n_aligned)}
    for t, tri in enumerate(tris):
        for v in tri:
            aligned_simplex_map[int(v)].add(t)
    triangle_info = precompute_triangle_info(aligned_df, tris, aligned_simplex_map)

    # Costs, weights, orientations.
    costs = pair_costs_for(aligned_df, ref_df, valid_pairs, commonCT, dist_ct_coeff)
    sizes_a = aligned_df["size"].to_numpy(dtype=np.float64)
    sizes_r = ref_df["size"].to_numpy(dtype=np.float64)
    tri_weights = (
        sizes_a[tris].sum(axis=1) if tris.size else np.zeros(0, dtype=np.float64)
    )
    source_signs = (
        orientation_signs_np(aligned_coords, tris)
        if tris.size
        else np.zeros(0, dtype=np.int32)
    )

    # Ref capacities (reference src/helpers.py:118-137).
    ref_has_metacells = (sizes_r > 1).any()
    if ref_has_metacells:
        mult = ref_metacell_match_multiplier
        if mult is None:
            mult = int(sizes_r.max())
        ref_limits = np.where(sizes_r > 1, mult * max_matches, max_matches).astype(
            np.int64
        )
        if verbose:
            print(
                f"Ref has metacells: individuals get {max_matches}, "
                f"metacells get {mult * max_matches} matches"
            )
    else:
        ref_limits = np.full(n_ref, max_matches, dtype=np.int64)

    no_match_cost = no_match_penalty * sizes_a

    problem = build_assignment_problem(
        valid_pairs,
        costs,
        n_aligned,
        n_ref,
        ref_limits,
        penalty_coeff,
        no_match_cost,
    )

    ref_coords = ref_df[["X", "Y"]].to_numpy(dtype=np.float64)
    if verbose:
        print(
            f"Solving: {len(valid_pairs)} pairs, {len(tris)} triangles, "
            f"{'lazy' if lazy_constraints else 'eager'} tearing, "
            f"dp={delaunay_penalty}"
        )

    allowed_frac = (
        solver["lazy_allowed_flip_fraction"] if lazy_constraints else 0.0
    )
    # Auction epsilon scaled to the requested optimality gap: n * eps bounds
    # the suboptimality, so eps = mip_gap * objective_lower_bound / n matches
    # Gurobi's relative-gap termination (reference mip_gap semantics) while
    # avoiding epsilon-wars far below the tolerance. The lower bound ignores
    # conflicts: sum over points of min(best pair cost, no-match cost).
    best_pair_cost = np.full(n_aligned, np.inf)
    np.minimum.at(best_pair_cost, valid_pairs[:, 0], costs)
    obj_lb = float(np.minimum(best_pair_cost, no_match_cost).sum())
    eps_solver = max(
        float(solver["tpu_eps_final"]),
        float(solver["mip_gap"]) * obj_lb / max(n_aligned, 1) / 4.0,
    )
    result = solve_with_tearing(
        problem,
        costs,
        tris,
        tri_weights,
        source_signs,
        ref_coords,
        delaunay_penalty=float(delaunay_penalty),
        penalty_coeff=float(penalty_coeff),
        allowed_flip_fraction=allowed_frac,
        max_cuts=solver["lazy_max_cuts"],
        max_cuts_per_round=solver["lazy_max_cuts_per_incumbent"],
        max_tear_rounds=solver["tpu_max_tear_rounds"],
        eps_final=eps_solver,
        hard=hard_spatial,
        verbose=verbose,
    )
    solve_time = time.time() - t_start
    time_limit = solver["time_limit"]
    time_limit_reached = bool(
        time_limit is not None and solve_time > float(time_limit)
    )

    match_ref = result.match_ref
    match_pair = result.match_pair

    # ---- Output assembly (reference :1259-1278) ---------------------------
    sel_pairs = np.sort(match_pair[match_pair >= 0])
    out_df = pd.DataFrame(
        {
            "aligned_idx": valid_pairs[sel_pairs, 0],
            "ref_idx": valid_pairs[sel_pairs, 1],
        }
    )
    for ct in list(commonCT) + ["X", "Y"]:
        out_df[ct] = aligned_df[ct].to_numpy()[out_df["aligned_idx"]]
    for ct in ["X", "Y"]:
        out_df[f"ref_{ct}"] = ref_df[ct].to_numpy()[out_df["ref_idx"]]
    out_df["size"] = sizes_a[out_df["aligned_idx"]]
    out_df["ref_size"] = sizes_r[out_df["ref_idx"]]
    out_df[f"Ref_{cell_id_col}"] = ref_df[cell_id_col].to_numpy()[out_df["ref_idx"]]
    out_df[f"Aligned_{cell_id_col}"] = aligned_df[cell_id_col].to_numpy()[
        out_df["aligned_idx"]
    ]
    out_df["time_limit_reached"] = time_limit_reached

    # ---- Violation verification (:1302-1310) ------------------------------
    violations = verify_spatial_preservation(
        aligned_df=aligned_df,
        ref_df=ref_df,
        matches_df=out_df,
        triangle_info=triangle_info,
    )
    if verbose:
        print_violation_report(violations)

    # ---- Triangle area analysis (:1355-1408) ------------------------------
    T = len(tris)
    areas_before = {}
    areas_after = {}
    flipped_tris = []
    matched_vertices = {}
    aligned_to_ref = {
        int(i): int(j) for i, j in zip(out_df["aligned_idx"], out_df["ref_idx"])
    }
    for t in range(T):
        p1, p2, p3 = (int(v) for v in tris[t])
        areas_before[t] = calculate_signed_area(
            tuple(aligned_coords[p1]), tuple(aligned_coords[p2]),
            tuple(aligned_coords[p3]),
        )
        matched = [p in aligned_to_ref for p in (p1, p2, p3)]
        matched_vertices[t] = matched
        if not all(matched):
            areas_after[t] = None
            continue
        rc = [tuple(ref_coords[aligned_to_ref[p]]) for p in (p1, p2, p3)]
        area = calculate_signed_area(*rc)
        areas_after[t] = area
        if areas_before[t] * area < 0:
            flipped_tris.append(t)

    # Penalty points: vertices of triangles paying the q_t price (:1326-1352).
    penalty_points = set()
    for t in np.flatnonzero(result.q_active):
        for v in tris[t]:
            penalty_points.add(int(v))
    violation_points = set(violations["points_with_violations"])
    points_both = violation_points & penalty_points

    # x vector over pairs for var_out parity.
    x_vec = np.zeros(len(valid_pairs), dtype=np.float64)
    x_vec[sel_pairs] = 1.0
    no_match_vec = np.ones(n_aligned, dtype=np.float64)
    no_match_vec[match_ref >= 0] = 0.0
    u = np.bincount(match_ref[match_ref >= 0], minlength=n_ref)
    penalty_vec = np.maximum(u - 1, 0).astype(np.float64)
    q_vec = result.q_active.astype(np.float64) if T else np.zeros(0)

    var_out = {
        "x": x_vec.tolist(),
        "no_match_vars": no_match_vec.tolist(),
        "penalty_vars": penalty_vec.tolist(),
        "area_penalty_vars": q_vec.tolist(),
        "violations": violations,
        "violation_penalty_comparison": {
            "points_both": list(points_both),
            "points_only_violations": list(violation_points - penalty_points),
            "points_only_penalties": list(penalty_points - violation_points),
        },
        "triangle_data": {
            "triangles": tris,
            "triangle_info": triangle_info,
            "aligned_simplex_map": aligned_simplex_map,
            "areas_before": areas_before,
            "areas_after": areas_after,
            "flipped_triangles": flipped_tris,
            "matched_vertices": matched_vertices,
        },
        "lazy_constraints": lazy_constraints,
        "lazy_cuts_added": result.cuts_added,
        # TPU solver diagnostics (extension keys).
        "tpu": {
            "objective": result.objective,
            "assignment_objective": result.assignment_objective,
            "flip_fraction": result.flip_fraction,
            "tear_rounds": result.tear_rounds,
            "auction_rounds": result.info.get("rounds"),
            "solve_time": solve_time,
        },
    }

    if outprefix:
        os.makedirs(outprefix, exist_ok=True)
        np.save(os.path.join(outprefix, "var_out.npy"), var_out, allow_pickle=True)
        aligned_df.to_csv(os.path.join(outprefix, "aligned_df.csv"), index=False)
        ref_df.to_csv(os.path.join(outprefix, "ref_df.csv"), index=False)

    # triangle_violation from actual signed-area flips (:1464-1471).
    flipped_nodes = set()
    for t in flipped_tris:
        for v in tris[t]:
            flipped_nodes.add(int(v))
    out_df["triangle_violation"] = out_df["aligned_idx"].isin(flipped_nodes)
    out_df["filtered_violation"] = out_df["aligned_idx"].isin(points_both)
    out_df["run_time"] = solve_time

    if outprefix:
        out_df.to_csv(os.path.join(outprefix, "matches_df.csv"), index=False)
    if verbose:
        print(
            f"Matches: {len(out_df)}/{n_aligned}; flips: "
            f"{len(flipped_tris)}/{T}; objective: {result.objective:.3f}; "
            f"time: {solve_time:.2f}s"
        )
    return out_df, var_out
