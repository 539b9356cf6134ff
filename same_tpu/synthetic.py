"""Synthetic 4-quadrant benchmark generator.

Fresh implementation of the benchmark design documented in the reference
(src/synthetic_datagen.py): four 10x10-grid quadrants, 3 cell classes, each
quadrant stressing one failure mode of spatial matching:

- top-left: one class entirely missing from the query, plus jitter;
- top-right: smooth GP deformation with noisy (~uniform) class probabilities;
- bottom-right: space fold — shear inside a disc plus swapped adjacent point
  pairs (guaranteed triangle flips);
- bottom-left: topological split — one ellipse of class c2 in the reference
  becomes two rings in the query.

Output contract matches the reference data files: DataFrames with columns
``X, Y, cell_type, c1, c2, c3, quadrant, cell_idx`` (probabilities scaled to
sum 100) and a ground-truth DataFrame with ``query_idx, ref_idx`` (-1 where
no correspondence exists). The RBF-kernel GP deformation is implemented
directly (no sklearn dependency on the hot path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

CLASS_NAMES = ["c1", "c2", "c3"]


def _grid(x_range, y_range, n_per_side, jitter, rng):
    x = np.linspace(x_range[0], x_range[1], n_per_side)
    y = np.linspace(y_range[0], y_range[1], n_per_side)
    X, Y = np.meshgrid(x, y)
    pts = np.column_stack([X.ravel(), Y.ravel()])
    return pts + rng.normal(0, jitter, pts.shape)


def _checkerboard(points, classes_to_use, grid_scale=0.6):
    h = (np.floor(points[:, 0] / grid_scale) + np.floor(points[:, 1] / grid_scale))
    h = h.astype(int) % len(classes_to_use)
    return np.asarray(classes_to_use)[h]


def _gp_deformation(points, rng, length_scale=2.5, variance=0.05):
    """Smooth 2D displacement field from an RBF-kernel GP."""
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    K = variance * np.exp(-0.5 * d2 / length_scale**2)
    K += 1e-6 * np.eye(len(points))
    L = np.linalg.cholesky(K)
    return L @ rng.normal(size=(len(points), 2))


def _soft_one_hot(classes, rng, confident=True):
    n = len(classes)
    probs = np.zeros((n, 3))
    for i, c in enumerate(classes):
        if confident:
            p_main = 0.85 + rng.uniform(0, 0.1)
        else:
            p_main = 0.33 + rng.uniform(0.05, 0.15)
        rest = 1.0 - p_main
        others = [j for j in range(3) if j != c]
        probs[i, c] = p_main
        for j in others:
            probs[i, j] = rest / 2 + rng.uniform(-0.02, 0.02)
        probs[i] = np.clip(probs[i], 0, 1)
        probs[i] /= probs[i].sum()
    return probs * 100.0


def _quadrant_missing_class(rng):
    """Top-left: ref has c1+c2+c3 checkerboard; query drops all c3 + jitter."""
    ref = _grid((1, 6), (7.25, 12.25), 10, 0.1, rng)
    ref_cls = _checkerboard(ref, [0, 1, 2])
    qry = ref + _gp_deformation(ref, rng)
    keep = ref_cls != 2
    qry = qry[keep] + rng.normal(0, 0.1, (keep.sum(), 2))
    return dict(
        ref_points=ref, ref_classes=ref_cls,
        query_points=qry, query_classes=ref_cls[keep],
        ground_truth=np.flatnonzero(keep),
        name="top_left", noisy_probs=False,
    )


def _quadrant_noisy_probs(rng):
    """Top-right: GP deformation only; query probabilities near-uniform."""
    ref = _grid((7.25, 12.25), (7.25, 12.25), 10, 0.1, rng)
    ref_cls = _checkerboard(ref, [0, 1, 2])
    qry = ref + _gp_deformation(ref, rng)
    return dict(
        ref_points=ref, ref_classes=ref_cls,
        query_points=qry, query_classes=ref_cls.copy(),
        ground_truth=np.arange(len(ref)),
        name="top_right", noisy_probs=True,
    )


def _quadrant_space_fold(rng, n_swaps=3):
    """Bottom-right: shear in a disc + swapped adjacent pairs (true tears)."""
    ref = _grid((7.25, 12.25), (1, 6), 10, 0.1, rng)
    ref_cls = _checkerboard(ref, [0, 1, 2])
    qry = ref + _gp_deformation(ref, rng, length_scale=2.0)
    qry += rng.normal(0, 0.05, qry.shape)

    center = np.array([8.5, 2.5])
    in_disc = np.linalg.norm(ref - center, axis=1) < 2.5
    shear = np.array([[1.0, 0.35], [0.0, 1.0]])
    qry[in_disc] = (qry[in_disc] - center) @ shear.T + center

    gt = np.arange(len(ref))
    d = np.linalg.norm(ref[:, None, :] - ref[None, :, :], axis=2)
    np.fill_diagonal(d, np.inf)
    used: set[int] = set()
    swapped = []
    for _ in range(n_swaps):
        # closest remaining pair
        masked = d.copy()
        if used:
            idx = list(used)
            masked[idx, :] = np.inf
            masked[:, idx] = np.inf
        a, b = np.unravel_index(np.argmin(masked), masked.shape)
        if not np.isfinite(masked[a, b]):
            break
        qry[[a, b]] = qry[[b, a]]
        gt[a], gt[b] = b, a
        used.update((int(a), int(b)))
        swapped.append((int(a), int(b)))
    return dict(
        ref_points=ref, ref_classes=ref_cls,
        query_points=qry, query_classes=ref_cls.copy(),
        ground_truth=gt, swapped_pairs=swapped,
        name="bottom_right", noisy_probs=False,
    )


def _quadrant_topological_split(rng):
    """Bottom-left: ref = background + one c2 ellipse; query = two c2 rings."""
    grid = _grid((1, 6), (1, 6), 10, 0.05, rng)
    grid_cls = _checkerboard(grid, [0, 2])

    ell_c = np.array([3.5, 3.5])
    ell_a, ell_b = 1.5, 0.8
    r1_c, r2_c = np.array([2.1, 3.5]), np.array([4.1, 3.5])
    ring_r, n_ring = 0.6, 10

    d_ell = np.sqrt(
        ((grid[:, 0] - ell_c[0]) / ell_a) ** 2 + ((grid[:, 1] - ell_c[1]) / ell_b) ** 2
    )
    ref_bg = d_ell > 1.0
    qry_bg = (np.linalg.norm(grid - r1_c, axis=1) > ring_r + 0.1) & (
        np.linalg.norm(grid - r2_c, axis=1) > ring_r + 0.1
    )

    ang = np.linspace(0, 2 * np.pi, 2 * n_ring, endpoint=False)
    ellipse = np.column_stack(
        [ell_c[0] + ell_a * np.cos(ang), ell_c[1] + ell_b * np.sin(ang)]
    ) + rng.normal(0, 0.03, (2 * n_ring, 2))

    ref_pts = np.vstack([grid[ref_bg], ellipse])
    ref_cls = np.concatenate([grid_cls[ref_bg], np.ones(2 * n_ring, dtype=int)])

    bg = grid[qry_bg]
    if len(bg):
        bg = bg + _gp_deformation(bg, rng, length_scale=2.0)
    ang1 = np.linspace(0, 2 * np.pi, n_ring, endpoint=False)
    ring1 = np.column_stack(
        [r1_c[0] + ring_r * np.cos(ang1), r1_c[1] + ring_r * np.sin(ang1)]
    ) + rng.normal(0, 0.03, (n_ring, 2))
    ring2 = np.column_stack(
        [r2_c[0] + ring_r * np.cos(ang1), r2_c[1] + ring_r * np.sin(ang1)]
    ) + rng.normal(0, 0.03, (n_ring, 2))
    qry_pts = np.vstack([bg, ring1, ring2])
    qry_cls = np.concatenate([grid_cls[qry_bg], np.ones(2 * n_ring, dtype=int)])

    gt = np.full(len(qry_pts), -1, dtype=int)
    n_ref_bg = int(ref_bg.sum())
    for i in range(int(qry_bg.sum())):
        gt[i] = i if i < n_ref_bg else -1
    return dict(
        ref_points=ref_pts, ref_classes=ref_cls,
        query_points=qry_pts, query_classes=qry_cls,
        ground_truth=gt,
        name="bottom_left", noisy_probs=False,
    )


def create_full_benchmark(seed: int = 8899):
    """Build the complete benchmark.

    Returns ``(ref_df, query_df, quadrants, ground_truth_df, expression)``
    following the reference's return contract
    (src/synthetic_datagen.py:530-643). ``expression`` holds simulated
    100-gene matrices keyed 'ref'/'query'.
    """
    rng = np.random.default_rng(seed)
    quadrants = {
        q["name"]: q
        for q in (
            _quadrant_missing_class(rng),
            _quadrant_noisy_probs(rng),
            _quadrant_space_fold(rng),
            _quadrant_topological_split(rng),
        )
    }

    order = ["top_left", "top_right", "bottom_right", "bottom_left"]
    ref_pts, ref_cls, qry_pts, qry_cls = [], [], [], []
    ref_quad, qry_quad, gt_pairs = [], [], []
    qry_probs = []
    r_off = q_off = 0
    for name in order:
        q = quadrants[name]
        for qi, ri in enumerate(q["ground_truth"]):
            gt_pairs.append((q_off + qi, (r_off + ri) if ri >= 0 else -1))
        ref_pts.append(q["ref_points"])
        ref_cls.append(q["ref_classes"])
        qry_pts.append(q["query_points"])
        qry_cls.append(q["query_classes"])
        ref_quad.extend([name] * len(q["ref_points"]))
        qry_quad.extend([name] * len(q["query_points"]))
        qry_probs.append(
            _soft_one_hot(q["query_classes"], rng, confident=not q["noisy_probs"])
        )
        r_off += len(q["ref_points"])
        q_off += len(q["query_points"])

    ref_pts = np.vstack(ref_pts)
    ref_cls = np.concatenate(ref_cls)
    qry_pts = np.vstack(qry_pts)
    qry_cls = np.concatenate(qry_cls)
    ref_probs = _soft_one_hot(ref_cls, rng, confident=True)
    qry_probs = np.vstack(qry_probs)

    ref_df = pd.DataFrame(
        {
            "X": ref_pts[:, 0],
            "Y": ref_pts[:, 1],
            "cell_type": [CLASS_NAMES[c] for c in ref_cls],
            "c1": ref_probs[:, 0],
            "c2": ref_probs[:, 1],
            "c3": ref_probs[:, 2],
            "quadrant": ref_quad,
            "cell_idx": np.arange(len(ref_pts)),
        }
    )
    query_df = pd.DataFrame(
        {
            "X": qry_pts[:, 0],
            "Y": qry_pts[:, 1],
            "cell_type": [CLASS_NAMES[c] for c in qry_cls],
            "c1": qry_probs[:, 0],
            "c2": qry_probs[:, 1],
            "c3": qry_probs[:, 2],
            "quadrant": qry_quad,
            "cell_idx": np.arange(len(qry_pts)),
        }
    )
    ground_truth_df = pd.DataFrame(gt_pairs, columns=["query_idx", "ref_idx"])

    expression = {
        "ref": simulate_expression(ref_cls, rng),
        "query": simulate_expression(qry_cls, rng),
    }
    return ref_df, query_df, quadrants, ground_truth_df, expression


def check_triangle_violations_within_quadrants(matches_df, mc_align):
    """Flag triangle flips, counting only triangles internal to a quadrant.

    Vectorized re-implementation of the reference evaluation helper
    (reference src/synthetic_datagen.py:1314-1418): for every Delaunay
    triangle of the aligned metacells whose three vertices (a) lie in the
    same quadrant and (b) are all matched, compare the signed area at the
    matched reference positions against the query positions; a sign flip
    marks all three nodes. Cross-quadrant triangles are ignored — the
    benchmark's quadrant boundaries are intentional discontinuities.

    Returns a copy of ``matches_df`` with the ``triangle_violation`` column
    replaced by the quadrant-local verdicts.
    """
    simplices = np.asarray(mc_align.metacell_delaunay, dtype=np.int64).reshape(-1, 3)
    metacell_df = mc_align.metacell_df

    if "Aligned_metacell_id" in matches_df.columns:
        aligned_mc = matches_df["Aligned_metacell_id"].to_numpy()
    else:
        aligned_mc = matches_df["aligned_idx"].to_numpy()

    n_mc = len(metacell_df)
    quad = pd.factorize(metacell_df["quadrant"])[0]

    # metacell_id -> row in matches_df (-1 when unmatched).
    mc_to_row = np.full(n_mc, -1, dtype=np.int64)
    valid_ids = (aligned_mc >= 0) & (aligned_mc < n_mc)
    mc_to_row[aligned_mc[valid_ids]] = np.flatnonzero(valid_ids)

    tri_ok = (simplices >= 0).all(axis=1) & (simplices < n_mc).all(axis=1)
    tris = simplices[tri_ok]
    same_quad = (quad[tris[:, 0]] == quad[tris[:, 1]]) & (
        quad[tris[:, 1]] == quad[tris[:, 2]]
    )
    rows = mc_to_row[tris]
    all_matched = (rows >= 0).all(axis=1)
    use = same_quad & all_matched
    rows = rows[use]

    qx = matches_df["X"].to_numpy()
    qy = matches_df["Y"].to_numpy()
    rx = matches_df["ref_X"].to_numpy()
    ry = matches_df["ref_Y"].to_numpy()

    def signed_area(xs, ys):
        return 0.5 * (
            (xs[:, 1] - xs[:, 0]) * (ys[:, 2] - ys[:, 0])
            - (xs[:, 2] - xs[:, 0]) * (ys[:, 1] - ys[:, 0])
        )

    area_q = signed_area(qx[rows], qy[rows])
    area_r = signed_area(rx[rows], ry[rows])
    flipped = area_q * area_r < 0

    violations = np.zeros(len(matches_df), dtype=bool)
    violations[rows[flipped].ravel()] = True
    out = matches_df.copy()
    out["triangle_violation"] = violations
    return out


def simulate_expression(classes, rng, n_genes: int = 100):
    """Class-structured positive expression matrix (3 gene blocks)."""
    classes = np.asarray(classes)
    blocks = np.array_split(np.arange(n_genes), 3)
    means = np.full((3, n_genes), 0.0)
    for c in range(3):
        means[c] = rng.uniform(1, 3, n_genes)
        means[c, blocks[c]] = rng.uniform(8, 12, len(blocks[c]))
    expr = means[classes] + rng.normal(0, 0.2, (len(classes), n_genes)) * means[classes]
    expr = np.maximum(expr, 0.1)
    df = pd.DataFrame(expr, columns=[f"gene_{i}" for i in range(n_genes)])
    df.index.name = "cell_idx"
    return df
