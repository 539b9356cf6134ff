import numpy as np
import pytest

from same_tpu.mesh_checks import (
    check_mesh_bounds,
    check_mesh_orientation,
    compute_filtered_delaunay,
    find_min_angle_triangles,
)
from same_tpu.warmstart import compute_warm_start_pairs, warm_start_prices


def _instance(rng, n=20, m=25, k=4):
    pairs, costs = [], []
    for i in range(n):
        for j in rng.choice(m, k, replace=False):
            pairs.append((i, int(j)))
            costs.append(float(rng.uniform(0, 10)))
    return np.asarray(pairs), np.asarray(costs), n, m


def test_greedy_warm_start_valid(rng):
    pairs, costs, n, m = _instance(rng)
    chosen, unmatched = compute_warm_start_pairs(
        valid_pairs=[tuple(p) for p in pairs], costs=costs, n_aligned=n,
        n_ref=m, aligned_sizes=np.ones(n), no_match_penalty=50.0,
        max_matches=1, init_method="greedy",
    )
    used_a = [i for i, _j, _v in chosen]
    used_r = [j for _i, j, _v in chosen]
    assert len(set(used_a)) == len(used_a)  # one-to-one
    assert len(set(used_r)) == len(used_r)
    assert set(used_a) | unmatched == set(range(n))
    # Chosen edges exist and indices are consistent.
    for i, j, v in chosen:
        assert tuple(pairs[v]) == (i, j)


def test_hungarian_warm_start_beats_greedy(rng):
    pairs, costs, n, m = _instance(rng, n=15, m=15, k=6)
    plist = [tuple(p) for p in pairs]
    kw = dict(valid_pairs=plist, costs=costs, n_aligned=n, n_ref=m,
              aligned_sizes=np.ones(n), no_match_penalty=50.0, max_matches=1)
    g_pairs, g_un = compute_warm_start_pairs(init_method="greedy", **kw)
    h_pairs, h_un = compute_warm_start_pairs(init_method="hungarian", **kw)

    def total(ch, un):
        return sum(costs[v] for _i, _j, v in ch) + 50.0 * len(un)

    assert total(h_pairs, h_un) <= total(g_pairs, g_un) + 1e-9


def test_hungarian_skips_when_too_big(rng):
    pairs, costs, n, m = _instance(rng)
    chosen, unmatched = compute_warm_start_pairs(
        valid_pairs=[tuple(p) for p in pairs], costs=costs, n_aligned=n,
        n_ref=m, aligned_sizes=np.ones(n), no_match_penalty=50.0,
        max_matches=1, init_method="hungarian", init_hungarian_max_n=10,
        verbose=False,
    )
    assert chosen == [] and unmatched == set()


def test_hungarian_requires_max_matches_one(rng):
    pairs, costs, n, m = _instance(rng)
    with pytest.raises(ValueError, match="max_matches"):
        compute_warm_start_pairs(
            valid_pairs=[tuple(p) for p in pairs], costs=costs, n_aligned=n,
            n_ref=m, aligned_sizes=np.ones(n), no_match_penalty=50.0,
            max_matches=2, init_method="hungarian",
        )


def test_warm_start_prices_shape(rng):
    from same_tpu.models.assignment import build_assignment_problem

    pairs, costs, n, m = _instance(rng)
    pb = build_assignment_problem(
        pairs, costs, n, m, np.ones(m, int), 100.0, np.full(n, 50.0)
    )
    chosen, _ = compute_warm_start_pairs(
        valid_pairs=[tuple(p) for p in pairs], costs=costs, n_aligned=n,
        n_ref=m, aligned_sizes=np.ones(n), no_match_penalty=50.0,
        max_matches=1, init_method="greedy",
    )
    prices = warm_start_prices(pb, chosen)
    assert prices.shape == (pb.n_slots + 1,)
    assert (prices >= 0).all()


def test_mesh_checks(rng):
    pts = rng.normal(size=(60, 2))
    tris = compute_filtered_delaunay(pts, min_angle_deg=10)
    assert len(tris) > 0
    report = check_mesh_orientation(pts, tris)
    assert report["n_triangles"] == len(tris)
    assert report["degenerate"] == 0
    bounds = check_mesh_bounds(pts, tris)
    assert bounds["indices_valid"]
    bad, angles = find_min_angle_triangles(pts, tris, min_angle_deg=10)
    assert len(bad) == 0  # already filtered at 10 degrees
    bad2, _ = find_min_angle_triangles(pts, tris, min_angle_deg=60)
    assert len(bad2) > 0
