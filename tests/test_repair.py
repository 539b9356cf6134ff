"""Incremental repair accounting vs full objective recomputation."""

import numpy as np
import pytest

from same_tpu.models.assignment import build_assignment_problem, matching_objective
from same_tpu.solver.repair import _RepairState, local_repair


def _instance(rng, n=60):
    pts = rng.uniform(0, 12, (n, 2))
    ref = pts + rng.normal(0, 0.4, pts.shape)
    pairs, costs = [], []
    for i in range(n):
        d = np.abs(ref - pts[i]).sum(1)
        for j in np.argsort(d)[:5]:
            pairs.append((i, int(j)))
            costs.append(float(d[j]) + rng.uniform(0, 3))
    pairs, costs = np.asarray(pairs), np.asarray(costs)
    nm = np.full(n, 20.0)
    pb = build_assignment_problem(pairs, costs, n, n, np.ones(n, np.int64), 50.0, nm)

    from same_tpu.geometry import delaunay_simplices, orientation_signs_np

    tris = delaunay_simplices(pts)
    src = orientation_signs_np(pts, tris)
    w = 3.0 * np.ones(len(tris))
    return pb, pairs, costs, tris, w, src, ref, nm


def _full_objective(pb, costs, tris, w, ref, nm, mr, mp, cuts, dp=7.0, pc=50.0):
    n = pb.n_aligned
    mc = np.zeros(n)
    sel = mp >= 0
    mc[sel] = costs[mp[sel]]
    base = matching_objective(mr, mc, pb.n_ref, pc, nm)
    T = len(tris)
    q = np.zeros(T, bool)
    if cuts is not None:
        ct, cv, cp = cuts
        active = (mp[cv] == cp).all(axis=1)
        q[ct[active]] = True
    return base + dp * w[q].sum()


def test_delta_matches_full_recompute(rng):
    pb, pairs, costs, tris, w, src, ref, nm = _instance(rng)
    n = pb.n_aligned
    # Random feasible matching.
    mr = np.full(n, -1, np.int64)
    mp = np.full(n, -1, np.int64)
    used = set()
    for i in rng.permutation(n):
        cols = np.flatnonzero(pb.valid[i])
        rng.shuffle(cols)
        for c in cols:
            j = int(pb.cand_ref[i, c])
            if j not in used and rng.random() < 0.8:
                used.add(j)
                mr[i] = j
                mp[i] = int(pb.pair_idx[i, c])
                break
    # Random cut registry over matched triples.
    ct, cv, cp = [], [], []
    for t, tri in enumerate(tris):
        if (mr[tri] >= 0).all() and rng.random() < 0.4:
            ct.append(t)
            cv.append(tri.copy())
            cp.append(mp[tri].copy())
    cuts = (np.asarray(ct), np.asarray(cv), np.asarray(cp)) if ct else None

    st = _RepairState(
        pb, costs, tris, w, src, ref, mr.copy(), mp.copy(), cuts, 7.0, 50.0
    )
    assert st.obj == pytest.approx(
        _full_objective(pb, costs, tris, w, ref, nm, mr, mp, cuts)
    )

    # Random move sequence: every delta must equal the full recompute diff.
    for _ in range(200):
        v = int(rng.integers(n))
        cols = np.flatnonzero(pb.valid[v])
        if rng.random() < 0.3:
            p_new, j_new = -1, -1
        else:
            c = int(rng.choice(cols))
            p_new, j_new = int(pb.pair_idx[v, c]), int(pb.cand_ref[v, c])
            if not st.capacity_ok(v, j_new):
                continue
        before = st.obj
        st.apply(v, p_new, j_new)
        full = _full_objective(
            pb, costs, tris, w, ref, nm, st.match_ref, st.match_pair, cuts
        )
        assert st.obj == pytest.approx(full, abs=1e-6), (
            f"incremental {st.obj} vs full {full} after move "
            f"({v} -> {p_new}/{j_new}, before {before})"
        )


def test_local_repair_improves_and_stays_feasible(rng):
    pb, pairs, costs, tris, w, src, ref, nm = _instance(rng)
    n = pb.n_aligned
    # Solve properly, then perturb: unmatch the vertices of a few triangles
    # and register cuts on others, giving the repair real work.
    from same_tpu.solver.auction import solve_assignment

    mr, mp, _ = solve_assignment(pb, eps_final=1e-3)
    ct, cv, cp = [], [], []
    for t, tri in enumerate(tris[: len(tris) // 2]):
        if (mr[tri] >= 0).all():
            ct.append(t)
            cv.append(tri.copy())
            cp.append(mp[tri].copy())
    cuts = (np.asarray(ct), np.asarray(cv), np.asarray(cp))
    # Unmatch some cut vertices so repair has improving moves available.
    for v in np.unique(np.asarray(cv))[::3]:
        mr[v], mp[v] = -1, -1
    obj0 = _full_objective(pb, costs, tris, w, ref, nm, mr, mp, cuts)
    mr2, mp2, timed_out = local_repair(
        pb, costs, tris, w, src, ref, mr.copy(), mp.copy(), cuts, 7.0, 50.0,
        False,
    )
    obj1 = _full_objective(pb, costs, tris, w, ref, nm, mr2, mp2, cuts)
    assert not timed_out
    assert obj1 < obj0
    # Capacity feasibility.
    u = np.bincount(mr2[mr2 >= 0], minlength=pb.n_ref)
    assert (u <= 1).all()


def test_repair_budget_param_respected(rng):
    """solver_params['tpu_repair_budget'] bounds the repair phase wall."""
    import time

    import pandas as pd

    from same_tpu.core import prepare_window, solve_prepared

    g = np.stack(
        np.meshgrid(np.arange(10), np.arange(10)), -1
    ).reshape(-1, 2) * 5.0
    types = ["A", "B", "C"]
    tid = (np.arange(len(g)) // 2) % 3

    def frame(seed, swap):
        r = np.random.default_rng(seed)
        df = pd.DataFrame(g + r.normal(0, 0.3, g.shape), columns=["X", "Y"])
        t = tid.copy()
        if swap:
            for s in range(4):
                a, b = s * 10 + 2, s * 10 + 3
                t[a], t[b] = t[b], t[a]
        df["cell_type"] = np.asarray(types)[t]
        for k, ty in enumerate(types):
            df[ty] = np.where(t == k, 90.0, 5.0)
        df["Cell_Num_Old"] = np.arange(len(df))
        return df

    pw = prepare_window(
        frame(1, False), frame(2, True), types,
        optim_params=dict(
            max_matches=1, radius=8.0, knn=6, no_match_penalty=10000,
            delaunay_penalty=8.0, penalty_coeff=100,
        ),
        solver_params=dict(mip_gap=0.05, tpu_repair_budget=3.0),
        verbose=False,
    )
    t0 = time.time()
    res = solve_prepared(pw, verbose=False)
    wall = time.time() - t0
    # The budget bounds the repair stage (3s) with bounded slop for the
    # in-flight component MILP; separation/compile time is separate.
    assert res.info["repair_time"] < 3.0 + 12.0
    assert (res.match_ref >= 0).sum() > 80
    assert wall > 0


def test_repair_workers_equivalent(rng):
    """workers>1 solves vertex-/ref-disjoint component groups concurrently;
    extraction commutes with the group's applies and the apply order is
    unchanged, so the result is bit-identical to the sequential pass (no
    wall-clock cutoffs on an instance this small)."""
    from same_tpu.solver.tearing import solve_with_tearing

    pb, pairs, costs, tris, w, src, ref, nm = _instance(rng, n=40)
    kw = dict(
        delaunay_penalty=20.0, penalty_coeff=50.0,
        allowed_flip_fraction=0.0, eps_final=1e-3, device_loop=False,
    )
    res1 = solve_with_tearing(
        pb, costs, tris, w, src, ref, repair_workers=1, **kw
    )
    res4 = solve_with_tearing(
        pb, costs, tris, w, src, ref, repair_workers=4, **kw
    )
    np.testing.assert_array_equal(res1.match_ref, res4.match_ref)
    np.testing.assert_array_equal(res1.match_pair, res4.match_pair)
    assert res1.objective == pytest.approx(res4.objective)


def _flip_allowance_instance():
    """One triangle A(0,0) B(1,0) C(0,1); matching C to (0,-1) flips it but
    saves 4 in pair cost; dp*w = 7 so the flip only pays off when the budget
    allowance makes it free."""
    pairs = np.asarray([(0, 0), (1, 1), (2, 2), (2, 3)])
    costs = np.asarray([0.0, 0.0, 5.0, 1.0])
    nm = np.full(3, 100.0)
    ref_xy = np.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, -1.0]])
    tris = np.asarray([[0, 1, 2]])
    w = np.ones(1)
    src = np.asarray([1], np.int32)
    return pairs, costs, nm, ref_xy, tris, w, src


def test_oracle_flip_allowance():
    from same_tpu.solver.milp_oracle import solve_mip_oracle

    pairs, costs, nm, ref_xy, tris, w, src = _flip_allowance_instance()
    kw = dict(
        triangles=tris, tri_weights=w, source_signs=src, ref_coords=ref_xy,
        delaunay_penalty=7.0, eager_triangles=True,
    )
    base = (pairs, costs, 3, 4, np.ones(4, np.int64), 50.0, nm)

    # No allowance: the flip pays 7 > the 4 saving -> keep the unflipped match.
    res0 = solve_mip_oracle(*base, **kw)
    assert res0.match_ref.tolist() == [0, 1, 2]
    assert res0.objective == pytest.approx(5.0)

    # Allowance covers the flip: it is free, take the cheaper flipped match.
    res1 = solve_mip_oracle(*base, flip_allowance=7.0, **kw)
    assert res1.match_ref.tolist() == [0, 1, 3]
    assert res1.objective == pytest.approx(1.0)

    # Partial allowance (< dp*w): net flip price 7-3=4 >= saving -> unflipped.
    res2 = solve_mip_oracle(*base, flip_allowance=3.0, **kw)
    assert res2.match_ref.tolist() == [0, 1, 2]

    # Registered triple: the flip pays regardless of allowance.
    res3 = solve_mip_oracle(
        *base, flip_allowance=7.0, registered_cuts=[(0, 0, 1, 3)], **kw
    )
    assert res3.match_ref.tolist() == [0, 1, 2]
    assert res3.objective == pytest.approx(5.0)


def test_local_repair_spends_flip_allowance():
    from same_tpu.models.assignment import build_assignment_problem

    pairs, costs, nm, ref_xy, tris, w, src = _flip_allowance_instance()
    pb = build_assignment_problem(
        pairs, costs, 3, 4, np.ones(4, np.int64), 50.0, nm
    )
    mr0 = np.asarray([0, 1, 2], np.int64)
    mp0 = np.asarray([0, 1, 2], np.int64)

    # With allowance >= dp*w the cheaper flipped match is free; repair must
    # find it even though the start state has no flip/cut to seed from.
    mr1, _mp1, _ = local_repair(
        pb, costs, tris, w, src, ref_xy, mr0.copy(), mp0.copy(), None,
        7.0, 50.0, False, flip_penalty=7.0, flip_allowance=7.0,
    )
    assert mr1.tolist() == [0, 1, 3]

    # Zero allowance: every flip pays and costs more than it saves.
    mr2, _mp2, _ = local_repair(
        pb, costs, tris, w, src, ref_xy, mr0.copy(), mp0.copy(), None,
        7.0, 50.0, False, flip_penalty=7.0, flip_allowance=0.0,
    )
    assert mr2.tolist() == [0, 1, 2]


def test_oracle_node_limit_knob():
    """node_limit reaches HiGHS and the call still returns a valid solution.

    The knob is a testing-only cut-off (component models are usually
    root-bound, milp_oracle.py): on this tiny instance node 0 already
    yields the optimum, so a 1-node limit must not change the answer.
    """
    from same_tpu.solver.milp_oracle import solve_mip_oracle

    pairs, costs, nm, ref_xy, tris, w, src = _flip_allowance_instance()
    kw = dict(
        triangles=tris, tri_weights=w, source_signs=src, ref_coords=ref_xy,
        delaunay_penalty=7.0, eager_triangles=True,
    )
    base = (pairs, costs, 3, 4, np.ones(4, np.int64), 50.0, nm)
    res = solve_mip_oracle(*base, node_limit=1, **kw)
    assert res.match_ref.tolist() == [0, 1, 2]
    assert res.objective == pytest.approx(5.0)
