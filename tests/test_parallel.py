"""Multi-chip window sharding on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from same_tpu.models.assignment import build_assignment_problem, matching_objective
from same_tpu.parallel import make_mesh, solve_window_batch, stack_problems
from same_tpu.solver.auction import solve_assignment


def _problem(seed, n=20, m=24, k=4):
    rng = np.random.default_rng(seed)
    pairs, costs = [], []
    for i in range(n):
        js = rng.choice(m, size=k, replace=False)
        for j in js:
            pairs.append((i, int(j)))
            costs.append(float(rng.uniform(0, 10)))
    pairs = np.asarray(pairs)
    costs = np.asarray(costs)
    nm = np.full(n, 50.0)
    return (
        build_assignment_problem(pairs, costs, n, m, np.ones(m, int), 100.0, nm),
        costs,
        nm,
        m,
    )


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_stack_requires_same_bucket():
    p1, *_ = _problem(0, n=20)
    p2, *_ = _problem(1, n=500)  # different bucket
    with pytest.raises(ValueError, match="shape buckets"):
        stack_problems([p1, p2])


def test_sharded_batch_matches_sequential():
    problems = [_problem(s) for s in range(8)]
    mesh = make_mesh(8)
    results, info = solve_window_batch(
        [p for p, *_ in problems], mesh=mesh, eps_final=1e-3
    )
    for (mr_b, mp_b), (pb, costs, nm, m) in zip(results, problems):
        mr_s, mp_s, _ = solve_assignment(pb, eps_final=1e-3)
        mc_b = np.where(mp_b >= 0, costs[np.clip(mp_b, 0, None)], 0.0)
        mc_s = np.where(mp_s >= 0, costs[np.clip(mp_s, 0, None)], 0.0)
        obj_b = matching_objective(mr_b, mc_b, m, 100.0, nm)
        obj_s = matching_objective(mr_s, mc_s, m, 100.0, nm)
        assert obj_b == pytest.approx(obj_s, rel=1e-3, abs=0.1)


def test_batch_padding_to_mesh():
    # 5 problems on an 8-device mesh: batch padded, padding discarded.
    problems = [_problem(s)[0] for s in range(5)]
    mesh = make_mesh(8)
    results, _info = solve_window_batch(problems, mesh=mesh)
    assert len(results) == 5


def test_graft_entry_contract():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[0].shape[0]
    g.dryrun_multichip(8)
