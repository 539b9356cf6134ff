import numpy as np
import pytest

from same_tpu.ops.sinkhorn import sinkhorn_dense, sinkhorn_sparse, sinkhorn_prices


def test_dense_marginals(rng):
    n, m = 16, 20
    cost = rng.uniform(0, 5, (n, m)).astype(np.float32)
    a = np.full(n, 1.0 / n, np.float32)
    b = np.full(m, 1.0 / m, np.float32)
    plan, f, g = sinkhorn_dense(cost, a, b, eps=0.05, n_iters=500)
    plan = np.asarray(plan)
    assert np.allclose(plan.sum(0), b, atol=1e-3)
    assert np.allclose(plan.sum(1), a, atol=1e-3)


def test_dense_low_eps_approaches_assignment(rng):
    # With a strongly diagonal cost, low-eps transport concentrates there.
    n = 10
    cost = np.full((n, n), 5.0, np.float32)
    np.fill_diagonal(cost, 0.0)
    a = b = np.full(n, 1.0 / n, np.float32)
    plan, *_ = sinkhorn_dense(cost, a, b, eps=0.05, n_iters=500)
    plan = np.asarray(plan)
    assert (np.argmax(plan, axis=1) == np.arange(n)).all()
    assert plan.diagonal().sum() > 0.95 * plan.sum()


def test_sparse_rows_normalized(rng):
    from same_tpu.models.assignment import build_assignment_problem

    n, m = 30, 25
    pairs, costs = [], []
    for i in range(n):
        for j in rng.choice(m, 4, replace=False):
            pairs.append((i, int(j)))
            costs.append(float(rng.uniform(0, 10)))
    pb = build_assignment_problem(
        np.asarray(pairs), np.asarray(costs), n, m, np.ones(m, int), 100.0,
        np.full(n, 50.0),
    )
    import jax.numpy as jnp

    plan, g = sinkhorn_sparse(
        jnp.asarray(pb.costs), jnp.asarray(np.clip(pb.cand_ref, 0, None)),
        jnp.asarray(pb.valid), jnp.asarray(pb.nm_cost), n_ref=m,
    )
    plan = np.asarray(plan)
    assert np.allclose(plan.sum(1), 1.0, atol=1e-4)
    assert (np.asarray(g) <= 1e-6).all()


def test_prices_warm_start_speeds_auction(rng):
    """Sinkhorn-seeded prices must not hurt auction optimality."""
    from same_tpu.models.assignment import build_assignment_problem, matching_objective
    from same_tpu.solver.auction import solve_assignment

    n = m = 40
    pairs, costs = [], []
    for i in range(n):
        for j in rng.choice(m, 5, replace=False):
            pairs.append((i, int(j)))
            costs.append(float(rng.uniform(0, 10)))
    pairs = np.asarray(pairs)
    costs = np.asarray(costs)
    nm = np.full(n, 50.0)
    pb = build_assignment_problem(pairs, costs, n, m, np.ones(m, int), 100.0, nm)

    mr0, mp0, _ = solve_assignment(pb, eps_final=1e-3)
    prices0 = sinkhorn_prices(pb, eps=0.5, n_iters=100)
    mr1, mp1, _ = solve_assignment(pb, eps_final=1e-3, prices0=prices0)

    def obj(mr, mp):
        mc = np.where(mp >= 0, costs[np.clip(mp, 0, None)], 0.0)
        return matching_objective(mr, mc, m, 100.0, nm)

    assert obj(mr1, mp1) == pytest.approx(obj(mr0, mp0), rel=1e-3, abs=0.1)
