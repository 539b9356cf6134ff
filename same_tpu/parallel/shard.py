"""Multi-chip window sharding: the primary parallel axis of SAME-TPU.

The reference processes sliding windows sequentially on one host (reference
src/same.py:507-593) and merely documents a process-pool recipe
(docs/tutorials/large_datasets.md:199-224). Windows are embarrassingly
parallel, so the TPU-native design shards the *window batch* across a device
mesh: problems are padded to shared shape buckets (models/assignment.py), the
auction solver is vmapped over the batch dimension, and the batch axis is
laid out over the mesh with ``jax.sharding.NamedSharding`` — XLA then runs
each device's windows locally with no cross-device communication until the
final host-side merge (windows.merge_window_matches_unique_ref).

``make_mesh``/``solve_window_batch`` work identically on a real TPU pod
slice and on the virtual CPU mesh used in tests
(``--xla_force_host_platform_device_count``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.assignment import AssignmentProblem
from ..solver.auction import SCHEDULE_LEN, _auction_run, make_eps_schedule


def make_mesh(n_devices: Optional[int] = None, axis: str = "windows") -> Mesh:
    """1D device mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def stack_problems(problems: Sequence[AssignmentProblem]):
    """Stack same-shape problems into batched arrays.

    All problems must share (n, C) and n_slots — guaranteed for windows that
    fall into the same shape bucket.
    """
    shapes = {(p.costs.shape, p.n_slots) for p in problems}
    if len(shapes) != 1:
        raise ValueError(f"problems span multiple shape buckets: {shapes}")
    costs = np.stack([p.costs for p in problems])
    slots = np.stack([p.slots for p in problems])
    valid = np.stack([p.valid for p in problems])
    nm = np.stack([p.nm_cost for p in problems])
    return costs, slots, valid, nm


def solve_window_batch(
    problems: Sequence[AssignmentProblem],
    mesh: Optional[Mesh] = None,
    eps_final: float = 1e-2,
    eps_scaling: float = 4.0,
    max_rounds: int = 500000,
    extra_costs: Optional[np.ndarray] = None,
):
    """Solve a batch of window assignment problems, sharded over ``mesh``.

    Returns per-problem ``(match_ref, match_pair)`` lists plus raw choices.
    The batch is padded to a multiple of the mesh size with copies of the
    last problem (discarded on return).
    """
    B = len(problems)
    costs, slots, valid, nm = stack_problems(problems)
    if extra_costs is not None:
        costs = costs + np.asarray(extra_costs, dtype=costs.dtype)

    finite = costs[valid]
    scale = [float(np.max(nm, initial=0.0))]
    if finite.size:
        scale.append(float(finite.max() - finite.min()))
    eps_schedule = jnp.asarray(
        make_eps_schedule(max(scale + [1.0]), eps_final, eps_scaling)
    )

    pad = 0
    if mesh is not None:
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        pad = (-B) % n_dev
        if pad:
            costs = np.concatenate([costs, np.repeat(costs[-1:], pad, axis=0)])
            slots = np.concatenate([slots, np.repeat(slots[-1:], pad, axis=0)])
            valid = np.concatenate([valid, np.repeat(valid[-1:], pad, axis=0)])
            nm = np.concatenate([nm, np.repeat(nm[-1:], pad, axis=0)])

    S = problems[0].n_slots

    def solve_one(c, s, v, n):
        prices0 = jnp.zeros(S + 1, dtype=c.dtype)
        res = _auction_run(c, s, v, n, prices0, eps_schedule, max_rounds=max_rounds)
        return res.choice, res.prices, res.rounds

    fn = jax.vmap(solve_one)
    if mesh is not None:
        axis = mesh.axis_names[0]
        sharding = NamedSharding(mesh, P(axis))
        args = [
            jax.device_put(jnp.asarray(a), sharding)
            for a in (costs, slots, valid, nm)
        ]
        fn = jax.jit(fn)
        choices, prices, rounds = fn(*args)
    else:
        choices, prices, rounds = jax.jit(fn)(
            jnp.asarray(costs), jnp.asarray(slots), jnp.asarray(valid), jnp.asarray(nm)
        )

    choices = np.asarray(choices)[:B]
    prices = np.asarray(prices)[:B]
    out = []
    for b, p in enumerate(problems):
        n, C = p.costs.shape
        ch = choices[b][: p.n_aligned]
        col = np.clip(ch, 0, C - 1)
        rows = np.arange(p.n_aligned)
        is_match = ch < C
        match_ref = np.where(is_match, p.cand_ref[rows, col], -1).astype(np.int64)
        match_pair = np.where(is_match, p.pair_idx[rows, col], -1).astype(np.int64)
        out.append((match_ref, match_pair))
    return out, {"choices": choices, "prices": prices, "rounds": np.asarray(rounds)[:B]}
