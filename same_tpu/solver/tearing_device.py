"""Fully device-resident space-tearing loop.

The host separation loop (tearing.py) makes one device round-trip per tear
round; on deployments where each device<->host sync costs seconds (tunneled
TPU), that dominates wall-clock. This module fuses the ENTIRE loop — auction
re-solves, batched flip tests, cut registration with per-triangle dedup
memory, regret-directed surcharges — into one jitted ``lax.while_loop``,
returning every incumbent in a single transfer at the end.

Semantics match tearing.py (and hence the reference's lazy callback,
reference src/same.py:621-704) with one bounded deviation: per-triangle cut
dedup memory holds at most ``K`` distinct triples (a triangle that flips
under more than K different matched triples stops receiving new cuts).
The host wrapper reconstructs the cut registry from the returned memory and
reuses the exact host-side incumbent evaluation + local repair.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.assignment import AssignmentProblem
from ..ops.orient import matched_triangle_flips
from .auction import _auction_run, default_eps_schedule

_HARD_PENALTY = 1e7


@functools.partial(
    jax.jit,
    static_argnames=(
        "L", "K", "max_tear_rounds", "max_rounds", "max_cuts_per_round",
        "max_cuts_total",
    ),
)
def _tearing_loop(
    costs, slots, valid, nm, pair_idx, cand_ref,
    tris, tri_mask, src, ref_xy, tri_weights,
    full_schedule, warm_schedule,
    delaunay_penalty, allowed_flip_fraction, hard,
    state, r_end,
    L: int, K: int, max_tear_rounds: int, max_rounds: int,
    max_cuts_per_round: int, max_cuts_total: int,
):
    """One chunk of tear rounds (state-in/state-out, device-resident).

    The loop is chunked so a single XLA execution stays below runtime
    watchdog limits on tunneled deployments; all state (surcharges, prices,
    cut memory, incumbent buffers) stays on device between chunks.
    """
    n, C = costs.shape
    T = tris.shape[0]
    R = max_tear_rounds
    rows = jnp.arange(n)
    tri_ids = jnp.arange(T)

    def body(state):
        (extra, prices, assigned_c, owner_c, r, cuts_added, stop, cut_mem,
         cut_cnt, all_choices, all_flipped, all_checked, all_rounds) = state

        # Warm-carry assignments and ownership across tear rounds: only the
        # newly surcharged pairs violate eps-CS at the boundary, so re-solves
        # stay local instead of re-fighting every previous bidding war. Every
        # 4th round restarts from a cold assignment (prices kept) — the
        # diversification role branch-and-bound's incumbent stream plays.
        sched = jnp.where(r == 0, full_schedule, warm_schedule)
        cold = (r % 4) == 0
        assigned_in = jnp.where(cold, -1, assigned_c)
        owner_in = jnp.where(cold, -1, owner_c)
        res = _auction_run(
            costs + extra, slots, valid, nm, prices, sched,
            max_rounds=max_rounds, assigned0=assigned_in, owner0=owner_in,
        )
        choice = res.choice
        col = jnp.clip(choice, 0, C - 1)
        is_match = choice < C
        match_pair = jnp.where(is_match, pair_idx[rows, col], -1)
        match_ref = jnp.where(is_match, cand_ref[rows, col], -1).astype(jnp.int32)

        checked, flipped = matched_triangle_flips(
            ref_xy, tris, tri_mask, match_ref, src
        )
        n_checked = checked.sum()
        n_flipped = flipped.sum()
        frac_ok = n_flipped.astype(jnp.float32) <= (
            allowed_flip_fraction * n_checked.astype(jnp.float32)
        )

        all_choices = all_choices.at[r].set(choice)
        all_flipped = all_flipped.at[r].set(flipped)
        all_checked = all_checked.at[r].set(checked)
        all_rounds = all_rounds.at[r].set(res.rounds)

        stop_now = (
            (n_checked == 0)
            | (n_flipped == 0)
            | frac_ok
            | (cuts_added >= max_cuts_total)
            | (delaunay_penalty == 0.0) & ~hard
        )

        # --- Cut registration (vectorized over triangles) -------------------
        tri_pairs = match_pair[tris]                      # [T, 3]
        all_matched = jnp.all(tri_pairs >= 0, axis=1)
        is_dup = jnp.any(
            jnp.all(cut_mem == tri_pairs[:, None, :], axis=2), axis=1
        )
        can_store = cut_cnt < K
        new_cut = flipped & all_matched & ~is_dup & can_store & ~stop_now
        # Per-round + global caps, honored in triangle-index order.
        rank = jnp.cumsum(new_cut.astype(jnp.int32)) - 1
        new_cut = new_cut & (rank < max_cuts_per_round) & (
            cuts_added + rank < max_cuts_total
        )
        added = new_cut.sum()

        # Store triples into per-triangle memory.
        store_k = jnp.where(new_cut, cut_cnt, K)          # K row is discarded
        cut_mem = cut_mem.at[tri_ids, jnp.clip(store_k, 0, K - 1)].set(
            jnp.where(new_cut[:, None], tri_pairs, cut_mem[
                tri_ids, jnp.clip(store_k, 0, K - 1)
            ])
        )
        cut_cnt = cut_cnt + new_cut.astype(jnp.int32)

        # --- Regret-directed surcharge on the cheapest-to-move pair ---------
        p_slot = res.prices[slots]
        vals = jnp.where(valid, -(costs + extra + p_slot), -jnp.inf)
        held = jnp.where(is_match, vals[rows, col], -nm)
        alt_mask = valid & (pair_idx != match_pair[:, None])
        alt_best = jnp.maximum(
            jnp.max(jnp.where(alt_mask, vals, -jnp.inf), axis=1), -nm
        )
        regret = held - alt_best
        vmove = jnp.argmin(regret[jnp.clip(tris, 0, n - 1)], axis=1)
        v_t = tris[tri_ids, vmove]                        # [T] vertex to move
        col_t = jnp.clip(choice[jnp.clip(v_t, 0, n - 1)], 0, C - 1)
        blk_t = (col_t // L) * L                          # pair's column block
        surcharge = jnp.where(
            hard, _HARD_PENALTY, delaunay_penalty * tri_weights
        ).astype(costs.dtype)
        upd = jnp.where(new_cut, surcharge, 0.0)
        v_safe = jnp.where(new_cut, v_t, n - 1)
        for s in range(L):
            extra = extra.at[v_safe, jnp.clip(blk_t + s, 0, C - 1)].add(
                jnp.where(new_cut, upd, 0.0)
            )

        stop = stop_now | (added == 0)
        return (
            extra, res.prices, res.choice, res.owner, r + 1,
            cuts_added + added, stop, cut_mem, cut_cnt, all_choices,
            all_flipped, all_checked, all_rounds,
        )

    def cond(state):
        (_extra, _prices, _a, _o, r, _cuts, stop, *_rest) = state
        return (~stop) & (r < jnp.minimum(r_end, R))

    return jax.lax.while_loop(cond, body, state)


def _init_state(n, C, T, K, R, prices0):
    return (
        jnp.zeros((n, C), prices0.dtype),
        prices0,
        jnp.full(n, -1, jnp.int32),            # carried assignments
        jnp.full(prices0.shape[0], -1, jnp.int32),  # carried slot owners
        jnp.int32(0),
        jnp.int32(0),
        jnp.bool_(False),
        jnp.full((T, K, 3), -2, jnp.int32),
        jnp.zeros(T, jnp.int32),
        jnp.full((R, n), C, jnp.int32),
        jnp.zeros((R, T), bool),
        jnp.zeros((R, T), bool),
        jnp.zeros(R, jnp.int32),
    )


def run_tearing_device(
    problem: AssignmentProblem,
    tris: np.ndarray,
    tri_weights: np.ndarray,
    source_signs: np.ndarray,
    ref_coords: np.ndarray,
    delaunay_penalty: float,
    allowed_flip_fraction: float,
    max_cuts=None,
    max_cuts_per_round: int = 1000,
    max_tear_rounds: int = 25,
    eps_final: float = 1e-2,
    hard: bool = False,
    max_rounds: int = 60000,
    K: int = 6,
):
    """Run the fused device tearing loop; returns host-side round data.

    Returns a dict with per-round incumbents (choices [R_used, n_pad]),
    flipped/checked masks, auction round counts, and the reconstructed cut
    registry (tri indices, vertex triples, pair triples).
    """
    tris = np.asarray(tris, dtype=np.int64).reshape(-1, 3)
    T = len(tris)
    if T == 0:
        raise ValueError("run_tearing_device requires at least one triangle")
    n_pad, C = problem.costs.shape
    L = int(problem.n_slot_copies)

    full_sched = default_eps_schedule(problem, eps_final)
    warm_sched = np.asarray([eps_final * 64, eps_final * 8, eps_final], np.float32)
    if len(warm_sched) < len(full_sched):
        warm_sched = np.concatenate(
            [warm_sched, np.full(len(full_sched) - len(warm_sched), eps_final,
                                 np.float32)]
        )

    costs_d = jnp.asarray(problem.costs)
    args = (
        costs_d,
        jnp.asarray(problem.slots),
        jnp.asarray(problem.valid),
        jnp.asarray(problem.nm_cost),
        jnp.asarray(problem.pair_idx),
        jnp.asarray(problem.cand_ref),
        jnp.asarray(tris),
        jnp.ones(T, bool),
        jnp.asarray(np.asarray(source_signs, np.int32)),
        jnp.asarray(np.asarray(ref_coords, np.float32)),
        jnp.asarray(np.asarray(tri_weights, np.float32)),
        jnp.asarray(full_sched),
        jnp.asarray(warm_sched),
        jnp.float32(delaunay_penalty),
        jnp.float32(
            allowed_flip_fraction if allowed_flip_fraction is not None else -1.0
        ),
        jnp.bool_(hard),
    )
    kwargs = dict(
        L=L,
        K=K,
        max_tear_rounds=max_tear_rounds,
        max_rounds=max_rounds,
        max_cuts_per_round=int(max_cuts_per_round),
        max_cuts_total=int(max_cuts) if max_cuts is not None else 1 << 30,
    )
    # Chunked execution: a few tear rounds per device call keeps each XLA
    # execution under runtime watchdog limits; state never leaves the device.
    # Both the chunk size and the per-solve auction-round budget shrink with
    # problem size so one execution stays ~10-20s; capped solves resume
    # seamlessly next round thanks to warm-carried assignments/prices.
    work_per_round = n_pad * C
    max_rounds = max(4000, min(max_rounds, int(1.2e9 / max(1, work_per_round))))
    chunk = 1
    state = _init_state(
        n_pad, C, T, K, max_tear_rounds,
        jnp.zeros(problem.n_slots + 1, costs_d.dtype),
    )
    r_host = 0
    while r_host < max_tear_rounds:
        state = _tearing_loop(
            *args, state, jnp.int32(r_host + chunk), **kwargs
        )
        # Re-materialize carried buffers: feeding one execution's outputs
        # straight back as the next execution's inputs faults the TPU
        # runtime on some deployments (buffer aliasing through the tunnel);
        # an on-device copy is cheap and sidesteps it.
        state = jax.tree.map(jnp.copy, state)
        # Two tiny scalar pulls per chunk.
        r_host = int(state[4])
        if bool(state[6]) or r_host >= max_tear_rounds:
            break

    # Single bulk transfer of everything else the host needs.
    r = r_host
    (cuts_added, cut_mem, cut_cnt, all_choices, all_flipped, all_checked,
     all_rounds) = jax.device_get(
        (state[5], state[7], state[8], state[9], state[10], state[11],
         state[12])
    )

    # Reconstruct the cut registry from per-triangle memory.
    cut_tris, cut_verts, cut_pairs = [], [], []
    for t in np.flatnonzero(cut_cnt > 0):
        for k in range(int(cut_cnt[t])):
            cut_tris.append(int(t))
            cut_verts.append(tris[t].copy())
            cut_pairs.append(cut_mem[t, k].astype(np.int64))

    return {
        "rounds_used": r,
        "cuts_added": int(cuts_added),
        "choices": all_choices[:r],
        "flipped": all_flipped[:r],
        "checked": all_checked[:r],
        "auction_rounds": all_rounds[:r],
        "cut_tris": cut_tris,
        "cut_verts": cut_verts,
        "cut_pairs": cut_pairs,
    }