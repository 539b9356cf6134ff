"""Incremental exact-objective local repair for space-tearing solutions.

Branch-and-bound finds coordinated escapes the cut-penalty loop cannot
represent — unmatching one vertex disables every orientation check through
it, and re-matching a vertex elsewhere deactivates its cut triples. This
module closes most of that gap with a greedy 1-move descent (plus a
2-vertex compound move) over the vertices involved in flips and cuts,
evaluating every candidate move by O(degree) delta accounting instead of a
full objective recomputation (the round-1 implementation recomputed
O(n + T + cuts) per candidate, which was pathological on flip-heavy
10k-cell windows).

The maintained state mirrors the exact MIP semantics of
tearing._finish_solve.true_objective:

  objective = sum(pair costs) + penalty_coeff * sum(max(0, u_j - 1))
            + sum(no-match costs) + dp * sum(w_t over triangles with an
              ACTIVE registered cut triple)

A cut triple (t, pair_a, pair_b, pair_c) is active iff all three vertices
still hold exactly those pairs; a triangle pays once no matter how many of
its triples are active.
"""

from __future__ import annotations

import time as _time

import numpy as np


class _RepairState:
    """Mutable matching state with O(degree) move deltas."""

    def __init__(
        self, problem, pair_costs, tris, tri_weights, source_signs,
        ref_coords, match_ref, match_pair, cut_arrays, delaunay_penalty,
        penalty_coeff,
    ):
        self.n = problem.n_aligned
        self.pair_costs = np.asarray(pair_costs, np.float64)
        self.nm = np.asarray(problem.nm_cost[: self.n], np.float64)
        self.pc = float(penalty_coeff)
        self.tris = np.asarray(tris, np.int64).reshape(-1, 3)
        self.T = len(self.tris)
        self.dpw = float(delaunay_penalty) * np.asarray(tri_weights, np.float64)
        self.src = np.asarray(source_signs, np.int32)
        self.ref_xy = np.asarray(ref_coords, np.float64)
        self.match_ref = match_ref
        self.match_pair = match_pair
        self.problem = problem

        # Hard per-ref limits from the slot expansion (slot_ref carries -1
        # entries for shape-bucket padding slots).
        slot_ref = problem.slot_ref
        self.limits = np.bincount(
            slot_ref[slot_ref >= 0], minlength=problem.n_ref
        )
        self.u = np.bincount(
            match_ref[match_ref >= 0], minlength=problem.n_ref
        )

        # CSR vertex -> incident triangles.
        flat_v = self.tris.ravel()
        flat_t = np.repeat(np.arange(self.T), 3)
        order = np.argsort(flat_v, kind="stable")
        self._vt_t = flat_t[order]
        self._vt_start = np.searchsorted(
            flat_v[order], np.arange(self.n + 1)
        )

        # Cut registry: ct [K] triangle ids, cv [K, 3] vertices, cp [K, 3]
        # pair ids; CSR vertex -> (cut row, position).
        if cut_arrays is not None and len(cut_arrays[0]):
            self.ct, self.cv, self.cp = (
                np.asarray(cut_arrays[0]),
                np.asarray(cut_arrays[1]),
                np.asarray(cut_arrays[2]),
            )
            K = len(self.ct)
            flat_cv = self.cv.ravel()
            flat_k = np.repeat(np.arange(K), 3)
            flat_pos = np.tile(np.arange(3), K)
            order = np.argsort(flat_cv, kind="stable")
            self._vc_k = flat_k[order]
            self._vc_pos = flat_pos[order]
            self._vc_start = np.searchsorted(
                flat_cv[order], np.arange(self.n + 1)
            )
            self.cmatch = self.match_pair[self.cv] == self.cp       # [K, 3]
            self.cut_nmatch = self.cmatch.sum(axis=1)
            self.tri_act = np.zeros(self.T, np.int64)
            np.add.at(self.tri_act, self.ct[self.cut_nmatch == 3], 1)
        else:
            self.ct = np.zeros(0, np.int64)
            self._vc_start = np.zeros(self.n + 1, np.int64)
            self._vc_k = np.zeros(0, np.int64)
            self._vc_pos = np.zeros(0, np.int64)
            self.cmatch = np.zeros((0, 3), bool)
            self.cut_nmatch = np.zeros(0, np.int64)
            self.tri_act = np.zeros(self.T, np.int64)

        matched = match_pair >= 0
        self.obj = (
            float(self.pair_costs[match_pair[matched]].sum())
            + self.pc * float(np.maximum(self.u - 1, 0).sum())
            + float(self.nm[~matched].sum())
            + float(self.dpw[self.tri_act > 0].sum())
        )

    # -- local structure lookups -----------------------------------------
    def tris_of(self, v):
        return self._vt_t[self._vt_start[v] : self._vt_start[v + 1]]

    def cuts_of(self, v):
        s, e = self._vc_start[v], self._vc_start[v + 1]
        return self._vc_k[s:e], self._vc_pos[s:e]

    def local_flips(self, ts):
        """Flip flags for triangle ids ``ts`` under the current matching."""
        if len(ts) == 0:
            return np.zeros(0, bool)
        sub = self.tris[ts]
        mr = self.match_ref[sub]
        ok = (mr >= 0).all(axis=1)
        out = np.zeros(len(ts), bool)
        if ok.any():
            p = self.ref_xy[np.clip(mr[ok], 0, len(self.ref_xy) - 1)]
            cross = (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1]) - (
                p[:, 1, 1] - p[:, 0, 1]
            ) * (p[:, 2, 0] - p[:, 0, 0])
            rs = np.sign(cross).astype(np.int32)
            s = self.src[ts][ok]
            out[ok] = (rs != 0) & (s != 0) & (rs != s)
        return out

    # -- move accounting --------------------------------------------------
    def delta(self, v, p_new, j_new):
        """Objective change of moving vertex v to pair p_new / ref j_new."""
        p_old = self.match_pair[v]
        j_old = self.match_ref[v]
        d = 0.0
        d += self.pair_costs[p_new] if p_new >= 0 else self.nm[v]
        d -= self.pair_costs[p_old] if p_old >= 0 else self.nm[v]
        if j_old != j_new:
            if j_old >= 0 and self.u[j_old] >= 2:
                d -= self.pc
            if j_new >= 0 and self.u[j_new] >= 1:
                d += self.pc
        ks, poss = self.cuts_of(v)
        if len(ks):
            was = self.cmatch[ks, poss]
            now = self.cp[ks, poss] == p_new
            chg = was != now
            if chg.any():
                ks_c, delta_m = ks[chg], now[chg].astype(np.int64) * 2 - 1
                new_nmatch = self.cut_nmatch[ks_c] + delta_m
                act_delta = (new_nmatch == 3).astype(np.int64) - (
                    self.cut_nmatch[ks_c] == 3
                ).astype(np.int64)
                # Per-triangle: pays iff active-cut count > 0.
                t_ids = self.ct[ks_c]
                tri_delta: dict = {}
                for t, ad in zip(t_ids, act_delta):
                    tri_delta[t] = tri_delta.get(t, 0) + ad
                for t, ad in tri_delta.items():
                    before = self.tri_act[t] > 0
                    after = (self.tri_act[t] + ad) > 0
                    if after and not before:
                        d += self.dpw[t]
                    elif before and not after:
                        d -= self.dpw[t]
        return d

    def apply(self, v, p_new, j_new):
        """Execute the move (returns its delta, already added to .obj)."""
        d = self.delta(v, p_new, j_new)
        p_old = self.match_pair[v]
        j_old = self.match_ref[v]
        if j_old >= 0:
            self.u[j_old] -= 1
        if j_new >= 0:
            self.u[j_new] += 1
        self.match_pair[v] = p_new
        self.match_ref[v] = j_new
        ks, poss = self.cuts_of(v)
        if len(ks):
            now = self.cp[ks, poss] == p_new
            chg = self.cmatch[ks, poss] != now
            if chg.any():
                ks_c, poss_c = ks[chg], poss[chg]
                delta_m = now[chg].astype(np.int64) * 2 - 1
                was_full = self.cut_nmatch[ks_c] == 3
                self.cmatch[ks_c, poss_c] = now[chg]
                self.cut_nmatch[ks_c] += delta_m
                is_full = self.cut_nmatch[ks_c] == 3
                for t, wf, f in zip(self.ct[ks_c], was_full, is_full):
                    self.tri_act[t] += int(f) - int(wf)
        self.obj += d
        return d

    def capacity_ok(self, v, j_new):
        if j_new < 0:
            return True
        if j_new == self.match_ref[v]:
            return True
        return self.u[j_new] < self.limits[j_new]


def local_repair(
    problem, pair_costs, tris, tri_weights, source_signs, ref_coords,
    match_ref, match_pair, cut_arrays, delaunay_penalty, penalty_coeff,
    hard, max_sweeps: int = 5, deadline=None,
):
    """Greedy exact-objective descent; returns (match_ref, match_pair, timed_out).

    Move set per vertex: each candidate pair (respecting hard ref
    capacities) and no-match; plus a compound move re-matching an unmatched
    vertex while unmatching the neighbor whose absence disables the
    would-be flipped triangles. In ``hard`` mode a move creating a flip on
    an incident triangle is rejected.
    """
    st = _RepairState(
        problem, pair_costs, tris, tri_weights, source_signs, ref_coords,
        match_ref, match_pair, cut_arrays, delaunay_penalty, penalty_coeff,
    )
    n = st.n
    timed_out = False

    for _ in range(max_sweeps):
        if deadline is not None and _time.time() > deadline:
            timed_out = True
            break
        all_t = np.arange(st.T)
        flipped_t = all_t[st.local_flips(all_t)]
        cand = set(st.tris[flipped_t].ravel().tolist())
        if len(st.ct):
            cand.update(np.unique(st.cv).tolist())
        cand = sorted(c for c in cand if 0 <= c < n)
        if not cand:
            break
        improved = False

        for v in cand:
            cur_pair = int(st.match_pair[v])
            cur_ref = int(st.match_ref[v])
            best_d, best_move = -1e-9, None
            inc = st.tris_of(v)
            options = [(-1, -1)]
            for c in np.flatnonzero(problem.valid[v]):
                p = int(problem.pair_idx[v, c])
                j = int(problem.cand_ref[v, c])
                if p != cur_pair and st.capacity_ok(v, j):
                    options.append((p, j))
            for p, j in options:
                if p == cur_pair:
                    continue
                d = st.delta(v, p, j)
                if d >= best_d:
                    continue
                if hard and p >= 0:
                    # Reject moves creating a flip on incident triangles.
                    st.apply(v, p, j)
                    bad = st.local_flips(inc).any()
                    st.apply(v, cur_pair, cur_ref)
                    if bad:
                        continue
                best_d, best_move = d, (p, j)
            if best_move is not None:
                st.apply(v, *best_move)
                improved = True

        # Compound move: re-match an unmatched vertex and simultaneously
        # unmatch one neighbor whose absence disables the would-be flipped
        # triangles — the MIP's favourite escape (an orientation check only
        # applies to fully matched triangles).
        for v in cand:
            if st.match_ref[v] >= 0:
                continue
            inc = st.tris_of(v)
            best_d, best_compound = -1e-9, None
            for c in np.flatnonzero(problem.valid[v]):
                p = int(problem.pair_idx[v, c])
                j = int(problem.cand_ref[v, c])
                if not st.capacity_ok(v, j):
                    continue
                d1 = st.apply(v, p, j)
                new_flips = inc[st.local_flips(inc)]
                neighbors = {
                    int(w)
                    for t in new_flips
                    for w in st.tris[t]
                    if w != v and st.match_ref[w] >= 0
                }
                for w in neighbors:
                    wp, wj = int(st.match_pair[w]), int(st.match_ref[w])
                    d2 = st.delta(w, -1, -1)
                    total = d1 + d2
                    if total >= best_d:
                        continue
                    if hard:
                        st.apply(w, -1, -1)
                        bad = (
                            st.local_flips(inc).any()
                            or st.local_flips(st.tris_of(w)).any()
                        )
                        st.apply(w, wp, wj)
                        if bad:
                            continue
                    best_d, best_compound = total, (p, j, w)
                st.apply(v, -1, -1)
            if best_compound is not None:
                p, j, w = best_compound
                st.apply(v, p, j)
                st.apply(w, -1, -1)
                improved = True

        if not improved:
            break
    return st.match_ref, st.match_pair, timed_out
