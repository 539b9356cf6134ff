#!/usr/bin/env python
"""Pallas-vs-XLA microbenchmark for the auction bidding round.

BASELINE.json's north star names Pallas kernels for the solver hot ops; the
codebase is pure jit'd XLA. This experiment decides that question with data
(VERDICT round-2 item 6): time one bidding round of the auction at LUAD
window scale ([n, C] = [12288, 8]) split into its parts —

  (a) full XLA round: price gather + masked values + top-2 + bid scatter;
  (b) the `prices[slots]` gather alone (XLA);
  (c) compute-only (masked values + top-2 + increments) in XLA,
      with prices pre-gathered;
  (d) the same compute-only step as a Pallas VMEM kernel (row-tiled,
      top-2 unrolled over the C=8 candidate columns).

If (b) dominates (a) and Pallas cannot host it (Mosaic rejects lane-crossing
gathers: "Only 2D gather is supported"), XLA stays regardless of (c) vs (d).
Results are recorded in ARCHITECTURE.md.

Usage: python examples/bench_pallas.py [--n 12288] [--c 8] [--iters 200]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def timed(fn, *args, iters=200):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12288)
    ap.add_argument("--c", type=int, default=8)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()
    n, C = args.n, args.c
    S = n  # one slot per ref, LUAD-like

    rng = np.random.default_rng(0)
    costs = jnp.asarray(rng.uniform(0, 200, (n, C)).astype(np.float32))
    slots = jnp.asarray(rng.integers(0, S, (n, C)).astype(np.int32))
    valid = jnp.asarray(rng.random((n, C)) < 0.9)
    nm = jnp.asarray(np.full(n, 10000.0, np.float32))
    prices = jnp.asarray(rng.uniform(0, 50, S + 1).astype(np.float32))
    eps = jnp.float32(1.0)
    rows = jnp.arange(n, dtype=jnp.int32)

    # ---- (a) full XLA bidding round -----------------------------------
    @jax.jit
    def full_round(prices):
        p_slot = prices[slots]
        vals = jnp.where(valid, -(costs + p_slot), -jnp.inf)
        vals_all = jnp.concatenate([vals, -nm[:, None]], axis=1)
        top2, top2i = jax.lax.top_k(vals_all, 2)
        v1, v2 = top2[:, 0], top2[:, 1]
        choice = top2i[:, 0].astype(jnp.int32)
        incr = v1 - jnp.where(jnp.isfinite(v2), v2, v1 - 1.0) + eps
        tgt = jnp.where(choice < C, slots[rows, jnp.clip(choice, 0, C - 1)], S)
        return prices.at[tgt].max(prices[tgt] + incr)

    # ---- (b) gather alone ---------------------------------------------
    @jax.jit
    def gather_only(prices):
        return prices[slots]

    # ---- (c) compute-only, XLA ----------------------------------------
    @jax.jit
    def compute_xla(p_slot):
        vals = jnp.where(valid, -(costs + p_slot), -jnp.inf)
        vals_all = jnp.concatenate([vals, -nm[:, None]], axis=1)
        top2, top2i = jax.lax.top_k(vals_all, 2)
        v1, v2 = top2[:, 0], top2[:, 1]
        incr = v1 - jnp.where(jnp.isfinite(v2), v2, v1 - 1.0) + eps
        return top2i[:, 0].astype(jnp.int32), incr

    # ---- (d) compute-only, Pallas -------------------------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TILE = 1024
    NEG = -3.0e38  # python float: traced constants cannot be captured

    def kernel(costs_ref, pslot_ref, valid_ref, nm_ref, choice_ref, incr_ref):
        c = costs_ref[...]
        p = pslot_ref[...]
        v = valid_ref[...]
        vals = jnp.where(v, -(c + p), NEG)
        # Unrolled top-2 over the C candidate columns + the no-match column.
        best = jnp.full((TILE,), NEG, jnp.float32)
        second = jnp.full((TILE,), NEG, jnp.float32)
        bidx = jnp.zeros((TILE,), jnp.int32)
        for k in range(C):
            vk = vals[:, k]
            better = vk > best
            second = jnp.where(better, best, jnp.maximum(second, vk))
            bidx = jnp.where(better, k, bidx)
            best = jnp.where(better, vk, best)
        vnm = -nm_ref[...]
        better = vnm > best
        second = jnp.where(better, best, jnp.maximum(second, vnm))
        bidx = jnp.where(better, C, bidx)
        best = jnp.where(better, vnm, best)
        incr = best - jnp.where(second > NEG, second, best - 1.0) + 1.0
        choice_ref[...] = bidx
        incr_ref[...] = incr

    compute_pallas = pl.pallas_call(
        kernel,
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, C), lambda i: (i, 0)),
            pl.BlockSpec((TILE, C), lambda i: (i, 0)),
            pl.BlockSpec((TILE, C), lambda i: (i, 0)),
            pl.BlockSpec((TILE,), lambda i: (i,)),
        ],
        out_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,)),
            pl.BlockSpec((TILE,), lambda i: (i,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n,), jnp.int32),
            jax.ShapeDtypeStruct((n,), jnp.float32),
        ],
    )

    @jax.jit
    def compute_pallas_jit(p_slot):
        return compute_pallas(costs, p_slot, valid, nm)

    p_slot = gather_only(prices)
    results = {}
    results["full_round_xla"] = timed(full_round, prices, iters=args.iters)
    results["gather_only"] = timed(gather_only, prices, iters=args.iters)
    results["compute_xla"] = timed(compute_xla, p_slot, iters=args.iters)
    try:
        results["compute_pallas"] = timed(
            compute_pallas_jit, p_slot, iters=args.iters
        )
    except Exception as e:
        results["compute_pallas"] = f"FAILED: {type(e).__name__}: {e}"

    print(f"n={n} C={C} backend={jax.default_backend()}")
    for k, v in results.items():
        print(f"  {k}: {v if isinstance(v, str) else f'{v:.3f} ms'}")


if __name__ == "__main__":
    main()
