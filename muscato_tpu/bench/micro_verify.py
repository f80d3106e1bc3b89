"""Microbench: verify_diagonals_packed lane cost on the real chip.

Isolates the dedup-verify while-loop body (the current top profile line):
one call over N lanes with realistic table sizes (100M-base stream,
4M-read matrix), varied diagonals per rep to defeat relay dispatch
caching.  Prints per-rep best and ns/lane, plus a variant sweep that
drops one input at a time to attribute the cost (target row fetch, read
row fetch, gene lookup).

Every table is passed as an explicit jit ARGUMENT: a closed-over table
becomes a constant in the lowered HLO, and this host's remote-compile
relay rejects request bodies past ~hundreds of MB (HTTP 413) — the
round-5 phase-4 run died exactly there with the 208MB read matrix
embedded as a constant.

Run: python -u -m muscato_tpu.bench.micro_verify [n_millions]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import packed as pops
from ..ops import verify as vops


def timeit(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from ..cli import _apply_platform_override

    _apply_platform_override()
    n = int(float(sys.argv[1] if len(sys.argv) > 1 else 1.0) * 1e6)
    S = 100_000_000
    R = 4_000_000
    max_rl = 100
    width = 20
    rng = np.random.default_rng(0)

    nw = pops.packed_width(max_rl)
    rpacked = jnp.asarray(rng.integers(0, 2**32, (R, nw), dtype=np.uint64).astype(np.uint32))
    lengths = jnp.full(R, max_rl, jnp.int32)
    swords = S // 8 + 4
    tpacked = jnp.asarray(rng.integers(0, 2**32, swords, dtype=np.uint64).astype(np.uint32))
    gene_start = np.arange(0, S + 1000, 1000, dtype=np.int64)
    gene_start[-1] = S
    gs = jnp.asarray(gene_start.astype(np.int32))
    budget = jnp.asarray(vops.mismatch_budget_table(0.96, max_rl))
    q1s = jnp.asarray(np.array([10, 30, 50, 70], np.int32))
    trows = pops.build_trows(tpacked, nw, S)
    gb_np, steps = pops.build_gene_block(gene_start, S)
    gblock = jnp.asarray(gb_np)
    print(f"tables ready: trows {trows.shape} steps {steps}", flush=True)

    tables = (rpacked, lengths, tpacked, gs, budget, q1s, trows, gblock)

    @functools.partial(
        jax.jit, static_argnames=("mode", "mgather", "dorder")
    )
    def run(r, d, rp, ln, tp, g, bu, q1, tr, gb, *, mode="full",
            mgather=False, dorder=False):
        if mode == "const_read":
            r = jnp.zeros_like(r)
        elif mode == "const_diag":
            d = jnp.zeros_like(d) + 12345
        return pops.verify_diagonals_packed(
            r, d, rp, ln, tp, g, bu, q1, width, max_rl, S, trows=tr,
            gblock=gb, gsteps=steps, mgather=mgather, dorder=dorder,
            mg_rows_window=2048,
            interpret=jax.default_backend() == "cpu",
        )

    def mk(sort_d):
        rr = rng.integers(0, R, n).astype(np.int32)
        dd = rng.integers(0, S - 2 * max_rl, n)
        if sort_d:
            dd = np.sort(dd)
        return jnp.asarray(rr), jnp.asarray(dd.astype(np.int32))

    def cycle(lanes, f):
        state = [0]

        def go():
            r, d = lanes[state[0] % 3]
            state[0] += 1
            return f(r, d)

        return go

    lanes = [mk(False) for _ in range(3)]
    for a, b in lanes:
        a.block_until_ready(), b.block_until_ready()

    for mode in ("full", "const_read", "const_diag"):
        f = lambda r, d, m=mode: run(r, d, *tables, mode=m)
        jax.block_until_ready(f(*lanes[0]))
        best = timeit(cycle(lanes, f), reps=6)
        print(f"{mode}: {best*1e3:.1f}ms -> {best/n*1e9:.1f} ns/lane",
              flush=True)

    # ---- TUNED mode: the pipeline's real hot config — lanes sorted by
    # (d, r) (dorder), mgather rows + gene-block mono, trows windowed.
    # Variants isolate the READ-row random gather (the one stream that
    # stays a plain per-lane XLA gather under dorder, packed.py:404).
    print("--- tuned (dorder + mgather, d-sorted lanes) ---", flush=True)

    slanes = [mk(True) for _ in range(3)]
    for a, b in slanes:
        a.block_until_ready(), b.block_until_ready()

    for mode in ("full", "const_read"):
        f = lambda r, d, m=mode: run(r, d, *tables, mode=m, mgather=True,
                                     dorder=True)
        out = f(*slanes[0])
        jax.block_until_ready(out)
        of = int(out[-1])
        best = timeit(cycle(slanes, f), reps=6)
        print(
            f"tuned read={mode}: {best*1e3:.1f}ms -> "
            f"{best/n*1e9:.1f} ns/lane (oflow={of})", flush=True
        )

    # variant: read rows fetched by a plain XLA row gather OUTSIDE the
    # call (isolates gather cost from the rest): time just rpacked[rc].
    g = jax.jit(lambda rp, r: rp[jnp.clip(r, 0, R - 1)])
    jax.block_until_ready(g(rpacked, slanes[0][0]))
    best = timeit(cycle(slanes, lambda r, d: g(rpacked, r)), reps=6)
    print(f"xla row-gather alone: {best*1e3:.1f}ms -> "
          f"{best/n*1e9:.1f} ns/row", flush=True)

    # and the same rows through a lane-sorted monotone kernel ride:
    # sort by r (carrying lane id), windowed-DMA the rows, invert.
    @jax.jit
    def sorted_ride(rp, r):
        rc2 = jnp.clip(r, 0, R - 1)
        rs, lane = jax.lax.sort(
            (rc2, jnp.arange(n, dtype=jnp.int32)), num_keys=1
        )
        from ..ops import pallas_gather as pg
        # 2048 is the device-proven rows-window cap (fused._MG_ROWS_WINDOW_CAP):
        # 8192 blew Mosaic's 16M vmem stack in the phase-4 run.
        rows, of = pg.monotone_gather_rows(
            rp, rs, window_rows=2048,
            interpret=jax.default_backend() == "cpu",
        )
        inv = jnp.zeros(n, jnp.int32).at[lane].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        return rows[inv], of

    out = sorted_ride(rpacked, slanes[0][0])
    jax.block_until_ready(out)
    best = timeit(cycle(slanes, lambda r, d: sorted_ride(rpacked, r)), reps=6)
    print(f"sort+mono-ride row fetch: {best*1e3:.1f}ms (oflow="
          f"{int(out[1])})", flush=True)


if __name__ == "__main__":
    main()
