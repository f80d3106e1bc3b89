"""Round-2 microbenchmarks: sort scaling + gather burst behavior.

Decides the big-index probe design:
  - does lax.sort stay near-linear to ~128M rows? (sort-merge probe cost)
  - is a (u32,u32,pay) stable sort cheaper than the current
    (u32,u32,tag,pay) num_keys=3 sort?
  - do contiguous (N,k) element gathers into a GB-scale table coalesce
    into ~1 burst, or cost k independent latencies? (search-probe records)
  - searchsorted into a small (G+1,) table vs a per-base gene_of gather
    (verify-side gene id: VERDICT round 1 item 9).

Axon-relay rules (memory: axon-tpu-host-quirks): block_until_ready does
not wait for execution here — every timed function returns a small scalar
that the harness fetches with float(), making the timing a real data
dependency; inputs are varied per iteration so the relay cannot replay a
cached dispatch.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _timeit(fn, inputs, iters=3, sync_overhead=0.0):
    # warmup on first input (compile)
    float(fn(*inputs[0]))
    best = float("inf")
    for i in range(iters):
        args = inputs[(i % (len(inputs) - 1)) + 1]
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - sync_overhead, 1e-9)


def measure_sync_overhead():
    """Round-trip cost of dispatching a trivial op and fetching a scalar."""
    one = jnp.ones((8,), jnp.float32)
    f = jax.jit(lambda x, i: (x * i).sum())
    float(f(one, 1))
    best = float("inf")
    for i in range(5):
        t0 = time.perf_counter()
        float(f(one, i + 2))
        best = min(best, time.perf_counter() - t0)
    print(f"sync overhead: {best*1e3:.1f} ms", flush=True)
    return best


def bench_sorts(sync):
    print("== sort scaling ==", flush=True)
    for n in (32_000_000, 128_000_000):
        key = jax.random.PRNGKey(0)

        def mk(i):
            k = jax.random.fold_in(key, i)
            a = jax.random.bits(k, (n,), jnp.uint32)
            b = jax.random.bits(jax.random.fold_in(k, 1), (n,), jnp.uint32)
            pay = jnp.arange(n, dtype=jnp.int32)
            tag = (a & 1).astype(jnp.int32)
            return a, b, tag, pay

        inputs = [mk(i) for i in range(4)]

        def _probe_sum(arrs):
            # data-dependent scalar XLA cannot compute without sorting
            return sum(x[:: max(1, n // 4096)].astype(jnp.float32).sum() for x in arrs)

        f4 = jax.jit(lambda a, b, t, p: _probe_sum(lax.sort((a, b, t, p), num_keys=3)))
        dt = _timeit(f4, inputs, sync_overhead=sync)
        print(f"sort4 u32x2+tag+pay n={n}: {dt*1e3:.1f} ms  ({n/dt/1e6:.0f} Mrows/s)", flush=True)

        fs = jax.jit(
            lambda a, b, t, p: _probe_sum(lax.sort((a, b, p), num_keys=2, is_stable=True))
        )
        dt = _timeit(fs, inputs, sync_overhead=sync)
        print(f"sort3 u32x2+pay stable n={n}: {dt*1e3:.1f} ms  ({n/dt/1e6:.0f} Mrows/s)", flush=True)

        fu = jax.jit(
            lambda a, b, t, p: _probe_sum(lax.sort((a, b, p), num_keys=2, is_stable=False))
        )
        dt = _timeit(fu, inputs, sync_overhead=sync)
        print(f"sort3 u32x2+pay unstable n={n}: {dt*1e3:.1f} ms  ({n/dt/1e6:.0f} Mrows/s)", flush=True)

        f1 = jax.jit(
            lambda a, b, t, p: _probe_sum(lax.sort((a, p), num_keys=1, is_stable=True))
        )
        dt = _timeit(f1, inputs, sync_overhead=sync)
        print(f"sort2 u32+pay stable n={n}: {dt*1e3:.1f} ms  ({n/dt/1e6:.0f} Mrows/s)", flush=True)
        del inputs


def bench_gathers(sync):
    print("== gather bursts (table 1.5GB) ==", flush=True)
    tab_n = 384_000_000  # x4B = 1.5GB
    table = jax.random.bits(jax.random.PRNGKey(7), (tab_n,), jnp.uint32)
    nq = 16_000_000
    key = jax.random.PRNGKey(3)

    def mkidx(i):
        k = jax.random.fold_in(key, i)
        return jax.random.randint(k, (nq,), 0, tab_n - 64, dtype=jnp.int32)

    idxs = [mkidx(i) for i in range(4)]

    g1 = jax.jit(lambda idx: jnp.sum(table[idx], dtype=jnp.uint32).astype(jnp.float32))
    dt = _timeit(g1, [(i,) for i in idxs], sync_overhead=sync)
    print(f"gather (N,) random: {dt*1e3:.1f} ms ({dt/nq*1e9:.1f} ns/q)", flush=True)

    for k in (4, 16):
        gk = jax.jit(
            lambda idx, k=k: jnp.sum(
                table[idx[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]],
                dtype=jnp.uint32,
            ).astype(jnp.float32)
        )
        dt = _timeit(gk, [(i,) for i in idxs], sync_overhead=sync)
        print(
            f"gather (N,{k}) contiguous: {dt*1e3:.1f} ms "
            f"({dt/nq*1e9:.1f} ns/q, {dt/nq/k*1e9:.2f} ns/elem)",
            flush=True,
        )

    gs = jax.jit(
        lambda idx: jnp.sum(table[jnp.sort(idx)], dtype=jnp.uint32).astype(jnp.float32)
    )
    dt = _timeit(gs, [(i,) for i in idxs], sync_overhead=sync)
    print(f"gather (N,) sorted-idx (incl sort): {dt*1e3:.1f} ms ({dt/nq*1e9:.1f} ns/q)", flush=True)


def bench_gene_lookup(sync):
    print("== verify-side gene id ==", flush=True)
    s = 100_000_000
    g = 100_000
    gene_start = jnp.asarray(
        np.sort(
            np.concatenate(
                [[0], np.random.default_rng(0).choice(s, g - 1, replace=False), [s]]
            )
        ).astype(np.int32)
    )
    nq = 16_000_000
    key = jax.random.PRNGKey(5)
    idxs = [
        jax.random.randint(jax.random.fold_in(key, i), (nq,), 0, s, dtype=jnp.int32)
        for i in range(4)
    ]

    from ..ops import packed as pops

    ss = jax.jit(
        lambda p: jnp.sum(pops.gene_of_pos(gene_start, p)).astype(jnp.float32)
    )
    dt = _timeit(ss, [(i,) for i in idxs], sync_overhead=sync)
    print(f"gene_of_pos binsearch (G=100k): {dt*1e3:.1f} ms ({dt/nq*1e9:.1f} ns/q)", flush=True)

    gene_of = jnp.zeros(s, dtype=jnp.int32)  # content irrelevant for timing
    go = jax.jit(lambda p: jnp.sum(gene_of[p]).astype(jnp.float32))
    dt = _timeit(go, [(i,) for i in idxs], sync_overhead=sync)
    print(f"gene_of gather (400MB): {dt*1e3:.1f} ms ({dt/nq*1e9:.1f} ns/q)", flush=True)


if __name__ == "__main__":
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    sync = measure_sync_overhead()
    if which in ("all", "sorts"):
        bench_sorts(sync)
    if which in ("all", "gathers"):
        bench_gathers(sync)
    if which in ("all", "gene"):
        bench_gene_lookup(sync)
    print("done", flush=True)
