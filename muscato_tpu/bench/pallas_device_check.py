"""First-TPU-minute check: compile and run every Pallas kernel on the
DEFAULT backend (the real chip when present) against its XLA/numpy oracle.

The test suite pins itself to CPU (tests/conftest.py), where the kernels
run in interpret mode — interpret validates semantics, not Mosaic
layout/compilation.  This module is the device-side gate the measurement
sweep runs before any benchmark (round-2 VERDICT weak #5): a Mosaic
rejection shows up here as a loud failure, not as a silently-stranded
flag.  Usage: python -m muscato_tpu.bench.pallas_device_check
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> int:
    from ..cli import _apply_platform_override

    _apply_platform_override()
    import jax
    import jax.numpy as jnp

    from ..ops import pallas_gather as pg
    from ..ops import pallas_join as pj
    from ..ops import pallas_windows as pw

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    interp = jax.default_backend() == "cpu"
    failures = 0

    results = {}

    def check(name, fn):
        nonlocal failures
        t0 = time.time()
        try:
            fn()
            results[name] = True
            print(f"PASS {name} ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:  # loud, per-kernel
            failures += 1
            results[name] = False
            print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)

    def _monotone_gather():
        rng = np.random.default_rng(1)
        table = jnp.asarray(rng.integers(0, 2**31, 1 << 20, dtype=np.int64)
                            .astype(np.int32))
        # Dense enough that each 1024-lane block spans < the 8192 window.
        steps = np.sort(rng.integers(0, 1 << 19, 1 << 17)).astype(np.int32)
        out, of = pg.monotone_gather(table, jnp.asarray(steps), window=8192,
                                interpret=interp)
        assert int(of) == 0
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(table)[steps]
        )

    def _monotone_gather_rows():
        rng = np.random.default_rng(2)
        table = jnp.asarray(
            rng.integers(0, 2**31, (1 << 14, 24), dtype=np.int64)
            .astype(np.uint32)
        )
        # Dense: each block's row span stays under the 2048-row window.
        ridx = np.sort(rng.integers(0, 1 << 14, 1 << 15)).astype(np.int32)
        out, of = pg.monotone_gather_rows(
            table, jnp.asarray(ridx), window_rows=2048, interpret=interp
        )
        assert int(of) == 0
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(table)[ridx]
        )

    def _sorted_join():
        rng = np.random.default_rng(3)
        skeys = np.sort(
            rng.integers(0, 1 << 20, 1 << 18, dtype=np.int64)
        ).astype(np.uint32)
        qk = np.sort(
            rng.integers(0, 1 << 20, 1 << 15, dtype=np.int64)
        ).astype(np.uint32)
        lo, cnt, of = pj.sorted_join(
            jnp.asarray(skeys), jnp.asarray(qk), window_rows=256,
            interpret=interp
        )
        assert int(of) == 0, f"overflow={int(of)}"
        elo, ecnt = pj.sorted_join_np(skeys, qk)
        np.testing.assert_array_equal(np.asarray(lo), elo)
        np.testing.assert_array_equal(np.asarray(cnt), ecnt)

    def _window_queries():
        rng = np.random.default_rng(4)
        from ..ops import fused

        codes = rng.integers(0, 4, (4096, 64), dtype=np.int64).astype(np.uint8)
        lengths = rng.integers(20, 64, 4096, dtype=np.int64).astype(np.int32)
        q1s = (0, 10)
        k1, k2, v = pw.window_queries_pallas(
            jnp.asarray(codes), jnp.asarray(lengths), q1s,
            width=12, min_dinuc=2,
        )
        from ..ops import packed as pops

        rp = pops.pack_rows(jnp.asarray(codes))
        ek1, ek2, ev = fused._window_queries(
            rp, jnp.asarray(lengths), jnp.asarray(np.asarray(q1s, np.int32)),
            width=12, min_dinuc=2,
        )
        np.testing.assert_array_equal(np.asarray(v), np.asarray(ev))
        np.testing.assert_array_equal(
            np.asarray(k1)[np.asarray(v)], np.asarray(ek1)[np.asarray(ev)]
        )

    def _expand_owners():
        rng = np.random.default_rng(6)
        from ..ops import pallas_expand as pe

        m = 1 << 16
        counts = rng.integers(0, 6, m).astype(np.int32)
        oexcl = (np.cumsum(counts) - counts).astype(np.int32)
        total = int(counts.sum())
        lo = rng.integers(0, 1 << 20, m).astype(np.int32)
        qid = rng.integers(0, 1 << 24, m).astype(np.int32)
        cap = 1 << 18
        q, sx = pe.expand_owners(
            jnp.asarray(oexcl), jnp.asarray(lo), jnp.asarray(qid),
            pair_cap=cap, interpret=interp,
        )
        eq, es = pe.expand_owners_np(oexcl, lo, qid, cap)
        np.testing.assert_array_equal(np.asarray(q)[:total], eq[:total])
        np.testing.assert_array_equal(np.asarray(sx)[:total], es[:total])

        # Engine-shaped dead tail: compacted slot arrays end in a long
        # counts=0 run (oexcl == total) with pair_cap >> total.  Chunks
        # past the total resolve their window start into that tail; the
        # unclamped rel read faulted the TPU worker on v5e (round 3).
        counts[m // 8:] = 0
        oexcl = (np.cumsum(counts) - counts).astype(np.int32)
        total = int(counts.sum())
        q, sx = pe.expand_owners(
            jnp.asarray(oexcl), jnp.asarray(lo), jnp.asarray(qid),
            pair_cap=cap, interpret=interp,
        )
        eq, es = pe.expand_owners_np(oexcl, lo, qid, cap)
        np.testing.assert_array_equal(np.asarray(q)[:total], eq[:total])
        np.testing.assert_array_equal(np.asarray(sx)[:total], es[:total])

    check("monotone_gather", _monotone_gather)
    check("monotone_gather_rows", _monotone_gather_rows)
    check("sorted_join", _sorted_join)
    check("window_queries_pallas", _window_queries)
    check("expand_owners", _expand_owners)
    import json

    # Machine-readable per-kernel verdicts: the autotune ladder drops
    # only the flags whose kernels failed, not every kernel config.
    print("PALLAS_RESULTS " + json.dumps(results), flush=True)
    print(f"{'OK' if not failures else 'FAILURES'}: {failures} failed",
          flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
