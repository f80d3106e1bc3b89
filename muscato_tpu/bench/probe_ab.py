"""A/B the probe strategies on the 100M-base realistic workload.

Times the full match stage (probe + expand + verify + cap/dedup inputs)
with the sort-merge probe vs the (direct/binary) search probe at several
read-batch sizes, plus the device index build.  Each repetition uses a
shifted read window so the relay cannot replay a cached dispatch
(memory: axon-tpu-host-quirks).

Run:  python -u -m muscato_tpu.bench.probe_ab [num_reads_millions]
"""

from __future__ import annotations

import sys
import time

import numpy as np

from ..config import Config
from ..engine import pipeline
from ..engine.index import build_target_index
from ..io.reads import ReadSet
from . import gendat


def main():
    from ..cli import _apply_platform_override

    _apply_platform_override()
    npool_m = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    num_read = int(npool_m * 1e6)
    read_len, num_gene, gene_len = 100, 100_000, 1_000
    cfg = Config(
        Windows=[10, 30, 50, 70], WindowWidth=20, PMatch=0.96,
        MinDinuc=3, MaxReadLength=read_len * 2, MMTol=2,
        MaxMatches=10**6, MatchMode="best",
    )
    print("generating workload...", flush=True)
    rs, ts = gendat.generate_arrays_realistic(
        num_read, read_len, num_gene, gene_len, seed=0
    )
    print(f"unique reads {rs.num_unique}, gene bases {num_gene*gene_len}", flush=True)

    t0 = time.perf_counter()
    index = build_target_index(ts, cfg.WindowWidth)
    int(np.asarray(index.skeys[-1]))  # force completion through the relay
    t_build = time.perf_counter() - t0
    print(f"index build: {t_build:.2f}s ({index.num_valid} keys)", flush=True)

    t0 = time.perf_counter()
    aux = index.search_aux()
    print(f"search aux build ({aux.mode}): {time.perf_counter()-t0:.2f}s", flush=True)

    nu = rs.num_unique

    def subset(shift, n):
        lo = min(shift, nu - n)
        return ReadSet(
            codes=rs.codes[lo : lo + n], lengths=rs.lengths[lo : lo + n],
            counts=rs.counts[lo : lo + n],
            name_blob=rs.name_blob, name_off=rs.name_off[lo : lo + n + 1],
            num_total=n,
        )

    for batch_m in (1, 4):
        n = min(int(batch_m * 1e6), nu)
        cfg.ReadBatch = 1 << 23  # single batch
        for mode in ("sort", "search"):
            # warmup/compile on shift 3
            pipeline.run_matching_indexed(cfg, subset(3, n), index, probe=mode)
            # Device phase: stage uploads first; each timed rep dispatches
            # different content.
            subs = [subset(r, n) for r in range(2)]
            for sub in subs:
                pipeline.preload_device_batch(cfg, sub)
            best = float("inf")
            matches = 0
            for sub in subs:
                t0 = time.perf_counter()
                mr = pipeline.run_matching_indexed(cfg, sub, index, probe=mode)
                dt = time.perf_counter() - t0
                best = min(best, dt)
                matches = len(mr.read_row)
            # One unstaged pass: includes the read upload.
            sub = subset(5, n - 1)
            t0 = time.perf_counter()
            pipeline.run_matching_indexed(cfg, sub, index, probe=mode)
            wt = time.perf_counter() - t0
            print(
                f"batch {n/1e6:.1f}M mode={mode}: device {best:.3f}s "
                f"({n/best/1e6:.2f}M reads/s), +transfers {wt:.3f}s, "
                f"{matches} matches",
                flush=True,
            )
    print("done", flush=True)


if __name__ == "__main__":
    main()
