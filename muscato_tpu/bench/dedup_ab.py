"""A/B the diagonal-dedup verify vs the streaming expand+verify on the
100M-base realistic workload.

Run:  python -u -m muscato_tpu.bench.dedup_ab [num_reads_millions]
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
    print("generating workload...", flush=True)
    rs, ts = gendat.generate_arrays_realistic(
        num_read, read_len, num_gene, gene_len, seed=0
    )
    print(f"unique reads {rs.num_unique}", flush=True)

    t0 = time.perf_counter()
    index = build_target_index(ts, 20)
    int(np.asarray(index.skeys[-1]))
    print(f"index build: {time.perf_counter()-t0:.2f}s", flush=True)

    nu = rs.num_unique

    def subset(shift, n):
        lo = min(shift, nu - n)
        return ReadSet(
            codes=rs.codes[lo : lo + n], lengths=rs.lengths[lo : lo + n],
            counts=rs.counts[lo : lo + n],
            name_blob=rs.name_blob, name_off=rs.name_off[lo : lo + n + 1],
            num_total=n,
        )

    for no_dedup in (False, True):
        name = "streaming" if no_dedup else "dedup"
        cfg = Config(
            Windows=[10, 30, 50, 70], WindowWidth=20, PMatch=0.96,
            MinDinuc=3, MaxReadLength=read_len * 2, MMTol=2,
            MaxMatches=10**6, MatchMode="best", NoDedup=no_dedup,
            ReadBatch=1 << 23,
        )
        n = nu - 4
        warm = subset(3, n)
        t0 = time.perf_counter()
        mr = pipeline.run_matching_indexed(cfg, warm, index)
        print(
            f"{name}: warm (compile) {time.perf_counter()-t0:.2f}s, "
            f"{len(mr.read_row)} matches", flush=True,
        )
        for rep in range(3):
            sub = subset(rep, n)
            pipeline.preload_device_batch(cfg, sub)
            t0 = time.perf_counter()
            mr = pipeline.run_matching_indexed(cfg, sub, index)
            dt = time.perf_counter() - t0
            print(
                f"{name}: rep{rep} device {dt:.3f}s "
                f"({n/dt/1e6:.3f}M reads/s), {len(mr.read_row)} matches",
                flush=True,
            )


if __name__ == "__main__":
    main()
