"""Benchmark harness: reads/s on the screen+confirm (probe+verify) core.

The reference publishes no numbers (BASELINE.md); the driver-set north star
is 10M reads/s/host.  The benchmark workload follows tests/bigtest
(/root/reference/tests/bigtest/test.sh): gendat-style synthetic reads vs
genes, multiple windows, realistic window width.

The timed region covers the per-batch work a production mapper would do
against a prebuilt index: window key extraction, index probe, pair
expansion, verification, and the on-device parts of dedup/rank.  Index
build and host report formatting are reported separately.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass

from ..config import Config
from ..engine import pipeline
from ..engine.index import build_target_index
from . import gendat


@dataclass
class BenchResult:
    reads_per_sec: float
    unique_reads: int
    total_reads: int
    num_genes: int
    gene_bases: int
    index_build_s: float
    match_s: float
    matches: int


def run_bench(
    num_read: int = 4_000_000,
    read_len: int = 100,
    num_gene: int = 2_000,
    gene_len: int = 1_000,
    windows=(10, 30, 50, 70),
    window_width: int = 20,
    pmatch: float = 0.96,
    repeats: int = 3,
    seed: int = 0,
) -> BenchResult:
    cfg = Config(
        Windows=list(windows), WindowWidth=window_width, PMatch=pmatch,
        MinDinuc=3, MaxReadLength=read_len * 2, MMTol=2,
        MaxMatches=10**6, MatchMode="best",
    )
    rs, ts = gendat.generate_arrays(num_read, read_len, num_gene, gene_len, seed)

    t0 = time.perf_counter()
    index = build_target_index(ts, window_width)
    index.skeys.block_until_ready()
    index_build_s = time.perf_counter() - t0

    # Warmup (compile all shapes).
    pipeline.run_matching_indexed(cfg, rs, index)

    best = float("inf")
    matches = 0
    for _ in range(repeats):
        t0 = time.perf_counter()
        mr = pipeline.run_matching_indexed(cfg, rs, index)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        matches = len(mr.read_row)

    return BenchResult(
        reads_per_sec=num_read / best,
        unique_reads=rs.num_unique,
        total_reads=num_read,
        num_genes=num_gene,
        gene_bases=num_gene * gene_len,
        index_build_s=index_build_s,
        match_s=best,
        matches=matches,
    )


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--NumRead", type=int, default=4_000_000)
    p.add_argument("--ReadLen", type=int, default=100)
    p.add_argument("--NumGene", type=int, default=2_000)
    p.add_argument("--GeneLen", type=int, default=1_000)
    p.add_argument("--Repeats", type=int, default=3)
    ns = p.parse_args(argv)

    r = run_bench(
        num_read=ns.NumRead, read_len=ns.ReadLen,
        num_gene=ns.NumGene, gene_len=ns.GeneLen, repeats=ns.Repeats,
    )
    # One JSON line, as the driver contract requires.
    north_star = 10_000_000.0
    print(
        json.dumps(
            {
                "metric": "reads_per_sec_chip",
                "value": round(r.reads_per_sec, 1),
                "unit": "reads/s",
                "vs_baseline": round(r.reads_per_sec / north_star, 4),
                "detail": {
                    "match_s": round(r.match_s, 4),
                    "index_build_s": round(r.index_build_s, 4),
                    "unique_reads": r.unique_reads,
                    "gene_bases": r.gene_bases,
                    "matches": r.matches,
                },
            }
        )
    )
    return 0
