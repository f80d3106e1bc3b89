"""Capture a jax.profiler trace of one 4M-read match against the 100M-base
index, then print the top device fusions by self time (the trace parser
follows memory: axon-tpu-host-quirks — vm.trace.json.gz, device pid).

Run: python -u -m muscato_tpu.bench.profile_match [reads_millions]
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import jax

from ..config import Config
from ..engine import pipeline
from ..engine.index import build_target_index
from . import gendat
from .probe_ab import main as _unused  # noqa: F401  (keeps module import graph warm)


def main():
    from ..cli import _apply_platform_override

    _apply_platform_override()
    nm = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    num_read = int(nm * 1e6)
    cfg = Config(
        Windows=[10, 30, 50, 70], WindowWidth=20, PMatch=0.96,
        MinDinuc=3, MaxReadLength=200, MMTol=2,
        MaxMatches=10**6, MatchMode="best", ReadBatch=1 << 23,
    )
    print("generating workload...", flush=True)
    rs, ts = gendat.generate_arrays_realistic(num_read, 100, 100_000, 1000, 0)
    index = build_target_index(ts, cfg.WindowWidth)
    print("index built", flush=True)

    # compile + warm
    pipeline.run_matching_indexed(cfg, rs, index)
    print("warm done", flush=True)

    sub = _shift(rs, 1)
    pipeline.preload_device_batch(cfg, sub)
    with jax.profiler.trace("/tmp/match_trace"):
        t0 = time.perf_counter()
        mr = pipeline.run_matching_indexed(cfg, sub, index)
        dt = time.perf_counter() - t0
    print(f"traced run: {dt:.3f}s, {len(mr.read_row)} matches", flush=True)

    _report("/tmp/match_trace")


def _shift(rs, k):
    from ..io.reads import ReadSet

    n = rs.num_unique - 2
    return ReadSet(
        codes=rs.codes[k : k + n], lengths=rs.lengths[k : k + n],
        counts=rs.counts[k : k + n], name_blob=rs.name_blob,
        name_off=rs.name_off[k : k + n + 1], num_total=n,
    )


def _report(trace_dir):
    paths = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace file found", flush=True)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device pid: the one whose events carry XLA op names (fusion.12,
    # sort.3, dynamic-update-slice.7, ...) — NOT the host python thread,
    # which can have a larger duration total (blocking np.asarray waits).
    import re

    xla_name = re.compile(r"^[a-z][a-z0-9_-]*(\.[0-9]+)?$")
    by_name = defaultdict(float)
    pid_time = defaultdict(float)
    pid_xla = defaultdict(float)
    for e in events:
        if e.get("ph") != "X":
            continue
        pid_time[e.get("pid")] += e.get("dur", 0)
        if xla_name.match(e.get("name", "")):
            pid_xla[e.get("pid")] += e.get("dur", 0)
    if not pid_time:
        print("no duration events", flush=True)
        return
    dev_pid = max(pid_xla, key=pid_xla.get) if pid_xla else max(
        pid_time, key=pid_time.get
    )
    for e in events:
        if e.get("ph") != "X" or e.get("pid") != dev_pid:
            continue
        by_name[e.get("name", "?")] += e.get("dur", 0)
    by_src = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") != dev_pid:
            continue
        src = (e.get("args") or {}).get("source", "")
        if src:
            by_src[src] += e.get("dur", 0)
    total = sum(by_name.values())
    print(f"device pid {dev_pid}: total {total/1e6:.3f}s across fusions", flush=True)
    for name, us in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {us/1e6:8.3f}s  {name[:110]}", flush=True)
    if by_src:
        print("top source lines:", flush=True)
        for src, us in sorted(by_src.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {us/1e6:8.3f}s  {src[-110:]}", flush=True)


if __name__ == "__main__":
    main()
