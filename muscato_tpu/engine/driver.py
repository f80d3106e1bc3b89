"""Top-level run driver: the `muscato` entry point.

Mirrors the reference orchestrator's observable behavior
(/root/reference/cmd/muscato/main.go:930-979, 1005-1058):

  - a uuid run id names muscato_tmp/<uuid>/ and muscato_logs/<uuid>/
    (or <TempDir>/<uuid> when TempDir is configured);
  - the merged config is saved to LogDir/config.json;
  - per-stage log files and seqinfo.json (unique/total read counts,
    cmd/muscato_uniqify/main.go:144-161) land in LogDir;
  - stage artifacts (reads_sorted.txt.sz and the match arrays) are written
    to TempDir, giving per-stage resume granularity; TempDir is removed at
    exit unless NoCleanTemp.

Where the reference execs 12 stage binaries wired with pipes, this driver
calls the engine's stages in-process; the compute stages run on the JAX
default backend (TPU when present).
"""

from __future__ import annotations

import logging
import os
import shutil
import sys
import time
import uuid

import numpy as np

from ..config import Config
from ..io import reads as reads_io
from ..io import targets as targets_io
from . import pipeline, report


def make_run_dirs(cfg: Config) -> str:
    run_id = str(uuid.uuid1())
    if cfg.TempDir:
        cfg.TempDir = os.path.join(cfg.TempDir, run_id)
    else:
        cfg.TempDir = os.path.join("muscato_tmp", run_id)
    os.makedirs(cfg.TempDir, exist_ok=True)
    if not cfg.LogDir:
        cfg.LogDir = "muscato_logs"
    cfg.LogDir = os.path.join(cfg.LogDir, run_id)
    os.makedirs(cfg.LogDir, exist_ok=True)
    return run_id


def _setup_logging(cfg: Config) -> logging.Logger:
    logger = logging.getLogger("muscato")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fh = logging.FileHandler(os.path.join(cfg.LogDir, "muscato.log"))
    fh.setFormatter(logging.Formatter("%(asctime)s %(name)s: %(message)s"))
    logger.addHandler(fh)
    plog = logging.getLogger("muscato.pipeline")
    plog.setLevel(logging.INFO)
    plog.handlers.clear()
    plog.addHandler(fh)
    return logger


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: repeated runs skip recompiles.

    Opt-in via MUSCATO_COMPILE_CACHE=<dir>: helpful on standard TPU hosts,
    but must stay off by default — remote-compile relay backends (axon)
    stall when executable serialization is requested.
    """
    cache_dir = os.environ.get("MUSCATO_COMPILE_CACHE", "")
    if not cache_dir:
        return
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:  # cache is an optimization; never fail a run over it
        pass


def run(cfg: Config) -> None:
    for label, path in (
        ("ReadFileName", cfg.ReadFileName),
        ("GeneFileName", cfg.GeneFileName),
        ("GeneIdFileName", cfg.GeneIdFileName),
    ):
        if not os.path.exists(path):
            sys.stderr.write(f"Cannot open {label} {path}\n")
            raise SystemExit(1)
    _enable_compile_cache()
    make_run_dirs(cfg)
    logger = _setup_logging(cfg)
    cfg.save(os.path.join(cfg.LogDir, "config.json"))

    try:
        _run_stages(cfg, logger)
    finally:
        if not cfg.NoCleanTemp:
            shutil.rmtree(cfg.TempDir, ignore_errors=True)


def _run_stages(cfg: Config, logger: logging.Logger) -> None:
    t0 = time.time()

    sys.stderr.write("Preparing reads...\n")
    rs = reads_io.build_readset(cfg.ReadFileName, cfg.MinReadLength, cfg.MaxReadLength)
    logger.info(
        "prepared reads: %d total, %d unique", rs.num_total, rs.num_unique
    )
    with open(os.path.join(cfg.LogDir, "seqinfo.json"), "wt") as f:
        f.write('{"NumUnique":%d,"NumTotal":%d}\n' % (rs.num_unique, rs.num_total))
    reads_io.write_reads_sorted(rs, os.path.join(cfg.TempDir, "reads_sorted.txt.sz"))

    sys.stderr.write("Loading targets...\n")
    ts = targets_io.load_targets(cfg.GeneFileName, cfg.GeneIdFileName)
    logger.info("loaded %d target genes, %d bases", ts.num_genes, ts.size)

    resume = os.path.join(cfg.ResumeDir, "matches.npz") if cfg.ResumeDir else ""
    if resume and os.path.exists(resume):
        # Stage-artifact resume: reuse a previous run's verified matches
        # (the reference's NoCleanTemp stage files give the same
        # granularity implicitly; see SURVEY.md section 5).
        sys.stderr.write(f"Resuming matches from {resume}...\n")
        d = np.load(resume)
        mr = pipeline.MatchResult(
            read_row=d["read_row"], gene=d["gene"],
            start=d["start"], nmiss=d["nmiss"],
        )
        logger.info("resumed %d matches from %s", len(mr.read_row), resume)
    else:
        sys.stderr.write("Screening and confirming...\n")
        if cfg.CPUProfile:
            # The reference's --CPUProfile captures a pprof profile of the
            # screen (cmd/muscato_screen/main.go:530-538); here the
            # equivalent is a jax profiler trace of the matching stage.
            import jax

            with jax.profiler.trace(os.path.join(cfg.LogDir, "trace")):
                mr = pipeline.run_matching(cfg, rs, ts)
            logger.info("profiler trace written to %s", os.path.join(cfg.LogDir, "trace"))
        else:
            mr = pipeline.run_matching(cfg, rs, ts)
    logger.info("retained %d matches", len(mr.read_row))
    np.savez(
        os.path.join(cfg.TempDir, "matches.npz"),
        read_row=mr.read_row, gene=mr.gene, start=mr.start, nmiss=mr.nmiss,
    )

    sys.stderr.write("Writing results...\n")
    lines = report.write_results(cfg.ResultsFileName, mr, rs, ts)
    report.write_nonmatch(cfg.ResultsFileName, mr, rs)
    report.write_readstats(cfg.ResultsFileName, lines)
    report.write_genestats(cfg.ResultsFileName, lines)
    logger.info("done in %.2fs", time.time() - t0)
