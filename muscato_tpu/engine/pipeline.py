"""End-to-end matching pipeline (single process, device compute).

Replaces the reference's 13-stage process pipeline
(/root/reference/cmd/muscato/main.go:1005-1058) with one driver around
device kernels:

  window_reads+screen+sort+confirm  -> per-window probe + verify
  combine_filter|sort -u            -> exact dedup on (read, gene, start)
  combine_windows                   -> per-read best+MMTol filter

The per-(window, k-mer-group) MaxMatches cap of muscato_confirm
(main.go:236-242, 424-448) is applied between verify and dedup.  Where the
reference's cap is racy (goroutine emit order decides survivors), this
implementation is deterministic: 'best' keeps the MaxMatches lowest-nmiss
pairs with (nmiss, gene, pos, read) tie-breaking; 'first' keeps the cap in
canonical (read, gene, pos) order.  Outputs are identical whenever the cap
does not bind (the golden tests keep MaxMatches >> group sizes; see
SURVEY.md section 4 on the reference's nondeterminism there).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..io.reads import ReadSet
from ..io.targets import TargetSet
from ..ops import verify as vops
from ..ops import windows as winops
from .index import TargetIndex, build_target_index

logger = logging.getLogger("muscato.pipeline")


@dataclass
class MatchResult:
    """Final retained matches, one entry per (unique read x gene x start)."""

    read_row: np.ndarray  # int32, row into the ReadSet
    gene: np.ndarray  # int32, row into the TargetSet
    start: np.ndarray  # int32, read start within the gene (reported pos)
    nmiss: np.ndarray  # int32


def _round_up(n: int, to: int) -> int:
    return max(to, -(-n // to) * to)


def run_matching(
    cfg: Config,
    rs: ReadSet,
    ts: TargetSet,
    index: TargetIndex | None = None,
) -> MatchResult:
    if index is None:
        index = build_target_index(ts, cfg.WindowWidth)
    return run_matching_indexed(cfg, rs, index)


def run_matching_indexed(cfg: Config, rs: ReadSet, index: TargetIndex) -> MatchResult:
    width = cfg.WindowWidth
    codes = jnp.asarray(rs.codes)
    lengths = jnp.asarray(rs.lengths)
    budget = jnp.asarray(vops.mismatch_budget_table(cfg.PMatch, cfg.MaxReadLength))

    pair_chunk = cfg.MaxPairChunk or (1 << 20)

    surv_r, surv_g, surv_s, surv_nx, surv_grp, surv_win = [], [], [], [], [], []

    for k, q1 in enumerate(cfg.Windows):
        rkeys, rvalid = winops.read_window_table(
            codes, lengths, q1, width, cfg.MinDinuc
        )
        nvalid = int(jnp.sum(rvalid))
        # The reference aborts when a window seeds no reads
        # (cmd/muscato_window_reads/main.go:143-151).
        if nvalid == 0:
            raise SystemExit(f"Window {k} produced no valid reads, exiting")

        rows = np.flatnonzero(np.asarray(rvalid)).astype(np.int32)
        keys_h = np.asarray(rkeys)[rows]
        # Sort probing reads by key so pairs of one k-mer group are
        # contiguous; secondary row order keeps determinism.
        order = np.lexsort((rows, keys_h))
        rows, keys_h = rows[order], keys_h[order]

        read_rows = jnp.asarray(rows)
        lo, hi = vops.probe_ranges(index.skeys, jnp.asarray(keys_h))
        counts = hi - lo
        total_pairs = int(jnp.sum(counts))
        logger.info(
            "window %d (offset %d): %d probing reads, %d candidate pairs",
            k, q1, nvalid, total_pairs,
        )
        if total_pairs == 0:
            continue

        # Group id of each probing read = dense id of its key run.
        group_of_read = np.cumsum(
            np.concatenate([[0], (keys_h[1:] != keys_h[:-1]).astype(np.int32)])
        ).astype(np.int32)

        for base in range(0, total_pairs, pair_chunk):
            r, p, owner = vops.expand_pairs(
                read_rows, lo, counts, index.spos,
                jnp.asarray(base, dtype=jnp.int32), pair_chunk,
            )
            keep, nx, g, s = vops.verify_pairs(
                r, p, codes, lengths,
                index.tcat, index.gene_of, index.gene_start, index.gene_len,
                budget, q1, width, cfg.MaxReadLength,
            )
            keep_h = np.asarray(keep)
            idx = np.flatnonzero(keep_h)
            if idx.size == 0:
                continue
            surv_r.append(np.asarray(r)[idx])
            surv_g.append(np.asarray(g)[idx])
            surv_s.append(np.asarray(s)[idx])
            surv_nx.append(np.asarray(nx)[idx])
            owner_h = np.asarray(owner)[idx]
            surv_grp.append(group_of_read[owner_h])
            surv_win.append(np.full(idx.size, k, dtype=np.int32))

    if not surv_r:
        z = np.zeros(0, dtype=np.int32)
        return MatchResult(z, z, z, z)

    r = np.concatenate(surv_r)
    g = np.concatenate(surv_g)
    s = np.concatenate(surv_s)
    nx = np.concatenate(surv_nx)
    grp = np.concatenate(surv_grp)
    win = np.concatenate(surv_win)

    r, g, s, nx = _apply_max_matches(cfg, r, g, s, nx, grp, win)
    return _dedup_and_rank(cfg, r, g, s, nx)


def _apply_max_matches(cfg, r, g, s, nx, grp, win):
    """Per-(window, k-mer group) cap on emitted matches
    (cmd/muscato_confirm/main.go:236-242)."""
    mm = cfg.MaxMatches
    gid = win.astype(np.int64) * (grp.max() + 1 if len(grp) else 1) + grp
    order_cols = (r, s, g, gid) if cfg.MatchMode == "first" else (r, s, g, nx, gid)
    order = np.lexsort(order_cols)  # last key is primary: group-major
    gid_sorted = gid[order]
    # rank within group
    newgrp = np.concatenate([[True], gid_sorted[1:] != gid_sorted[:-1]])
    grp_ix = np.cumsum(newgrp) - 1
    first_of_grp = np.flatnonzero(newgrp)
    rank = np.arange(len(gid_sorted)) - first_of_grp[grp_ix]
    keep = rank < mm
    kept = order[keep]
    return r[kept], g[kept], s[kept], nx[kept]


def _dedup_and_rank(cfg, r, g, s, nx):
    """Exact dedup on (read, gene, start) then per-read best+MMTol filter
    (combine_filter + sort -u + combine_windows,
    /root/reference/cmd/muscato/main.go:422-505)."""
    order = np.lexsort((s, g, r))
    r, g, s, nx = r[order], g[order], s[order], nx[order]
    if len(r):
        first = np.concatenate(
            [[True], (r[1:] != r[:-1]) | (g[1:] != g[:-1]) | (s[1:] != s[:-1])]
        )
        r, g, s, nx = r[first], g[first], s[first], nx[first]

    if len(r):
        # Per-read minimum nmiss over the deduped set.
        read_first = np.concatenate([[True], r[1:] != r[:-1]])
        seg = np.cumsum(read_first) - 1
        best = np.full(seg[-1] + 1, np.iinfo(np.int32).max, dtype=np.int64)
        np.minimum.at(best, seg, nx)
        keep = nx <= best[seg] + cfg.MMTol
        r, g, s, nx = r[keep], g[keep], s[keep], nx[keep]

    return MatchResult(r, g, s, nx)
