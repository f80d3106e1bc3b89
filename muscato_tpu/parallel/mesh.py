"""Multi-chip execution: gene-range-sharded index, data-parallel reads.

The reference has no distributed capability at all — its parallelism is
goroutines + OS processes on one host (SURVEY.md section 2.4).  This module
is the TPU-native scaling story prescribed by BASELINE.json:

  - a 2-D jax.sharding.Mesh ("dp", "mp"): read batches are sharded over
    "dp" (data parallelism), the target index is sharded by contiguous gene
    ranges over "mp" (model/state parallelism);
  - each device probes its read shard against its index shard and verifies
    locally (shard_map);
  - per-device survivor lists (fixed capacity + count) are merged with
    lax.all_gather over the "mp" axis ONLY — reads are disjoint across
    "dp", so the downstream read-keyed stages (MaxMatches cap, dedup,
    best+MMTol) never need cross-dp traffic.  This is the collective
    replacement for the reference's `sort | join` file merges
    (/root/reference/cmd/muscato/main.go:454-476, 657-670); the round-1
    all_gather over *both* axes was O(dp*mp) per device and is gone;
  - the host fetches per-(dp, mp) survivor *prefixes* only (counts are
    returned alongside), so fetch traffic is proportional to real
    survivors, not to buffer capacity;
  - the host applies the same deterministic cap/dedup/rank stages as the
    single-chip path — including the (key1, key2) MaxMatches group columns,
    which the survivor rows carry — so N-device output is bit-identical to
    1-device output.

Capacity handling: survivor buffers are statically sized; per-device
survivor counts are returned, and run_matching_sharded regrows capacity
and re-runs a batch on overflow exactly like the single-chip driver loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..io.targets import TargetSet
from ..ops import fused
from ..ops import packed as pops
from ..ops import verify as vops
from .. import config as config_mod
from ..engine.index import _index_arrays


@dataclass
class ShardedIndex:
    """Per-shard padded index arrays; leading axis = mp shard."""

    gene_start: jnp.ndarray  # (mp, Gmax+1) int32, local offsets (pads repeat the end)
    skeys: jnp.ndarray  # (mp, Vmax) uint32, INVALID_KEY padded
    spos: jnp.ndarray  # (mp, Vmax) int32, -1 padded
    tpacked: jnp.ndarray  # (mp, SWmax+PAD) uint32 nibble-packed shard streams
    gene_base: jnp.ndarray  # (mp,) int32 first global gene id of the shard
    width: int
    num_shards: int
    smax: int  # padded per-shard stream length in bases


def shard_targets(ts: TargetSet, width: int, num_shards: int) -> ShardedIndex:
    """Split genes into contiguous ranges with roughly equal base counts,
    build each shard's index, and pad to a common shape.

    Stream padding past a shard's real bases can never produce index
    entries: window validity requires the window to end before the shard's
    real length (engine.index._index_arrays nreal argument), so runs of
    non-ACGT read bases cannot match the padding."""
    g = ts.num_genes
    sizes = np.diff(ts.gene_start)
    total = int(ts.gene_start[-1])
    bounds = [0]
    acc = 0
    per = total / num_shards if num_shards else total
    for i in range(g):
        acc += int(sizes[i])
        if acc >= per * len(bounds) and len(bounds) < num_shards:
            bounds.append(i + 1)
    while len(bounds) < num_shards:
        bounds.append(g)
    bounds.append(g)

    shards = []
    for si in range(num_shards):
        lo, hi = bounds[si], bounds[si + 1]
        start = int(ts.gene_start[lo])
        end = int(ts.gene_start[hi])
        tcat = np.asarray(ts.tcat[start:end], dtype=np.uint8)
        gs = (np.asarray(ts.gene_start[lo : hi + 1]) - start).astype(np.int32)
        shards.append((tcat, gs, lo))

    smax = max((len(t) for t, _, _ in shards), default=width)
    smax = max(smax, width)
    gmax = max((len(gs) - 1 for _, gs, _ in shards), default=1)
    gmax = max(gmax, 1)

    tcat_p = np.full((num_shards, smax), 4, dtype=np.uint8)  # X padding
    gene_start_p = np.zeros((num_shards, gmax + 1), dtype=np.int32)
    gene_base = np.zeros(num_shards, dtype=np.int32)
    skeys_l: List[np.ndarray] = []
    spos_l: List[np.ndarray] = []
    tpacked_l: List[np.ndarray] = []

    for si, (tcat, gs, lo) in enumerate(shards):
        s = len(tcat)
        tcat_p[si, :s] = tcat
        ng = len(gs) - 1
        gene_start_p[si, : ng + 1] = gs
        gene_start_p[si, ng + 1 :] = gs[-1]
        gene_base[si] = lo
        skeys, _skeys2, spos, _nvalid = _index_arrays(
            jnp.asarray(tcat_p[si]), jnp.asarray(gene_start_p[si]),
            jnp.int32(s), width,
        )
        skeys_l.append(np.asarray(skeys))
        spos_l.append(np.asarray(spos))
        tpacked_l.append(np.asarray(pops.pack_stream(tcat_p[si])))

    return ShardedIndex(
        gene_start=jnp.asarray(gene_start_p),
        skeys=jnp.asarray(np.stack(skeys_l)),
        spos=jnp.asarray(np.stack(spos_l)),
        tpacked=jnp.asarray(np.stack(tpacked_l)),
        gene_base=jnp.asarray(gene_base),
        width=width,
        num_shards=num_shards,
        smax=smax,
    )


def make_mesh(dp: int, mp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if dp * mp > len(devices):
        raise ValueError(f"mesh {dp}x{mp} needs {dp*mp} devices, have {len(devices)}")
    dev = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(dev, axis_names=("dp", "mp"))


def _globalize_inputs(mesh: Mesh, specs, arrays):
    """Multi-host input staging: host values must become global jax.Arrays
    (a plain numpy arg would be replicated per-process and shard_map would
    see inconsistent global shapes).  Every host holds the same full
    logical value (same target files, same read batch), so each process
    serves its addressable shards by slicing its local copy."""
    out = []
    for a, spec in zip(arrays, specs):
        a = np.asarray(a)
        sh = jax.sharding.NamedSharding(mesh, spec)
        out.append(
            jax.make_array_from_callback(a.shape, sh, lambda idx, _a=a: _a[idx])
        )
    return tuple(out)


def _addressable_by_dp(arr, dp: int, axis0_size: int):
    """Map a P('dp')-sharded output's addressable shards to {dp row:
    numpy block} (mp-replicated duplicates collapse by index)."""
    per = axis0_size // dp
    out = {}
    for sh in arr.addressable_shards:
        sl = sh.index[0]
        d0 = (sl.start or 0) // per
        if d0 not in out:
            out[d0] = np.asarray(sh.data)
    return out


def _shard_step(
    rpacked, lengths, gene_start, skeys,
    spos, tpacked, gene_base, budget, q1s, *, width, min_dinuc,
    max_read_length, pair_chunk, surv_cap, smax, mm, mmtol, match_mode,
):
    """Per-device body (runs under shard_map): sort-merge probe + SWAR
    verify of the local read block against the local index shard, then an
    all_gather of the survivor buffers along "mp" only — reads are disjoint
    across "dp", so read-keyed downstream stages need no dp traffic.  The
    gathered buffer is ranked ON DEVICE (cap + dedup + best+MMTol: every
    row of a dp-block's reads is present after the mp gather), so the host
    fetches retained rows only."""
    # rpacked/lengths are sharded along their leading (reads) axis and
    # arrive as full local blocks; the index arrays are sharded along an
    # explicit shard axis of size 1 per device, which we strip here.
    gene_start = gene_start[0]
    skeys, spos = skeys[0], spos[0]
    tpacked, gene_base = tpacked[0], gene_base[0]

    counts_m, lo_m, qid_m, keyf, key2f, _tot, totalf = (
        fused._probe_windows_impl(
            rpacked, lengths, q1s, skeys,
            width=width, min_dinuc=min_dinuc,
        )
    )
    buf, nsurv, _total, totalf = fused._expand_verify_impl(
        counts_m, lo_m, qid_m, keyf, key2f, q1s, rpacked, lengths, spos,
        tpacked, gene_start, budget,
        nreads=rpacked.shape[0], width=width,
        max_read_length=max_read_length,
        pair_chunk=pair_chunk, surv_cap=surv_cap, smax=smax,
    )

    # Globalize gene ids; mark unused rows dead.
    live = jnp.arange(surv_cap, dtype=jnp.int32) < nsurv
    buf = buf.at[:, 1].add(jnp.where(live, gene_base, 0))
    buf = jnp.where(live[:, None], buf, -1)

    # Collective merge along the index axis only: each device ends up with
    # every mp shard's survivors for ITS read block.
    surv = jax.lax.all_gather(buf, "mp", axis=0)  # (mp, surv_cap, NCOL)
    nsurv_all = jax.lax.all_gather(nsurv, "mp", axis=0)  # (mp,)
    totalf_all = jax.lax.all_gather(totalf, "mp", axis=0)  # (mp,)

    mp = surv.shape[0]
    flat = surv.reshape(mp * surv_cap, surv.shape[-1])
    off = jnp.arange(mp * surv_cap, dtype=jnp.int32)
    live_flat = (off % surv_cap) < nsurv_all[off // surv_cap]
    rows, count = fused._rank_survivors_live_impl(
        flat, live_flat, jnp.int32(mm), jnp.int32(mmtol), match_mode=match_mode
    )
    return rows[None], count[None], nsurv_all[None], totalf_all[None]


def sharded_match_arrays(
    cfg: config_mod.Config,
    codes: np.ndarray,
    lengths: np.ndarray,
    sidx: ShardedIndex,
    mesh: Mesh,
    pair_cap: int = 1 << 16,
    surv_cap: int = 1 << 14,
):
    """Run the probe+verify stage over the mesh.

    Returns (r, g, s, nx, grp, grp2, window) numpy arrays of surviving
    candidate matches (pre-dedup), identical in content to the single-chip
    path, with read rows globalized.  Raises CapacityError when any
    device's survivor count exceeds surv_cap (the caller regrows), and
    ValueError on expansion-counter overflow."""
    dp = mesh.shape["dp"]
    r_total = codes.shape[0]
    pad = (-r_total) % dp
    if pad:
        codes = np.concatenate([codes, np.zeros((pad, codes.shape[1]), codes.dtype)])
        lengths = np.concatenate([lengths, np.zeros(pad, lengths.dtype)])

    budget = jnp.asarray(vops.mismatch_budget_table(cfg.PMatch, cfg.MaxReadLength))
    q1s = jnp.asarray(np.asarray(cfg.Windows, dtype=np.int32))
    rpacked = pops.pack_rows_np(codes)

    fn = partial(
        _shard_step,
        width=cfg.WindowWidth,
        min_dinuc=cfg.MinDinuc,
        max_read_length=cfg.MaxReadLength,
        pair_chunk=pair_cap,
        surv_cap=surv_cap,
        smax=sidx.smax,
        mm=cfg.MaxMatches,
        mmtol=cfg.MMTol,
        match_mode=cfg.MatchMode,
    )
    in_specs = (
        P("dp", None),  # rpacked
        P("dp"),  # lengths
        P("mp", None),  # gene_start
        P("mp", None),  # skeys
        P("mp", None),  # spos
        P("mp", None),  # tpacked
        P("mp"),  # gene_base
        P(),  # budget (replicated)
        P(),  # q1s (replicated)
    )
    mapped = jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs,
        out_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
        check_vma=False,
    )

    multi = jax.process_count() > 1
    if multi:
        # The index side is globalized once per (index, mesh) and cached;
        # only the per-batch read arrays cross the host->device boundary
        # each call.
        ckey = (id(mesh), cfg.PMatch, cfg.MaxReadLength, tuple(cfg.Windows))
        cache = getattr(sidx, "_global_cache", None)
        if cache is None or cache[0] != ckey:
            fixed = _globalize_inputs(
                mesh, in_specs[2:],
                (sidx.gene_start, sidx.skeys, sidx.spos, sidx.tpacked,
                 sidx.gene_base, budget, q1s),
            )
            cache = (ckey, fixed)
            sidx._global_cache = cache
        args = _globalize_inputs(mesh, in_specs[:2], (rpacked, lengths))
        args = args + cache[1]
    else:
        args = (
            rpacked, lengths, sidx.gene_start,
            sidx.skeys, sidx.spos, sidx.tpacked, sidx.gene_base,
            budget, q1s,
        )
    rows_d, count_d, nsurv, totalf = jax.jit(mapped)(*args)

    per = codes.shape[0] // dp
    if multi:
        # Multi-host merge: each process fetches its addressable dp blocks
        # only, then the retained rows cross hosts once over the process
        # collective (the DCN analogue of the reference's final file
        # merge).  Overflow decisions use GLOBAL maxima so every process
        # regrows in lockstep (a lone regrow would deadlock the others).
        from jax.experimental import multihost_utils as mhu

        ns_loc = _addressable_by_dp(nsurv, dp, dp)
        tf_loc = _addressable_by_dp(totalf, dp, dp)
        loc_ns = max((int(v.max(initial=0)) for v in ns_loc.values()), default=0)
        loc_tf = max((float(v.max(initial=0.0)) for v in tf_loc.values()), default=0.0)
        gmaxes = mhu.process_allgather(np.asarray([float(loc_ns), loc_tf]))
        g_ns = int(np.max(gmaxes[..., 0]))
        g_tf = float(np.max(gmaxes[..., 1]))
        if g_tf > float(2**30):
            raise ValueError(
                "candidate pair count on one device exceeds the 2**30 "
                "expansion limit; re-run with a smaller ReadBatch"
            )
        if g_ns > surv_cap:
            raise CapacityError(g_ns)

        counts = _addressable_by_dp(count_d, dp, dp)
        blocks = _addressable_by_dp(rows_d, dp, dp)
        out = []
        for d, block in sorted(blocks.items()):
            n = int(counts[d][0])
            if not n:
                continue
            rows = np.array(block[0, :n])
            rows[:, 0] += d * per  # local read row -> global row
            out.append(rows)
        local = (
            np.concatenate(out)
            if out
            else np.zeros((0, fused.NCOL), dtype=np.int32)
        )
        sizes = mhu.process_allgather(
            np.asarray([local.shape[0]], np.int64)
        ).ravel()
        mx = int(sizes.max(initial=0))
        padded = np.zeros((mx, fused.NCOL), np.int32)
        padded[: local.shape[0]] = local
        allr = mhu.process_allgather(padded)  # (nproc, mx, NCOL)
        parts = [allr[p][: int(sizes[p])] for p in range(len(sizes))]
        z = (
            np.concatenate(parts)
            if parts and mx
            else np.zeros((0, fused.NCOL), dtype=np.int32)
        )
        z = z[(z[:, 0] >= 0) & (z[:, 0] < r_total)]
        return tuple(z[:, i].astype(np.int32) for i in range(fused.NCOL))

    nsurv_np = np.asarray(nsurv)  # (dp, mp)
    if float(np.max(np.asarray(totalf))) > float(2**30):
        raise ValueError(
            "candidate pair count on one device exceeds the 2**30 expansion "
            "limit; re-run with a smaller ReadBatch"
        )
    if int(nsurv_np.max(initial=0)) > surv_cap:
        raise CapacityError(int(nsurv_np.max()))

    # Fetch only the retained-row prefixes (ranked on device): traffic
    # tracks real matches, not dp*mp*capacity.
    counts = np.asarray(count_d)  # (dp,)
    out = []
    for d in range(dp):
        n = int(counts[d])
        if not n:
            continue
        rows = np.array(rows_d[d, :n])
        rows[:, 0] += d * per  # local read row -> global row
        out.append(rows)
    if not out:
        z = np.zeros((0, fused.NCOL), dtype=np.int32)
    else:
        z = np.concatenate(out)
    z = z[(z[:, 0] >= 0) & (z[:, 0] < r_total)]
    return tuple(z[:, i].astype(np.int32) for i in range(fused.NCOL))


class CapacityError(RuntimeError):
    """Survivor buffer overflow: re-run with capacity >= .needed."""

    def __init__(self, needed: int):
        super().__init__(f"survivor capacity exceeded: need >= {needed}")
        self.needed = needed


def run_matching_sharded(cfg, rs, sidx: ShardedIndex, mesh: Mesh):
    """Full sharded matching: stream read batches over the mesh, regrow
    survivor capacity on overflow, then apply the same deterministic
    cap/dedup/rank stages as the single-chip path.

    Mirrors engine.pipeline.run_matching_indexed batch-for-batch; output is
    bit-identical to the single-chip engine."""
    from ..engine import pipeline as pl

    dp = mesh.shape["dp"]
    nreads = rs.codes.shape[0]
    batch = cfg.ReadBatch or (1 << 22)
    batch = min(batch, pl._round_up(nreads, 1024 * dp))
    batch = pl._round_up(batch, dp)

    for k, q1 in enumerate(cfg.Windows):
        if not pl._window_has_reads(rs, q1, cfg.WindowWidth, cfg.MinDinuc):
            raise SystemExit(f"Window {k} produced no valid reads, exiting")

    import logging
    import time as _time

    logger = logging.getLogger("muscato.pipeline")
    surv_cap = 1 << 14
    all_rows = []
    for b0 in range(0, nreads, batch):
        t_batch = _time.perf_counter()
        b1 = min(b0 + batch, nreads)
        codes = np.asarray(rs.codes[b0:b1])
        lengths = np.asarray(rs.lengths[b0:b1])
        while True:
            try:
                cols = sharded_match_arrays(
                    cfg, codes, lengths, sidx, mesh, surv_cap=surv_cap
                )
                break
            except CapacityError as e:
                # Exact pow2 bucket over the known need (same policy as the
                # single-chip loop): per-device buffers, the mp all_gather,
                # and the on-device rank all scale with surv_cap.
                grow = 1 << max(int(e.needed) - 1, 1).bit_length()
                surv_cap = max(surv_cap * 2, grow)
        rows = np.stack(cols, axis=1)
        rows[:, 0] += b0
        all_rows.append(rows)
        dt = _time.perf_counter() - t_batch
        logger.info(
            "mesh batch reads [%d,%d): %d survivors, %.2fs (%.0f reads/s)",
            b0, b1, len(rows), dt, (b1 - b0) / max(dt, 1e-9),
        )

    if not all_rows or not sum(len(x) for x in all_rows):
        z = np.zeros(0, dtype=np.int32)
        return pl.MatchResult(z, z, z, z)
    rows = np.concatenate(all_rows)
    r, g, s, nx, grp, grp2, win = (rows[:, i] for i in range(fused.NCOL))
    r, g, s, nx = pl._apply_max_matches(cfg, r, g, s, nx, grp, grp2, win)
    return pl._dedup_and_rank(cfg, r, g, s, nx)
