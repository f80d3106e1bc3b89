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
    lax.all_gather over both axes — the collective replacement for the
    reference's `sort | join` file merges;
  - the host applies the same deterministic dedup/rank stages as the
    single-chip path, so N-device output is bit-identical to 1-device
    output.

Capacity handling: survivor/pair buffers are statically sized; overflow is
reported per device and surfaces as a ValueError telling the caller to
re-run with a larger capacity (the engine driver handles resizing).
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

    tcat: jnp.ndarray  # (mp, Smax) uint8
    gene_of: jnp.ndarray  # (mp, Smax) int32, local gene ids (pad rows own a dummy gene)
    gene_start: jnp.ndarray  # (mp, Gmax+1) int32
    gene_len: jnp.ndarray  # (mp, Gmax) int32
    skeys: jnp.ndarray  # (mp, Vmax) uint32, INVALID_KEY padded
    skeys2: jnp.ndarray  # (mp, Vmax) uint32 second key word
    spos: jnp.ndarray  # (mp, Vmax) int32, -1 padded
    tpacked: jnp.ndarray  # (mp, SWmax+PAD) uint32 nibble-packed shard streams
    gene_base: jnp.ndarray  # (mp,) int32 first global gene id of the shard
    width: int
    num_shards: int


def shard_targets(ts: TargetSet, width: int, num_shards: int) -> ShardedIndex:
    """Split genes into contiguous ranges with roughly equal base counts,
    build each shard's index, and pad to a common shape."""
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
        gene_of = np.repeat(np.arange(hi - lo, dtype=np.int32), np.diff(gs))
        shards.append((tcat, gene_of, gs, lo))

    smax = max((len(t) for t, _, _, _ in shards), default=width)
    smax = max(smax, width)
    gmax = max((len(gs) - 1 for _, _, gs, _ in shards), default=1)
    gmax = max(gmax, 1)

    tcat_p = np.full((num_shards, smax), 4, dtype=np.uint8)  # X padding
    gene_of_p = np.zeros((num_shards, smax), dtype=np.int32)
    gene_start_p = np.zeros((num_shards, gmax + 1), dtype=np.int32)
    gene_len_p = np.zeros((num_shards, gmax), dtype=np.int32)
    gene_base = np.zeros(num_shards, dtype=np.int32)
    skeys_l: List[np.ndarray] = []
    skeys2_l: List[np.ndarray] = []
    spos_l: List[np.ndarray] = []
    tpacked_l: List[np.ndarray] = []

    for si, (tcat, gene_of, gs, lo) in enumerate(shards):
        s = len(tcat)
        tcat_p[si, :s] = tcat
        # Padding positions claim a gene id past the last real gene so no
        # window spanning real+pad is "within one gene".
        gene_of_p[si, :s] = gene_of
        gene_of_p[si, s:] = gmax
        ng = len(gs) - 1
        gene_start_p[si, : ng + 1] = gs
        gene_start_p[si, ng + 1 :] = gs[-1]
        gene_len_p[si, :ng] = np.diff(gs)
        gene_base[si] = lo
        skeys, skeys2, spos, _srun, _ = _index_arrays(
            jnp.asarray(tcat_p[si]), jnp.asarray(gene_of_p[si]), width
        )
        skeys_l.append(np.asarray(skeys))
        skeys2_l.append(np.asarray(skeys2))
        spos_l.append(np.asarray(spos))
        tpacked_l.append(np.asarray(pops.pack_stream(tcat_p[si])))

    return ShardedIndex(
        tcat=jnp.asarray(tcat_p),
        gene_of=jnp.asarray(gene_of_p),
        gene_start=jnp.asarray(gene_start_p),
        gene_len=jnp.asarray(gene_len_p),
        skeys=jnp.asarray(np.stack(skeys_l)),
        skeys2=jnp.asarray(np.stack(skeys2_l)),
        spos=jnp.asarray(np.stack(spos_l)),
        tpacked=jnp.asarray(np.stack(tpacked_l)),
        gene_base=jnp.asarray(gene_base),
        width=width,
        num_shards=num_shards,
    )


def make_mesh(dp: int, mp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if dp * mp > len(devices):
        raise ValueError(f"mesh {dp}x{mp} needs {dp*mp} devices, have {len(devices)}")
    dev = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(dev, axis_names=("dp", "mp"))


def _shard_step(
    codes, rpacked, lengths, gene_of, gene_start, gene_len, skeys, skeys2,
    spos, tpacked, gene_base, budget, q1s, *, width, min_dinuc,
    max_read_length, pair_chunk, surv_cap,
):
    """Per-device body (runs under shard_map): sort-merge probe + SWAR
    verify of the local read block against the local index shard, then
    all_gather of the survivor buffers — the collective replacement for the
    reference's `sort | join` file merges."""
    # codes/rpacked/lengths are sharded along their leading (reads) axis and
    # arrive as full local blocks; the index arrays are sharded along an
    # explicit shard axis of size 1 per device, which we strip here.
    gene_of, gene_start, gene_len = gene_of[0], gene_start[0], gene_len[0]
    skeys, skeys2, spos = skeys[0], skeys2[0], spos[0]
    tpacked, gene_base = tpacked[0], gene_base[0]

    counts_m, lo_m, qid_m, key_m = fused._probe_windows_impl(
        codes, lengths, q1s, skeys, skeys2,
        width=width, min_dinuc=min_dinuc,
    )
    buf, nsurv, _total = fused._expand_verify_impl(
        counts_m, lo_m, qid_m, key_m, q1s, rpacked, lengths, spos, tpacked,
        gene_of, gene_start, gene_len, budget,
        nreads=codes.shape[0], width=width, max_read_length=max_read_length,
        pair_chunk=pair_chunk, surv_cap=surv_cap,
    )
    overflow = (nsurv > surv_cap).astype(jnp.int32)

    # Globalize gene ids; mark unused rows dead.
    live = jnp.arange(surv_cap, dtype=jnp.int32) < nsurv
    buf = buf.at[:, 1].add(jnp.where(live, gene_base, 0))
    buf = jnp.where(live[:, None], buf, -1)

    # Collective merge over the full mesh: every device ends up with every
    # shard's survivors.
    surv = jax.lax.all_gather(buf, "mp", axis=0)  # (mp, surv_cap, 6)
    surv = jax.lax.all_gather(surv, "dp", axis=0)  # (dp, mp, surv_cap, 6)
    overflow = jax.lax.pmax(jax.lax.pmax(overflow, "mp"), "dp")
    return surv[None], overflow[None]


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

    Returns (r, g, s, nx, window) numpy arrays of surviving candidate
    matches (pre-dedup), identical in content to the single-device path.
    """
    dp = mesh.shape["dp"]
    r_total = codes.shape[0]
    pad = (-r_total) % dp
    if pad:
        codes = np.concatenate([codes, np.zeros((pad, codes.shape[1]), codes.dtype)])
        lengths = np.concatenate([lengths, np.zeros(pad, lengths.dtype)])

    budget = jnp.asarray(vops.mismatch_budget_table(cfg.PMatch, cfg.MaxReadLength))
    q1s = jnp.asarray(np.asarray(cfg.Windows, dtype=np.int32))
    rpacked = np.asarray(pops.pack_rows(jnp.asarray(codes)))

    fn = partial(
        _shard_step,
        width=cfg.WindowWidth,
        min_dinuc=cfg.MinDinuc,
        max_read_length=cfg.MaxReadLength,
        pair_chunk=pair_cap,
        surv_cap=surv_cap,
    )
    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            P("dp", None),  # codes
            P("dp", None),  # rpacked
            P("dp"),  # lengths
            P("mp", None),  # gene_of
            P("mp", None),  # gene_start
            P("mp", None),  # gene_len
            P("mp", None),  # skeys
            P("mp", None),  # skeys2
            P("mp", None),  # spos
            P("mp", None),  # tpacked
            P("mp"),  # gene_base
            P(),  # budget (replicated)
            P(),  # q1s (replicated)
        ),
        out_specs=(P(None), P(None)),
        check_vma=False,
    )

    surv, overflow = jax.jit(mapped)(
        codes, rpacked, lengths, sidx.gene_of, sidx.gene_start, sidx.gene_len,
        sidx.skeys, sidx.skeys2, sidx.spos, sidx.tpacked, sidx.gene_base,
        budget, q1s,
    )
    if int(np.max(np.asarray(overflow))) > 0:
        raise ValueError(
            "sharded_match_arrays: pair or survivor capacity exceeded; "
            "re-run with larger pair_cap/surv_cap"
        )

    s_np = np.asarray(surv[0])  # (dp, mp, surv_cap, 6)
    flat = s_np.reshape(-1, s_np.shape[-1])
    r = flat[:, 0]
    live = r >= 0
    # Reads are sharded over dp: local row -> global row.
    per = codes.shape[0] // dp
    dp_of = np.repeat(
        np.arange(s_np.shape[0], dtype=np.int32), s_np.shape[1] * s_np.shape[2]
    )
    r_global = r + dp_of * per
    return (
        r_global[live].astype(np.int32),
        flat[:, 1][live].astype(np.int32),
        flat[:, 2][live].astype(np.int32),
        flat[:, 3][live].astype(np.int32),
        flat[:, 5][live].astype(np.int32),
    )
