"""Pallas TPU kernel: sort-free stream compaction (MUSCATO_VTAIL).

Several engine stages end with "compact the kept lanes to a dense
prefix, preserving stream order": the probe's active-slot compaction
(~116M lanes on the big workload — the largest sort in the engine), the
expand's unique-(r, d) run compaction (~24M), the verify tail's survivor
compaction (~24M), and the rank's stage-4 compaction (~surv_cap).  The
XLA idiom for all four is compaction-by-sort (1-key radix over the full
buffer, ~0.29G rows/s measured), because XLA has no cheaper dense
scatter.

This kernel compacts at linear HBM cost instead:

  1. (in-kernel) each 1024-lane chunk is compacted to its own prefix
     with exact one-hot matmuls on the MXU: ``pos = tril @ keep`` ranks
     the kept lanes (f32 accumulate — exact to 2**24), and a
     (1024, 1024) one-hot picks byte planes of the packed values (a
     one-hot row sum is a single byte — exact in bf16).  The one-hot
     never leaves VMEM, which is why XLA cannot express this without
     materializing it.
  2. (in XLA) per-chunk counts are a dense reduce of ``keep``; the chunk
     runs are merged into a global prefix with two tiny scatters (one
     chunk id, one offset — both over num-chunks elements) forward-
     filled by cummax, and ONE monotone gather per value over the
     retained ``take`` lanes only (``take`` << input lanes for the
     probe and verify uses).

Per 24M-lane, 2-value compaction: ~480MB linear HBM traffic + ~200 GMAC
of one-hot matmuls (~10ms at v5e rates) vs an ~80ms 3-operand sort; the
probe's 116M-lane, 3-value compaction replaces a ~400ms sort.  Enabled
with MUSCATO_VTAIL=1 (autotuned).

No counterpart in the reference: its hot loops append matches to Go
slices one at a time (/root/reference/cmd/muscato_screen/main.go:
256-366, cmd/muscato_confirm/main.go:171-250); this kernel exists
purely for the TPU execution model, where dense compaction is the
idiom.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_gather as pg

CHUNK = 1024


def _byte_planes(x):
    """(N,) int32 -> (N, 4) bf16 byte planes (each exact in bf16).

    Stays 32-bit through the stack and casts LAST: Mosaic rejects both
    unsigned->float casts and minor-dim insertion on sub-32-bit types
    ("Insertion of minor dim that is not a no-op only supported for
    32-bit types"), so the (N,)->(N,1) expands inside the stack must
    happen on int32 lanes."""
    xu = x.astype(jnp.uint32)
    planes = jnp.stack(
        [
            jnp.bitwise_and(
                jax.lax.shift_right_logical(xu, jnp.uint32(8 * p)),
                jnp.uint32(255),
            ).astype(jnp.int32)
            for p in range(4)
        ],
        axis=1,
    )  # (N, 4) int32
    return planes.astype(jnp.bfloat16)


def _reassemble_multi(out_f32, nvals):
    """(N, 4*nvals) f32 byte planes -> nvals (N,) int32 vectors.

    Uses per-lane shifts + masked lane-dim reduces only: single-column
    extracts (``x[:, i]``) of a 2-D vector force sublane relayouts that
    Mosaic miscompiles (device check showed scrambled high bytes), while
    minor-dim reduces are the same pattern monotone_gather ships."""
    n, c = out_f32.shape
    assert c == 4 * nvals, (c, nvals)
    pi = out_f32.astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, c), 1)
    sh = jnp.bitwise_and(iota, 3) * 8
    shifted = jax.lax.shift_left(pi, sh)
    grp = jax.lax.shift_right_logical(iota, 2)
    return [
        jnp.sum(jnp.where(grp == v, shifted, 0), axis=1)
        for v in range(nvals)
    ]


def _kernel(*refs, block, nvals):
    val_refs = refs[:nvals]
    keep_ref = refs[nvals]
    out_refs = refs[nvals + 1:]
    nchunk = block // CHUNK
    # Rank matrix: pos[j] = #kept lanes before j within the chunk.  Strict
    # lower-triangular ones, built once per grid step from iotas; the
    # matmul accumulates in f32 (exact: counts < 1024 < 2**24).
    i0 = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    tril = (i1 < i0).astype(jnp.bfloat16)  # [dest j, src j']
    for k in range(nchunk):
        sl = pl.ds(k * CHUNK, CHUNK)
        keep = (keep_ref[sl] != 0)
        # Minor-dim insert on int32 (Mosaic rejects it on bf16), cast after.
        kb = keep.astype(jnp.int32)[:, None].astype(jnp.bfloat16)
        pos = jnp.sum(jax.lax.dot_general(
            tril, kb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ), axis=1).astype(jnp.int32)  # (CHUNK,) rank of each kept lane
        # One-hot compaction: onehot[i, j] = (pos[j] == i) & keep[j].
        # Folding keep into pos (dropped lanes rank -1, matching no row)
        # keeps this a single int32 compare -> cast: the two-mask
        # ``where(cmp & keep[None, :], ...)`` form makes Mosaic relayout
        # a broadcast (1024, 1024) i1 vector, which it rejects.
        posk = jnp.where(keep, pos, jnp.int32(-1))
        onehot = (posk[None, :] == i0).astype(jnp.int32).astype(jnp.bfloat16)
        planes = jnp.concatenate(
            [_byte_planes(vr[sl]) for vr in val_refs], axis=1
        )  # (CHUNK, 4*nvals) bf16
        out = jax.lax.dot_general(
            onehot, planes, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (CHUNK, 4*nvals) f32; rows past the chunk's count are all-zero
        words = _reassemble_multi(out, nvals)
        for v, out_ref in enumerate(out_refs):
            out_ref[sl] = words[v]


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def chunk_compact(vals, keep, *, block: int = 8192, interpret: bool = False):
    """Compact each value array within each CHUNK-lane chunk.

    ``vals`` is a tuple of (m,) int32 arrays, ``keep`` int32/bool per
    lane.  Returns a tuple: in every chunk the kept lanes' values occupy
    the chunk prefix in stream order and the remainder is zero.  Exact
    for any int32 values (byte-plane matmuls).  Inputs must be a
    multiple of ``block`` lanes (callers pad with keep=0)."""
    m = vals[0].shape[0]
    assert block % CHUNK == 0 and m % block == 0, (m, block)
    nblocks = m // block
    spec = pl.BlockSpec((block,), lambda b: (b,))
    nvals = len(vals)
    out = pl.pallas_call(
        functools.partial(_kernel, block=block, nvals=nvals),
        grid=(nblocks,),
        in_specs=[spec] * (nvals + 1),
        out_specs=[spec] * nvals,
        out_shape=[jax.ShapeDtypeStruct((m,), jnp.int32)] * nvals,
        interpret=interpret,
    )(*vals, keep.astype(jnp.int32))
    return tuple(out)


def stream_compact(vals, keep, take: int, *, block: int = 8192,
                   interpret: bool = False, dead_vals=None):
    """Dense-prefix compaction of a lane stream without a sort.

    Drop-in for ``sort((where(keep, key, INT_MAX), payload...),
    num_keys=1)`` followed by a [:take] slice — with stream order in
    place of key order (identical when the key is increasing along the
    stream, e.g. a run index or an already-canonical order).  Returns
    (compacted_vals_tuple, nkeep): lanes [0, nkeep) of each output hold
    the kept values in stream order; lanes [nkeep, take) hold
    ``dead_vals[v]`` (default 0).
    """
    nvals = len(vals)
    if dead_vals is None:
        dead_vals = (0,) * nvals
    m = vals[0].shape[0]
    pad = -m % block
    if pad:
        z = jnp.zeros(pad, jnp.int32)
        vals = tuple(jnp.concatenate([v, z]) for v in vals)
        keep = jnp.concatenate([keep, jnp.zeros(pad, dtype=keep.dtype)])
    cvals = chunk_compact(vals, keep, block=block, interpret=interpret)

    nc = vals[0].shape[0] // CHUNK
    counts = jnp.sum(keep.reshape(nc, CHUNK).astype(jnp.int32), axis=1)
    csum = jnp.cumsum(counts)
    nkeep = csum[-1]
    prefix = csum - counts  # exclusive
    # Forward-fill chunk ids and chunk start offsets over the output
    # lanes: non-empty chunk c owns [prefix[c], prefix[c] + counts[c]).
    # Non-empty chunks have distinct prefixes, so the scatters are
    # collision-free; empty chunks are dropped.
    tgt = jnp.where(counts > 0, prefix, take + 1)
    cid = jnp.arange(nc, dtype=jnp.int32)
    blk = jnp.full(take, -1, jnp.int32).at[tgt].max(cid, mode="drop")
    blk = jnp.clip(jax.lax.cummax(blk), 0, nc - 1)
    start = jnp.zeros(take, jnp.int32).at[tgt].max(prefix, mode="drop")
    start = jax.lax.cummax(start)
    t = jnp.arange(take, dtype=jnp.int32)
    idx = jnp.clip(blk * CHUNK + (t - start), 0, vals[0].shape[0] - 1)
    # idx is nondecreasing: within a chunk's run it steps by 1, across
    # runs it jumps to the next chunk's base.  Span within a 1024-lane
    # gather block is <= block + CHUNK, so a 4*CHUNK window never
    # overflows for CHUNK-sized gather blocks; fall back on the exact
    # XLA gather if it somehow does.
    live = t < nkeep
    outs = []
    for v, cv in enumerate(cvals):
        g, of = pg.monotone_gather(
            cv, idx, block=CHUNK, window=4 * CHUNK, interpret=interpret
        )
        g = jnp.where(of > 0, cv[idx], g)
        outs.append(jnp.where(live, g, jnp.int32(dead_vals[v])))
    return tuple(outs), nkeep


def stream_compact_np(vals, keep, take, dead_vals=None):
    """NumPy oracle for tests."""
    nvals = len(vals)
    if dead_vals is None:
        dead_vals = (0,) * nvals
    keep = np.asarray(keep).astype(bool)
    outs = []
    for v, val in enumerate(vals):
        val = np.asarray(val)
        kept = val[keep][:take]
        out = np.full(take, dead_vals[v], np.int32)
        out[: len(kept)] = kept
        outs.append(out)
    return tuple(outs), int(keep.sum())
