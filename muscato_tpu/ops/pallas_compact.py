"""Pallas TPU kernel: sort-free survivor compaction (the verify tail).

After the dedup verify maps verdict bits back to pair lanes, the engine
must compact the surviving (qid, unique-row) pairs to a dense prefix so
the per-survivor fetches and the rank stage run on ``surv_cap`` lanes
instead of ``pair_cap``.  The XLA path does this with a 1-key sort over
the full pair buffer (~80ms at 24M lanes, BENCHMARKS.md "Architecture
floor") — compaction-by-sort, because XLA has no cheaper dense scatter.

This kernel removes the sort.  Survivor ORDER does not matter (the rank
stage re-sorts canonically), so compaction only needs each survivor at a
unique dense slot:

  1. (in-kernel) each 1024-lane chunk is compacted to its own prefix with
     an exact one-hot matmul on the MXU: ``pos = tril @ keep`` ranks the
     kept lanes (f32 accumulate — exact to 2**24), and a (1024, 1024)
     one-hot picks byte planes of the packed values (a one-hot row sum is
     a single byte — exact in bf16).  The one-hot never leaves VMEM,
     which is why XLA cannot express this without materializing it.
  2. (in XLA) per-chunk counts are a dense reduce of ``keep``; the chunk
     runs are merged into a global prefix with two tiny scatters (one id,
     one offset — both over num-chunks elements) forward-filled by
     cummax, and ONE monotone gather over the retained prefix only.

Per 24M-lane batch the kernel is ~480MB of linear HBM traffic plus
~200 GMAC of one-hot matmuls (~10ms total at v5e rates) vs the ~80ms
sort; the fused-verify-tail analysis in BENCHMARKS.md bounds the win at
~8-10% of batch time.  Enabled with MUSCATO_VTAIL=1 (autotuned).

No counterpart in the reference: its confirm loop appends matches to a
Go slice one at a time (/root/reference/cmd/muscato_confirm/main.go:
171-250); this kernel exists purely for the TPU execution model, where
dense compaction is the idiom.
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
    """(N,) int32 -> (N, 4) bf16 byte planes (each exact in bf16)."""
    xu = x.astype(jnp.uint32)
    return jnp.stack(
        [
            jnp.bitwise_and(
                jax.lax.shift_right_logical(xu, jnp.uint32(8 * p)),
                jnp.uint32(255),
            ).astype(jnp.bfloat16)
            for p in range(4)
        ],
        axis=1,
    )


def _reassemble(planes_f32):
    """(N, 4) f32 byte planes -> (N,) int32."""
    p = [planes_f32[:, i].astype(jnp.int32) for i in range(4)]
    return (
        p[0]
        | jax.lax.shift_left(p[1], 8)
        | jax.lax.shift_left(p[2], 16)
        | jax.lax.shift_left(p[3], 24)
    )


def _kernel(qid_ref, uix_ref, keep_ref, qc_ref, uc_ref, *, block):
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
        kb = keep.astype(jnp.bfloat16)
        pos = jax.lax.dot_general(
            tril, kb[:, None], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, 0].astype(jnp.int32)  # (CHUNK,) rank of each kept lane
        # One-hot compaction: onehot[i, j] = (pos[j] == i) & keep[j].
        onehot = jnp.where(
            (pos[None, :] == i0) & keep[None, :],
            jnp.bfloat16(1), jnp.bfloat16(0),
        )
        planes = jnp.concatenate(
            [_byte_planes(qid_ref[sl]), _byte_planes(uix_ref[sl])], axis=1
        )  # (CHUNK, 8) bf16
        out = jax.lax.dot_general(
            onehot, planes, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (CHUNK, 8) f32; rows past the chunk's count are all-zero
        qc_ref[sl] = _reassemble(out[:, 0:4])
        uc_ref[sl] = _reassemble(out[:, 4:8])


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def chunk_compact(qid, uix, keep, *, block: int = 8192,
                  interpret: bool = False):
    """Compact (qid, uix) within each CHUNK-lane chunk.

    ``keep`` is int32/bool per lane.  Returns (qc, uc): in every chunk
    the kept lanes' values occupy the chunk prefix in stream order and
    the remainder is zero.  Exact for any int32 values (byte-plane
    matmuls).  Inputs must be a multiple of ``block`` lanes (callers pad
    with keep=0)."""
    m = qid.shape[0]
    assert block % CHUNK == 0 and m % block == 0, (m, block)
    nblocks = m // block
    spec = pl.BlockSpec((block,), lambda b: (b,))
    qc, uc = pl.pallas_call(
        functools.partial(_kernel, block=block),
        grid=(nblocks,),
        in_specs=[spec, spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((m,), jnp.int32),
            jax.ShapeDtypeStruct((m,), jnp.int32),
        ],
        interpret=interpret,
    )(qid, uix, keep.astype(jnp.int32))
    return qc, uc


def stream_compact(qid, uix, keep, take: int, *, block: int = 8192,
                   interpret: bool = False, dead_val: int = 0x7FFFFFFF):
    """Dense-prefix compaction of the survivor stream without a sort.

    Drop-in for ``sort((where(keep, qid, INT_MAX), uix), num_keys=1)``
    followed by a [:take] slice — EXCEPT survivors arrive in stream
    order, not qid order (the rank stage canonicalizes, so callers must
    be order-free).  Returns (qd, ut, nsurv): lanes [0, nsurv) hold the
    kept (qid, uix) pairs, lanes [nsurv, take) hold (dead_val, 0).
    """
    m = qid.shape[0]
    pad = -m % block
    if pad:
        z = jnp.zeros(pad, jnp.int32)
        qid = jnp.concatenate([qid, z])
        uix = jnp.concatenate([uix, z])
        keep = jnp.concatenate([keep, jnp.zeros(pad, dtype=keep.dtype)])
    qc, uc = chunk_compact(qid, uix, keep, block=block, interpret=interpret)

    nc = qid.shape[0] // CHUNK
    counts = jnp.sum(keep.reshape(nc, CHUNK).astype(jnp.int32), axis=1)
    csum = jnp.cumsum(counts)
    nsurv = csum[-1]
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
    idx = jnp.clip(blk * CHUNK + (t - start), 0, qid.shape[0] - 1)
    # idx is nondecreasing: within a chunk's run it steps by 1, across
    # runs it jumps to the next chunk's base.  Span within a 1024-lane
    # gather block is <= block + CHUNK, so a 4*CHUNK window never
    # overflows for CHUNK-sized gather blocks; fall back on the exact
    # XLA gather if it somehow does.
    qg, of1 = pg.monotone_gather(
        qc, idx, block=CHUNK, window=4 * CHUNK, interpret=interpret
    )
    ug, of2 = pg.monotone_gather(
        uc, idx, block=CHUNK, window=4 * CHUNK, interpret=interpret
    )
    qg = jnp.where(of1 + of2 > 0, qc[idx], qg)
    ug = jnp.where(of1 + of2 > 0, uc[idx], ug)
    live = t < nsurv
    qd = jnp.where(live, qg, jnp.int32(dead_val))
    ut = jnp.where(live, ug, 0)
    return qd, ut, nsurv


def stream_compact_np(qid, uix, keep, take, dead_val=0x7FFFFFFF):
    """NumPy oracle for tests."""
    qid, uix = np.asarray(qid), np.asarray(uix)
    keep = np.asarray(keep).astype(bool)
    qk, uk = qid[keep][:take], uix[keep][:take]
    qd = np.full(take, dead_val, np.int32)
    ut = np.zeros(take, np.int32)
    qd[: len(qk)] = qk
    ut[: len(uk)] = uk
    return qd, ut, int(keep.sum())
