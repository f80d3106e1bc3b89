"""Pallas TPU kernel: pair expansion by windowed rank (MUSCATO_PEXPAND).

The pair expansion turns the probe's compacted slots (count, postings
lo, query id per active slot) into per-pair lanes.  The XLA path is a
scatter of each slot id at its first pair lane (+cummax forward-fill)
followed by two slot-array gathers per lane — ~0.2G updates/s for the
scatter and ~one latency per element for the gathers, several hundred
ms at 16M slots / 24M lanes (BENCHMARKS.md microbenchmark rates).

The structure the XLA path cannot exploit: pair lane p's owning slot is
``the last slot s with oexcl[s] <= p``, and because oexcl is a prefix
sum, the slots owning one 1024-lane chunk all lie in a window of at
most 1025 consecutive slots starting at a position the host can
precompute with one small searchsorted.  So each chunk:

  1. slices its slot window from the block's DMA'd span (slot arrays
     stream into VMEM once per 8192-lane block),
  2. ranks every lane against the window's oexcl on the MXU
     (``rank = cmp @ 1`` — bf16 inputs, f32 accumulate, exact),
  3. picks the owner's (oexcl, lo, qid) with an exact byte-plane
     one-hot matmul (the one-hot never leaves VMEM),
  4. emits qid per lane and the flat postings index
     ``sidx = lo + (p - oexcl)`` — ready for the monotone postings
     fetch.

Duplicate oexcl values (empty slots) resolve to the LAST slot of the
tie, which is the unique nonempty owner: an empty slot shares oexcl
with its successor, so the rank always lands past it.

Enabled with MUSCATO_PEXPAND=1 (autotuned); exact and overflow-free by
construction (window bounds are arithmetic, not data-dependent).  No
counterpart in the reference — its confirm loop iterates postings
per query in Go (/root/reference/cmd/muscato_confirm/main.go:171-250).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
CHUNK = 1024
CW_ROWS = 10           # per-chunk slot window: 1280 slots >= 1025 + align
BLOCK = 4096           # 8192 unrolls past the 16M Mosaic vmem stack limit
BW_ROWS = 43           # per-block slot window rows: covers 4097 + align + CW

# Sub-chunked rank variant (MUSCATO_PEXPAND_SUB=1, device A/B round 5):
# ranking at 128-lane granularity bounds each sub-chunk's owner span by
# 129 slots, so the rank compare drops from (1024 x 1280) to
# (128 x 256) per equivalent lanes — ~5x less VPU compare work, which
# the round-5 profile showed dominates the kernel (0.53s/8M batch).
SUB_CHUNK = 128
SUB_CW_ROWS = 2        # 256 slots >= 129 + alignment


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


def _dma(table_ref, starts_ref, win_ref, sem, step, rows):
    slot = jax.lax.rem(step, 2)
    return pltpu.make_async_copy(
        table_ref.at[pl.ds(starts_ref[step] // LANE, rows), :],
        win_ref.at[slot], sem.at[slot],
    )


def _kernel(starts_ref, cstarts_ref, oexcl_ref, lo_ref, qid_ref,
            qid_out, sidx_out, ow_ref, lw_ref, qw_ref, sem):
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    def dma(step):
        return [
            _dma(oexcl_ref, starts_ref, ow_ref, sem.at[0], step, BW_ROWS),
            _dma(lo_ref, starts_ref, lw_ref, sem.at[1], step, BW_ROWS),
            _dma(qid_ref, starts_ref, qw_ref, sem.at[2], step, BW_ROWS),
        ]

    @pl.when(b == 0)
    def _():
        for c in dma(0):
            c.start()

    @pl.when(b + 1 < nb)
    def _():
        for c in dma(b + 1):
            c.start()

    for c in dma(b):
        c.wait()
    slot = jax.lax.rem(b, 2)
    w0 = starts_ref[b] & ~(LANE - 1)  # 128-aligned block window base

    cw = CW_ROWS * LANE
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, LANE), 1)
    for k in range(BLOCK // CHUNK):
        # This chunk's slot window, as a 128-aligned slice of the block
        # window.  The dynamic start lives in the REF load (sublane-dim
        # pl.ds), which Mosaic lowers; lax.dynamic_slice on a loaded
        # value does not (KernelType.TC has no dynamic_slice rule).
        # The window stays 2-D (CW_ROWS, 128) throughout — collapsing it
        # to a (cw,) lane vector is a tpu.reshape Mosaic rejects — and
        # the rank/pick steps below unroll over its CW_ROWS rows.
        c0 = cstarts_ref[b * (BLOCK // CHUNK) + k] & ~(LANE - 1)
        # Clamp into the block window.  Within the LIVE slot prefix the
        # spread bound (<= BLOCK+1 owners per block + alignment) keeps
        # rel <= BW_ROWS - CW_ROWS by construction; but compacted slot
        # arrays carry a DEAD TAIL (counts 0, oexcl == total), and a
        # chunk whose lanes lie past the pair total resolves its cstart
        # into that tail — far beyond the block window.  Those chunks'
        # lanes are all inactive (pid >= total, masked by the caller),
        # so clamping keeps the VMEM read in bounds without changing any
        # active lane.  Unclamped, the slice reads past the scratch
        # window and faults the TPU worker (observed on v5e).
        rel = jnp.clip((c0 - w0) // LANE, 0, BW_ROWS - CW_ROWS)
        oc = ow_ref[slot, pl.ds(rel, CW_ROWS), :].reshape(CW_ROWS, LANE)
        lc = lw_ref[slot, pl.ds(rel, CW_ROWS), :].reshape(CW_ROWS, LANE)
        qc = qw_ref[slot, pl.ds(rel, CW_ROWS), :].reshape(CW_ROWS, LANE)

        pid = (
            b * BLOCK + k * CHUNK
            + jax.lax.broadcasted_iota(jnp.int32, (CHUNK,), 0)
        )
        # rank = #window slots with oexcl <= pid, summed row by row.
        rank = jnp.zeros((CHUNK,), jnp.int32)
        for r in range(CW_ROWS):
            rank = rank + jnp.sum(
                (oc[r][None, :] <= pid[:, None]).astype(jnp.int32), axis=1
            )
        o = jnp.clip(rank - 1, 0, cw - 1)  # owner offset within the window
        # Owner pick: one (CHUNK, 128) one-hot matmul per window row
        # against that row's byte planes; only the owner's row contributes
        # to the f32 accumulator.
        picked = jnp.zeros((CHUNK, 12), jnp.float32)
        for r in range(CW_ROWS):
            onehot_r = ((o - r * LANE)[:, None] == iota_l).astype(
                jnp.int32).astype(jnp.bfloat16)
            planes_r = jnp.concatenate(
                [_byte_planes(oc[r]), _byte_planes(lc[r]),
                 _byte_planes(qc[r])], axis=1
            )  # (128, 12) bf16
            picked = picked + jax.lax.dot_general(
                onehot_r, planes_r, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        oex, lo, qid = _reassemble_multi(picked, 3)
        sl = pl.ds(k * CHUNK, CHUNK)
        qid_out[sl] = qid
        sidx_out[sl] = lo + (pid - oex)


def _kernel_sub(starts_ref, cstarts_ref, oexcl_ref, lo_ref, qid_ref,
                qid_out, sidx_out, ow_ref, lw_ref, qw_ref, sem):
    """_kernel at SUB_CHUNK granularity: same DMA/window structure, the
    rank/pick unroll runs 128 lanes x 256 window slots per step."""
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    def dma(step):
        return [
            _dma(oexcl_ref, starts_ref, ow_ref, sem.at[0], step, BW_ROWS),
            _dma(lo_ref, starts_ref, lw_ref, sem.at[1], step, BW_ROWS),
            _dma(qid_ref, starts_ref, qw_ref, sem.at[2], step, BW_ROWS),
        ]

    @pl.when(b == 0)
    def _():
        for c in dma(0):
            c.start()

    @pl.when(b + 1 < nb)
    def _():
        for c in dma(b + 1):
            c.start()

    for c in dma(b):
        c.wait()
    slot = jax.lax.rem(b, 2)
    w0 = starts_ref[b] & ~(LANE - 1)

    iota_l = jax.lax.broadcasted_iota(jnp.int32, (SUB_CHUNK, LANE), 1)
    for k in range(BLOCK // SUB_CHUNK):
        c0 = cstarts_ref[b * (BLOCK // SUB_CHUNK) + k] & ~(LANE - 1)
        rel = jnp.clip((c0 - w0) // LANE, 0, BW_ROWS - SUB_CW_ROWS)
        oc = ow_ref[slot, pl.ds(rel, SUB_CW_ROWS), :].reshape(
            SUB_CW_ROWS, LANE)
        lc = lw_ref[slot, pl.ds(rel, SUB_CW_ROWS), :].reshape(
            SUB_CW_ROWS, LANE)
        qc = qw_ref[slot, pl.ds(rel, SUB_CW_ROWS), :].reshape(
            SUB_CW_ROWS, LANE)

        pid = (
            b * BLOCK + k * SUB_CHUNK
            + jax.lax.broadcasted_iota(jnp.int32, (SUB_CHUNK,), 0)
        )
        rank = jnp.zeros((SUB_CHUNK,), jnp.int32)
        for r in range(SUB_CW_ROWS):
            rank = rank + jnp.sum(
                (oc[r][None, :] <= pid[:, None]).astype(jnp.int32), axis=1
            )
        o = jnp.clip(rank - 1, 0, SUB_CW_ROWS * LANE - 1)
        picked = jnp.zeros((SUB_CHUNK, 12), jnp.float32)
        for r in range(SUB_CW_ROWS):
            onehot_r = ((o - r * LANE)[:, None] == iota_l).astype(
                jnp.int32).astype(jnp.bfloat16)
            planes_r = jnp.concatenate(
                [_byte_planes(oc[r]), _byte_planes(lc[r]),
                 _byte_planes(qc[r])], axis=1
            )  # (128, 12) bf16
            picked = picked + jax.lax.dot_general(
                onehot_r, planes_r, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        oex, lo, qid = _reassemble_multi(picked, 3)
        sl = pl.ds(k * SUB_CHUNK, SUB_CHUNK)
        qid_out[sl] = qid
        sidx_out[sl] = lo + (pid - oex)


@functools.partial(
    jax.jit, static_argnames=("pair_cap", "interpret", "subchunk")
)
def expand_owners(oexcl, lo, qid, *, pair_cap: int, interpret: bool = False,
                  subchunk: bool = False):
    """Per-pair (qid, flat postings index) from compacted probe slots.

    ``oexcl`` is the exclusive prefix sum of the slot counts (slot s owns
    pair lanes [oexcl[s], oexcl[s+1])); ``lo``/``qid`` are the slot's
    postings start and flat query id.  Returns (qid_lane, sidx), each
    (pair_cap,) int32; lanes past the true pair total carry the last
    slot's values — callers mask with ``pid < total`` exactly as they do
    for the scatter path.

    Contract: slots must be stream-compacted — a live prefix of
    count>0 slots followed by a dead (count==0) tail, which is exactly
    what the engine's probe emits.  An *interior* run of empty slots
    longer than the chunk's lookback window (BW_ROWS*LANE ranks) would
    yield wrong owners for the lanes after it (the rel clamp that fixed
    the dead-tail OOB fault bounds the window; it cannot see past it).
    One slot owning everything and an entirely empty input are fine."""
    m = oexcl.shape[0]
    assert pair_cap % BLOCK == 0, pair_cap
    nblocks = pair_cap // BLOCK
    chunk = SUB_CHUNK if subchunk else CHUNK
    cw_rows = SUB_CW_ROWS if subchunk else CW_ROWS
    nchunks = pair_cap // chunk

    # Pad the slot arrays so every window slice is in bounds; padding
    # oexcl with int32-max means padded slots never count into a rank.
    padn = BW_ROWS * LANE + LANE
    inf = jnp.int32(0x7FFFFFFF)
    oexcl_p = jnp.concatenate([oexcl, jnp.full(padn, inf, jnp.int32)])
    lo_p = jnp.concatenate([lo, jnp.zeros(padn, jnp.int32)])
    qid_p = jnp.concatenate([qid, jnp.full(padn, -1, jnp.int32)])
    mp = m + padn
    rpad = -mp % LANE
    if rpad:
        oexcl_p = jnp.concatenate([oexcl_p, jnp.full(rpad, inf, jnp.int32)])
        lo_p = jnp.concatenate([lo_p, jnp.zeros(rpad, jnp.int32)])
        qid_p = jnp.concatenate([qid_p, jnp.full(rpad, -1, jnp.int32)])
        mp += rpad
    nrows = mp // LANE

    # Chunk/block window starts: the last slot with oexcl <= the chunk's
    # first pair lane (one small host-free searchsorted), clipped so the
    # full window stays inside the padded arrays.
    firsts = jnp.arange(nchunks, dtype=jnp.int32) * chunk
    cstarts = jnp.clip(
        jnp.searchsorted(oexcl, firsts, side="right").astype(jnp.int32) - 1,
        0, max((nrows - cw_rows) * LANE - 1, 0),
    )
    starts = jnp.clip(
        cstarts.reshape(nblocks, BLOCK // chunk)[:, 0],
        0, max((nrows - BW_ROWS) * LANE - 1, 0),
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK,), lambda b, s, c: (b,)),
            pl.BlockSpec((BLOCK,), lambda b, s, c: (b,)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, BW_ROWS, LANE), jnp.int32),
            pltpu.VMEM((2, BW_ROWS, LANE), jnp.int32),
            pltpu.VMEM((2, BW_ROWS, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
    )
    qid_lane, sidx = pl.pallas_call(
        _kernel_sub if subchunk else _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((pair_cap,), jnp.int32),
            jax.ShapeDtypeStruct((pair_cap,), jnp.int32),
        ],
        interpret=interpret,
    )(
        starts, cstarts,
        oexcl_p.reshape(nrows, LANE),
        lo_p.reshape(nrows, LANE),
        qid_p.reshape(nrows, LANE),
    )
    return qid_lane, sidx


def expand_owners_np(oexcl, lo, qid, pair_cap):
    """NumPy oracle for tests (active lanes only are specified)."""
    oexcl = np.asarray(oexcl)
    lo, qid = np.asarray(lo), np.asarray(qid)
    pid = np.arange(pair_cap)
    owner = np.clip(np.searchsorted(oexcl, pid, side="right") - 1, 0,
                    len(oexcl) - 1)
    return qid[owner].astype(np.int32), (
        lo[owner] + (pid - oexcl[owner])
    ).astype(np.int32)
