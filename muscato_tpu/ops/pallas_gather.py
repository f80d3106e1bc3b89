"""Pallas TPU kernel: windowed gather for sorted (monotone) indices.

Random element gathers into large HBM tables cost ~27-30ns each on v5e
(one HBM latency per element; BENCHMARKS.md microbenchmarks).  Several of
the matching engine's hottest gathers have *sorted* (piecewise monotone,
small-stride) index vectors:

  - the pair expansion's postings fetch (``spos[lo + j]``: owners are in
    sorted-key order, so the flat index stream is nondecreasing),
  - the verify's read-row fetch (pairs are grouped by read),
  - the dedup verify's verdict map-back (unique rows -> pair slots).

For a sorted index vector the elements needed by one block of outputs lie
in one contiguous table span.  This kernel DMAs that span into VMEM once
and then resolves the per-lane selects *on the MXU*: a one-hot bf16
matmul picks each output's 128-wide table row (exact — a one-hot row sum
touches a single byte plane, and bytes are exact in bf16), and a per-lane
masked reduce picks the column.  HBM traffic becomes ~one linear sweep of
the touched span instead of one full latency per element.

The window size is static.  Blocks whose index span exceeds the window
report an overflow flag (per block, max-reduced by the caller alongside
scalars it already fetches); out-of-window lanes yield 0 and the caller
re-runs the batch on the plain XLA gather path.  With spans sized ~4x the
expected stride this is a cold path for real workloads.

No counterpart in the reference (its analogue is sequential stream reads,
/root/reference/cmd/muscato_confirm/main.go:98-148); this kernel exists
purely for the TPU memory system.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _win_dma(table_ref, starts_ref, win_ref, sem, step, window_rows):
    """Async copy of grid step `step`'s window into its revolving slot."""
    slot = jax.lax.rem(step, 2)
    return pltpu.make_async_copy(
        table_ref.at[pl.ds(starts_ref[step] // LANE, window_rows), :],
        win_ref.at[slot], sem.at[slot],
    )


def _kernel(starts_ref, idx_ref, table_ref, out_ref, win_ref, sem,
            *, window_rows):
    # Grid steps run sequentially on the core; the window DMA is double-
    # buffered across steps (scratch persists) so step b computes while
    # step b+1's window streams in — starts are scalar-prefetched, so the
    # next offset is known before its block arrives.
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(b == 0)
    def _():
        _win_dma(table_ref, starts_ref, win_ref, sem, 0, window_rows).start()

    @pl.when(b + 1 < nb)
    def _():
        _win_dma(table_ref, starts_ref, win_ref, sem, b + 1,
                 window_rows).start()

    start = starts_ref[b]
    idx = idx_ref[:]  # (B,) int32, nondecreasing
    off = idx - start
    window = window_rows * LANE
    # Overflow (off outside [0, window)) is detected by the CALLER in
    # plain XLA from (idx, starts) — a per-block 1-element kernel output
    # would need a sub-T(1024) 1-D block layout, which Mosaic dislikes.
    r = jax.lax.shift_right_logical(jnp.clip(off, 0, window - 1), 7)
    c = jnp.bitwise_and(off, LANE - 1)

    _win_dma(table_ref, starts_ref, win_ref, sem, b, window_rows).wait()
    win = win_ref[jax.lax.rem(b, 2)]  # (R, 128) int32

    # Byte planes, bf16: each matmul output is a one-hot row sum, i.e. a
    # single byte value 0..255 — exact in bf16/f32.  The masked byte is
    # re-signed to int32 before the float cast: Mosaic lowers int->float
    # but rejects unsigned->float (jax mosaic lowering _convert_helper).
    planes = [
        jnp.bitwise_and(jax.lax.shift_right_logical(
            win.astype(jnp.uint32), jnp.uint32(8 * p)), jnp.uint32(255)
        ).astype(jnp.int32).astype(jnp.bfloat16)
        for p in range(4)
    ]
    winb = jnp.concatenate(planes, axis=1)  # (R, 512) bf16

    nb = idx.shape[0]
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (nb, window_rows), 1)
    onehot_r = (r[:, None] == rows_iota).astype(jnp.bfloat16)  # (B, R)
    rows = jax.lax.dot_general(
        onehot_r, winb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, 512) f32: the 4 byte planes of each lane's table row

    p0, p1, p2, p3 = (
        rows[:, i * LANE:(i + 1) * LANE].astype(jnp.int32) for i in range(4)
    )
    words = (
        p0 | jax.lax.shift_left(p1, 8) | jax.lax.shift_left(p2, 16)
        | jax.lax.shift_left(p3, 24)
    )  # (B, 128) int32: each lane's full table row, reassembled

    cols_iota = jax.lax.broadcasted_iota(jnp.int32, (nb, LANE), 1)
    picked = jnp.where(cols_iota == c[:, None], words, 0)
    out_ref[:] = jnp.sum(picked, axis=1)


@functools.partial(
    jax.jit, static_argnames=("block", "window", "interpret", "fixup")
)
def monotone_gather(
    table: jax.Array,
    idx: jax.Array,
    *,
    block: int = 1024,
    window: int = 8192,
    interpret: bool = False,
    fixup: int = 0,
):
    """out[j] = table[idx[j]] for a *nondecreasing* int32 ``idx``.

    Returns ``(out, overflow)`` where overflow is a scalar int32 that is
    nonzero iff some block's index span exceeded ``window`` (those lanes
    return 0; the caller must fall back to a plain gather).  ``table`` is
    int32 1-D; ``idx`` values must lie in [0, len(table)).

    ``fixup`` > 0 enables the HYBRID mode: up to ``fixup`` span-overflow
    blocks are repaired with a bounded plain-XLA gather over just their
    lanes (fixup*block lanes — microseconds), and overflow only fires
    when MORE than ``fixup`` blocks overflow.  A realistic monotone
    stream has a handful of sparse regions per batch; without the
    hybrid, ONE such block forfeits the whole kernel (this is exactly
    what kept MUSCATO_MG_SPOS self-disabling at every window size in
    rounds 4-5)."""
    n = table.shape[0]
    m = idx.shape[0]
    assert window % LANE == 0 and block % LANE == 0
    if m == 0 or n == 0:
        return jnp.zeros(m, jnp.int32), jnp.int32(1 if m and not n else 0)
    npad = -n % LANE
    if npad:
        table = jnp.concatenate([table, jnp.zeros(npad, table.dtype)])
    nrows = (n + npad) // LANE
    window_rows = min(window // LANE, nrows)
    mpad = -m % block
    if mpad:
        # Pad with the last real index: keeps the tail block's span tight
        # (padding with a constant like n-1 would blow it past any window).
        idx = jnp.concatenate([idx, jnp.broadcast_to(idx[-1], (mpad,))])
    mp = m + mpad
    nblocks = mp // block

    # Per-block window start: the block's SMALLEST index (piecewise
    # monotone streams may step back within a block — e.g. one postings
    # run expanded for several queries), lane-aligned and clipped so the
    # full window stays in bounds.  With min-starts, off >= 0 always; the
    # only failure mode is span > window, which the flag reports.
    starts = jnp.clip(
        jnp.min(idx.reshape(nblocks, block), axis=1) & jnp.int32(~(LANE - 1)),
        0, (nrows - window_rows) * LANE,
    ).astype(jnp.int32)

    table2d = table.reshape(nrows, LANE)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((block,), lambda b, starts: (b,)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block,), lambda b, starts: (b,)),
        scratch_shapes=[
            pltpu.VMEM((2, window_rows, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, window_rows=window_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp,), jnp.int32),
        interpret=interpret,
    )(starts, idx, table2d)
    # Overflow check in XLA: a lane whose offset leaves its block's window.
    off = idx - jnp.repeat(starts, block)
    bad_lane = (off < 0) | (off >= window_rows * LANE)
    if fixup <= 0:
        return out[:m], jnp.max(bad_lane.astype(jnp.int32))
    # Hybrid fix-up: repair up to `fixup` overflow blocks with a plain
    # gather over their lanes only.  top_k on the bad mask returns bad
    # blocks first; surplus picks are good blocks, whose rewrite is a
    # no-op (the kernel value already equals table[idx]).
    k = min(fixup, nblocks)
    bad_blk = jnp.max(bad_lane.reshape(nblocks, block), axis=1)
    nbad = jnp.sum(bad_blk.astype(jnp.int32))
    _, blk_ids = jax.lax.top_k(bad_blk.astype(jnp.float32), k)
    lanes = (
        blk_ids[:, None] * block + jnp.arange(block, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    vals = table[idx[lanes]]  # `table` is the padded flat array here
    out = out.at[lanes].set(vals)
    return out[:m], (nbad > k).astype(jnp.int32)


def monotone_gather_np(table: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """NumPy oracle for tests."""
    return np.asarray(table)[np.asarray(idx)]


def _rows_dma(table_ref, starts_ref, win_ref, sem, step, window_rows):
    slot = jax.lax.rem(step, 2)
    return pltpu.make_async_copy(
        table_ref.at[pl.ds(starts_ref[step], window_rows), :],
        win_ref.at[slot], sem.at[slot],
    )


def _rows_kernel(starts_ref, ridx_ref, table_ref, out_ref,
                 win_ref, sem, *, window_rows, ncols):
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(b == 0)
    def _():
        _rows_dma(table_ref, starts_ref, win_ref, sem, 0, window_rows).start()

    @pl.when(b + 1 < nb)
    def _():
        _rows_dma(table_ref, starts_ref, win_ref, sem, b + 1,
                  window_rows).start()

    start = starts_ref[b]
    ridx = ridx_ref[:]  # (B,) int32, nondecreasing row ids
    off = ridx - start  # caller detects out-of-window lanes in XLA

    _rows_dma(table_ref, starts_ref, win_ref, sem, b, window_rows).wait()
    win = win_ref[jax.lax.rem(b, 2)]  # (WR, NC) uint32 rows

    planes = [
        jnp.bitwise_and(jax.lax.shift_right_logical(
            win.astype(jnp.uint32), jnp.uint32(8 * p)), jnp.uint32(255)
        ).astype(jnp.int32).astype(jnp.bfloat16)  # Mosaic: no uint->float
        for p in range(4)
    ]
    winb = jnp.concatenate(planes, axis=1)  # (WR, 4*NC) bf16

    nb = ridx.shape[0]
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (nb, window_rows), 1)
    onehot = (off[:, None] == rows_iota).astype(jnp.bfloat16)  # (B, WR)
    rows = jax.lax.dot_general(
        onehot, winb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, 4*NC) f32

    p0, p1, p2, p3 = (
        rows[:, i * ncols:(i + 1) * ncols].astype(jnp.int32) for i in range(4)
    )
    out_ref[:] = (
        p0 | jax.lax.shift_left(p1, 8) | jax.lax.shift_left(p2, 16)
        | jax.lax.shift_left(p3, 24)
    ).astype(jnp.uint32)


@functools.partial(
    jax.jit, static_argnames=("block", "window_rows", "interpret")
)
def monotone_gather_rows(
    table: jax.Array,
    ridx: jax.Array,
    *,
    block: int = 1024,
    window_rows: int = 2048,
    interpret: bool = False,
):
    """out[j, :] = table[ridx[j], :] for *nondecreasing* int32 ``ridx``.

    ``table`` is (R, NC) uint32/int32 (e.g. the nibble-packed read
    matrix); returns ``(out (M, NC), overflow)`` with the same overflow
    contract as monotone_gather.  One one-hot matmul per block replaces
    one full HBM latency per output row."""
    nrows, ncols = table.shape
    m = ridx.shape[0]
    if m == 0 or nrows == 0:
        return (
            jnp.zeros((m, ncols), table.dtype),
            jnp.int32(1 if m and not nrows else 0),
        )
    cpad = -ncols % LANE
    if cpad:
        # Mosaic requires the window DMA's minor dim to be lane-aligned
        # ("Slice shape along dimension 1 must be aligned to tiling (128)").
        table = jnp.pad(table, ((0, 0), (0, cpad)))
    ncols_p = ncols + cpad
    window_rows = min(window_rows, max(nrows, 1))
    mpad = -m % block
    if mpad:
        ridx = jnp.concatenate([ridx, jnp.broadcast_to(ridx[-1], (mpad,))])
    mp = m + mpad
    nblocks = mp // block

    starts = jnp.clip(
        jnp.min(ridx.reshape(nblocks, block), axis=1),
        0, max(nrows - window_rows, 0),
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((block,), lambda b, starts: (b,)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block, ncols_p), lambda b, starts: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, window_rows, ncols_p), table.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _rows_kernel, window_rows=window_rows, ncols=ncols_p
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, ncols_p), jnp.uint32),
        interpret=interpret,
    )(starts, ridx, table)
    off = ridx - jnp.repeat(starts, block)
    oflow = jnp.max(((off < 0) | (off >= window_rows)).astype(jnp.int32))
    return out[:m, :ncols].astype(table.dtype), oflow
