"""Pallas TPU kernel: windowed sorted join (searchsorted lo/hi per query).

The sort-merge probe (ops/fused._probe_windows_impl) re-sorts the WHOLE
index (V rows) together with every batch's queries — the index side of
that sort is the probe's dominant cost at V >> Q.  But the index is
already sorted; what the join actually needs per query is

  lo(q)    = #​{ skeys < q }        (start of q's candidate run)
  count(q) = #​{ skeys == q }

i.e. a batched searchsorted.  A per-query binary search loses to the sort
on this hardware (log2(V) dependent HBM gathers at ~30ns each,
BENCHMARKS.md); this kernel instead sorts ONLY the queries (Q rows) and
resolves each 1024-query block against one contiguous index window:

  - the window (the span of sorted index keys the block's queries can
    match) is DMA'd to VMEM once; its start comes from an XLA-side
    searchsorted of the block-first queries (nblocks lookups, not Q);
  - a row-min compare (B x WR ops) finds each query's 128-wide index row;
  - the row's keys are fetched with a one-hot bf16 matmul on the MXU
    (byte planes — exact, as in ops/pallas_gather.py);
  - a fine compare inside the row finishes lo; hi runs the same ladder
    with <=; count = hi - lo.

Queries that would run past the window (a block whose candidate span
exceeds the static window) raise a per-block overflow flag and the caller
re-probes with the sort-merge path — never silently.

Replaces the reference's screen+sort stages' per-batch global ordering
(/root/reference/cmd/muscato/main.go:318-385) with an O(Q log Q) sort +
an O(Q) windowed merge against the prebuilt index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _flip(u):
    """uint32 -> int32 order-preserving flip (u ^ 0x80000000, bitcast):
    lets unsigned key comparisons run as int32 on the VPU/MXU."""
    return jax.lax.bitcast_convert_type(
        u ^ jnp.uint32(0x80000000), jnp.int32
    )


def _win_dma(keys_ref, starts_ref, win_ref, sem, step, window_rows):
    slot = jax.lax.rem(step, 2)
    return pltpu.make_async_copy(
        keys_ref.at[pl.ds(starts_ref[step] // LANE, window_rows), :],
        win_ref.at[slot], sem.at[slot],
    )


def _kernel(starts_ref, q_ref, keys_ref, lo_ref, cnt_ref,
            win_ref, sem, *, window_rows):
    # Double-buffered window DMA across sequential grid steps (starts are
    # scalar-prefetched, so step b+1's window streams while b computes).
    b = pl.program_id(0)
    nprog = pl.num_programs(0)

    @pl.when(b == 0)
    def _():
        _win_dma(keys_ref, starts_ref, win_ref, sem, 0, window_rows).start()

    @pl.when(b + 1 < nprog)
    def _():
        _win_dma(keys_ref, starts_ref, win_ref, sem, b + 1,
                 window_rows).start()

    start = starts_ref[b]
    q = _flip(q_ref[:])  # (B,) int32, nondecreasing
    nb = q.shape[0]
    _win_dma(keys_ref, starts_ref, win_ref, sem, b, window_rows).wait()
    win_u = win_ref[jax.lax.rem(b, 2)]  # (WR, 128) uint32 sorted keys

    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (nb, window_rows), 1)
    planes = [
        jnp.bitwise_and(jax.lax.shift_right_logical(
            win_u, jnp.uint32(8 * p)), jnp.uint32(255)
        ).astype(jnp.int32).astype(jnp.bfloat16)  # Mosaic: no uint->float
        for p in range(4)
    ]
    winb = jnp.concatenate(planes, axis=1)  # (WR, 512) bf16

    # Row-min boundary keys as a LANE-dim vector.  A plain ``win[:, 0]``
    # column extract forces a sublane->lane relayout that Mosaic lowers
    # with ~0.5MB of stack per window row (vmem OOM at any useful WR);
    # instead select column 0 of each byte plane with one (4, 512) one-hot
    # against winb^T on the MXU and reassemble — everything stays lane-dim.
    sel_i0 = jax.lax.broadcasted_iota(jnp.int32, (4, 512), 0)
    sel_i1 = jax.lax.broadcasted_iota(jnp.int32, (4, 512), 1)
    sel = (sel_i1 == sel_i0 * LANE).astype(jnp.bfloat16)
    rmt = jax.lax.dot_general(
        sel, winb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (4, WR) f32: byte plane p of each row's first key
    rp = [rmt[p].astype(jnp.int32) for p in range(4)]
    rowmin_u = (
        rp[0] | jax.lax.shift_left(rp[1], 8)
        | jax.lax.shift_left(rp[2], 16) | jax.lax.shift_left(rp[3], 24)
    )  # (WR,) int32 bit pattern of the unflipped uint32 key
    rowmin = _flip(jax.lax.bitcast_convert_type(rowmin_u, jnp.uint32))

    # Rows whose first key is < q (resp. <= q): the boundary row indices.
    r_lt = jnp.sum(
        (rowmin[None, :] < q[:, None]).astype(jnp.int32), axis=1
    )  # (B,)
    r_le = jnp.sum(
        (rowmin[None, :] <= q[:, None]).astype(jnp.int32), axis=1
    )

    def fetch_row(r):
        onehot = (r[:, None] == rows_iota).astype(jnp.bfloat16)
        rows = jax.lax.dot_general(
            onehot, winb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p0, p1, p2, p3 = (
            rows[:, i * LANE:(i + 1) * LANE].astype(jnp.int32)
            for i in range(4)
        )
        w = (
            p0 | jax.lax.shift_left(p1, 8) | jax.lax.shift_left(p2, 16)
            | jax.lax.shift_left(p3, 24)
        )
        return _flip(jax.lax.bitcast_convert_type(w, jnp.uint32))

    row_lo = fetch_row(jnp.maximum(r_lt - 1, 0))  # (B, 128)
    fine_lo = jnp.sum((row_lo < q[:, None]).astype(jnp.int32), axis=1)
    lo = jnp.where(r_lt == 0, 0, (r_lt - 1) * LANE + fine_lo)

    row_hi = fetch_row(jnp.maximum(r_le - 1, 0))
    fine_hi = jnp.sum((row_hi <= q[:, None]).astype(jnp.int32), axis=1)
    hi = jnp.where(r_le == 0, 0, (r_le - 1) * LANE + fine_hi)

    # hi touching the window end (query run continuing past it, or the
    # query lying beyond it) is detected by the CALLER in XLA from the
    # unclipped lo/cnt — a 1-element 1-D block output would need a
    # sub-T(1024) layout, which Mosaic dislikes.
    lo_ref[:] = start + lo
    cnt_ref[:] = hi - lo


@functools.partial(
    jax.jit, static_argnames=("block", "window_rows", "interpret")
)
def sorted_join(
    skeys: jax.Array,
    qkeys: jax.Array,
    *,
    block: int = 1024,
    window_rows: int = 256,
    interpret: bool = False,
):
    """lo[i] = #{skeys < qkeys[i]}, count[i] = #{skeys == qkeys[i]} for a
    NONDECREASING uint32 ``qkeys`` against a sorted uint32 ``skeys``.

    Returns (lo (Q,) int32, count (Q,) int32, overflow scalar int32).
    lo/count are clipped to the real index length.  overflow nonzero means
    some block's candidate span exceeded the window — results for that
    block are unusable and the caller must fall back."""
    v = skeys.shape[0]
    m = qkeys.shape[0]
    if m == 0 or v == 0:
        z = jnp.zeros(m, jnp.int32)
        return z, z, jnp.int32(0)
    npad = -v % LANE
    if npad:
        # Pad with the maximum key: pad rows sort above every real key
        # and any matches against them are clipped off below.
        skeys = jnp.concatenate(
            [skeys, jnp.full(npad, 0xFFFFFFFF, jnp.uint32)]
        )
    nrows = (v + npad) // LANE
    window_rows = min(window_rows, nrows)
    mpad = -m % block
    if mpad:
        qkeys = jnp.concatenate([qkeys, jnp.broadcast_to(qkeys[-1], (mpad,))])
    mp = m + mpad
    nblocks = mp // block

    # Exact window starts: where each block's first query lands in the
    # index (nblocks searchsorted lookups), lane-aligned and clipped.
    first = qkeys[::block]
    starts = jnp.clip(
        jnp.searchsorted(skeys, first, side="left").astype(jnp.int32)
        & jnp.int32(~(LANE - 1)),
        0, (nrows - window_rows) * LANE,
    ).astype(jnp.int32)

    keys2d = skeys.reshape(nrows, LANE)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((block,), lambda b, starts: (b,)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((block,), lambda b, starts: (b,)),
            pl.BlockSpec((block,), lambda b, starts: (b,)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, window_rows, LANE), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    lo, cnt = pl.pallas_call(
        functools.partial(_kernel, window_rows=window_rows),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((mp,), jnp.int32),
            jax.ShapeDtypeStruct((mp,), jnp.int32),
        ],
        interpret=interpret,
    )(starts, qkeys, keys2d)
    # Overflow in XLA: a query's unclipped hi touching its block's window
    # end means its run may continue past the window (or it lies beyond).
    hi_in_window = (lo + cnt) - jnp.repeat(starts, block)
    oflow = jnp.max((hi_in_window >= window_rows * LANE).astype(jnp.int32))
    lo, cnt = lo[:m], cnt[:m]
    # Clip matches against the pad tail (pad keys are 0xFFFFFFFF, which a
    # real hashed query may equal).
    hi = jnp.minimum(lo + cnt, v)
    lo = jnp.minimum(lo, v)
    return lo, hi - lo, oflow


def sorted_join_np(skeys: np.ndarray, qkeys: np.ndarray):
    """NumPy oracle for tests."""
    lo = np.searchsorted(skeys, qkeys, side="left")
    hi = np.searchsorted(skeys, qkeys, side="right")
    return lo.astype(np.int32), (hi - lo).astype(np.int32)
