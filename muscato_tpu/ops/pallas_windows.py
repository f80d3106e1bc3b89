"""Pallas TPU kernel: window-key extraction + entropy gate in one pass.

The XLA path (_window_queries in ops/fused.py) materializes a (K, R, W)
gather of the read matrix and re-reads it ~3 times (two Horner folds + the
dinucleotide mask).  This kernel tiles the read matrix through VMEM once
per read block and computes, for all K windows in-register:

  key1[k, r]   primary window key (base-5 exact or polynomial hash)
  key2[k, r]   second hash word (wide windows)
  valid[k, r]  length gate AND >= min_dinuc distinct dinucleotides
               (25-bit presence mask + popcount, matching
               /root/reference/utils/entropy.go:5-40)

Window offsets are compile-time constants here (Mosaic cannot form
lane-dimension slices at dynamic unaligned offsets), so one executable
serves one window set — which a run's config fixes anyway.  Grid: one
program per read tile; the caller pads reads to the tile size (padded rows
carry length 0 and fail the gate).

Opt-in via MUSCATO_PALLAS=1 (consumed by ops.fused.match_windows on the
sort-merge probe path); bit-identical to the XLA path (tests/test_pallas.py).
The XLA path remains the default: the measured A/B on v5e has XLA slightly
ahead (~27ms vs ~35ms per 1M-read 4-window batch, BENCHMARKS.md) because
XLA fuses the extraction into the downstream sort's producer while this
kernel materializes three (K, R) outputs through HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import windows as winops

READ_TILE = 1024  # 1-D operand blocks must match XLA's T(1024) tiling


def _kernel(codes_ref, lengths_ref, key1_ref, key2_ref, valid_ref,
            *, width, min_dinuc, q1s, use_k2):
    m1 = jnp.uint32(winops.key_multiplier(width))
    m2 = jnp.uint32(winops.HASH_MULT2)
    codes = codes_ref[:].astype(jnp.uint32)  # (TR, L), one VMEM read
    lengths = lengths_ref[:]
    for k, q1 in enumerate(q1s):
        k1 = jnp.zeros((codes.shape[0],), jnp.uint32)
        k2 = jnp.zeros((codes.shape[0],), jnp.uint32)
        bits = jnp.zeros((codes.shape[0],), jnp.uint32)
        for i in range(width):
            c = codes[:, q1 + i]
            k1 = k1 * m1 + c
            if use_k2:
                k2 = k2 * m2 + c
            if min_dinuc > 0 and i + 1 < width:
                pr = c * jnp.uint32(winops.NBASE) + codes[:, q1 + i + 1]
                bits = bits | (jnp.uint32(1) << pr)
        ok = lengths >= q1 + width
        if min_dinuc > 0:
            ok = ok & (jax.lax.population_count(bits).astype(jnp.int32) >= min_dinuc)
        key1_ref[k, :] = k1
        key2_ref[k, :] = k2 if use_k2 else jnp.zeros_like(k1)
        valid_ref[k, :] = ok.astype(jnp.int32)


@partial(jax.jit, static_argnames=("q1s", "width", "min_dinuc"))
def window_queries_pallas(codes, lengths, q1s: tuple, *, width, min_dinuc):
    """Pallas twin of ops.fused._window_queries; q1s is a static tuple.

    Returns the same flattened (K*R,) (key1, key2, valid) arrays.
    """
    nreads, lmax = codes.shape
    nwin = len(q1s)
    use_k2 = winops.uses_second_key(width)
    if max(q1s) + width > lmax:
        raise ValueError("window extends past the padded read length")

    pad = (-nreads) % READ_TILE
    if pad:
        codes = jnp.pad(codes, ((0, pad), (0, 0)))
        lengths = jnp.pad(lengths, (0, pad))
    rp = codes.shape[0]
    ntiles = rp // READ_TILE

    key1, key2, valid = pl.pallas_call(
        partial(
            _kernel, width=width, min_dinuc=min_dinuc, q1s=q1s, use_k2=use_k2
        ),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(
                (READ_TILE, lmax), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((READ_TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (nwin, READ_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (nwin, READ_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (nwin, READ_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nwin, rp), jnp.uint32),
            jax.ShapeDtypeStruct((nwin, rp), jnp.uint32),
            jax.ShapeDtypeStruct((nwin, rp), jnp.int32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(codes, lengths)

    key1 = key1[:, :nreads].reshape(-1)
    key2 = key2[:, :nreads].reshape(-1)
    valid = valid[:, :nreads].reshape(-1) > 0
    return key1, key2, valid
