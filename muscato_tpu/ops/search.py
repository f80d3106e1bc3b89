"""Vectorized binary search over composite 64-bit keys.

jnp.searchsorted handles a single key array; the target index for window
widths > 13 uses a (key1, key2) pair of 32-bit hashes (windows.py), making
accidental collisions ~2**-64 instead of ~2**-32 — collision pairs cost a
full verification each, so this directly bounds wasted verify work.

The search is an unrolled branchless binary search (static trip count from
the index size), two gathers per step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def bucket_shift(width: int) -> int:
    """Monotone scaling that spreads this width's key range over the 16-bit
    bucket space: bucket_of(key) = (key << upshift) >> 16."""
    import math

    from . import windows as winops

    if winops.uses_second_key(width):
        bits = 32
    else:
        bits = max(1, math.ceil(width * math.log2(winops.NBASE)))
    return max(0, 32 - max(bits, 16))


def bucket_of(key: jnp.ndarray, upshift: int) -> jnp.ndarray:
    return ((key << jnp.uint32(upshift)) >> jnp.uint32(16)).astype(jnp.int32)


NUM_BUCKETS = 1 << 16  # legacy fixed size; build_buckets_host sizes adaptively
MAX_BUCKET_BITS = 22  # 16MB table cap


def bucket_bits_for(n_entries: int) -> int:
    """Bucket-table size targeting ~16 entries per bucket (fewer search
    steps on big indexes; gathers dominate there)."""
    bits = max(16, (max(n_entries, 1) // 16).bit_length())
    return min(bits, MAX_BUCKET_BITS)


def build_buckets_host(k1_sorted, upshift: int, bucket_bits: int | None = None):
    """Host-side bucket table: bucket[b] = first index whose scaled key is
    in bucket b.  Returns (bucket (2**bits+1,) int32, probe_steps int,
    bucket_bits int)."""
    import numpy as np

    if bucket_bits is None:
        bucket_bits = bucket_bits_for(len(k1_sorted))
    nb = 1 << bucket_bits
    scaled = (
        (k1_sorted.astype(np.uint64) << np.uint64(upshift))
        >> np.uint64(32 - bucket_bits)
    ).astype(np.int64)
    bucket = np.searchsorted(scaled, np.arange(nb + 1, dtype=np.int64)).astype(
        np.int32
    )
    max_run = int(np.max(np.diff(bucket))) if len(k1_sorted) else 1
    steps = max(1, int(max_run).bit_length())
    return bucket, steps, bucket_bits


def searchsorted2_bucketed(
    a1: jnp.ndarray,
    a2: jnp.ndarray,
    k1: jnp.ndarray,
    k2: jnp.ndarray,
    bucket: jnp.ndarray,  # (2**bucket_bits+1,) int32
    *,
    upshift: int,
    steps: int,
    use_k2: bool,
    bucket_bits: int = 16,
    interleaved: jnp.ndarray | None = None,  # (2N,) [k1_0,k2_0,k1_1,...]
):
    """'left' insertion points, starting from per-bucket bounds.

    `steps` must cover the largest bucket (log2 of its size); the index
    build computes it, so the search is exact by construction.
    """
    n = a1.shape[0]
    b = ((k1 << jnp.uint32(upshift)) >> jnp.uint32(32 - bucket_bits)).astype(
        jnp.int32
    )
    lo = bucket[b]
    hi = bucket[b + 1]
    if use_k2 and interleaved is not None:
        # Both key words of an entry sit at adjacent addresses in the
        # precomputed interleaved array, so each probe step's two gathers
        # hit the same HBM burst.  (The interleaved array must be built on
        # the host: forming it on device materializes a (N, 2) tiled array
        # whose minor dim pads 2 -> 128.)
        for _ in range(steps):
            mid = (lo + hi) >> 1
            midc = jnp.minimum(mid, n - 1)
            m1 = interleaved[midc * 2]
            m2 = interleaved[midc * 2 + 1]
            go_right = (m1 < k1) | ((m1 == k1) & (m2 < k2))
            go_right = go_right & (mid < hi)
            lo = jnp.where(go_right, mid + 1, lo)
            hi = jnp.where(go_right, hi, jnp.minimum(hi, mid))
        return lo
    if use_k2:
        for _ in range(steps):
            mid = (lo + hi) >> 1
            midc = jnp.minimum(mid, n - 1)
            m1 = a1[midc]
            m2 = a2[midc]
            go_right = (m1 < k1) | ((m1 == k1) & (m2 < k2))
            go_right = go_right & (mid < hi)
            lo = jnp.where(go_right, mid + 1, lo)
            hi = jnp.where(go_right, hi, jnp.minimum(hi, mid))
        return lo
    for _ in range(steps):
        mid = (lo + hi) >> 1
        midc = jnp.minimum(mid, n - 1)
        m1 = a1[midc]
        go_right = m1 < k1
        go_right = go_right & (mid < hi)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, jnp.minimum(hi, mid))
    return lo


@partial(jax.jit, static_argnames=("side",))
def searchsorted2(
    a1: jnp.ndarray,  # (N,) uint32, lexicographically sorted with a2
    a2: jnp.ndarray,  # (N,) uint32
    k1: jnp.ndarray,  # (Q,) uint32 queries
    k2: jnp.ndarray,  # (Q,) uint32
    side: str = "left",
):
    """Insertion points of (k1, k2) into the sorted (a1, a2) sequence."""
    n = a1.shape[0]
    lo = jnp.zeros(k1.shape, jnp.int32)
    hi = jnp.full(k1.shape, n, jnp.int32)
    steps = max(1, n).bit_length()
    for _ in range(steps):
        mid = (lo + hi) >> 1
        midc = jnp.minimum(mid, n - 1)
        m1 = a1[midc]
        m2 = a2[midc]
        if side == "left":
            go_right = (m1 < k1) | ((m1 == k1) & (m2 < k2))
        else:
            go_right = (m1 < k1) | ((m1 == k1) & (m2 <= k2))
        go_right = go_right & (mid < hi)  # no-op once converged
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, jnp.minimum(hi, mid))
    return lo
