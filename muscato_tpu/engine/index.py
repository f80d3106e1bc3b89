"""Target index: the HBM-resident replacement for the Bloom screen.

The reference sketches the *reads* in Bloom filters and streams every target
window through them (cmd/muscato_screen/main.go:116-207, 408-480), then
re-derives exact candidates with an external sort-merge join
(cmd/muscato_confirm/main.go:375-416).  Here the roles are flipped the way
BASELINE.json prescribes for TPU: the *targets* are compiled once into a
sorted window-key index in HBM, and read batches probe it.  The probe is
exact (plus rare, verify-filtered hash collisions for wide windows), so the
reference's screen+sort+join collapses into one searchsorted.

Index layout (per target shard):

  tcat       (S,)  uint8   concatenated gene codes
  gene_of    (S,)  int32   owning gene of each position
  gene_start (G+1,) int32  gene offsets into tcat
  gene_len   (G,)  int32
  skeys      (V,)  uint32  window key of every *valid* window position,
                           sorted ascending (ties by position)
  spos       (V,)  int32   the window positions, aligned with skeys

A window position p is valid iff the whole window lies inside one gene:
gene_of[p] == gene_of[p + W - 1].  The reference's additional per-window
constraint (window offset q1 must fit left of the site,
cmd/muscato_screen/main.go:340-346 `jw >= 0`) is window-dependent and is
enforced in the verify kernel instead, so one index serves all windows.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..io.targets import TargetSet
from ..ops import search as sops
from ..ops import windows as winops

INVALID_KEY = np.uint32(0xFFFFFFFF)


@dataclass
class TargetIndex:
    tcat: jnp.ndarray
    tpacked: jnp.ndarray  # nibble-packed stream for the SWAR verify kernel
    gene_of: jnp.ndarray
    gene_start: jnp.ndarray
    gene_len: jnp.ndarray
    skeys: jnp.ndarray
    skeys2: jnp.ndarray  # second hash word (zeros for width <= 13)
    spos: jnp.ndarray
    srun: jnp.ndarray  # run length of the (key1,key2) group starting here
    # Unique-key view for the binary-search probe: duplicate-key runs
    # collapse to one entry so bucket depth tracks *distinct* keys.
    ukeys: jnp.ndarray  # (U,) uint32
    ukeys2: jnp.ndarray  # (U,) uint32
    ustart: jnp.ndarray  # (U,) int32 run start in spos
    ucount: jnp.ndarray  # (U,) int32 run length
    ukk: jnp.ndarray  # (2U,) uint32 interleaved [k1,k2] pairs
    sbucket: jnp.ndarray  # (2**bucket_bits+1,) int32 per-bucket search bounds
    probe_steps: int  # binary-search steps covering the largest bucket
    bucket_bits: int
    width: int
    num_valid: int

    @property
    def size(self) -> int:
        return int(self.tcat.shape[0])


@partial(jax.jit, static_argnames=("width",))
def _index_arrays(tcat, gene_of, width):
    s = tcat.shape[0]
    keys = winops.sliding_window_keys(tcat, width)
    if winops.uses_second_key(width):
        keys2 = winops.sliding_window_keys(tcat, width, winops.HASH_MULT2)
    else:
        # Exact single-word keys: the second word is unused ballast.
        keys2 = jnp.zeros(s, dtype=jnp.uint32)
    pos = jnp.arange(s, dtype=jnp.int32)
    # Window must end inside the same gene.
    end = jnp.minimum(pos + width - 1, s - 1)
    valid = (pos + width - 1 < s) & (gene_of[end] == gene_of)
    # Invalid slots sort to the top with an all-ones key; the valid prefix
    # is a contiguous sorted run.
    sort_keys = jnp.where(valid, keys, jnp.uint32(INVALID_KEY))
    sort_keys2 = jnp.where(valid, keys2, jnp.uint32(INVALID_KEY))
    # A real key may equal INVALID_KEY only for hashed (wide) windows; the
    # verify-side window equality check makes a dropped/extra candidate at
    # that key value impossible to observe for exact widths and vanishingly
    # unlikely otherwise; invalid entries carry pos=-1 which the verify
    # kernel rejects.
    spos = jnp.where(valid, pos, jnp.int32(-1))
    invalid_rank = (~valid).astype(jnp.int32)
    skeys, skeys2, rank, spos = jax.lax.sort(
        (sort_keys, sort_keys2, invalid_rank, spos), num_keys=4, dimension=0
    )
    srun = _run_lengths(skeys, skeys2)
    nvalid = jnp.sum(valid.astype(jnp.int32))
    return skeys, skeys2, spos, srun, nvalid


def _run_lengths(skeys, skeys2):
    """srun[i] = length of the equal-(key1,key2) run starting at i (only
    meaningful at run starts, which is all a 'left' search can return)."""
    n = skeys.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    new_run = jnp.concatenate(
        [jnp.ones(1, bool), (skeys[1:] != skeys[:-1]) | (skeys2[1:] != skeys2[:-1])]
    )
    run_start = jax.lax.cummax(jnp.where(new_run, idx, 0))
    is_end = jnp.concatenate([new_run[1:], jnp.ones(1, bool)])
    run_end = jnp.flip(jax.lax.cummin(jnp.flip(jnp.where(is_end, idx, n - 1))))
    return (run_end - run_start + 1).astype(jnp.int32)


def _host_index_arrays(tcat: np.ndarray, gene_of: np.ndarray, width: int):
    """NumPy twin of _index_arrays — identical results, no XLA compile.

    The device path exists for very large shards where the sort should run
    in HBM; for everything else the host build is faster end-to-end because
    it avoids a large one-time compilation.
    """
    s = len(tcat)
    mult = np.uint32(winops.key_multiplier(width))
    padded = np.concatenate([tcat.astype(np.uint32), np.zeros(width - 1, np.uint32)])
    with np.errstate(over="ignore"):
        keys = np.zeros(s, np.uint32)
        for i in range(width):
            keys = keys * mult + padded[i : i + s]
        if winops.uses_second_key(width):
            keys2 = np.zeros(s, np.uint32)
            m2 = np.uint32(winops.HASH_MULT2)
            for i in range(width):
                keys2 = keys2 * m2 + padded[i : i + s]
        else:
            keys2 = np.zeros(s, np.uint32)
    pos = np.arange(s, dtype=np.int32)
    end = np.minimum(pos + width - 1, s - 1)
    valid = (pos + width - 1 < s) & (gene_of[end] == gene_of)
    k1 = np.where(valid, keys, INVALID_KEY)
    k2 = np.where(valid, keys2, INVALID_KEY)
    rank = (~valid).astype(np.int32)
    spos = np.where(valid, pos, np.int32(-1))
    order = np.lexsort((spos, rank, k2, k1))
    k1, k2, spos = k1[order], k2[order], spos[order]
    new_run = np.concatenate([[True], (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])])
    run_id = np.cumsum(new_run) - 1
    counts = np.bincount(run_id)
    srun = counts[run_id].astype(np.int32)
    starts = np.flatnonzero(new_run).astype(np.int32)
    uniq = (k1[starts], k2[starts], starts, counts.astype(np.int32))
    return k1, k2, spos, srun, uniq, int(valid.sum())


def build_target_index(ts: TargetSet, width: int, device_build: bool = False) -> TargetIndex:
    """Compile a TargetSet into a device-resident TargetIndex."""
    s = int(ts.gene_start[-1])
    gene_start = np.asarray(ts.gene_start, dtype=np.int64)
    if s > np.iinfo(np.int32).max:
        raise NotImplementedError(
            "single-shard target index limited to 2**31-1 positions; "
            "shard by gene range (muscato_tpu.parallel) for larger databases"
        )
    gene_of_np = np.repeat(
        np.arange(len(ts.names), dtype=np.int32), np.diff(gene_start)
    )
    tcat = jnp.asarray(ts.tcat)
    upshift = sops.bucket_shift(width)
    if device_build:
        gene_of = jnp.asarray(gene_of_np)
        skeys, skeys2, spos, srun, nvalid = _index_arrays(tcat, gene_of, width)
        nvalid = int(nvalid)
        # Drop the invalid tail: it would pile into the last bucket and
        # inflate the probe's worst-case search depth.
        nkeep = max(1, nvalid)
        skeys, skeys2 = skeys[:nkeep], skeys2[:nkeep]
        spos, srun = spos[:nkeep], srun[:nkeep]
        # Unique-key view (host pass over the fetched keys).
        k1h, k2h = np.asarray(skeys), np.asarray(skeys2)
        new_run = np.concatenate(
            [[True], (k1h[1:] != k1h[:-1]) | (k2h[1:] != k2h[:-1])]
        )
        starts = np.flatnonzero(new_run).astype(np.int32)
        counts = np.diff(np.append(starts, len(k1h))).astype(np.int32)
        uniq = (k1h[starts], k2h[starts], starts, counts)
    else:
        skeys, skeys2, spos, srun, uniq, nvalid = _host_index_arrays(
            np.asarray(ts.tcat), gene_of_np, width
        )
        gene_of = jnp.asarray(gene_of_np)
        nkeep = max(1, nvalid)
        uk = np.searchsorted(uniq[2], nkeep, side="left")
        uniq = tuple(a[:max(1, uk)] for a in uniq)
        skeys, skeys2 = jnp.asarray(skeys[:nkeep]), jnp.asarray(skeys2[:nkeep])
        spos, srun = jnp.asarray(spos[:nkeep]), jnp.asarray(srun[:nkeep])
    bucket, probe_steps, bucket_bits = sops.build_buckets_host(uniq[0], upshift)
    bucket = jnp.asarray(bucket)
    from ..ops import packed as pops

    return TargetIndex(
        tcat=tcat,
        tpacked=pops.pack_stream(np.asarray(ts.tcat)),
        gene_of=gene_of,
        gene_start=jnp.asarray(gene_start.astype(np.int32)),
        gene_len=jnp.asarray(np.diff(gene_start).astype(np.int32)),
        skeys=skeys,
        skeys2=skeys2,
        spos=spos,
        srun=srun,
        ukeys=jnp.asarray(uniq[0]),
        ukeys2=jnp.asarray(uniq[1]),
        ustart=jnp.asarray(uniq[2]),
        ucount=jnp.asarray(uniq[3]),
        ukk=jnp.asarray(
            np.stack([uniq[0], uniq[1]], axis=1).reshape(-1)
        ),
        sbucket=bucket,
        probe_steps=probe_steps,
        bucket_bits=bucket_bits,
        width=width,
        num_valid=nvalid,
    )
