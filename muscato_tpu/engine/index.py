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
from ..ops import windows as winops

INVALID_KEY = np.uint32(0xFFFFFFFF)


@dataclass
class TargetIndex:
    tcat: jnp.ndarray
    gene_of: jnp.ndarray
    gene_start: jnp.ndarray
    gene_len: jnp.ndarray
    skeys: jnp.ndarray
    spos: jnp.ndarray
    width: int
    num_valid: int

    @property
    def size(self) -> int:
        return int(self.tcat.shape[0])


@partial(jax.jit, static_argnames=("width",))
def _index_arrays(tcat, gene_of, width):
    s = tcat.shape[0]
    keys = winops.sliding_window_keys(tcat, width)
    pos = jnp.arange(s, dtype=jnp.int32)
    # Window must end inside the same gene.
    end = jnp.minimum(pos + width - 1, s - 1)
    valid = (pos + width - 1 < s) & (gene_of[end] == gene_of)
    # Invalid slots sort to the top with an all-ones key; the valid prefix
    # is a contiguous sorted run.
    sort_keys = jnp.where(valid, keys, jnp.uint32(INVALID_KEY))
    # A real key may equal INVALID_KEY only for hashed (wide) windows; the
    # verify-side window equality check makes a dropped/extra candidate at
    # that single key value impossible to observe for exact widths and
    # vanishingly unlikely otherwise; we additionally keep validity as a
    # sort operand so no valid entry is lost (invalid entries carry pos=-1).
    spos = jnp.where(valid, pos, jnp.int32(-1))
    invalid_rank = (~valid).astype(jnp.int32)
    skeys, rank, spos = jax.lax.sort(
        (sort_keys, invalid_rank, spos), num_keys=3, dimension=0
    )
    nvalid = jnp.sum(valid.astype(jnp.int32))
    return skeys, spos, nvalid


def build_target_index(ts: TargetSet, width: int) -> TargetIndex:
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
    gene_of = jnp.asarray(gene_of_np)
    skeys, spos, nvalid = _index_arrays(tcat, gene_of, width)
    return TargetIndex(
        tcat=tcat,
        gene_of=gene_of,
        gene_start=jnp.asarray(gene_start.astype(np.int32)),
        gene_len=jnp.asarray(np.diff(gene_start).astype(np.int32)),
        skeys=skeys,
        spos=spos,
        width=width,
        num_valid=int(nvalid),
    )
