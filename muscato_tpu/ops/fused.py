"""Fused matching kernels: probe and expand/verify, two device dispatches.

The matching stage runs as two jitted programs with no host round trip
between them (results flow device-to-device):

  probe_windows    window extraction + entropy gate + sort-merge join of
                   read window keys against the target-window index
  expand_verify    chunked pair expansion + SWAR verification + on-device
                   compaction into one survivor buffer

Probe design — a *sort-merge join*, not a binary search.  On this hardware
class, XLA sorts run near memory bandwidth (radix) while dynamic gathers
run at well under 1 GB/s, so a probe built from log2(V) dependent gathers
per query loses badly to one sort.  The join is:

  1. concatenate index key1s with query key1s (payload encodes row class)
     and stable-sort by key1 alone — index entries precede the queries
     that equal them; key2 never rides the sort (hash collisions between
     distinct wide k-mers only add candidates the byte-true verify
     rejects);
  2. ie[j] = number of index entries before merged position j (a cumsum),
     L[j] = ie at the start of j's equal-key segment (a cummax over
     segment starts — valid because ie is nondecreasing);
  3. for a valid query at j: its candidate run in the index is
     [L[j], L[j] + (ie[j] - L[j])) — counts fall out positionally, with
     no lookups and no run-length table.

One sort + one cumsum + one cummax replaces every per-query search gather.
Pair expansion then walks the merged order directly (the downstream
dedup/rank canonicalizes order, so queries are never un-sorted).

Other measured design points:

  - two programs instead of one: XLA assigns scoped VMEM per program; a
    single monolithic program starved the gathers down to 8KB staging;
  - window offsets arrive as a traced (K,) vector over a flattened (K*R,)
    query space — one executable serves any K-window run;
  - the entropy gate counts distinct dinucleotides with a 25-bit
    presence-mask + popcount (utils.CountDinuc semantics,
    /root/reference/utils/entropy.go:5-40);
  - pairs are expanded in fixed-size chunks inside a device while_loop
    (dynamic trip count) and verified by the SWAR kernel (ops/packed.py)
    with a per-lane window offset;
  - survivors are compacted on device by prefix-sum scatter into one
    (surv_cap, 6) buffer of rows (read, gene, start, nmiss, group, window);
    the host fetches the count and the filled prefix only;
  - capacity overflow is reported, never silently truncated — the caller
    re-runs with a larger bucket.

`group` is the read's (key1, key2) window key pair bit-cast to two int32
columns — the identity of the reference's per-k-mer group for the
MaxMatches cap (cmd/muscato_confirm/main.go:171-250 processes one k-mer
group per searchpairs call).  Both words participate so wide-window hash
collisions on key1 alone cannot merge two distinct k-mer groups.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from . import packed as pops
from . import search as sops
from . import windows as winops

NCOL = 7  # r, g, s, nx, group1, group2, window

# On TPU, XLA may offload large gathers/scatters/sorts to the SparseCore;
# keep these kernels on the TensorCore by default.  MUSCATO_SPARSECORE=1
# lets XLA offload gathers (they then run concurrently with TensorCore
# work) — an A/B knob for hardware where the SparseCore is present.
import os as _os_mod

if _os_mod.environ.get("MUSCATO_SPARSECORE") == "1":
    _TPU_COMPILER_OPTIONS = {
        "xla_tpu_enable_offloading_sort_to_sparsecore": "false",
    }
else:
    _TPU_COMPILER_OPTIONS = {
        "xla_tpu_offload_gather_to_sparsecore": "false",
        "xla_tpu_enable_offloading_scatter_to_sparsecore": "false",
        "xla_tpu_enable_offloading_sort_to_sparsecore": "false",
    }

# Measured-on-device kernel defaults: scripts/autotune_r3.py runs the
# A/B ladder on real TPU hardware and writes the winning flag combination
# to muscato_tpu/TUNED.json; those become the defaults here, so a plain
# `python bench.py` (and every production run) gets the tuned
# configuration.  Environment variables still override per-process for
# A/B sweeps.  A missing or unreadable TUNED.json means "never measured":
# every kernel stays off, the safe XLA-primitive path.


def _load_tuned() -> dict:
    import json
    import os

    path = os.environ.get(
        "MUSCATO_TUNED",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "TUNED.json"),
    )
    try:
        with open(path) as f:
            d = json.load(f)
        return d.get("flags", {}) if isinstance(d, dict) else {}
    except Exception:
        return {}


_TUNED = _load_tuned()


def _flag(name: str, default: bool = False) -> bool:
    v = _os_mod.environ.get(name)
    if v is not None:
        return v == "1"
    return bool(_TUNED.get(name, default))


def effective_flags() -> dict:
    """The engine-kernel flags actually in effect (env > TUNED.json >
    off) — recorded in bench provenance so every measurement is
    self-describing."""
    out = {
        "MUSCATO_MGATHER": int(_MGATHER[0]),
        "MUSCATO_PJOIN": int(_PJOIN[0]),
        "MUSCATO_DORDER": int(_DORDER[0]),
        "MUSCATO_PEXPAND": int(_PEXPAND[0]),
    }
    if _MGATHER[0]:
        # Per-stream sub-flags only matter (and are only recorded) when
        # the gather kernel itself is on.
        out["MUSCATO_MG_SPOS"] = int(_MG_SPOS[0])
        out["MUSCATO_MG_ROWS"] = int(_MG_ROWS[0])
        out["MUSCATO_MG_KEYS"] = int(_MG_KEYS[0])
    return out


# Windowed monotone-gather kernel (ops/pallas_gather.py) for the pair
# expansion's postings fetch and the dedup verify's verdict map-back —
# both index streams are (piecewise) nondecreasing.  Opt-in pending a
# measured TPU A/B (MUSCATO_MGATHER=1); window overflow falls back to the
# XLA gather path via a flag the pipeline reads out of the nsurv scalar.
_MGATHER = [_flag("MUSCATO_MGATHER")]
_MG_WINDOW = int(_os_mod.environ.get("MUSCATO_MGATHER_WINDOW", "8192"))
_MG_ROWS_WINDOW = 2048
MG_FLAG_BIT = 30  # postings-window overflow, ORed into bit 30 of nsurv
MG_FLAG_BIT_ROWS = 29  # rows-window overflow (verify read/target rows)
MG_FLAG_BIT_KEYS = 28  # survivor cap-key fetch overflow (verify tail)
# Per-stream enables under MUSCATO_MGATHER: a postings-span overflow
# must not forfeit the rows windows (and vice versa) — the pipeline
# disables only the stream whose window overflowed at max scale.
# MUSCATO_MG_SPOS=0 / MUSCATO_MG_ROWS=0 start a stream off: on the
# realistic 100M-base workload the postings runs exceed the largest
# device-proven spos window, so the engine always converges to
# rows-only after several regrow recompiles — the env knob skips the
# regrow churn (measured: ~10+ min of relay compiles per process).
#
# MUSCATO_MG_KEYS governs the verify tail's survivor cap-key fetch
# (keyf/key2f over the ascending retained qids).  Its span is
# data-dependent — sparse-survivor regions stretch it — so it gets its
# OWN overflow bit and enable: in round 4 this fetch's overflow was
# threaded into the rows flag, and one sparse block on the flagship
# workload disabled the whole rows stream (and with spos already off,
# mgather entirely) mid-bench — the BENCH_r04 self-disable.
_MG_SPOS = [_flag("MUSCATO_MG_SPOS", True)]
_MG_ROWS = [_flag("MUSCATO_MG_ROWS", True)]
_MG_KEYS = [_flag("MUSCATO_MG_KEYS", True)]
# MUSCATO_MG_GENE: the verify's gene lookup (gblock bounds + refines +
# gene start/end) rides the windowed kernel when the (d, r) stream is
# monotone (dorder + rows stream on).  Kill switch for device A/B.
_MG_GENE = [_flag("MUSCATO_MG_GENE", True)]
# Survivor cap-key fetch window: spans are ~(qid space / survivors) per
# 1024-lane block (~5k typical on the flagship workload); 32768 rides
# out skew at negligible DMA cost (128KB/block ~ 0.16us at HBM rate).
# Never grown (cap == window): a keys overflow means survivors are
# >30x sparser than the flagship density, where the XLA fallback gather
# is proportionally cheap — growth would buy recompiles, not speed.
_MG_KEYS_WINDOW = 32768
_MG_KEYS_WINDOW_CAP = 32768
# Hybrid fix-up budget for the data-dependent monotone streams (spos
# postings, survivor cap-keys): up to this many span-overflow blocks per
# dispatch are repaired with a bounded plain gather instead of tripping
# the overflow ladder (ops/pallas_gather.monotone_gather fixup).  0
# disables the hybrid.
_MG_FIXUP = int(_os_mod.environ.get("MUSCATO_MG_FIXUP", "64"))

# Window-overflow events observed by the host ladder this process, per
# stream — bench provenance records them so a self-disable during an
# official run is visible in the artifact, not only in the run log.
MG_OFLOW_EVENTS = {"spos": 0, "rows": 0, "keys": 0, "pjoin": 0, "grow": 0}
# Window growth factor on overflow (pipeline quadruples it up to MG_MAX_SCALE
# before abandoning the kernels; each growth is a fresh static shape).
_MG_SCALE = [1]
MG_MAX_SCALE = 16
# The rows kernel's per-block iota/one-hot intermediates scale linearly
# with its window; 2048 rows is the largest device-proven size under
# Mosaic's 16M vmem stack limit (pallas_device_check), so growth never
# raises it — a rows overflow at the cap disables that stream instead.
_MG_ROWS_WINDOW_CAP = 2048


def mg_rows_at_cap() -> bool:
    return _MG_ROWS_WINDOW * _MG_SCALE[0] >= _MG_ROWS_WINDOW_CAP


def mg_keys_at_cap() -> bool:
    return _MG_KEYS_WINDOW * _MG_SCALE[0] >= _MG_KEYS_WINDOW_CAP


def mgather_enabled() -> bool:
    return _MGATHER[0]


def set_mgather(on: bool) -> None:
    _MGATHER[0] = on
    if on:
        _MG_SPOS[0] = True
        _MG_ROWS[0] = True
        _MG_KEYS[0] = True


def mg_streams() -> tuple:
    return (_MG_SPOS[0], _MG_ROWS[0], _MG_KEYS[0])


def set_mg_streams(spos: bool, rows: bool, keys: bool) -> None:
    _MG_SPOS[0] = spos
    _MG_ROWS[0] = rows
    _MG_KEYS[0] = keys
    if not (spos or rows or keys):
        _MGATHER[0] = False


def mg_scale() -> int:
    return _MG_SCALE[0]


def set_mg_scale(s: int) -> None:
    _MG_SCALE[0] = s


# Windowed sorted-join probe (ops/pallas_join.py): sorts ONLY the queries
# and resolves lo/count against the already-sorted index in VMEM windows,
# instead of re-sorting the whole index with every batch.  Opt-in pending
# a measured TPU A/B (MUSCATO_PJOIN=1).  On window overflow the probe
# returns total = -1 and the pipeline re-probes via the sort-merge path.
_PJOIN = [_flag("MUSCATO_PJOIN")]
_PJOIN_ROWS = 256  # join window in 128-key rows (32768 keys)
# One 4x growth is allowed on overflow; past ~1024 rows the per-query
# one-hot matmul cost overtakes the sort-merge probe, so then fall back.
_PJOIN_SCALE = [1]
PJOIN_MAX_SCALE = 4


def pjoin_enabled() -> bool:
    return _PJOIN[0]


def set_pjoin(on: bool) -> None:
    _PJOIN[0] = on


def pjoin_scale() -> int:
    return _PJOIN_SCALE[0]


def set_pjoin_scale(s: int) -> None:
    _PJOIN_SCALE[0] = s


# Diagonal-major dedup verify (MUSCATO_DORDER=1): sort the pair buffer by
# (diagonal, read) instead of (read, diagonal).  The unique-(r, d) set and
# every downstream contract are unchanged; what changes is which verify
# fetch stream is monotone.  In (r, d) order the READ rows walk
# sequentially but the TARGET row-gather is random over the trows view
# (~2.75x the packed stream — the largest table the engine touches, and
# random row gathers there are latency-bound at ~30 ns/row, BENCHMARKS.md
# microbenchmarks).  In (d, r) order the TARGET stream is monotone — with
# MUSCATO_MGATHER the trows fetch rides the windowed monotone-gather
# kernel at DMA bandwidth — and the random side moves to the read matrix,
# which is several times smaller (~8-15 ns/row).  Net: the verify's
# dominant latency-bound gather is replaced by a windowed DMA plus a
# cheaper random gather.  Opt-in pending a measured TPU A/B.
_DORDER = [_flag("MUSCATO_DORDER")]


def dorder_enabled() -> bool:
    return _DORDER[0]


def set_dorder(on: bool) -> None:
    _DORDER[0] = on


# MUSCATO_VTAIL (sort-free chunked MXU stream compaction,
# ops/pallas_compact.py) was DELETED after the round-4 device ladder: at
# the big workload it lost every site it replaced — probe compaction
# 5.5s vs 1.49s, expand+verify 5.34s vs 2.47s, rank 1.60s vs 0.81s
# (643k vs 1,677k reads/s/chip overall) — the kernel's grid-step and
# byte-plane-matmul cost is ~4x the XLA radix sorts at 33M-130M lanes
# on v5e.  BENCHMARKS.md round-4 records the measurement.


# Pair expansion by windowed rank (MUSCATO_PEXPAND=1): replace the
# expansion's slot-id scatter + cummax forward-fill + two per-lane slot
# gathers with the chunked rank/one-hot kernel (ops/pallas_expand.py) —
# scatters run ~0.2G updates/s and per-lane gathers ~one HBM latency
# each, several hundred ms at realistic slot/pair counts.  Exact and
# overflow-free by construction.  Opt-in pending a measured TPU A/B.
_PEXPAND = [_flag("MUSCATO_PEXPAND")]
# Sub-chunked rank variant of the expansion kernel (128-lane rank
# windows; ~5x less VPU compare work).  Device A/B pending.
_PEXPAND_SUB = [_flag("MUSCATO_PEXPAND_SUB")]


def pexpand_enabled() -> bool:
    return _PEXPAND[0]


def pexpand_gate(pair_cap: int) -> bool:
    """MUSCATO_PEXPAND applies only when the pair buffer is a whole
    number of kernel blocks (quarter-pow2 buckets are, above the floor);
    single source of truth for the single-chip and mesh paths."""
    if not _PEXPAND[0]:
        return False
    from . import pallas_expand as _pe

    return pair_cap % _pe.BLOCK == 0


def set_pexpand(on: bool) -> None:
    _PEXPAND[0] = on


_jit_cache = {}


def _tpu_jit(fn, static):
    key = fn.__name__
    if key not in _jit_cache:
        opts = None if jax.default_backend() == "cpu" else _TPU_COMPILER_OPTIONS
        _jit_cache[key] = jax.jit(fn, static_argnames=static, compiler_options=opts)
    return _jit_cache[key]


def _horner(win: jnp.ndarray, mult) -> jnp.ndarray:
    """Fold the last axis into a key with multiplier `mult`."""
    key = jnp.zeros(win.shape[:-1], dtype=jnp.uint32)
    for i in range(win.shape[-1]):
        key = key * mult + win[..., i]
    return key


def _window_queries_codes(codes, lengths, q1s, *, width, min_dinuc):
    """Byte-matrix twin of _window_queries (the round-1 path): a
    (K, R, W) element gather over the code matrix.  Kept as the reference
    implementation for the Pallas A/B tests; the product path extracts
    from the packed words instead (K*R*W element gathers cost ~a memory
    latency each on this hardware class)."""
    nreads, lmax = codes.shape
    nwin = q1s.shape[0]
    nflat = nwin * nreads
    use_k2 = winops.uses_second_key(width)

    cols = jnp.clip(q1s[:, None] + jnp.arange(width)[None, :], 0, lmax - 1)
    win = codes[:, cols].transpose(1, 0, 2).astype(jnp.uint32)  # (K, R, W)
    key = _horner(win, winops.key_multiplier(width))  # (K, R)
    key2 = _horner(win, winops.HASH_MULT2) if use_k2 else jnp.zeros_like(key)
    valid = lengths[None, :] >= q1s[:, None] + width  # (K, R)
    if min_dinuc > 0:
        # 25-bit dinucleotide presence mask + popcount == CountDinuc.
        bits = jnp.zeros(win.shape[:2], dtype=jnp.uint32)
        for i in range(width - 1):
            pr = win[:, :, i] * jnp.uint32(winops.NBASE) + win[:, :, i + 1]
            bits = bits | (jnp.uint32(1) << pr)
        valid = valid & (lax.population_count(bits).astype(jnp.int32) >= min_dinuc)

    return key.reshape(nflat), key2.reshape(nflat), valid.reshape(nflat)


def _window_queries(rpacked, lengths, q1s, *, width, min_dinuc):
    """Window keys + validity for every (window, read), flattened to
    (K*R,) window-major — computed from the nibble-packed read matrix.

    Per window: one dynamic column slice of the packed words, a funnel
    shift to align the window to nibble 0, then `width` static nibble
    extractions feeding the Horner fold and the dinucleotide mask.  All
    bulk strided ops — no per-element gathers (the round-1 (K, R, W)
    byte gather paid ~a memory latency per element and dominated the
    probe program at 4M-read batches)."""
    nreads, nw = rpacked.shape
    nwin = q1s.shape[0]
    nflat = nwin * nreads
    use_k2 = winops.uses_second_key(width)
    mult = winops.key_multiplier(width)

    nal = -(-width // 8)  # aligned words covering the window
    nsl = nal + 1  # sliced words (one extra feeds the funnel shift)
    # One guard column keeps the last valid window's slice in bounds
    # (valid windows satisfy q1 + width <= lmax <= 8*nw, so their slice
    # never needs more than one word past the packed width; windows that
    # would read further are invalid for every row and may be garbage).
    padn = max(1, nsl - nw)
    rp = jnp.pad(rpacked, ((0, 0), (0, padn)))
    nwp = nw + padn

    keys, keys2, valids = [], [], []
    for k in range(nwin):
        q1 = q1s[k]
        w0 = jnp.clip(q1 >> 3, 0, nwp - nsl)
        sh = jnp.clip((q1 - (w0 << 3)) * 4, 0, 31).astype(jnp.uint32)
        words = lax.dynamic_slice(
            rp, (jnp.int32(0), w0.astype(jnp.int32)), (nreads, nsl)
        )
        al = []
        for j in range(nal):
            lo = words[:, j] >> sh
            hi = jnp.where(
                sh == 0, jnp.uint32(0), words[:, j + 1] << (jnp.uint32(32) - sh)
            )
            al.append(lo | hi)
        key = jnp.zeros(nreads, jnp.uint32)
        key2 = jnp.zeros(nreads, jnp.uint32)
        bits = jnp.zeros(nreads, jnp.uint32)
        prev = None
        for i in range(width):
            b = (al[i >> 3] >> jnp.uint32((i & 7) * 4)) & jnp.uint32(0xF)
            key = key * mult + b
            if use_k2:
                key2 = key2 * winops.HASH_MULT2 + b
            if min_dinuc > 0 and prev is not None:
                pr = prev * jnp.uint32(winops.NBASE) + b
                bits = bits | (jnp.uint32(1) << pr)
            prev = b
        v = lengths >= q1 + width
        if min_dinuc > 0:
            v = v & (lax.population_count(bits).astype(jnp.int32) >= min_dinuc)
        keys.append(key)
        keys2.append(key2)
        valids.append(v)

    key = jnp.stack(keys).reshape(nflat)
    key2 = (
        jnp.stack(keys2).reshape(nflat)
        if use_k2
        else jnp.zeros(nflat, jnp.uint32)
    )
    valid = jnp.stack(valids).reshape(nflat)
    return key, key2, valid


def _probe_windows_pjoin_impl(
    rpacked, lengths, q1s, skeys, *, width, min_dinuc, window_rows=256,
    interpret=False,
):
    """Sorted-join probe: sort the queries only (Q rows), then resolve
    lo/count per query against the resident sorted index with the
    windowed Pallas join (ops/pallas_join.py).  Same 7-tuple contract as
    _probe_windows_impl, including the compacted slot layout (active
    slots first, the same packed-key sort) — every expand path consumes
    the result directly; the compaction sort runs over Q rows only
    (the sort-merge probe's runs over V + Q).
    total = -1 signals a join-window overflow (fall back, never wrong)."""
    from . import pallas_join as pjoin

    nreads = rpacked.shape[0]
    nwin = q1s.shape[0]
    nflat = nwin * nreads
    keyf, key2f, validf = _window_queries(
        rpacked, lengths, q1s, width=width, min_dinuc=min_dinuc
    )
    qid_pay = jnp.where(
        validf, jnp.arange(nflat, dtype=jnp.int32), jnp.int32(-1)
    )
    ks, qid_m = lax.sort((keyf, qid_pay), num_keys=1)
    lo_m, counts_m, oflow = pjoin.sorted_join(
        skeys, ks, window_rows=window_rows, interpret=interpret
    )
    counts_m = jnp.where(qid_m >= 0, counts_m, 0)
    totalf = jnp.sum(counts_m.astype(jnp.float32))
    total = jnp.where(oflow > 0, jnp.int32(-1), jnp.sum(counts_m))
    # Compact to the active (count > 0) slots, ordered by LO (the slot's
    # postings-run start) rather than by qid: any compacted order keeps
    # the downstream layout assumptions (chunk owner spans for the
    # streamed path, bounded owner spans for the dedup scatter; oexcl is
    # a cumsum over whatever slot order the probe emits), and lo order
    # makes the expansion's postings index stream GLOBALLY piecewise
    # monotone — same-key slots re-expand one run (bounded lookback the
    # per-block min window start covers), so the spos fetch can ride the
    # windowed monotone-gather kernel instead of a 33M-lane random XLA
    # gather (~0.37s/8M batch, round-4 profile).  The sort stays 3-op:
    # lo lives in the key word (nidx < 2**30 asserted), qid rides as
    # payload.
    assert nflat < (1 << 30) - 1, "query space exceeds the packed-key range"
    assert skeys.shape[0] < (1 << 30), "index exceeds the packed-lo range"
    inactive = (counts_m == 0).astype(jnp.int32)
    packed_key = (inactive << 30) | jnp.clip(lo_m, 0, (1 << 30) - 1)
    packed_c, counts_c, qid_c = lax.sort(
        (packed_key, counts_m, qid_m), num_keys=1
    )
    lo_c = packed_c & ((1 << 30) - 1)
    return counts_c, lo_c, qid_c, keyf, key2f, total, totalf


def _probe_windows_impl(
    rpacked, lengths, q1s, skeys, pre_key=None, pre_key2=None,
    pre_valid=None, *, width, min_dinuc, interpret=False,
):
    """Sort-merge probe over the flat (K*R,) query space.

    Best when the index is not much larger than the query batch: one sort
    of (V + K*R) rows replaces every per-query lookup.  Returns compacted
    slot arrays of length K*R (active slots first) plus the qid-indexed
    query-key arrays and the exact pair totals:
      counts_m  candidate count of the query at each slot
      lo_m      start of the query's candidate run in the index
      qid_m     flat (window*R + read) query id
      keyf      (K*R,) key1 of every query, in qid order
      key2f     (K*R,) key2 of every query, in qid order
      total     exact candidate pair count (int32)
      totalf    the same as float32 (int32-overflow detection)
    """
    nreads = rpacked.shape[0]
    nwin = q1s.shape[0]
    nflat = nwin * nreads
    if pre_key is not None:
        keyf, key2f, validf = pre_key, pre_key2, pre_valid
    else:
        keyf, key2f, validf = _window_queries(
            rpacked, lengths, q1s, width=width, min_dinuc=min_dinuc
        )

    nidx = skeys.shape[0]
    m1 = jnp.concatenate([skeys, keyf])
    # The merge joins on key1 ALONE (key2 never rides the sort): for
    # width <= 13 key1 is exact, and for hashed widths a key1 collision
    # between distinct k-mers only adds candidate pairs that the byte-true
    # verify rejects (expected extras ~ Q*V/2**32 — a fraction of a
    # percent).  A 2-operand 1-key stable sort runs ~30% faster than the
    # 3-operand 2-key sort at 100M+ rows, drops a third of the sort
    # traffic, and lets the index skip uploading skeys2 entirely
    # (engine.index keeps a host-side placeholder).
    #
    # The payload word encodes row class:
    #   -1        index entry (stability keeps it before equal-key queries,
    #             because index rows precede queries in the concatenation)
    #   >= 0      valid query, value = flat query id
    #   -2        length-or-entropy-rejected query
    pay = jnp.concatenate(
        [
            jnp.full(nidx, -1, jnp.int32),
            jnp.where(validf, jnp.arange(nflat, dtype=jnp.int32), jnp.int32(-2)),
        ]
    )
    m1s, pay_s = lax.sort((m1, pay), num_keys=1, is_stable=True)

    seg = jnp.concatenate(
        [jnp.ones(1, bool), m1s[1:] != m1s[:-1]]
    )
    is_idx = (pay_s == -1).astype(jnp.int32)
    ie = jnp.cumsum(is_idx) - is_idx  # index entries strictly before j
    seg_ie = jax.lax.cummax(jnp.where(seg, ie, -1))  # ie at my segment start
    counts_m = jnp.where(pay_s >= 0, ie - seg_ie, 0).astype(jnp.int32)
    lo_m = jnp.maximum(seg_ie, 0)
    qid_m = jnp.where(pay_s >= 0, pay_s, -1)

    # Compact to the active (count > 0) slots so that consecutive pair
    # owners are consecutive array slots — this bounds every expansion
    # chunk's owner span by the chunk size.  The group keys are not
    # compacted at all: downstream stages carry qid and index keyf/key2f
    # directly (saves two 100M+-row sort operands AND two K*R gathers).
    # The inactive flag and qid share one key word (qid indexes the K*R
    # query space; K*R < 2**30 is asserted at trace time), so this sort
    # runs 3-operand single-key unstable — measured ~2x the 4-operand
    # stable variant at 100M+ rows.  Key ties exist only among index rows
    # (qid -1), whose order is irrelevant (count 0).
    # Same lo-ordered compaction as the pjoin probe (see the comment
    # there): postings-monotone slot order at the same 3-operand cost.
    assert nflat < (1 << 30) - 1, "query space exceeds the packed-key range"
    assert skeys.shape[0] < (1 << 30), "index exceeds the packed-lo range"
    inactive = (counts_m == 0).astype(jnp.int32)
    packed_key = (inactive << 30) | jnp.clip(lo_m, 0, (1 << 30) - 1)
    packed_c, counts_c, qid_c = lax.sort(
        (packed_key, counts_m, qid_m), num_keys=1
    )
    counts_c, qid_c = counts_c[:nflat], qid_c[:nflat]
    lo_c = packed_c[:nflat] & ((1 << 30) - 1)
    total = jnp.sum(counts_c)
    totalf = jnp.sum(counts_c.astype(jnp.float32))
    return counts_c, lo_c, qid_c, keyf, key2f, total, totalf


def _probe_windows_direct_impl(
    rpacked, lengths, q1s, urec, sbucket,
    *, width, min_dinuc, upshift, bucket_bits, bucket_width,
):
    """Direct-bucket probe: the bucket table is sized (engine.index.
    build_search_aux) so no bucket holds more than `bucket_width` distinct
    keys, so a probe is TWO dependent coalesced fetches — bucket bounds
    (adjacent int32s, one burst) and the bucket's 16-byte (k1, k2, start,
    count) records — with no search loop.  Replaces ~12 dependent gather
    rounds per query of the round-1 bucketed binary search; this is what
    closes the big-index probe gap when the batch is small relative to the
    index.  Same compacted return contract as _probe_windows_impl.
    """
    nreads = rpacked.shape[0]
    nwin = q1s.shape[0]
    nflat = nwin * nreads
    use_k2 = winops.uses_second_key(width)
    keyf0, key2f0, validf = _window_queries(
        rpacked, lengths, q1s, width=width, min_dinuc=min_dinuc
    )

    # Sort queries by key: neighboring lanes then fetch neighboring bucket
    # lines (locality), and the active-compaction below stays cheap.
    # keyf0/key2f0 (qid order) are returned for downstream group lookups.
    qid0 = jnp.arange(nflat, dtype=jnp.int32)
    keyf, key2f, vi, qid = lax.sort(
        (keyf0, key2f0, (~validf).astype(jnp.int32), qid0), num_keys=2
    )
    validf = vi == 0

    w = bucket_width

    def _chunk(args):
        # The (C, 4w) record fetch is the big temp; chunking bounds it so
        # large batches cannot blow HBM (queries are processed in ~1M-query
        # slices under lax.map, one compiled body).
        keyc, key2c, validc = args
        b = ((keyc << jnp.uint32(upshift)) >> jnp.uint32(32 - bucket_bits)).astype(
            jnp.int32
        )
        lo = sbucket[b]
        nb = sbucket[b + 1] - lo
        widx = lo[:, None] * 4 + jnp.arange(4 * w, dtype=jnp.int32)[None, :]
        rec = urec[widx]  # (C, 4w)
        rk1 = rec[:, 0::4]
        rk2 = rec[:, 1::4]
        rstart = rec[:, 2::4].astype(jnp.int32)
        rcount = rec[:, 3::4].astype(jnp.int32)
        in_bucket = jnp.arange(w, dtype=jnp.int32)[None, :] < nb[:, None]
        hit_j = in_bucket & (rk1 == keyc[:, None])
        if use_k2:
            hit_j = hit_j & (rk2 == key2c[:, None])
        hit = validc & jnp.any(hit_j, axis=1)
        c = jnp.where(hit, jnp.sum(jnp.where(hit_j, rcount, 0), axis=1), 0)
        lo_q = jnp.sum(jnp.where(hit_j, rstart, 0), axis=1)
        return c, lo_q

    chunk = min(nflat, 1 << 20)
    padq = (-nflat) % chunk
    def _padded(x, fill):
        return jnp.concatenate([x, jnp.full(padq, fill, x.dtype)]) if padq else x
    kq = _padded(keyf, 0).reshape(-1, chunk)
    k2q = _padded(key2f, 0).reshape(-1, chunk)
    vq = _padded(validf, False).reshape(-1, chunk)
    counts, loc = jax.lax.map(_chunk, (kq, k2q, vq))
    counts = counts.reshape(-1)[:nflat]
    loc = loc.reshape(-1)[:nflat]

    inactive = (counts == 0).astype(jnp.int32)
    # lo-ordered active slots, like the merge/pjoin probes: the
    # expansion's postings stream stays monotone on every probe type.
    _, lo_c, counts_c, qid_c = lax.sort(
        (inactive, loc, counts, qid), num_keys=2, is_stable=True
    )
    total = jnp.sum(counts_c)
    totalf = jnp.sum(counts_c.astype(jnp.float32))
    return counts_c, lo_c, qid_c, keyf0, key2f0, total, totalf


def _probe_windows_search_impl(
    rpacked, lengths, q1s, ukeys, ukeys2, ukk, ustart, ucount, sbucket,
    *, width, min_dinuc, upshift, probe_steps, bucket_bits,
):
    """Bucketed binary-search probe over the flat (K*R,) query space.

    Best when the index is much larger than the query batch (the sort-merge
    probe re-sorts the whole index per batch; this touches only
    O(K*R * probe_steps) gathered elements).  Queries are sorted by key
    first so consecutive lanes search neighboring index regions — gather
    locality is what limits throughput on a multi-hundred-MB index.  Same
    compacted return contract as _probe_windows_impl.
    """
    nreads = rpacked.shape[0]
    nwin = q1s.shape[0]
    nflat = nwin * nreads
    use_k2 = winops.uses_second_key(width)
    keyf0, key2f0, validf = _window_queries(
        rpacked, lengths, q1s, width=width, min_dinuc=min_dinuc
    )

    qid0 = jnp.arange(nflat, dtype=jnp.int32)
    keyf, key2f, vi, qid = lax.sort(
        (keyf0, key2f0, (~validf).astype(jnp.int32), qid0), num_keys=2
    )
    validf = vi == 0

    nuniq = ukeys.shape[0]
    lo_u = sops.searchsorted2_bucketed(
        ukeys, ukeys2, keyf, key2f, sbucket,
        upshift=upshift, steps=probe_steps, use_k2=use_k2,
        bucket_bits=bucket_bits, interleaved=ukk,
    )
    loc = jnp.minimum(lo_u, nuniq - 1)
    eq = ukeys[loc] == keyf
    if use_k2:
        eq = eq & (ukeys2[loc] == key2f)
    hit = validf & eq & (lo_u < nuniq)
    counts = jnp.where(hit, ucount[loc], 0).astype(jnp.int32)
    loc = jnp.where(hit, ustart[loc], 0)

    # Compact actives first (stable) — K*R-sized sort, index untouched.
    inactive = (counts == 0).astype(jnp.int32)
    # lo-ordered active slots, like the merge/pjoin probes: the
    # expansion's postings stream stays monotone on every probe type.
    _, lo_c, counts_c, qid_c = lax.sort(
        (inactive, loc, counts, qid), num_keys=2, is_stable=True
    )
    total = jnp.sum(counts_c)
    totalf = jnp.sum(counts_c.astype(jnp.float32))
    return counts_c, lo_c, qid_c, keyf0, key2f0, total, totalf


def _expand_verify_impl(
    counts_m, lo_m, qid_m, keyf, key2f, q1s, rpacked, lengths, spos,
    tpacked, gene_start, budget, trows=None, gblock=None,
    *, nreads, width, max_read_length, pair_chunk, surv_cap, smax, gsteps=0,
):
    """Returns (surv (surv_cap, NCOL) int32, nsurv, total, totalf) — nsurv
    may exceed surv_cap, signalling overflow; totalf is the exact pair
    count as float32, so the caller can detect int32 cumsum overflow
    (counts beyond ~2**30 pairs per batch require a smaller read batch).

    The inputs are compacted: every slot with count > 0 precedes all empty
    slots, so each chunk's owners occupy at most pair_chunk + 1 consecutive
    slots and all per-chunk work is O(pair_chunk), independent of the query
    count."""
    m = counts_m.shape[0]
    nflat = keyf.shape[0]
    offsets = jnp.cumsum(counts_m)  # inclusive
    total = offsets[-1]
    totalf = jnp.sum(counts_m.astype(jnp.float32))
    offsets_excl = offsets - counts_m

    span = pair_chunk + 1
    # Pad the slot arrays so a span-sized dynamic_slice starting at any
    # owner index stays in bounds.
    counts_p = jnp.concatenate([counts_m, jnp.zeros(span, jnp.int32)])
    oexcl_p = jnp.concatenate([offsets_excl, jnp.full(span, total, jnp.int32)])
    qid_p = jnp.concatenate([qid_m, jnp.full(span, -1, jnp.int32)])
    lo_p = jnp.concatenate([lo_m, jnp.zeros(span, lo_m.dtype)])

    nchunks = lax.div(total + (pair_chunk - 1), jnp.int32(pair_chunk))
    buf = jnp.zeros((surv_cap, NCOL), dtype=jnp.int32)

    def chunk_body(cstate):
        ci, nsurv, buf = cstate
        base = ci * pair_chunk
        pid = base + jnp.arange(pair_chunk, dtype=jnp.int32)
        # First owner of this chunk; its slot window is [ob, ob + span).
        seed = jnp.searchsorted(offsets, base, side="right").astype(jnp.int32)
        ob = jnp.minimum(seed, m)
        counts_l = lax.dynamic_slice(counts_p, (ob,), (span,))
        oexcl_l = lax.dynamic_slice(oexcl_p, (ob,), (span,))

        # Owner of each pair lane, as a local slot id: scatter each slot's
        # id at its run start within the chunk, forward-fill with cummax.
        pos_in_chunk = oexcl_l - base
        ok = (counts_l > 0) & (pos_in_chunk > 0) & (pos_in_chunk < pair_chunk)
        lanes = jnp.full(pair_chunk, -1, jnp.int32)
        lanes = lanes.at[jnp.where(ok, pos_in_chunk, pair_chunk + 1)].set(
            jnp.arange(span, dtype=jnp.int32), mode="drop"
        )
        lanes = lanes.at[0].set(0)
        owner = jnp.clip(lax.cummax(lanes), 0, span - 1)

        qid = lax.dynamic_slice(qid_p, (ob,), (span,))[owner]
        k_lane = jnp.maximum(qid, 0) // nreads
        r_lane = jnp.maximum(qid, 0) - k_lane * nreads
        q1_lane = q1s[k_lane]
        start = oexcl_l[owner]
        within = pid - start
        lo_owner = lax.dynamic_slice(lo_p, (ob,), (span,))[owner]
        site = spos[jnp.clip(lo_owner + within, 0, spos.shape[0] - 1)]
        in_range = (pid < total) & (qid >= 0)
        r = jnp.where(in_range, r_lane, -1)
        p = jnp.where(in_range, site, -1)

        keep, nx, g, s = pops.verify_pairs_packed(
            r, p, rpacked, lengths, tpacked, gene_start,
            budget, q1_lane, width, max_read_length, smax,
            trows=trows, gblock=gblock, gsteps=gsteps,
        )
        qc = jnp.clip(qid, 0, nflat - 1)
        grp = keyf[qc].astype(jnp.int32)
        grp2 = key2f[qc].astype(jnp.int32)

        pos = nsurv + jnp.cumsum(keep.astype(jnp.int32)) - 1
        idx = jnp.where(keep, pos, surv_cap + 1)  # OOB rows are dropped
        vals = jnp.stack([r, g, s, nx, grp, grp2, k_lane], axis=1)
        buf = buf.at[idx].set(vals, mode="drop")
        nsurv = nsurv + jnp.sum(keep.astype(jnp.int32))
        return ci + 1, nsurv, buf

    _, nsurv, buf = lax.while_loop(
        lambda st: st[0] < nchunks, chunk_body, (jnp.int32(0), jnp.int32(0), buf)
    )
    return buf, nsurv, total, totalf


def _expand_pairs_impl(counts_m, lo_m, qid_m, q1s, spos, *, nreads, pair_cap,
                       mgather=False, mg_window=8192, interpret=False,
                       dorder=False, smax=None, max_read_length=0,
                       pexpand=False, pexpand_sub=False, fixup=0):
    """Vectorized pair expansion into a (pair_cap,) column buffer, sorted
    by (read, diagonal) with run-start bookkeeping for the diagonal-dedup
    verify.

    Expansion is one scatter + one cummax (no chunk loop): each active
    slot's id is scattered at its first pair lane and forward-filled, so
    every pair lane knows its owning query in O(pair_cap) dense work.
    Pairs are then sorted by (read row, diagonal d = site - q1); several
    windows of one read landing on the same diagonal become adjacent
    duplicates, which the verify stage resolves once per unique (r, d).

    The pair sort carries a single payload word: the flat query id, from
    which the verify stage recovers the window (qid // nreads), the read
    row (qid % nreads), and — via the qid-indexed keyf/key2f arrays — the
    k-mer cap-group identity of the surviving rows only.  (The round-2a
    version carried (k, grp, grp2) per pair: two more 4-byte operands
    through the biggest sort after the probe's.)

    Returns (qid_s, u_idx, ur, ud, nuniq, total, totalf):
      qid_s    (pair_cap,) flat query id per pair, (r, d)-sorted; -1 = inactive
      u_idx    index of the pair's unique (r, d) in (ur, ud)
      ur/ud    compacted unique read rows / diagonals (prefix of nuniq)
      total    exact pair count (overflow if > pair_cap — caller regrows)
    """
    m = counts_m.shape[0]
    offsets = jnp.cumsum(counts_m)
    total = offsets[-1]
    totalf = jnp.sum(counts_m.astype(jnp.float32))
    oexcl = offsets - counts_m

    inf = jnp.int32(0x7FFFFFFF)
    pid = jnp.arange(pair_cap, dtype=jnp.int32)
    if pexpand:
        # Windowed-rank expansion kernel (ops/pallas_expand.py): no
        # scatter, no cummax, no per-lane slot gathers.
        from . import pallas_expand as _pe

        qid, sidx0 = _pe.expand_owners(
            oexcl, lo_m, qid_m, pair_cap=pair_cap, interpret=interpret,
            subchunk=pexpand_sub,
        )
        sidx = jnp.clip(sidx0, 0, spos.shape[0] - 1)
    else:
        lanes = jnp.full(pair_cap, -1, jnp.int32)
        tgt = jnp.where(counts_m > 0, oexcl, pair_cap + 1)
        lanes = lanes.at[tgt].set(jnp.arange(m, dtype=jnp.int32), mode="drop")
        owner = jnp.clip(lax.cummax(lanes), 0, m - 1)
        qid = qid_m[owner]
        within = pid - oexcl[owner]
        sidx = jnp.clip(lo_m[owner] + within, 0, spos.shape[0] - 1)
    act = (pid < total) & (qid >= 0)
    k_lane = jnp.maximum(qid, 0) // nreads
    r_lane = jnp.maximum(qid, 0) - k_lane * nreads
    if mgather:
        # sidx is piecewise nondecreasing (owners arrive in sorted-key
        # order; a postings run re-expanded for the next same-key query
        # steps back by at most the run length — covered by the per-block
        # min window start).  Span > window sets oflow; the caller
        # re-runs the batch on the XLA gather path.
        from . import pallas_gather as _pg

        site, oflow = _pg.monotone_gather(
            spos, sidx, window=mg_window, interpret=interpret,
            fixup=fixup,
        )
    else:
        site = spos[sidx]
        oflow = jnp.int32(0)
    d = site.astype(jnp.int32) - q1s[k_lane]

    # Sort by (read, diagonal) — or (diagonal, read) under dorder; either
    # total order yields the same unique-(r, d) set, the choice only
    # decides which verify fetch stream is monotone.  Inactive lanes key
    # to int32-max and sink to the end (no real read row or diagonal
    # reaches 2**31-1).
    #
    # qid = k*nreads + r, and r IS (part of) the sort key — so the window
    # index k (a couple of bits) rides the MINOR key's low bits and the
    # 32-bit qid payload operand disappears: the biggest sort after the
    # probe's drops from 3 operands to 2 (XLA sort rate scales with
    # operand count, BENCHMARKS.md).  k must sit BELOW the (r, d) order,
    # never above it, so run detection masks it off.  Gated on the packed
    # minor key fitting int32: d in [-q1, smax) with q1 <= max_read_length
    # for the non-dorder minor (d, k); r < nreads for the dorder minor
    # (r, k).  Callers that do not pass smax keep the payload sort.
    nwin = q1s.shape[0]
    kbits = max((nwin - 1).bit_length(), 1)
    kmax = (1 << kbits) - 1
    doff = max_read_length
    if smax is not None and dorder:
        packk = ((nreads << kbits) | kmax) < 0x7FFFFFFF
    elif smax is not None:
        packk = (((smax + doff) << kbits) | kmax) < 0x7FFFFFFF
    else:
        packk = False
    rkey = jnp.where(act, r_lane, inf)
    if packk and dorder:
        dkey = jnp.where(act, d, inf)
        minor = jnp.where(act, (r_lane << kbits) | k_lane, inf)
        d_s, minor_s = lax.sort((dkey, minor), num_keys=2)
        act_s = d_s != inf
        r_s = jnp.where(act_s, minor_s >> kbits, -1)
        d_s = jnp.where(act_s, d_s, 0)
        run_maj, run_min = d_s, minor_s >> kbits
    elif packk:
        minor = jnp.where(act, ((d + doff) << kbits) | k_lane, inf)
        rkey_s, minor_s = lax.sort((rkey, minor), num_keys=2)
        act_s = rkey_s != inf
        r_s = jnp.where(act_s, rkey_s, -1)
        d_s = jnp.where(act_s, (minor_s >> kbits) - doff, 0)
        run_maj, run_min = rkey_s, minor_s >> kbits
    elif dorder:
        qid_pay = jnp.where(act, qid, -1)
        dkey = jnp.where(act, d, inf)
        d_s, rkey_s, qid_s = lax.sort((dkey, rkey, qid_pay), num_keys=2)
        act_s = d_s != inf
        r_s = jnp.where(act_s, rkey_s, -1)
        d_s = jnp.where(act_s, d_s, 0)
        run_maj, run_min = d_s, rkey_s
    else:
        qid_pay = jnp.where(act, qid, -1)
        rkey_s, d_s, qid_s = lax.sort((rkey, d, qid_pay), num_keys=2)
        act_s = rkey_s != inf
        r_s = jnp.where(act_s, rkey_s, -1)
        run_maj, run_min = rkey_s, d_s
    if packk:
        k_s = jnp.where(act_s, minor_s & jnp.int32(kmax), 0)
        qid_s = jnp.where(act_s, k_s * nreads + jnp.maximum(r_s, 0), -1)

    run_start = (
        jnp.concatenate(
            [jnp.ones(1, bool),
             (run_maj[1:] != run_maj[:-1]) | (run_min[1:] != run_min[:-1])]
        )
        & act_s
    )
    u_idx = jnp.cumsum(run_start.astype(jnp.int32)) - 1
    nuniq = u_idx[-1] + 1
    # Compact the unique (r, d) run starts to a prefix with ONE unstable
    # 1-key sort instead of two full-lane scatters: run starts carry
    # their (unique, increasing) u_idx as the key, every other lane keys
    # to int32-max and sinks.  Measured rates (BENCHMARKS.md): scatter
    # ~0.2G updates/s (~240ms for two pair_cap-sized compactions at 24M
    # lanes) vs 1-key radix sort ~0.29G rows/s (~80ms once).  The sunk
    # tail holds payloads of duplicate lanes in arbitrary order, so it is
    # masked inactive — the verify chunks over ceil(nuniq/vchunk) lanes
    # and the mgather target stream must stay monotone through the tail.
    ukey = jnp.where(run_start, u_idx, inf)
    _, ur, ud = lax.sort((ukey, r_s, d_s), num_keys=1)
    lane = jnp.arange(pair_cap, dtype=jnp.int32)
    live = lane < nuniq
    ur = jnp.where(live, ur, -1)
    ud = jnp.where(live, ud, 0)
    return qid_s, u_idx, ur, ud, nuniq, total, totalf, oflow


def _verify_diagonals_impl(
    qid_s, u_idx, ur, ud, nuniq, keyf, key2f, q1s,
    rpacked, lengths, tpacked, gene_start, budget, trows=None, gblock=None,
    *, nreads, width, max_read_length, vchunk, surv_cap, smax, gsteps=0,
    mgather=False, mg_rows=None, mg_rows_window=2048, interpret=False,
    dorder=False, mg_keys=None, mg_keys_window=32768, mg_gene=True,
    fixup=0,
):
    """Chunked heavy verify over the unique (r, d) prefix, verdict map-back
    to the pair lanes, and survivor compaction.  Work in the gather-heavy
    verify is proportional to the number of UNIQUE diagonals (dynamic
    while_loop trip count), not to pair capacity.

    The pair lanes carry only qid (see _expand_pairs_impl); the
    compaction sort therefore runs on 4 operands — (dead|qid, nx, g, s)
    — instead of the round-2a 8, and the cap-group key words are gathered
    from the qid-indexed keyf/key2f for the retained prefix only.

    Returns (surv (surv_cap, NCOL) int32, nsurv, oflow_rows, oflow_keys):
    the two overflow flags are per-STREAM — the verify row windows vs the
    survivor cap-key fetch windows — so the caller can disable exactly
    the stream whose window overflowed (mg_keys=None follows mg_rows,
    the pre-round-5 coupling, for compatibility)."""
    cap = ur.shape[0]
    nwin = q1s.shape[0]
    nflat = keyf.shape[0]
    pad = jnp.zeros(vchunk, jnp.int32)
    ur_p = jnp.concatenate([ur, jnp.full(vchunk, -1, jnp.int32)])
    ud_p = jnp.concatenate([ud, pad])
    # (g, nx) share one buffer word when the static widths fit (nx is a
    # nibble-mismatch count <= rlen <= max_read_length; g < num_genes):
    # one loop-carried buffer, one map-back gather stream, and one
    # compaction sort operand fewer.
    xbits = max(int(max_read_length).bit_length(), 1)
    ngenes = int(gene_start.shape[0]) - 1
    pack_gnx = ((ngenes << xbits) | ((1 << xbits) - 1)) < 0x7FFFFFFF
    nval = 2 if pack_gnx else 3
    vb = tuple(jnp.zeros(cap + vchunk, jnp.int32) for _ in range(nval))
    okb = jnp.zeros(cap + vchunk, jnp.int32)

    nchunks = lax.div(nuniq + (vchunk - 1), jnp.int32(vchunk))

    def body(st):
        ci, vb, okb, ofl = st
        off = ci * vchunk
        rch = lax.dynamic_slice(ur_p, (off,), (vchunk,))
        dch = lax.dynamic_slice(ud_p, (off,), (vchunk,))
        nx, g, s, ok, of_c = pops.verify_diagonals_packed(
            rch, dch, rpacked, lengths, tpacked, gene_start, budget,
            q1s, width, max_read_length, smax,
            trows=trows, gblock=gblock, gsteps=gsteps,
            mgather=mgather if mg_rows is None else mg_rows,
            mg_rows_window=mg_rows_window,
            interpret=interpret, dorder=dorder, mg_gene=mg_gene,
        )
        if pack_gnx:
            vals = ((g << jnp.int32(xbits)) | nx, s)
        else:
            vals = (nx, g, s)
        vb = tuple(
            lax.dynamic_update_slice(b, v, (off,))
            for b, v in zip(vb, vals)
        )
        okb = lax.dynamic_update_slice(okb, ok, (off,))
        return ci + 1, vb, okb, jnp.maximum(ofl, of_c)

    _, vb, okb, oflow_v = lax.while_loop(
        lambda st: st[0] < nchunks, body,
        (jnp.int32(0), vb, okb, jnp.int32(0)),
    )

    # Map verdict bits AND values back to pair lanes BEFORE the
    # compaction: u_idx is nondecreasing (increments <= 1 per lane), so
    # every stream rides the structurally-overflow-free monotone window
    # (a 2x-block window can never overflow) and the values then travel
    # through the compaction as sort payloads.  The former layout fetched
    # nmiss/gene/start AFTER compaction via the ut payload — 3 RANDOM
    # take-lane gathers that the round-4 profile measured at ~1.0s per
    # 8M-read batch, vs ~0.1s for these monotone streams.
    uix = jnp.clip(u_idx, 0, cap - 1)
    kc = jnp.clip(jnp.maximum(qid_s, 0) // nreads, 0, nwin - 1)
    if mgather:
        from . import pallas_gather as _pg

        def _mono(tab):
            # u_idx increments <= 1/lane: a 2x-block window can never
            # overflow at ANY block size, so these streams take the
            # MUSCATO_MG_BLOCK grid-step knob directly.
            w, _ = _pg.monotone_gather(
                tab, uix, block=_MG_BLOCK, window=2 * _MG_BLOCK,
                interpret=interpret,
            )
            return w
    else:
        def _mono(tab):
            return tab[uix]
    okw = _mono(okb)
    ok = (okw >> kc) & 1
    keep = (qid_s >= 0) & (ok == 1)
    valw = tuple(_mono(b) for b in vb)

    # Compaction: survivors first.  Dead lanes key to int32-max (no real
    # qid reaches 2**31-1), so one word orders the sort and the
    # pre-gathered values ride as payloads.
    take = min(surv_cap, cap)
    qd = jnp.where(keep, qid_s, jnp.int32(0x7FFFFFFF))
    sorted_ops = lax.sort((qd,) + valw, num_keys=1)
    qdt = sorted_ops[0][:take]
    valt = [o[:take] for o in sorted_ops[1:]]
    if pack_gnx:
        gnx_t, s2 = valt
        nx2 = gnx_t & jnp.int32((1 << xbits) - 1)
        g2 = lax.shift_right_logical(gnx_t, jnp.int32(xbits))
    else:
        nx2, g2, s2 = valt
    kt = jnp.clip(jnp.maximum(qdt, 0) // nreads, 0, nwin - 1)
    rt = jnp.maximum(qdt, 0) - kt * nreads
    # Dead tail lanes of the take-prefix hold int32-max: clamp them to
    # the LAST live qid so the gather stream below never jumps from the
    # final survivor to nflat-1 in one block (that transition span alone
    # could overflow any window; with the clamp the tail's span is 0).
    last_live = jnp.max(jnp.where(keep, qid_s, jnp.int32(0)))
    qc = jnp.clip(jnp.minimum(qdt, last_live), 0, nflat - 1)
    # keyf/key2f: on the sort path qdt is ascending, so the cap-group
    # key fetch is monotone too and rides the windowed kernel (profile
    # r4: the two XLA gathers here were the single largest term in the
    # verify tail, ~1.2s per 8M-read batch).  Unlike the uix streams the
    # span is data-dependent (sparse survivors stretch it), so it gets
    # its OWN overflow flag — the caller disables only this fetch and
    # keeps the verify row windows on (round-4's coupling of the two
    # disabled the whole rows stream mid-bench).
    if mg_keys is None:
        mg_keys = mgather if mg_rows is None else mg_rows
    oflow_k = jnp.int32(0)
    if mg_keys:
        from . import pallas_gather as _pg

        keyf_i = lax.bitcast_convert_type(keyf, jnp.int32)
        key2f_i = lax.bitcast_convert_type(key2f, jnp.int32)
        gr1, of1 = _pg.monotone_gather(
            keyf_i, qc, block=1024, window=mg_keys_window,
            interpret=interpret, fixup=fixup,
        )
        gr2, of2 = _pg.monotone_gather(
            key2f_i, qc, block=1024, window=mg_keys_window,
            interpret=interpret, fixup=fixup,
        )
        oflow_k = jnp.maximum(of1, of2)
    else:
        gr1 = keyf[qc].astype(jnp.int32)
        gr2 = key2f[qc].astype(jnp.int32)
    surv = jnp.zeros((surv_cap, NCOL), jnp.int32)
    rows = jnp.stack([rt, g2, s2, nx2, gr1, gr2, kt], axis=1)
    surv = lax.dynamic_update_slice(surv, rows, (0, 0))
    nsurv = jnp.sum(keep.astype(jnp.int32))
    return surv, nsurv, oflow_v, oflow_k


def _pack64_fields(fields, bits):
    """LSB-first pack of nonnegative int32 fields into (lo, hi) uint32
    words; unsigned 64-bit comparison of the result is lexicographic
    comparison of the fields MSB-first (i.e. reversed(fields))."""
    lo = jnp.zeros_like(fields[0], dtype=jnp.uint32)
    hi = jnp.zeros_like(fields[0], dtype=jnp.uint32)
    pos = 0
    for v, b in zip(fields, bits):
        vu = v.astype(jnp.uint32)
        if b < 32:
            vu = vu & jnp.uint32((1 << b) - 1)
        if pos < 32:
            lo = lo | (vu << jnp.uint32(pos))
            if pos + b > 32:
                hi = hi | (vu >> jnp.uint32(32 - pos))
        else:
            hi = hi | (vu << jnp.uint32(pos - 32))
        pos += b
    return lo, hi


def _extract64(lo, hi, pos, b):
    """Field extraction from _pack64_fields words; pos and b static."""
    if pos >= 32:
        w = hi >> jnp.uint32(pos - 32)
    else:
        w = lo >> jnp.uint32(pos)
        if pos + b > 32:
            w = w | (hi << jnp.uint32(32 - pos))
    if b < 32:
        w = w & jnp.uint32((1 << b) - 1)
    return w.astype(jnp.int32)


def _u32(x):
    return lax.bitcast_convert_type(x, jnp.uint32)


def _pack_rows64(r, g, s, nx, pack_bits):
    """Pack (r, g, s, nx) into two int32 words (a 64-bit value split
    lo/hi), LSB-first field order (nx, s, g, r).  pack_bits is the static
    (rbits, gbits, sbits, xbits) tuple; the caller guarantees the fields
    fit (engine.pipeline derives the widths from the batch size, gene
    count, longest gene, and the mismatch-budget maximum).  Halves the
    retained-row fetch (8 bytes/match vs 16) — the dominant per-batch
    device->host transfer at realistic hit density."""
    rb, gb, sb, xb = pack_bits
    lo, hi = _pack64_fields((nx, s, g, r), (xb, sb, gb, rb))
    return jnp.stack(
        [lax.bitcast_convert_type(lo, jnp.int32),
         lax.bitcast_convert_type(hi, jnp.int32)],
        axis=1,
    )


def _rank_survivors_live_impl(buf, live, mm, mmtol, *, match_mode, full_cols=True):
    """Like _rank_survivors_impl but with an explicit live-row mask (the
    mesh path ranks an mp-gathered buffer whose live rows are per-block
    prefixes, not one global prefix)."""
    return _rank_core(buf, live, mm, mmtol, match_mode=match_mode,
                      full_cols=full_cols)


def _rank_survivors_impl(buf, nsurv, mm, mmtol, *, match_mode, surv_cap,
                         full_cols=True, pack_bits=None,
                         mgather=False, interpret=False):
    """Device-side cap + dedup + best+MMTol over one batch's survivors.

    Replicates engine.pipeline._apply_max_matches and _dedup_and_rank
    exactly, in the same stage order as the reference (confirm's
    per-group cap BEFORE combine's dedup, cmd/muscato/main.go:387-505),
    so the host only fetches the retained rows.  Per-batch capping is
    safe: a group's global top-MaxMatches rows are a subset of the union
    of its per-batch top-MaxMatches rows, and the engine re-applies the
    cap over the (small) union across batches.

    Returns (rows (surv_cap, NCOL) int32 — retained prefix, in canonical
    (read, gene, start) order — and the retained count)."""
    live = jnp.arange(surv_cap, dtype=jnp.int32) < nsurv
    return _rank_core(buf, live, mm, mmtol, match_mode=match_mode,
                      full_cols=full_cols, pack_bits=pack_bits,
                      mgather=mgather, interpret=interpret)


# Round-5 perf knobs (profile r5: the 1-D monotone-gather kernels are
# grid-step-bound at block 1024 — ~0.47s summed across the verify tail
# and rank).  MUSCATO_MG_BLOCK raises the per-grid-step lane count for
# the STRUCTURALLY monotone streams only (u_idx/seg_id increment <= 1
# per lane, so a 2x-block window still cannot overflow); data-dependent
# streams (survivor cap-keys) keep block 1024.  Measured (round-5
# phase 3): 4096 LOSES — 1,985,566 vs 2,035,506 reads/s at 1024 (the
# larger window's DMA costs more than the grid steps save); 1024 stays
# the default.  MUSCATO_SEGSCAN (rank stage-3 as two segmented
# associative scans, no scatter/table) was DELETED after the same
# sweep: at 33M lanes the scan pair never finished COMPILING through
# the relay in 70 min, while the identical config minus segscan ran in
# 728s (the vt-kernel failure shape; BENCHMARKS.md round-5 phase 3).
_MG_BLOCK = int(_os_mod.environ.get("MUSCATO_MG_BLOCK", "0")) or int(
    _TUNED.get("MUSCATO_MG_BLOCK", 1024)
)


def _seg_min_broadcast(nxm, seg_id, n, *, mgather, interpret):
    """Per-segment min of nxm broadcast back to every lane.

    seg_id is dense and nondecreasing (increments <= 1), so the
    broadcast-back gather is structurally monotone — with mgather it
    rides the windowed kernel (profile r4: the XLA lowering of this
    gather plus the scatter was ~0.5s per 8M-read batch in the rank
    stage; the scatter remains, the gather drops to DMA rate)."""
    inf32 = jnp.int32(0x7FFFFFFF)
    table = jnp.full(n, inf32).at[seg_id].min(nxm, mode="drop")
    if mgather:
        from . import pallas_gather as _pg

        best, _ = _pg.monotone_gather(
            table, seg_id, block=_MG_BLOCK, window=2 * _MG_BLOCK,
            interpret=interpret,
        )
        return best
    return table[seg_id]


def _rank_core_packed(buf, live, mm, mmtol, *, match_mode, pack_bits,
                      mgather=False, interpret=False):
    """_rank_core with the (r, g, s, nx) columns packed into 64-bit
    lo/hi uint32 words through every sort: stage 1 runs on 5 operands
    instead of 8, stages 2 and 4 on 3 instead of 5 (XLA sort throughput
    scales with operand count — BENCHMARKS.md microbenchmarks).  Taken
    when the field widths fit 64 bits and the caller wants the packed
    return anyway (the single-batch engine path); the multi-batch/mesh
    re-cap path keeps the unpacked implementation, which doubles as the
    equivalence oracle (tests/test_kernels.py).  Group hash words are
    compared as uint32 — inter-group order differs from the signed
    compare of the unpacked path, but group membership, the in-group
    rank order, and the final canonical (r, g, s) order are identical,
    so the retained rows are bit-equal."""
    rb, gb, sb, xb = pack_bits
    n = buf.shape[0]
    r, g, s, nx = buf[:, 0], buf[:, 1], buf[:, 2], buf[:, 3]
    grp, grp2, win = buf[:, 4], buf[:, 5], buf[:, 6]
    dead = (~live).astype(jnp.int32)

    # 1. MaxMatches cap per (window, key1, key2) group.  In-group rank
    #    order matches the unpacked path exactly: (nx, g, s, r) for
    #    best, (g, s, r, nx) for first — packed LSB-first in reverse.
    dw = ((dead << 16) | win).astype(jnp.uint32)  # nwin << 2**16 always
    if match_mode == "first":
        lo1, hi1 = _pack64_fields((nx, r, s, g), (xb, rb, sb, gb))
    else:
        lo1, hi1 = _pack64_fields((r, s, g, nx), (rb, sb, gb, xb))
    dw, grp_s, grp2_s, hi1, lo1 = lax.sort(
        (dw, _u32(grp), _u32(grp2), hi1, lo1), num_keys=5
    )
    iota = jnp.arange(n, dtype=jnp.int32)
    newgrp = jnp.concatenate(
        [jnp.ones(1, bool),
         (dw[1:] != dw[:-1]) | (grp_s[1:] != grp_s[:-1])
         | (grp2_s[1:] != grp2_s[:-1])]
    )
    seg_start = lax.cummax(jnp.where(newgrp, iota, 0))
    rank = iota - seg_start
    cap = mm + jnp.int32(1 if match_mode == "first" else 0)
    keep = (dw < jnp.uint32(1 << 16)) & (rank < cap)

    # 2. exact dedup on (read, gene, start), canonical order.  nx is
    #    carried in the low bits of the packed key: it is a function of
    #    (r, g, s) — one verify per unique (read, diagonal) — so it
    #    never changes the order or the equality classes.
    if match_mode == "first":
        fields = [_extract64(lo1, hi1, p, b) for p, b in
                  ((0, xb), (xb, rb), (xb + rb, sb), (xb + rb + sb, gb))]
        nx2, r2, s2, g2 = fields
    else:
        fields = [_extract64(lo1, hi1, p, b) for p, b in
                  ((0, rb), (rb, sb), (rb + sb, gb), (rb + sb + gb, xb))]
        r2, s2, g2, nx2 = fields
    loc, hic = _pack64_fields((nx2, s2, g2, r2), (xb, sb, gb, rb))
    dead2 = (~keep).astype(jnp.uint32)
    dead2, hic, loc = lax.sort((dead2, hic, loc), num_keys=3)
    first_rgs = jnp.concatenate(
        [jnp.ones(1, bool), (hic[1:] != hic[:-1]) | (loc[1:] != loc[:-1])]
    )
    keep = (dead2 == 0) & first_rgs

    # 3. per-read best + MMTol (segment-min over the established order).
    inf32 = jnp.int32(0x7FFFFFFF)
    nx3 = _extract64(loc, hic, 0, xb)
    r3 = _extract64(loc, hic, xb + sb + gb, rb)
    nxm = jnp.where(keep, nx3, inf32)
    new_read = jnp.concatenate(
        [jnp.ones(1, bool),
         (r3[1:] != r3[:-1]) | (dead2[1:] != dead2[:-1])]
    )
    seg_id = jnp.cumsum(new_read.astype(jnp.int32)) - 1
    best = _seg_min_broadcast(nxm, seg_id, n, mgather=mgather,
                              interpret=interpret)
    keep = keep & (nxm <= best + mmtol)

    # 4. stable single-key compaction; the packed words ARE the return.
    loc_i = lax.bitcast_convert_type(loc, jnp.int32)
    hic_i = lax.bitcast_convert_type(hic, jnp.int32)
    dead4 = (~keep).astype(jnp.uint32)
    _, hic_i, loc_i = lax.sort(
        (dead4, hic_i, loc_i), num_keys=1, is_stable=True
    )
    rows = jnp.stack([loc_i, hic_i], axis=1)
    count = jnp.sum(keep.astype(jnp.int32))
    return rows, count


def _rank_core(buf, live, mm, mmtol, *, match_mode, full_cols=True,
               pack_bits=None, mgather=False, interpret=False):
    if pack_bits is not None and not full_cols:
        return _rank_core_packed(
            buf, live, mm, mmtol, match_mode=match_mode, pack_bits=pack_bits,
            mgather=mgather, interpret=interpret,
        )
    n = buf.shape[0]
    r, g, s, nx = buf[:, 0], buf[:, 1], buf[:, 2], buf[:, 3]
    grp, grp2, win = buf[:, 4], buf[:, 5], buf[:, 6]
    dead = (~live).astype(jnp.int32)

    # 1. MaxMatches cap per (window, key1, key2) group
    #    ('first' emits MaxMatches+1 like the reference's append-then-check).
    if match_mode == "first":
        ops = (dead, win, grp, grp2, g, s, r, nx)
    else:
        ops = (dead, win, grp, grp2, nx, g, s, r)
    sorted_ops = lax.sort(ops, num_keys=len(ops))
    dead_s = sorted_ops[0]
    if match_mode == "first":
        _, win, grp, grp2, g, s, r, nx = sorted_ops
    else:
        _, win, grp, grp2, nx, g, s, r = sorted_ops
    iota = jnp.arange(n, dtype=jnp.int32)
    newgrp = jnp.concatenate(
        [jnp.ones(1, bool),
         (win[1:] != win[:-1]) | (grp[1:] != grp[:-1]) | (grp2[1:] != grp2[:-1])]
    )
    seg_start = lax.cummax(jnp.where(newgrp, iota, 0))
    rank = iota - seg_start
    cap = mm + jnp.int32(1 if match_mode == "first" else 0)
    keep = (dead_s == 0) & (rank < cap)

    # Stages 2-4 never consult the group/window columns; they ride the
    # sorts only so full_cols callers (multi-batch re-cap) get them back.
    # Single-batch callers drop them here: three fewer operands through
    # three surv_cap-row sorts.
    if full_cols:
        extras = (grp, grp2, win)
    else:
        extras = ()

    # 2. exact dedup on (read, gene, start).  This sort also establishes
    #    the FINAL canonical order: live rows first, then (r, g, s) —
    #    stages 3 and 4 never reorder again.
    dead2 = (~keep).astype(jnp.int32)
    dead2, r, g, s, nx, *extras = lax.sort(
        (dead2, r, g, s, nx, *extras), num_keys=4
    )
    first_rgs = jnp.concatenate(
        [jnp.ones(1, bool),
         (r[1:] != r[:-1]) | (g[1:] != g[:-1]) | (s[1:] != s[:-1])]
    )
    keep = (dead2 == 0) & first_rgs

    # 3. per-read best + MMTol — as a SEGMENT-MIN over the existing
    #    (r, g, s) order instead of a third full multi-operand sort: the
    #    kept rows of one read are already contiguous, so scatter-min
    #    their nmiss into a per-segment table and gather it back (the
    #    round-2 rank analysis; the sort carried 5-8 operands for what is
    #    a 1-word reduction).  Dead rows must not contribute: a row capped
    #    out in stage 1 may carry a smaller nmiss than any surviving row.
    inf32 = jnp.int32(0x7FFFFFFF)
    nxm = jnp.where(keep, nx, inf32)
    new_read = jnp.concatenate(
        [jnp.ones(1, bool), (r[1:] != r[:-1]) | (dead2[1:] != dead2[:-1])]
    )
    seg_id = jnp.cumsum(new_read.astype(jnp.int32)) - 1
    best = _seg_min_broadcast(nxm, seg_id, n, mgather=mgather,
                              interpret=interpret)
    # best+mmtol may wrap for all-dead segments (best = int32-max); keep
    # is already false there.
    keep = keep & (nxm <= best + mmtol)

    # 4. compact the kept rows to the front.  Order within kept rows is
    #    already canonical (r, g, s), so one STABLE single-key sort
    #    replaces the former 4-key compaction.
    dead4 = (~keep).astype(jnp.int32)
    dead4, r, g, s, nx, *extras = lax.sort(
        (dead4, r, g, s, nx, *extras), num_keys=1, is_stable=True
    )
    if full_cols:
        rows = jnp.stack([r, g, s, nx, *extras], axis=1)
    elif pack_bits is not None:
        rows = _pack_rows64(r, g, s, nx, pack_bits)
    else:
        # Single-batch callers never re-cap across batches, so the group
        # columns stay on device (the retained-row fetch is the dominant
        # per-batch transfer at realistic hit density).
        rows = jnp.stack([r, g, s, nx], axis=1)
    count = jnp.sum(keep.astype(jnp.int32))
    return rows, count


def rank_survivors(buf, nsurv, mm, mmtol, *, match_mode, surv_cap,
                   full_cols=True, pack_bits=None):
    mg = _MGATHER[0]
    interp = mg and jax.default_backend() == "cpu"
    fn = _tpu_jit(
        _rank_survivors_impl,
        ("match_mode", "surv_cap", "full_cols", "pack_bits",
         "mgather", "interpret"),
    )
    return fn(
        buf, nsurv, jnp.int32(mm), jnp.int32(mmtol),
        match_mode=match_mode, surv_cap=surv_cap, full_cols=full_cols,
        pack_bits=pack_bits, mgather=mg, interpret=interp,
    )


def rank_survivors_live(buf, live, mm, mmtol, *, match_mode):
    fn = _tpu_jit(_rank_survivors_live_impl, ("match_mode",))
    return fn(buf, live, jnp.int32(mm), jnp.int32(mmtol), match_mode=match_mode)


def probe_windows(
    rpacked, lengths, q1s, skeys, *, width, min_dinuc, index_aux=None,
    allow_pjoin=True,
):
    """Probe stage only: one async device dispatch.

    index_aux, when given, is a SearchAux (engine.index) and selects the
    bucketed-search probe — the right choice when the index is much larger
    than the query batch and the batch is small.  Returns the 7-tuple
    (counts_m, lo_m, qid_m, keyf, key2f, total, totalf); `total` lets the
    caller size the pair buffer exactly before dispatching the expand
    stage (one scalar fetch — no overflow/regrow round trips).

    MUSCATO_PALLAS=1 computes the window queries with the Pallas
    extraction kernel (ops/pallas_windows.py) instead of the packed XLA
    path — an opt-in A/B hook; only the sort-merge probe consumes it.
    """
    import os as _os

    pre = (None, None, None)
    if index_aux is None and _os.environ.get("MUSCATO_PALLAS") == "1":
        from . import pallas_windows as pwin

        q1s_host = tuple(int(x) for x in jax.device_get(q1s))
        codes = pops.unpack_rows(rpacked, rpacked.shape[1] * pops.BASES_PER_WORD)
        pre = pwin.window_queries_pallas(
            codes, lengths, q1s_host, width=width, min_dinuc=min_dinuc
        )
    if index_aux is not None and index_aux.mode == "direct":
        aux = index_aux
        from ..engine.index import DIRECT_BUCKET_WIDTH

        probe = _tpu_jit(
            _probe_windows_direct_impl,
            ("width", "min_dinuc", "upshift", "bucket_bits", "bucket_width"),
        )
        return probe(
            rpacked, lengths, q1s, aux.urec, aux.sbucket,
            width=width, min_dinuc=min_dinuc, upshift=aux.upshift,
            bucket_bits=aux.bucket_bits, bucket_width=DIRECT_BUCKET_WIDTH,
        )
    if index_aux is not None:
        aux = index_aux
        probe = _tpu_jit(
            _probe_windows_search_impl,
            ("width", "min_dinuc", "upshift", "probe_steps", "bucket_bits"),
        )
        return probe(
            rpacked, lengths, q1s, aux.ukeys, aux.ukeys2, aux.ukk, aux.ustart,
            aux.ucount, aux.sbucket,
            width=width, min_dinuc=min_dinuc, upshift=aux.upshift,
            probe_steps=aux.probe_steps, bucket_bits=aux.bucket_bits,
        )
    if _PJOIN[0] and pre == (None, None, None) and allow_pjoin:
        probe = _tpu_jit(
            _probe_windows_pjoin_impl,
            ("width", "min_dinuc", "window_rows", "interpret"),
        )
        return probe(
            rpacked, lengths, q1s, skeys, width=width, min_dinuc=min_dinuc,
            window_rows=_PJOIN_ROWS * _PJOIN_SCALE[0],
            interpret=jax.default_backend() == "cpu",
        )
    probe = _tpu_jit(
        _probe_windows_impl, ("width", "min_dinuc", "interpret")
    )
    return probe(
        rpacked, lengths, q1s, skeys, *pre, width=width, min_dinuc=min_dinuc,
    )


def expand_verify_streamed(
    probe_out, q1s, rpacked, lengths, spos, tpacked, gene_start, budget,
    *, width, max_read_length, pair_chunk, surv_cap, smax,
    trows=None, gblock=None, gsteps=0,
):
    """Streaming expand+verify from a probe_windows result: chunked pair
    expansion inside a device while_loop, O(pair_chunk) memory regardless
    of the batch's pair count.  Returns (surv, nsurv, total, totalf)."""
    counts_m, lo_m, qid_m, keyf, key2f, _total, _totalf = probe_out
    expand = _tpu_jit(
        _expand_verify_impl,
        ("nreads", "width", "max_read_length", "pair_chunk", "surv_cap",
         "smax", "gsteps"),
    )
    return expand(
        counts_m, lo_m, qid_m, keyf, key2f, q1s, rpacked, lengths, spos,
        tpacked, gene_start, budget, trows, gblock,
        nreads=rpacked.shape[0], width=width,
        max_read_length=max_read_length,
        pair_chunk=pair_chunk, surv_cap=surv_cap, smax=smax, gsteps=gsteps,
    )


def expand_verify_dedup(
    probe_out, q1s, rpacked, lengths, spos, tpacked, gene_start, budget,
    *, width, max_read_length, pair_cap, vchunk, surv_cap, smax,
    trows=None, gblock=None, gsteps=0,
):
    """Diagonal-dedup expand+verify from a probe_windows result: two async
    dispatches (expand/sort -> verify/compact).  Pairs are materialized
    into a (pair_cap,) buffer and verified once per unique (read,
    diagonal); the heavy SWAR gathers drop ~K-fold when K windows hit one
    site, and the (r, d)-sorted order gives the read-row gathers
    sequential locality.  Returns (surv, nsurv, total, totalf); total >
    pair_cap signals pair-buffer overflow (callers that size pair_cap
    from probe_out's total never see it).

    With MUSCATO_MGATHER=1 the postings fetch and the verdict map-back
    run on the windowed monotone-gather kernel (ops/pallas_gather.py); a
    window overflow in the postings fetch is ORed into bit MG_FLAG_BIT of
    the returned nsurv (real counts are bounded by pair_cap < 2**30), and
    the caller must re-run the batch with mgather disabled."""
    counts_m, lo_m, qid_m, keyf, key2f, _total, _totalf = probe_out
    nreads = rpacked.shape[0]
    mg = _MGATHER[0]
    mg_spos = mg and _MG_SPOS[0]
    mg_rows = mg and _MG_ROWS[0]
    mg_keys = mg and _MG_KEYS[0]
    scale = _MG_SCALE[0]
    dorder = _DORDER[0]
    pexpand = pexpand_gate(pair_cap)
    interp = (mg or pexpand) and jax.default_backend() == "cpu"
    expand = _tpu_jit(
        _expand_pairs_impl,
        ("nreads", "pair_cap", "mgather", "mg_window", "interpret",
         "dorder", "smax", "max_read_length", "pexpand", "pexpand_sub",
         "fixup"),
    )
    qid_s, u_idx, ur, ud, nuniq, total, totalf, oflow = expand(
        counts_m, lo_m, qid_m, q1s, spos, nreads=nreads, pair_cap=pair_cap,
        mgather=mg_spos, mg_window=_MG_WINDOW * scale, interpret=interp,
        dorder=dorder, smax=smax, max_read_length=max_read_length,
        pexpand=pexpand, pexpand_sub=_PEXPAND_SUB[0], fixup=_MG_FIXUP,
    )
    verify = _tpu_jit(
        _verify_diagonals_impl,
        ("nreads", "width", "max_read_length", "vchunk", "surv_cap",
         "smax", "gsteps", "mgather", "mg_rows", "mg_rows_window",
         "interpret", "dorder", "mg_keys", "mg_keys_window", "mg_gene",
         "fixup"),
    )
    surv, nsurv, oflow_v, oflow_k = verify(
        qid_s, u_idx, ur, ud, nuniq, keyf, key2f, q1s,
        rpacked, lengths, tpacked, gene_start, budget, trows, gblock,
        nreads=nreads, width=width, max_read_length=max_read_length,
        vchunk=vchunk, surv_cap=surv_cap, smax=smax, gsteps=gsteps,
        mgather=mg, mg_rows=mg_rows,
        mg_rows_window=min(_MG_ROWS_WINDOW * scale, _MG_ROWS_WINDOW_CAP),
        interpret=interp,
        dorder=dorder, mg_keys=mg_keys,
        mg_keys_window=min(_MG_KEYS_WINDOW * scale, _MG_KEYS_WINDOW_CAP),
        mg_gene=_MG_GENE[0], fixup=_MG_FIXUP,
    )
    if mg_spos:
        nsurv = nsurv + oflow * jnp.int32(1 << MG_FLAG_BIT)
    if mg_rows:
        nsurv = nsurv + oflow_v * jnp.int32(1 << MG_FLAG_BIT_ROWS)
    if mg_keys:
        nsurv = nsurv + oflow_k * jnp.int32(1 << MG_FLAG_BIT_KEYS)
    return surv, nsurv, total, totalf


def match_windows(
    rpacked, lengths, q1s, skeys, spos, tpacked, gene_start, budget,
    *, width, min_dinuc, max_read_length, pair_chunk, surv_cap, smax,
    index_aux=None,
):
    """Probe + streaming expand/verify in one call (two async dispatches).
    See probe_windows / expand_verify_streamed for the split form the
    engine uses."""
    pr = probe_windows(
        rpacked, lengths, q1s, skeys,
        width=width, min_dinuc=min_dinuc, index_aux=index_aux,
    )
    return expand_verify_streamed(
        pr, q1s, rpacked, lengths, spos, tpacked, gene_start, budget,
        width=width, max_read_length=max_read_length,
        pair_chunk=pair_chunk, surv_cap=surv_cap, smax=smax,
    )


def match_windows_dedup(
    rpacked, lengths, q1s, skeys, spos, tpacked, gene_start, budget,
    *, width, min_dinuc, max_read_length, pair_cap, vchunk, surv_cap, smax,
    index_aux=None, trows=None, gblock=None, gsteps=0,
):
    """Probe + diagonal-dedup expand/verify in one call (three async
    dispatches).  See probe_windows / expand_verify_dedup for the split
    form the engine uses (exact pair-buffer sizing)."""
    pr = probe_windows(
        rpacked, lengths, q1s, skeys,
        width=width, min_dinuc=min_dinuc, index_aux=index_aux,
    )
    return expand_verify_dedup(
        pr, q1s, rpacked, lengths, spos, tpacked, gene_start, budget,
        width=width, max_read_length=max_read_length,
        pair_cap=pair_cap, vchunk=vchunk, surv_cap=surv_cap, smax=smax,
        trows=trows, gblock=gblock, gsteps=gsteps,
    )
