"""Read (fastq) ingestion, dedup, and counting — vectorized host path.

Fuses the reference's prep_reads | sort | uniqify pipeline
(/root/reference/cmd/muscato/main.go:152-221) into one host pass:

  - fastq is parsed 4 lines per record; the name is line 0 *verbatim*
    (including any leading '>' or '@') and the sequence is line 1
    (/root/reference/utils/fastq.go:36-56);
  - reads shorter than MinReadLength are skipped (length test happens on the
    original, untruncated sequence), reads are truncated at MaxReadLength,
    and non-ACGT letters become X
    (/root/reference/cmd/muscato_prep_reads/main.go:55-70);
  - names longer than 1000 chars become name[:995] + "..."
    (prep_reads main.go:74-79: maxNameLen-5 with maxNameLen=1000);
  - records are ordered like `LC_ALL=C sort` on "seq<TAB>name" lines, equal
    sequences are collapsed, and the surviving row carries the copy count
    and the ";"-joined names in that sort order; a joined name string longer
    than 1000 chars becomes joined[:996] + "..."
    (/root/reference/cmd/muscato_uniqify/main.go:89-111).

Unlike the round-1 implementation (a per-record Python loop building lists
of bytes objects), everything here is numpy over the raw file buffer:
line offsets come from one vectorized newline scan, sequence encoding is a
chunked 2-D gather through the subx lookup table, the dedup sort runs over
fixed-width void rows, and the ";"-joined names are assembled with one
vectorized ranged copy.  Python-level work is proportional to the number
of *duplicated* or *over-long* names only, so a 10M-read fastq preps in
seconds, and resident memory is the (R, MaxReadLength) code matrix plus
the name blob — never per-record Python objects.

The result is a ReadSet: a dense (R, MaxReadLength) uint8 code matrix in
read-sorted order plus lengths, copy counts, and display names — the array
analogue of reads_sorted.txt.sz.  Names are stored as one byte blob with
offsets; the `names` / `seqs` list views exist for small-scale callers and
tests and are materialized lazily.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from . import native, seqcodec, sz
from .blob import decode_rows_blob, encode_rows_matrix, gather_ranges, ranged_copy

_MAX_NAME = 1000
ENCODE_CHUNK = 1 << 20  # reads encoded per gather chunk


def _map_bytes(path: str) -> np.ndarray:
    """File bytes as a uint8 array WITHOUT holding the raw text resident:
    plain files are mmap'd (the OS pages them through cache), compressed
    files are decoded once into an unlinked disk-backed temp file and
    mmap'd from there.  At reference scale the raw fastq is the largest
    single buffer (25GB at 100M reads x 100bp); the encode/name passes
    stream through it, so paging it beats pinning it."""
    import mmap
    import tempfile

    lower = path.lower()
    if lower.endswith((".sz", ".gz")):
        data = sz.read_bytes(path)
        tmp = tempfile.TemporaryFile(
            dir=os.environ.get("MUSCATO_SPILL_DIR") or None
        )
        tmp.write(data)
        del data
        tmp.flush()
        f = tmp
    else:
        f = open(path, "rb")
    try:
        size = os.fstat(f.fileno()).st_size
        if size == 0:
            return np.zeros(0, np.uint8)
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        return np.frombuffer(mm, dtype=np.uint8)
    finally:
        f.close()  # the mapping keeps the pages alive


class ReadSet:
    """Unique reads in C-locale sort order, with copy counts and names.

    Canonical storage is numpy: codes/lengths/counts plus a name blob with
    (R+1,) offsets.  `names` and `seqs` are lazily materialized list views
    kept for small-scale callers; large-scale paths (report emission) use
    the blob directly.
    """

    def __init__(
        self,
        codes: np.ndarray,
        lengths: np.ndarray,
        counts: np.ndarray,
        names: List[bytes] | None = None,
        seqs: List[bytes] | None = None,
        num_total: int = 0,
        name_blob: np.ndarray | None = None,
        name_off: np.ndarray | None = None,
    ):
        self.codes = codes
        self.lengths = lengths
        self.counts = counts
        self.num_total = num_total
        if name_blob is not None:
            self.name_blob = name_blob
            self.name_off = name_off
            self._names = None
        else:
            names = names if names is not None else []
            self._names = list(names)
            if names:
                self.name_blob = np.frombuffer(b"".join(names), dtype=np.uint8)
                self.name_off = np.concatenate(
                    [[0], np.cumsum([len(n) for n in names], dtype=np.int64)]
                )
            else:
                self.name_blob = np.zeros(0, np.uint8)
                self.name_off = np.zeros(1, np.int64)
        self._seqs = list(seqs) if seqs is not None else None

    @property
    def names(self) -> List[bytes]:
        if self._names is None:
            blob = self.name_blob.tobytes()
            off = self.name_off
            self._names = [
                blob[off[i] : off[i + 1]] for i in range(len(off) - 1)
            ]
        return self._names

    @property
    def seqs(self) -> List[bytes]:
        if self._seqs is None:
            self._seqs = [
                seqcodec.decode(self.codes[i, : self.lengths[i]])
                for i in range(self.codes.shape[0])
            ]
        return self._seqs

    def name(self, i: int) -> bytes:
        if self._names is not None:
            return self._names[i]
        return self.name_blob[self.name_off[i] : self.name_off[i + 1]].tobytes()

    def seq(self, i: int) -> bytes:
        if self._seqs is not None:
            return self._seqs[i]
        return seqcodec.decode(self.codes[i, : self.lengths[i]])

    @property
    def num_unique(self) -> int:
        return self.codes.shape[0]


_gather_ranges = gather_ranges  # shared primitive (io.blob)


def _line_bounds(buf: np.ndarray):
    """(starts, ends) of every newline-terminated line in buf; a trailing
    chunk without '\\n' is treated as a final line (the reference's scanner
    yields it too).  Uses the native memchr scanner when available."""
    starts = native.line_offsets_native(buf)
    if starts is not None and len(buf):
        ends = np.empty(len(starts), np.int64)
        ends[:-1] = starts[1:] - 1
        ends[-1] = len(buf) - (1 if buf[-1] == 10 else 0)
        return starts, ends
    nl = np.flatnonzero(buf == 10)
    if len(buf) and (len(nl) == 0 or nl[-1] != len(buf) - 1):
        nl = np.append(nl, len(buf))
    starts = np.concatenate([[0], nl[:-1] + 1]).astype(np.int64)
    return starts, nl.astype(np.int64)


def build_readset(
    read_file: str,
    min_read_length: int,
    max_read_length: int,
) -> ReadSet:
    buf = _map_bytes(read_file)
    line_s, line_e = _line_bounds(buf)
    nrec = len(line_s) // 4
    if nrec == 0:
        return ReadSet(
            codes=np.zeros((0, max_read_length), np.uint8),
            lengths=np.zeros(0, np.int32),
            counts=np.zeros(0, np.int64),
            names=[],
            num_total=0,
        )

    name_s = line_s[0::4][:nrec]
    name_e = line_e[0::4][:nrec]
    seq_s = line_s[1::4][:nrec]
    seq_e = line_e[1::4][:nrec]
    seq_len = (seq_e - seq_s).astype(np.int64)

    keep = seq_len >= min_read_length
    name_s, name_e = name_s[keep], name_e[keep]
    seq_s = seq_s[keep]
    lens = np.minimum(seq_len[keep], max_read_length).astype(np.int32)
    n = len(seq_s)
    if n == 0:
        return ReadSet(
            codes=np.zeros((0, max_read_length), np.uint8),
            lengths=np.zeros(0, np.int32),
            counts=np.zeros(0, np.int64),
            names=[],
            num_total=0,
        )

    # Host matrix width: the longest kept read, rounded up to a word (the
    # device batch path re-trims anyway; carrying MaxReadLength columns
    # for shorter reads doubled every host pass below at the default
    # MaxReadLength=2x bench read length).  Identical across multi-host
    # processes because every process scans the full read file.
    w = min(max_read_length, max(8, -(-int(lens.max()) // 8) * 8))

    # "sortable" rows: code+1 inside the read, 0 beyond — void-row order
    # then equals `LC_ALL=C sort` order of the sequences (pad sorts before
    # every base, so a prefix sorts first, exactly like the '\t' delimiter
    # in the reference's "seq\tname" lines).
    sortable = np.empty((n, w), dtype=np.uint8)
    encode_rows_matrix(
        buf, seq_s, lens, w, seqcodec._B2C + np.uint8(1), 0,
        sortable,
    )

    order = np.argsort(
        np.ascontiguousarray(sortable).view(f"V{w}").ravel(),
        kind="stable",
    )
    srt = np.empty_like(sortable)
    perm = np.ascontiguousarray(order, dtype=np.int64)
    if not native.permute_rows_native(sortable, perm, srt):
        srt = sortable[order]
    boundary = np.empty(n, dtype=bool)
    if not native.rows_differ_native(srt, boundary.view(np.uint8)):
        boundary[0] = True
        np.any(srt[1:] != srt[:-1], axis=1, out=boundary[1:])
    starts_u = np.flatnonzero(boundary)
    counts_u = np.diff(np.append(starts_u, n)).astype(np.int64)
    group_of = np.cumsum(boundary) - 1  # per sorted row

    # Within equal-sequence groups the reference's sort orders by name;
    # reorder only the duplicated rows (Python work ∝ duplicates).
    order = _order_names_within_groups(
        order, starts_u, counts_u, buf, name_s, name_e
    )

    ucodes = srt[starts_u]
    np.subtract(ucodes, 1, out=ucodes, where=ucodes > 0)
    ulens = lens[order[starts_u]]

    name_blob, name_off = _join_group_names(
        buf, name_s[order], name_e[order], group_of
    )

    return ReadSet(
        codes=ucodes,
        lengths=ulens.astype(np.int32),
        counts=counts_u,
        name_blob=name_blob,
        name_off=name_off,
        num_total=n,
    )


def _order_names_within_groups(order, starts_u, counts_u, buf, name_s, name_e):
    """Stable-reorder rows of each multi-member group by name bytes."""
    multi = np.flatnonzero(counts_u > 1)
    if len(multi) == 0:
        return order
    new_order = order.copy()
    for gi in multi:
        a = starts_u[gi]
        b = a + counts_u[gi]
        rows = order[a:b]
        keys = [buf[name_s[r] : name_e[r]].tobytes() for r in rows]
        new_order[a:b] = rows[np.argsort(np.array(keys, dtype=object), kind="stable")]
    return new_order


def _join_group_names(buf, name_s, name_e, group_of):
    """';'-join the (already group-sorted) names of each group, truncating
    names > 1000 chars to name[:995]+'...' and joined strings > 1000 chars
    to joined[:996]+'...' (prep_reads main.go:74-79, uniqify main.go:89-93).
    One vectorized ranged copy; Python work only for the rare over-long
    strings."""
    nlen = (name_e - name_s).astype(np.int64)
    # Per-name truncation (rare): handled by copying the 995-byte prefix and
    # patching "..." afterwards.
    tlen = np.minimum(nlen, _MAX_NAME)
    trunc = nlen > _MAX_NAME
    tlen[trunc] = _MAX_NAME - 5 + 3  # 995 bytes + "..."

    ngroups = int(group_of[-1]) + 1 if len(group_of) else 0
    first = np.concatenate([[True], group_of[1:] != group_of[:-1]])
    # layout: name bytes plus one ';' separator before every non-first member
    piece = tlen + (~first).astype(np.int64)
    out_end = np.cumsum(piece)
    out_start = out_end - tlen  # the name lands after its separator
    total = int(out_end[-1]) if len(out_end) else 0

    blob = np.zeros(total, np.uint8)
    blob[out_start[~first] - 1] = ord(";")
    copy_len = np.minimum(tlen, np.where(trunc, _MAX_NAME - 5, nlen))
    ranged_copy(blob, out_start, buf, name_s, copy_len)
    for i in np.flatnonzero(trunc):  # patch '...' on truncated names
        blob[out_start[i] + _MAX_NAME - 5 : out_start[i] + _MAX_NAME - 2] = np.frombuffer(
            b"...", np.uint8
        )

    goff = np.zeros(ngroups + 1, np.int64)
    goff[1:] = out_end[np.concatenate([first[1:], [True]]).nonzero()[0]]

    # Joined-name truncation per group (uniqify main.go:89-93).
    glen = np.diff(goff)
    long = np.flatnonzero(glen > _MAX_NAME)
    if len(long):
        keep_len = np.where(glen > _MAX_NAME, _MAX_NAME - 4, glen)
        new_len = np.where(glen > _MAX_NAME, _MAX_NAME - 4 + 3, glen)
        new_off = np.zeros(ngroups + 1, np.int64)
        new_off[1:] = np.cumsum(new_len)
        nblob = np.zeros(int(new_off[-1]), np.uint8)
        ranged_copy(nblob, new_off[:-1], blob, goff[:-1], keep_len)
        dots = np.frombuffer(b"...", np.uint8)
        for gi in long:
            a = new_off[gi] + _MAX_NAME - 4
            nblob[a : a + 3] = dots
        blob, goff = nblob, new_off
    return blob, goff


def write_reads_sorted(rs: ReadSet, path: str) -> None:
    """Persist the reads_sorted.txt.sz equivalent (seq \\t count \\t names),
    assembled with vectorized ranged copies (no per-read Python loop)."""
    n = rs.num_unique
    if n == 0:
        sz.write_bytes(path, b"")
        return
    counts_b = rs.counts.astype("S20")
    clen = np.char.str_len(counts_b).astype(np.int64)
    slen = rs.lengths.astype(np.int64)
    nlen = np.diff(rs.name_off)
    row_len = slen + 1 + clen + 1 + nlen + 1
    out_end = np.cumsum(row_len)
    out_start = out_end - row_len
    blob = np.zeros(int(out_end[-1]), np.uint8)

    # sequence bytes (decode codes straight into the output blob)
    decode_rows_blob(
        blob, out_start, rs.codes, rs.codes.shape[1],
        np.arange(n, dtype=np.int64), slen, seqcodec._C2B,
    )
    blob[out_start + slen] = ord("\t")
    # counts (fixed-width S20 buffer, actual decimal length clen)
    cbuf = np.frombuffer(counts_b.tobytes(), np.uint8)
    ranged_copy(blob, out_start + slen + 1, cbuf,
                np.arange(n, dtype=np.int64) * 20, clen)
    blob[out_start + slen + 1 + clen] = ord("\t")
    # names
    ranged_copy(blob, out_start + slen + 2 + clen,
                rs.name_blob, rs.name_off[:-1], nlen)
    blob[out_end - 1] = ord("\n")
    sz.write_bytes(path, blob.tobytes())
