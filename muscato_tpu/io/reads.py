"""Read (fastq) ingestion, dedup, and counting.

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

The result is a ReadSet: a dense (R, MaxReadLength) uint8 code matrix in
read-sorted order plus lengths, copy counts, and display names — the array
analogue of reads_sorted.txt.sz.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np

from . import seqcodec, sz

_MAX_NAME = 1000


@dataclass
class ReadSet:
    codes: np.ndarray  # (R, Lmax) uint8, padded with 0 beyond length
    lengths: np.ndarray  # (R,) int32
    counts: np.ndarray  # (R,) int64 copy counts
    names: List[bytes] = field(default_factory=list)  # ";"-joined, truncated
    seqs: List[bytes] = field(default_factory=list)  # unique read strings
    num_total: int = 0  # pre-dedup record count (post length filter)

    @property
    def num_unique(self) -> int:
        return len(self.seqs)


def parse_fastq(data: bytes) -> List[Tuple[bytes, bytes]]:
    """Return (name, seq) pairs from 4-line fastq records.

    A trailing partial record (fewer than 4 lines) is dropped, matching the
    reference reader which requires all 4 lines (utils/fastq.go:36-46).
    """
    lines = data.split(b"\n")
    if lines and lines[-1] == b"":
        lines.pop()
    out = []
    nrec = len(lines) // 4
    for i in range(nrec):
        out.append((lines[4 * i], lines[4 * i + 1]))
    return out


def build_readset(
    read_file: str,
    min_read_length: int,
    max_read_length: int,
) -> ReadSet:
    records = parse_fastq(sz.read_bytes(read_file))

    pairs: List[Tuple[bytes, bytes]] = []  # (processed seq, processed name)
    for name, seq in records:
        if len(seq) < min_read_length:
            continue
        pseq = seqcodec.subx_bytes(seq[:max_read_length])
        pname = name
        if len(pname) > _MAX_NAME:
            pname = pname[: _MAX_NAME - 5] + b"..."
        pairs.append((pseq, pname))

    # Order identical to `LC_ALL=C sort` of "seq\tname" lines: byte order
    # groups by sequence first ('\t' < every sequence letter), then by
    # name.  The heavy sequence sort runs in numpy (fixed-width byte rows,
    # NUL padding preserves C-locale prefix ordering); names are ordered
    # within each (typically tiny) equal-sequence group.
    seqs: List[bytes] = []
    counts: List[int] = []
    names: List[bytes] = []
    if pairs:
        seq_arr = np.array([p[0] for p in pairs], dtype=bytes)
        order = np.argsort(seq_arr, kind="stable")
        sorted_seqs = seq_arr[order]
        boundary = np.empty(len(order), dtype=bool)
        boundary[0] = True
        np.not_equal(sorted_seqs[1:], sorted_seqs[:-1], out=boundary[1:])
        starts = np.flatnonzero(boundary)
        ends = np.append(starts[1:], len(order))
        for a, b in zip(starts, ends):
            group = sorted(pairs[i][1] for i in order[a:b])
            seqs.append(pairs[order[a]][0])
            counts.append(b - a)
            names.append(_join_names(group))

    codes, lengths = seqcodec.encode_rows(seqs, max_read_length)
    return ReadSet(
        codes=codes,
        lengths=lengths,
        counts=np.asarray(counts, dtype=np.int64),
        names=names,
        seqs=seqs,
        num_total=len(pairs),
    )


def _join_names(names: List[bytes]) -> bytes:
    na = b";".join(names)
    if len(na) > _MAX_NAME:
        na = na[:996] + b"..."
    return na


def write_reads_sorted(rs: ReadSet, path: str) -> None:
    """Persist the reads_sorted.txt.sz equivalent (seq \\t count \\t names)."""
    out = bytearray()
    for i, s in enumerate(rs.seqs):
        out += s + b"\t%d\t" % int(rs.counts[i]) + rs.names[i] + b"\n"
    sz.write_bytes(path, bytes(out))
