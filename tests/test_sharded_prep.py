"""Range-sharded multi-host read prep (io.reads build_readset_range /
merge_local_readsets): per-range parsing + local dedup + merge must be
byte-identical to the single-host build_readset on the same file, for any
byte-range split — including splits landing mid-line and mid-record.

The collective wrapper (parallel/dist.build_readset_multihost) is the
same code driven over process_allgather; the true 2-process path is
exercised by tests/test_multihost.py's worker.
"""

import numpy as np
import pytest

from muscato_tpu.io import reads as reads_io


def _mk_fastq(tmp_path, records, trailing_newline=True):
    lines = []
    for name, seq in records:
        lines += [name, seq, "+", "I" * len(seq)]
    text = "\n".join(lines)
    if trailing_newline:
        text += "\n"
    p = tmp_path / "reads.fastq"
    p.write_bytes(text.encode())
    return str(p)


def _build_sharded(path, min_len, max_len, nproc):
    buf = reads_io._map_bytes(path)
    size = len(buf)
    bounds = [i * size // nproc for i in range(nproc + 1)]
    counts = [
        reads_io.count_lines_range(buf, bounds[p], bounds[p + 1])
        for p in range(nproc)
    ]
    parts = []
    owned = []
    for p in range(nproc):
        first_line = sum(counts[:p])
        lr = reads_io.build_readset_range(
            buf, min_len, max_len, bounds[p], bounds[p + 1], first_line
        )
        parts.append(lr)
        owned.append(lr.num_total)
    return reads_io.merge_local_readsets(parts, max_len), owned


def _assert_readsets_equal(a, b):
    np.testing.assert_array_equal(a.codes, b.codes)
    np.testing.assert_array_equal(a.lengths, b.lengths)
    np.testing.assert_array_equal(a.counts, b.counts)
    np.testing.assert_array_equal(a.name_blob, b.name_blob)
    np.testing.assert_array_equal(a.name_off, b.name_off)
    assert a.num_total == b.num_total


@pytest.mark.parametrize("nproc", [1, 2, 3, 5, 8])
def test_sharded_prep_equals_full(tmp_path, nproc):
    rng = np.random.default_rng(7)
    records = []
    seq_pool = [
        "".join("ACGT"[i] for i in rng.integers(0, 4, rng.integers(6, 30)))
        for _ in range(12)
    ]
    for i in range(60):
        # Duplicates on purpose: names must merge in global sorted order.
        seq = seq_pool[int(rng.integers(len(seq_pool)))]
        records.append((f"@r{rng.integers(1000):04d}_{i}", seq))
    path = _mk_fastq(tmp_path, records)
    full = reads_io.build_readset(path, 0, 40)
    sharded, owned = _build_sharded(path, 0, 40, nproc)
    _assert_readsets_equal(full, sharded)
    assert sum(owned) == full.num_total
    if nproc > 1:
        assert max(owned) < full.num_total, "ranges must split the records"


def test_sharded_prep_min_length_and_truncation(tmp_path):
    records = [
        ("@tiny", "ACG"),  # dropped by MinReadLength=5
        ("@" + "n" * 1200, "ACGTACGTAA"),  # name truncated to 995+...
        ("@a", "ACGTACGTAA"),  # duplicate seq: names join sorted
        ("@b", "ACGTACGTACGTACGTACGT"),  # truncated read at max_len=12
    ]
    # A group whose joined names exceed 1000 bytes (joined truncation).
    for i in range(30):
        records.append((f"@dup{i:02d}_" + "x" * 50, "TTTTCCCCGGGG"))
    path = _mk_fastq(tmp_path, records)
    full = reads_io.build_readset(path, 5, 12)
    sharded, _ = _build_sharded(path, 5, 12, 4)
    _assert_readsets_equal(full, sharded)


def test_sharded_prep_no_trailing_newline(tmp_path):
    records = [("@a", "ACGTAC"), ("@b", "GGGTTT"), ("@c", "ACGTAC")]
    path = _mk_fastq(tmp_path, records, trailing_newline=False)
    full = reads_io.build_readset(path, 0, 20)
    for nproc in (2, 3):
        sharded, _ = _build_sharded(path, 0, 20, nproc)
        _assert_readsets_equal(full, sharded)


def test_sharded_prep_empty_and_single_record(tmp_path):
    p = tmp_path / "empty.fastq"
    p.write_bytes(b"")
    full = reads_io.build_readset(str(p), 0, 20)
    sharded, _ = _build_sharded(str(p), 0, 20, 2)
    assert sharded.num_unique == full.num_unique == 0

    path = _mk_fastq(tmp_path, [("@only", "ACGTACGT")])
    full = reads_io.build_readset(path, 0, 20)
    sharded, _ = _build_sharded(path, 0, 20, 4)
    _assert_readsets_equal(full, sharded)


def test_sharded_prep_names_with_semicolons_and_dup_names(tmp_path):
    # Names containing ';' must never be mis-split; equal names keep
    # file order (stable).
    records = [
        ("@x;y;z", "ACGTACGTAA"),
        ("@same", "ACGTACGTAA"),
        ("@same", "ACGTACGTAA"),
        ("@w", "CCCCCCCCCC"),
    ]
    path = _mk_fastq(tmp_path, records)
    full = reads_io.build_readset(path, 0, 20)
    sharded, _ = _build_sharded(path, 0, 20, 3)
    _assert_readsets_equal(full, sharded)


def test_more_processes_than_bytes(tmp_path):
    """Empty byte ranges (file smaller than process count) must own ZERO
    lines: the line-0 bonus applies only to a range that actually
    contains byte 0, so no record is double-parsed (code-review round-3
    finding)."""
    path = _mk_fastq(tmp_path, [("@r0", "ACGTACGTAC")])
    buf = reads_io._map_bytes(path)
    size = len(buf)
    nproc = size + 3  # several leading ranges are empty [0, 0)
    bounds = [i * size // nproc for i in range(nproc + 1)]
    counts = [
        reads_io.count_lines_range(buf, bounds[p], bounds[p + 1])
        for p in range(nproc)
    ]
    assert sum(counts) == 4  # exactly the file's line count, once
    assert reads_io.count_lines_range(buf, 0, 0) == 0
    assert len(reads_io._range_line_starts(buf, 0, 0)) == 0
    full = reads_io.build_readset(path, 1, 20)
    merged, _ = _build_sharded(path, 1, 20, nproc)
    _assert_readsets_equal(full, merged)
