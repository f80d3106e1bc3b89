"""Bounded-memory single-host read prep (io.reads.build_readset_chunked):
chunked scan + per-chunk local dedup + streaming k-way merge of spilled
sorted runs must be byte-identical to the one-pass build_readset, for any
chunk size — including chunk sizes that split duplicate groups across
many runs.  The reference analogue is prep_reads streaming through the
external `sort -S 50%` (/root/reference/cmd/muscato_prep_reads/main.go:46-92,
cmd/muscato/main.go:181-189).
"""

import numpy as np
import pytest

from muscato_tpu.io import reads as reads_io
from test_sharded_prep import _assert_readsets_equal, _mk_fastq


@pytest.mark.parametrize("chunk", [1, 2, 3, 7, 16, 64, 1000])
def test_chunked_prep_equals_full(tmp_path, chunk):
    rng = np.random.default_rng(11)
    seq_pool = [
        "".join("ACGT"[i] for i in rng.integers(0, 4, rng.integers(6, 30)))
        for _ in range(10)
    ]
    records = []
    for i in range(75):
        seq = seq_pool[int(rng.integers(len(seq_pool)))]
        records.append((f"@r{rng.integers(1000):04d}_{i}", seq))
    path = _mk_fastq(tmp_path, records)
    full = reads_io.build_readset(path, 0, 40)
    chunked = reads_io.build_readset_chunked(path, 0, 40, chunk)
    _assert_readsets_equal(full, chunked)


def test_chunked_prep_tiny_merge_block(tmp_path, monkeypatch):
    """Force many merge iterations: block smaller than the duplicate
    groups, so groups and runs interleave across pull boundaries."""
    monkeypatch.setattr(reads_io, "_merge_block_rows", lambda nruns: 4)
    rng = np.random.default_rng(3)
    seq_pool = [
        "".join("ACGT"[i] for i in rng.integers(0, 4, 12)) for _ in range(6)
    ]
    records = [
        (f"@n{i:03d}", seq_pool[int(rng.integers(len(seq_pool)))])
        for i in range(40)
    ]
    path = _mk_fastq(tmp_path, records)
    full = reads_io.build_readset(path, 0, 20)
    chunked = reads_io.build_readset_chunked(path, 0, 20, 5)
    _assert_readsets_equal(full, chunked)


def test_chunked_prep_truncation_and_filters(tmp_path):
    records = [
        ("@tiny", "ACG"),  # dropped by MinReadLength=5
        ("@" + "n" * 1200, "ACGTACGTAA"),  # name truncated to 995+...
        ("@a", "ACGTACGTAA"),  # duplicate: names join sorted
        ("@b", "ACGTACGTACGTACGTACGT"),  # read truncated at max_len=12
    ]
    for i in range(30):  # joined-name truncation past 1000 bytes
        records.append((f"@dup{i:02d}_" + "x" * 50, "TTTTCCCCGGGG"))
    path = _mk_fastq(tmp_path, records)
    full = reads_io.build_readset(path, 5, 12)
    for chunk in (2, 9, 33):
        chunked = reads_io.build_readset_chunked(path, 5, 12, chunk)
        _assert_readsets_equal(full, chunked)


def test_chunked_prep_no_trailing_newline_and_empty(tmp_path):
    records = [("@a", "ACGTAC"), ("@b", "GGGTTT"), ("@c", "ACGTAC")]
    path = _mk_fastq(tmp_path, records, trailing_newline=False)
    full = reads_io.build_readset(path, 0, 20)
    for chunk in (1, 2, 10):
        chunked = reads_io.build_readset_chunked(path, 0, 20, chunk)
        _assert_readsets_equal(full, chunked)

    p = tmp_path / "empty.fastq"
    p.write_bytes(b"")
    chunked = reads_io.build_readset_chunked(str(p), 0, 20, 4)
    assert chunked.num_unique == 0 and chunked.num_total == 0


def test_chunked_prep_memmap_backing_feeds_engine(tmp_path):
    """The chunked ReadSet's arrays are disk-backed; the device batch
    staging path must accept them unchanged."""
    rng = np.random.default_rng(5)
    records = [
        ("@q%02d" % i,
         "".join("ACGT"[j] for j in rng.integers(0, 4, 24)))
        for i in range(20)
    ]
    path = _mk_fastq(tmp_path, records)
    rs = reads_io.build_readset_chunked(path, 0, 40, 6)
    assert isinstance(rs.codes, np.memmap) or rs.codes.size == 0
    from muscato_tpu.engine import pipeline

    out = pipeline._device_read_batch(rs, 0, 16, rs.codes.shape[1], False)
    assert out[0].shape[0] > 0
