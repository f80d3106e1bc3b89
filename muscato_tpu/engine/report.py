"""Output emission: results.txt, nonmatch fastq, read/gene statistics.

This is the host-side tail of the pipeline, replacing the reference's
sortByGeneId | joinGeneNames | joinReadNames | nonmatch | readstats |
genestats stages (/root/reference/cmd/muscato/main.go:507-676, 981-1003,
94-150).  String formatting and ordering follow the reference contract
byte-for-byte:

  - results.txt rows are "readseq  targetsub  pos  nmiss  gene  genelen
    copies  names" (8 tab-separated columns, README.md:77-94), ordered like
    `LC_ALL=C sort -k1` over the pre-join 6-column lines — whole-line
    lexicographic byte order, so position "10" sorts before "9"
    (verified against tests/data/muscato/03/result_e.txt);
  - the nonmatch fastq lists every unique read sequence absent from the
    results, in read-sorted order, as "names#count / seq / + / '!'*len"
    (cmd/muscato_nonmatch/main.go:95-107) — with *exact* membership where
    the reference uses a Bloom filter that can silently drop reads
    (main.go:52-54; deliberate fidelity upgrade, SURVEY.md section 7.1);
  - <results>_readstats.<ext>: per distinct names-column value in results
    order, "readid<TAB>gene1;gene2;...;" — gene sets are emitted in sorted
    order where the reference iterates a Go map in random order
    (cmd/muscato_readstats/main.go:74-85; deterministic here);
  - <results>_genestats.<ext>: "gene<TAB>count<TAB>" per gene, grouped in
    the order of `sort -k5` over results (cmd/muscato_genestats/main.go:33-55).
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from ..io.reads import ReadSet
from ..io.seqcodec import decode
from ..io.targets import TargetSet
from .pipeline import MatchResult


def results_lines(mr: MatchResult, rs: ReadSet, ts: TargetSet) -> List[bytes]:
    """The final 8-column rows, in results.txt order."""
    gene_start = ts.gene_start
    six_cols: List[bytes] = []
    suffix: List[bytes] = []
    for i in range(len(mr.read_row)):
        r = int(mr.read_row[i])
        g = int(mr.gene[i])
        s = int(mr.start[i])
        nx = int(mr.nmiss[i])
        rseq = rs.seqs[r]
        tsub = decode(ts.tcat[gene_start[g] + s : gene_start[g] + s + len(rseq)])
        six_cols.append(
            b"%s\t%s\t%d\t%d\t%s\t%d" % (rseq, tsub, s, nx, ts.names[g], int(ts.lengths[g]))
        )
        suffix.append(b"\t%d\t%s" % (int(rs.counts[r]), rs.names[r]))
    order = sorted(range(len(six_cols)), key=lambda i: six_cols[i])
    return [six_cols[i] + suffix[i] for i in order]


def write_results(path: str, mr: MatchResult, rs: ReadSet, ts: TargetSet) -> List[bytes]:
    lines = results_lines(mr, rs, ts)
    with open(path, "wb") as f:
        for ln in lines:
            f.write(ln + b"\n")
    return lines


def nonmatch_path(results_path: str) -> str:
    """Derive the nonmatch fastq name exactly like the reference
    (cmd/muscato_nonmatch/main.go:66-71): split the basename on '.',
    replace the last token with 'nonmatch', and append '<oldext>.fastq'."""
    d, b = os.path.split(results_path)
    c = b.split(".")
    last = c[-1]
    c[-1] = "nonmatch"
    c.append(last + ".fastq")
    return os.path.join(d, ".".join(c))


def write_nonmatch(results_path: str, mr: MatchResult, rs: ReadSet) -> str:
    matched = np.zeros(len(rs.seqs), dtype=bool)
    if len(mr.read_row):
        matched[np.unique(mr.read_row)] = True
    out = nonmatch_path(results_path)
    with open(out, "wb") as f:
        for i in range(len(rs.seqs)):
            if matched[i]:
                continue
            f.write(
                b"%s#%d\n%s\n+\n%s\n"
                % (rs.names[i], int(rs.counts[i]), rs.seqs[i], b"!" * len(rs.seqs[i]))
            )
    return out


def _stats_path(results_path: str, tag: str) -> str:
    """<results>_<tag>.<ext> naming (cmd/muscato_readstats/main.go:52-59)."""
    root, ext = os.path.splitext(results_path)
    if ext:
        return root + "_" + tag + ext
    return results_path + "_" + tag


def write_readstats(results_path: str, lines: List[bytes]) -> str:
    """Group results rows by the names column (field 7), in results order;
    emit the distinct gene set per group."""
    out = _stats_path(results_path, "readstats")
    with open(out, "wb") as f:
        cur = None
        genes: List[bytes] = []
        seen = set()

        def flush():
            if cur is None:
                return
            f.write(cur + b"\t" + b"".join(g + b";" for g in sorted(seen)) + b"\n")

        for ln in lines:
            fields = ln.split(b"\t")
            name, gene = fields[7], fields[4]
            if cur is None or name != cur:
                flush()
                cur = name
                seen = set()
            seen.add(gene)
        flush()
        if not lines:
            # Degenerate empty-results row, as the reference emits
            # (cmd/muscato_readstats/main.go:109-114 writes the final
            # group unconditionally).
            f.write(b"\t\n")
    return out


def write_genestats(results_path: str, lines: List[bytes]) -> str:
    """Per-gene row counts over results sorted by `sort -k5`
    (field 5 through end of line, /root/reference/cmd/muscato/main.go:103-108)."""
    out = _stats_path(results_path, "genestats")

    def k5(ln: bytes) -> bytes:
        return b"\t".join(ln.split(b"\t")[4:])

    with open(out, "wb") as f:
        ordered = sorted(lines, key=k5)
        cur = None
        n = 0
        for ln in ordered:
            gene = ln.split(b"\t")[4]
            if cur is None or gene != cur:
                if cur is not None:
                    f.write(b"%s\t%d\t\n" % (cur, n))
                cur = gene
                n = 0
            n += 1
        if cur is not None:
            f.write(b"%s\t%d\t\n" % (cur, n))
        else:
            f.write(b"\t0\t\n")
    return out
