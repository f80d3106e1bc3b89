"""Brute-force oracle implementing the matching contract directly.

Written from the behavioral contract (SURVEY.md sections 0.1, 3.2, 3.3), not
from the engine: for every read x gene x diagonal, seed by exact window
k-mer equality and verify by tail Hamming distance with the reference's
budget, fit, and position rules.  O(R*G*L*W) — for fuzz-scale inputs only.
"""

from __future__ import annotations

import numpy as np


def dinuc_count(seq: str) -> int:
    if len(seq) < 2:
        return 0
    code = {"A": 0, "T": 1, "G": 2, "C": 3}
    vals = [code.get(c, 4) for c in seq]
    return len({5 * a + b for a, b in zip(vals[:-1], vals[1:])})


def hamming(a: str, b: str) -> int:
    assert len(a) == len(b)
    return sum(1 for x, y in zip(a, b) if x != y)


def oracle_match(
    reads: list[str],
    genes: list[str],
    windows: list[int],
    width: int,
    pmatch: float,
    min_dinuc: int,
    max_read_length: int,
    mmtol: int,
):
    """Returns the set of retained (read_idx, gene_idx, start, nmiss)."""
    found = set()
    for k, q1 in enumerate(windows):
        q2 = q1 + width
        for ri, read in enumerate(reads):
            rlen = len(read)
            if rlen < q2:
                continue
            if dinuc_count(read[q1:q2]) < min_dinuc:
                continue
            kmer = read[q1:q2]
            for gi, gene in enumerate(genes):
                glen = len(gene)
                for p in range(q1, glen - width + 1):
                    if gene[p : p + width] != kmer:
                        continue
                    s = p - q1
                    srgt_len = rlen - q2
                    if p == 0 and q1 == 0:
                        cap = min(glen, 100 - q2)
                    else:
                        cap = min(glen, p + width + max_read_length - q2)
                    mrgt_len = cap - (p + width)
                    if srgt_len > mrgt_len:
                        continue
                    nx = hamming(read[:q1], gene[s:p]) + hamming(
                        read[q2:rlen], gene[p + width : p + width + srgt_len]
                    )
                    budget = int(
                        (np.float64(1.0) - np.float64(pmatch)) * np.float64(rlen)
                    )
                    if nx > budget:
                        continue
                    found.add((ri, gi, s, nx))

    # Per-read best + MMTol filter over the deduped union.
    best: dict[int, int] = {}
    for ri, gi, s, nx in found:
        if ri not in best or nx < best[ri]:
            best[ri] = nx
    return {
        (ri, gi, s, nx) for (ri, gi, s, nx) in found if nx <= best[ri] + mmtol
    }
