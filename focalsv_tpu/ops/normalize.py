"""Indel left-alignment (VCF normalization).

Inside tandem repeats an indel's placement is ambiguous; the contig aligner,
the read aligner, and the truth set may each pick a different (equivalent)
position, defeating shift-bounded matching (FP filter max_shift 500, GT
correction, dedup).  Left-aligning both calls and read signatures puts every
equivalent representation at the canonical leftmost position.
"""

from __future__ import annotations

import numpy as np


def left_align_del(ref: np.ndarray, pos: int, length: int,
                   max_shift: int = 10_000) -> int:
    """Leftmost equivalent start of a deletion of ref[pos : pos+length]."""
    p = int(pos)
    lo = max(1, p - max_shift)
    while p > lo and ref[p - 1] == ref[p + length - 1]:
        p -= 1
    return p


def left_align_ins(ref: np.ndarray, pos: int, seq: np.ndarray,
                   max_shift: int = 10_000) -> tuple[int, np.ndarray]:
    """Leftmost equivalent (pos, sequence) of an insertion before ref[pos]."""
    p = int(pos)
    s = np.asarray(seq, np.uint8).copy()
    lo = max(1, p - max_shift)
    n = len(s)
    if n == 0:
        return p, s
    while p > lo and s[n - 1] == ref[p - 1]:
        s = np.concatenate([s[-1:], s[:-1]])
        p -= 1
    return p, s
