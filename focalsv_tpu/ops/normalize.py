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


def left_align_ins_approx(ref: np.ndarray, pos: int, seq: np.ndarray,
                          max_shift: int = 10_000,
                          min_dup_sim: float = 0.7) -> tuple[int, np.ndarray]:
    """Noise-tolerant left-alignment for duplication-type insertions.

    The exact rotation (left_align_ins) stops at the FIRST base where the
    inserted sequence disagrees with the upstream reference -- one
    residual consensus error in a noisy-read contig strands a tandem-array
    expansion mid-array, hundreds of bases from the canonical position
    every other representation (truth, read signatures, the other
    haplotype) reaches, and shift-bounded matching then breaks.

    When the insertion is a near-copy of the adjacent reference (edit
    similarity >= min_dup_sim -- the tandem-expansion signature), its
    equivalent placements are exactly the positions where the REFERENCE
    is locally len(seq)-periodic, so the walk can continue on ref-only
    comparisons, which the sequencing noise cannot touch.  Reduces to
    left_align_ins for clean sequences (the exact rotation already
    reaches the array start) and leaves non-duplication insertions
    untouched.  The returned sequence is rotated THROUGH THE REFERENCE
    for the approx-shifted span (X' = ref[p_new:p_old] + X[:n-k], the
    exact-equivalence rotation under the duplication assumption), so the
    (POS, ALT) pair stays a self-consistent representation at the
    canonical position.
    """
    p, s = left_align_ins(ref, pos, seq, max_shift)
    n = len(s)
    a = p - n
    if n == 0 or a < 0 or p + n > len(ref):
        return p, s
    from focalsv_tpu.ops.align import edit_similarity
    if edit_similarity(s, ref[a:p]) < min_dup_sim:
        return p, s
    lo = max(1, p - max_shift)
    p0 = p
    while p > lo and ref[p - 1] == ref[p + n - 1]:
        p -= 1
    k = p0 - p
    if k:
        s = (np.concatenate([ref[p:p0], s[: n - k]]).astype(np.uint8)
             if k < n else np.asarray(ref[p : p + n], np.uint8).copy())
    return p, s
