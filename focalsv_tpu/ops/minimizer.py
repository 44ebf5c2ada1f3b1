"""Minimizer sketching and reference indexing (seed stage of the aligner).

Replaces minimap2's index/seed stage (reference invokes minimap2 for
contig->ref alignment, `Dippav/DipPAV_variant_call.py:103`, whole-genome
complex-SV mapping `call_DUP_from_contigs.py:114-126`, and INS-seq remap
`align_ins2ref.py:64-71`) and hifiasm's sketch.cpp for overlap seeding.

(w,k)-minimizers over canonical 2-bit packed k-mers with an invertible
avalanche hash; the index is a sorted (hash, pos, strand) table queried by
binary search -- O(log n) lookups, array-friendly, no hash-table pointers.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from focalsv_tpu.ops import encode as enc


def _hash64(x: np.ndarray) -> np.ndarray:
    """Invertible avalanche hash (splitmix-style finalizer) on int64."""
    x = x.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return x


def kmer_hashes(codes: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Canonical k-mer hashes.

    Returns (hash uint64 (n,), strand uint8 (n,), valid bool (n,)) where
    strand=1 means the reverse complement is the canonical form.
    """
    fwd, valid = enc.kmer_codes_valid(codes, k)
    rc_codes = enc.revcomp(codes)
    rev_all, _ = enc.kmer_codes_valid(rc_codes, k)
    # k-mer starting at i on fwd corresponds to rc k-mer starting at L-k-i
    rev = rev_all[::-1] if len(rev_all) else rev_all
    hf = _hash64(fwd)
    hr = _hash64(rev)
    strand = (hr < hf).astype(np.uint8)
    h = np.where(strand == 1, hr, hf)
    # palindromic k-mers (hf==hr) are ambiguous; drop them like minimap2
    valid = valid & (hf != hr)
    return h, strand, valid


def minimizers(codes: np.ndarray, k: int, w: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(w,k)-minimizer sampling.

    Returns (pos int32, hash uint64, strand uint8) of window minima,
    deduplicated, positions are k-mer start offsets.
    """
    h, strand, valid = kmer_hashes(codes, k)
    n = len(h)
    if n < w:
        if n == 0:
            return (np.zeros(0, np.int32), np.zeros(0, np.uint64), np.zeros(0, np.uint8))
        idx = np.array([np.argmin(np.where(valid, h, np.uint64(2**64 - 1)))])
        idx = idx[valid[idx]]
        return idx.astype(np.int32), h[idx], strand[idx]
    hm = np.where(valid, h, np.uint64(2**64 - 1))
    # sliding window argmin via stride tricks
    win = np.lib.stride_tricks.sliding_window_view(hm, w)
    amin = win.argmin(axis=1) + np.arange(n - w + 1)
    idx = np.unique(amin)
    keep = valid[idx]
    idx = idx[keep]
    return idx.astype(np.int32), h[idx], strand[idx]


@dataclass
class MinimizerIndex:
    """Sorted minimizer table of one target sequence (or one region window)."""

    k: int
    w: int
    hashes: np.ndarray        # uint64 sorted
    positions: np.ndarray     # int32, same order
    strands: np.ndarray       # uint8
    target_len: int

    @classmethod
    def build(cls, codes: np.ndarray, k: int = 15, w: int = 10) -> "MinimizerIndex":
        pos, h, s = minimizers(codes, k, w)
        order = np.argsort(h, kind="stable")
        return cls(k=k, w=w, hashes=h[order], positions=pos[order],
                   strands=s[order], target_len=len(codes))

    def lookup(
        self, q_pos: np.ndarray, q_hash: np.ndarray, q_strand: np.ndarray,
        max_hits: int = 64,
    ) -> np.ndarray:
        """Match query minimizers against the index.

        Returns anchors (n, 3) int64: (t_pos, q_pos, rel_strand) where
        rel_strand 0 = same orientation, 1 = query reverse-complemented.
        Seeds occurring more than ``max_hits`` times in the target are skipped
        (repeat masking, minimap2's -f analog).
        """
        lo = np.searchsorted(self.hashes, q_hash, side="left")
        hi = np.searchsorted(self.hashes, q_hash, side="right")
        cnt = hi - lo
        keep = (cnt > 0) & (cnt <= max_hits)
        qis = np.nonzero(keep)[0]
        if qis.size == 0:
            return np.zeros((0, 3), np.int64)
        counts = cnt[qis]
        starts = lo[qis]
        total = int(counts.sum())
        base = np.repeat(np.cumsum(counts) - counts, counts)
        tidx = np.repeat(starts, counts) + (np.arange(total) - base)
        qrep = np.repeat(qis, counts)
        rel = (q_strand[qrep].astype(np.int64) ^ self.strands[tidx].astype(np.int64))
        return np.stack(
            [self.positions[tidx].astype(np.int64),
             q_pos[qrep].astype(np.int64), rel], axis=1)
