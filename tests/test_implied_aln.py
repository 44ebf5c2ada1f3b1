"""Implied alignments from guided consensus (stitch_contig_segments).

The guided consensus knows each contig base's reference column by
construction, so its contig->reference alignment is emitted directly instead
of re-running seed-chain-extend (reference contrast: hifiasm contigs are
coordinate-free and must be re-aligned, DipPAV_variant_call.py:103).
"""

import numpy as np
import pytest

from focalsv_tpu.assembly.consensus import (DEL_SYM, NOCOV,
                                            stitch_contig_segments)
from focalsv_tpu.io import bam as bamio


def _apply(cigar, t0, contig, ref):
    """Replay a CIGAR: returns the reconstructed (ref columns, contig idx)
    pairs for M ops plus consumed totals."""
    q = t = 0
    t = t0
    qi = 0
    m_pairs = []
    for op, ln in cigar:
        if op == bamio.CMATCH:
            for i in range(ln):
                m_pairs.append((t + i, qi + i))
            t += ln
            qi += ln
        elif op == bamio.CINS:
            qi += ln
        elif op == bamio.CDEL:
            t += ln
        elif op == bamio.CSOFT_CLIP:
            qi += ln
        else:
            raise AssertionError(f"unexpected op {op}")
    assert qi == len(contig)
    return m_pairs


def test_plain_match():
    sym = np.array([0, 1, 2, 3, 0, 1], np.uint8)
    cov = np.ones(6, np.int64)
    contig, segs = stitch_contig_segments(sym, cov, {})
    assert list(contig) == [0, 1, 2, 3, 0, 1]
    assert len(segs) == 1
    t0, cig = segs[0]
    assert t0 == 0 and cig == [(bamio.CMATCH, 6)]


def test_deletion_and_nocov_become_D():
    sym = np.array([0, 1, DEL_SYM, DEL_SYM, 2, 3], np.uint8)
    cov = np.array([3, 3, 3, 3, 0, 3], np.int64)
    sym2 = sym.copy()
    sym2[4] = 0  # voted base but cov 0 -> skipped
    contig, segs = stitch_contig_segments(sym2, cov, {})
    assert list(contig) == [0, 1, 3]
    (t0, cig), = segs
    assert t0 == 0
    assert cig == [(bamio.CMATCH, 2), (bamio.CDEL, 3), (bamio.CMATCH, 1)]


def test_insertion_positions():
    sym = np.arange(8, dtype=np.uint8) % 4
    cov = np.ones(8, np.int64)
    ins = {4: np.array([3, 3, 3], np.uint8)}
    contig, segs = stitch_contig_segments(sym, cov, ins)
    # contig = bases[0:4] + ins + bases[4:]
    assert list(contig) == [0, 1, 2, 3, 3, 3, 3, 0, 1, 2, 3]
    (t0, cig), = segs
    assert t0 == 0
    assert cig == [(bamio.CMATCH, 4), (bamio.CINS, 3), (bamio.CMATCH, 4)]
    _apply(cig, t0, contig, sym)


def test_insertion_inside_deleted_stretch_splits_D():
    sym = np.array([0, 1, DEL_SYM, DEL_SYM, DEL_SYM, DEL_SYM, 2, 3], np.uint8)
    cov = np.ones(8, np.int64)
    ins = {4: np.array([1, 1], np.uint8)}
    contig, segs = stitch_contig_segments(sym, cov, ins)
    (t0, cig), = segs
    assert cig == [(bamio.CMATCH, 2), (bamio.CDEL, 2), (bamio.CINS, 2),
                   (bamio.CDEL, 2), (bamio.CMATCH, 2)]


def test_leading_trailing_insertions_become_clips():
    sym = np.array([0, 1, 2, 3], np.uint8)
    cov = np.ones(4, np.int64)
    ins = {0: np.array([2, 2], np.uint8), 9: np.array([3], np.uint8)}
    contig, segs = stitch_contig_segments(sym, cov, ins)
    assert list(contig) == [2, 2, 0, 1, 2, 3, 3]
    (t0, cig), = segs
    assert t0 == 0
    assert cig == [(bamio.CSOFT_CLIP, 2), (bamio.CMATCH, 4),
                   (bamio.CSOFT_CLIP, 1)]


def test_giant_gap_splits_segments():
    L = 30_000
    sym = np.zeros(L, np.uint8)
    cov = np.ones(L, np.int64)
    sym[1000:26_000] = DEL_SYM          # 25 kb deletion > max_gap (10 kb)
    contig, segs = stitch_contig_segments(sym, cov, {})
    assert len(segs) == 2
    (t0a, ca), (t0b, cb) = segs
    assert t0a == 0 and ca[0] == (bamio.CMATCH, 1000)
    # second segment leads with the 1000-bp soft clip of segment 1's bases
    assert t0b == 26_000
    assert cb[0] == (bamio.CSOFT_CLIP, 1000)
    assert cb[1] == (bamio.CMATCH, L - 26_000)
    # clip geometry: together the segments cover the whole contig
    assert len(contig) == 1000 + (L - 26_000)


def test_uncovered_flanks_shift_t_start():
    sym = np.zeros(10, np.uint8)
    cov = np.array([0, 0, 1, 1, 1, 1, 1, 0, 0, 0], np.int64)
    contig, segs = stitch_contig_segments(sym, cov, {})
    (t0, cig), = segs
    assert t0 == 2
    assert cig == [(bamio.CMATCH, 5)]


def test_parity_with_stitch_contig():
    from focalsv_tpu.assembly.consensus import stitch_contig
    rng = np.random.default_rng(7)
    sym = rng.integers(0, 6, 500).astype(np.uint8)
    sym[sym == 5] = DEL_SYM
    cov = rng.integers(0, 3, 500).astype(np.int64)
    ins = {17: np.array([0, 1], np.uint8), 250: np.array([2] * 40, np.uint8)}
    c1 = stitch_contig(sym, cov, dict(ins))
    c2, segs = stitch_contig_segments(sym, cov, dict(ins))
    assert (c1 is None) == (c2 is None)
    if c1 is not None:
        np.testing.assert_array_equal(c1, c2)
        for t0, cig in segs:
            _apply(cig, t0, c2, sym)


def test_matched_columns_agree_with_emitted_positions():
    rng = np.random.default_rng(3)
    sym = rng.integers(0, 4, 200).astype(np.uint8)
    cov = rng.integers(0, 2, 200).astype(np.int64)
    contig, segs = stitch_contig_segments(sym, cov, {})
    if contig is None:
        pytest.skip("all uncovered")
    emitted = np.nonzero((sym < 4) & (cov > 0))[0]
    pairs = []
    for t0, cig in segs:
        pairs.extend(_apply(cig, t0, contig, sym))
    # every M op pairs an emitted ref column with the contig base that holds
    # its voted symbol
    assert [t for t, _ in pairs] == list(emitted)
    for t, q in pairs:
        assert contig[q] == sym[t]


def test_native_stitch_parity_fuzz():
    """native/bamparse.cpp::stitch_segments must be bit-parity with the
    Python reference implementation (contig bytes, segment t0s, op lists)
    across random sym/cov tracks, insertion sets, and max_gap bounds."""
    import numpy as np

    from focalsv_tpu import native
    from focalsv_tpu.assembly.consensus import _stitch_contig_segments_py

    assert native.get_parse_lib() is not None
    rng = np.random.default_rng(11)
    for _ in range(400):
        L = int(rng.integers(1, 300))
        sym = rng.integers(0, 7, L).astype(np.uint8)
        cov = rng.integers(0, 3, L).astype(np.int32)
        ins_at = {int(rng.integers(0, L + 2)):
                  rng.integers(0, 4, int(rng.integers(0, 60))).astype(np.uint8)
                  for _ in range(int(rng.integers(0, 4)))}
        mg = int(rng.choice([3, 10, 10_000]))
        out = native.stitch_segments(sym, cov, ins_at, mg)
        assert out is not None
        c1, s1 = out
        c2, s2 = _stitch_contig_segments_py(sym, cov, ins_at, mg)
        assert (c1 is None) == (c2 is None)
        assert c1 is None or np.array_equal(c1, c2)
        assert s1 == s2
