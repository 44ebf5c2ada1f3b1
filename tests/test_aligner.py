import numpy as np
import pytest

from focalsv_tpu.align_engine import Aligner
from focalsv_tpu.io import bam as bamio
from focalsv_tpu.ops import encode as enc
from focalsv_tpu.ops.minimizer import MinimizerIndex, minimizers


def _rand(n, seed=0):
    return np.random.default_rng(seed).integers(0, 4, n).astype(np.uint8)


def test_minimizers_basic():
    seq = _rand(5000, 1)
    pos, h, s = minimizers(seq, k=15, w=10)
    assert len(pos) > 5000 / 10 * 0.5
    assert (np.diff(pos) > 0).all()
    # density ~ 2/(w+1)
    assert len(pos) < 5000 * 0.4


def test_index_lookup_exact():
    ref = _rand(8000, 2)
    idx = MinimizerIndex.build(ref, k=15, w=10)
    q = ref[3000:4000]
    pos, h, s = minimizers(q, 15, 10)
    anchors = idx.lookup(pos, h, s)
    assert anchors.shape[0] > 10
    same = anchors[anchors[:, 2] == 0]
    assert ((same[:, 0] - same[:, 1]) == 3000).mean() > 0.9


def test_align_identity():
    ref = _rand(10_000, 3)
    al = Aligner(ref)
    alns = al.align(ref[2000:7000], "q")
    assert len(alns) >= 1
    a = alns[0]
    assert a.strand == 0
    assert a.t_start == 2000
    assert a.cigar == [(bamio.CMATCH, 5000)]


def test_align_with_del_and_ins():
    ref = _rand(20_000, 4)
    rng = np.random.default_rng(5)
    # query: ref[1000:19000] with 300bp DEL at ref 6000 and 250bp INS at ref 12000
    ins_seq = rng.integers(0, 4, 250).astype(np.uint8)
    q = np.concatenate([ref[1000:6000], ref[6300:12000], ins_seq, ref[12000:19000]])
    # add SNP noise
    mask = rng.random(len(q)) < 0.002
    q = np.where(mask, (q + 1) % 4, q).astype(np.uint8)
    alns = Aligner(ref).align(q, "q")
    assert len(alns) >= 1
    a = alns[0]
    assert a.strand == 0
    assert abs(a.t_start - 1000) <= 16
    dels = [(op, l) for op, l in a.cigar if op == bamio.CDEL and l >= 250]
    inss = [(op, l) for op, l in a.cigar if op == bamio.CINS and l >= 200]
    assert dels and inss
    assert abs(dels[0][1] - 300) <= 10
    assert abs(inss[0][1] - 250) <= 10
    # locate DEL position on reference
    t = a.t_start
    for op, l in a.cigar:
        if op == bamio.CDEL and l >= 250:
            assert abs(t - 6000) < 50
            break
        if bamio.CONSUMES_REF[op]:
            t += l


def test_align_reverse_strand():
    ref = _rand(12_000, 6)
    q = enc.revcomp(ref[3000:9000])
    alns = Aligner(ref).align(q, "q")
    assert len(alns) >= 1
    a = alns[0]
    assert a.strand == 1
    assert a.t_start == 3000
    assert a.cigar == [(bamio.CMATCH, 6000)]


def test_split_alignment_inversion():
    ref = _rand(30_000, 7)
    # query with a 4kb inverted segment in the middle
    q = np.concatenate([
        ref[2000:10000],
        enc.revcomp(ref[10000:14000]),
        ref[14000:22000],
    ])
    alns = Aligner(ref).align(q, "q")
    strands = {a.strand for a in alns}
    assert strands == {0, 1}, f"expected both strands, got {[(a.strand, a.t_start, a.score) for a in alns]}"
    rev = [a for a in alns if a.strand == 1][0]
    assert 9_500 <= rev.t_start <= 10_500


def test_bam_record_conversion():
    ref = _rand(9000, 8)
    q = ref[1000:8000]
    al = Aligner(ref)
    alns = al.align(q, "contig1")
    rec = al.to_bam_record(alns[0], q, alns)
    assert rec.pos == 1000
    assert rec.cigar_string() == "7000M"
    qlen = int(rec.cigar[bamio.CONSUMES_QUERY[rec.cigar[:, 0]], 1].sum())
    assert qlen == rec.query_length


def test_split_alignment_inversion_asymmetric():
    # Read crossing ONE breakpoint of an inversion: long forward flank + a
    # shorter inverted tail.  The tail's flipped-coordinate query span
    # overlaps the forward flank's original-coordinate span, so masking in
    # mixed spaces used to drop the reverse chain (INV recall regression).
    ref = _rand(40_000, 17)
    q = np.concatenate([
        ref[10_000:20_900],                 # 10.9 kb forward
        enc.revcomp(ref[24_000:25_100]),    # 1.1 kb inverted tail
    ])
    alns = Aligner(ref).align(q, "q")
    strands = {a.strand for a in alns}
    assert strands == {0, 1}, (
        f"expected both strands, got "
        f"{[(a.strand, a.t_start, a.t_end, a.score) for a in alns]}")
    rev = [a for a in alns if a.strand == 1][0]
    assert 23_500 <= rev.t_start <= 24_500
