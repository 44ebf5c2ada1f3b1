import numpy as np
import pytest

from focalsv_tpu.align_engine import Aligner
from focalsv_tpu.complexsv import auto as cauto
from focalsv_tpu.io import bam as bamio
from focalsv_tpu.ops import encode as enc


def _align_reads(read_seqs, ref, chrom="chr21"):
    al = Aligner(ref, t_name=chrom)
    records = []
    for i, seq in enumerate(read_seqs):
        alns = al.align(seq, f"read{i}")
        for a in alns:
            records.append(al.to_bam_record(a, seq, alns))
    return records


def _sample_reads(donor, rng, n, rl=12_000):
    out = []
    for _ in range(n):
        s = int(rng.integers(0, max(1, len(donor) - rl)))
        out.append(donor[s : s + rl].copy())
    return out


def test_inversion_detection():
    rng = np.random.default_rng(11)
    ref = rng.integers(0, 4, 40_000).astype(np.uint8)
    inv_start, inv_end = 18_000, 24_000
    donor = np.concatenate([
        ref[:inv_start], enc.revcomp(ref[inv_start:inv_end]), ref[inv_end:]])
    reads = _sample_reads(donor, rng, 40)
    records = _align_reads(reads, ref)
    assert any(r.is_supplementary for r in records)
    res = cauto.call_complex_auto({"chr21": records}, "HIFI")
    assert "chr21" in res.invs, f"no INV: dups={res.dups}"
    invs = cauto.filter_tra_inv(res.invs["chr21"], min_sup=2, min_mapq=5,
                                min_size=1000)
    assert invs, res.invs["chr21"]
    best = max(invs, key=lambda s: s.support)
    assert abs(best.start - inv_start) < 1500
    assert abs(best.end - inv_end) < 1500


def test_duplication_detection():
    # a tandem DUP longer than the read length: junction reads produce split
    # (same-strand, target-backjump) alignments -- the geometry the split-read
    # DUP route detects; read-spanned smaller DUPs surface as INS instead and
    # are recovered by the target-mode INS->DUP route.
    rng = np.random.default_rng(12)
    ref = rng.integers(0, 4, 60_000).astype(np.uint8)
    dup_start, dup_end = 20_000, 35_000   # 15 kb tandem duplication
    donor = np.concatenate([
        ref[:dup_end], ref[dup_start:dup_end], ref[dup_end:]])
    reads = _sample_reads(donor, rng, 60)
    records = _align_reads(reads, ref)
    res = cauto.call_complex_auto({"chr21": records}, "HIFI")
    assert "chr21" in res.dups, f"no DUP: invs={res.invs}"
    dups = [d for d in res.dups["chr21"] if d.support >= 2]
    assert dups, res.dups["chr21"]
    best = max(dups, key=lambda s: s.support)
    assert abs(best.start - dup_start) < 1500
    assert abs(best.end - dup_end) < 1500


def _mk_split_record(name, chrom_id, pos, cig, reverse=False, mapq=60,
                     supplementary=False, seq_len=None):
    cigar = bamio.parse_cigar_string(cig)
    qlen = int(cigar[bamio.CONSUMES_QUERY[cigar[:, 0]], 1].sum())
    flag = (bamio.FLAG_REVERSE if reverse else 0) | (
        bamio.FLAG_SUPPLEMENTARY if supplementary else 0)
    return bamio.BamRecord(
        name=name, flag=flag, ref_id=chrom_id, pos=pos, mapq=mapq,
        cigar=cigar, seq=np.zeros(qlen, np.uint8),
        qual=np.full(qlen, 40, np.uint8))


def test_translocation_detection():
    # read: first 6kb maps chr1:10000+, last 6kb maps chr2:50000+ (both fwd)
    recs1, recs2 = [], []
    for i in range(5):
        off = i * 100
        recs1.append(_mk_split_record(f"t{i}", 0, 10_000 + off, "6000M6000S"))
        recs2.append(_mk_split_record(f"t{i}", 1, 50_000, "6000S6000M",
                                      supplementary=True))
    res = cauto.call_complex_auto({"chr1": recs1, "chr2": recs2}, "HIFI")
    assert res.tras, "no TRA detected"
    chrom, pos, alt, sup, mq = res.tras[0]
    assert chrom == "chr1"
    assert sup == 5
    assert "chr2:50000" in alt or "chr2:50001" in alt
    assert abs(pos - 16_200) < 400   # mean of ref1 ends


def test_complex_vcf_output():
    res = cauto.AutoComplexResult(
        invs={"chr1": [cauto.ClusteredSV(100, 5000, 4, 60.0, 1.0, 1.0)]},
        dups={"chr2": [cauto.ClusteredSV(1000, 3000, 6, 58.0, 0.5, 0.5)]},
        tras=[("chr1", 999, "N[chr2:500[", 3, 55.0)],
    )
    recs = cauto.complex_result_to_vcf(res)
    types = {r.info["SVTYPE"] for r in recs}
    assert types == {"INV", "DUP", "TRA"}
    inv = [r for r in recs if r.info["SVTYPE"] == "INV"][0]
    assert inv.info["SVLEN"] == 4900
