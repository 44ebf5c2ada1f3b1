import numpy as np
import pytest

from focalsv_tpu.align_engine import Aligner
from focalsv_tpu.complexsv import target as ctarget
from focalsv_tpu.io import bam as bamio
from focalsv_tpu.io.bed import Region
from focalsv_tpu.io.vcf import VcfRecord
from focalsv_tpu.ops import encode as enc
from focalsv_tpu.testing import simulate as sim


def test_recover_dup_from_ins():
    rng = np.random.default_rng(3)
    ref = rng.integers(0, 4, 30_000).astype(np.uint8)
    # a true tandem dup shows as INS whose seq equals ref just before pos
    dup_seq = ref[10_000:10_800]
    ins_rec = VcfRecord(
        "chr21", 10_800, "ins1", "A", "A" + enc.decode(dup_seq),
        info={"SVTYPE": "INS", "SVLEN": 800, "TIG_REGION": "c1:0-800"},
        gt="0/1")
    # a novel INS (random seq) must NOT be recovered as DUP
    novel = VcfRecord(
        "chr21", 20_000, "ins2", "A",
        "A" + enc.decode(rng.integers(0, 4, 700).astype(np.uint8)),
        info={"SVTYPE": "INS", "SVLEN": 700}, gt="0/1")
    dups = ctarget.recover_dup_from_ins([ins_rec, novel], {"chr21": ref})
    assert len(dups) == 1
    d = dups[0]
    assert d.info["SVTYPE"] == "DUP"
    assert abs(d.pos - 10_000) < 100
    assert abs(int(d.info["SVLEN"]) - 800) < 100
    assert d.gt == "0/1"


def test_target_inv_window(tmp_path):
    rng = np.random.default_rng(21)
    ref = rng.integers(0, 4, 40_000).astype(np.uint8)
    inv_start, inv_end = 18_000, 24_000
    donor = np.concatenate([
        ref[:inv_start], enc.revcomp(ref[inv_start:inv_end]), ref[inv_end:]])
    al = Aligner(ref, t_name="chr21")
    records = []
    for i in range(40):
        s = int(rng.integers(0, len(donor) - 12_000))
        seq = donor[s : s + 12_000]
        alns = al.align(seq, f"r{i}")
        for a in alns:
            records.append(al.to_bam_record(a, seq, alns))
    # write a BAM so the target caller can fetch windows
    p = str(tmp_path / "t.bam")
    w = bamio.BamWriter(p, ["chr21"], [40_000])
    for r in sorted(records, key=lambda r: r.pos):
        w.write(r)
    w.close()
    bamio.build_bai(p)
    bam = bamio.BamReader(p)
    res = ctarget.call_complex_target(
        bam, {"INV": [Region("chr21", 15_000, 27_000)]}, "HIFI",
        min_support=2)
    assert res.invs, "no INV called in target window"
    best = max(res.invs, key=lambda r: r.info["SUPPORT"])
    assert abs(best.pos - inv_start) < 1500
    assert abs(int(best.info["END"]) - inv_end) < 1500
    assert res.all_records()


def test_target_tra_bounded_fetch(tmp_path):
    """TRA mate lookup uses SA-tag coordinates with bounded BAI fetches --
    never a genome-wide scan (reference: Reads_Based_TRA_Call.py:180 locates
    mates from SA tags)."""
    rng = np.random.default_rng(5)
    L1, L2 = 200_000, 200_000
    bp1, bp2 = 100_000, 50_000       # chr1:100k | chr2:50k junction
    p = str(tmp_path / "tra.bam")
    w = bamio.BamWriter(p, ["chr1", "chr2"], [L1, L2])
    recs1, recs2 = [], []
    for i in range(12):
        a = 5000 + 200 * i           # left-segment length
        b = 12_000 - a
        seq = rng.integers(0, 4, 12_000).astype(np.uint8)
        qual = np.full(12_000, 40, np.uint8)
        sa2 = f"chr2,{bp2 + 1},+,{a}S{b}M,60,0;"
        sa1 = f"chr1,{bp1 - a + 1},+,{a}M{b}S,60,0;"
        recs1.append(bamio.BamRecord(
            name=f"r{i}", flag=0, ref_id=0, pos=bp1 - a, mapq=60,
            cigar=np.array([[bamio.CMATCH, a], [bamio.CSOFT_CLIP, b]],
                           np.int32),
            seq=seq, qual=qual, tags={"SA": sa2}))
        recs2.append(bamio.BamRecord(
            name=f"r{i}", flag=bamio.FLAG_SUPPLEMENTARY, ref_id=1, pos=bp2,
            mapq=60,
            cigar=np.array([[bamio.CSOFT_CLIP, a], [bamio.CMATCH, b]],
                           np.int32),
            seq=seq, qual=qual, tags={"SA": sa1}))
    for r in sorted(recs1, key=lambda r: r.pos):
        w.write(r)
    for r in sorted(recs2, key=lambda r: r.pos):
        w.write(r)
    w.close()
    bamio.build_bai(p)
    bam = bamio.BamReader(p)

    fetches = []
    orig_fetch = bam.fetch

    def spy_fetch(chrom, start=0, end=None):
        fetches.append((chrom, start, end))
        return orig_fetch(chrom, start, end)

    bam.fetch = spy_fetch
    res = ctarget.call_complex_target(
        bam, {"TRA": [Region("chr1", 95_000, 105_000)]}, "HIFI",
        min_support=2)
    assert res.tras, "no TRA called"
    best = max(res.tras, key=lambda r: r.info["SUPPORT"])
    assert best.chrom == "chr1" and abs(best.pos - bp1) < 1500
    assert "chr2" in best.alt
    # every fetch is bounded and narrow (no whole-chromosome scan)
    assert fetches
    for chrom, start, end in fetches:
        assert end is not None, "unbounded fetch"
        assert end - start < 60_000, f"fetch too wide: {chrom}:{start}-{end}"


def test_split_typed_bed():
    rows = [
        (Region("chr1", 0, 100), "DUP"),
        (Region("chr1", 200, 300), "INV"),
        (Region("chr2", 0, 50), "TRA"),
        (Region("chr2", 60, 80), "inv"),
    ]
    out = ctarget.split_typed_bed(rows)
    assert len(out["DUP"]) == 1
    assert len(out["INV"]) == 2
    assert len(out["TRA"]) == 1
