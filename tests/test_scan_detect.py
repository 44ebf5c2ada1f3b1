import os

import numpy as np
import pytest

from focalsv_tpu.config import DataType, preset
from focalsv_tpu.io.bed import Region
from focalsv_tpu.regions import detect
from focalsv_tpu.scan import genotype as gt
from focalsv_tpu.scan import read_scan
from focalsv_tpu.testing import simulate as sim


def test_cal_gl_basics():
    # all-ref reads -> 0/0, all-alt -> 1/1, balanced -> 0/1
    g, gl, gq, qual = gt.cal_gl(20, 0)
    assert g == "0/0"
    g, _, _, _ = gt.cal_gl(0, 20)
    assert g == "1/1"
    g, _, _, _ = gt.cal_gl(10, 10)
    assert g == "0/1"
    # vectorized path matches scalar
    gt_idx, pl, gqv, q = gt.cal_gl_batch(np.array([20, 0, 10]), np.array([0, 20, 10]))
    assert [gt.GENOTYPES[i] for i in gt_idx] == ["0/0", "1/1", "0/1"]


def test_threshold_ref_count():
    assert gt.threshold_ref_count(2) == 20
    assert gt.threshold_ref_count(5) == 25
    assert gt.threshold_ref_count(10) == 40
    assert gt.threshold_ref_count(30) == 90


def test_collect_read_signatures_offsets():
    from focalsv_tpu.io import bam as bamio
    from focalsv_tpu.ops import encode as enc
    cfg = preset(DataType.HIFI).read_scan
    seq = enc.encode("A" * 700)
    rec = bamio.BamRecord(
        name="r", flag=0, ref_id=0, pos=1000, mapq=60,
        cigar=bamio.parse_cigar_string("200M50D200M40I260M"),
        seq=seq, qual=np.full(700, 40, np.uint8))
    dels, inss = read_scan.collect_read_signatures(rec, cfg)
    assert len(dels) == 1 and len(inss) == 1
    assert dels[0].pos == 1200 and dels[0].length == 50
    # cuteSV INS breakpoint convention: pos_start + M/D consumed + 1
    assert inss[0].pos == 1000 + 200 + 50 + 200 + 1
    assert inss[0].length == 40
    assert len(inss[0].seq) == 40


def test_scan_chromosome_simulated():
    region = sim.simulate_region(seed=21, ref_len=40_000, coverage=30,
                                 n_snps=10)
    cfg = preset(DataType.HIFI).read_scan.__class__(min_support=3)
    calls, scan = read_scan.scan_chromosome(region.reads, region.chrom, cfg)
    assert len(calls) >= 2
    by_type = {}
    for c in calls:
        by_type.setdefault(c.svtype, []).append(c)
    del_sv = [s for s in region.svs if s.svtype == "DEL"][0]
    ins_sv = [s for s in region.svs if s.svtype == "INS"][0]
    dmatch = [c for c in by_type.get("DEL", []) if abs(c.pos - del_sv.pos) < 200]
    imatch = [c for c in by_type.get("INS", []) if abs(c.pos - ins_sv.pos) < 200]
    assert dmatch and imatch
    assert abs(abs(dmatch[0].svlen) - del_sv.length) <= 10
    assert abs(imatch[0].svlen - ins_sv.length) <= 10
    # genotypes: DEL is het (0/1), INS is hom (1/1)
    assert dmatch[0].gt == "0/1"
    assert imatch[0].gt == "1/1"
    # draft VCF build
    recs = read_scan.calls_to_vcf(calls, region.ref, 0)
    assert len(recs) == len([c for c in calls if 0 < c.pos < len(region.ref)])


def test_cluster_positions():
    pos = np.array([100, 200, 5000, 5100, 20_000])
    spans = detect.cluster_positions(pos, dt=1000, fl=50)
    assert spans.tolist() == [[50, 250], [4950, 5150], [19_950, 20_050]]


def test_cluster_signatures_del_extends_by_len():
    pos = np.array([1000, 1100, 9000])
    ln = np.array([500, 60, 40])
    spans = detect.cluster_signatures(pos, ln, dt_fine=500, min_sig=2,
                                      svtype="DEL")
    # only the first cluster (2 members) survives; end extends by max len
    assert spans.tolist() == [[1000, 1100 + 500]]
    spans_ins = detect.cluster_signatures(pos, ln, 500, 1, "INS")
    assert spans_ins.tolist() == [[1000, 1100], [9000, 9000]]


def test_recluster_merge_rule():
    # gap < dt merges (overlap > -dt), gap >= dt does not
    r = np.array([[0, 100], [150, 200], [1300, 1400]])
    out = detect.recluster_regions(r, dt=100)
    assert out.tolist() == [[0, 200], [1300, 1400]]
    out2 = detect.recluster_regions(r, dt=50)
    assert out2.tolist() == [[0, 100], [150, 200], [1300, 1400]]


def test_detect_regions_end_to_end():
    cfg = preset(DataType.HIFI).detect
    sig_del = {"chr1": (np.array([100_000, 100_200]), np.array([100, 120]))}
    sig_ins = {"chr1": (np.array([500_000]), np.array([80]))}
    prior = {"chr1": np.array([100_050, 900_000]),
             "chr2": np.array([50_000])}
    regions = detect.detect_regions(sig_del, sig_ins, prior, cfg)
    chroms = {r.chrom for r in regions}
    assert chroms == {"chr1", "chr2"}
    chr1 = [r for r in regions if r.chrom == "chr1"]
    # the DEL cluster + prior at 100k merge into one flanked region
    assert any(r.start <= 100_000 - cfg.flank + 1 and r.end >= 100_320
               for r in chr1)
    # INS-only cluster present (min_sig=1 for HIFI)
    assert any(r.start <= 500_000 <= r.end for r in chr1)
    assert any(r.start <= 900_000 <= r.end for r in chr1)


GOLDEN_BED = "/root/reference/test/SV_Regions_HG002_HIFI_L1_FocalSV-auto.bed"


@pytest.mark.skipif(not os.path.exists(GOLDEN_BED),
                    reason="reference golden BED not present")
def test_golden_step0_bed_invariants():
    """The reference ships its step-0 output for HG002 HiFi L1 verbatim
    (SURVEY.md par.4: 26,834 regions).  Validate our detect math against it:
    the file must be a fixed point of recluster_regions at the HIFI re_dt
    (the reference's final merge guarantees inter-region gaps >= re_dt), and
    its minimum span must equal 2x the HIFI flank parameter.
    """
    from focalsv_tpu.config import preset
    from focalsv_tpu.io.bed import read_bed, split_by_chrom
    from focalsv_tpu.regions.detect import recluster_regions

    regs = read_bed(GOLDEN_BED)
    assert len(regs) == 26834
    assert all(r.start < r.end for r in regs)
    cfg = preset("HIFI").detect
    spans = np.array([r.span for r in regs])
    assert spans.min() == 2 * cfg.flank
    for chrom, rs in split_by_chrom(regs).items():
        arr = np.array([[r.start, r.end] for r in rs], np.int64)
        rc = recluster_regions(arr, cfg.re_dt)
        assert rc.shape[0] == arr.shape[0], (
            f"{chrom}: golden regions merged further at re_dt={cfg.re_dt}")
        np.testing.assert_array_equal(np.sort(rc, axis=0), np.sort(arr, axis=0))
