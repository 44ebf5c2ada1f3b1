import numpy as np
import pytest

from focalsv_tpu.config import DataType, preset
from focalsv_tpu.io.vcf import VcfRecord
from focalsv_tpu.refine import support as sup
from focalsv_tpu.refine.coverage_filter import coverage_filter
from focalsv_tpu.refine.driver import refine_records
from focalsv_tpu.refine.gt_correct import (
    correct_gt, gt_impute, match_support, ont_final_process, spanning_depth,
)
from focalsv_tpu.scan import read_scan
from focalsv_tpu.testing import simulate as sim


def _rec(chrom, pos, svtype, svlen, gt="0/1", id=None):
    if svtype == "DEL":
        ref, alt = "A" * (svlen + 1), "A"
        info_len = -svlen
    else:
        ref, alt = "A", "A" * (svlen + 1)
        info_len = svlen
    return VcfRecord(chrom, pos, id or f"{svtype}{pos}", ref, alt,
                     info={"SVTYPE": svtype, "SVLEN": info_len}, gt=gt)


def test_ins_call_cov():
    cov = sup.ins_call_cov(np.array([5000]), np.array([4500, 5500, 7000]),
                           np.array([100, 200, 50]), flank=1000)
    assert cov.tolist() == [300]


def test_del_call_cov():
    cov = sup.del_call_cov(np.array([5000]), np.array([5300]),
                           np.array([4000, 5200, 9000]),
                           np.array([100, 150, 60]), flank=1000)
    # sig at 4000 (end 4100) overlaps [4000, 6300]; sig 5200 overlaps; 9000 no
    assert cov.tolist() == [250]


def test_match_support_and_depth():
    sup_n = match_support(np.array([1000]), np.array([100]),
                          np.array([950, 1400, 3000]),
                          np.array([90, 100, 100]),
                          np.array([5, 3, 7]))
    # sig at 950 matches (shift 50 <= 500, size in [50, 200]);
    # 1400 matches window (shift 400<=500) and size; 3000 out of window
    assert sup_n.tolist() == [8]
    spans = np.array([[0, 2000], [500, 1500], [1200, 1800]])
    d = spanning_depth(1000, 100, "DEL", spans)
    assert d == 2.0


def test_correct_gt_upgrades_hom():
    # het call with overwhelming support ratio -> corrected to 1/1
    r = _rec("chr1", 1000, "DEL", 100, gt="0/1")
    spans = np.array([[0, 3000]] * 10)   # depth 10
    recs = correct_gt(
        [r],
        sig_pos={"DEL": np.array([1000]), "INS": np.zeros(0, np.int64)},
        sig_len={"DEL": np.array([100]), "INS": np.zeros(0, np.int64)},
        sig_reads={"DEL": np.array([10]), "INS": np.zeros(0, np.int64)},
        spans=spans, dtype_name="Hifi")
    assert recs[0].gt == "1/1"   # ratio 1.0 > t_small_01 0.91
    # weak support stays 0/1
    recs2 = correct_gt(
        [r],
        sig_pos={"DEL": np.array([1000]), "INS": np.zeros(0, np.int64)},
        sig_len={"DEL": np.array([100]), "INS": np.zeros(0, np.int64)},
        sig_reads={"DEL": np.array([5]), "INS": np.zeros(0, np.int64)},
        spans=spans, dtype_name="Hifi")
    assert recs2[0].gt == "0/1"


def test_gt_impute():
    call = _rec("chr1", 1000, "INS", 100, gt="0/1")
    draft = [_rec("chr1", 1050, "INS", 95, gt="1/1"),
             _rec("chr1", 1900, "INS", 60, gt="0/1")]
    out = gt_impute([call], draft)
    assert out[0].gt == "1/1"
    # no match within distance
    far = _rec("chr2", 1000, "INS", 100, gt="0/1")
    assert gt_impute([far], draft)[0].gt == "0/1"


def test_ont_final_process():
    asm = [_rec("chr1", 1000, "INS", 100), _rec("chr1", 5000, "DEL", 80),
           _rec("chr1", 9000, "DEL", 90)]
    draft = [_rec("chr1", 1300, "INS", 60), _rec("chr1", 5040, "DEL", 70)]
    out = ont_final_process(asm, draft)
    # INS union: asm INS + unmatched draft INS
    ins = [r for r in out if r.svtype == "INS"]
    assert len(ins) == 2
    # DEL at 5000 kept (draft at 5040 within 100); DEL at 9000 dropped
    dels = [r.pos for r in out if r.svtype == "DEL"]
    assert dels == [5000]


def test_coverage_filter_bands():
    recs = [_rec("chr1", 1000 * i, "DEL", 100, id=f"d{i}") for i in range(10)]
    rows = []
    for i in range(10):
        rel = 2.0 if i < 9 else 100.0   # one extreme outlier
        rows.append(dict(idx=i, svid=f"d{i}", svtype="DEL", svlen=100,
                         cov=int(rel * 100), rel_cov=rel))
    from focalsv_tpu.config import CoverageFilterConfig
    kept, dropped = coverage_filter(recs, rows, CoverageFilterConfig())
    assert len(dropped) == 1 and dropped[0].id == "d9"


def test_refine_driver_end_to_end():
    region = sim.simulate_region(seed=31, ref_len=30_000, coverage=25, n_snps=10)
    cfg = preset(DataType.HIFI)
    scan_cfg = cfg.read_scan.__class__(min_support=3)
    calls, scan = read_scan.scan_chromosome(region.reads, region.chrom, scan_cfg)
    draft = read_scan.calls_to_vcf(calls, region.ref, 0)
    # candidate records (as if from assembly path) at the true SV sites
    records = []
    for sv in region.svs:
        records.append(_rec(region.chrom, sv.pos, sv.svtype, sv.length,
                            gt="0/1"))
    final, dropped = refine_records(records, scan, draft, cfg)
    assert len(final) == 2
    # hom INS should be corrected to 1/1 by support ratio
    ins = [r for r in final if r.svtype == "INS"][0]
    assert ins.gt == "1/1"
