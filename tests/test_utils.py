import json
import os

import numpy as np
import pytest

from focalsv_tpu.complexsv.auto import ClusteredSV
from focalsv_tpu.utils import coverage as cov
from focalsv_tpu.utils.profiling import StageTimer


def test_mean_coverage_from_spans():
    # 10 reads of 1000bp over a 10kb ref -> ~1x coverage
    spans = np.array([[i * 1000, i * 1000 + 1000] for i in range(10)])
    c = cov.mean_coverage_from_spans(spans, 10_000, n_bins=50, bin_size=1000)
    assert 0.5 < c < 1.5


def test_interval_depth_features():
    spans = np.array([[0, 10_000]] * 5 + [[4_000, 6_000]] * 5)
    cov_sv, cov_l, cov_r = cov.interval_depth_features(spans, 4_500, 5_500, 1000)
    assert cov_sv == 10.0
    assert cov_l == pytest.approx(7.5)   # half of flank covered by the extra 5


def test_dup_round2_filter():
    # duplicated interval has elevated depth relative to its flanks
    spans = np.array([[0, 50_000]] * 10 + [[20_500, 34_500]] * 12)
    sv = ClusteredSV(start=20_000, end=35_000, support=10, mapq=60.0,
                     std_left=0.5, std_right=0.5)
    kept = cov.dup_round2_filter([sv], spans, mean_cov=10.0, data_type="HIFI",
                                 state="Normal")
    assert kept == [sv]
    # low-mapq fails
    sv2 = ClusteredSV(20_000, 35_000, 10, 40.0, 0.5, 0.5)
    assert cov.dup_round2_filter([sv2], spans, 10.0, "HIFI", "Normal") == []


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    s = t.summary()
    assert s["a"]["calls"] == 2


def test_eval_cli(tmp_path):
    from focalsv_tpu.evaluation import cli as ecli
    from focalsv_tpu.io.vcf import VcfRecord, write_vcf
    truth = [VcfRecord("chr1", 1000, "t1", "A" + "G" * 100, "A",
                       info={"SVTYPE": "DEL", "SVLEN": -100}, gt="0/1")]
    calls = [VcfRecord("chr1", 1010, "c1", "A" + "G" * 95, "A",
                       info={"SVTYPE": "DEL", "SVLEN": -95}, gt="0/1")]
    tp, cp = str(tmp_path / "t.vcf"), str(tmp_path / "c.vcf")
    write_vcf(tp, truth)
    write_vcf(cp, calls)
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = ecli.main(["--call", cp, "--truth", tp])
    assert rc == 0
    out = json.loads(buf.getvalue())
    assert out["DEL"]["recall"] == 1.0
    assert out["DEL"]["gt_concordance"] == 1.0


def test_callset_to_bed_converter(tmp_path):
    """Reference excel_to_bed semantics on a CSV export (the xlsx reader
    needs openpyxl, absent here)."""
    from focalsv_tpu.tools.callset_to_bed import convert, main

    csv = tmp_path / "calls.csv"
    csv.write_text(
        ",chrom1,pos1,chrom2,pos2,svsize,svtype\n"
        "0,chr1,1000000,chr1,1200000,200000,DUP\n"
        "1,chr2,5000000,chr2,11000000,6000000,DUP\n"   # >= 5 Mb: dropped
        "2,chr3,2000000,chr3,2500000,500000,INV\n"
        "3,chr4,9000000,chr7,3000000,0,TRA\n"
        "4,chrX,100000,chrX,200000,100000,DUP\n"       # non-autosome: dropped
    )
    out = tmp_path / "regions.bed"
    assert main([str(csv), str(out)]) == 0
    rows = [line.split("\t") for line in out.read_text().splitlines()]
    assert rows[0] == ["chr1", "950000", "1250000", "DUP"]
    # INV contributes one window per breakend
    assert ["chr3", "1950000", "2050000", "INV"] in rows
    assert ["chr3", "2450000", "2550000", "INV"] in rows
    # TRA keeps both chromosomes
    assert ["chr4", "8950000", "9050000", "TRA"] in rows
    assert ["chr7", "2950000", "3050000", "TRA"] in rows
    assert not any(r[0] in ("chr2", "chrX") for r in rows)
