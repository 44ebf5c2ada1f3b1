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
