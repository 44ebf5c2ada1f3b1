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


def test_callset_to_bed_malformed_rows(tmp_path, capsys):
    """Blank and short rows are skipped with a line-numbered note instead
    of raising (advisor finding r2)."""
    from focalsv_tpu.tools.callset_to_bed import main

    csv = tmp_path / "calls.csv"
    csv.write_text(
        ",chrom1,pos1,chrom2,pos2,svsize,svtype\n"
        "\n"
        "0,chr1,1000000,chr1,1200000,200000,DUP\n"
        "short,row\n"
        "1,chr5,notanumber,chr5,2000000,100,DUP\n"
    )
    out = tmp_path / "regions.bed"
    assert main([str(csv), str(out)]) == 0
    rows = out.read_text().splitlines()
    assert len(rows) == 1 and rows[0].startswith("chr1\t")
    err = capsys.readouterr().err
    assert "skipping short row" in err and "non-numeric position" in err


def test_eval_filter_and_protocol(tmp_path):
    """6_evaluation port: INS/DEL split + XY drop (vcf_filter.py) and the
    full protocol flow with the result-parser table
    (truvari_result_parser_indel.py:11-22)."""
    import csv as csvmod

    from focalsv_tpu.evaluation import cli as ecli
    from focalsv_tpu.evaluation.vcf_filter import filter_vcf
    from focalsv_tpu.io.vcf import VcfRecord, read_vcf, write_vcf

    def rec(chrom, pos, svtype, length, gt="0/1"):
        if svtype == "DEL":
            ref, alt = "A" + "G" * length, "A"
            svlen = -length
        else:
            ref, alt = "A", "A" + "G" * length
            svlen = length
        return VcfRecord(chrom, pos, f"{chrom}_{pos}", ref, alt,
                         info={"SVTYPE": svtype, "SVLEN": svlen}, gt=gt)

    calls = [rec("chr1", 1000, "DEL", 100), rec("chr1", 5000, "INS", 80),
             rec("chrX", 2000, "DEL", 90),    # XY: dropped
             rec("chr2", 3000, "INS", 60)]
    truth = [rec("chr1", 1010, "DEL", 95), rec("chr1", 5020, "INS", 78),
             rec("chr2", 3010, "INS", 64),
             rec("chr2", 9000, "DEL", 70)]    # missed -> FN
    cp, tp = str(tmp_path / "c.vcf"), str(tmp_path / "t.vcf")
    write_vcf(cp, calls)
    write_vcf(tp, truth)

    paths = filter_vcf(cp, str(tmp_path / "f"))
    _, dels = read_vcf(paths["DEL"])
    _, inss = read_vcf(paths["INS"])
    _, both = read_vcf(paths["both"])
    assert [r.chrom for r in dels] == ["chr1"]          # chrX dropped
    assert sorted(r.chrom for r in inss) == ["chr1", "chr2"]
    assert len(both) == 3

    # --chrs restriction (truvari_eval.sh:30 passes a single chromosome)
    only1 = filter_vcf(cp, str(tmp_path / "f1"), chrs=["chr1"])
    _, ins1 = read_vcf(only1["INS"])
    assert [r.chrom for r in ins1] == ["chr1"]

    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = ecli.main(["protocol", "--call", cp, "--truth", tp,
                        "--out_dir", str(tmp_path / "proto")])
    assert rc == 0
    out = json.loads(buf.getvalue())
    assert out["results"]["DEL"] == dict(tp=1, fp=0, fn=1, recall=0.5,
                                         precision=1.0, f1=0.6667)
    assert out["results"]["INS"]["tp"] == 2
    with open(out["table"]) as f:
        table = list(csvmod.reader(f))
    # CSV stays byte-compatible with the reference parser (no comment
    # rows); provenance lives in the sidecar
    with open(out["table"] + ".PROVENANCE.txt") as f:
        assert "NOT run" in f.read()
    assert table[0] == ["metric", "INS_50_", "DEL_50_"]
    assert [row[0] for row in table[1:]] == ecli.RESULT_KEYS
    # DEL column: TP-call=1, FP=0, FN=1
    del_col = {row[0]: row[2] for row in table[1:4]}
    assert del_col == {"TP-call": "1", "FP": "0", "FN": "1"}


def test_eval_filter_dipcall_mode(tmp_path):
    """--dipcall classifies by allele length with the >49 bp floor
    (vcf_filter.py:58-65)."""
    from focalsv_tpu.evaluation.vcf_filter import filter_vcf
    from focalsv_tpu.io.vcf import VcfRecord, read_vcf, write_vcf

    recs = [
        VcfRecord("chr1", 100, "d", "A" + "C" * 60, "A", info={}, gt="0/1"),
        VcfRecord("chr1", 200, "i", "A", "A" + "C" * 55, info={}, gt="0/1"),
        VcfRecord("chr1", 300, "s", "A" + "C" * 30, "A", info={}, gt="0/1"),
    ]
    p = str(tmp_path / "d.vcf")
    write_vcf(p, recs)
    paths = filter_vcf(p, str(tmp_path / "o"), dipcall=True)
    _, dels = read_vcf(paths["DEL"])
    _, inss = read_vcf(paths["INS"])
    assert [r.id for r in dels] == ["d"]   # 30 bp indel below the floor
    assert [r.id for r in inss] == ["i"]


def test_clean_cli(tmp_path):
    """clean.py analog: region intermediates removed, FASTAs kept
    (6_evaluation/clean.py:11-35)."""
    from focalsv_tpu.tools.clean import main

    rdir = tmp_path / "chr21" / "regions" / "Region_chr21_S0_E9999"
    rdir.mkdir(parents=True)
    (rdir / "HP1.fa").write_text(">c\nACGT\n")
    (rdir / "PS100_hp2.fa").write_text(">c\nACGT\n")
    (rdir / "region_phased.bam").write_bytes(b"\x00")
    (rdir / "region_phased.vcf").write_text("##fileformat=VCFv4.2\n")
    other = tmp_path / "chr21" / "results"
    other.mkdir()
    (other / "final.vcf").write_text("x")   # outside Region_*: untouched

    rc = main(["--out_dir", str(tmp_path), "--dry_run"])
    assert rc == 0
    assert (rdir / "region_phased.bam").exists()   # dry run deletes nothing

    rc = main(["--out_dir", str(tmp_path)])
    assert rc == 0
    left = sorted(p.name for p in rdir.iterdir())
    assert left == ["HP1.fa", "PS100_hp2.fa"]
    assert (other / "final.vcf").exists()


def test_eval_grid_search(tmp_path):
    """`eval grid`: the in-process analog of the reference's truvari
    parameter grid (Figure5-6 grid_search.py) -- F1 grid CSVs per svtype
    plus a tidy per-cell table; wider refdist must not lower recall."""
    import csv as csvmod
    import io
    import json
    from contextlib import redirect_stdout

    from focalsv_tpu.evaluation import cli as ecli
    from focalsv_tpu.io.vcf import VcfRecord, write_vcf

    truth = [
        VcfRecord("chr1", 10_000, "t1", "A" * 201, "A",
                  info={"SVTYPE": "DEL", "SVLEN": -200}, gt="0/1"),
        VcfRecord("chr1", 30_000, "t2", "A", "A" + "ACGT" * 50,
                  info={"SVTYPE": "INS", "SVLEN": 200}, gt="1/1"),
    ]
    calls = [
        VcfRecord("chr1", 10_180, "c1", "A" * 191, "A",   # 180 bp away
                  info={"SVTYPE": "DEL", "SVLEN": -190}, gt="0/1"),
        VcfRecord("chr1", 30_004, "c2", "A", "A" + "ACGT" * 50,
                  info={"SVTYPE": "INS", "SVLEN": 200}, gt="1/1"),
    ]
    tp, cp = str(tmp_path / "t.vcf"), str(tmp_path / "c.vcf")
    write_vcf(tp, truth)
    write_vcf(cp, calls)
    out = str(tmp_path / "grid")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = ecli.main(["grid", "--call", cp, "--truth", tp,
                        "--out_dir", out, "--refdists", "100,500",
                        "--pctsims", "0.0,0.5"])
    assert rc == 0
    res = json.loads(buf.getvalue())
    assert res["best"]["INS"]["f1"] == 1.0
    with open(f"{out}/grid_DEL.csv") as f:
        rows = list(csvmod.reader(f))
    # DEL at refdist 100 misses the 180 bp-shifted call; at 500 it matches
    assert float(rows[1][1]) == 0.0 and float(rows[1][2]) == 1.0
    with open(f"{out}/grid_cells.csv") as f:
        cells = list(csvmod.reader(f))
    assert cells[0][0] == "svtype" and len(cells) == 1 + 2 * 4


def test_eval_f1_summary_rows(tmp_path):
    """Figure-3-style per-tool F1 table from protocol output dirs
    (line_bar_plot data; evaluation/grid.py::f1_summary_rows)."""
    import io
    from contextlib import redirect_stdout

    from focalsv_tpu.evaluation import cli as ecli
    from focalsv_tpu.evaluation.grid import f1_summary_rows
    from focalsv_tpu.io.vcf import VcfRecord, write_vcf

    truth = [VcfRecord("chr1", 1000, "t", "A" + "G" * 100, "A",
                       info={"SVTYPE": "DEL", "SVLEN": -100}, gt="0/1")]
    cp, tp = str(tmp_path / "c.vcf"), str(tmp_path / "t.vcf")
    write_vcf(cp, truth)
    write_vcf(tp, truth)
    out = str(tmp_path / "proto")
    with redirect_stdout(io.StringIO()):
        assert ecli.main(["protocol", "--call", cp, "--truth", tp,
                          "--out_dir", out]) == 0
    rows = f1_summary_rows({"focalsv_tpu": out})
    assert rows[0] == ["tool", "svtype", "recall", "precision", "f1"]
    by = {(r[0], r[1]): r[4] for r in rows[1:]}
    assert by[("focalsv_tpu", "DEL")] == "1.0"


def test_figdata_match_details_and_phasing_stats(tmp_path):
    """Figure-data producers (FigureS31-34 + S37/S40/TableS6 analogs):
    per-TP shift/similarity rows agree with the matcher's TP count, and
    phasing stats against simulator truth haplotypes are clean on an
    easy region (no switch errors, every usable read phased into one
    block)."""
    import numpy as np

    from focalsv_tpu.config import preset
    from focalsv_tpu.evaluation.compare import match_records, truth_from_sim
    from focalsv_tpu.evaluation.figdata import (match_detail_rows,
                                                phasing_stats,
                                                write_rows_csv)
    from focalsv_tpu.pipeline.region import process_region
    from focalsv_tpu.testing import simulate as sim

    region = sim.simulate_region(seed=31, ref_len=20_000, coverage=25,
                                 n_snps=20,
                                 svs=[sim.SimSV("DEL", 8_000, 120, "0/1"),
                                      sim.SimSV("INS", 14_000, 200, "1/1",
                                                seq=np.random.default_rng(
                                                    [31, 5]).integers(
                                                    0, 4, 200).astype(
                                                    np.uint8))])
    cfg = preset("HIFI")
    res = process_region(region.reads, region.ref, 0, region.chrom, cfg)
    truth = truth_from_sim(region.svs, region.chrom, region.ref)
    b = match_records(res.records, truth)
    rows = match_detail_rows(res.records, truth)
    assert len(rows) == b.tp == 2
    assert all(r["shift"] <= 500 for r in rows)
    ins_rows = [r for r in rows if r["svtype"] == "INS"]
    assert ins_rows and ins_rows[0]["seq_similarity"] != ""
    assert float(ins_rows[0]["seq_similarity"]) >= 0.5
    p = str(tmp_path / "tp.csv")
    write_rows_csv(rows, p)
    assert open(p).readline().startswith("chrom,")

    st = phasing_stats(res.usable_reads, res.phase_hp, res.phase_ps)
    assert st["n_phased"] > 0.8 * st["n_reads"]
    assert st["switch_errors"] == 0 and st["hamming_mismatch"] == 0
    assert st["block_n50_bp"] > 5_000
