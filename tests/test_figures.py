"""Paper-figure rendering (evaluation/figures.py): every reference figure
family (Figure3 F1 grid, Figure4 parameter curves, Figure5-6 heatmaps,
S31-34 distributions, S37/S39-40 phasing) renders a non-empty image from
the framework's own emitted data — closing the plotting half of the
reference's evaluation suite (`evaluation/Figure3_Supplemental_FigureS2/
plot_f1_grid.py` etc.)."""

import io
import json
import os
from contextlib import redirect_stdout

import pytest

pytest.importorskip("matplotlib")

from focalsv_tpu.evaluation import cli as ecli
from focalsv_tpu.io.vcf import VcfRecord, write_vcf


def _write_callsets(tmp_path):
    truth = [
        VcfRecord("chr1", 10_000, "t1", "A" * 201, "A",
                  info={"SVTYPE": "DEL", "SVLEN": -200}, gt="0/1"),
        VcfRecord("chr1", 30_000, "t2", "A", "A" + "ACGT" * 50,
                  info={"SVTYPE": "INS", "SVLEN": 200}, gt="1/1"),
    ]
    calls = [
        VcfRecord("chr1", 10_030, "c1", "A" * 196, "A",
                  info={"SVTYPE": "DEL", "SVLEN": -195}, gt="0/1"),
        VcfRecord("chr1", 30_004, "c2", "A", "A" + "ACGT" * 50,
                  info={"SVTYPE": "INS", "SVLEN": 200}, gt="1/1"),
    ]
    tp, cp = str(tmp_path / "t.vcf"), str(tmp_path / "c.vcf")
    write_vcf(tp, truth)
    write_vcf(cp, calls)
    return cp, tp


def _png_ok(path):
    return os.path.exists(path) and os.path.getsize(path) > 1000


def test_figures_cli_end_to_end(tmp_path):
    """grid + figdata + protocol artifacts -> `eval figures` renders the
    heatmaps, parameter curves, shift/similarity distributions, and the
    Figure-3 F1 bar grid."""
    cp, tp = _write_callsets(tmp_path)
    grid_dir = str(tmp_path / "grid")
    fig_dir = str(tmp_path / "figs")
    proto_dir = str(tmp_path / "proto")
    with redirect_stdout(io.StringIO()):
        assert ecli.main(["grid", "--call", cp, "--truth", tp,
                          "--out_dir", grid_dir,
                          "--refdists", "100,500",
                          "--pctsims", "0.0,0.5"]) == 0
        assert ecli.main(["figdata", "--call", cp, "--truth", tp,
                          "--out_dir", grid_dir]) == 0
        assert ecli.main(["protocol", "--call", cp, "--truth", tp,
                          "--out_dir", proto_dir]) == 0
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = ecli.main([
            "figures", "--out_dir", fig_dir, "--grid-dir", grid_dir,
            "--details", os.path.join(grid_dir, "tp_match_details.csv"),
            "--f1", f"focalsv-tpu={proto_dir}",
            "--target-tool", "focalsv-tpu"])
    assert rc == 0
    written = json.loads(buf.getvalue())["written"]
    # heatmaps (2 svtypes) + curves (2 svtypes x 2 axes) + 2 dists + grid
    assert len(written) == 2 + 4 + 2 + 1
    for p in written:
        assert _png_ok(p), p
    assert _png_ok(os.path.join(fig_dir, "breakpoint_shift.png"))
    assert _png_ok(os.path.join(fig_dir, "f1_grid.png"))
    assert _png_ok(os.path.join(fig_dir, "curves_INS_refdist.png"))


def test_plot_f1_grid_multi_panel(tmp_path):
    """Up to-9-panel layout with a/b labels and target-tool highlight
    (plot_f1_grid.py draw_plots_grid semantics)."""
    from focalsv_tpu.evaluation.figures import plot_f1_grid

    table = [["tool", "svtype", "recall", "precision", "f1"],
             ["focalsv-tpu", "DEL", "0.9", "0.95", "0.924"],
             ["focalsv-tpu", "INS", "0.88", "0.9", "0.89"],
             ["other", "DEL", "0.7", "0.8", "0.746"],
             ["other", "INS", "0.6", "0.7", "0.646"]]
    out = str(tmp_path / "grid.png")
    w = plot_f1_grid([("HiFi L1", table), ("ONT L2", table)], out,
                     target_tool="focalsv-tpu")
    assert w == [out] and _png_ok(out)


def test_plot_phasing_summary(tmp_path):
    from focalsv_tpu.evaluation.figures import plot_phasing_summary

    stats = {
        "HIFI": dict(phased_frac=0.97, block_n50_bp=18_000,
                     switch_error_rate=0.001),
        "ONT": dict(phased_frac=0.93, block_n50_bp=15_000,
                    switch_error_rate=0.004),
    }
    out = str(tmp_path / "phasing.png")
    assert plot_phasing_summary(stats, out) == [out]
    assert _png_ok(out)
