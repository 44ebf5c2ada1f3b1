import json
import os

import numpy as np
import pytest

from focalsv_tpu.config import DataType, preset
from focalsv_tpu.evaluation.compare import match_records, truth_from_sim
from focalsv_tpu.io.bed import Region, write_bed
from focalsv_tpu.io.fasta import write_fasta
from focalsv_tpu.io.vcf import read_vcf
from focalsv_tpu.pipeline import cli
from focalsv_tpu.testing import simulate as sim


@pytest.fixture(scope="module")
def genome(tmp_path_factory):
    """A 120 kb chromosome with 4 SVs, reads, BAM/FASTA/BED on disk."""
    d = tmp_path_factory.mktemp("genome")
    rng = np.random.default_rng(7)
    svs = [
        sim.SimSV("DEL", 20_000, 150, "0/1"),
        sim.SimSV("INS", 45_000, 300, "1/1", seq=rng.integers(0, 4, 300).astype(np.uint8)),
        sim.SimSV("DEL", 80_000, 500, "1/1"),
        sim.SimSV("INS", 104_000, 80, "0/1", seq=rng.integers(0, 4, 80).astype(np.uint8)),
    ]
    region = sim.simulate_region(seed=42, ref_len=120_000, coverage=22,
                                 n_snps=120, svs=svs, chrom="chr21")
    bam_path = str(d / "reads.bam")
    sim.write_region_bam(region, bam_path)
    ref_path = str(d / "ref.fa")
    write_fasta(ref_path, [("chr21", region.ref)])
    bed_path = str(d / "regions.bed")
    write_bed(bed_path, [
        Region("chr21", 12_000, 28_000),
        Region("chr21", 38_000, 52_000),
        Region("chr21", 72_000, 88_000),
        Region("chr21", 97_000, 111_000),
    ])
    return dict(dir=str(d), bam=bam_path, ref=ref_path, bed=bed_path,
                region=region)


def test_target_mode_cli(genome, tmp_path):
    out_dir = str(tmp_path / "out")
    rc = cli.main([
        "--bam_file", genome["bam"], "--ref_file", genome["ref"],
        "--out_dir", out_dir, "--data_type", "HIFI",
        "--target_bed", genome["bed"],
    ])
    assert rc == 0
    final = os.path.join(out_dir, "FocalSV_Final_SV.vcf")
    assert os.path.exists(final)
    header, records = read_vcf(final)
    assert any("SVTYPE" in h for h in header)
    region = genome["region"]
    truth = truth_from_sim(region.svs, "chr21", region.ref)
    bench = match_records(records, truth)
    assert bench.recall == 1.0, (
        f"recall {bench.recall}; calls="
        f"{[(r.info.get('SVTYPE'), r.pos, r.info.get('SVLEN'), r.gt) for r in records]}")
    assert bench.precision >= 0.8
    assert bench.gt_concordance == 1.0
    # per-chromosome artifacts exist
    assert os.path.exists(os.path.join(out_dir, "chr21", "FocalSV_Final_SV.vcf"))


def test_auto_mode(genome, tmp_path):
    out_dir = str(tmp_path / "auto_out")
    rc = cli.main([
        "--bam_file", genome["bam"], "--ref_file", genome["ref"],
        "--out_dir", out_dir, "--data_type", "HIFI", "--auto",
    ])
    assert rc == 0
    bed = os.path.join(out_dir, "SV_Regions_HIFI.bed")
    assert os.path.exists(bed)
    from focalsv_tpu.io.bed import read_bed
    regions = read_bed(bed)
    # every true SV should fall inside a detected region
    for sv in genome["region"].svs:
        assert any(r.start <= sv.pos <= r.end for r in regions), sv
    final = os.path.join(out_dir, "FocalSV_Final_SV.vcf")
    _, records = read_vcf(final)
    truth = truth_from_sim(genome["region"].svs, "chr21", genome["region"].ref)
    bench = match_records(records, truth)
    assert bench.recall == 1.0
    assert bench.precision >= 0.8


def test_single_region_mode(genome, tmp_path):
    out_dir = str(tmp_path / "single")
    rc = cli.main([
        "--bam_file", genome["bam"], "--ref_file", genome["ref"],
        "--out_dir", out_dir, "--data_type", "HIFI",
        "--chr_num", "21", "-S", "38000", "-E", "52000",
    ])
    assert rc == 0
    _, records = read_vcf(os.path.join(out_dir, "FocalSV_Final_SV.vcf"))
    ins = [r for r in records if r.info.get("SVTYPE") == "INS"]
    assert any(abs(r.pos - 45_000) < 100 for r in ins)


def test_all_regions_failing_raises(genome, tmp_path, monkeypatch):
    """A systemic fault (every region throwing, e.g. device init failure)
    must fail loudly, not emit an empty 'no SVs' VCF."""
    from focalsv_tpu.pipeline import device_exec, main as pipeline_main

    def boom(*a, **kw):
        raise RuntimeError("device init failed")

    monkeypatch.setattr(pipeline_main, "process_region", boom)
    monkeypatch.setattr(device_exec, "build_tile", boom)
    with pytest.raises(RuntimeError, match="all .* regions failed"):
        pipeline_main.run_target_mode(
            genome["bam"], genome["ref"], str(tmp_path / "out"),
            preset("HIFI"), target_bed=genome["bed"], num_workers=2)
