import os

import numpy as np
import pytest

from focalsv_tpu.config import DataType, preset
from focalsv_tpu.io import bam as bamio
from focalsv_tpu.io.bed import Region, write_bed
from focalsv_tpu.io.fasta import write_fasta
from focalsv_tpu.pipeline import main as pm
from focalsv_tpu.testing import simulate as sim


def test_region_artifacts_and_resume(tmp_path):
    region = sim.simulate_region(seed=55, ref_len=25_000, coverage=20, n_snps=20)
    bam_path = str(tmp_path / "r.bam")
    sim.write_region_bam(region, bam_path)
    ref_path = str(tmp_path / "ref.fa")
    write_fasta(ref_path, [("chr21", region.ref)])
    bed = str(tmp_path / "r.bed")
    write_bed(bed, [Region("chr21", 2_000, 23_000)])
    out = str(tmp_path / "out")
    cfg = preset(DataType.HIFI)
    final = pm.run_target_mode(bam_path, ref_path, out, cfg, target_bed=bed)
    rdir = os.path.join(out, "chr21", "regions", "Region_chr21_S2000_E23000")
    phased = os.path.join(rdir, "region_phased.bam")
    assert os.path.exists(phased)
    rd = bamio.BamReader(phased)
    recs = list(rd)
    assert recs
    tagged = [r for r in recs if "HP" in r.tags and "PS" in r.tags]
    assert tagged, "no HP/PS tags written"
    assert {r.tags["HP"] for r in tagged} <= {1, 2}
    assert os.path.exists(os.path.join(rdir, "HP1.fa"))
    assert os.path.exists(os.path.join(rdir, "HP2.fa"))
    # resume: tamper with the chromosome VCF, rerun with resume -> untouched
    chrom_vcf = os.path.join(out, "chr21", "FocalSV_Final_SV.vcf")
    mtime = os.path.getmtime(chrom_vcf)
    pm.run_target_mode(bam_path, ref_path, out, cfg, target_bed=bed,
                       resume=True)
    assert os.path.getmtime(chrom_vcf) == mtime
