"""Mini-WGS: two chromosomes, auto mode with a population prior VCF."""

import os

import numpy as np
import pytest

from focalsv_tpu.config import DataType, preset
from focalsv_tpu.evaluation.compare import match_records, truth_from_sim
from focalsv_tpu.io import bam as bamio
from focalsv_tpu.io.fasta import write_fasta
from focalsv_tpu.io.vcf import VcfRecord, read_vcf, write_vcf
from focalsv_tpu.pipeline import cli
from focalsv_tpu.testing import simulate as sim


@pytest.fixture(scope="module")
def wgs(tmp_path_factory):
    d = tmp_path_factory.mktemp("miniwgs")
    rng = np.random.default_rng(88)
    chroms = {}
    truth = []
    all_reads = {}
    for ci, chrom in enumerate(("chr1", "chr2")):
        svs = [
            sim.SimSV("DEL", 18_000, 150 + 40 * ci, "0/1"),
            sim.SimSV("INS", 42_000, 220 + 30 * ci, "1/1",
                      seq=rng.integers(0, 4, 220 + 30 * ci).astype(np.uint8)),
        ]
        region = sim.simulate_region(seed=700 + ci, ref_len=60_000,
                                     coverage=20, n_snps=50, svs=svs,
                                     chrom=chrom)
        chroms[chrom] = region
        truth.extend(truth_from_sim(region.svs, chrom, region.ref))
        all_reads[chrom] = region.reads
    bam_path = str(d / "wgs.bam")
    w = bamio.BamWriter(bam_path, list(chroms),
                        [len(chroms[c].ref) for c in chroms])
    for ci, chrom in enumerate(chroms):
        for rec in all_reads[chrom]:
            rec.ref_id = ci
            w.write(rec)
    w.close()
    bamio.build_bai(bam_path)
    ref_path = str(d / "ref.fa")
    write_fasta(ref_path, [(c, chroms[c].ref) for c in chroms])
    # prior VCF: one true site + one decoy per chromosome
    prior_path = str(d / "prior.vcf")
    prior = []
    for chrom, region in chroms.items():
        prior.append(VcfRecord(chrom, region.svs[0].pos + 25, ".", "N",
                               "<DEL>", info={"SVTYPE": "DEL"}))
        prior.append(VcfRecord(chrom, 55_000, ".", "N", "<INS>",
                               info={"SVTYPE": "INS"}))
    write_vcf(prior_path, prior)
    return dict(dir=str(d), bam=bam_path, ref=ref_path, prior=prior_path,
                truth=truth, chroms=chroms)


def test_auto_mode_wgs_with_prior(wgs, tmp_path):
    out = str(tmp_path / "out")
    rc = cli.main(["--bam_file", wgs["bam"], "--ref_file", wgs["ref"],
                   "--out_dir", out, "--data_type", "HIFI", "--auto",
                   "--prior_file", wgs["prior"]])
    assert rc == 0
    _, calls = read_vcf(os.path.join(out, "FocalSV_Final_SV.vcf"))
    bench = match_records(calls, wgs["truth"])
    assert bench.recall == 1.0, (
        f"recall {bench.recall}; calls="
        f"{[(r.chrom, r.pos, r.info.get('SVTYPE'), r.info.get('SVLEN')) for r in calls]}")
    assert bench.precision >= 0.8
    assert bench.gt_concordance == 1.0
    # both chromosomes produced per-chromosome outputs
    assert os.path.exists(os.path.join(out, "chr1", "FocalSV_Final_SV.vcf"))
    assert os.path.exists(os.path.join(out, "chr2", "FocalSV_Final_SV.vcf"))
    # merged VCF is coordinate-sorted across chromosomes
    chrom_order = [r.chrom for r in calls]
    assert chrom_order == sorted(chrom_order, key=lambda c: int(c[3:]))
