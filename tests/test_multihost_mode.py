"""Simulated multi-host run: two 'hosts' sharding one BED, host-0 merge."""

import os

import numpy as np
import pytest

from focalsv_tpu.config import DataType, preset
from focalsv_tpu.evaluation.compare import match_records, truth_from_sim
from focalsv_tpu.io.bed import Region, write_bed
from focalsv_tpu.io.fasta import write_fasta
from focalsv_tpu.io.vcf import read_vcf
from focalsv_tpu.pipeline import main as pm
from focalsv_tpu.testing import simulate as sim


def test_two_host_sharded_run(tmp_path):
    rng = np.random.default_rng(17)
    svs = [
        sim.SimSV("DEL", 15_000, 200, "1/1"),
        sim.SimSV("INS", 45_000, 300, "1/1",
                  seq=rng.integers(0, 4, 300).astype(np.uint8)),
    ]
    region = sim.simulate_region(seed=900, ref_len=60_000, coverage=20,
                                 n_snps=40, svs=svs, chrom="chr21")
    bam = str(tmp_path / "r.bam")
    sim.write_region_bam(region, bam)
    ref = str(tmp_path / "ref.fa")
    write_fasta(ref, [("chr21", region.ref)])
    bed = str(tmp_path / "t.bed")
    write_bed(bed, [Region("chr21", 8_000, 25_000),
                    Region("chr21", 38_000, 55_000)])
    out = str(tmp_path / "out")
    cfg = preset(DataType.HIFI)
    # run "host 1" first (writes its shard), then "host 0" (merges)
    p1 = pm.run_target_mode(bam, ref, out, cfg, target_bed=bed,
                            process_index=1, process_count=2)
    assert os.path.basename(p1) == "host1.vcf"
    final = pm.run_target_mode(bam, ref, out, cfg, target_bed=bed,
                               process_index=0, process_count=2)
    assert os.path.basename(final) == "FocalSV_Final_SV.vcf"
    _, calls = read_vcf(final)
    truth = truth_from_sim(region.svs, "chr21", region.ref)
    bench = match_records(calls, truth)
    assert bench.recall == 1.0, [
        (r.pos, r.info.get("SVTYPE"), r.info.get("SVLEN")) for r in calls]
    # each shard saw one region
    _, h0 = read_vcf(os.path.join(out, "host0.vcf"))
    _, h1 = read_vcf(os.path.join(out, "host1.vcf"))
    assert len(h0) >= 1 and len(h1) >= 1
