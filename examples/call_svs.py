"""End-to-end example: simulate a diploid genome, call SVs, benchmark.

Run:  python examples/call_svs.py [out_dir]

Uses the framework's own simulator (no external data needed), writes
BAM/FASTA/BED inputs, runs target mode through the CLI entry, and scores the
calls against the simulated truth with the in-process Truvari-style harness.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from focalsv_tpu.config import DataType, preset
from focalsv_tpu.evaluation.compare import match_records, truth_from_sim
from focalsv_tpu.io.bed import Region, write_bed
from focalsv_tpu.io.fasta import write_fasta
from focalsv_tpu.io.vcf import read_vcf
from focalsv_tpu.pipeline import cli
from focalsv_tpu.testing import simulate as sim


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "./example_out"
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(1)
    svs = [
        sim.SimSV("DEL", 25_000, 180, "0/1"),
        sim.SimSV("INS", 60_000, 350, "1/1",
                  seq=rng.integers(0, 4, 350).astype(np.uint8)),
        sim.SimSV("DEL", 95_000, 700, "1/1"),
    ]
    print("simulating 130 kb diploid chromosome with 3 SVs ...")
    region = sim.simulate_region(seed=11, ref_len=130_000, coverage=22,
                                 n_snps=120, svs=svs, chrom="chr21")
    bam = os.path.join(out_dir, "reads.bam")
    sim.write_region_bam(region, bam)
    ref = os.path.join(out_dir, "ref.fa")
    write_fasta(ref, [("chr21", region.ref)])
    bed = os.path.join(out_dir, "targets.bed")
    write_bed(bed, [Region("chr21", 15_000, 35_000),
                    Region("chr21", 50_000, 70_000),
                    Region("chr21", 85_000, 105_000)])
    print("running focalsv-tpu target mode ...")
    cli.main(["--bam_file", bam, "--ref_file", ref, "--out_dir", out_dir,
              "--data_type", "HIFI", "--target_bed", bed])
    final = os.path.join(out_dir, "FocalSV_Final_SV.vcf")
    _, calls = read_vcf(final)
    truth = truth_from_sim(region.svs, "chr21", region.ref)
    bench = match_records(calls, truth)
    print(f"calls: {len(calls)}  ->  {final}")
    for r in calls:
        print(f"  {r.chrom}:{r.pos} {r.info.get('SVTYPE')} "
              f"len={r.info.get('SVLEN')} GT={r.gt}")
    print(json.dumps(dict(recall=bench.recall, precision=bench.precision,
                          f1=round(bench.f1, 4),
                          gt_concordance=bench.gt_concordance)))


if __name__ == "__main__":
    main()
