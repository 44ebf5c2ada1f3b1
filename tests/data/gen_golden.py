"""Generate the committed byte-stable end-to-end golden fixtures.

Run from the repo root:

    PYTHONPATH=. python tests/data/gen_golden.py [--update-expected]

Writes tests/data/golden/<dtype>/{reads.bam,ref.fa,regions.bed} for
HIFI/CLR/ONT deterministically (fixed seeds, no time/machine dependence).
With --update-expected it also runs the full target-mode pipeline (host
execution, 1 worker, CPU backend) per dtype and rewrites expected.vcf —
do that ONLY when an output change is intentional; the point of the
fixture is that test_golden_e2e.py fails on any drift (reference analog:
the shipped step-0 golden BED,
test/SV_Regions_HG002_HIFI_L1_FocalSV-auto.bed).
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden")

# per-dtype read-error models (bench_accuracy.py ERR_MODELS)
ERR = {
    "HIFI": {},
    "CLR": dict(sub_rate=0.06, ins_rate=0.03, del_rate=0.03),
    "ONT": dict(sub_rate=0.04, ins_rate=0.02, del_rate=0.02),
}


def build_inputs(dtype: str) -> dict:
    from focalsv_tpu.io.bed import Region, write_bed
    from focalsv_tpu.io.fasta import write_fasta
    from focalsv_tpu.testing import simulate as sim

    rng = np.random.default_rng(20260821)
    svs = [
        sim.SimSV("DEL", 18_000, 180, "0/1"),
        sim.SimSV("INS", 41_000, 250, "1/1",
                  seq=rng.integers(0, 4, 250).astype(np.uint8)),
        sim.SimSV("DEL", 76_000, 600, "1/1"),
        sim.SimSV("INS", 103_000, 95, "0/1",
                  seq=rng.integers(0, 4, 95).astype(np.uint8)),
        sim.SimSV("DEL", 131_000, 70, "0/1"),
    ]
    region = sim.simulate_region(seed=20260821, ref_len=150_000,
                                 coverage=24, n_snps=150, svs=svs,
                                 chrom="chr21", **ERR[dtype])
    d = os.path.join(GOLDEN, dtype.lower())
    os.makedirs(d, exist_ok=True)
    bam = os.path.join(d, "reads.bam")
    sim.write_region_bam(region, bam)
    ref = os.path.join(d, "ref.fa")
    write_fasta(ref, [("chr21", region.ref)])
    bed = os.path.join(d, "regions.bed")
    write_bed(bed, [
        Region("chr21", 10_000, 26_000),
        Region("chr21", 34_000, 48_000),
        Region("chr21", 68_000, 84_000),
        Region("chr21", 96_000, 110_000),
        Region("chr21", 124_000, 138_000),
    ])
    return dict(bam=bam, ref=ref, bed=bed, dir=d)


def run_pipeline(paths: dict, out_dir: str, dtype: str) -> str:
    from focalsv_tpu.pipeline import cli
    rc = cli.main([
        "--bam_file", paths["bam"], "--ref_file", paths["ref"],
        "--out_dir", out_dir, "--data_type", dtype,
        "--target_bed", paths["bed"], "--num_threads", "1",
        "--execution", "host",
    ])
    assert rc == 0
    return os.path.join(out_dir, "FocalSV_Final_SV.vcf")


def main(argv) -> int:
    for dtype in ("HIFI", "CLR", "ONT"):
        paths = build_inputs(dtype)
        print(f"{dtype}: inputs written to {paths['dir']}")
        if "--update-expected" in argv:
            import tempfile
            with tempfile.TemporaryDirectory() as td:
                out = run_pipeline(paths, os.path.join(td, "out"), dtype)
                with open(out) as f:
                    text = f.read()
            with open(os.path.join(paths["dir"], "expected.vcf"), "w") as f:
                f.write(text)
            n = sum(1 for line in text.splitlines()
                    if not line.startswith("#"))
            print(f"{dtype}: expected.vcf updated ({n} records)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
