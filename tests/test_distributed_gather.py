"""REAL jax.distributed execution of the collective-gather branch.

Launches two actual jax processes (CPU backend, gloo collectives,
localhost coordinator) running the production run_target_mode with
process_count=2.  With jax.process_count() == 2 inside both workers, the
collective branch of pipeline/main.py (allgather_records over device
collectives + gather-point dedup) executes for real -- previous rounds
only exercised it emulated (threads, process_count=1 -> file-merge
fallback).  The final VCF must equal the file-merge fallback's output on
the identical input.

Reference contrast: README.md:207-213 (SLURM + `cat | vcf-sort`).
"""

import os
import socket
import subprocess
import sys

import numpy as np

from focalsv_tpu.config import DataType, preset
from focalsv_tpu.io.bed import Region, write_bed
from focalsv_tpu.io.fasta import write_fasta
from focalsv_tpu.io.vcf import read_vcf
from focalsv_tpu.testing import simulate as sim

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _simulate_inputs(tmp_path):
    rng = np.random.default_rng(31)
    svs = [
        sim.SimSV("DEL", 15_000, 200, "1/1"),
        sim.SimSV("INS", 45_000, 300, "1/1",
                  seq=rng.integers(0, 4, 300).astype(np.uint8)),
    ]
    region = sim.simulate_region(seed=910, ref_len=60_000, coverage=20,
                                 n_snps=40, svs=svs, chrom="chr21")
    bam = str(tmp_path / "r.bam")
    sim.write_region_bam(region, bam)
    ref = str(tmp_path / "ref.fa")
    write_fasta(ref, [("chr21", region.ref)])
    bed = str(tmp_path / "t.bed")
    write_bed(bed, [Region("chr21", 8_000, 25_000),
                    Region("chr21", 38_000, 55_000)])
    return bam, ref, bed


def test_collective_gather_executes_for_real(tmp_path):
    bam, ref, bed = _simulate_inputs(tmp_path)
    out = str(tmp_path / "out_dist")
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)        # workers use plain single-device CPU
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "focalsv_tpu.testing.dist_worker",
             "--pid", str(pid), "--nprocs", "2", "--port", str(port),
             "--bam", bam, "--ref", ref, "--bed", bed, "--out", out],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=800)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout)
    for pid, (p, stdout) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{stdout[-4000:]}"
    # host 0 wrote the genome-wide VCF through the collective branch
    # (log line says so); host 1 returned its per-host VCF
    assert "final VCF (collective gather)" in outputs[0] + outputs[1]
    final = os.path.join(out, "FocalSV_Final_SV.vcf")
    assert os.path.exists(final)
    _, dist_recs = read_vcf(final)
    assert any(r.svtype == "DEL" for r in dist_recs)
    assert any(r.svtype == "INS" for r in dist_recs)

    # the file-merge fallback (threads, jax.process_count()==1) on the
    # SAME input must produce the identical record set
    from concurrent.futures import ThreadPoolExecutor

    from focalsv_tpu.pipeline import main as pm
    out2 = str(tmp_path / "out_emul")
    cfg = preset(DataType.HIFI)
    with ThreadPoolExecutor(max_workers=2) as ex:
        f0 = ex.submit(pm.run_target_mode, bam, ref, out2, cfg,
                       target_bed=bed, process_index=0, process_count=2)
        f1 = ex.submit(pm.run_target_mode, bam, ref, out2, cfg,
                       target_bed=bed, process_index=1, process_count=2)
        f1.result(timeout=600)
        emul_final = f0.result(timeout=600)
    _, emul_recs = read_vcf(emul_final)
    assert [r.to_line() for r in dist_recs] == \
        [r.to_line() for r in emul_recs]
