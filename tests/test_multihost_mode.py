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
    # both hosts run CONCURRENTLY: host 0 must block on the merge barrier
    # until host 1's shard VCF lands, then merge
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=2) as ex:
        f0 = ex.submit(pm.run_target_mode, bam, ref, out, cfg,
                       target_bed=bed, process_index=0, process_count=2)
        f1 = ex.submit(pm.run_target_mode, bam, ref, out, cfg,
                       target_bed=bed, process_index=1, process_count=2)
        p1 = f1.result(timeout=600)
        final = f0.result(timeout=600)
    assert os.path.basename(p1) == "host1.vcf"
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


def test_boundary_straddling_duplicate_collapses(tmp_path):
    """An SV inside the OVERLAP of two hosts' shard-boundary regions is
    called by both hosts; the host-0 merge must collapse it to one record
    (cross-shard dedup at the gather point)."""
    rng = np.random.default_rng(23)
    svs = [sim.SimSV("DEL", 27_000, 220, "1/1")]
    region = sim.simulate_region(seed=901, ref_len=50_000, coverage=20,
                                 n_snps=35, svs=svs, chrom="chr21")
    bam = str(tmp_path / "r.bam")
    sim.write_region_bam(region, bam)
    ref = str(tmp_path / "ref.fa")
    write_fasta(ref, [("chr21", region.ref)])
    bed = str(tmp_path / "t.bed")
    # spans overlap across the shard boundary: both shards cover the SV
    # equal spans so the span-balanced sharder gives one region per host
    write_bed(bed, [Region("chr21", 10_000, 32_000),
                    Region("chr21", 22_000, 44_000)])
    out = str(tmp_path / "out")
    cfg = preset(DataType.HIFI)
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=2) as ex:
        f0 = ex.submit(pm.run_target_mode, bam, ref, out, cfg,
                       target_bed=bed, process_index=0, process_count=2)
        f1 = ex.submit(pm.run_target_mode, bam, ref, out, cfg,
                       target_bed=bed, process_index=1, process_count=2)
        f1.result(timeout=600)
        final = f0.result(timeout=600)
    # both hosts called the DEL on their own shard
    _, h0 = read_vcf(os.path.join(out, "host0.vcf"))
    _, h1 = read_vcf(os.path.join(out, "host1.vcf"))
    assert any(r.svtype == "DEL" for r in h0)
    assert any(r.svtype == "DEL" for r in h1)
    # ...but the genome-wide VCF carries it once
    _, calls = read_vcf(final)
    dels = [r for r in calls if r.svtype == "DEL"
            and abs(r.pos - 27_000) < 2_000]
    assert len(dels) == 1, [(r.pos, r.info) for r in calls]


def test_gather_records_roundtrip():
    """Fixed-width record encode/decode is lossless (the collective-gather
    wire format, parallel/gather.py); single-process allgather is identity."""
    from focalsv_tpu.io.vcf import VcfRecord
    from focalsv_tpu.parallel import gather

    recs = [
        VcfRecord("chr21", 100, "a", "ATTTT", "A", "20", "PASS",
                  {"SVTYPE": "DEL", "SVLEN": -4, "TIG_REGION": "c:0-1"},
                  "0/1"),
        VcfRecord("chr2", 99, "b", "A", "A" + "ACGT" * 200, ".", "PASS",
                  {"SVTYPE": "INS", "SVLEN": 800}, "1/1"),
    ]
    flat, lens = gather.encode_records(recs)
    back = gather.decode_records(flat, lens)
    assert [r.to_line() for r in back] == [r.to_line() for r in recs]
    assert gather.allgather_records(recs) == recs


def test_gather_encoding_is_width_safe():
    """One 50 kb-ALT INS among 1k small records must NOT pad every record
    to the long line's width: the offset encoding keeps the payload at
    O(total record bytes), like the reference's `cat` (focalsv.py:66-70)."""
    import numpy as np

    from focalsv_tpu.io.vcf import VcfRecord
    from focalsv_tpu.parallel import gather

    long_alt = "A" + "ACGT" * 12_500           # 50 kb ALT sequence
    recs = [VcfRecord("chr1", 1000, "big", "A", long_alt, ".", "PASS",
                      {"SVTYPE": "INS", "SVLEN": 50_000}, "0/1")]
    for i in range(1000):
        recs.append(VcfRecord("chr1", 2000 + i * 40, f"s{i}", "ATT", "A",
                              ".", "PASS", {"SVTYPE": "DEL", "SVLEN": -2},
                              "0/1"))
    flat, lens = gather.encode_records(recs)
    total = int(lens.sum())
    assert flat.size == total                   # zero padding inside a host
    # the old fixed-width scheme would ship >50 MB (1001 rows x ~50 kb);
    # the offset encoding ships the actual bytes (~130 kB)
    assert total < 200_000
    back = gather.decode_records(flat, lens)
    assert [r.to_line() for r in back] == [r.to_line() for r in recs]


def test_merge_barrier_raises_on_missing_host(tmp_path):
    """A straggler host must fail the merge loudly (named), never shrink the
    genome-wide VCF silently."""
    from focalsv_tpu.io.vcf import VcfRecord, write_vcf
    from focalsv_tpu.parallel import distributed as dist

    out = str(tmp_path)
    write_vcf(dist.host_vcf_path(out, 0),
              [VcfRecord("chr1", 100, "x", "AT", "A",
                         info={"SVTYPE": "DEL", "SVLEN": -1})])
    with pytest.raises(RuntimeError, match="host1.vcf"):
        dist.merge_host_vcfs(out, 2, timeout_s=1.0, poll_s=0.05)


def test_merge_barrier_waits_for_late_host(tmp_path):
    """The barrier must WAIT for a slow host, not race past it."""
    import threading
    import time

    from focalsv_tpu.io.vcf import VcfRecord, read_vcf, write_vcf
    from focalsv_tpu.parallel import distributed as dist

    out = str(tmp_path)
    write_vcf(dist.host_vcf_path(out, 0),
              [VcfRecord("chr1", 100, "x", "AT", "A",
                         info={"SVTYPE": "DEL", "SVLEN": -1})])

    def late_writer():
        time.sleep(0.6)
        tmp = dist.host_vcf_path(out, 1) + ".tmp"
        write_vcf(tmp, [VcfRecord("chr1", 900, "y", "A", "AGG",
                                  info={"SVTYPE": "INS", "SVLEN": 2})])
        os.replace(tmp, dist.host_vcf_path(out, 1))

    t = threading.Thread(target=late_writer)
    t.start()
    final = dist.merge_host_vcfs(out, 2, timeout_s=30.0, poll_s=0.05)
    t.join()
    _, recs = read_vcf(final)
    assert {r.pos for r in recs} == {100, 900}
