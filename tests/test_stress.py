"""Stress cases: large SVs, clustered events, low coverage, edge proximity."""

import numpy as np
import pytest

from focalsv_tpu.config import DataType, preset
from focalsv_tpu.evaluation.compare import match_records, truth_from_sim
from focalsv_tpu.pipeline.region import process_region
from focalsv_tpu.testing import simulate as sim


def _run(region, dtype=DataType.HIFI, check_seq=True):
    cfg = preset(dtype)
    res = process_region(region.reads, region.ref, 0, region.chrom, cfg)
    truth = truth_from_sim(region.svs, region.chrom, region.ref)
    return match_records(res.records, truth, check_seq=check_seq), res


def test_large_deletion_5kb():
    svs = [sim.SimSV("DEL", 20_000, 5_000, "1/1")]
    region = sim.simulate_region(seed=301, ref_len=50_000, coverage=22,
                                 n_snps=30, svs=svs, sub_rate=0.002)
    bench, res = _run(region)
    assert bench.recall == 1.0, [
        (r.info["SVTYPE"], r.pos, r.info["SVLEN"]) for r in res.records]


def test_large_insertion_2kb():
    rng = np.random.default_rng(5)
    svs = [sim.SimSV("INS", 15_000, 2_000, "0/1",
                     seq=rng.integers(0, 4, 2_000).astype(np.uint8))]
    region = sim.simulate_region(seed=302, ref_len=35_000, coverage=25,
                                 n_snps=25, svs=svs, sub_rate=0.002)
    bench, res = _run(region)
    assert bench.recall == 1.0, [
        (r.info["SVTYPE"], r.pos, r.info["SVLEN"], r.gt) for r in res.records]
    assert bench.gt_concordance == 1.0


def test_clustered_svs():
    """Two het SVs 2kb apart on opposite haplotypes."""
    rng = np.random.default_rng(6)
    svs = [
        sim.SimSV("DEL", 14_000, 120, "1|0"),
        sim.SimSV("INS", 16_000, 150, "0|1",
                  seq=rng.integers(0, 4, 150).astype(np.uint8)),
    ]
    region = sim.simulate_region(seed=303, ref_len=30_000, coverage=28,
                                 n_snps=30, svs=svs, sub_rate=0.002)
    bench, res = _run(region)
    assert bench.recall == 1.0, [
        (r.info["SVTYPE"], r.pos, r.info["SVLEN"], r.gt) for r in res.records]
    for r in res.records:
        if r.svlen >= 50:
            assert r.gt == "0/1"


def test_low_coverage():
    region = sim.simulate_region(seed=304, ref_len=25_000, coverage=8,
                                 n_snps=20, sub_rate=0.002)
    bench, res = _run(region)
    assert bench.recall >= 0.5   # low coverage may drop the het


def test_deletion_in_tandem_repeat():
    """A DEL inside a 2kb tandem-repeat tract (50bp unit): the chain must
    rejoin across the repeat instead of splitting into clipped pieces."""
    from focalsv_tpu.io import bam as bamio

    rng = np.random.default_rng(7)
    unit = rng.integers(0, 4, 50).astype(np.uint8)
    ref = np.concatenate([
        rng.integers(0, 4, 12_000).astype(np.uint8),
        np.tile(unit, 40),
        rng.integers(0, 4, 12_000).astype(np.uint8)])
    svs = [sim.SimSV("DEL", 12_500, 200, "1/1")]
    snps = []
    for p in list(range(500, 11_500, 700)) + list(range(14_500, 25_000, 700)):
        snps.append(sim.SimSNP(p, int(ref[p]), (int(ref[p]) + 1) % 4,
                               "1|0" if p % 2 else "0|1"))
    snps.sort(key=lambda s: s.pos)
    haps = (sim.apply_variants(ref, svs, snps, 0),
            sim.apply_variants(ref, svs, snps, 1))
    region = sim.SimulatedRegion(chrom="chr21", ref=ref, haps=haps,
                                 svs=svs, snps=snps)
    rng2 = np.random.default_rng(2)
    for i in range(50):
        h = i % 2
        hap = haps[h]
        rl = min(12_000, len(hap.seq))
        s = int(rng2.integers(0, len(hap.seq) - rl + 1))
        rs, cig = sim._true_cigar(hap, s, s + rl)
        if not cig:
            continue
        seq = hap.seq[s : s + rl].copy()
        region.reads.append(bamio.BamRecord(
            name=f"r{h}_{i}", flag=0, ref_id=0, pos=rs, mapq=60,
            cigar=np.array(cig, np.int32).reshape(-1, 2), seq=seq,
            qual=np.full(len(seq), 40, np.uint8)))
        region.read_hap.append(h)
    bench, res = _run(region)
    assert bench.recall == 1.0, [
        (r.info["SVTYPE"], r.pos, r.info["SVLEN"], r.gt) for r in res.records]


def test_repeat_expansion_insertion():
    """A 200bp expansion (4 extra units) of a 50bp tandem repeat."""
    from focalsv_tpu.io import bam as bamio

    rng = np.random.default_rng(9)
    unit = rng.integers(0, 4, 50).astype(np.uint8)
    ref = np.concatenate([
        rng.integers(0, 4, 12_000).astype(np.uint8),
        np.tile(unit, 40),
        rng.integers(0, 4, 12_000).astype(np.uint8)])
    svs = [sim.SimSV("INS", 12_500, 200, "1/1", seq=np.tile(unit, 4))]
    snps = []
    for p in list(range(500, 11_500, 700)) + list(range(14_500, 25_000, 700)):
        snps.append(sim.SimSNP(p, int(ref[p]), (int(ref[p]) + 1) % 4,
                               "1|0" if p % 2 else "0|1"))
    snps.sort(key=lambda s: s.pos)
    haps = (sim.apply_variants(ref, svs, snps, 0),
            sim.apply_variants(ref, svs, snps, 1))
    region = sim.SimulatedRegion(chrom="chr21", ref=ref, haps=haps,
                                 svs=svs, snps=snps)
    rng2 = np.random.default_rng(3)
    for i in range(50):
        h = i % 2
        hap = haps[h]
        rl = min(12_000, len(hap.seq))
        s = int(rng2.integers(0, len(hap.seq) - rl + 1))
        rs, cig = sim._true_cigar(hap, s, s + rl)
        if not cig:
            continue
        seq = hap.seq[s : s + rl].copy()
        region.reads.append(bamio.BamRecord(
            name=f"r{h}_{i}", flag=0, ref_id=0, pos=rs, mapq=60,
            cigar=np.array(cig, np.int32).reshape(-1, 2), seq=seq,
            qual=np.full(len(seq), 40, np.uint8)))
        region.read_hap.append(h)
    bench, res = _run(region, check_seq=False)
    assert bench.recall == 1.0, [
        (r.info["SVTYPE"], r.pos, r.info["SVLEN"], r.gt) for r in res.records]


def test_no_sv_region_clean():
    """A region with no SVs must produce (almost) no >=50bp calls."""
    region = sim.simulate_region(seed=305, ref_len=25_000, coverage=22,
                                 n_snps=25, svs=[], sub_rate=0.002)
    cfg = preset(DataType.HIFI)
    res = process_region(region.reads, region.ref, 0, region.chrom, cfg)
    big = [r for r in res.records if r.svlen >= 50]
    assert len(big) == 0, [(r.info["SVTYPE"], r.pos, r.info["SVLEN"]) for r in big]
