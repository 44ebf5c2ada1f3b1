import numpy as np
import pytest

from focalsv_tpu import native
from focalsv_tpu.config import DataType, preset
from focalsv_tpu.scan import read_scan
from focalsv_tpu.scan.fast_scan import scan_bam_native
from focalsv_tpu.testing import simulate as sim


@pytest.fixture(scope="module")
def sim_bam(tmp_path_factory):
    d = tmp_path_factory.mktemp("fastscan")
    region = sim.simulate_region(seed=77, ref_len=40_000, coverage=25,
                                 n_snps=10)
    path = str(d / "sim.bam")
    sim.write_region_bam(region, path)
    return path, region


def test_native_scan_matches_python(sim_bam):
    path, region = sim_bam
    if native.get_scan_lib() is None:
        pytest.skip("native scanner unavailable")
    cfg = preset(DataType.HIFI).read_scan
    fast = scan_bam_native(path, [region.chrom], cfg)
    assert fast is not None
    fres = fast[region.chrom]
    pres = read_scan.scan_records(region.reads, cfg)
    # same signature positions/lengths (names differ: hashes vs qnames)
    f_del = sorted((s.pos, s.length) for s in fres.del_sigs)
    p_del = sorted((s.pos, s.length) for s in pres.del_sigs)
    assert f_del == p_del
    f_ins = sorted((s.pos, s.length) for s in fres.ins_sigs)
    p_ins = sorted((s.pos, s.length) for s in pres.ins_sigs)
    assert f_ins == p_ins
    # INS sequences decode identically
    fi = sorted(fres.ins_sigs, key=lambda s: (s.pos, s.length))
    pi = sorted(pres.ins_sigs, key=lambda s: (s.pos, s.length))
    for a, b in zip(fi, pi):
        assert np.array_equal(a.seq, b.seq)
    # same spanning intervals
    assert sorted((s, e) for _, s, e in fres.read_spans) == \
        sorted((s, e) for _, s, e in pres.read_spans)


def test_native_scan_clustering_equivalence(sim_bam):
    path, region = sim_bam
    if native.get_scan_lib() is None:
        pytest.skip("native scanner unavailable")
    cfg = preset(DataType.HIFI).read_scan.__class__(min_support=3)
    fast = scan_bam_native(path, [region.chrom], cfg)[region.chrom]
    calls = read_scan.cluster_signatures(fast.del_sigs, region.chrom, "DEL",
                                         cfg, fast, genotype=True)
    calls += read_scan.cluster_signatures(fast.ins_sigs, region.chrom, "INS",
                                          cfg, fast, genotype=True)
    pcalls, pscan = read_scan.scan_chromosome(region.reads, region.chrom, cfg)
    got = sorted((c.svtype, c.pos, c.svlen, c.gt) for c in calls)
    want = sorted((c.svtype, c.pos, c.svlen, c.gt) for c in pcalls)
    assert got == want
