"""WGS memory discipline: whole-genome paths must not materialize the whole
BAM (VERDICT r1: `complexsv/cli.py` kept every chromosome's records, the
coverage estimator walked every read, the native-scan cache held every
chromosome's Python objects)."""

import numpy as np
import pytest

from focalsv_tpu import native
from focalsv_tpu.config import DataType, preset
from focalsv_tpu.io import bam as bamio
from focalsv_tpu.testing import simulate as sim


@pytest.fixture(scope="module")
def multi_chrom_bam(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wgs")
    chroms = ["chr1", "chr2", "chr3"]
    L = 60_000
    regions = [sim.simulate_region(seed=9100 + i, ref_len=L, coverage=10,
                                   n_snps=10, chrom=c)
               for i, c in enumerate(chroms)]
    path = str(tmp / "wgs.bam")
    w = bamio.BamWriter(path, chroms, [L] * 3)
    for i, rg in enumerate(regions):
        for rec in rg.reads:
            import dataclasses
            w.write(dataclasses.replace(rec, ref_id=i))
    w.close()
    bamio.build_bai(path)
    return path, chroms, L


def test_native_scan_holds_one_chromosome(multi_chrom_bam):
    path, chroms, L = multi_chrom_bam
    if native.get_scan_lib() is None:
        pytest.skip("native scanner unavailable")
    from focalsv_tpu.scan.fast_scan import scan_bam_native
    scan = scan_bam_native(path, chroms, preset(DataType.HIFI).read_scan)
    assert scan is not None
    for c in chroms:
        res = scan.get(c)
        assert res is not None and res.read_spans
        # the lazy cache never holds more than the current chromosome
        assert list(scan._cache) == [c]
    # repeated get of the cached chromosome is the same object (no rebuild)
    assert scan.get(chroms[-1]) is scan.get(chroms[-1])


def test_estimate_bam_cov_samples_bins(multi_chrom_bam):
    path, chroms, L = multi_chrom_bam
    from focalsv_tpu.utils.coverage import estimate_bam_cov
    bam = bamio.ensure_indexed(path)
    fetches = []
    orig = bam.fetch

    def spy(chrom, start=None, end=None):
        fetches.append((chrom, start, end))
        return orig(chrom, start, end)

    bam.fetch = spy
    cov = estimate_bam_cov(bam, chroms, n_bins=12)
    assert 5 <= cov <= 15            # simulated ~10x
    # every fetch is a bounded bin, never a whole-chromosome walk
    assert fetches and all(s is not None and e is not None and e - s <= L
                           for _, s, e in fetches)


def test_complex_auto_streams_segments(multi_chrom_bam):
    path, chroms, L = multi_chrom_bam
    from focalsv_tpu.complexsv import auto as cauto
    bam = bamio.ensure_indexed(path)
    segs, spans = cauto.stream_segments_and_spans(bam)
    assert set(spans) == set(chroms)
    for c in chroms:
        assert spans[c].shape[1] == 2 and spans[c].shape[0] > 0
    # parity with the record-materializing path
    records_by_chrom = {c: list(bam.fetch(c)) for c in chroms}
    res_stream = cauto.call_complex_from_segments(segs, "HIFI")
    res_full = cauto.call_complex_auto(records_by_chrom, "HIFI")
    assert {c: len(v) for c, v in res_stream.invs.items()} == \
        {c: len(v) for c, v in res_full.invs.items()}
    assert {c: len(v) for c, v in res_stream.dups.items()} == \
        {c: len(v) for c, v in res_full.dups.items()}
