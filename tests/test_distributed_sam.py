import numpy as np
import pytest

from focalsv_tpu.io import bam as bamio
from focalsv_tpu.io import sam as samio
from focalsv_tpu.io.bed import Region
from focalsv_tpu.ops import encode as enc
from focalsv_tpu.parallel import distributed as dist


def test_shard_regions_balanced():
    regions = [Region("chr1", i * 1000, i * 1000 + (1000 if i < 8 else 9000))
               for i in range(10)]
    shards = [dist.shard_regions(regions, i, 4) for i in range(4)]
    assert sum(len(s) for s in shards) == 10
    # all regions accounted for exactly once, order preserved
    flat = [r for s in shards for r in s]
    assert flat == regions
    # span-balanced: no shard gets everything
    spans = [sum(r.span for r in s) for s in shards]
    assert max(spans) < sum(spans)


def test_merge_host_vcfs(tmp_path):
    from focalsv_tpu.io.vcf import VcfRecord, read_vcf, write_vcf
    d = str(tmp_path)
    write_vcf(dist.host_vcf_path(d, 0),
              [VcfRecord("chr2", 10, "a", "A", "AT", info={"SVTYPE": "INS"})])
    write_vcf(dist.host_vcf_path(d, 1),
              [VcfRecord("chr1", 5, "b", "AT", "A", info={"SVTYPE": "DEL"})])
    final = dist.merge_host_vcfs(d, 2)
    _, recs = read_vcf(final)
    assert [r.chrom for r in recs] == ["chr1", "chr2"]


def test_sam_roundtrip(tmp_path):
    rec = bamio.BamRecord(
        name="r1", flag=16, ref_id=0, pos=99, mapq=60,
        cigar=bamio.parse_cigar_string("5M2I5M"),
        seq=enc.encode("ACGTACGTACGT"),
        qual=np.full(12, 35, np.uint8), tags={"HP": 1, "SA": "chr1,1,+,12M,60,0;"})
    p = str(tmp_path / "x.sam")
    samio.write_sam(p, [rec], ["chr1"], [1000])
    names, lens, records = samio.read_sam(p)
    assert names == ["chr1"] and lens == [1000]
    r = records[0]
    assert r.name == "r1" and r.pos == 99 and r.flag == 16
    assert r.cigar_string() == "5M2I5M"
    assert enc.decode(r.seq) == "ACGTACGTACGT"
    assert r.tags["HP"] == 1
    assert r.qual[0] == 35
