import numpy as np
import pytest

from focalsv_tpu.io import bam as bamio
from focalsv_tpu.io import bed as bedio
from focalsv_tpu.io import fasta as faio
from focalsv_tpu.io import vcf as vcfio
from focalsv_tpu.io.bam import BamReader, BamRecord, BamWriter, build_bai
from focalsv_tpu.ops import encode as enc
from focalsv_tpu.testing import simulate as sim


def test_encode_roundtrip():
    s = "ACGTNacgtn"
    codes = enc.encode(s)
    assert enc.decode(codes) == "ACGTNACGTN"
    rc = enc.revcomp(enc.encode("ACGT"))
    assert enc.decode(rc) == "ACGT"[::-1].translate(str.maketrans("ACGT", "TGCA"))


def test_pack_ragged():
    seqs = [enc.encode("ACGT"), enc.encode("A" * 200)]
    tile, lens = enc.pack_ragged(seqs)
    assert tile.shape[1] % 128 == 0
    assert list(lens) == [4, 200]
    assert (tile[0, 4:] == enc.PAD).all()


def test_kmers():
    codes = enc.encode("ACGTACGT")
    kmers, valid = enc.kmer_codes_valid(codes, 4)
    assert len(kmers) == 5
    assert valid.all()
    # ACGT = 0b00011011 = 27
    assert kmers[0] == 0b00011011
    kmers2, valid2 = enc.kmer_codes_valid(enc.encode("ACNTACGT"), 4)
    assert not valid2[0] and valid2[4]


def test_fasta_roundtrip(tmp_path):
    p = str(tmp_path / "ref.fa")
    faio.write_fasta(p, [("chr1", "ACGTACGTAC"), ("chr2", enc.encode("TTTT"))])
    fa = faio.FastaFile.load(p)
    assert fa.names == ["chr1", "chr2"]
    assert enc.decode(fa.fetch("chr1", 2, 6)) == "GTAC"
    assert fa.lengths() == {"chr1": 10, "chr2": 4}


def test_bed_roundtrip(tmp_path):
    p = str(tmp_path / "r.bed")
    regions = [bedio.Region("chr1", 100, 200), bedio.Region("chr2", 5, 50)]
    bedio.write_bed(p, regions)
    out = bedio.read_bed(p)
    assert out == regions
    assert out[0].name() == "Region_chr1_S100_E200"


def test_vcf_roundtrip(tmp_path):
    p = str(tmp_path / "x.vcf")
    recs = [
        vcfio.VcfRecord("chr2", 500, "sv1", "A", "<DEL>", info={"SVTYPE": "DEL", "SVLEN": -100}, gt="0/1"),
        vcfio.VcfRecord("chr1", 100, "sv2", "A", "ACCT", info={"SVTYPE": "INS", "SVLEN": 3}, gt="1/1"),
    ]
    vcfio.write_vcf(p, recs, contigs={"chr1": 1000, "chr2": 1000})
    header, out = vcfio.read_vcf(p)
    assert any("SVTYPE" in h for h in header)
    assert [r.chrom for r in out] == ["chr1", "chr2"]  # sorted
    assert out[0].info["SVTYPE"] == "INS"
    assert out[1].svlen == 100
    assert out[0].gt == "1/1"


def test_cigar_parse():
    c = bamio.parse_cigar_string("10M2I5D3S")
    assert c.tolist() == [[0, 10], [1, 2], [2, 5], [4, 3]]


def _mk_record(name="r1", pos=10, cig="8M2D4M", seq="ACGTACGTACGT", tags=None):
    return BamRecord(
        name=name, flag=0, ref_id=0, pos=pos, mapq=55,
        cigar=bamio.parse_cigar_string(cig),
        seq=enc.encode(seq),
        qual=np.full(len(seq), 30, np.uint8),
        tags=tags or {},
    )


def test_bam_roundtrip(tmp_path):
    p = str(tmp_path / "t.bam")
    w = BamWriter(p, ["chr1"], [1000])
    recs = [
        _mk_record("r1", 10, "8M2D4M", "ACGTACGTACGT", {"HP": 1, "PS": 100, "SA": "chr1,5,+,3S9M,60,0;"}),
        _mk_record("r2", 50, "12M", "TTTTACGTACGT"),
    ]
    for r in recs:
        w.write(r)
    w.close()
    rd = BamReader(p)
    assert rd.ref_names == ["chr1"]
    assert rd.ref_lens == [1000]
    out = list(rd)
    assert len(out) == 2
    assert out[0].name == "r1"
    assert out[0].pos == 10
    assert out[0].cigar_string() == "8M2D4M"
    assert enc.decode(out[0].seq) == "ACGTACGTACGT"
    assert out[0].tags["HP"] == 1
    assert out[0].tags["PS"] == 100
    assert out[0].tags["SA"].startswith("chr1,5,+")
    assert out[0].reference_end == 10 + 8 + 2 + 4


def test_bam_fetch_with_index(tmp_path):
    p = str(tmp_path / "big.bam")
    w = BamWriter(p, ["chr1", "chr2"], [100_000, 50_000])
    rng = np.random.default_rng(0)
    poss = np.sort(rng.integers(0, 90_000, size=300))
    for i, pos in enumerate(poss):
        r = _mk_record(f"r{i}", int(pos), "100M", "A" * 100)
        w.write(r)
    # one record on chr2
    r2 = _mk_record("rX", 1000, "100M", "C" * 100)
    r2.ref_id = 1
    w.write(r2)
    w.close()
    build_bai(p)
    rd = BamReader(p)
    assert rd.bai is not None
    got = list(rd.fetch("chr1", 40_000, 45_000))
    expected = [i for i, pos in enumerate(poss) if pos < 45_000 and pos + 100 > 40_000]
    assert sorted(r.name for r in got) == sorted(f"r{i}" for i in expected)
    got2 = list(rd.fetch("chr2", 0, 50_000))
    assert [r.name for r in got2] == ["rX"]
    assert list(rd.fetch("chr2", 2000, 3000)) == []


def test_simulator_truth_cigars(tmp_path):
    region = sim.simulate_region(seed=1, ref_len=20_000, coverage=15)
    assert len(region.reads) > 5
    # every read's CIGAR must be consistent: query-consuming ops == seq len
    for rec in region.reads:
        qlen = int(rec.cigar[bamio.CONSUMES_QUERY[rec.cigar[:, 0]], 1].sum())
        assert qlen == rec.query_length
    # reads carrying the hom INS must show a ~400bp I op
    ins_sv = [s for s in region.svs if s.svtype == "INS"][0]
    spanning = [
        r for r in region.reads
        if r.pos + 500 < ins_sv.pos and r.reference_end > ins_sv.pos + 500
    ]
    assert spanning, "no reads span the INS"
    for r in spanning:
        has_ins = any(op == bamio.CINS and ln == ins_sv.length for op, ln in r.cigar)
        assert has_ins
    p = sim.write_region_bam(region, str(tmp_path / "sim.bam"))
    rd = BamReader(p)
    assert len(list(rd.fetch(region.chrom, 0, len(region.ref)))) == len(region.reads)


def test_simulator_error_model():
    region = sim.simulate_region(seed=2, ref_len=15_000, coverage=10,
                                 sub_rate=0.02, ins_rate=0.02, del_rate=0.02)
    for rec in region.reads:
        qlen = int(rec.cigar[bamio.CONSUMES_QUERY[rec.cigar[:, 0]], 1].sum())
        assert qlen == rec.query_length
        assert rec.cigar[:, 1].min() > 0


def test_native_libraries_build():
    """The native fast paths must actually compile in this image -- every
    caller has a silent Python fallback, so without this gate a C++ compile
    error would pass the whole suite while silently degrading the
    production path (it did, once)."""
    from focalsv_tpu import native
    assert native.get_lib() is not None, "chain.cpp failed to build"
    assert native.get_parse_lib() is not None, "bamparse.cpp failed to build"
    assert native.get_scan_lib() is not None, "bamscan.cpp failed to build"


def test_bam_midstream_corruption_raises(tmp_path):
    """A record whose length prefix is valid but whose inner fields are
    corrupt (negative l_seq) must raise, not silently truncate the record
    stream after the corruption point (review finding, round 4)."""
    import gzip
    import struct as structmod

    import numpy as np

    from focalsv_tpu.io import bam as bamio

    p = str(tmp_path / "c.bam")
    w = BamWriter(p, ["chr1"], [10_000])
    for i in range(3):
        w.write(BamRecord(
            name=f"r{i}", flag=0, ref_id=0, pos=100 * i, mapq=60,
            cigar=np.array([[0, 50]], np.int32),
            seq=np.zeros(50, np.uint8), qual=np.full(50, 30, np.uint8)))
    w.close()
    bamio.build_bai(p)
    # decompress the whole BGZF payload, find the middle record, corrupt
    # its l_seq field (offset 16 within the record body), re-write as one
    # plain BGZF-style stream via the writer's own codec
    rd = BamReader(p)
    data = bytearray()
    for chunk in rd.bgzf.stream_from(0):
        data.extend(chunk)
    body = data[rd._data_start_ubytes:]
    (sz0,) = structmod.unpack_from("<i", body, 0)
    rec1_off = 4 + sz0
    structmod.pack_into("<i", body, rec1_off + 16, -5)   # l_seq = -5
    # rebuild a BAM file with the corrupted payload
    import focalsv_tpu.io.bam as bm
    p2 = str(tmp_path / "c2.bam")
    with open(p2, "wb") as f:
        f.write(bm._bgzf_compress_block(
            bytes(data[: rd._data_start_ubytes]) + bytes(body)))
        f.write(bm.BGZF_EOF)
    with pytest.raises(ValueError, match="corrupt BAM record"):
        list(BamReader(p2))


def test_native_bgzf_inflate_parity(tmp_path):
    """The native block-parallel BGZF inflate must reproduce the Python
    reader's bytes exactly, and the whole-file record fast path must yield
    identical records to the streaming path."""
    import numpy as np

    from focalsv_tpu import native
    from focalsv_tpu.io.bam import BamReader, BamRecord, BamWriter, BgzfReader

    p = str(tmp_path / "t.bam")
    w = BamWriter(p, ["chr1"], [100_000])
    rng = np.random.default_rng(5)
    for i in range(200):
        n = int(rng.integers(30, 400))
        w.write(BamRecord(
            name=f"read_{i}", flag=0, ref_id=0, pos=10 * i, mapq=60,
            cigar=np.array([[0, n]], np.int32),
            seq=rng.integers(0, 4, n).astype(np.uint8),
            qual=np.full(n, 30, np.uint8), tags={"XX": i}))
    w.close()
    raw = open(p, "rb").read()
    nat = native.bgzf_inflate(raw)
    assert nat is not None
    assert nat.tobytes() == BgzfReader(p).read_all()
    r = BamReader(p)
    fast = r._iter_native_whole()
    slow = list(r._records_from_stream(r.bgzf.stream_from(0),
                                       skip=r._data_start_ubytes))
    assert fast is not None and len(fast) == len(slow)
    for a, b in zip(fast, slow):
        assert (a.name, a.flag, a.pos, a.mapq, a.tags) == \
            (b.name, b.flag, b.pos, b.mapq, b.tags)
        assert np.array_equal(a.cigar, b.cigar)
        assert np.array_equal(a.seq, b.seq)
        assert a.reference_end == b.reference_end
