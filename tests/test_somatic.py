"""SURVIVOR-protocol somatic merge (evaluation/somatic.py)."""

from focalsv_tpu.evaluation.somatic import somatic_call, survivor_merge
from focalsv_tpu.io.vcf import VcfRecord


def _sv(chrom, pos, svtype, svlen, end=None, filt="PASS", id="x"):
    info = {"SVTYPE": svtype, "SVLEN": svlen}
    if end is not None:
        info["END"] = end
    return VcfRecord(chrom, pos, id, "N", "<%s>" % svtype, ".", filt,
                     info, "0/1")


def test_survivor_merge_breakpoint_tolerance():
    normal = [_sv("chr1", 10_000, "INV", 500, end=10_500)]
    tumor = [_sv("chr1", 10_040, "INV", 500, end=10_540),   # within 101
             _sv("chr1", 50_000, "INV", 400, end=50_400)]   # tumor-only
    merged = survivor_merge([normal, tumor], max_dist=101)
    vecs = sorted(m.supp_vec for m in merged)
    assert vecs == ["01", "11"]
    # both breakpoints must agree: same start, far end -> no merge
    tumor2 = [_sv("chr1", 10_020, "INV", 2_000, end=12_020)]
    merged2 = survivor_merge([normal, tumor2], max_dist=101)
    assert sorted(m.supp_vec for m in merged2) == ["01", "10"]
    # type mismatch -> no merge
    tumor3 = [_sv("chr1", 10_000, "DUP", 500, end=10_500)]
    merged3 = survivor_merge([normal, tumor3], max_dist=101)
    assert sorted(m.supp_vec for m in merged3) == ["01", "10"]


def test_somatic_call_protocol():
    normal = [
        _sv("chr1", 10_000, "INV", 300, end=10_300),      # germline (shared)
        _sv("chr1", 90_000, "DUP", 5_000, end=95_000),    # germline
        _sv("chr2", 5_000, "TRA", 0),                     # germline BND
    ]
    tumor = [
        _sv("chr1", 10_030, "INV", 300, end=10_330),      # matches germline
        _sv("chr1", 40_000, "DUP", 800, end=40_800),      # somatic
        _sv("chr1", 90_400, "DUP", 5_100, end=95_500),    # matches (band 1001)
        _sv("chr2", 5_400, "TRA", 0),                     # matches BND @1000
        _sv("chr3", 7_000, "TRA", 0),                     # somatic BND
        _sv("chr1", 60_000, "INV", 200, end=60_200, filt="LowQual"),  # dropped
        _sv("chr1", 70_000, "INS", 400),                  # INS: not in scope
    ]
    somatic = somatic_call(normal, tumor)
    got = sorted((r.chrom, r.pos, r.svtype) for r in somatic)
    assert got == [("chr1", 40_000, "DUP"), ("chr3", 7_000, "TRA")]
    assert all(r.info["SUPP_VEC"] == "01" for r in somatic)


def test_end_only_records_sized_from_end():
    # symbolic-ALT INV with only INFO/END (no SVLEN): SURVIVOR sizes it as
    # END-POS; allele-length fallback (~4 for '<INV>') would drop it
    r = VcfRecord("chr1", 20_000, "v", "N", "<INV>", ".", "PASS",
                  {"SVTYPE": "INV", "END": 20_800}, "0/1")
    somatic = somatic_call([], [r])
    assert [(s.pos, s.svtype) for s in somatic] == [(20_000, "INV")]


def test_pass_only_drops_dot_filter():
    # reference protocol: awk '$7 == "PASS"' -- '.' records are excluded
    r = VcfRecord("chr1", 20_000, "v", "N", "<INV>", ".", ".",
                  {"SVTYPE": "INV", "SVLEN": 500, "END": 20_500}, "0/1")
    assert somatic_call([], [r]) == []
    assert len(somatic_call([], [r], pass_only=False)) == 1
