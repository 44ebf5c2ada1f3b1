import numpy as np
import pytest

from focalsv_tpu.assembly import olc
from focalsv_tpu.config import AssemblyConfig
from focalsv_tpu.ops.align import edit_similarity
from focalsv_tpu.ops import encode as enc


def _reads_from(hap, rng, n, rl, sub_rate=0.002):
    out = []
    step = max(1, (len(hap) - rl) // max(n - 1, 1))
    for i in range(n):
        s = min(i * step, len(hap) - rl)
        r = hap[s : s + rl].copy()
        mask = rng.random(len(r)) < sub_rate
        r = np.where(mask, (r + 1) % 4, r).astype(np.uint8)
        out.append(r)
    return out


def test_find_overlaps_dovetail():
    rng = np.random.default_rng(1)
    hap = rng.integers(0, 4, 10_000).astype(np.uint8)
    a, b = hap[:6_000].copy(), hap[4_000:10_000].copy()
    ovs = olc.find_overlaps([a, b])
    assert ovs, "overlap not found"
    ov = ovs[0]
    assert ov.a == 0 and ov.b == 1
    assert abs(ov.shift - 4_000) < 50
    assert ov.identity > 0.95


def test_olc_assembles_clean_haplotype():
    rng = np.random.default_rng(2)
    hap = rng.integers(0, 4, 20_000).astype(np.uint8)
    reads = _reads_from(hap, rng, n=10, rl=5_000)
    contig = olc.assemble_olc(reads)
    assert contig is not None
    assert len(contig) > 18_000
    sim = edit_similarity(contig, hap, band=512)
    assert sim > 0.98, f"similarity {sim}"


def test_olc_preserves_insertion():
    """De novo: a 300bp insertion present in all reads must appear in the
    contig (no reference bias -- there is no reference here at all)."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 4, 16_000).astype(np.uint8)
    ins = rng.integers(0, 4, 300).astype(np.uint8)
    hap = np.concatenate([base[:8_000], ins, base[8_000:]])
    reads = _reads_from(hap, rng, n=12, rl=4_500)
    contig = olc.assemble_olc(reads)
    assert contig is not None
    sim = edit_similarity(contig, hap, band=512)
    assert sim > 0.98, f"similarity {sim}"
    # the insertion sequence must be recoverable inside the contig
    from focalsv_tpu.align_engine import Aligner
    alns = Aligner(np.asarray(contig, np.uint8)).align(ins, "ins")
    assert alns and alns[0].score > 500


def test_olc_noisy_reads():
    rng = np.random.default_rng(4)
    hap = rng.integers(0, 4, 12_000).astype(np.uint8)
    reads = _reads_from(hap, rng, n=14, rl=4_000, sub_rate=0.05)
    contig = olc.assemble_olc(reads, AssemblyConfig(polish_rounds=3))
    assert contig is not None
    sim = edit_similarity(contig, hap, band=512)
    assert sim > 0.95, f"similarity {sim}"


def test_orient_reads_parity():
    """Strand bipartition: RC'd reads are detected and flipped back."""
    rng = np.random.default_rng(11)
    hap = rng.integers(0, 4, 20_000).astype(np.uint8)
    reads = _reads_from(hap, rng, n=12, rl=5_000)
    flipped_in = [1, 4, 5, 9]
    mixed = [enc.revcomp(r) if i in flipped_in else r
             for i, r in enumerate(reads)]
    oriented, flip = olc.orient_reads(mixed)
    # consistent orientation: either exactly the flipped set, or its
    # complement (global orientation is arbitrary within a component)
    got = set(np.nonzero(flip)[0].tolist())
    assert got in (set(flipped_in), set(range(12)) - set(flipped_in)), got
    # every oriented read matches its original up to the declared flip
    for i, r in enumerate(oriented):
        s = max(edit_similarity(r, reads[i], band=64),
                edit_similarity(r, enc.revcomp(reads[i]), band=64))
        assert s > 0.99


def test_olc_assembles_strand_mixed_reads():
    """De-novo assembly from a 50/50 strand mix reconstructs the haplotype
    (hifiasm handles this natively; forward-only overlap would fragment)."""
    rng = np.random.default_rng(12)
    hap = rng.integers(0, 4, 20_000).astype(np.uint8)
    reads = _reads_from(hap, rng, n=12, rl=5_000)
    mixed = [enc.revcomp(r) if i % 2 else r for i, r in enumerate(reads)]
    contig = olc.assemble_olc(mixed)
    assert contig is not None
    assert len(contig) > 18_000
    sim = max(edit_similarity(contig, hap, band=512),
              edit_similarity(enc.revcomp(np.asarray(contig)), hap,
                              band=512))
    assert sim > 0.98, f"similarity {sim}"
