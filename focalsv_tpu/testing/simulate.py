"""Diploid genome and long-read simulator with exact alignment truth.

Generates: a random reference, two haplotypes carrying known SVs (DEL/INS) and
het SNPs, and reads sampled from the haplotypes with a configurable error
model.  Because the ref->haplotype coordinate map is known exactly, every read
gets its *true* CIGAR against the reference -- i.e. the simulator doubles as a
perfect aligner, producing the aligned-BAM input the pipeline expects
(reference pipeline consumes minimap2/pbmm2-aligned BAMs, data_preparation.md).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from focalsv_tpu.io import bam as bamio
from focalsv_tpu.io.bam import BamRecord, BamWriter, build_bai
from focalsv_tpu.ops import encode as enc


@dataclass
class SimSV:
    svtype: str          # "DEL" | "INS"
    pos: int             # 0-based ref position (anchor base before event)
    length: int
    genotype: str        # "0/1" | "1/1" | "1|0" | "0|1"
    seq: np.ndarray | None = None   # INS sequence (codes)

    def on_hap(self, hap_idx: int) -> bool:
        g = self.genotype.replace("|", "/").split("/")
        return g[hap_idx] == "1"


@dataclass
class SimSNP:
    pos: int
    ref_base: int
    alt_base: int
    genotype: str = "0/1"

    def on_hap(self, hap_idx: int) -> bool:
        g = self.genotype.replace("|", "/").split("/")
        return g[hap_idx] == "1"


@dataclass
class Haplotype:
    seq: np.ndarray
    # segments: list of (hap_start, hap_end, ref_start, kind) where kind is
    # "M" (copied from ref, ref advances) or "I" (inserted, no ref advance)
    segments: list[tuple[int, int, int, str]]

    def hap_to_ref(self, hpos: int) -> int:
        """Map hap coordinate to the ref coordinate at/just after it."""
        for hs, he, rs, kind in self.segments:
            if hs <= hpos < he:
                return rs + (hpos - hs) if kind == "M" else rs
        return self.segments[-1][2] + (self.segments[-1][1] - self.segments[-1][0])


def random_seq(rng: np.random.Generator, n: int) -> np.ndarray:
    return rng.integers(0, 4, size=n, dtype=np.int64).astype(np.uint8)


def apply_variants(
    ref: np.ndarray, svs: list[SimSV], snps: list[SimSNP], hap_idx: int
) -> Haplotype:
    events = sorted([s for s in svs if s.on_hap(hap_idx)], key=lambda s: s.pos)
    seq_parts: list[np.ndarray] = []
    segments: list[tuple[int, int, int, str]] = []
    rpos = 0
    hpos = 0
    base = ref.copy()
    for snp in snps:
        if snp.on_hap(hap_idx):
            base[snp.pos] = snp.alt_base
    for ev in events:
        if ev.pos < rpos:
            continue  # overlapping events: keep the first
        if ev.pos > rpos:
            seg = base[rpos : ev.pos]
            seq_parts.append(seg)
            segments.append((hpos, hpos + len(seg), rpos, "M"))
            hpos += len(seg)
            rpos = ev.pos
        if ev.svtype == "DEL":
            rpos += ev.length
        elif ev.svtype == "INS":
            ins = ev.seq
            assert ins is not None and len(ins) == ev.length
            seq_parts.append(ins)
            segments.append((hpos, hpos + ev.length, rpos, "I"))
            hpos += ev.length
        else:
            raise ValueError(ev.svtype)
    if rpos < len(base):
        seg = base[rpos:]
        seq_parts.append(seg)
        segments.append((hpos, hpos + len(seg), rpos, "M"))
    return Haplotype(seq=np.concatenate(seq_parts) if seq_parts else np.zeros(0, np.uint8),
                     segments=segments)


def _true_cigar(hap: Haplotype, hstart: int, hend: int) -> tuple[int, list[tuple[int, int]]]:
    """Exact CIGAR of hap[hstart:hend) against the reference.

    Returns (ref_start, ops) with BAM op codes; adjacent same-op runs merged,
    deletions between copied segments emitted from the ref-coordinate gaps.
    """
    ops: list[tuple[int, int]] = []
    ref_start = None
    prev_ref_end = None
    for hs, he, rs, kind in hap.segments:
        s = max(hs, hstart)
        e = min(he, hend)
        if s >= e:
            continue
        if kind == "M":
            seg_ref_start = rs + (s - hs)
            if ref_start is None:
                ref_start = seg_ref_start
            if prev_ref_end is not None and seg_ref_start > prev_ref_end:
                ops.append((bamio.CDEL, seg_ref_start - prev_ref_end))
            ops.append((bamio.CMATCH, e - s))
            prev_ref_end = seg_ref_start + (e - s)
        else:  # insertion segment
            ops.append((bamio.CINS, e - s))
            if ref_start is None:
                # read starts inside an insertion: anchor at the segment's ref pos
                ref_start = rs
                prev_ref_end = rs
    # merge adjacent same-op runs, drop leading/trailing DELs
    merged: list[tuple[int, int]] = []
    for op, ln in ops:
        if merged and merged[-1][0] == op:
            merged[-1] = (op, merged[-1][1] + ln)
        else:
            merged.append((op, ln))
    while merged and merged[0][0] == bamio.CDEL:
        ref_start += merged[0][1]
        merged = merged[1:]
    while merged and merged[-1][0] == bamio.CDEL:
        merged = merged[:-1]
    # leading insertion becomes soft clip in BAM convention
    if merged and merged[0][0] == bamio.CINS:
        merged[0] = (bamio.CSOFT_CLIP, merged[0][1])
    if merged and merged[-1][0] == bamio.CINS:
        merged[-1] = (bamio.CSOFT_CLIP, merged[-1][1])
    return int(ref_start or 0), merged


def _apply_errors(
    rng: np.random.Generator,
    seq: np.ndarray,
    cigar: list[tuple[int, int]],
    sub_rate: float,
    ins_rate: float,
    del_rate: float,
) -> tuple[np.ndarray, list[tuple[int, int]]]:
    """Apply sequencing errors, composing them into the true CIGAR."""
    if sub_rate > 0:
        mask = rng.random(len(seq)) < sub_rate
        shift = rng.integers(1, 4, size=len(seq)).astype(np.uint8)
        seq = np.where(mask & (seq < 4), (seq + shift) % 4, seq).astype(np.uint8)
    if ins_rate <= 0 and del_rate <= 0:
        return seq, cigar
    # walk CIGAR, injecting 1-bp read indel errors inside M runs
    out_seq: list[np.ndarray] = []
    out_ops: list[tuple[int, int]] = []
    qpos = 0

    def emit(op, ln):
        if ln <= 0:
            return
        if out_ops and out_ops[-1][0] == op:
            out_ops[-1] = (op, out_ops[-1][1] + ln)
        else:
            out_ops.append((op, ln))

    for op, ln in cigar:
        consumes_q = bamio.CONSUMES_QUERY[op]
        if op != bamio.CMATCH:
            if consumes_q:
                out_seq.append(seq[qpos : qpos + ln])
                qpos += ln
            emit(op, ln)
            continue
        # M run: scatter errors
        run = seq[qpos : qpos + ln]
        qpos += ln
        i = 0
        while i < ln:
            r = rng.random()
            if r < ins_rate:
                out_seq.append(run[i : i + 1])
                emit(bamio.CMATCH, 1)
                out_seq.append(random_seq(rng, 1))
                emit(bamio.CINS, 1)
                i += 1
            elif r < ins_rate + del_rate and i + 1 < ln:
                emit(bamio.CDEL, 1)
                i += 1  # skip one base of the run (deleted in read)
            else:
                nxt = min(ln, i + 32)
                out_seq.append(run[i:nxt])
                emit(bamio.CMATCH, nxt - i)
                i = nxt
    return (np.concatenate(out_seq) if out_seq else np.zeros(0, np.uint8)), out_ops


@dataclass
class SimulatedRegion:
    chrom: str
    ref: np.ndarray
    haps: tuple[Haplotype, Haplotype]
    svs: list[SimSV]
    snps: list[SimSNP]
    reads: list[BamRecord] = field(default_factory=list)
    read_hap: list[int] = field(default_factory=list)


def simulate_region(
    seed: int = 0,
    ref_len: int = 30_000,
    chrom: str = "chr21",
    svs: list[SimSV] | None = None,
    n_snps: int = 20,
    coverage: float = 20.0,
    read_len_mean: int = 12_000,
    read_len_sd: int = 2_000,
    sub_rate: float = 0.001,
    ins_rate: float = 0.0,
    del_rate: float = 0.0,
    ref: np.ndarray | None = None,
) -> SimulatedRegion:
    rng = np.random.default_rng(seed)
    if ref is None:
        ref = random_seq(rng, ref_len)
    else:
        ref = np.asarray(ref, np.uint8)
        ref_len = len(ref)
    if svs is None:
        ins_seq = random_seq(rng, 400)
        svs = [
            SimSV("DEL", ref_len // 3, 250, "0/1"),
            SimSV("INS", 2 * ref_len // 3, 400, "1/1", seq=ins_seq),
        ]
    # het SNPs away from SV breakpoints, for phasing signal
    sv_zones = [(s.pos - 100, s.pos + s.length + 100) for s in svs]
    snps: list[SimSNP] = []
    tries = 0
    while len(snps) < n_snps and tries < n_snps * 50:
        tries += 1
        p = int(rng.integers(50, ref_len - 50))
        if any(a <= p < b for a, b in sv_zones):
            continue
        if any(abs(p - s.pos) < 30 for s in snps):
            continue
        gt = "1|0" if rng.random() < 0.5 else "0|1"
        alt = (int(ref[p]) + int(rng.integers(1, 4))) % 4
        snps.append(SimSNP(p, int(ref[p]), alt, gt))
    snps.sort(key=lambda s: s.pos)
    haps = (apply_variants(ref, svs, snps, 0), apply_variants(ref, svs, snps, 1))

    region = SimulatedRegion(chrom=chrom, ref=ref, haps=haps, svs=svs, snps=snps)
    n_reads = int(coverage * ref_len / read_len_mean)
    for i in range(max(n_reads, 4)):
        h = i % 2
        hap = haps[h]
        hlen = len(hap.seq)
        rl = int(np.clip(rng.normal(read_len_mean, read_len_sd), 500, hlen))
        hstart = int(rng.integers(0, max(1, hlen - rl + 1)))
        hend = hstart + rl
        ref_start, cigar = _true_cigar(hap, hstart, hend)
        if not cigar or not any(op == bamio.CMATCH for op, _ in cigar):
            continue
        seq = hap.seq[hstart:hend].copy()
        seq, cigar = _apply_errors(rng, seq, cigar, sub_rate, ins_rate, del_rate)
        rec = BamRecord(
            name=f"sim_h{h+1}_{i}",
            flag=0,
            ref_id=0,
            pos=ref_start,
            mapq=60,
            cigar=np.array(cigar, np.int32).reshape(-1, 2),
            seq=seq,
            qual=np.full(len(seq), 40, np.uint8),
            tags={},
        )
        region.reads.append(rec)
        region.read_hap.append(h)
    order = np.argsort([r.pos for r in region.reads], kind="stable")
    region.reads = [region.reads[i] for i in order]
    region.read_hap = [region.read_hap[i] for i in order]
    return region


def write_region_bam(region: SimulatedRegion, path: str, ref_len: int | None = None) -> str:
    w = BamWriter(path, [region.chrom], [ref_len or len(region.ref)])
    for rec in region.reads:
        w.write(rec)
    w.close()
    build_bai(path)
    return path


# ---------------------------------------------------------------------------
# adversarial content generators (the accuracy-gate stressors: repeats,
# segmental duplications, nested SVs, coverage dropouts)
# ---------------------------------------------------------------------------


def tandem_ref(rng: np.random.Generator, ref_len: int, arrays: int = 3,
               unit_lo: int = 5, unit_hi: int = 200,
               copies_lo: int = 5, copies_hi: int = 40) -> np.ndarray:
    """Reference with embedded tandem-repeat arrays (repeat-mediated
    breakpoint ambiguity: indels inside arrays left-align many units away)."""
    ref = random_seq(rng, ref_len)
    for _ in range(arrays):
        unit = random_seq(rng, int(rng.integers(unit_lo, unit_hi + 1)))
        copies = int(rng.integers(copies_lo, copies_hi + 1))
        arr = np.tile(unit, copies)
        start = int(rng.integers(2_000, max(ref_len - len(arr) - 2_000, 2_001)))
        ref[start : start + len(arr)] = arr[: max(0, min(len(arr), ref_len - start))]
    return ref


def segdup_ref(rng: np.random.Generator, ref_len: int, block: int = 4_000,
               n_copies: int = 2) -> tuple[np.ndarray, list[tuple[int, int]]]:
    """Reference carrying n_copies of one block (mapping ambiguity: seeds
    hit every copy).  Returns (ref, [(start, end) of each copy])."""
    ref = random_seq(rng, ref_len)
    src = int(rng.integers(2_000, ref_len // 2 - block))
    blk = ref[src : src + block].copy()
    spots = [(src, src + block)]
    for i in range(1, n_copies):
        dst = int(rng.integers(ref_len // 2, ref_len - block - 2_000))
        ref[dst : dst + block] = blk
        spots.append((dst, dst + block))
    return ref, spots


def drop_coverage(region: "SimulatedRegion", lo: int, hi: int,
                  keep_frac: float = 0.0,
                  rng: np.random.Generator | None = None) -> None:
    """Coverage dropout: remove reads whose reference span intersects
    [lo, hi) (keep each with prob keep_frac) -- models mapping holes."""
    rng = rng or np.random.default_rng(0)
    keep_reads, keep_hap = [], []
    for rec, h in zip(region.reads, region.read_hap):
        if rec.pos < hi and rec.reference_end > lo and rng.random() >= keep_frac:
            continue
        keep_reads.append(rec)
        keep_hap.append(h)
    region.reads = keep_reads
    region.read_hap = keep_hap


def jitter_alignments(region: "SimulatedRegion",
                      rng: np.random.Generator | None = None,
                      indel_jitter: int = 25, clip_grow: int = 12,
                      frac: float = 0.7) -> None:
    """Systematic ALIGNMENT noise: perturb read CIGARs without changing
    read sequences or reference spans.

    The simulator's truth CIGARs make pileup projection exact by
    construction; real aligners place indels ambiguously (homopolymer /
    repeat left-shift) and trim low-identity flanks into soft clips.  This
    models that regime -- the one longshot's pair-HMM realignment and the
    FP filter exist for (reference 2_phasing/longshot.py:20):

    - indel placement jitter: an interior I/D op between two M runs slides
      by +-indel_jitter (flanking M lengths adjust; the displaced columns
      become mismatches inside M, exactly an aligner's placement error);
    - soft-clip growth: up to clip_grow leading/trailing M bases become S
      (leading growth advances pos), the trimmed-flank artifact.

    Applied in place to a ``frac`` fraction of mapped reads.
    """
    rng = rng or np.random.default_rng(0)
    CM, CI, CD, CS = 0, 1, 2, 4
    for r in region.reads:
        if r.is_unmapped or rng.random() > frac:
            continue
        ops = [[int(o), int(ln)] for o, ln in r.cigar]
        for i in range(1, len(ops) - 1):
            op = ops[i][0]
            if op in (CI, CD) and ops[i - 1][0] == CM \
                    and ops[i + 1][0] == CM:
                j = int(rng.integers(-indel_jitter, indel_jitter + 1))
                j = max(-(ops[i - 1][1] - 1), min(ops[i + 1][1] - 1, j))
                ops[i - 1][1] += j
                ops[i + 1][1] -= j
        g = int(rng.integers(0, clip_grow + 1))
        first_m = 0 if ops[0][0] == CM else (1 if len(ops) > 1 else -1)
        if g and first_m >= 0 and ops[first_m][0] == CM \
                and ops[first_m][1] > g:
            ops[first_m][1] -= g
            if first_m > 0 and ops[0][0] == CS:
                ops[0][1] += g
            else:
                ops.insert(0, [CS, g])
            r.pos += g
        g = int(rng.integers(0, clip_grow + 1))
        last_m = len(ops) - 1 if ops[-1][0] == CM else len(ops) - 2
        if g and last_m >= 0 and ops[last_m][0] == CM and ops[last_m][1] > g:
            ops[last_m][1] -= g
            if last_m < len(ops) - 1 and ops[-1][0] == CS:
                ops[-1][1] += g
            else:
                ops.append([CS, g])
        r.cigar = np.array([o for o in ops if o[1] > 0], np.int32)
