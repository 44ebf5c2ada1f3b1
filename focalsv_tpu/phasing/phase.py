"""Region-scale read phasing: pileup -> het SNVs -> MEC partition -> blocks.

Replaces longshot 0.4.x for the pipeline's purpose (reference invokes
`longshot -O region_phased.bam ... -F` per region, `2_phasing/longshot.py:20`,
to get HP/PS tags consumed by output_fas.py:31-33).  Design: the reads x
sites allele matrix is tiny at region scale (~10^2 x 10^2), so phasing is an
alternating majority-vote optimization of the MEC objective -- site phases
and read assignments updated as masked matrix reductions; everything is
fixed-shape tensor math, batchable across regions on device.

Unphased-read allocation mirrors output_fas.py:47-60: with exactly one phase
block they join both haplotypes; otherwise they join both haplotypes of the
max-overlap block.
"""

from __future__ import annotations

from dataclasses import dataclass
from fractions import Fraction

import numpy as np

from focalsv_tpu.config import PhasingConfig
from focalsv_tpu.io import bam as bamio


def frac_parts(x: float, max_den: int = 10_000) -> tuple[int, int]:
    """Exact small-rational representation of a config threshold.

    All threshold comparisons in phasing are done in INTEGER arithmetic
    (count * den >= total * num) so the host numpy path and the device JAX
    path (f32) decide identically at boundaries -- a prerequisite for the
    bit-parity contract between pipeline/region.py and pipeline/device_exec.
    """
    f = Fraction(x).limit_denominator(max_den)
    return f.numerator, f.denominator


# pileup symbol for the first column of a >= MIN_SV_MARK deletion: large
# indels are perfect het markers where SNPs are absent (SNP deserts), so
# they participate in site detection alongside substitutions
DEL_MARK = 6
MIN_SV_MARK = 30


def pileup_matrix(
    reads: list[bamio.BamRecord], region_start: int, region_len: int,
    mark_dels: bool = False, ins_events: list | None = None,
) -> np.ndarray:
    """(n_reads, region_len) uint8 base-code matrix; 255 = not covered.

    With ``mark_dels`` the first column of every >= MIN_SV_MARK bp deletion
    is written as DEL_MARK (one marker per event -- error micro-dels stay
    invisible, and an 8 kb DEL contributes one site, not 8000).  When
    ``ins_events`` is a list, (read_idx, col, len) tuples are appended for
    every >= MIN_SV_MARK bp insertion.
    """
    mat = np.full((len(reads), region_len), 255, np.uint8)
    for ri, rec in enumerate(reads):
        rpos = rec.pos - region_start
        qpos = 0
        for op, ln in rec.cigar:
            if op in (bamio.CMATCH, bamio.CEQUAL, bamio.CDIFF):
                a = max(0, -rpos)
                b = min(ln, region_len - rpos)
                if b > a:
                    mat[ri, rpos + a : rpos + b] = rec.seq[qpos + a : qpos + b]
                rpos += ln
                qpos += ln
            elif op == bamio.CINS:
                if (ins_events is not None and ln >= MIN_SV_MARK
                        and 0 <= rpos < region_len):
                    ins_events.append((ri, rpos, ln))
                qpos += ln
            elif op == bamio.CSOFT_CLIP:
                qpos += ln
            elif op in (bamio.CDEL, bamio.CREF_SKIP):
                if mark_dels and ln >= MIN_SV_MARK and 0 <= rpos < region_len:
                    mat[ri, rpos] = DEL_MARK
                rpos += ln
    return mat


@dataclass
class HetSites:
    positions: np.ndarray    # (S,) region-local coordinates
    allele0: np.ndarray      # (S,) uint8 base code (major)
    allele1: np.ndarray      # (S,) uint8 base code (minor)


# allele symbol codes per counts column: A C G T DEL.  A deleted column is a
# first-class phasing allele: a multi-kb het DEL is a perfect haplotype
# marker across its whole span, and phases the reads INSIDE the hemizygous
# interval (which cover no SNV) to the undeleted haplotype -- without it
# those reads stay unphased, vote in both haplotypes, and fragment the
# deleted haplotype's consensus (observed: 34 kb het DEL -> five pieces).
ALLELE_CODES = np.array([0, 1, 2, 3, 254], np.uint8)


def find_het_sites(
    mat: np.ndarray, ref_codes: np.ndarray, cfg: PhasingConfig,
) -> HetSites:
    """Columns where two alleles both have frequency in the het band.

    ``mat`` is the unified pileup (assembly/consensus.py::pileup_with_dels):
    base codes 0..3, 254 = deleted column, 255 = not covered."""
    R, L = mat.shape
    counts = np.zeros((L, 5), np.int32)
    for i, code in enumerate(ALLELE_CODES):
        counts[:, i] = (mat == code).sum(axis=0)
    depth = counts.sum(axis=1)
    # top-2 alleles per column via two argmax passes (ties -> lower column,
    # matching a stable descending sort)
    a0 = counts.argmax(axis=1)
    masked = counts.copy()
    np.put_along_axis(masked, a0[:, None], -1, axis=1)
    a1 = masked.argmax(axis=1)
    top1 = np.take_along_axis(masked, a1[:, None], axis=1)[:, 0]
    a0 = ALLELE_CODES[a0]
    a1 = ALLELE_CODES[a1]
    # integer threshold arithmetic (see frac_parts): minor/depth in the het
    # band becomes minor*den >= depth*num -- exact, and identical on device
    lo_n, lo_d = frac_parts(cfg.min_allele_frac)
    hi_n, hi_d = frac_parts(cfg.max_allele_frac)
    top1 = top1.astype(np.int64)
    depth = depth.astype(np.int64)
    is_het = (
        (depth >= max(cfg.min_site_depth, 1))
        & (top1 * lo_d >= depth * lo_n)
        & (top1 * hi_d <= depth * hi_n)
        & (top1 >= cfg.min_minor_count)
    )
    pos = np.nonzero(is_het)[0]
    return HetSites(positions=pos, allele0=a0[pos], allele1=a1[pos])


def select_sites_strips(bal: np.ndarray, max_sites: int) -> np.ndarray:
    """Positions of the selected het sites: the region is cut into
    ``max_sites`` equal strips and each strip contributes its best-balance
    het column (bal < 0 = not a het site).  Guarantees positional spread --
    every read longer than one strip covers a candidate site -- and is a
    pure reshape+argmax, identical on host and device."""
    L = len(bal)
    S = max_sites
    strip = -(-L // S)                      # ceil
    pad = S * strip - L
    bal_p = np.concatenate([bal, np.full(pad, -1.0, np.float32)])
    strips = bal_p.reshape(S, strip)
    off = strips.argmax(axis=1)             # ties -> lowest column
    val = strips.max(axis=1)
    pos = np.arange(S, dtype=np.int64) * strip + off
    return pos[val > 0]


def allele_matrix(mat: np.ndarray, sites: HetSites) -> np.ndarray:
    """(R, S) int8: 0 = allele0, 1 = allele1, -1 = missing/other."""
    sub = mat[:, sites.positions]
    out = np.full(sub.shape, -1, np.int8)
    out[sub == sites.allele0[None, :]] = 0
    out[sub == sites.allele1[None, :]] = 1
    return out


def purify_sites(A: np.ndarray, window: int = 4, min_corr: float = 0.5,
                 min_pairs: int = 4) -> np.ndarray:
    """Mask allele-matrix columns that do not co-phase with any neighbor.

    A true het site's alleles correlate strongly (|2*same/n - 1| near 1)
    with nearby sites through the reads spanning both; an error-pileup site
    correlates with nothing.  Such sites are worse than useless: one random
    parity decision at a noise site flips the init chain for every site
    after it, which the coordinate-wise MEC refinement cannot repair
    (observed on CLR: 42 sites, 6 noise -> site phase at chance level).
    Returns A with impure columns set to -1 (uncovered).
    """
    R, S = A.shape
    if S < 2:
        return A
    cov = A >= 0
    passed = np.zeros(S, bool)
    # corr = |2*same - n| / n; corr >= max(min_corr, 3/sqrt(n)) in exact
    # integer form: dev*den >= n*num  AND  dev^2 >= 9n (dev = |2*same - n|)
    c_num, c_den = frac_parts(min_corr)
    for d in range(1, min(window, S - 1) + 1):
        a, b = A[:, :-d], A[:, d:]
        both = cov[:, :-d] & cov[:, d:]
        n = both.sum(axis=0).astype(np.int64)
        same = ((a == b) & both).sum(axis=0).astype(np.int64)
        dev = np.abs(2 * same - n)
        # significance gate: under the null (unlinked alleles) corr is
        # ~|2*Binom(n,1/2)/n - 1|, sd 1/sqrt(n) -- demand 3 sigma, so chance
        # co-phasing on a handful of shared reads cannot rescue a noise site
        ok = (n >= min_pairs) & (dev * c_den >= n * c_num) & (dev * dev >= 9 * n)
        passed[:-d] |= ok
        passed[d:] |= ok
    out = A.copy()
    out[:, ~passed] = -1
    return out


def phase_blocks(A: np.ndarray) -> np.ndarray:
    """Block id per site: consecutive sites co-covered by >=1 read stay in one
    block; a connectivity break starts a new block."""
    S = A.shape[1]
    block = np.zeros(S, np.int64)
    if S == 0:
        return block
    cur = 0
    for s in range(1, S):
        linked = ((A[:, s - 1] >= 0) & (A[:, s] >= 0)).any()
        if not linked:
            cur += 1
        block[s] = cur
    return block


def mec_phase(A: np.ndarray, iters: int = 30, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Alternating MEC optimization.

    Returns (site_phase h (S,) in {0,1}: allele of hap1; read_assign (R,) in
    {0,1,-1}).  Init: chained adjacent-site correlation (spanning-path
    phasing), then alternating majority refinement.
    """
    R, S = A.shape
    if S == 0 or R == 0:
        return np.zeros(S, np.int8), np.full(R, -1, np.int8)
    cov = A >= 0
    # adjacent-pair relative phase: same (00/11) vs flipped (01/10)
    h = np.zeros(S, np.int8)
    for s in range(1, S):
        both = cov[:, s - 1] & cov[:, s]
        if not both.any():
            h[s] = h[s - 1]
            continue
        same = (A[both, s - 1] == A[both, s]).sum()
        diff = both.sum() - same
        h[s] = h[s - 1] if same >= diff else 1 - h[s - 1]
    assign = np.full(R, -1, np.int8)
    for _ in range(iters):
        # read assignment: agree with h -> hap1(0), with 1-h -> hap2(1)
        agree = ((A == h[None, :]) & cov).sum(axis=1)
        disagree = ((A == (1 - h)[None, :]) & cov).sum(axis=1)
        new_assign = np.where(agree >= disagree, 0, 1).astype(np.int8)
        new_assign[(agree + disagree) == 0] = -1
        # site phase: majority allele among hap1 reads
        hap1 = new_assign == 0
        hap2 = new_assign == 1
        votes1 = ((A == 1) & cov & hap1[:, None]).sum(axis=0) + \
                 ((A == 0) & cov & hap2[:, None]).sum(axis=0)
        votes0 = ((A == 0) & cov & hap1[:, None]).sum(axis=0) + \
                 ((A == 1) & cov & hap2[:, None]).sum(axis=0)
        new_h = np.where(votes1 > votes0, 1, 0).astype(np.int8)
        if (new_h == h).all() and (new_assign == assign).all():
            h, assign = new_h, new_assign
            break
        h, assign = new_h, new_assign
    # read assignment consistent with the FINAL site phase (the device region
    # step computes hp from the post-loop h; at a fixed point -- the normal
    # exit -- this equals the last in-loop assignment)
    agree = ((A == h[None, :]) & cov).sum(axis=1)
    disagree = ((A == (1 - h)[None, :]) & cov).sum(axis=1)
    assign = np.where(agree >= disagree, 0, 1).astype(np.int8)
    assign[(agree + disagree) == 0] = -1
    return h, assign


_E8 = np.zeros(0, np.uint8)
_E8S = np.zeros((0, 0), np.int8)


@dataclass
class PhaseResult:
    hp: np.ndarray           # (R,) int8: 1/2, 0 = unphased
    ps: np.ndarray           # (R,) int64: phase-set id (genome coord), -1 unphased
    n_sites: int
    n_blocks: int
    site_positions: np.ndarray   # genome coordinates of het sites
    site_blocks: np.ndarray
    # per-site allele codes + the purified allele matrix (for the phased-SNV
    # VCF artifact, longshot's region_phased.vcf analog)
    site_allele0: np.ndarray = None
    site_allele1: np.ndarray = None
    allele_mat: np.ndarray = None
    # hap-1 allele index per site, precomputed on device (the device path
    # ships this instead of the (R, S) allele matrix)
    site_hap1: np.ndarray = None

    def __post_init__(self):
        if self.site_allele0 is None:
            self.site_allele0 = _E8
        if self.site_allele1 is None:
            self.site_allele1 = _E8
        if self.allele_mat is None:
            self.allele_mat = _E8S


def phase_region(
    reads: list[bamio.BamRecord],
    ref_codes: np.ndarray,
    region_start: int,
    cfg: PhasingConfig = PhasingConfig(),
) -> PhaseResult:
    R = len(reads)
    L = len(ref_codes)
    if R == 0:
        return PhaseResult(np.zeros(0, np.int8), np.zeros(0, np.int64), 0, 0,
                           np.zeros(0, np.int64), np.zeros(0, np.int64))
    # unified pileup with deleted columns as symbol 254 (a first-class
    # phasing allele; see ALLELE_CODES) -- the same matrix the device step
    # sees, so host/device parity is structural
    from focalsv_tpu.assembly.consensus import pileup_with_dels
    mat, _ = pileup_with_dels(reads, list(range(R)), region_start, L)
    sites = find_het_sites(mat, ref_codes, cfg)
    if len(sites.positions) > 0:
        # strip-based site selection: one best-balance site per L/max_sites
        # strip (select_sites_strips).  Balance-top-k had a pathological
        # failure: a 30 kb het DEL contributes 30k equal-balance candidate
        # columns and the tie-break (lowest position) packed every selected
        # site at the DELETION'S LEFT EDGE, leaving tail-interior reads
        # siteless -> unphased -> consensus pollution.  Strips guarantee
        # positional spread; f32 balance matches the device step exactly.
        sub = mat[:, sites.positions]
        n1 = (sub == sites.allele1[None, :]).sum(axis=0)
        n0 = (sub == sites.allele0[None, :]).sum(axis=0)
        bal_all = np.full(L, -1.0, np.float32)
        bal_all[sites.positions] = (
            np.minimum(n0, n1).astype(np.float32)
            / np.maximum(n0 + n1, 1).astype(np.float32))
        keep_pos = select_sites_strips(bal_all, cfg.max_sites)
        idx_of = {int(p): i for i, p in enumerate(sites.positions)}
        keep = np.array([idx_of[int(p)] for p in keep_pos], np.int64)
        sites = HetSites(sites.positions[keep], sites.allele0[keep],
                         sites.allele1[keep])
    A = allele_matrix(mat, sites)
    if cfg.use_pairhmm:
        # pair-HMM realignment refines BASE-allele sites only; DEL-allele
        # phasing markers keep their (exact) pileup projection
        from focalsv_tpu.phasing.realign import realign_allele_matrix
        base_site = (sites.allele0 <= 3) & (sites.allele1 <= 3)
        if base_site.any():
            sub_sites = HetSites(sites.positions[base_site],
                                 sites.allele0[base_site],
                                 sites.allele1[base_site])
            A_hmm = realign_allele_matrix(reads, sub_sites, ref_codes,
                                          region_start)
            A[:, base_site] = A_hmm
    # drop error-pileup sites that co-phase with nothing (see purify_sites);
    # columns are removed (not masked) so real blocks stay contiguous
    if A.shape[1] >= 2:
        pure = (purify_sites(A) >= 0).any(axis=0)
        A = A[:, pure]
        sites = HetSites(sites.positions[pure], sites.allele0[pure],
                         sites.allele1[pure])
    S = A.shape[1]
    if S == 0:
        return PhaseResult(np.zeros(R, np.int8), np.full(R, -1, np.int64),
                           0, 0, np.zeros(0, np.int64), np.zeros(0, np.int64))
    blocks = phase_blocks(A)
    hp = np.zeros(R, np.int8)
    ps = np.full(R, -1, np.int64)
    for b in np.unique(blocks):
        bsites = np.nonzero(blocks == b)[0]
        Ab = A[:, bsites]
        h, assign = mec_phase(Ab, iters=cfg.mec_iters)
        ps_id = region_start + int(sites.positions[bsites[0]]) + 1
        covered = (Ab >= 0).any(axis=1)
        sel = covered & (assign >= 0) & (hp == 0)
        hp[sel] = assign[sel] + 1
        ps[sel] = ps_id
    return PhaseResult(
        hp=hp, ps=ps, n_sites=S, n_blocks=int(blocks.max()) + 1,
        site_positions=sites.positions + region_start, site_blocks=blocks,
        site_allele0=sites.allele0, site_allele1=sites.allele1, allele_mat=A)


def group_reads_by_block(
    reads: list[bamio.BamRecord], pr: PhaseResult,
) -> dict[tuple[int, int], list[int]]:
    """(ps, hp) -> read indices, with output_fas.py unphased allocation."""
    groups: dict[tuple[int, int], list[int]] = {}
    for i in range(len(reads)):
        if pr.hp[i] > 0:
            groups.setdefault((int(pr.ps[i]), int(pr.hp[i])), []).append(i)
    unphased = [i for i in range(len(reads)) if pr.hp[i] == 0]
    if not groups:
        return {(-1, 0): unphased} if unphased else {}
    block_ids = sorted({ps for ps, _ in groups})
    bounds = {}
    for b in block_ids:
        idxs = [i for (ps, hp), v in groups.items() for i in v if ps == b]
        bounds[b] = (min(reads[i].pos for i in idxs),
                     max(reads[i].reference_end for i in idxs))
    for i in unphased:
        if len(block_ids) == 1:
            tgt = block_ids[0]
        else:
            best, tgt = -np.inf, block_ids[0]
            for b in block_ids:
                olp = min(reads[i].reference_end, bounds[b][1]) - \
                    max(reads[i].pos, bounds[b][0])
                if olp > best:
                    best, tgt = olp, b
        groups.setdefault((tgt, 1), []).append(i)
        groups.setdefault((tgt, 2), []).append(i)
    return groups


def phased_snv_records(pr: PhaseResult, ref_codes: np.ndarray,
                       region_start: int, chrom: str) -> list:
    """Phased het-SNV VCF records -- the `region_phased.vcf` artifact the
    reference's longshot step writes next to the phased BAM
    (2_phasing/longshot.py:20).  One record per purified het site, with the
    phased GT (0|1 / 1|0) and the phase-set id in INFO/PS.

    The per-site phase is re-derived as the majority allele among the
    hap-1-assigned reads (identical on the host and device paths)."""
    from focalsv_tpu.io.vcf import VcfRecord
    if pr.n_sites == 0:
        return []
    A = pr.allele_mat
    if A.size:
        hap1 = pr.hp == 1
        hap2 = pr.hp == 2
        v1 = ((A == 1) & hap1[:, None]).sum(0) + \
            ((A == 0) & hap2[:, None]).sum(0)
        v0 = ((A == 0) & hap1[:, None]).sum(0) + \
            ((A == 1) & hap2[:, None]).sum(0)
        h = np.where(v1 > v0, 1, 0).astype(np.int8)   # hap-1 allele index
    elif pr.site_hap1 is not None and len(pr.site_hap1) == pr.n_sites:
        h = np.asarray(pr.site_hap1, np.int8)  # device-computed, same math
    else:
        return []
    # per-block phase-set ids: genome position of the block's first site + 1
    ps_of_block = {}
    for s in range(pr.n_sites):
        b = int(pr.site_blocks[s])
        ps_of_block.setdefault(b, int(pr.site_positions[s]) + 1)
    out = []
    base_ch = "ACGTN"
    site_pos = pr.site_positions
    site_a0, site_a1 = pr.site_allele0, pr.site_allele1
    for s in range(pr.n_sites):
        gpos = int(site_pos[s])
        lpos = gpos - region_start
        if not (0 <= lpos < len(ref_codes)):
            continue
        refb = int(ref_codes[lpos])
        a0, a1 = int(site_a0[s]), int(site_a1[s])
        if a0 > 3 or a1 > 3:
            continue   # DEL-allele phasing marker, not a SNV
        if a0 != refb and a1 != refb:
            # triallelic het (both alleles non-reference): a biallelic 0/1
            # record cannot represent which haplotype carries which ALT --
            # skip rather than emit a misleading 1|1
            continue
        hap1_allele = a0 if h[s] == 0 else a1
        hap2_allele = a1 if h[s] == 0 else a0
        # ALT = the first non-reference allele (a0 is the major allele)
        alt = a0 if a0 != refb else a1
        if alt == refb:
            continue     # both alleles equal the reference: not a variant
        g1 = 0 if hap1_allele == refb else 1
        g2 = 0 if hap2_allele == refb else 1
        out.append(VcfRecord(
            chrom=chrom, pos=gpos + 1, id=".",
            ref=base_ch[refb], alt=base_ch[alt],
            qual="30", filter="PASS",
            info=dict(PS=ps_of_block[int(pr.site_blocks[s])]),
            gt=f"{g1}|{g2}"))
    return out
