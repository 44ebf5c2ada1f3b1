"""Read-evidence arbitration of contig calls inside tandem-repeat arrays.

Noisy-read (CLR/ONT) de-novo consensus mis-counts units of a tandem array:
the assembled contig loses or gains whole repeat units, so the contig call
comes out under-length (dying at the matcher's/filter's size gates) or the
array dissolves into a conflicting large-DEL + INS call cluster.  The raw
READS are the stronger witness at exactly these loci: each spanning read's
CIGAR carries the true net indel as one signature, and the per-haplotype
median over ~15 reads is robust to 12% base noise.

This mirrors the reference's use of read-level evidence to rescue noisy
assembly output in post-processing (`5_post_processing/GT_impute.py` imputes
CLR/ONT genotypes from reads_sig support; `ONT_var_process.py:34-45` unions
the read-scan INS set into the contig callset) — applied surgically, only
where a tandem-repeat unit is detected (`ops/normalize.snap_indel_with_unit`,
unit >= 3), so exact HiFi/guided contigs are never touched:

1. cluster canonically left-aligned read signatures per svtype;
2. a contig call with a same-type cluster within the pairing gate keeps
   its identity, but its length snaps to the cluster median when they
   disagree by >10% (whole-unit snapped);
3. a contig call inside an array with NO supporting cluster is dropped —
   overriding the FP filter's >250 bp auto-pass, which is what lets the
   mis-assembly's spurious large DEL through (array reads are spanning
   witnesses; the auto-pass exists for giant events whose read
   signatures genuinely vanish, which cannot happen inside an array the
   reads span);
4. a strong cluster with no surviving same-type call synthesizes a
   rescue record (genotyped by per-haplotype supporting-read counts, the
   GT_impute rule shape).
"""

from __future__ import annotations

import numpy as np

from focalsv_tpu.config import FPFilterConfig
from focalsv_tpu.io.vcf import VcfRecord
from focalsv_tpu.ops import encode as enc
from focalsv_tpu.ops.normalize import left_align_del, snap_indel_with_unit
from focalsv_tpu.signatures.sigs import DEL, INS, Sigs

_TNAME = {DEL: "DEL", INS: "INS"}


def _clusters(read_sigs: Sigs, svtype: int, min_support: int,
              cluster_dist: int = 120) -> list[dict]:
    """Proximity clusters of one svtype's (already canonically
    left-aligned) signatures: median pos/len + distinct supporting reads."""
    s = read_sigs.of_type(svtype)
    if len(s) == 0:
        return []
    order = np.argsort(s.pos, kind="stable")
    out: list[dict] = []
    cur: list[int] = []
    for i in order:
        if cur and int(s.pos[i]) - int(s.pos[cur[-1]]) > cluster_dist:
            out.append(cur)
            cur = []
        cur.append(int(i))
    out.append(cur)
    clusters = []
    for idx in out:
        reads = {int(s.contig[i]) for i in idx}
        if len(reads) < min_support:
            continue
        clusters.append(dict(
            svtype=svtype,
            pos=int(np.median([int(s.pos[i]) for i in idx])),
            length=int(np.median([int(s.svlen[i]) for i in idx])),
            read_names={s.names[int(s.contig[i])] for i in idx},
        ))
    return clusters


def _genotype(cluster: dict, reads, hp_by_name: dict[str, int]
              ) -> tuple[str, bool]:
    """(gt, decisive): hom iff both haplotypes' spanning reads support
    the event; decisive when both haplotypes are covered by phased reads
    (then the vote is the GT_impute-style read evidence, trustworthy).
    Unphased fallback: supporting fraction of all spanning reads."""
    pos = cluster["pos"]
    cov = {1: 0, 2: 0, 0: 0}
    sup = {1: 0, 2: 0, 0: 0}
    names = cluster["read_names"]
    for r in reads:
        if r.pos <= pos <= r.reference_end:
            h = hp_by_name.get(r.name, 0)
            cov[h] += 1
            if r.name in names:
                sup[h] += 1
    decisive = cov[1] >= 2 and cov[2] >= 2
    if decisive:
        hom = (sup[1] >= max(2, 0.3 * cov[1])
               and sup[2] >= max(2, 0.3 * cov[2]))
    else:
        total_cov = cov[0] + cov[1] + cov[2]
        total_sup = sup[0] + sup[1] + sup[2]
        hom = total_sup >= 0.7 * max(total_cov, 1)
    return ("1/1" if hom else "0/1"), decisive


def _unit_at(ref: np.ndarray, pos_local: int, length: int) -> int:
    """Repeat unit at an event locus, probing INTO the array: canonical
    (left-aligned) positions sit at the array's left boundary, where
    ref_period's left verification margin is non-array flank and the
    probe fails — a few steps right sit fully inside the array."""
    L = max(int(length), 20)
    for off in (0, L, 2 * L, 60):
        p = pos_local + off
        if not (0 <= p < len(ref)):
            continue
        _, u = snap_indel_with_unit(ref, p, L)
        if u >= 3:
            return u
    return 0


def _build_record(svtype: int, pos: int, length: int, gt: str,
                  ref: np.ndarray, ref_offset: int, chrom: str,
                  support: int, seq_id: int) -> VcfRecord | None:
    p0 = pos - ref_offset
    if not (1 <= p0 and p0 + length < len(ref)):
        return None
    anchor = enc.decode(np.asarray(ref[p0 - 1 : p0], np.uint8))
    tname = _TNAME[svtype]
    if svtype == DEL:
        ref_allele = anchor + enc.decode(
            np.asarray(ref[p0 : p0 + length], np.uint8))
        alt_allele = anchor
        svlen = -length
    else:
        # inside a tandem array the inserted bases are unit copies, i.e.
        # the (periodic) reference continuation at the canonical start
        ref_allele = anchor
        alt_allele = anchor + enc.decode(
            np.asarray(ref[p0 : p0 + length], np.uint8))
        svlen = length
    return VcfRecord(
        chrom=chrom, pos=pos, ref=ref_allele, alt=alt_allele,
        id=f"focalsv.{chrom}.{tname}.arb{seq_id}",
        qual="20", filter="PASS",
        info=dict(SVLEN=svlen, SVTYPE=tname, TIG_REGION=".",
                  QUERY_STRAND=".", SIG_SOURCE="reads", TIG_MAPQ=60,
                  SUPPORT=support),
        gt=gt)


def arbitrate_array_calls(
    records: list[VcfRecord],
    read_sigs: Sigs,
    reads,
    hp_by_name: dict[str, int],
    ref: np.ndarray,
    ref_offset: int,
    chrom: str,
    cfg: FPFilterConfig = FPFilterConfig(),
    min_sv_size: int = 50,
) -> tuple[list[VcfRecord], list[VcfRecord]]:
    """Returns (records, dropped).  No-op outside detected tandem arrays
    and wherever contig calls already agree with the read evidence."""
    if not cfg.array_arbitrate or len(read_sigs) == 0:
        return records, []
    clusters = []
    for svtype in (DEL, INS):
        clusters += _clusters(read_sigs, svtype, cfg.arb_min_support)
    # keep array-locus clusters only; canonicalize their pos/len to units
    arrays = []
    for c in clusters:
        p0 = c["pos"] - ref_offset
        u = _unit_at(ref, p0, c["length"])
        if u < 3:
            continue
        L = c["length"]
        k = max(1, round(L / u))
        snapped = k * u if abs(L - k * u) <= max(6, int(0.45 * u)) else L
        if snapped % u == 0 and 0 <= p0 < len(ref):
            c["pos"] = left_align_del(ref, p0, u) + ref_offset
        c["length"] = snapped
        c["unit"] = u
        arrays.append(c)
    if not arrays:
        return records, []

    W = cfg.max_shift
    kept: list[VcfRecord] = []
    dropped: list[VcfRecord] = []
    matched: dict[int, list[VcfRecord]] = {i: [] for i in range(len(arrays))}
    for r in records:
        rtype = DEL if len(r.ref) > len(r.alt) else INS
        rlen = abs(len(r.alt) - len(r.ref))
        near = [(i, c) for i, c in enumerate(arrays)
                if abs(r.pos - c["pos"]) <= W]
        if not near:
            kept.append(r)
            continue
        same = [(i, c) for i, c in near if c["svtype"] == rtype]
        best = None
        if same:
            best = max(same, key=lambda ic: (
                min(rlen, ic[1]["length"]) / max(rlen, ic[1]["length"], 1)))
            bi, bc = best
            sim = min(rlen, bc["length"]) / max(rlen, bc["length"], 1)
            if sim < 0.6:
                best = None
        if best is None:
            # a call inside the array with no read cluster backing its
            # type+length: mis-assembly artifact (spanning reads would
            # have seen it) — drop, auto-pass notwithstanding
            if _unit_at(ref, r.pos - ref_offset, max(rlen, 20)) >= 3:
                dropped.append(r.with_info(ARB="unsupported_in_array"))
            else:
                kept.append(r)
            continue
        bi, bc = best
        sim = min(rlen, bc["length"]) / max(rlen, bc["length"], 1)
        # contig hp-pairing is unreliable exactly where the array
        # mangled a contig: take the phased-read vote when decisive
        # (the GT_impute rule applied at array loci)
        gt_rv, decisive = _genotype(bc, reads, hp_by_name)
        gt = gt_rv if decisive else r.gt
        if sim < 0.9:
            # right event, wrong unit count: take the reads' length at
            # the canonical array start (REF/ALT rebuilt from the
            # periodic reference)
            nr = _build_record(rtype, bc["pos"], bc["length"], gt,
                               ref, ref_offset, chrom,
                               support=len(bc["read_names"]),
                               seq_id=len(kept))
            if nr is not None:
                r = nr.with_info(ARB="length_from_reads")
        elif decisive and gt != r.gt:
            import dataclasses
            r = dataclasses.replace(r, gt=gt).with_info(ARB="gt_from_reads")
        matched[bi].append(r)
        kept.append(r)

    # rescue: strong array cluster with no surviving same-type call
    seq = 0
    for i, c in enumerate(arrays):
        if c["length"] < min_sv_size:
            continue
        if any((DEL if len(r.ref) > len(r.alt) else INS) == c["svtype"]
               for r in matched[i]):
            continue
        gt, _decisive = _genotype(c, reads, hp_by_name)
        nr = _build_record(c["svtype"], c["pos"], c["length"], gt,
                           ref, ref_offset, chrom,
                           support=len(c["read_names"]), seq_id=seq)
        if nr is not None:
            kept.append(nr.with_info(ARB="rescued_from_reads"))
            seq += 1
    kept.sort(key=lambda r: r.pos)
    return kept, dropped
