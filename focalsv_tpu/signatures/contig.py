"""Contig-signature extraction: CIGAR walk + split-alignment geometry -> SVs.

Port of the reference's per-dtype extractors
(`Dippav/extract_contig_signature_{CCS,CLR,ONT}.py`) onto the framework's own
alignment records; the CIGAR walk is a vectorized prefix-sum over the op
array instead of a per-op python loop.

Per-dtype behavioral differences preserved:
- CCS: split rules with Diffolp thresholds 30/3000 and midpoint INS position
  for |Diffolp|>400 (CCS :268-327); mapq gates 50/50 (:679-680).
- CLR: CIGAR-noise gates ins_pct<=0.13 OR avg-match-run>=200
  (CLR :12-31,:384-386); ratio-based split rules r=0.3 (:328).
- ONT: r=0.5, split-INS band [0.8*Diffdis, |Diffdis|*0.5] (ONT :315,:340).
"""

from __future__ import annotations

import numpy as np

from focalsv_tpu.config import ContigSigConfig, DataType
from focalsv_tpu.io import bam as bamio
from focalsv_tpu.signatures.sigs import (
    DEL, INS, SRC_CIGAR, SRC_SPLIT, PairedSig, Sigs, cluster_keep_longest,
    pair_haplotypes,
)


# ---------------------------------------------------------------------------
# CIGAR walk (vectorized)
# ---------------------------------------------------------------------------

# query-consuming ops plus hard clip: full-contig-space offsets (CCS :24-46)
_FULL_QUERY_OPS = bamio.CONSUMES_QUERY.copy()
_FULL_QUERY_OPS[bamio.CHARD_CLIP] = True


def cigar_stats(cigar: np.ndarray) -> tuple[float, float]:
    """(ins_pct, avg match-run length) -- CLR noise gates (CLR :12-31)."""
    ops, lens = cigar[:, 0], cigar[:, 1]
    m = lens[ops == bamio.CMATCH]
    ins = int(lens[ops == bamio.CINS].sum())
    mlen = int(m.sum())
    ip = ins / (mlen + ins) if (mlen + ins) else 0.0
    avg = float(m.mean()) if m.size else 0.0
    return ip, avg


def sigs_from_cigar(
    cigar: np.ndarray, ref_start: int, contig_id: int, strand: int, mapq: int,
    min_svlen: int = 30,
) -> list[dict]:
    """Emit DEL/INS >= min_svlen from one alignment's CIGAR.

    Contig offsets include leading hard clips (reference keeps offsets in
    full-contig space, CCS :24-46).
    """
    if cigar.shape[0] == 0:
        return []
    ops, lens = cigar[:, 0].astype(np.int64), cigar[:, 1].astype(np.int64)
    ref_c = np.where(bamio.CONSUMES_REF[ops], lens, 0)
    # contig offset counts M, I, S (soft clip) plus leading hard clip
    q_c = np.where(bamio.CONSUMES_QUERY[ops], lens, 0)
    ref_off = ref_start + np.concatenate([[0], np.cumsum(ref_c)[:-1]])
    q_off = np.concatenate([[0], np.cumsum(q_c)[:-1]])
    hard_head = int(lens[0]) if ops[0] == bamio.CHARD_CLIP else 0
    q_off = q_off + hard_head
    rows = []
    for i in np.nonzero((ops == bamio.CDEL) & (lens >= min_svlen))[0]:
        rows.append(dict(svtype=DEL, pos=int(ref_off[i]), svlen=int(lens[i]),
                         contig=contig_id, rstart=int(q_off[i]),
                         rend=int(q_off[i]) + 1, strand=strand,
                         source=SRC_CIGAR, mapq=mapq))
    for i in np.nonzero((ops == bamio.CINS) & (lens >= min_svlen))[0]:
        rows.append(dict(svtype=INS, pos=int(ref_off[i]), svlen=int(lens[i]),
                         contig=contig_id, rstart=int(q_off[i]),
                         rend=int(q_off[i] + lens[i]), strand=strand,
                         source=SRC_CIGAR, mapq=mapq))
    rows.sort(key=lambda r: r["pos"])
    return rows


def merge_intra_read(rows: list[dict]) -> list[dict]:
    """Merge nearby same-read signatures (CCS cluster_{ins,del}_one_read
    :69-122): INS merge bands (>250 & shift<250), (>320 & shift<380),
    (>100 & shift<250); DEL merge (>150 & shift<150) with span-union length."""
    ins = [r for r in rows if r["svtype"] == INS]
    dels = [r for r in rows if r["svtype"] == DEL]

    def merge_ins(a, b):
        out = dict(a)
        out["svlen"] = b["rend"] - a["rstart"]
        out["rend"] = b["rend"]
        return out

    def merge_del(a, b):
        out = dict(a)
        out["svlen"] = b["pos"] + b["svlen"] - a["pos"]
        out["rend"] = a["rstart"] + 1
        return out

    res_i: list[dict] = []
    for r in ins:
        if res_i:
            a = res_i[-1]
            shift = abs(r["pos"] - a["pos"])
            l1, l2 = a["svlen"], r["svlen"]
            if (l1 > 250 and l2 > 250 and shift < 250) or \
               (l1 > 320 and l2 > 320 and shift < 380) or \
               (l1 > 100 and l2 > 100 and shift < 250):
                res_i[-1] = merge_ins(a, r)
                continue
        res_i.append(r)
    res_d: list[dict] = []
    for r in dels:
        if res_d:
            a = res_d[-1]
            if a["svlen"] > 150 and r["svlen"] > 150 and abs(r["pos"] - a["pos"]) < 150:
                res_d[-1] = merge_del(a, r)
                continue
        res_d.append(r)
    return res_d + res_i


# ---------------------------------------------------------------------------
# split-alignment geometry
# ---------------------------------------------------------------------------


def sigs_from_split_pair(
    a1: dict, a2: dict, data_type: DataType, max_svlen: int = 50_000,
    split_ratio: float | None = None,
) -> list[dict]:
    """Diffdis/Diffolp geometry on an adjacent same-strand clipped pair.

    a1/a2: dicts with keys ref_start, ref_end, read_start, read_end (aligned
    query interval in full-contig space), strand, mapq, contig, has_clip_tail /
    has_clip_head; a1.ref_start <= a2.ref_start.
    """
    if a1["strand"] != a2["strand"]:
        return []
    if not (a1["clip_tail"] and a2["clip_head"]):
        return []
    ref1e, ref2s = a1["ref_end"], a2["ref_start"]
    read1e, read2s = a1["read_end"], a2["read_start"]
    diffdis = (ref2s - ref1e) - (read2s - read1e)
    if abs(diffdis) > max_svlen:
        return []
    strand = a1["strand"]
    mapq = min(a1["mapq"], a2["mapq"])
    base = dict(contig=a1["contig"], strand=strand, source=SRC_SPLIT, mapq=mapq)
    rows = []
    if data_type == DataType.HIFI:
        diffolp = ref1e - ref2s
        if diffolp < 30 and diffdis >= 30:
            rows.append(dict(base, svtype=DEL, pos=ref1e, svlen=diffdis,
                             rstart=read1e, rend=read2s))
        elif diffolp < 3000 and diffdis >= 30:
            rows.append(dict(base, svtype=DEL, pos=ref1e - diffdis,
                             svlen=diffdis, rstart=read1e - diffdis,
                             rend=read2s - diffdis))
        elif diffolp < 3000 and diffdis <= -30:
            svlen = abs(read2s - read1e + diffolp)
            pos = (ref1e + ref2s) // 2 if abs(diffolp) > 400 else ref2s
            rows.append(dict(base, svtype=INS, pos=pos, svlen=svlen,
                             rstart=read1e - diffolp, rend=read2s))
    else:
        r = split_ratio if split_ratio is not None else (
            0.3 if data_type == DataType.CLR else 0.5)
        if diffdis >= 30:
            diffolp = read1e - read2s
            if -(diffdis * r) <= diffolp <= diffdis * r:
                rows.append(dict(base, svtype=DEL, pos=ref1e, svlen=diffdis,
                                 rstart=read1e, rend=read2s))
        elif diffdis <= -30:
            diffolp = ref1e - ref2s
            lo = diffdis * (r if data_type == DataType.CLR else 0.8)
            if lo <= diffolp <= abs(diffdis) * r:
                svlen = abs(read2s - read1e + diffolp)
                pos = (ref1e + ref2s) // 2 if abs(diffolp) > 400 else ref2s
                rows.append(dict(base, svtype=INS, pos=pos, svlen=svlen,
                                 rstart=read1e - diffolp, rend=read2s))
    return rows


def _aln_geometry(cigar: np.ndarray, ref_start: int, mapq: int, strand: int,
                  contig: int) -> dict:
    """Geometry dict for split-pair analysis from one alignment."""
    ops, lens = cigar[:, 0], cigar[:, 1]
    rl = int(lens[_FULL_QUERY_OPS[ops]].sum())
    clip_head = int(ops[0]) in (bamio.CSOFT_CLIP, bamio.CHARD_CLIP)
    clip_tail = int(ops[-1]) in (bamio.CSOFT_CLIP, bamio.CHARD_CLIP)
    read_start = int(lens[0]) if clip_head else 0
    read_end = rl - (int(lens[-1]) if clip_tail else 0)
    ref_len = int(lens[bamio.CONSUMES_REF[ops]].sum())
    return dict(ref_start=ref_start, ref_end=ref_start + ref_len,
                read_start=read_start, read_end=read_end, read_len=rl,
                clip_head=clip_head, clip_tail=clip_tail,
                strand=strand, mapq=mapq, contig=contig)


# ---------------------------------------------------------------------------
# haplotype-level extraction
# ---------------------------------------------------------------------------


def extract_hap_sigs(
    alignments: list,           # objects w/ .cigar (n,2), .t_start, .strand, .mapq, .q_name
    contig_names: list[str],
    data_type: DataType,
    cfg: ContigSigConfig,
) -> Sigs:
    """All signatures of one haplotype's contig alignments, clustered."""
    name_id = {n: i for i, n in enumerate(contig_names)}
    cigar_rows: list[dict] = []
    geoms: dict[str, list[dict]] = {}
    for a in alignments:
        cig = np.asarray(a.cigar, np.int64).reshape(-1, 2)
        cid = name_id.setdefault(a.q_name, len(name_id))
        if len(contig_names) < len(name_id):
            contig_names.append(a.q_name)
        if a.mapq >= cfg.min_mapq_cigar:
            ok = True
            if data_type == DataType.CLR:
                ip, avg = cigar_stats(cig)
                ok = (ip <= cfg.clr_max_ins_pct) or (avg >= cfg.clr_min_match_run)
            if ok:
                rows = sigs_from_cigar(cig, a.t_start, cid, a.strand, a.mapq,
                                       cfg.min_sv_size)
                cigar_rows.extend(merge_intra_read(rows))
        if a.mapq >= cfg.min_mapq_split:
            geoms.setdefault(a.q_name, []).append(
                _aln_geometry(cig, a.t_start, a.mapq, a.strand, cid))
    split_rows: list[dict] = []
    for name, gs in geoms.items():
        if len(gs) < 2:
            continue
        gs.sort(key=lambda g: g["ref_start"])
        for i in range(len(gs) - 1):
            split_rows.extend(
                sigs_from_split_pair(gs[i], gs[i + 1], data_type,
                                     split_ratio=cfg.split_ratio))
    cig_sigs = Sigs.from_rows(cigar_rows, contig_names).sort_by_pos()
    spl_sigs = Sigs.from_rows(split_rows, contig_names).sort_by_pos()
    # cluster each source, then merged (reference extract_signature_one_hap)
    parts = []
    for svtype in (DEL, INS):
        c = cluster_keep_longest(cig_sigs.of_type(svtype), svtype,
                                 cfg.max_shift, cfg.min_overlap_frac,
                                 cfg.min_size_sim)
        s = cluster_keep_longest(spl_sigs.of_type(svtype), svtype,
                                 cfg.max_shift, cfg.min_overlap_frac,
                                 cfg.min_size_sim)
        merged = Sigs.concat([c, s]).sort_by_pos()
        parts.append(cluster_keep_longest(merged, svtype, cfg.max_shift,
                                          cfg.min_overlap_frac,
                                          cfg.min_size_sim))
    return Sigs.concat(parts).sort_by_pos()


def call_diploid(
    hp1_alignments: list, hp2_alignments: list,
    contig_names_hp1: list[str], contig_names_hp2: list[str],
    data_type: DataType, cfg: ContigSigConfig,
) -> list[PairedSig]:
    """Two haplotypes' alignments -> genotyped SV calls."""
    s1 = extract_hap_sigs(hp1_alignments, contig_names_hp1, data_type, cfg)
    s2 = extract_hap_sigs(hp2_alignments, contig_names_hp2, data_type, cfg)
    return pair_haplotypes(s1, s2)
