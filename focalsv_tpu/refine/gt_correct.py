"""Genotype refinement: threshold re-call (HiFi), impute (CLR/ONT), ONT final.

Ports:
- correct_gt_{del,ins}_real_data.py: per call, n_ratio = (signature reads
  matching by size band [len*sim, len/sim] and shift <= max(len*2.3, 500))
  / (spanning-read depth); thresholds from para/GT_correction_para_* re-call
  0/1 <-> 1/1 per size class (correct_gt_eval :284-311).  DEL depth counts
  reads spanning [pos, pos+len] (flank-average for >1 kb,
  check_full_cover_reads :151-172); INS depth counts reads spanning
  pos +- 150 (correct_gt_ins_real_data.py:190-198).
- GT_impute.py: transfer GT from the read-based draft by best
  (size-sim desc, |dist| asc) match within 1 kb & size-sim >= 0.5.
- ONT_var_process.py: INS = union with read-draft calls; DEL kept only
  within +-100 bp of a read-draft SV.
"""

from __future__ import annotations

import numpy as np

from focalsv_tpu.config import GTCorrectConfig, GTImputeConfig
from focalsv_tpu.io.vcf import VcfRecord, sort_records


# ---------------------------------------------------------------------------
# HiFi threshold-based correction
# ---------------------------------------------------------------------------

# thresholds from para/GT_correction_para_{dtype}_{svtype}.txt (nan = skip)
GT_PARAMS = {
    ("Hifi", "DEL"): dict(t_large_11=0.6, t_small_11=0.69, t_large_01=0.71, t_small_01=0.91),
    ("Hifi", "INS"): dict(t_large_11=None, t_small_11=0.59, t_large_01=0.63, t_small_01=0.79),
    ("CLR", "DEL"): dict(t_large_11=0.55, t_small_11=0.59, t_large_01=0.65, t_small_01=0.75),
    ("CLR", "INS"): dict(t_large_11=None, t_small_11=None, t_large_01=0.64, t_small_01=0.75),
    ("ONT", "DEL"): dict(t_large_11=0.61, t_small_11=0.61, t_large_01=0.68, t_small_01=0.79),
    ("ONT", "INS"): dict(t_large_11=None, t_small_11=None, t_large_01=0.67, t_small_01=0.72),
}


def match_support(
    call_pos: np.ndarray, call_len: np.ndarray,
    sig_pos: np.ndarray, sig_len: np.ndarray, sig_reads: np.ndarray,
    cfg: GTCorrectConfig = GTCorrectConfig(),
) -> np.ndarray:
    """Supporting-read count per call (match_varlist_siglist :94-139)."""
    n = call_pos.size
    out = np.zeros(n, np.int64)
    if n == 0 or sig_pos.size == 0:
        return out
    cp = call_pos[:, None].astype(np.float64)
    cl = call_len[:, None].astype(np.float64)
    shift_max = np.maximum(cl * cfg.shift_factor, cfg.min_shift)
    in_window = np.abs(cp - sig_pos[None, :]) <= shift_max
    sl = np.abs(sig_len)[None, :].astype(np.float64)
    size_ok = (sl >= cl * cfg.min_size_sim) & (sl <= cl / cfg.min_size_sim)
    return ((in_window & size_ok) * sig_reads[None, :]).sum(axis=1)


def spanning_depth(
    pos: int, svlen: int, svtype: str,
    spans: np.ndarray,                  # (n, 2) read [start, end)
    size_boundary: int = 1000,
) -> float:
    """Spanning-read depth near a call (check_full_cover_reads semantics)."""
    if spans.shape[0] == 0:
        return 0.0
    if svtype == "INS":
        s, e = pos - 150, pos + 150
        return float(((spans[:, 0] < s) & (spans[:, 1] > e)).sum())
    if svlen <= size_boundary:
        s, e = pos, pos + svlen
        return float(((spans[:, 0] < s) & (spans[:, 1] > e)).sum())
    l0 = pos - 150
    left = ((spans[:, 0] < l0) & (spans[:, 1] > l0 + 100)).sum()
    r0 = pos + svlen + 150
    right = ((spans[:, 0] < r0) & (spans[:, 1] > r0 + 100)).sum()
    return (float(left) + float(right)) / 2


def correct_gt(
    records: list[VcfRecord],
    sig_pos: dict[str, np.ndarray], sig_len: dict[str, np.ndarray],
    sig_reads: dict[str, np.ndarray],
    spans: np.ndarray,
    dtype_name: str = "Hifi",
    cfg: GTCorrectConfig = GTCorrectConfig(),
) -> list[VcfRecord]:
    """Re-call 0/1 <-> 1/1 by support ratio (HiFi path of step 5)."""
    out = list(records)
    for svtype in ("DEL", "INS"):
        params = GT_PARAMS[(dtype_name, svtype)]
        idxs = [i for i, r in enumerate(records) if r.svtype == svtype]
        if not idxs:
            continue
        pos = np.array([records[i].pos for i in idxs], np.int64)
        ln = np.array([records[i].svlen for i in idxs], np.int64)
        sup = match_support(pos, ln, sig_pos.get(svtype, np.zeros(0)),
                            sig_len.get(svtype, np.zeros(0)),
                            sig_reads.get(svtype, np.zeros(0)), cfg)
        for k, i in enumerate(idxs):
            r = records[i]
            depth = spanning_depth(r.pos, r.svlen, svtype, spans,
                                   cfg.size_boundary)
            ratio = sup[k] / depth if depth > 0 else 0.0
            gt = r.gt.replace("|", "/")
            large = r.svlen > cfg.size_boundary
            key = ("t_large_" if large else "t_small_") + \
                ("11" if gt == "1/1" else "01" if gt == "0/1" else "")
            t = params.get(key)
            if not key.endswith(("11", "01")) or t is None:
                continue
            new_gt = "1/1" if ratio > t else "0/1"
            if new_gt != gt:
                out[i] = VcfRecord(**{**r.__dict__, "gt": new_gt})
    return out


# ---------------------------------------------------------------------------
# CLR/ONT GT imputation from the read-based draft VCF
# ---------------------------------------------------------------------------


def gt_impute(
    records: list[VcfRecord], draft: list[VcfRecord],
    cfg: GTImputeConfig = GTImputeConfig(),
) -> list[VcfRecord]:
    """Best-match GT transfer (GT_impute.gt_impute_one_chromosome :42-76)."""
    out = []
    by_chrom: dict[str, list[VcfRecord]] = {}
    for d in draft:
        by_chrom.setdefault(d.chrom, []).append(d)
    for r in records:
        cands = []
        for d in by_chrom.get(r.chrom, []):
            if d.svtype != r.svtype:
                continue
            dist = abs(r.pos - d.pos)
            if dist > cfg.max_dist:
                continue
            sim = min(r.svlen, d.svlen) / max(r.svlen, d.svlen, 1)
            if sim >= cfg.min_size_sim:
                cands.append((-sim, dist, d.gt))
        if cands:
            cands.sort()
            out.append(VcfRecord(**{**r.__dict__, "gt": cands[0][2]}))
        else:
            out.append(r)
    return out


# ---------------------------------------------------------------------------
# ONT final process
# ---------------------------------------------------------------------------


def ont_final_process(
    records: list[VcfRecord], draft: list[VcfRecord],
    match_dist: int = 200, del_flank: int = 100, min_svlen: int = 30,
) -> list[VcfRecord]:
    """INS = union(assembly calls, draft calls); DEL = assembly DELs within
    +-del_flank of some draft SV (ONT_var_process.py:34-45)."""
    out: list[VcfRecord] = []
    # INS union: assembly INS + draft INS not matching any assembly INS
    asm_ins = [r for r in records if r.svtype == "INS"]
    out.extend(asm_ins)
    for d in draft:
        if d.svtype != "INS" or d.svlen < min_svlen:
            continue
        if not any(a.chrom == d.chrom and abs(a.pos - d.pos) <= match_dist
                   for a in asm_ins):
            out.append(d)
    # DEL filter by draft proximity
    draft_by_chrom: dict[str, list[int]] = {}
    for d in draft:
        if d.svlen >= min_svlen:
            draft_by_chrom.setdefault(d.chrom, []).append(d.pos)
    for r in records:
        if r.svtype != "DEL":
            continue
        poss = draft_by_chrom.get(r.chrom, [])
        if any(p - del_flank <= r.pos <= p + del_flank for p in poss):
            out.append(r)
    return sort_records(out)
