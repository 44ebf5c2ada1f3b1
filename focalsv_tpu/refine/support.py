"""Signature-support coverage per call (reference:
5_post_processing/calculate_signature_support.py).

For each call, 'cov' is the total length of read signatures whose footprint
overlaps the +-flank window around the call: INS signatures count as
length-weighted points (calc_ins_call_cov :79-123); DEL signatures count as
[start, start+len] intervals (calc_del_call_cov :136-278).  The reference's
double-sweep is replaced by one broadcasted interval-overlap reduction per
chromosome.
"""

from __future__ import annotations

import numpy as np

from focalsv_tpu.io.vcf import VcfRecord


def ins_call_cov(call_pos: np.ndarray, sig_pos: np.ndarray,
                 sig_len: np.ndarray, flank: int = 1000) -> np.ndarray:
    """Sum of INS signature lengths within +-flank of each call position.
    Duplicate signature positions are collapsed to one weighted point first
    (reference uses a per-unique-position bincount)."""
    if call_pos.size == 0:
        return np.zeros(0, np.int64)
    if sig_pos.size == 0:
        return np.zeros(call_pos.size, np.int64)
    upos, inv = np.unique(sig_pos, return_inverse=True)
    weights = np.bincount(inv, weights=sig_len)
    lo = np.searchsorted(upos, call_pos - flank, side="left")
    hi = np.searchsorted(upos, call_pos + flank, side="right")
    cw = np.concatenate([[0.0], np.cumsum(weights)])
    return (cw[hi] - cw[lo]).astype(np.int64)


def del_call_cov(call_start: np.ndarray, call_end: np.ndarray,
                 sig_start: np.ndarray, sig_len: np.ndarray,
                 flank: int = 1000) -> np.ndarray:
    """Sum of DEL signature lengths whose interval overlaps the flanked call
    interval (overlap >= 0, matching the reference's validation algorithm
    calculate_signature_support.py:253-277)."""
    n = call_start.size
    if n == 0:
        return np.zeros(0, np.int64)
    if sig_start.size == 0:
        return np.zeros(n, np.int64)
    cs = (call_start - flank)[:, None]
    ce = (call_end + flank)[:, None]
    ss = sig_start[None, :]
    se = (sig_start + np.abs(sig_len))[None, :]
    olp = np.minimum(ce, se) - np.maximum(cs, ss)
    m = olp >= 0
    return (m * np.abs(sig_len)[None, :]).sum(axis=1).astype(np.int64)


def signature_support_table(
    records: list[VcfRecord],
    del_sig_pos: np.ndarray, del_sig_len: np.ndarray,
    ins_sig_pos: np.ndarray, ins_sig_len: np.ndarray,
    flank: int = 1000, min_size: int = 30,
) -> list[dict]:
    """Per-record dict rows: svid, svtype, svlen, cov, rel_cov."""
    rows = []
    ins_recs = [(i, r) for i, r in enumerate(records)
                if r.svtype == "INS" and r.svlen >= min_size]
    del_recs = [(i, r) for i, r in enumerate(records)
                if r.svtype == "DEL" and r.svlen >= min_size]
    if ins_recs:
        pos = np.array([r.pos for _, r in ins_recs], np.int64)
        cov = ins_call_cov(pos, ins_sig_pos, ins_sig_len, flank)
        for (i, r), c in zip(ins_recs, cov):
            rows.append(dict(idx=i, svid=r.id, svtype="INS", svlen=r.svlen,
                             cov=int(c), rel_cov=c / max(r.svlen, 1)))
    if del_recs:
        start = np.array([r.pos for _, r in del_recs], np.int64)
        end = np.array([r.pos + r.svlen for _, r in del_recs], np.int64)
        cov = del_call_cov(start, end, del_sig_pos, del_sig_len, flank)
        for (i, r), c in zip(del_recs, cov):
            rows.append(dict(idx=i, svid=r.id, svtype="DEL", svlen=r.svlen,
                             cov=int(c), rel_cov=c / max(r.svlen, 1)))
    return rows
