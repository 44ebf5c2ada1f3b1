"""False-positive filter: drop calls without read-signature support.

Port of `Dippav/FP_filter_v1.py`: a call is supported if some read signature
lies within max_shift and has size similarity >= min_size_sim (compare_sigs
:56-69, type-agnostic like the reference); calls larger than max_comp_svlen
auto-pass with support 60 (eval_sig :73-90).  Vectorized: one broadcasted
predicate per chromosome instead of the reference's per-call python scan.
"""

from __future__ import annotations

import numpy as np

from focalsv_tpu.config import FPFilterConfig
from focalsv_tpu.io.vcf import VcfRecord
from focalsv_tpu.signatures.sigs import Sigs


def support_counts(
    call_pos: np.ndarray, call_len: np.ndarray,
    sig_pos: np.ndarray, sig_len: np.ndarray,
    cfg: FPFilterConfig = FPFilterConfig(),
) -> np.ndarray:
    """Read-signature support count per call (60 = auto-pass)."""
    n = call_pos.shape[0]
    if n == 0:
        return np.zeros(0, np.int64)
    out = np.zeros(n, np.int64)
    big = call_len > cfg.max_comp_svlen
    out[big] = 60
    small = np.nonzero(~big)[0]
    if small.size == 0 or sig_pos.shape[0] == 0:
        return out
    cp = call_pos[small][:, None].astype(np.int64)
    cl = call_len[small][:, None].astype(np.float64)
    sp = sig_pos[None, :].astype(np.int64)
    sl = sig_len[None, :].astype(np.float64)
    shift = np.abs(cp - sp)
    size_sim = np.minimum(cl, sl) / np.maximum(np.maximum(cl, sl), 1)
    match = (shift <= cfg.max_shift) & (size_sim >= cfg.min_size_sim) & \
        (np.abs(cp - sp) <= cfg.max_dist)
    out[small] = match.sum(axis=1)
    return out


def fp_filter_records(
    records: list[VcfRecord], read_sigs: Sigs,
    cfg: FPFilterConfig = FPFilterConfig(),
) -> tuple[list[VcfRecord], list[VcfRecord]]:
    """Returns (kept, dropped) by read-signature support.

    ``read_sigs`` carries no chromosome column (Sigs are per-chromosome
    containers), so records and signatures MUST come from the same
    chromosome; mixed-chromosome record lists are rejected."""
    if not records:
        return [], []
    if len({r.chrom for r in records}) > 1:
        raise ValueError(
            "fp_filter_records requires single-chromosome records; got "
            f"{sorted({r.chrom for r in records})}")
    call_pos = np.array([r.pos for r in records], np.int64)
    call_len = np.array([abs(len(r.alt) - len(r.ref)) for r in records], np.int64)
    sup = support_counts(call_pos, call_len, read_sigs.pos,
                         read_sigs.svlen, cfg)
    kept, dropped = [], []
    for r, s in zip(records, sup):
        (kept if s >= cfg.min_support else dropped).append(
            r.with_info(SUPPORT=int(s)))
    return kept, dropped
