"""Genotype likelihoods for read-supported SV calls.

Port of Reads_Based_Scan/genotype.py: binomial-style GL over (ref reads c0,
alt reads c1) with err=0.1 and het prior 1/3 (:6-7, cal_GL :29-48), read-count
rescaling to <=100, and the reference-count threshold schedule
(threshold_ref_count :53-61).  Vectorized in log10 space over call batches.
"""

from __future__ import annotations

import numpy as np

GENOTYPES = ("0/0", "0/1", "1/1")


def rescale_read_counts(c0: np.ndarray, c1: np.ndarray, max_reads: int = 100):
    total = c0 + c1
    scale = total > max_reads
    c0s = np.where(scale, (max_reads * (c0 / np.maximum(total, 1))).astype(np.int64), c0)
    c1s = np.where(scale, max_reads - c0s, c1)
    return c0s, c1s


def cal_gl_batch(c0: np.ndarray, c1: np.ndarray, err: float = 0.1,
                 prior: float = 1.0 / 3.0):
    """Vectorized cal_GL: returns (gt_index (n,), PL (n,3), GQ (n,), QUAL (n,))."""
    c0 = np.asarray(c0, np.int64)
    c1 = np.asarray(c1, np.int64)
    c0, c1 = rescale_read_counts(c0, c1)
    log10 = np.log10
    l00 = c0 * log10(1 - err) + c1 * log10(err) + log10((1 - prior) / 2)
    l11 = c0 * log10(err) + c1 * log10(1 - err) + log10((1 - prior) / 2)
    l01 = (c0 + c1) * log10(0.5) + log10(prior)
    logs = np.stack([l00, l01, l11], axis=1)
    m = logs.max(axis=1, keepdims=True)
    lse = m[:, 0] + log10(np.power(10.0, logs - m).sum(axis=1))
    prob_log = np.minimum(logs - lse[:, None], 0.0)
    glp = np.power(10.0, prob_log)
    with np.errstate(divide="ignore"):
        pl = np.around(-10 * prob_log).astype(np.int64)
        gq3 = np.stack([
            -10 * log10(np.maximum(glp[:, 1] + glp[:, 2], 1e-300)),
            -10 * log10(np.maximum(glp[:, 0] + glp[:, 2], 1e-300)),
            -10 * log10(np.maximum(glp[:, 0] + glp[:, 1], 1e-300)),
        ], axis=1).astype(np.int64)
        qual = np.abs(np.around(-10 * log10(np.maximum(glp[:, 0], 1e-300)), 1))
    gt_idx = prob_log.argmax(axis=1)
    gq = gq3.max(axis=1)
    return gt_idx, pl, gq, qual


def cal_gl(c0: int, c1: int, err: float = 0.1, prior: float = 1.0 / 3.0):
    gt_idx, pl, gq, qual = cal_gl_batch(np.array([c0]), np.array([c1]),
                                        err, prior)
    return (GENOTYPES[int(gt_idx[0])],
            "%d,%d,%d" % tuple(pl[0]), int(gq[0]), float(qual[0]))


def cal_cipos(std: float, num: int) -> str:
    pos = int(1.96 * std / max(num, 1) ** 0.5)
    return "-%d,%d" % (pos, pos)


def threshold_ref_count(num: int) -> int:
    if num <= 2:
        return 10 * num
    if num <= 5:
        return 5 * num
    if num <= 15:
        return 4 * num
    return 3 * num
