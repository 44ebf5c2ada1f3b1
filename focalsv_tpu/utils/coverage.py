"""Coverage estimation utilities.

Ports of TRA_INV_DUP_call/Auto/estimate_coverage.py (sampled-bin mean
coverage used for CLR/ONT min_sig and DUP filtering) and bed_avg_depth.py
(per-interval depth features with +-flank windows for the DUP round-2
filter), computed from read spans instead of `samtools depth` subprocesses.
"""

from __future__ import annotations

import numpy as np

from focalsv_tpu.io import bam as bamio


def mean_coverage_from_spans(
    spans: np.ndarray,           # (n, 2) read [start, end)
    ref_len: int,
    n_bins: int = 100,
    bin_size: int = 500_000,
    seed: int = 0,
) -> float:
    """Sampled-bin mean coverage (estimate_bam_cov :101-125 semantics:
    average depth over randomly placed bins)."""
    if spans.shape[0] == 0 or ref_len <= 0:
        return 0.0
    rng = np.random.default_rng(seed)
    bin_size = min(bin_size, max(ref_len // 4, 1))
    n_bins = min(n_bins, max(ref_len // bin_size, 1))
    starts = rng.integers(0, max(ref_len - bin_size, 1), size=n_bins)
    covs = []
    s, e = spans[:, 0], spans[:, 1]
    for b in starts:
        olp = np.minimum(e, b + bin_size) - np.maximum(s, b)
        covs.append(olp[olp > 0].sum() / bin_size)
    return float(np.mean(covs))


def estimate_bam_cov(bam: bamio.BamReader, chroms: list[str] | None = None,
                     n_bins: int = 100, bin_size: int = 500_000,
                     seed: int = 0) -> float:
    """Genome-wide mean coverage from SAMPLED bins, not a full-BAM walk
    (reference Auto/estimate_coverage.py:101-125: 100 random 500 kb bins via
    `samtools depth`).  Bins are allocated across chromosomes proportionally
    to length; each bin costs one BAI random-access fetch."""
    chroms = chroms or bam.ref_names
    lens = dict(zip(bam.ref_names, bam.ref_lens))
    chroms = [c for c in chroms if lens.get(c, 0) > 0]
    if not chroms:
        return 0.0
    total_len = sum(lens[c] for c in chroms)
    rng = np.random.default_rng(seed)
    covs: list[float] = []
    for c in chroms:
        clen = lens[c]
        bsize = min(bin_size, max(clen // 2, 1))
        k = max(1, round(n_bins * clen / total_len))
        starts = rng.integers(0, max(clen - bsize, 1), size=k)
        for b in starts:
            b = int(b)
            bases = 0
            for rec in bam.fetch(c, b, b + bsize):
                if (rec.is_secondary or rec.is_supplementary
                        or rec.is_unmapped):
                    continue
                bases += (min(rec.reference_end, b + bsize)
                          - max(rec.pos, b))
            covs.append(bases / bsize)
    return float(np.mean(covs)) if covs else 0.0


def interval_depth_features(
    spans: np.ndarray,           # (n, 2)
    start: int, end: int, flank: int = 1000,
) -> tuple[float, float, float]:
    """(cov_sv, cov_left, cov_right): mean depth inside the interval and in
    the +-flank windows (bed_avg_depth.py :45-67)."""
    def mean_depth(a: int, b: int) -> float:
        if b <= a or spans.shape[0] == 0:
            return 0.0
        olp = np.minimum(spans[:, 1], b) - np.maximum(spans[:, 0], a)
        return float(olp[olp > 0].sum() / (b - a))

    return (mean_depth(start, end),
            mean_depth(start - flank, start),
            mean_depth(end, end + flank))


def dup_round2_features(
    sv, spans: np.ndarray, mean_cov: float, flank: int = 1000,
) -> dict:
    """Coverage-feature row for the DUP second-round filter
    (process_dup.py second_round_filter :88-137)."""
    cov_sv, cov_left, cov_right = interval_depth_features(
        spans, sv.start, sv.end, flank)
    denom = max(cov_left + cov_right, 1e-9)
    return dict(
        rel_n_sup=sv.support * 2 / denom,
        rel_cov_diff=cov_sv * 2 / denom,
        rel_cov_sv=cov_sv / max(mean_cov, 1e-9),
        rel_std=min(sv.std_left, sv.std_right) / max(sv.support, 1),
        cov_sv=cov_sv, cov_left=cov_left, cov_right=cov_right,
    )


# tuned round-2 bands per (dtype, Tumor/Normal) -- process_dup.py :105-132
DUP_ROUND2_BANDS = {
    ("HIFI", "Tumor"): dict(rel_cov_diff=(1.1, 3), rel_n_sup=(0.25, 1.5),
                            min_mapq=59.8, rel_cov_sv=(0.6, 5), std_lt=1.4),
    ("HIFI", "Normal"): dict(rel_cov_diff=(1.3, 4), rel_n_sup=(0.25, 1.2),
                             min_mapq=59.5, rel_cov_sv=(1, 4), std_lt=1.4),
    ("CLR", "Tumor"): dict(rel_cov_diff=(1.15, 8), rel_n_sup=(0.22, 4.6),
                           min_mapq=50, rel_cov_sv=(0.7, 9), std_lt=25,
                           rel_std_lt=2, size=(3000, 35e6)),
    ("CLR", "Normal"): dict(rel_cov_diff=(1.15, 8), rel_n_sup=(0.22, 4.6),
                            min_mapq=50, rel_cov_sv=(0.8, 4), std_lt=15,
                            rel_std_lt=0.5, size=(3000, 35e6)),
    ("ONT", "Tumor"): dict(rel_cov_diff=(1.15, 8), rel_n_sup=(0.22, 4.6),
                           min_mapq=50, rel_cov_sv=(0.7, 9), std_lt=25,
                           rel_std_lt=2, size=(3000, 35e6)),
    ("ONT", "Normal"): dict(rel_cov_diff=(1.15, 8), rel_n_sup=(0.22, 4.6),
                            min_mapq=50, rel_cov_sv=(0.8, 4), std_lt=15,
                            rel_std_lt=0.5, size=(3000, 35e6)),
}


def dup_round2_filter(svs: list, spans: np.ndarray, mean_cov: float,
                      data_type: str, state: str = "Normal") -> list:
    """Second-round DUP filter with the tuned per-(dtype, state) bands."""
    bands = DUP_ROUND2_BANDS[(data_type, state)]
    out = []
    for sv in svs:
        feat = dup_round2_features(sv, spans, mean_cov)
        ok = (bands["rel_cov_diff"][0] <= feat["rel_cov_diff"] <= bands["rel_cov_diff"][1]
              and bands["rel_n_sup"][0] <= feat["rel_n_sup"] <= bands["rel_n_sup"][1]
              and sv.mapq > bands["min_mapq"]
              and bands["rel_cov_sv"][0] <= feat["rel_cov_sv"] <= bands["rel_cov_sv"][1]
              and (sv.std_left < bands["std_lt"] or sv.std_right < bands["std_lt"]))
        if "rel_std_lt" in bands:
            ok = ok and feat["rel_std"] < bands["rel_std_lt"]
        if "size" in bands:
            ok = ok and bands["size"][0] <= (sv.end - sv.start) <= bands["size"][1]
        if ok:
            out.append(sv)
    return out
