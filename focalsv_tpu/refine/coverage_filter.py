"""Empirical coverage-band filter (reference:
filter_vcf_by_sig_cov_insdel.py:23-74 with filter_para.csv 'volcano' rows).

Keep calls whose rel_cov = cov/svlen lies within [median*lb, median*rb],
computed separately for INS and DEL with per-dtype bounds.
"""

from __future__ import annotations

import numpy as np

from focalsv_tpu.config import CoverageFilterConfig
from focalsv_tpu.io.vcf import VcfRecord

def coverage_filter(
    records: list[VcfRecord], support_rows: list[dict],
    cfg: CoverageFilterConfig = CoverageFilterConfig(),
) -> tuple[list[VcfRecord], list[VcfRecord]]:
    """Returns (kept, dropped).  support_rows from
    refine.support.signature_support_table (matched by 'idx');
    the per-dtype band bounds come from the preset's CoverageFilterConfig
    (filter_para.csv volcano rows)."""
    rel = {row["idx"]: row["rel_cov"] for row in support_rows}
    keep_idx = set()
    for svtype, bounds in (("INS", (cfg.ins_lower, cfg.ins_upper)),
                           ("DEL", (cfg.del_lower, cfg.del_upper))):
        lb_r, rb_r = bounds
        idxs = [i for i, r in enumerate(records)
                if r.svtype == svtype and i in rel]
        if not idxs:
            continue
        rc = np.array([rel[i] for i in idxs], np.float64)
        med = np.quantile(rc, 0.5)
        lb, rb = med * lb_r, med * rb_r
        for i, v in zip(idxs, rc):
            if lb <= v <= rb:
                keep_idx.add(i)
    kept, dropped = [], []
    for i, r in enumerate(records):
        if i in keep_idx:
            kept.append(r)
        elif i in rel:
            dropped.append(r)
        else:
            kept.append(r)   # records without support rows (below min size)
    return kept, dropped
