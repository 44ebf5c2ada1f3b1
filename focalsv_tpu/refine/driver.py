"""Step-5 driver: filter + GT correction flow per data type
(reference: 5_post_processing/FocalSV_Filter_GT_Correct.py:164-227)."""

from __future__ import annotations

import numpy as np

from focalsv_tpu.config import DataType, PipelineConfig
from focalsv_tpu.io.vcf import VcfRecord, sort_records
from focalsv_tpu.refine.coverage_filter import coverage_filter
from focalsv_tpu.refine.gt_correct import correct_gt, gt_impute, ont_final_process
from focalsv_tpu.refine.support import signature_support_table
from focalsv_tpu.scan.read_scan import RawSig, ScanResult

_DTYPE_NAME = {DataType.HIFI: "Hifi", DataType.CLR: "CLR", DataType.ONT: "ONT"}


def _sig_arrays(sigs: list[RawSig]):
    pos = np.array([s.pos for s in sigs], np.int64)
    ln = np.array([s.length for s in sigs], np.int64)
    return pos, ln


def _grouped_sigs(sigs: list[RawSig]):
    """Group identical (pos, len) signatures -> (pos, len, n_reads)
    (correct_gt load_sig :67-89 groups sig rows and counts read names)."""
    seen: dict[tuple[int, int], int] = {}
    for s in sigs:
        seen[(s.pos, s.length)] = seen.get((s.pos, s.length), 0) + 1
    if not seen:
        return np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int64)
    keys = np.array(sorted(seen), np.int64).reshape(-1, 2)
    counts = np.array([seen[(int(p), int(l))] for p, l in keys], np.int64)
    return keys[:, 0], keys[:, 1], counts


def refine_records(
    records: list[VcfRecord],
    scan: ScanResult,
    draft_calls: list[VcfRecord],
    cfg: PipelineConfig,
) -> tuple[list[VcfRecord], list[VcfRecord]]:
    """(final_records, dropped) after coverage filter + GT refinement."""
    if not records:
        return [], []
    dname = _DTYPE_NAME[cfg.data_type]
    del_pos, del_len = _sig_arrays(scan.del_sigs)
    ins_pos, ins_len = _sig_arrays(scan.ins_sigs)
    rows = signature_support_table(records, del_pos, del_len, ins_pos, ins_len,
                                   flank=1000, min_size=cfg.read_scan.min_sv_size)
    kept, dropped = coverage_filter(records, rows, cfg.coverage_filter)
    spans = np.array([[s, e] for _, s, e in scan.read_spans], np.int64) \
        if scan.read_spans else np.zeros((0, 2), np.int64)
    if cfg.data_type == DataType.HIFI:
        dp, dl, dn = _grouped_sigs(scan.del_sigs)
        ip, il, inn = _grouped_sigs(scan.ins_sigs)
        final = correct_gt(
            kept,
            sig_pos={"DEL": dp, "INS": ip},
            sig_len={"DEL": dl, "INS": il},
            sig_reads={"DEL": dn, "INS": inn},
            spans=spans, dtype_name=dname, cfg=cfg.gt_correct)
    elif cfg.data_type == DataType.CLR:
        final = gt_impute(kept, draft_calls, cfg.gt_impute)
    else:
        final = gt_impute(kept, draft_calls, cfg.gt_impute)
        final = ont_final_process(final, draft_calls)
    return sort_records(final), dropped
