"""Step-0 auto-mode region detection: read signatures + prior -> SV-rich BED.

Port of `focalsv/0_define_region.py` (main flow :520-543), vectorized:

- signatures > min_sig_size bp (extract_gt30 awk '$4 > 30' :69-74)
- fine clustering at dt_fine, clusters with >= min_sig members kept
  (cluster_svs :97-112, reduce_cluster :164-177; DEL cluster span extends by
  the largest member's length)
- re-clustering: interval union with gap tolerance dt (recluster_regions
  :178-202: merge while overlap > -dt), flanks added per call site
- population-prior VCF positions clustered the same way (load_vcf_pg :22,
  cluster_wgs with fl=0)
- merge passes exactly as the reference: sig(DEL)+prior, sig(INS)+prior,
  then DEL+INS, each a recluster at re_dt (merge_dict :236-251; final merge
  with fl=0)

All clustering steps are sorted-array difference ops (np.diff + boolean
splits) instead of python loops.
"""

from __future__ import annotations

import numpy as np

from focalsv_tpu.config import RegionDetectConfig
from focalsv_tpu.io.bed import Region


def cluster_positions(pos: np.ndarray, dt: float, fl: float) -> np.ndarray:
    """cluster_pos :122-139 -- gap-split sorted positions, return (n,2)
    intervals [first - fl, last + fl]."""
    pos = np.sort(np.asarray(pos, np.int64))
    if pos.size == 0:
        return np.zeros((0, 2), np.int64)
    new = np.nonzero(np.diff(pos) >= dt)[0] + 1
    starts = np.concatenate([[0], new])
    ends = np.concatenate([new, [pos.size]])
    return np.stack([pos[starts] - int(fl), pos[ends - 1] + int(fl)], axis=1)


def cluster_signatures(
    pos: np.ndarray, svlen: np.ndarray, dt_fine: float, min_sig: int,
    svtype: str,
) -> np.ndarray:
    """cluster_svs + reduce_cluster: (n,2) spans of kept clusters."""
    order = np.argsort(pos, kind="stable")
    pos = np.asarray(pos, np.int64)[order]
    svlen = np.asarray(svlen, np.int64)[order]
    if pos.size == 0:
        return np.zeros((0, 2), np.int64)
    new = np.nonzero(np.diff(pos) > dt_fine)[0] + 1
    starts = np.concatenate([[0], new])
    ends = np.concatenate([new, [pos.size]])
    sizes = ends - starts
    keep = sizes >= min_sig
    starts, ends = starts[keep], ends[keep]
    span_start = pos[starts]
    if svtype == "INS":
        span_end = pos[ends - 1]
    else:
        # DEL: extend by the largest deletion length in the cluster
        span_end = np.array([
            pos[e - 1] + svlen[s:e].max() for s, e in zip(starts, ends)
        ], np.int64) if starts.size else np.zeros(0, np.int64)
    return np.stack([span_start, span_end], axis=1)


def recluster_regions(regions: np.ndarray, dt: float) -> np.ndarray:
    """recluster_regions :178-202 -- union intervals whose overlap > -dt."""
    if regions.shape[0] == 0:
        return regions
    order = np.lexsort((regions[:, 1], regions[:, 0]))
    r = regions[order]
    out = [list(r[0])]
    for s, e in r[1:]:
        ps, pe = out[-1]
        if min(pe, e) - max(ps, s) > -dt:
            out[-1][0] = min(ps, s)
            out[-1][1] = max(pe, e)
        else:
            out.append([s, e])
    return np.array(out, np.int64)


def _recluster_with_flank(dc: dict[str, np.ndarray], dt: float,
                          fl: float) -> dict[str, np.ndarray]:
    out = {}
    for chrom, regions in dc.items():
        rc = recluster_regions(regions, dt)
        rc = rc + np.array([[-int(fl), int(fl)]])
        out[chrom] = rc
    return out


def merge_region_dicts(
    dca: dict[str, np.ndarray], dcb: dict[str, np.ndarray],
    dt: float, fl: float, chroms: list[str],
) -> dict[str, np.ndarray]:
    """merge_dict :236-251."""
    out = {}
    for chrom in chroms:
        parts = [d.get(chrom, np.zeros((0, 2), np.int64)) for d in (dca, dcb)]
        regions = np.concatenate(parts, axis=0)
        if regions.shape[0] == 0:
            out[chrom] = regions
            continue
        rc = recluster_regions(regions, dt) + np.array([[-int(fl), int(fl)]])
        out[chrom] = rc
    return out


def detect_regions(
    sig_del: dict[str, tuple[np.ndarray, np.ndarray]],   # chrom -> (pos, len)
    sig_ins: dict[str, tuple[np.ndarray, np.ndarray]],
    prior_pos: dict[str, np.ndarray],                    # chrom -> positions
    cfg: RegionDetectConfig,
    chroms: list[str] | None = None,
) -> list[Region]:
    """Full step-0 flow -> sorted Region list (the SV_Regions_*.bed output)."""
    if chroms is None:
        chroms = sorted(set(sig_del) | set(sig_ins) | set(prior_pos))
    # prior: cluster_wgs(re_dt, fl=0)
    dc_pg = {c: cluster_positions(prior_pos.get(c, np.zeros(0)), cfg.re_dt, 0)
             for c in chroms}

    def one_kind(sigs, svtype):
        dc = {}
        for c in chroms:
            pos, ln = sigs.get(c, (np.zeros(0), np.zeros(0)))
            pos, ln = np.asarray(pos), np.asarray(ln)
            big = ln > cfg.min_sig_size
            spans = cluster_signatures(pos[big], ln[big], cfg.dt_fine,
                                       cfg.min_sig, svtype)
            dc[c] = spans
        return _recluster_with_flank(dc, cfg.re_dt, 0)

    dc_del = one_kind(sig_del, "DEL")
    dc_ins = one_kind(sig_ins, "INS")
    dc_del = merge_region_dicts(dc_del, dc_pg, cfg.re_dt, cfg.flank, chroms)
    dc_ins = merge_region_dicts(dc_ins, dc_pg, cfg.re_dt, cfg.flank, chroms)
    dc = merge_region_dicts(dc_ins, dc_del, cfg.re_dt, 0, chroms)
    out: list[Region] = []
    for chrom in chroms:
        regions = dc[chrom]
        order = np.argsort(regions[:, 1]) if regions.shape[0] else []
        for i in order:
            out.append(Region(chrom, int(regions[i, 0]), int(regions[i, 1])))
    return out
