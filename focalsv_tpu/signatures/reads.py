"""Read-signature extraction from a raw-read BAM (support evidence).

Port of `Dippav/extract_reads_signature.py`: CIGAR walk (mapq >= 50,
min_svlen 30, no intra-read merging) plus simple split-pair geometry
(Diffolp < 30 gates, min_mapq 0, max_svlen 50k :108-158); output feeds the FP
filter and GT correction as `chrN_reads_sig.txt` rows (type, pos, len).
"""

from __future__ import annotations

import numpy as np

from focalsv_tpu.io import bam as bamio
from focalsv_tpu.signatures.contig import _aln_geometry, sigs_from_cigar
from focalsv_tpu.signatures.sigs import DEL, INS, SRC_SPLIT, Sigs


def extract_read_sigs(
    records,                      # iterable of BamRecord (mapped, one chrom)
    min_cigar_mapq: int = 50,
    min_svlen: int = 30,
    max_svlen: int = 50_000,
) -> Sigs:
    rows: list[dict] = []
    names: list[str] = []
    name_id: dict[str, int] = {}
    geoms: dict[str, list[dict]] = {}
    recs = []
    cids = []
    for rec in records:
        if rec.is_unmapped or rec.is_secondary:
            continue
        cid = name_id.get(rec.name)
        if cid is None:
            cid = name_id[rec.name] = len(names)
            names.append(rec.name)
        recs.append(rec)
        cids.append(cid)
    from focalsv_tpu import native
    nat = native.read_sig_arrays(recs, cids, min_cigar_mapq, min_svlen)
    if nat is not None:
        sig, geom = nat
        cig_sigs = Sigs(**sig, source=np.zeros(len(sig["pos"]), np.int8),
                        names=names)
        # geometry dicts only for split candidates (>= 2 alignments share
        # the name); single-alignment reads can't form a pair below
        cid_arr = np.asarray(cids, np.int64)
        multi = np.bincount(cid_arr, minlength=len(names))[cid_arr] >= 2
        for i, rec in enumerate(recs):
            if multi[i] and rec.cigar.shape[0]:
                geoms.setdefault(rec.name, []).append(dict(
                    ref_start=rec.pos, ref_end=int(geom["ref_end"][i]),
                    read_start=int(geom["read_start"][i]),
                    read_end=int(geom["read_end"][i]),
                    read_len=int(geom["read_len"][i]),
                    clip_head=bool(geom["clip_head"][i]),
                    clip_tail=bool(geom["clip_tail"][i]),
                    strand=int(rec.is_reverse), mapq=rec.mapq,
                    contig=cids[i]))
    else:
        cig_sigs = None
        for rec, cid in zip(recs, cids):
            cig = rec.cigar.astype(np.int64)
            if rec.mapq >= min_cigar_mapq and cig.shape[0]:
                rows.extend(sigs_from_cigar(cig, rec.pos, cid,
                                            int(rec.is_reverse), rec.mapq,
                                            min_svlen))
            if cig.shape[0]:
                geoms.setdefault(rec.name, []).append(
                    _aln_geometry(cig, rec.pos, rec.mapq,
                                  int(rec.is_reverse), cid))
    for name, gs in geoms.items():
        if len(gs) < 2:
            continue
        gs.sort(key=lambda g: g["ref_start"])
        for i in range(len(gs) - 1):
            g1, g2 = gs[i], gs[i + 1]
            if g1["strand"] != g2["strand"]:
                continue
            if not (g1["clip_tail"] and g2["clip_head"]):
                continue
            diffdis = (g2["ref_start"] - g1["ref_end"]) - (
                g2["read_start"] - g1["read_end"])
            diffolp = g1["ref_end"] - g2["ref_start"]
            if abs(diffdis) > max_svlen or diffolp >= 30:
                continue
            base = dict(contig=g1["contig"], strand=g1["strand"],
                        source=SRC_SPLIT, mapq=min(g1["mapq"], g2["mapq"]))
            if diffdis >= 30:
                rows.append(dict(base, svtype=DEL, pos=g1["ref_end"],
                                 svlen=diffdis, rstart=g1["read_end"],
                                 rend=g2["read_start"]))
            elif diffdis <= -30:
                # reference emits the ref-gap midpoint and |Diffdis|
                # (extract_reads_signature.py:155-157)
                svlen = abs(diffdis)
                pos = (g1["ref_end"] + g2["ref_start"]) // 2
                rows.append(dict(base, svtype=INS, pos=pos, svlen=svlen,
                                 rstart=g1["read_end"],
                                 rend=g2["read_start"]))
    split = Sigs.from_rows(rows, names)
    if cig_sigs is not None:
        return Sigs.concat([cig_sigs, split]).sort_by_pos()
    return split.sort_by_pos()
