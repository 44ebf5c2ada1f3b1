"""Native-backed whole-BAM signature scan (WGS-scale data loader).

One C++ pass (native/bamscan.cpp) decompresses BGZF, walks every record's
CIGAR with cuteSV's exact conventions, and returns columnar numpy arrays;
this wrapper reconstructs per-chromosome ScanResults (CIGAR signatures with
INS sequences, split-pair signatures from the per-record geometry, spanning
intervals for genotyping).  Falls back to the pure-Python scan when the
native library is unavailable.

Known divergence from the Python path: split-pair INS signatures carry no
sequence here (the native pass does not retain whole read sequences), so
clusters supported ONLY by split evidence yield no representative sequence
and are skipped by the draft caller -- same treatment the reference gives a
cluster whose members are all shorter than the mean length.
"""

from __future__ import annotations

import ctypes

import numpy as np

from focalsv_tpu import native
from focalsv_tpu.config import ReadScanConfig
from focalsv_tpu.scan.read_scan import RawSig, ScanResult


def _c(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def scan_bam_native(
    path: str, ref_names: list[str], cfg: ReadScanConfig,
) -> dict[str, ScanResult] | None:
    """Per-chromosome ScanResult from one native pass, or None w/o lib."""
    lib = native.get_scan_lib()
    if lib is None:
        return None
    rc = lib.bamscan_run(path.encode(), cfg.min_mapq, cfg.min_sv_size,
                         cfg.min_read_len, 0, 100)
    if rc != 0:
        return None
    n_rec = lib.bamscan_n_records()
    n_sig = lib.bamscan_n_sigs()
    blob_len = lib.bamscan_seq_blob_len()
    ref = np.zeros(n_rec, np.int32)
    pos = np.zeros(n_rec, np.int64)
    end = np.zeros(n_rec, np.int64)
    mapq = np.zeros(n_rec, np.int32)
    flag = np.zeros(n_rec, np.int32)
    rstart = np.zeros(n_rec, np.int64)
    rend = np.zeros(n_rec, np.int64)
    rlen = np.zeros(n_rec, np.int64)
    name = np.zeros(n_rec, np.uint64)
    lib.bamscan_fetch_records(*[a.ctypes.data_as(ctypes.c_void_p)
                                for a in (ref, pos, end, mapq, flag, rstart,
                                          rend, rlen, name)])
    s_type = np.zeros(max(n_sig, 1), np.uint8)
    s_ref = np.zeros(max(n_sig, 1), np.int32)
    s_pos = np.zeros(max(n_sig, 1), np.int64)
    s_len = np.zeros(max(n_sig, 1), np.int64)
    s_rec = np.zeros(max(n_sig, 1), np.int64)
    s_soff = np.zeros(max(n_sig, 1), np.int64)
    s_slen = np.zeros(max(n_sig, 1), np.int64)
    blob = np.zeros(max(blob_len, 1), np.uint8)
    lib.bamscan_fetch_sigs(*[a.ctypes.data_as(ctypes.c_void_p)
                             for a in (s_type, s_ref, s_pos, s_len, s_rec,
                                       s_soff, s_slen, blob)])
    lib.bamscan_free()
    out: dict[str, ScanResult] = {}
    name_str = np.char.mod("r%x", name)
    primary = (flag & 0x800) == 0
    for rid, chrom in enumerate(ref_names):
        res = ScanResult()
        # spans from primary records
        sel = (ref == rid) & primary
        for i in np.nonzero(sel)[0]:
            res.read_spans.append((str(name_str[i]), int(pos[i]), int(end[i])))
        # CIGAR signatures
        if n_sig:
            ssel = s_ref[:n_sig] == rid
            for k in np.nonzero(ssel)[0]:
                ri = int(s_rec[k])
                seq = None
                if s_type[k] == 1:
                    seq = blob[s_soff[k] : s_soff[k] + s_slen[k]].copy()
                sig = RawSig(int(s_pos[k]), int(s_len[k]),
                             str(name_str[ri]), seq)
                (res.ins_sigs if s_type[k] == 1 else res.del_sigs).append(sig)
        # split-pair signatures from per-record geometry (cuteSV
        # analysis_split_read conventions; rstart/rend are already
        # forward-read-space in the native output)
        csel = np.nonzero((ref == rid) & (mapq >= cfg.min_mapq)
                          & (rlen >= cfg.min_read_len))[0]
        if csel.size:
            order = np.argsort(name[csel], kind="stable")
            grp = csel[order]
            names_g = name[grp]
            bounds = np.nonzero(np.diff(names_g))[0] + 1
            starts = np.concatenate([[0], bounds])
            ends = np.concatenate([bounds, [len(grp)]])
            for a, b in zip(starts, ends):
                if b - a < 2 or b - a > cfg.max_split_parts:
                    continue
                idxs = grp[a:b][np.argsort(rstart[grp[a:b]], kind="stable")]
                for x in range(len(idxs) - 1):
                    i1, i2 = idxs[x], idxs[x + 1]
                    if (flag[i1] ^ flag[i2]) & 0x10:
                        continue
                    dis_ref = int(pos[i2] - end[i1])
                    dis_read = int(rstart[i2] - rend[i1])
                    ins_len = dis_read - dis_ref
                    del_len = dis_ref - dis_read
                    nm = str(name_str[i1])
                    if (dis_ref < cfg.min_sv_size
                            and ins_len >= cfg.min_sv_size
                            and dis_ref <= 100
                            and ins_len <= cfg.max_sv_size):
                        mid = int(pos[i2] + end[i1]) // 2
                        res.ins_sigs.append(RawSig(mid, ins_len, nm))
                    if (del_len >= cfg.min_sv_size and dis_read <= 100
                            and del_len <= cfg.max_sv_size):
                        res.del_sigs.append(
                            RawSig(int(end[i1]), del_len, nm))
        res.del_sigs.sort(key=lambda s: s.pos)
        res.ins_sigs.sort(key=lambda s: s.pos)
        out[chrom] = res
    return out
