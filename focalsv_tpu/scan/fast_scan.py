"""Native-backed whole-BAM signature scan (WGS-scale data loader).

One C++ pass (native/bamscan.cpp) decompresses BGZF, walks every record's
CIGAR with cuteSV's exact conventions, and returns columnar numpy arrays;
NativeScan keeps ONLY those compact arrays (tens of bytes per record, the
memory-disciplined whole-genome representation) and reconstructs one
chromosome's ScanResult on demand -- so a 30x WGS run holds the columnar
arrays plus a single chromosome's Python objects, never the whole genome's
(reference analog: cuteSV spills .sigs files to disk and re-reads per
chromosome, Reads_Based_Scan.py:663-669).  Falls back to the pure-Python
scan when the native library is unavailable.

Known divergence from the Python path: split-pair INS signatures carry no
sequence here (the native pass does not retain whole read sequences), so
clusters supported ONLY by split evidence yield no representative sequence
and are skipped by the draft caller -- same treatment the reference gives a
cluster whose members are all shorter than the mean length.
"""

from __future__ import annotations

import ctypes
from dataclasses import dataclass, field

import numpy as np

from focalsv_tpu import native
from focalsv_tpu.config import ReadScanConfig
from focalsv_tpu.scan.read_scan import RawSig, ScanResult


def _c(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


@dataclass
class NativeScan:
    """Columnar whole-genome scan with lazy per-chromosome ScanResults."""

    ref_names: list[str]
    cfg: ReadScanConfig
    ref: np.ndarray
    pos: np.ndarray
    end: np.ndarray
    mapq: np.ndarray
    flag: np.ndarray
    rstart: np.ndarray
    rend: np.ndarray
    rlen: np.ndarray
    name: np.ndarray
    s_type: np.ndarray
    s_ref: np.ndarray
    s_pos: np.ndarray
    s_len: np.ndarray
    s_rec: np.ndarray
    s_soff: np.ndarray
    s_slen: np.ndarray
    blob: np.ndarray
    n_sig: int
    _cache: dict = field(default_factory=dict)   # one-chromosome LRU

    def get(self, chrom: str) -> ScanResult | None:
        if chrom not in self.ref_names:
            return None
        if chrom in self._cache:
            return self._cache[chrom]
        res = self._build(self.ref_names.index(chrom))
        self._cache = {chrom: res}   # keep exactly one chromosome's objects
        return res

    def __getitem__(self, chrom: str) -> ScanResult:
        res = self.get(chrom)
        if res is None:
            raise KeyError(chrom)
        return res

    def _build(self, rid: int) -> ScanResult:
        cfg = self.cfg
        ref, pos, end = self.ref, self.pos, self.end
        mapq, flag = self.mapq, self.flag
        rstart, rend, rlen, name = self.rstart, self.rend, self.rlen, self.name
        res = ScanResult()
        in_chrom = ref == rid
        name_str = {}

        def nm(i: int) -> str:
            v = int(name[i])
            s = name_str.get(v)
            if s is None:
                s = "r%x" % v
                name_str[v] = s
            return s

        primary = (flag & 0x800) == 0
        for i in np.nonzero(in_chrom & primary)[0]:
            res.read_spans.append((nm(i), int(pos[i]), int(end[i])))
        # CIGAR signatures
        if self.n_sig:
            ssel = self.s_ref[: self.n_sig] == rid
            for k in np.nonzero(ssel)[0]:
                ri = int(self.s_rec[k])
                seq = None
                if self.s_type[k] == 1:
                    seq = self.blob[self.s_soff[k]
                                    : self.s_soff[k] + self.s_slen[k]].copy()
                sig = RawSig(int(self.s_pos[k]), int(self.s_len[k]),
                             nm(ri), seq)
                (res.ins_sigs if self.s_type[k] == 1
                 else res.del_sigs).append(sig)
        # split-pair signatures from per-record geometry (cuteSV
        # analysis_split_read conventions; rstart/rend are already
        # forward-read-space in the native output)
        csel = np.nonzero(in_chrom & (mapq >= cfg.min_mapq)
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
                    if (dis_ref < cfg.min_sv_size
                            and ins_len >= cfg.min_sv_size
                            and dis_ref <= 100
                            and ins_len <= cfg.max_sv_size):
                        mid = int(pos[i2] + end[i1]) // 2
                        res.ins_sigs.append(RawSig(mid, ins_len, nm(i1)))
                    if (del_len >= cfg.min_sv_size and dis_read <= 100
                            and del_len <= cfg.max_sv_size):
                        res.del_sigs.append(
                            RawSig(int(end[i1]), del_len, nm(i1)))
        res.del_sigs.sort(key=lambda s: s.pos)
        res.ins_sigs.sort(key=lambda s: s.pos)
        return res


_scan_lock = __import__("threading").Lock()


def scan_bam_native(
    path: str, ref_names: list[str], cfg: ReadScanConfig,
) -> NativeScan | None:
    """Columnar whole-genome scan from one native pass, or None w/o lib."""
    lib = native.get_scan_lib()
    if lib is None:
        return None
    with _scan_lock:
        return _scan_locked(lib, path, ref_names, cfg)


def _scan_locked(lib, path, ref_names, cfg) -> NativeScan | None:
    # the C++ scanner stages results in process-global state and ctypes
    # RELEASES the GIL during the call: two concurrent scans double-free it
    # (observed as an intermittent abort under the concurrent multi-host
    # test).  The module lock serializes scan+fetch.
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
    return NativeScan(
        ref_names=list(ref_names), cfg=cfg, ref=ref, pos=pos, end=end,
        mapq=mapq, flag=flag, rstart=rstart, rend=rend, rlen=rlen, name=name,
        s_type=s_type, s_ref=s_ref, s_pos=s_pos, s_len=s_len, s_rec=s_rec,
        s_soff=s_soff, s_slen=s_slen, blob=blob, n_sig=n_sig)
