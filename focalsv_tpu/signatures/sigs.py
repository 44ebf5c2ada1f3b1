"""SV signature records as struct-of-arrays + clustering/pairing ops.

Semantics ported from the reference's contig-signature pipeline
(`Dippav/extract_contig_signature_CCS.py`): greedy seed clustering that keeps
the longest signature per cluster (cluster_del :157-210 / cluster_ins
:212-249), and hp1<->hp2 pairing into genotypes (pair_sig :504-559).  The
implementation is vectorized (pairwise predicate matrices + masked reductions)
instead of the reference's O(n^2) python double loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import numpy as np

DEL, INS = 0, 1
SRC_CIGAR, SRC_SPLIT = 0, 1

_FIELDS = ("svtype", "pos", "svlen", "contig", "rstart", "rend",
           "strand", "source", "mapq")


@dataclass
class Sigs:
    """Struct-of-arrays signature set (one chromosome / one haplotype)."""

    svtype: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int8))
    pos: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    svlen: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    contig: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int32))
    rstart: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    rend: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    strand: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int8))
    source: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int8))
    mapq: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int32))
    names: list[str] = field(default_factory=list)

    def __len__(self) -> int:
        return int(self.pos.shape[0])

    def take(self, idx) -> "Sigs":
        kw = {f: getattr(self, f)[idx] for f in _FIELDS}
        return Sigs(**kw, names=self.names)

    def sort_by_pos(self) -> "Sigs":
        return self.take(np.argsort(self.pos, kind="stable"))

    def of_type(self, svtype: int) -> "Sigs":
        return self.take(self.svtype == svtype)

    @staticmethod
    def concat(parts: list["Sigs"]) -> "Sigs":
        parts = [p for p in parts if len(p)]
        if not parts:
            return Sigs()
        # merge name tables
        names: list[str] = []
        remaps = []
        seen: dict[str, int] = {}
        for p in parts:
            remap = np.zeros(max(len(p.names), 1), np.int32)
            for i, n in enumerate(p.names):
                if n not in seen:
                    seen[n] = len(names)
                    names.append(n)
                remap[i] = seen[n]
            remaps.append(remap)
        kw = {}
        for f in _FIELDS:
            if f == "contig":
                kw[f] = np.concatenate(
                    [remaps[i][p.contig] for i, p in enumerate(parts)])
            else:
                kw[f] = np.concatenate([getattr(p, f) for p in parts])
        return Sigs(**kw, names=names)

    @staticmethod
    def from_rows(rows: list[dict], names: list[str]) -> "Sigs":
        if not rows:
            return Sigs(names=names)
        kw = {}
        dt = dict(svtype=np.int8, pos=np.int64, svlen=np.int64, contig=np.int32,
                  rstart=np.int64, rend=np.int64, strand=np.int8,
                  source=np.int8, mapq=np.int32)
        for f in _FIELDS:
            kw[f] = np.array([r[f] for r in rows], dtype=dt[f])
        return Sigs(**kw, names=names)


def _pair_matrix_del(s: Sigs, t: Sigs, max_shift: int,
                     min_overlap: float, min_size_sim: float) -> np.ndarray:
    """Bool matrix: DEL i in s matches DEL j in t (reference cluster_del
    predicate: shift<=max_shift, reciprocal-over-min overlap>=min_overlap,
    size similarity >= min_size_sim)."""
    p1, l1 = s.pos[:, None].astype(np.float64), s.svlen[:, None].astype(np.float64)
    p2, l2 = t.pos[None, :].astype(np.float64), t.svlen[None, :].astype(np.float64)
    e1, e2 = p1 + l1, p2 + l2
    minlen = np.minimum(l1, l2)
    with np.errstate(divide="ignore", invalid="ignore"):
        olp = (np.minimum(e1, e2) - np.maximum(p1, p2)) / np.where(minlen > 0, minlen, 1)
        size_sim = minlen / np.maximum(np.maximum(l1, l2), 1)
    shift = np.abs(p1 - p2)
    return (shift <= max_shift) & (olp >= min_overlap) & (size_sim >= min_size_sim)


def _pair_matrix_ins(s: Sigs, t: Sigs, max_shift: int,
                     min_size_sim: float) -> np.ndarray:
    l1 = s.svlen[:, None].astype(np.float64)
    l2 = t.svlen[None, :].astype(np.float64)
    size_sim = np.minimum(l1, l2) / np.maximum(np.maximum(l1, l2), 1)
    shift = np.abs(s.pos[:, None] - t.pos[None, :])
    return (shift <= max_shift) & (size_sim >= min_size_sim)


def _greedy_cluster(match: np.ndarray) -> np.ndarray:
    """Reference-style seed clustering: scan i in order, unassigned i seeds a
    cluster and absorbs every later unassigned j with match[i, j].
    Returns cluster id per element."""
    n = match.shape[0]
    cl = np.full(n, -1, np.int64)
    for i in range(n):
        if cl[i] != -1:
            continue
        cl[i] = i
        js = np.nonzero((cl == -1) & match[i])[0]
        cl[js] = i
    return cl


def cluster_keep_longest(s: Sigs, svtype: int, max_shift: int = 100,
                         min_overlap: float = 0.5,
                         min_size_sim: float = 0.5) -> Sigs:
    """Cluster same-type signatures, keep the longest per cluster."""
    if len(s) == 0:
        return s
    if svtype == DEL:
        m = _pair_matrix_del(s, s, max_shift, min_overlap, min_size_sim)
    else:
        m = _pair_matrix_ins(s, s, max_shift, min_size_sim)
    cl = _greedy_cluster(m)
    keep = []
    for c in np.unique(cl):
        idx = np.nonzero(cl == c)[0]
        keep.append(idx[np.argmax(s.svlen[idx])])
    return s.take(np.sort(np.array(keep)))


@dataclass
class PairedSig:
    """A genotyped SV call after hp1<->hp2 pairing."""

    svtype: int
    pos: int
    svlen: int
    gt: str
    tig_region: str
    strand: str
    source: str
    mapq: str
    # provenance for sequence attachment (name/offsets of the chosen allele)
    contig_name: str = ""
    rstart: int = 0
    rend: int = 0
    hp_strand: int = 0


_SRC = {SRC_CIGAR: "cigar", SRC_SPLIT: "split-alignment"}


def _fmt(s: Sigs, i: int) -> tuple[str, str, str, str]:
    region = f"{s.names[s.contig[i]]}:{s.rstart[i]}-{s.rend[i]}"
    return (region, "-" if s.strand[i] else "+", _SRC[int(s.source[i])],
            str(int(s.mapq[i])))


def pair_haplotypes(hp1: Sigs, hp2: Sigs, max_compare_dist: int = 1000,
                    max_shift: int = 200, min_overlap: float = 0.5,
                    min_size_sim: float = 0.5) -> list[PairedSig]:
    """hp1<->hp2 greedy pairing -> genotypes (reference pair_sig :504-559):
    matched pair -> '1/1' keeping the longer allele; unmatched -> '0/1'."""
    hp1 = hp1.sort_by_pos()
    hp2 = hp2.sort_by_pos()
    n1, n2 = len(hp1), len(hp2)
    match1 = np.full(n1, -1, np.int64)
    match2 = np.full(n2, -1, np.int64)
    for i in range(n1):
        for j in range(n2):
            dist = hp2.pos[j] - hp1.pos[i]
            if dist > max_compare_dist:
                break
            if match2[j] != -1 or hp1.svtype[i] != hp2.svtype[j]:
                continue
            if hp1.svtype[i] == DEL:
                ok = _pair_matrix_del(hp1.take([i]), hp2.take([j]),
                                      max_shift, min_overlap, min_size_sim)[0, 0]
            else:
                ok = _pair_matrix_ins(hp1.take([i]), hp2.take([j]),
                                      max_shift, min_size_sim)[0, 0]
            if ok:
                match1[i] = j
                match2[j] = i
                break
    out: list[PairedSig] = []

    def mk(s: Sigs, i: int, gt: str, tig, strand, source, mapq) -> PairedSig:
        return PairedSig(
            svtype=int(s.svtype[i]), pos=int(s.pos[i]), svlen=int(s.svlen[i]),
            gt=gt, tig_region=tig, strand=strand, source=source, mapq=mapq,
            contig_name=s.names[s.contig[i]] if len(s.names) else "",
            rstart=int(s.rstart[i]), rend=int(s.rend[i]),
            hp_strand=int(s.strand[i]))

    for i in range(n1):
        r1, st1, so1, mq1 = _fmt(hp1, i)
        if match1[i] == -1:
            out.append(mk(hp1, i, "0/1", r1, st1, so1, mq1))
        else:
            j = int(match1[i])
            r2, st2, so2, mq2 = _fmt(hp2, j)
            tig = r1 + "," + r2
            strand = st1 + "," + st2
            source = so1 + "," + so2
            mapq = mq1 + "," + mq2
            keep, ki = (hp1, i) if hp1.svlen[i] > hp2.svlen[j] else (hp2, j)
            out.append(mk(keep, ki, "1/1", tig, strand, source, mapq))
    for j in range(n2):
        if match2[j] == -1:
            r2, st2, so2, mq2 = _fmt(hp2, j)
            out.append(mk(hp2, j, "0/1", r2, st2, so2, mq2))
    out.sort(key=lambda p: p.pos)
    return out
