"""Differential validation of the accuracy oracle (evaluation/compare.py).

Every F1/GT number in PARITY.md flows through match_records; a
self-consistent bug there would silently inflate every accuracy table.
This file pins the matcher against an independent brute-force
implementation of the same truvari protocol (truvari_eval_wgs.sh:20-24:
r=500 p=0.5 P=0.5 S=30 O=0.01): repeatedly scan ALL remaining
(truth, call) pairs for the best-scoring gated pair and assign it --
O(n^3), no sorting, no shared code with the production matcher -- plus
targeted property cases for greedy-steal ordering, threshold boundaries,
and reciprocal-overlap edges.
"""

from __future__ import annotations

import numpy as np
import pytest

from focalsv_tpu.evaluation.compare import BenchResult, match_records
from focalsv_tpu.io.vcf import VcfRecord
from focalsv_tpu.ops import align as alignops
from focalsv_tpu.ops import encode as enc


def _rec(chrom, pos, svtype, svlen, gt="0/1", alt_seq=None):
    if svtype == "INS":
        alt = "N" + (alt_seq if alt_seq is not None else "A" * svlen)
        info = {"SVTYPE": "INS", "SVLEN": svlen}
    else:
        alt = "<DEL>" if alt_seq is None else alt_seq
        info = {"SVTYPE": svtype, "SVLEN": -svlen if svtype == "DEL" else svlen}
    return VcfRecord(chrom=chrom, pos=pos, id=".", ref="N", alt=alt,
                     qual="30", filter="PASS", info=info, gt=gt)


def _svlen_of(r):
    return abs(int(r.info["SVLEN"]))


def _svtype_of(r):
    return r.info["SVTYPE"]


def brute_force_match(calls, truth, refdist=500, pctsize=0.5, pctsim=0.5,
                      sizemin=50, check_seq=True, pctovl=0.01):
    """Obviously-correct same-protocol matcher: no edge list, no sort.

    Gate evaluation and assignment are re-derived from first principles:
    while any gated pair remains, pick the single best (score, then
    lowest truth index, then lowest call index) pair by scanning all
    n*m combinations, assign it, and repeat."""
    calls = [c for c in calls if _svlen_of(c) >= sizemin]
    truth = [t for t in truth if _svlen_of(t) >= sizemin]

    def gate(t, c):
        if c.chrom != t.chrom or _svtype_of(c) != _svtype_of(t):
            return None
        if abs(c.pos - t.pos) > refdist:
            return None
        lt, lc = _svlen_of(t), _svlen_of(c)
        size_sim = min(lt, lc) / max(lt, lc, 1)
        if size_sim < pctsize:
            return None
        if pctovl > 0 and _svtype_of(t) != "INS":
            ovl = min(t.pos + lt, c.pos + lc) - max(t.pos, c.pos)
            if ovl < pctovl * lt or ovl < pctovl * lc:
                return None
        if (check_seq and _svtype_of(t) == "INS"
                and len(t.alt) > 1 and len(c.alt) > 1
                and not t.alt.startswith("<") and not c.alt.startswith("<")):
            sim = alignops.edit_similarity(
                enc.encode(t.alt[1:]), enc.encode(c.alt[1:]))
            if sim < pctsim:
                return None
        return size_sim - abs(c.pos - t.pos) / (10 * refdist)

    t_used = [False] * len(truth)
    c_used = [False] * len(calls)
    tp = gt_correct = 0
    while True:
        best = None
        for ti, t in enumerate(truth):
            if t_used[ti]:
                continue
            for ci, c in enumerate(calls):
                if c_used[ci]:
                    continue
                s = gate(t, c)
                if s is None:
                    continue
                # strictly-better only: equal scores keep the earliest
                # (ti, ci), the production matcher's stable-sort order
                if best is None or s > best[0] + 1e-12:
                    best = (s, ti, ci)
        if best is None:
            break
        _s, ti, ci = best
        t_used[ti] = True
        c_used[ci] = True
        tp += 1
        tgt = truth[ti].gt.replace("|", "/")
        cgt = calls[ci].gt.replace("|", "/")
        if {tgt, tgt[::-1]} & {cgt}:
            gt_correct += 1
    return BenchResult(tp=tp, fp=c_used.count(False), fn=t_used.count(False),
                       gt_correct=gt_correct, gt_total=tp)


def _assert_same(calls, truth, **kw):
    a = match_records(calls, truth, **kw)
    b = brute_force_match(calls, truth, **kw)
    assert (a.tp, a.fp, a.fn, a.gt_correct) == \
        (b.tp, b.fp, b.fn, b.gt_correct), (vars(a), vars(b))
    return a


def test_greedy_steal_resolved_globally():
    """Truth A has two candidates, truth B only one (shared): the global
    best-score-first order must give B its only match and A the spare --
    a truth-order greedy would let A steal B's match."""
    truth = [
        _rec("chr1", 1000, "DEL", 500),      # A spans [1000, 1500)
        _rec("chr1", 1400, "DEL", 500),      # B spans [1400, 1900)
    ]
    calls = [
        _rec("chr1", 1399, "DEL", 500),      # near-perfect for B; ok for A
        _rec("chr1", 850, "DEL", 400),       # weaker; B is out of refdist
    ]
    r = _assert_same(calls, truth)
    assert r.tp == 2 and r.fp == 0 and r.fn == 0
    # sanity: a truth-order greedy (A first takes its best, call 0)
    # would leave B unmatched -- tp 1.  The production matcher must not.


def test_refdist_boundary_inclusive():
    truth = [_rec("chr1", 1000, "INS", 100)]
    at = _rec("chr1", 1500, "INS", 100)     # exactly refdist
    over = _rec("chr1", 1501, "INS", 100)   # one past
    assert _assert_same([at], truth).tp == 1
    assert _assert_same([over], truth).tp == 0


def test_size_sim_boundary_inclusive():
    truth = [_rec("chr1", 1000, "DEL", 100)]
    at = _rec("chr1", 1000, "DEL", 50)      # size_sim exactly 0.5
    under = _rec("chr1", 1000, "DEL", 49)
    assert _assert_same([at], truth).tp == 1
    assert _assert_same([under], truth).tp == 0


def test_reciprocal_overlap_gate():
    """Two 60 bp DELs 400 bp apart pass refdist+size but have ZERO overlap:
    truvari -O 0.01 rejects the pair (the pre-round-5 matcher accepted it)."""
    truth = [_rec("chr1", 1000, "DEL", 60)]
    calls = [_rec("chr1", 1400, "DEL", 60)]
    r = _assert_same(calls, truth)
    assert r.tp == 0 and r.fp == 1 and r.fn == 1
    # INS never takes the overlap gate: same geometry must match
    r2 = _assert_same([_rec("chr1", 1400, "INS", 60)],
                      [_rec("chr1", 1000, "INS", 60)], check_seq=False)
    assert r2.tp == 1
    # one-base overlap at 1% of a 100 bp pair: 1 >= 0.01*100 passes
    r3 = _assert_same([_rec("chr1", 1099, "DEL", 100)],
                      [_rec("chr1", 1000, "DEL", 100)])
    assert r3.tp == 1


def test_gt_concordance_phase_insensitive():
    truth = [_rec("chr1", 1000, "DEL", 100, gt="1|0")]
    r = _assert_same([_rec("chr1", 1000, "DEL", 100, gt="0/1")], truth)
    assert r.gt_correct == 1
    r2 = _assert_same([_rec("chr1", 1000, "DEL", 100, gt="1/1")], truth)
    assert r2.gt_correct == 0


def test_ins_sequence_similarity_gate():
    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 100))
    rnd = "".join("ACGT"[i] for i in rng.integers(0, 4, 100))
    truth = [_rec("chr1", 1000, "INS", 100, alt_seq=seq)]
    same = _rec("chr1", 1010, "INS", 100, alt_seq=seq)
    diff = _rec("chr1", 1010, "INS", 100, alt_seq=rnd)
    assert _assert_same([same], truth).tp == 1
    assert _assert_same([diff], truth).tp == 0


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_vs_brute_force(seed):
    """1k random callset/truth pairs (50 per seed x 20 seeds): TP/FP/FN and
    GT concordance identical to the O(n^3) oracle, including clustered
    near-boundary geometry that stresses assignment order."""
    rng = np.random.default_rng([seed, 77])
    for _case in range(50):
        n_t = int(rng.integers(0, 8))
        n_c = int(rng.integers(0, 8))
        mk = []
        for n in (n_t, n_c):
            rows = []
            for _ in range(n):
                svtype = str(rng.choice(["DEL", "INS"]))
                # clustered positions force contested assignments
                pos = int(rng.choice([1000, 1250, 1499, 1500, 1501, 1750]))
                svlen = int(rng.choice([30, 49, 50, 60, 100, 120, 200, 400]))
                gt = str(rng.choice(["0/1", "1/1", "1|0"]))
                seq = "".join(
                    "ACGT"[i] for i in rng.integers(0, 4, min(svlen, 60)))
                rows.append(_rec("chr1", pos, svtype, svlen, gt=gt,
                                 alt_seq=seq if svtype == "INS" else None))
            mk.append(rows)
        truth, calls = mk
        _assert_same(calls, truth, sizemin=int(rng.choice([30, 50])))
