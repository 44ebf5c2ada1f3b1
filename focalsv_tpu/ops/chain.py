"""Anchor chaining DP (the 'chain' stage of seed-chain-extend).

Minimap2-style gap-cost chaining over minimizer anchors (replaces the chain
stage the reference gets from minimap2, and hifiasm's anchor.cpp for
overlaps).  Implemented as a vectorized lookback-window DP: for anchor i the
predecessor search scans only the previous ``max_pred`` anchors in (t,q)
order, each step a numpy vector op; O(n * L) with tiny constants.

Multiple non-overlapping chains are extracted for split alignments (the
geometry source for INV/DUP/TRA calling, SURVEY.md sections 3.4-3.5).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Chain:
    anchors: np.ndarray     # (n, 2) int64 (t_pos, q_pos), increasing
    score: float
    rel_strand: int         # 0 fwd, 1 query-revcomp
    # best score among chains masked away for covering this chain's query
    # span (the minimap2 "secondary score" that drives mapq)
    sub_score: float = 0.0


def _gap_cost(dq: np.ndarray, dt: np.ndarray, avg_seed: int) -> np.ndarray:
    gap = np.abs(dt - dq)
    return 0.01 * avg_seed * gap + 0.5 * np.log2(gap + 1)


def chain_anchors(
    anchors: np.ndarray,        # (n, 3) int64 (t_pos, q_pos, rel_strand)
    k: int,
    max_pred: int = 64,
    max_gap: int = 10_000,
    min_score: float = 40.0,
    min_anchors: int = 3,
    max_chains: int = 8,
    mask_level: float = 0.5,
    q_len: int | None = None,
    split_gap: int = 400,
) -> list[Chain]:
    """Chain anchors of both orientations; returns chains sorted by score.

    Reverse-strand anchors are chained in flipped query coordinates
    (q' = q_len - k - q), standard minimap2 convention.
    """
    chains: list[Chain] = []
    for rel in (0, 1):
        sub = anchors[anchors[:, 2] == rel][:, :2]
        if rel == 1:
            if q_len is None:
                raise ValueError("q_len required when reverse anchors present")
            if sub.shape[0]:
                sub = sub.copy()
                sub[:, 1] = q_len - k - sub[:, 1]
        chains.extend(_chain_one_strand(
            sub, k, max_pred, max_gap, min_score, min_anchors, max_chains, rel))
    # NOTE: rel=1 chain anchors stay in revcomp-query coordinates (q' =
    # q_len - k - q) -- the same space a BAM reverse-strand CIGAR refers to.
    #
    # Split chains at gaps where BOTH query and target jump (divergent /
    # inverted interior -- the z-drop analog).  SV indels keep one delta
    # small, so DEL/INS chains stay intact and come out of the CIGAR.
    split: list[Chain] = []
    for c in chains:
        d = np.diff(c.anchors, axis=0)
        cut = np.nonzero(np.minimum(d[:, 0], d[:, 1]) > split_gap)[0]
        if cut.size == 0:
            split.append(c)
            continue
        bounds = [0, *(cut + 1), c.anchors.shape[0]]
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            if b1 - b0 >= min_anchors:
                piece = c.anchors[b0:b1]
                score = float(min(k * (b1 - b0),
                                  piece[-1, 1] - piece[0, 1] + k))
                if score >= min_score:
                    split.append(Chain(anchors=piece, score=score,
                                       rel_strand=c.rel_strand))
    chains = _join_colinear(split, k, q_len, split_gap=split_gap)
    chains.sort(key=lambda c: -c.score)
    # primary/secondary masking: drop chains whose query span is mostly
    # covered.  Spans must be compared in ORIGINAL query coordinates --
    # rel=1 chains store flipped coordinates, and comparing across strands
    # in mixed spaces masked the inverted interior of INV-crossing reads.
    kept: list[Chain] = []
    for c in chains:
        qs, qe = _q_span(c, k, q_len)
        blocked_by = None
        for kc in kept:
            ks_, ke_ = _q_span(kc, k, q_len)
            olp = min(qe, ke_) - max(qs, ks_)
            if olp > mask_level * (qe - qs):
                blocked_by = kc
                break
        if blocked_by is None:
            kept.append(c)
        else:
            # record the masked competitor: an equally-good alternative
            # placement must push the kept chain's mapq down
            blocked_by.sub_score = max(blocked_by.sub_score, c.score)
        if len(kept) >= max_chains:
            break
    return kept


def _q_span(c: Chain, k: int, q_len: int | None) -> tuple[int, int]:
    """Chain's query span in ORIGINAL query coordinates."""
    lo = int(c.anchors[:, 1].min())
    hi = int(c.anchors[:, 1].max()) + k
    if c.rel_strand == 1 and q_len is not None:
        lo, hi = q_len - hi, q_len - lo
    return lo, hi


def _join_colinear(chains: list[Chain], k: int, q_len: int | None,
                   max_join_gap: int = 100_000,
                   split_gap: int = 400) -> list[Chain]:
    """Re-join same-strand chains that are colinear across a gap.

    The split heuristics (divergent interior, side-path masking) can cut one
    true alignment crossing a repeat tract into clipped pieces; pieces whose
    coordinates continue forward in both query and target are merged back so
    the gap resolves in the banded DP (e.g. a deletion inside a tandem
    repeat).  A join is vetoed when a DIFFERENT chain covers the query gap --
    that is the inversion/duplication signature, which must stay split.

    A join additionally requires the gap to be DP-resolvable: either one of
    the two deltas is small (a true indel, the same invariant the split
    rule cuts on) or the gap is near-diagonal (dt ~ dq: an anchor-sparse
    repeat tract whose interior the banded DP aligns through, possibly
    with a unit-multiple indel).  Without the check, a handful of spurious
    anchors could capture a real flank chain across a doubly-divergent gap
    and the banded DP then glues novel sequence to unrelated reference as
    one giant mismatch-ridden M run (observed on contigs carrying >20 kb
    novel insertions)."""
    out: list[Chain] = []
    for rel in (0, 1):
        cs = sorted([c for c in chains if c.rel_strand == rel],
                    key=lambda c: int(c.anchors[0, 0]))
        merged: list[Chain] = []
        for c in cs:
            if merged:
                p = merged[-1]
                pt = int(p.anchors[-1, 0])
                pq = int(p.anchors[-1, 1])
                a = c.anchors
                keep = (a[:, 0] > pt + k) & (a[:, 1] > pq + k)
                # allow trimming the overlapping head, but not most of it
                if keep.any() and keep.sum() >= max(3, a.shape[0] // 5):
                    first = a[keep][0]
                    dt = int(first[0]) - pt
                    dq = int(first[1]) - pq
                    resolvable = (
                        min(dt, dq) <= split_gap + k            # indel gap
                        or abs(dt - dq) <= max(split_gap,       # diagonal
                                               min(dt, dq) // 4))
                    if (0 < dt <= max_join_gap and 0 < dq <= max_join_gap
                            and resolvable):
                        # veto if the query gap is covered by another chain
                        # OR by the portion of c the trim would discard (a
                        # duplicated block maps the gap's content elsewhere
                        # on the target -- that geometry must survive)
                        gq_lo, gq_hi = pq + k, int(first[1])
                        gap_w = max(gq_hi - gq_lo, 1)
                        covered = False
                        dropped = a[~keep]
                        in_gap = dropped[(dropped[:, 1] + k > gq_lo)
                                         & (dropped[:, 1] < gq_hi)]
                        if in_gap.shape[0]:
                            span_d = int(in_gap[:, 1].max()
                                         - in_gap[:, 1].min()) + k
                            # only SV-scale skipped content signals a
                            # duplication; tiny overlaps are repeat slack
                            if span_d > max(500, 0.5 * gap_w):
                                covered = True
                        if not covered:
                            og_lo, og_hi = gq_lo, gq_hi
                            if c.rel_strand == 1 and q_len is not None:
                                og_lo, og_hi = q_len - gq_hi, q_len - gq_lo
                            for o in chains:
                                if o is p or o is c:
                                    continue
                                lo, hi = _q_span(o, k, q_len)
                                if min(hi, og_hi) - max(lo, og_lo) > 0.5 * gap_w:
                                    covered = True
                                    break
                        if not covered:
                            p.anchors = np.concatenate([p.anchors, a[keep]])
                            p.score += c.score
                            p.sub_score = max(p.sub_score, c.sub_score)
                            continue
            merged.append(Chain(anchors=c.anchors.copy(), score=c.score,
                                rel_strand=rel, sub_score=c.sub_score))
        out.extend(merged)
    return out


def _chain_one_strand(sub, k, max_pred, max_gap, min_score, min_anchors,
                      max_chains, rel) -> list[Chain]:
    n = sub.shape[0]
    if n == 0:
        return []
    order = np.lexsort((sub[:, 1], sub[:, 0]))
    a = sub[order]
    t = a[:, 0].astype(np.float64)
    q = a[:, 1].astype(np.float64)
    from focalsv_tpu import native
    got = native.chain_dp(a[:, 0], a[:, 1], k, max_pred, max_gap)
    if got is not None:
        f, pred = got
    else:
        f = np.full(n, float(k))
        pred = np.full(n, -1, np.int64)
        L = min(max_pred, n)
        for i in range(1, n):
            j0 = max(0, i - L)
            dt = t[i] - t[j0:i]
            dq = q[i] - q[j0:i]
            ok = (dt > 0) & (dq > 0) & (dt <= max_gap) & (dq <= max_gap)
            match = np.minimum(np.minimum(dq, dt), k)
            sc = f[j0:i] + match - _gap_cost(dq, dt, k)
            sc = np.where(ok, sc, -np.inf)
            if sc.size:
                bj = int(np.argmax(sc))
                if sc[bj] > f[i]:
                    f[i] = sc[bj]
                    pred[i] = j0 + bj
    used = np.zeros(n, bool)
    chains = []
    kept_spans: list[tuple[float, float]] = []
    cand = np.flatnonzero(f >= min_score)    # seeds below min_score never win
    for i in cand[np.argsort(-f[cand])]:
        if used[i]:
            continue
        path = []
        jcur = i
        while jcur != -1 and not used[jcur]:
            path.append(jcur)
            used[jcur] = True
            jcur = pred[jcur]
        # truncated backtrack (hit a used anchor): only the suffix beyond the
        # shared prefix is this chain's own score
        score = float(f[i]) - (float(f[jcur]) if jcur != -1 else 0.0)
        path.reverse()
        if len(path) < min_anchors or score < min_score:
            continue
        # drop near-duplicate subpaths: a chain mostly inside an already
        # extracted chain's query span is a redundant side-path, and must not
        # consume the max_chains budget (it would shadow real split chains).
        # Its score still counts as the covering chain's secondary score --
        # an equally-good alternative placement must depress mapq.
        qs, qe = float(q[path[0]]), float(q[path[-1]]) + k
        owner = next((ci for ci, (ks, ke) in enumerate(kept_spans)
                      if min(qe, ke) - max(qs, ks) > 0.5 * (qe - qs)), None)
        if owner is not None:
            chains[owner].sub_score = max(chains[owner].sub_score, score)
            continue
        kept_spans.append((qs, qe))
        chains.append(Chain(anchors=a[path].astype(np.int64),
                            score=score, rel_strand=rel))
        if len(chains) >= max_chains:
            break
    return chains
