import numpy as np
import pytest

from focalsv_tpu.io import bam as bamio
from focalsv_tpu.ops import align
from focalsv_tpu.ops import encode as enc


def _cigar_consistent(cig, lq, lt):
    q = sum(l for op, l in cig if op in (bamio.CMATCH, bamio.CINS))
    t = sum(l for op, l in cig if op in (bamio.CMATCH, bamio.CDEL))
    return q == lq and t == lt


def _score_of(cig, q, t, match=2, mismatch=-4, go=-4, ge=-2):
    """Recompute an alignment's score from its CIGAR."""
    s = 0
    i = j = 0
    for op, ln in cig:
        if op == bamio.CMATCH:
            for _ in range(ln):
                s += match if (q[i] == t[j] and q[i] < 4) else mismatch
                i += 1
                j += 1
        elif op == bamio.CINS:
            s += go + ge * (ln - 1)
            i += ln
        elif op == bamio.CDEL:
            s += go + ge * (ln - 1)
            j += ln
    return s


def test_numpy_reference_identity():
    q = enc.encode("ACGTACGTAC")
    score, cig, jend = align.align_numpy(q, q)
    assert score == 2 * len(q)
    assert cig == [(bamio.CMATCH, len(q))]


def test_numpy_reference_indel():
    t = enc.encode("ACGTACGTACGTACGT")
    q = np.concatenate([t[:8], t[12:]])  # 4bp deletion in query
    score, cig, _ = align.align_numpy(q, t)
    assert (bamio.CDEL, 4) in cig
    assert _cigar_consistent(cig, len(q), len(t))
    assert _score_of(cig, q, t) == score


@pytest.mark.parametrize("seed", range(6))
def test_banded_matches_numpy_random(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(30, 120))
    t = rng.integers(0, 4, n).astype(np.uint8)
    # query: mutated copy with indels
    q = list(t)
    for _ in range(int(rng.integers(1, 5))):
        p = int(rng.integers(0, len(q)))
        r = rng.random()
        if r < 0.4 and len(q) > 10:
            del q[p : p + int(rng.integers(1, 6))]
        elif r < 0.8:
            q[p:p] = list(rng.integers(0, 4, int(rng.integers(1, 6))))
        else:
            q[p] = (q[p] + 1) % 4
    q = np.array(q, np.uint8)

    ref_score, _, _ = align.align_numpy(q, t)
    band = 64
    score, cig = align.banded_align_pair(q, t, band=band)
    assert score == ref_score, f"banded {score} != full {ref_score}"
    assert _cigar_consistent(cig, len(q), len(t))
    assert _score_of(cig, q, t) == score


def test_banded_batch_mixed_lengths():
    rng = np.random.default_rng(42)
    B = 5
    qs, ts = [], []
    for i in range(B):
        t = rng.integers(0, 4, int(rng.integers(40, 100))).astype(np.uint8)
        q = t.copy()
        if i % 2:
            q = np.delete(q, slice(10, 20))
        qs.append(q)
        ts.append(t)
    q_tile, q_len = enc.pack_ragged(qs, pad_to_multiple=64)
    t_tile, t_len = enc.pack_ragged(ts, pad_to_multiple=64)
    d_lo = ((t_len - q_len) // 2 - 32).astype(np.int32)
    d_lo = np.clip(d_lo, t_len - q_len - 63, 0)
    scores, dirs = align.banded_align_batch(
        q_tile, q_len, t_tile, t_len, d_lo, band=64)
    for i in range(B):
        ref_score, _, _ = align.align_numpy(qs[i], ts[i])
        assert int(scores[i]) == ref_score
        cig = align.traceback(np.asarray(dirs[i]), int(q_len[i]), int(t_len[i]), int(d_lo[i]))
        assert _cigar_consistent(cig, len(qs[i]), len(ts[i]))
        assert _score_of(cig, qs[i], ts[i]) == ref_score


def test_big_deletion_within_band():
    rng = np.random.default_rng(7)
    t = rng.integers(0, 4, 2000).astype(np.uint8)
    q = np.concatenate([t[:900], t[1400:]])  # 500bp DEL
    band = 1024
    score, cig = align.banded_align_pair(q, t, band=band)
    dels = [(op, l) for op, l in cig if op == bamio.CDEL]
    assert (bamio.CDEL, 500) in dels
    assert _cigar_consistent(cig, len(q), len(t))


def test_edit_similarity():
    a = enc.encode("ACGTACGTACGTACGT")
    assert align.edit_similarity(a, a) == 1.0
    b = a.copy()
    b[3] = (b[3] + 1) % 4
    sim = align.edit_similarity(a, b)
    assert abs(sim - (1 - 1 / 16)) < 1e-6
    # unrelated sequences: low similarity
    rng = np.random.default_rng(0)
    x = rng.integers(0, 4, 100).astype(np.uint8)
    y = rng.integers(0, 4, 100).astype(np.uint8)
    assert align.edit_similarity(x, y) < 0.8


@pytest.mark.parametrize("seed", range(4))
def test_native_dp_bit_identical_to_jax_kernel(seed):
    """The C++ host fast path must reproduce the JAX banded kernel exactly:
    same score, same direction bits, same traceback CIGAR."""
    from focalsv_tpu import native

    rng = np.random.default_rng(100 + seed)
    lq = int(rng.integers(20, 200))
    lt = int(rng.integers(20, 200))
    q = rng.integers(0, 4, lq).astype(np.uint8)
    t = rng.integers(0, 4, lt).astype(np.uint8)
    band = 64
    if abs(lt - lq) + 8 > band:
        band = align.band_bucket(abs(lt - lq) + 32, lo=band)
    d_lo = int(np.clip((lt - lq) // 2 - band // 2, lt - lq - band + 1, 0))

    res = native.affine_banded_align(q, t, d_lo, band, 2, -4, -4, -2)
    if res is None:
        pytest.skip("native library unavailable")
    n_score, n_dirs = res

    j_score, j_dirs = align.banded_align_batch(
        align._pad_bucket(q)[None], np.array([lq], np.int32),
        align._pad_bucket(t)[None], np.array([lt], np.int32),
        np.array([d_lo], np.int32), band=band)
    assert n_score == int(j_score[0])
    np.testing.assert_array_equal(n_dirs, np.asarray(j_dirs[0])[:lq])
    assert align.traceback(n_dirs, lq, lt, d_lo) == align.traceback(
        np.asarray(j_dirs[0]), lq, lt, d_lo)
