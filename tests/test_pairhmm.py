import numpy as np
import pytest

from focalsv_tpu.ops import encode as enc
from focalsv_tpu.ops.pairhmm import pairhmm_forward_batch, site_allele_loglik

LOG0 = -1e30


def _forward_numpy(read, hap, qual=30, gap_open=1e-3, gap_extend=0.1):
    """Brute-force full-matrix forward with free hap flanks."""
    M, N = len(read), len(hap)
    err = 10 ** (-qual / 10)
    lmat, lmis = np.log1p(-err), np.log(err / 3)
    l_go, l_ge = np.log(gap_open), np.log(gap_extend)
    l_mm, l_gm = np.log(1 - 2 * gap_open), np.log(1 - gap_extend)
    l_ins = np.log(0.25)
    m = np.full((M + 1, N + 1), LOG0)
    x = np.full((M + 1, N + 1), LOG0)
    y = np.full((M + 1, N + 1), LOG0)
    m[0, 0] = 0.0
    y[0, :] = 0.0   # free leading hap deletions

    def lse(*vals):
        vals = np.array(vals)
        mx = vals.max()
        if mx <= LOG0 / 2:
            return LOG0
        return mx + np.log(np.exp(vals - mx).sum())

    for i in range(1, M + 1):
        for j in range(0, N + 1):
            if j >= 1:
                e = lmat if (read[i - 1] == hap[j - 1] and read[i - 1] < 4) else lmis
                m[i, j] = e + lse(m[i - 1, j - 1] + l_mm,
                                  x[i - 1, j - 1] + l_gm,
                                  y[i - 1, j - 1] + l_gm)
                x[i, j] = l_ins + lse(m[i - 1, j] + l_go, x[i - 1, j] + l_ge)
                y[i, j] = lse(m[i, j - 1] + l_go, y[i, j - 1] + l_ge)
    # free tail: sum over all end columns of M and X at row M
    return lse(*[v for j in range(1, N + 1) for v in (m[M, j], x[M, j])])


def _pad(seqs, L):
    out = np.full((len(seqs), L), 5, np.uint8)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out, np.array([len(s) for s in seqs], np.int32)


@pytest.mark.parametrize("seed", range(3))
def test_forward_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    reads, haps, expect = [], [], []
    for _ in range(4):
        n = int(rng.integers(8, 20))
        hap = rng.integers(0, 4, n).astype(np.uint8)
        read = hap[2 : n - 2].copy()
        if rng.random() < 0.5 and len(read) > 4:
            read[len(read) // 2] = (read[len(read) // 2] + 1) % 4
        reads.append(read)
        haps.append(hap)
        expect.append(_forward_numpy(read, hap))
    r, rl = _pad(reads, 32)
    h, hl = _pad(haps, 32)
    got = np.asarray(pairhmm_forward_batch(r, rl, h, hl,
                                           max_read=32, max_hap=32))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_allele_discrimination():
    """A read carrying the alt base must strongly prefer the alt haplotype."""
    rng = np.random.default_rng(7)
    window = rng.integers(0, 4, 21).astype(np.uint8)
    alt_window = window.copy()
    alt_window[10] = (alt_window[10] + 1) % 4
    read_ref = window[3:18].copy()
    read_alt = alt_window[3:18].copy()
    segs, sl = _pad([read_ref, read_alt], 32)
    refw, rwl = _pad([window, window], 32)
    altw, awl = _pad([alt_window, alt_window], 32)
    lr, la = site_allele_loglik(segs, sl, refw, rwl, altw, awl)
    assert lr[0] > la[0] + 2   # ref-carrying read prefers ref
    assert la[1] > lr[1] + 2   # alt-carrying read prefers alt


def test_indel_tolerance():
    """Realignment tolerates a small indel near the site (the reason
    longshot realigns instead of pileup-counting)."""
    rng = np.random.default_rng(9)
    window = rng.integers(0, 4, 24).astype(np.uint8)
    read = np.concatenate([window[2:10], window[11:22]])  # 1bp deletion
    segs, sl = _pad([read], 32)
    hw, hl = _pad([window], 32)
    ll = np.asarray(pairhmm_forward_batch(segs, sl, hw, hl,
                                          max_read=32, max_hap=32))
    # likelihood should be far above the all-mismatch floor
    assert ll[0] > len(read) * np.log(0.25) + 10
