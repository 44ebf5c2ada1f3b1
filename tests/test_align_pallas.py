"""Pallas kernel parity vs the XLA scan reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
from jax.experimental import pallas as pl

from focalsv_tpu.ops import align as alignops
import focalsv_tpu.ops.align_pallas as ap


@pytest.fixture()
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(ap.pl, "pallas_call", patched)


@pytest.mark.parametrize("seed", range(3))
def test_pallas_matches_scan(interpret_mode, seed):
    rng = np.random.default_rng(seed)
    B, L, W = 4, 120, 64
    t = rng.integers(0, 4, (B, L)).astype(np.uint8)
    q = t.copy()
    for b in range(B):
        i0 = int(rng.integers(10, 60))
        ln = int(rng.integers(1, 20))
        if b % 3 == 0:
            q[b, i0 : i0 + ln] = rng.integers(0, 4)
        elif b % 3 == 1:
            q[b] = np.concatenate([np.delete(q[b], slice(i0, i0 + ln)),
                                   np.full(ln, 5, np.uint8)])
        else:
            # leading query insertion: exercises the j==0 (F-only) column
            q[b] = np.concatenate([rng.integers(0, 4, ln).astype(np.uint8),
                                   q[b][: L - ln]])
    q_len = rng.integers(60, L - 20, B).astype(np.int32)
    t_len = rng.integers(80, L + 1, B).astype(np.int32)
    d_lo = np.clip(((t_len - q_len) // 2 - W // 2),
                   t_len - q_len - W + 1, 0).astype(np.int32)
    s_p, d_p = ap.banded_align_batch_pallas(q, q_len, t, t_len, d_lo, band=W)
    s_r, d_r = alignops.banded_align_batch(q, q_len, t, t_len, d_lo, band=W)
    np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_r))
    np.testing.assert_array_equal(np.asarray(d_p), np.asarray(d_r))


def test_dispatcher_on_cpu_uses_scan():
    # on the CPU test backend the dispatcher must fall back to the scan path
    rng = np.random.default_rng(0)
    B, L, W = 2, 64, 64
    t = rng.integers(0, 4, (B, L)).astype(np.uint8)
    q = t.copy()
    q_len = np.full(B, 60, np.int32)
    t_len = np.full(B, L, np.int32)
    d_lo = np.clip(((t_len - q_len) // 2 - W // 2),
                   t_len - q_len - W + 1, 0).astype(np.int32)
    s, d = alignops.banded_align(q, q_len, t, t_len, d_lo, band=W)
    s_r, d_r = alignops.banded_align_batch(q, q_len, t, t_len, d_lo, band=W)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s_r))
