"""Pallas TPU kernel for the banded affine-gap DP (forward + direction bits).

Same recurrence as ops/align.py::banded_align_batch, laid out for the TPU
vector unit: the *batch* axis rides the 128 lanes and the band rides the
sublanes, so 128 alignment pairs advance in lockstep and every row update is
a full (W, 128) VPU tile op.  Band state (h/e/f) stays VMEM-resident across
all M rows; only direction-bit tiles stream out to HBM.

Per-pair band offsets (d_lo) are normalized on the host: each target is
pre-shifted so the kernel's window slice index is lane-invariant
(t_shift[x, b] = t_b[x + d_lo_b]), turning a per-lane gather into a plain
dynamic slice.  The horizontal (within-row) dependency is resolved by the
same cummax prefix scan as the XLA version, computed with log2(W) roll-max
steps along the sublane axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from focalsv_tpu.ops.align import DIR_E_EXT, DIR_F_EXT, NEG

LANES = 128
_PREFIX_ID = -(1 << 30)  # below any reachable DP value (NEG - gaps)


def _prefix_max_sublane(x: jnp.ndarray, W: int) -> jnp.ndarray:
    """Inclusive prefix max along axis 0 via log2(W) roll-max steps."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < W:
        rolled = pltpu.roll(x, s, 0)
        x = jnp.maximum(x, jnp.where(row >= s, rolled, _PREFIX_ID))
        s *= 2
    return x


def _kernel(qT_ref, tshiftT_ref, qlen_ref, tlen_ref, dlo_ref,
            hend_ref, dirs_ref, h_ref, e_ref, f_ref,
            *, W: int, CHUNK: int,
            match: int, mismatch: int, gap_open: int, gap_extend: int):
    m = pl.program_id(1)
    qn = qlen_ref[:]        # (1, LANES) int32
    tn = tlen_ref[:]
    dlo = dlo_ref[:]
    ks = jax.lax.broadcasted_iota(jnp.int32, (W, LANES), 0)
    # materialized (W, LANES) broadcasts: Mosaic cannot relayout (1, LANES)
    # boolean masks onto full tiles, so keep comparisons in full-tile int32
    zero = jnp.zeros((W, LANES), jnp.int32)
    qn_b = qn + zero
    tn_b = tn + zero
    j_base = dlo + ks       # j at row 0

    @pl.when(m == 0)
    def _init():
        h0 = jnp.where(
            j_base == 0, 0,
            jnp.where(j_base > 0, gap_open + gap_extend * (j_base - 1), NEG),
        ).astype(jnp.int32)
        h0 = jnp.where((j_base >= 0) & (j_base <= tn_b), h0, NEG)
        h_ref[:] = h0
        e_ref[:] = jnp.where(j_base > 0, h0, NEG)
        f_ref[:] = jnp.full((W, LANES), NEG, jnp.int32)
        hend_ref[:] = jnp.where(qn_b == 0, h0,
                                jnp.full((W, LANES), NEG, jnp.int32))

    neg_row = jnp.full((1, LANES), NEG, jnp.int32)

    # aligned chunk loads (sublane-aligned: m*CHUNK and W-8 are multiples
    # of 8); per-row views are static slices of the loaded values, which
    # Mosaic relayouts freely
    qchunk = qT_ref[pl.ds(m * CHUNK, CHUNK), :]            # (CHUNK, LANES)
    T = tshiftT_ref[pl.ds(m * CHUNK + W - 8, W + 16), :]   # (W+16, LANES)

    for r in range(CHUNK):
        i = m * CHUNK + r + 1      # global DP row, 1-based
        h_prev = h_ref[:]
        f_prev = f_ref[:]
        qcb = qchunk[r : r + 1, :].astype(jnp.int32) + zero  # (W, LANES)
        j = i + dlo + ks
        jv = (j >= 1) & (j <= tn_b) & (i <= qn_b)
        # the j==0 column (pure leading query insertions) is F-only
        jz = (j == 0) & (i <= qn_b)
        tc = T[r + 8 : r + 8 + W, :].astype(jnp.int32)     # t[j-1] rows
        sub = jnp.where((qcb == tc) & (qcb < 4), match, mismatch)
        diag = h_prev + sub
        h_up = jnp.concatenate([h_prev[1:, :], neg_row], axis=0)
        f_up = jnp.concatenate([f_prev[1:, :], neg_row], axis=0)
        f_open = h_up + gap_open
        f_ext = f_up + gap_extend
        f = jnp.maximum(f_open, f_ext)
        g = jnp.maximum(diag, f)
        a = _prefix_max_sublane(g - gap_extend * ks, W)
        a_shift = jnp.concatenate([neg_row, a[:-1, :]], axis=0)
        e = a_shift + (gap_open - gap_extend) + gap_extend * ks
        h = jnp.maximum(g, e)
        h = jnp.where(jv, h, jnp.where(jz, f, NEG))
        d = jnp.where(h == diag, 0, jnp.where(h == e, 1, 2))
        d = d | jnp.where(f_ext >= f_open, DIR_F_EXT, 0)
        g_left = jnp.concatenate([neg_row, g[:-1, :]], axis=0)
        e_ext_bit = (a_shift > g_left - gap_extend * (ks - 1)).astype(jnp.int32)
        d = d | (e_ext_bit * DIR_E_EXT)
        dz = 2 | jnp.where(f_ext >= f_open, DIR_F_EXT, 0)
        d = jnp.where(jv, d, jnp.where(jz, dz, 0)).astype(jnp.uint8)
        h_ref[:] = h
        e_ref[:] = jnp.where(jv, e, NEG)
        f_ref[:] = jnp.where(jv | jz, f, NEG)
        dirs_ref[r, :, :] = d
        hend_ref[:] = jnp.where(i == qn_b, h, hend_ref[:])


@functools.partial(
    jax.jit,
    static_argnames=("band", "match", "mismatch", "gap_open", "gap_extend"),
)
def banded_align_batch_pallas(
    q: jax.Array,          # (B, Lq) uint8
    q_len: jax.Array,      # (B,) int32
    t: jax.Array,          # (B, Lt) uint8
    t_len: jax.Array,      # (B,) int32
    d_lo: jax.Array,       # (B,) int32
    band: int = 128,
    match: int = 2,
    mismatch: int = -4,
    gap_open: int = -4,
    gap_extend: int = -2,
):
    """Pallas lane-batched banded DP.

    Returns (scores (B,) int32, dirs (B, M, W) uint8), identical to
    ops.align.banded_align_batch with store_dirs=True.  B is padded to 128
    lanes internally; W (band) must be a multiple of 8.
    """
    B, Lq = q.shape
    Lt = t.shape[1]
    W = band
    M = Lq
    pad_b = (-B) % LANES
    if pad_b:
        zpad = lambda a, v=0: jnp.pad(a, ((0, pad_b),) + ((0, 0),) * (a.ndim - 1),
                                      constant_values=v)
        q = zpad(q, 5)
        t = zpad(t, 5)
        q_len = zpad(q_len)
        t_len = zpad(t_len)
        d_lo = zpad(d_lo)
    Bp = B + pad_b
    # host-side target pre-shift: tshift[b, x] = t[b, x + d_lo_b - W] with
    # PAD(5) outside; kernel reads rows [i-1+W, i-1+2W) => t[j-1] for the band
    xs = jnp.arange(M + 2 * W, dtype=jnp.int32)[None, :] - W + d_lo[:, None]
    valid = (xs >= 0) & (xs < Lt)
    tshift = jnp.where(
        valid,
        jnp.take_along_axis(t, jnp.clip(xs, 0, Lt - 1), axis=1),
        jnp.uint8(5))
    qT = q.T                                  # (Lq, Bp)
    tshiftT = tshift.T                        # (M + 2W, Bp)
    CHUNK = 8
    M_pad = -(-M // CHUNK) * CHUNK
    if M_pad != M:
        qT = jnp.pad(qT, ((0, M_pad - M), (0, 0)), constant_values=5)
        tshiftT = jnp.pad(tshiftT, ((0, M_pad - M), (0, 0)),
                          constant_values=5)
    kernel = functools.partial(
        _kernel, W=W, CHUNK=CHUNK, match=match, mismatch=mismatch,
        gap_open=gap_open, gap_extend=gap_extend)
    n_blocks = Bp // LANES
    hend, dirs = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((W, Bp), jnp.int32),
            jax.ShapeDtypeStruct((M_pad, W, Bp), jnp.uint8),
        ],
        grid=(n_blocks, M_pad // CHUNK),
        in_specs=[
            pl.BlockSpec((M_pad, LANES), lambda b, m: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M_pad + 2 * W, LANES), lambda b, m: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda b, m: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda b, m: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda b, m: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((W, LANES), lambda b, m: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, W, LANES), lambda b, m: (m, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, LANES), jnp.int32),
            pltpu.VMEM((W, LANES), jnp.int32),
            pltpu.VMEM((W, LANES), jnp.int32),
        ],
    )(qT, tshiftT,
      q_len.astype(jnp.int32).reshape(1, Bp),
      t_len.astype(jnp.int32).reshape(1, Bp),
      d_lo.astype(jnp.int32).reshape(1, Bp))
    dirs = dirs[:M]
    # final score: H at (qn, tn) -> band index k_end per pair
    k_end = (t_len - q_len - d_lo).astype(jnp.int32)
    in_band = (k_end >= 0) & (k_end < W)
    scores = jnp.where(
        in_band,
        jnp.take_along_axis(hend, jnp.clip(k_end, 0, W - 1)[None, :],
                            axis=0)[0],
        NEG)
    dirs_out = jnp.transpose(dirs, (2, 0, 1))
    return scores[:B], dirs_out[:B]
