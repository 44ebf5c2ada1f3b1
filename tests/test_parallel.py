import numpy as np

import jax

from focalsv_tpu.parallel import mesh as pmesh


def _mk_batch(B=8, LQ=256, LT=256, seed=0):
    rng = np.random.default_rng(seed)
    t = rng.integers(0, 4, (B, LT)).astype(np.uint8)
    q = t.copy()
    q_len = np.full(B, LQ - 32, np.int32)
    t_len = np.full(B, LT, np.int32)
    d_lo = ((t_len - q_len) // 2 - 64).astype(np.int32)
    return q, q_len, t, t_len, d_lo


def test_sharded_matches_single_device():
    from focalsv_tpu.ops.align import banded_align_batch
    q, q_len, t, t_len, d_lo = _mk_batch()
    mesh = pmesh.make_mesh()
    assert mesh.size == 8
    s_sharded, dirs_sharded = pmesh.sharded_banded_align(
        q, q_len, t, t_len, d_lo, mesh=mesh, band=128)
    s_local, dirs_local = banded_align_batch(
        q, q_len, t, t_len, d_lo, band=128)
    np.testing.assert_array_equal(np.asarray(s_sharded), np.asarray(s_local))
    np.testing.assert_array_equal(np.asarray(dirs_sharded), np.asarray(dirs_local))


def test_sv_candidate_step_gather():
    q, q_len, t, t_len, d_lo = _mk_batch(B=16)
    mesh = pmesh.make_mesh()
    scores, cand, global_cand = pmesh.sharded_sv_candidate_step(
        q, q_len, t, t_len, d_lo, mesh=mesh)
    assert np.asarray(cand).shape == (16, 3)
    assert np.asarray(global_cand).shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(cand)[:, 0], np.asarray(scores))


def test_pad_batch():
    a = np.zeros((5, 4))
    (padded,), orig = pmesh.pad_batch_to_devices([a], 8)
    assert padded.shape == (8, 4) and orig == 5


def test_graft_entry_points():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    g = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(g)
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.asarray(out[0]).shape == (8,)
    g.dryrun_multichip(8)
