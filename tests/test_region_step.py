import numpy as np

from focalsv_tpu.config import preset
from focalsv_tpu.parallel import mesh as pmesh
from focalsv_tpu.parallel.region_step import (
    phase_consensus_batch, phase_consensus_kwargs, sharded_phase_consensus,
)
from focalsv_tpu.assembly.consensus import pileup_with_dels
from focalsv_tpu.testing import simulate as sim


def _tiles(regions, L):
    G = len(regions)
    R = max(len(rg.reads) for rg in regions)
    mat = np.full((G, R, L), 255, np.uint8)
    valid = np.zeros((G, R), bool)
    for g, rg in enumerate(regions):
        m, _ = pileup_with_dels(rg.reads, list(range(len(rg.reads))), 0, L)
        mat[g, : m.shape[0], : m.shape[1]] = m[:, :L]
        valid[g, : len(rg.reads)] = True
    return mat, valid


def test_phase_consensus_batch_recovers_haplotypes():
    L = 12_000
    regions = [sim.simulate_region(seed=500 + i, ref_len=L, coverage=20,
                                   n_snps=15, read_len_mean=5_000,
                                   svs=[]) for i in range(4)]
    mat, valid = _tiles(regions, L)
    kw = phase_consensus_kwargs(preset("HIFI").phasing)
    kw.update(max_sites=32, mec_iters=15)
    out = phase_consensus_batch(mat, valid, **kw)
    site_pos, n_sites, A, hp, sym, cov = [np.asarray(x) for x in out]
    for g, rg in enumerate(regions):
        truth = np.array(rg.read_hap)
        h = hp[g, : len(rg.reads)]
        phased = h > 0
        assert phased.mean() > 0.6, f"region {g}: only {phased.mean()} phased"
        agree = (h[phased] - 1 == truth[phased]).mean()
        assert max(agree, 1 - agree) > 0.9, f"region {g} agreement {agree}"
        assert int(n_sites[g]) > 0
        # valid sites are ascending genome positions
        sp = site_pos[g, : int(n_sites[g])]
        assert (np.diff(sp) > 0).all()
        # consensus columns: where covered, hap consensus must match the
        # reference in most columns (no SVs simulated)
        ref = rg.ref
        covered = cov[g, 0]        # bool coverage mask
        s1 = sym[g, 0]
        base_cols = covered & (s1 < 4)
        match_frac = (s1[base_cols] == ref[np.nonzero(base_cols)[0]]).mean()
        assert match_frac > 0.95


def test_device_phasing_matches_host_reference():
    """The device step's het sites, allele matrix, hp and consensus must
    bit-match the host implementations (the device_exec parity contract,
    checked here at the kernel level)."""
    from focalsv_tpu.phasing import phase as ph

    cfg = preset("HIFI").phasing
    L = 8_000
    regions = [sim.simulate_region(seed=900 + i, ref_len=L, coverage=16,
                                   n_snps=10, read_len_mean=4_000)
               for i in range(3)]
    mat, valid = _tiles(regions, L)
    out = phase_consensus_batch(mat, valid, **phase_consensus_kwargs(cfg))
    site_pos, n_sites, A, hp, sym, cov = [np.asarray(x) for x in out]
    for g, rg in enumerate(regions):
        pr = ph.phase_region(rg.reads, rg.ref, 0, cfg)
        S = int(n_sites[g])
        np.testing.assert_array_equal(
            site_pos[g, :S], pr.site_positions,
            err_msg=f"region {g} het sites")
        if pr.n_blocks <= 1:
            np.testing.assert_array_equal(hp[g, : len(rg.reads)], pr.hp,
                                          err_msg=f"region {g} hp")


def test_sharded_region_step():
    L = 6_000
    regions = [sim.simulate_region(seed=600 + i, ref_len=L, coverage=12,
                                   n_snps=8, read_len_mean=3_000, svs=[])
               for i in range(8)]
    mat, valid = _tiles(regions, L)
    mesh = pmesh.make_mesh()
    kw = phase_consensus_kwargs(preset("HIFI").phasing)
    kw.update(max_sites=16, mec_iters=10)
    out_sharded = sharded_phase_consensus(mat, valid, mesh, **kw)
    out_local = phase_consensus_batch(mat, valid, **kw)
    for a, b in zip(out_sharded, out_local):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
