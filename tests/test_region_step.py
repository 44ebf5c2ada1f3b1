import numpy as np
import pytest

from focalsv_tpu.config import DataType, preset
from focalsv_tpu.parallel import mesh as pmesh
from focalsv_tpu.parallel.region_step import (
    phase_consensus_batch, sharded_phase_consensus,
)
from focalsv_tpu.phasing.phase import pileup_matrix
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
    out = phase_consensus_batch(mat, valid, max_sites=32, mec_iters=15)
    site_pos, site_valid, hp, s1, cov1, s2, cov2 = [np.asarray(x) for x in out]
    for g, rg in enumerate(regions):
        truth = np.array(rg.read_hap)
        h = hp[g, : len(rg.reads)]
        phased = h > 0
        assert phased.mean() > 0.6, f"region {g}: only {phased.mean()} phased"
        agree = (h[phased] - 1 == truth[phased]).mean()
        assert max(agree, 1 - agree) > 0.9, f"region {g} agreement {agree}"
        # consensus columns: where covered, hap consensus must match one
        # haplotype's base (SNP positions differ between haps)
        ref = rg.ref
        covered = cov1[g] > 3
        sym = s1[g]
        base_cols = covered & (sym < 4)
        # majority of covered columns match the reference (no SVs simulated)
        match_frac = (sym[base_cols] == ref[np.nonzero(base_cols)[0]]).mean()
        assert match_frac > 0.95


def test_sharded_region_step():
    L = 6_000
    regions = [sim.simulate_region(seed=600 + i, ref_len=L, coverage=12,
                                   n_snps=8, read_len_mean=3_000, svs=[])
               for i in range(8)]
    mat, valid = _tiles(regions, L)
    mesh = pmesh.make_mesh()
    out_sharded = sharded_phase_consensus(mat, valid, mesh, max_sites=16,
                                          mec_iters=10)
    out_local = phase_consensus_batch(mat, valid, max_sites=16, mec_iters=10)
    for a, b in zip(out_sharded, out_local):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
