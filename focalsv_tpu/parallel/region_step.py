"""Device-batched region compute: phasing + consensus voting over region tiles.

The host builds fixed-shape (reads x length) pileup tiles per region
(bucketized); the device then runs, for a whole region batch at once:

- het-site detection: per-column base counts, balanced-fraction test, top-S
  site selection (phasing/phase.py::find_het_sites semantics);
- MEC phasing: the alternating majority optimization (mec_phase) as fixed
  fori_loop iterations of masked matrix reductions;
- haplotype consensus voting: per-column symbol counts weighted by the read
  assignment (assembly/consensus.py::_column_vote per haplotype).

Everything is vmapped over the region axis and shards over the mesh's
'regions' axis (parallel/mesh.py) -- the compiled 'region step' of the
framework.  Insertion consensus (ragged) stays host-side.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NOCOV = 255
DEL_SYM = 254


@functools.partial(jax.jit, static_argnames=("max_sites", "mec_iters"))
def phase_consensus_batch(
    mat: jax.Array,          # (G, R, L) uint8 pileup tiles (255 = no cover)
    read_valid: jax.Array,   # (G, R) bool
    max_sites: int = 64,
    mec_iters: int = 20,
    min_site_depth: int = 4,
    min_allele_frac: float = 0.25,
    max_allele_frac: float = 0.75,
):
    """Returns per region: (site_pos (S,), site_valid, hp (R,) in {0,1,2},
    cons_hp1 (L,), cons_hp2 (L,)) -- the device core of steps 2+3."""

    def one(m, rv):
        R, L = m.shape
        cov = (m <= 4) & rv[:, None]
        counts = jnp.stack([(cov & (m == b)).sum(0) for b in range(4)], 1)
        depth = counts.sum(1)
        order = jnp.argsort(-counts, axis=1)
        a0 = order[:, 0].astype(jnp.uint8)
        a1 = order[:, 1].astype(jnp.uint8)
        top2 = jnp.take_along_axis(counts, order[:, :2], axis=1)
        frac1 = top2[:, 1] / jnp.maximum(depth, 1)
        is_het = ((depth >= min_site_depth)
                  & (frac1 >= min_allele_frac)
                  & (frac1 <= max_allele_frac)
                  & (top2[:, 1] >= 2))
        balance = jnp.where(is_het, frac1, -1.0)
        site_score, site_pos = jax.lax.top_k(balance, max_sites)
        site_valid = site_score > 0
        site_pos = jnp.sort(jnp.where(site_valid, site_pos, L - 1))
        sa0 = a0[site_pos]
        sa1 = a1[site_pos]
        sub = m[:, site_pos]                       # (R, S)
        A = jnp.where(sub == sa0[None, :], 0,
                      jnp.where(sub == sa1[None, :], 1, -1)).astype(jnp.int8)
        A = jnp.where(rv[:, None], A, -1)
        # padded (invalid) site slots land at the array tail after the sort
        # (they were pinned to column L-1); they must not vote in MEC
        n_valid = site_valid.sum()
        pad_sites = jnp.arange(A.shape[1]) >= n_valid
        A = jnp.where(pad_sites[None, :], jnp.int8(-1), A)
        covA = A >= 0
        # chained adjacent-site phase init
        def chain(carry, s):
            h_prev = carry
            both = covA[:, s - 1] & covA[:, s]
            same = (both & (A[:, s - 1] == A[:, s])).sum()
            diff = both.sum() - same
            h = jnp.where(both.sum() == 0, h_prev,
                          jnp.where(same >= diff, h_prev, 1 - h_prev))
            return h, h
        S = A.shape[1]
        _, hs = jax.lax.scan(chain, jnp.int8(0),
                             jnp.arange(1, S, dtype=jnp.int32))
        h = jnp.concatenate([jnp.zeros(1, jnp.int8), hs])

        def it(_, h):
            agree = ((A == h[None, :]) & covA).sum(1)
            disagree = ((A == (1 - h)[None, :]) & covA).sum(1)
            assign = jnp.where(agree >= disagree, 0, 1)
            hap1 = (assign == 0)[:, None] & covA
            hap2 = (assign == 1)[:, None] & covA
            v1 = ((A == 1) & hap1).sum(0) + ((A == 0) & hap2).sum(0)
            v0 = ((A == 0) & hap1).sum(0) + ((A == 1) & hap2).sum(0)
            return jnp.where(v1 > v0, 1, 0).astype(jnp.int8)

        h = jax.lax.fori_loop(0, mec_iters, it, h)
        agree = ((A == h[None, :]) & covA).sum(1)
        disagree = ((A == (1 - h)[None, :]) & covA).sum(1)
        informative = (agree + disagree) > 0
        hp = jnp.where(~rv, 0,
                       jnp.where(~informative, 0,
                                 jnp.where(agree >= disagree, 1, 2)))
        # consensus votes per haplotype (unphased reads vote in both)
        def vote(mask):
            use = (mask | (hp == 0)) & rv
            c = jnp.stack(
                [((m == b) & use[:, None]).sum(0) for b in range(5)]
                + [((m == DEL_SYM) & use[:, None]).sum(0)], 1)
            return jnp.argmax(c, 1).astype(jnp.uint8), c.sum(1)

        s1, cov1 = vote(hp == 1)
        s2, cov2 = vote(hp == 2)
        return (site_pos.astype(jnp.int32), ~pad_sites, hp.astype(jnp.int8),
                s1, cov1.astype(jnp.int32), s2, cov2.astype(jnp.int32))

    return jax.vmap(one)(mat, read_valid)


def sharded_phase_consensus(mat, read_valid, mesh, **kw):
    """phase_consensus_batch sharded over the mesh's regions axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from focalsv_tpu.parallel.mesh import DATA_AXIS
    spec = P(DATA_AXIS)
    fn = jax.shard_map(
        lambda m, rv: phase_consensus_batch(m, rv, **kw),
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec,) * 7,
        check_vma=False,
    )
    return fn(mat, read_valid)
