"""Device-batched execution of the per-region hot path.

The production TPU path (ExecutionConfig.mode == "device"): the host builds
one fixed-shape pileup tile per region, tiles are bucketized by padded
(reads, length) shape, and each bucket runs phasing + consensus as ONE
compiled device dispatch (`parallel/region_step.phase_consensus_batch`,
sharded over the mesh's regions axis when more than one device is visible).
The ragged remainder -- insertion consensus, phase-block bookkeeping, contig
stitching, contig->reference alignment and variant extraction -- finishes on
host threads, with the aligner's gap DPs batched cross-thread onto the device
(`parallel/batch_executor.dp_batching`).

Bit-parity contract: for single-phase-block regions this path produces
byte-identical contigs, hp/ps assignments and VCF records to the host
per-region path (pipeline/region.py::process_region); multi-block regions
(device MEC is global, host MEC is per block) transparently fall back to the
host path.  tests/test_device_pipeline.py enforces the contract.

Reference contrast: focalsv/main.py:104-155 runs longshot + hifiasm +
minimap2 *processes* per region; here the same per-region math is a batched
compiled kernel plus a shared device DP service.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from focalsv_tpu.assembly.consensus import (NOCOV, add_clip_insertions,
                                            decide_insertions,
                                            group_exclusive_sets,
                                            pileup_with_dels,
                                            stitch_contig_segments)
from focalsv_tpu.config import PipelineConfig
from focalsv_tpu.io import bam as bamio
from focalsv_tpu.phasing.phase import (PhaseResult, group_reads_by_block,
                                       phase_blocks)
from focalsv_tpu.pipeline.region import (RegionResult, finish_region_result,
                                         process_region)
from focalsv_tpu.utils.logging import get_logger

logger = get_logger("device_exec")


@dataclass
class RegionTile:
    """Host-side staging of one region for the device step."""

    chrom: str
    start: int
    ref_codes: np.ndarray
    reads: list                      # raw fetched reads (FP-filter evidence)
    usable: list                     # phasing-eligible reads
    mat: np.ndarray | None = None    # (R, L) uint8 pileup (254 del, 255 nocov)
    nib: np.ndarray | None = None    # (R, ceil(L/2)) packed 4-bit symbols
    ins_by_read: list = field(default_factory=list)

    @property
    def region_len(self) -> int:
        return len(self.ref_codes)


def build_tile(reads, ref_codes, region_start: int, chrom: str,
               cfg: PipelineConfig) -> RegionTile:
    """Usable-read filter + the one CIGAR walk that feeds both phasing and
    consensus (process_region's pileup passes, done once)."""
    usable = [r for r in reads
              if not r.is_unmapped and not r.is_secondary
              and not r.is_supplementary and r.mapq >= cfg.phasing.min_mapq]
    tile = RegionTile(chrom=chrom, start=region_start, ref_codes=ref_codes,
                      reads=reads, usable=usable)
    if usable:
        from focalsv_tpu.parallel.region_step import pack_nibbles
        mat, inss = pileup_with_dels(usable, list(range(len(usable))),
                                     region_start, len(ref_codes))
        tile.mat = mat
        tile.nib = pack_nibbles(mat)
        tile.ins_by_read = [[] for _ in usable]
        for pos, mi, seq in inss:
            tile.ins_by_read[mi].append((pos, seq))
    return tile


def _pow2(n: int, lo: int) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _len_bucket(n: int, lo: int = 4096) -> int:
    # x2 steps: padding waste (host->device bytes over a possibly-remote
    # link) costs more than the extra compile shapes, which persist in the
    # XLA compilation cache
    b = lo
    while b < n:
        b *= 2
    return b


def _bucket_key(tile: RegionTile, cfg: PipelineConfig) -> tuple[int, int] | None:
    """(R_pad, L_pad) bucket, or None when the tile must take the host path."""
    ex = cfg.execution
    R = len(tile.usable)
    L = tile.region_len
    if R == 0 or R > ex.max_tile_reads or L > ex.max_tile_len:
        return None
    if cfg.phasing.use_pairhmm:
        # pair-HMM realignment of the allele matrix is a host-path feature
        return None
    return _pow2(R, 8), _len_bucket(L)


def _batch_size(key: tuple[int, int], cfg: PipelineConfig,
                n_devices: int) -> int:
    ex = cfg.execution
    g = max(1, min(ex.max_regions_per_batch,
                   int(ex.batch_bytes // (key[0] * key[1]))))
    if n_devices > 1:
        # shard_map needs the batch divisible by the mesh
        g = max(n_devices, (g // n_devices) * n_devices)
    return g


_cache_ready = False
_cache_lock = __import__("threading").Lock()


def _ensure_compile_cache():
    """Persistent XLA compilation cache: bucketized tile shapes recompile
    only once per machine, not once per process.  Lock-guarded: concurrent
    jax.config.update from two threads is a fatal error."""
    global _cache_ready
    with _cache_lock:
        if _cache_ready:
            return
        try:
            import os

            import jax
            path = os.environ.get("FOCALSV_JAX_CACHE",
                                  os.path.expanduser("~/.cache/focalsv_jax"))
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
        except Exception:
            logger.exception("could not enable the persistent compile cache")
        _cache_ready = True


def _dispatch_one(tiles: list[RegionTile], chunk: list[int], Rp: int, Lp: int,
                  G: int, cfg: PipelineConfig, mesh):
    """Pack one chunk of tiles and launch the device step (async); the
    result's device->host copy is started immediately so transfers overlap
    compute and each other."""
    from focalsv_tpu.parallel.region_step import (
        phase_consensus_batch_packed, phase_consensus_kwargs,
        sharded_phase_consensus_packed)
    kw = phase_consensus_kwargs(cfg.phasing)
    # 0xFF = two NOCOV nibbles: padding rows/columns are uncovered
    packed = np.full((G, Rp, Lp // 2), 0xFF, np.uint8)
    rv = np.zeros((G, Rp), bool)
    for g, ti in enumerate(chunk):
        t = tiles[ti]
        R = t.nib.shape[0]
        packed[g, :R, : t.nib.shape[1]] = t.nib
        rv[g, :R] = True
    if mesh is not None and mesh.size > 1:
        res = sharded_phase_consensus_packed(packed, rv, mesh, L=Lp, **kw)
    else:
        res = phase_consensus_batch_packed(packed, rv, L=Lp, **kw)
    try:
        res.copy_to_host_async()
    except Exception:
        pass     # not all backends expose the async copy
    return res


def dispatch_device_chunks(tiles: list[RegionTile], cfg: PipelineConfig,
                           mesh=None) -> list[tuple[list[int], int, int, object]]:
    """Dispatch every bucketizable tile through the device region step.

    Returns [(tile_indices, R_pad, L_pad, device_result)] with all chunks in
    flight.  Tiles that exceed the tile bounds are absent (host fallback).
    """
    _ensure_compile_cache()
    n_devices = mesh.size if mesh is not None else 1
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, t in enumerate(tiles):
        key = _bucket_key(t, cfg)
        if key is not None:
            buckets.setdefault(key, []).append(i)
    pending: list[tuple[list[int], int, int, object]] = []
    for (Rp, Lp), idxs in sorted(buckets.items()):
        G_full = _batch_size((Rp, Lp), cfg, n_devices)
        # small-tail batch size: a nearly-empty padded batch wastes the
        # whole transfer; 8 keeps the extra compile shapes to one per bucket
        G_small = max(min(G_full, 8), n_devices)
        c0 = 0
        while c0 < len(idxs):
            remaining = len(idxs) - c0
            G = G_full if remaining > G_small else G_small
            chunk = idxs[c0 : c0 + G]
            c0 += G
            res = _dispatch_one(tiles, chunk, Rp, Lp, G, cfg, mesh)
            pending.append((chunk, Rp, Lp, res))
    return pending


def streamed_map(pool, tile_jobs: list, cfg: PipelineConfig, finish,
                 mesh=None) -> list:
    """Fully-pipelined region execution: tile builds (pool), device chunk
    dispatches (as soon as a bucket fills), result decodes and per-region
    finishes (pool) all overlap.

    ``tile_jobs[i]()`` -> RegionTile | None; ``finish(i, tile, dev)`` -> the
    per-region result (dev is None for host-fallback tiles).  Returns the
    per-index results; indices whose tile job returned None yield None.
    """
    import concurrent.futures as cf

    _ensure_compile_cache()
    n_devices = mesh.size if mesh is not None else 1
    n = len(tile_jobs)
    tiles: list[RegionTile | None] = [None] * n
    fut_to_idx = {pool.submit(j): i for i, j in enumerate(tile_jobs)}
    buckets: dict[tuple[int, int], list[int]] = {}
    pending: list[tuple[list[int], int, int, object]] = []
    fin_futs: dict[int, object] = {}

    def flush(key, force: bool):
        Rp, Lp = key
        G_full = _batch_size(key, cfg, n_devices)
        G_small = max(min(G_full, 8), n_devices)
        idxs = buckets.get(key, [])
        while idxs and (len(idxs) >= G_full or force):
            # padded batch size: one of the two compile shapes per bucket
            G = G_full if len(idxs) > G_small else G_small
            chunk, idxs = idxs[:G], idxs[G:]
            res = _dispatch_one(tiles, chunk, Rp, Lp, G, cfg, mesh)
            pending.append((chunk, Rp, Lp, res))
        buckets[key] = idxs

    for fut in cf.as_completed(fut_to_idx):
        i = fut_to_idx[fut]
        tile = fut.result()
        tiles[i] = tile
        if tile is None:
            continue
        key = _bucket_key(tile, cfg)
        if key is None:
            # host-fallback tile: start its finish immediately
            fin_futs[i] = pool.submit(finish, i, tile, None)
            continue
        buckets.setdefault(key, []).append(i)
        flush(key, force=False)
    for key in sorted(buckets):
        flush(key, force=True)
    # decode chunks in dispatch order (d2h copies are already in flight)
    for chunk, Rp, Lp, res in pending:
        outs = decode_chunk(tiles, chunk, Rp, Lp, res, cfg)
        for i in chunk:
            fin_futs[i] = pool.submit(finish, i, tiles[i], outs.get(i))
    return [fin_futs[i].result() if i in fin_futs else None
            for i in range(n)]


def decode_chunk(tiles: list[RegionTile], chunk: list[int], Rp: int, Lp: int,
                 res, cfg: PipelineConfig) -> dict[int, tuple]:
    """Materialize one chunk's flat result buffers (blocks only for this
    chunk) into per-tile unpacked outputs."""
    from focalsv_tpu.parallel.region_step import unflatten_result
    S = cfg.phasing.max_sites
    bufs = np.asarray(res)
    out: dict[int, tuple] = {}
    for g, ti in enumerate(chunk):
        t = tiles[ti]
        R, L = t.mat.shape
        site_pos, n_sites, A, hp, sym, cov = unflatten_result(
            bufs[g], Rp, Lp, S)
        out[ti] = (site_pos[:n_sites], n_sites, A[:R, :n_sites], hp[:R],
                   sym[:, :L], cov[:, :L])
    return out


def run_device_step(tiles: list[RegionTile], cfg: PipelineConfig,
                    mesh=None) -> dict[int, tuple]:
    """Blocking convenience wrapper: dispatch + decode every chunk."""
    out: dict[int, tuple] = {}
    for chunk, Rp, Lp, res in dispatch_device_chunks(tiles, cfg, mesh=mesh):
        out.update(decode_chunk(tiles, chunk, Rp, Lp, res, cfg))
    return out


def finish_tile(tile: RegionTile, dev, cfg: PipelineConfig,
                apply_fp_filter: bool = False) -> RegionResult | None:
    """Host completion of one region from the device step's outputs.

    Returns None when the region needs the host fallback (multi-block
    phasing), in which case the caller reruns process_region.
    """
    R = len(tile.usable)
    L = tile.region_len
    chrom, start = tile.chrom, tile.start
    res = RegionResult(chrom=chrom, start=start, end=start + L)
    res.n_reads = R
    site_pos, S, A, hp, sym, cov = dev
    if S == 0:
        pr = PhaseResult(np.zeros(R, np.int8), np.full(R, -1, np.int64), 0, 0,
                         np.zeros(0, np.int64), np.zeros(0, np.int64))
    else:
        blocks = phase_blocks(A)
        if int(blocks.max()) > 0:
            return None   # multi-block region: host per-block MEC path
        ps_id = start + int(site_pos[0]) + 1
        ps = np.where(hp > 0, ps_id, -1).astype(np.int64)
        # site allele codes, re-derived from the tile columns with the host
        # find_het_sites math (top-2 allele counts, ties -> lower column)
        from focalsv_tpu.phasing.phase import ALLELE_CODES
        sub = tile.mat[:, site_pos]
        counts = np.stack([(sub == c).sum(0) for c in ALLELE_CODES], axis=1)
        a0 = counts.argmax(axis=1)
        masked = counts.copy()
        np.put_along_axis(masked, a0[:, None], -1, axis=1)
        a1 = masked.argmax(axis=1)
        pr = PhaseResult(hp.astype(np.int8), ps, S, 1,
                         site_pos.astype(np.int64) + start, blocks,
                         site_allele0=ALLELE_CODES[a0],
                         site_allele1=ALLELE_CODES[a1], allele_mat=A)
    res.n_phased = int((pr.hp > 0).sum())
    res.n_blocks = pr.n_blocks
    groups = group_reads_by_block(tile.usable, pr)
    hp1: dict[str, np.ndarray] = {}
    hp2: dict[str, np.ndarray] = {}
    name_prefix = f"{chrom}_S{start}"
    valid = tile.mat != NOCOV
    for (psid, k), idxs in sorted(groups.items()):
        tgt = hp1 if k in (0, 1) else hp2
        segs: list = []
        if cfg.assembly.method == "olc":
            from focalsv_tpu.assembly.olc import assemble_olc
            contig = assemble_olc([tile.usable[i].seq for i in idxs],
                                  cfg.assembly)
        elif len(idxs) < cfg.assembly.min_reads:
            contig = None
        else:
            row = 0 if k in (0, 1) else 1
            inss = [(pos, mi, seq) for mi, ri in enumerate(idxs)
                    for (pos, seq) in tile.ins_by_read[ri]]
            ins_at = decide_insertions(valid[idxs], inss, L)
            own, _rival = group_exclusive_sets(groups, psid, k)
            ins_at = add_clip_insertions(ins_at, tile.usable, idxs, start, L,
                                         own=own, valid=valid[idxs],
                                         cfg=cfg.assembly)
            contig, segs = stitch_contig_segments(sym[row], cov[row], ins_at)
        if contig is None:
            continue
        name = f"{name_prefix}_PS{psid}_hp{max(k, 1)}"
        tgt[name] = contig
        if segs:
            res.contig_alns[name] = segs
        if k == 0:
            name2 = f"{name_prefix}_PS{psid}_hp2"
            hp2[name2] = contig
            if segs:
                res.contig_alns[name2] = segs
    res.n_contigs = len(hp1) + len(hp2)
    res.usable_reads = tile.usable
    res.phase_hp, res.phase_ps = pr.hp, pr.ps
    from focalsv_tpu.phasing.phase import phased_snv_records
    res.snv_records = phased_snv_records(pr, tile.ref_codes, start, chrom)
    res.contigs_hp1, res.contigs_hp2 = hp1, hp2
    finish_region_result(res, tile.reads, tile.ref_codes, start, chrom, cfg,
                         apply_fp_filter)
    return res


def process_region_device(tile: RegionTile, dev, cfg: PipelineConfig,
                          apply_fp_filter: bool = False) -> RegionResult:
    """finish_tile with the host fallback folded in (dev may be None)."""
    if dev is not None:
        res = finish_tile(tile, dev, cfg, apply_fp_filter)
        if res is not None:
            return res
    return process_region(tile.reads, tile.ref_codes, tile.start, tile.chrom,
                          cfg, apply_fp_filter=apply_fp_filter)
