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

Bit-parity contract: this path produces byte-identical contigs, hp/ps
assignments and VCF records to the host per-region path
(pipeline/region.py::process_region).  The device MEC is per phase block
(segment-id prefix sums in region_step._phase_core), so multi-block regions
phase on device too; their consensus votes run per group on host
(assemble_haplotypes).  tests/test_device_pipeline.py enforces the contract.

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
    """Host-side staging of one region for the device step.

    Two wire encodings, chosen per tile by payload size:

    - "delta" (the default for accurate reads): each read is its covered
      span [start, end) plus sparse deviations from the region reference
      (substitutions + deletion runs); the device reconstructs the exact
      column counts (region_step.phase_consensus_delta).  h2d is
      O(reads + deviations).
    - "dense" (high-noise fallback): compact per-read rows packed as 4-bit
      nibbles at the row-width bucket; the device expands them with one
      BLOCK gather (region_step.phase_consensus_rows_packed).  Used when
      the deviation payload would exceed the packed-row payload (CLR/ONT
      error rates)."""

    chrom: str
    start: int
    ref_codes: np.ndarray
    reads: list                      # raw fetched reads (FP-filter evidence)
    usable: list                     # phasing-eligible reads
    encoding: str = "dense"          # "delta" | "dense"
    nib: np.ndarray | None = None    # (R, W_pad/2) packed compact rows
    row_starts: np.ndarray | None = None   # (R,) int32 region column of col 0
    row_lens: np.ndarray | None = None     # (R,) int32 covered span length
    q_starts: np.ndarray | None = None     # (R,) int32 start // BLOCK
    W_pad: int = 0
    subs: tuple | None = None        # (pos, read, sym) int32/int32/uint8
    dels: tuple | None = None        # (read, a, b) int32
    ins_by_read: list = field(default_factory=list)

    @property
    def region_len(self) -> int:
        return len(self.ref_codes)


def _delta_from_rows(rows, starts, ref_codes) -> tuple[tuple, tuple]:
    """Python fallback: (subs, dels) deviation arrays from compact rows
    (bit-parity with native tile_delta_fill)."""
    sp, sr, ss = [], [], []
    dr, da, db = [], [], []
    for i, (row, s0) in enumerate(zip(rows, starts)):
        s0 = int(s0)
        refw = ref_codes[s0 : s0 + len(row)]
        isdel = row == 254            # consensus.DEL_SYM
        sub_at = np.nonzero((row != refw) & ~isdel)[0]
        if sub_at.size:
            sp.append((s0 + sub_at).astype(np.int32))
            sr.append(np.full(sub_at.size, i, np.int32))
            ss.append(row[sub_at])
        d = np.diff(np.concatenate(
            [[0], isdel.astype(np.int8), [0]]))
        for a, b in zip(np.nonzero(d == 1)[0], np.nonzero(d == -1)[0]):
            dr.append(i)
            da.append(s0 + int(a))
            db.append(s0 + int(b))
    cat = lambda xs, dt: (np.concatenate(xs) if xs       # noqa: E731
                          else np.zeros(0, dt))
    subs = (cat(sp, np.int32), cat(sr, np.int32), cat(ss, np.uint8))
    dels = (np.array(dr, np.int32), np.array(da, np.int32),
            np.array(db, np.int32))
    return subs, dels


def build_tile(reads, ref_codes, region_start: int, chrom: str,
               cfg: PipelineConfig) -> RegionTile:
    """Usable-read filter + the one CIGAR walk that feeds both phasing and
    consensus (process_region's pileup passes, done once)."""
    usable = [r for r in reads
              if not r.is_unmapped and not r.is_secondary
              and not r.is_supplementary and r.mapq >= cfg.phasing.min_mapq]
    tile = RegionTile(chrom=chrom, start=region_start, ref_codes=ref_codes,
                      reads=reads, usable=usable)
    if not usable:
        return tile
    from focalsv_tpu import native
    from focalsv_tpu.parallel.wire import BLOCK, pack_row_tile
    R = len(usable)
    L = len(ref_codes)

    # encoding choice by wire size: deviations (9B/sub + 12B/del run)
    # vs packed rows (W_pad/2 per read).  Accurate reads compress ~10-40x
    # as deltas; past ~5% deviation density the dense rows win.  The
    # threshold needs the spans, so the native builder evaluates it after
    # its count pass and skips the deviation fill for dense tiles.
    def dense_cap(r0, r1):
        offs = r0 % BLOCK
        return R * (_wbucket(int(((r1 - r0) + offs).max())) // 2)

    out = native.build_tile_delta(usable, ref_codes, region_start, L,
                                  dense_if_over=dense_cap)
    dense_spans = None
    if out is not None and out[0] == "delta":
        _, r0, r1, subs, dels, inss = out
        tile.row_starts = r0
        tile.row_lens = r1 - r0
        tile.subs, tile.dels = subs, dels
        tile.encoding = "delta"
    elif out is not None:               # native, high-noise -> dense rows
        tile.encoding = "dense"
        dense_spans = out[1:]           # (r0, r1, n_ins, ins_seq_total)
        inss = None
    else:   # no compiler: Python walk
        from focalsv_tpu.assembly.consensus import compact_pileup_rows
        rows, starts, inss = compact_pileup_rows(
            usable, list(range(R)), region_start, L)
        tile.row_starts = starts.astype(np.int32)
        tile.row_lens = np.array([len(r) for r in rows], np.int32)
        tile.subs, tile.dels = _delta_from_rows(rows, tile.row_starts,
                                                ref_codes)
        offs = (tile.row_starts % BLOCK).astype(np.int32)
        W_pad = _wbucket(int((tile.row_lens + offs).max()) if R else 1)
        delta_bytes = 9 * tile.subs[0].size + 12 * tile.dels[0].size + 8 * R
        if delta_bytes <= R * (W_pad // 2):
            tile.encoding = "delta"
        else:
            tile.encoding = "dense"
            tile.W_pad = W_pad
            tile.nib = pack_row_tile(rows, W_pad, offsets=offs)
            tile.q_starts = (tile.row_starts // BLOCK).astype(np.int32)
    if tile.encoding == "dense" and tile.nib is None:
        # rows are pre-shifted by start % BLOCK so the device expansion is
        # a BLOCK-chunk gather (region_step.phase_consensus_rows_packed);
        # the delta count pass's spans skip the tile_spans re-walk
        rows_out = native.build_tile_rows(usable, region_start, L,
                                          _wbucket, BLOCK,
                                          spans=dense_spans)
        tile.nib, starts, tile.row_lens, inss, tile.W_pad = rows_out
        tile.row_starts = starts
        tile.q_starts = (starts // BLOCK).astype(np.int32)
    if inss is None:
        inss = []
    tile.ins_by_read = [[] for _ in usable]
    for pos, mi, seq in inss:
        tile.ins_by_read[mi].append((pos, seq))
    return tile


def _pow2(n: int, lo: int) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _wbucket(n: int, step: int = 4096) -> int:
    """Row-buffer width bucket: multiples of ``step`` (not pow2).

    W_pad is pure h2d payload over a possibly-tunneled link; pow2 steps
    wasted up to ~45% of the transferred bytes as NOCOV padding on typical
    15-18 kb HiFi rows.  4096 keeps the extra compile shapes modest (a
    handful per read-length regime, persisted in the XLA cache)."""
    return max(step, -(-n // step) * step)


def _len_bucket(n: int, lo: int = 4096) -> int:
    # x2 steps: padding waste (host->device bytes over a possibly-remote
    # link) costs more than the extra compile shapes, which persist in the
    # XLA compilation cache
    b = lo
    while b < n:
        b *= 2
    return b


def _bucket_key(tile: RegionTile, cfg: PipelineConfig) -> tuple | None:
    """("delta", R_pad, L_pad, Dsub_pad, Ddel_pad) or
    ("dense", R_pad, L_pad, W_pad) bucket, or None for the host path."""
    ex = cfg.execution
    R = len(tile.usable)
    L = tile.region_len
    if R == 0 or R > ex.max_tile_reads or L > ex.max_tile_len:
        return None
    if cfg.phasing.use_pairhmm:
        # pair-HMM realignment of the allele matrix is a host-path feature
        return None
    if tile.encoding == "delta":
        return ("delta", _pow2(R, 8), _len_bucket(L),
                _pow2(max(tile.subs[0].size, 1), 2048),
                _pow2(max(tile.dels[0].size, 1), 256))
    return ("dense", _pow2(R, 8), _len_bucket(L), tile.W_pad)


def _batch_size(key: tuple, cfg: PipelineConfig, n_devices: int) -> int:
    ex = cfg.execution
    if key[0] == "delta":
        # the delta kernel's working set per region: O(L) count/vote
        # tables PLUS the (Ddel, S) deletion-site membership product and
        # the (R, S) allele-matrix family -- a del-run-heavy noisy tile
        # can make the Ddel term dominate, and pricing only L would OOM
        # HBM at the raised batch cap
        S = cfg.phasing.max_sites
        _, Rp, Lp, _Ds, Dd = key
        per_region = Lp * 64 + Dd * S * 4 + Rp * S * 12
        cap = 4 * ex.max_regions_per_batch
    else:
        # budget on the expanded (R, L) working set -- the HBM bound, not
        # the (much smaller) transfer
        per_region = key[1] * key[2]
        cap = ex.max_regions_per_batch
    g = max(1, min(cap, int(ex.batch_bytes // per_region)))
    if n_devices > 1:
        # shard_map needs the batch divisible by the mesh
        g = max(n_devices, (g // n_devices) * n_devices)
    return g


def _h2d_bytes(key: tuple, G: int) -> int:
    """Wire bytes of one packed chunk (stage-stats accounting)."""
    if key[0] == "delta":
        _, Rp, Lp, Ds, Dd = key
        return G * (Lp + Rp * 9 + Ds * 9 + Dd * 12)
    _, Rp, _Lp, Wp = key
    return G * Rp * (Wp // 2) + G * Rp * 5


def _d2h_bytes_per_region(key: tuple, cfg: PipelineConfig) -> int:
    """Result bytes per region (stage-stats accounting)."""
    from focalsv_tpu.parallel.wire import flat_layout, flat_layout_rle
    S = cfg.phasing.max_sites
    Drle = drle_of(key)
    if Drle:
        return flat_layout_rle(key[1], S, Drle)["__total__"][1]
    return flat_layout(key[1], key[2], S)["__total__"][1]


_cache_ready = False
_cache_lock = __import__("threading").Lock()


def _ensure_compile_cache():
    """Persistent XLA compilation cache: bucketized tile shapes recompile
    only once per machine, not once per process.  Lock-guarded: concurrent
    jax.config.update from two threads is a fatal error.

    CPU backends get NO persistent cache: XLA:CPU AOT artifacts embed the
    compile machine's exact LLVM feature set, and reloading them on any
    other machine (or even the same one, with tuning flags like
    +prefer-no-gather that the loader compares against host features) logs
    'cpu_aot_loader ... could lead to SIGILL'.  CPU compiles here are
    seconds; the cache's value is the tunneled-TPU path, where a fresh
    compile is 20-40 s per tile shape."""
    global _cache_ready
    with _cache_lock:
        if _cache_ready:
            return
        try:
            import os

            import jax
            if jax.default_backend() == "cpu":
                jax.config.update("jax_compilation_cache_dir", None)
            else:
                path = os.environ.get(
                    "FOCALSV_JAX_CACHE",
                    os.path.expanduser("~/.cache/focalsv_jax"))
                path = os.path.join(path, jax.default_backend())
                jax.config.update("jax_compilation_cache_dir", path)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            logger.exception("could not enable the persistent compile cache")
        _cache_ready = True


def drle_of(key: tuple) -> int:
    """RLE run budget for a delta bucket's result tracks (0 = dense
    results).  A voted 30x consensus measures ~0.05% of columns as runs
    (hets + SV dels + low-depth holes); 0.2% gives 4-8x headroom, and
    overflow falls back to the host path -- the budget trades d2h bytes
    against fallback frequency, not correctness."""
    if key[0] != "delta":
        return 0
    return max(128, key[2] // 512)


def dispatch_packed(buf: np.ndarray, key: tuple, G: int,
                    cfg: PipelineConfig, mesh):
    """Launch the device step on an already-packed chunk buffer (async);
    the result's device->host copy is started immediately so transfers
    overlap compute and each other."""
    from focalsv_tpu.parallel import region_step as rs
    kw = rs.phase_consensus_kwargs(cfg.phasing)
    if key[0] == "delta":
        _, Rp, Lp, Ds, Dd = key
        kw["Drle"] = drle_of(key)
        if mesh is not None and mesh.size > 1:
            res = rs.sharded_phase_consensus_delta_flat(
                buf, mesh, G=G, R=Rp, L=Lp, Ds=Ds, Dd=Dd, **kw)
        else:
            res = rs.phase_consensus_delta_flat(buf, G=G, R=Rp, L=Lp,
                                                Ds=Ds, Dd=Dd, **kw)
    else:
        _, Rp, Lp, Wp = key
        if mesh is not None and mesh.size > 1:
            res = rs.sharded_phase_consensus_rows_flat(
                buf, mesh, G=G, R=Rp, L=Lp, W=Wp, **kw)
        else:
            res = rs.phase_consensus_rows_flat(buf, G=G, R=Rp, L=Lp, W=Wp,
                                               **kw)
    try:
        res.copy_to_host_async()
    except Exception:
        pass     # not all backends expose the async copy
    return res


def pack_chunk(tiles, chunk: list[int], key: tuple, G: int) -> np.ndarray:
    """Pack one chunk of tiles into its single wire buffer.

    ``tiles`` only needs the wire attributes (ref_codes/row_starts/...);
    entries may be None for padded tail slots (empty regions)."""
    from focalsv_tpu.parallel import wire
    # single-argument wire format: the tunneled link pays a large
    # per-array round-trip cost, so each chunk ships ONE uint8 buffer
    if key[0] == "delta":
        _, Rp, Lp, Ds, Dd = key
        return wire.pack_delta_chunk(tiles, chunk, G, Rp, Lp, Ds, Dd)
    _, Rp, Lp, Wp = key
    return wire.pack_rows_chunk(tiles, chunk, G, Rp, Wp)


def _dispatch_one(tiles: list[RegionTile], chunk: list[int],
                  key: tuple, G: int, cfg: PipelineConfig, mesh):
    """pack_chunk + dispatch_packed."""
    return dispatch_packed(pack_chunk(tiles, chunk, key, G), key, G, cfg,
                           mesh)


def dispatch_device_chunks(tiles: list[RegionTile], cfg: PipelineConfig,
                           mesh=None) -> list[tuple[list[int], tuple, object]]:
    """Dispatch every bucketizable tile through the device region step.

    Returns [(tile_indices, bucket_key, device_result)] with all chunks in
    flight.  Tiles that exceed the tile bounds are absent (host fallback).
    """
    _ensure_compile_cache()
    n_devices = mesh.size if mesh is not None else 1
    buckets: dict[tuple[int, int, int], list[int]] = {}
    for i, t in enumerate(tiles):
        key = _bucket_key(t, cfg)
        if key is not None:
            buckets.setdefault(key, []).append(i)
    pending: list[tuple[list[int], tuple, object]] = []
    for key, idxs in sorted(buckets.items()):
        G = _batch_size(key, cfg, n_devices)
        c0 = 0
        while c0 < len(idxs):
            chunk = idxs[c0 : c0 + G]
            c0 += G
            res = _dispatch_one(tiles, chunk, key, G, cfg, mesh)
            pending.append((chunk, key, res))
    return pending


def streamed_map(pool, tile_jobs: list, cfg: PipelineConfig, finish,
                 mesh=None, stats: dict | None = None) -> list:
    """Fully-pipelined region execution: tile builds (pool), device chunk
    dispatches (as soon as a bucket fills), result decodes and per-region
    finishes (pool) all overlap.

    ``tile_jobs[i]()`` -> RegionTile | None; ``finish(i, tile, dev)`` -> the
    per-region result (dev is None for host-fallback tiles).  Returns the
    per-index results; indices whose tile job returned None yield None.

    ``stats`` (optional dict) accumulates a stage breakdown: summed
    thread-seconds per stage (tile_build_s, device_wait_s, finish_s),
    device dispatch span (device_busy_s: first dispatch -> last result
    materialized, i.e. the window the chip has work in flight), chunk count,
    and h2d/d2h transfer bytes.
    """
    import concurrent.futures as cf
    import time as _time

    _ensure_compile_cache()
    st = stats if stats is not None else {}
    for k in ("tile_build_s", "device_wait_s", "finish_s", "device_busy_s",
              "h2d_bytes", "d2h_bytes"):
        st.setdefault(k, 0.0)
    st.setdefault("n_chunks", 0)
    st.setdefault("n_host_fallback", 0)
    n_devices = mesh.size if mesh is not None else 1
    n = len(tile_jobs)
    tiles: list[RegionTile | None] = [None] * n

    def timed_tile(j):
        t0 = _time.perf_counter()
        out = j()
        st["tile_build_s"] += _time.perf_counter() - t0
        return out

    def timed_finish(i, tile, dev):
        t0 = _time.perf_counter()
        out = finish(i, tile, dev)
        st["finish_s"] += _time.perf_counter() - t0
        return out

    fut_to_idx = {pool.submit(timed_tile, j): i
                  for i, j in enumerate(tile_jobs)}
    buckets: dict[tuple[int, int, int], list[int]] = {}
    pending: list[tuple[list[int], tuple, object]] = []
    fin_futs: dict[int, object] = {}
    first_dispatch = [None]

    def flush(key, force: bool):
        # tails pad to the full batch shape (ONE compiled shape per
        # bucket: the extra G_small shapes doubled cold-start cache loads)
        G = _batch_size(key, cfg, n_devices)
        idxs = buckets.get(key, [])
        while idxs and (len(idxs) >= G or force):
            chunk, idxs = idxs[:G], idxs[G:]
            if first_dispatch[0] is None:
                first_dispatch[0] = _time.perf_counter()
            res = _dispatch_one(tiles, chunk, key, G, cfg, mesh)
            st["n_chunks"] += 1
            st["h2d_bytes"] += _h2d_bytes(key, G)
            pending.append((chunk, key, res))
        buckets[key] = idxs

    def decode_and_finish(chunk, key, res):
        t0 = _time.perf_counter()
        outs = decode_chunk(tiles, chunk, key, res, cfg)
        st["device_wait_s"] += _time.perf_counter() - t0
        st["d2h_bytes"] += len(chunk) * _d2h_bytes_per_region(key, cfg)
        st["n_host_fallback"] += sum(1 for i in chunk if i not in outs)
        for i in chunk:
            fin_futs[i] = pool.submit(timed_finish, i, tiles[i], outs.get(i))

    def drain_ready():
        # decode any chunk whose device result (and async d2h copy) has
        # already materialized, so its per-region finishes overlap the
        # remaining tile builds instead of queueing behind all of them
        while pending:
            chunk, key, res = pending[0]
            try:
                if not res.is_ready():
                    break
            except Exception:
                break
            pending.pop(0)
            decode_and_finish(chunk, key, res)

    for fut in cf.as_completed(fut_to_idx):
        i = fut_to_idx[fut]
        tile = fut.result()
        tiles[i] = tile
        if tile is None:
            continue
        key = _bucket_key(tile, cfg)
        if key is None:
            # host-fallback tile: start its finish immediately
            st["n_host_fallback"] += 1
            fin_futs[i] = pool.submit(timed_finish, i, tile, None)
            continue
        buckets.setdefault(key, []).append(i)
        flush(key, force=False)
        drain_ready()
    for key in sorted(buckets):
        flush(key, force=True)
    # decode remaining chunks in dispatch order (d2h already in flight)
    for chunk, key, res in pending:
        decode_and_finish(chunk, key, res)
    if first_dispatch[0] is not None:
        st["device_busy_s"] += _time.perf_counter() - first_dispatch[0]
    return [fin_futs[i].result() if i in fin_futs else None
            for i in range(n)]


def decode_chunk(tiles: list[RegionTile], chunk: list[int], key: tuple,
                 res, cfg: PipelineConfig) -> dict[int, tuple]:
    """Materialize one chunk's flat result buffers (blocks only for this
    chunk) into per-tile unpacked outputs.

    A region whose RLE result overflowed its run budget is absent from the
    returned dict (its finish takes the host-fallback path)."""
    from focalsv_tpu.parallel.wire import unflatten_result, \
        unflatten_result_rle
    Rp, Lp = key[1], key[2]
    S = cfg.phasing.max_sites
    Drle = drle_of(key)
    bufs = np.asarray(res)
    out: dict[int, tuple] = {}
    for g, ti in enumerate(chunk):
        t = tiles[ti]
        R = len(t.usable)
        L = t.region_len
        if Drle:
            dec = unflatten_result_rle(bufs[g], Rp, S, Drle, t.ref_codes)
            if dec is None:
                continue      # run-budget overflow: host fallback
        else:
            dec = unflatten_result(bufs[g], Rp, Lp, S)
        (site_pos, n_sites, hp, sym, cov, sa0, sa1, site_h,
         conn, read_block) = dec
        n = n_sites
        out[ti] = (site_pos[:n], n, hp[:R], sym[:, :L], cov[:, :L],
                   sa0[:n], sa1[:n], site_h[:n], conn[:n], read_block[:R])
    return out


def run_device_step(tiles: list[RegionTile], cfg: PipelineConfig,
                    mesh=None) -> dict[int, tuple]:
    """Blocking convenience wrapper: dispatch + decode every chunk."""
    out: dict[int, tuple] = {}
    for chunk, key, res in dispatch_device_chunks(tiles, cfg, mesh=mesh):
        out.update(decode_chunk(tiles, chunk, key, res, cfg))
    return out


def finish_tile(tile: RegionTile, dev, cfg: PipelineConfig,
                apply_fp_filter: bool = False) -> RegionResult | None:
    """Host completion of one region from the device step's outputs.

    Phasing (including multi-block per-block MEC) comes entirely from the
    device step; single-block regions also take the device consensus-vote
    tracks.  Multi-block regions vote per (phase-set, haplotype) group on
    host (the device's two global tracks mix block memberships where
    groups' read spans overlap), reusing the host path's
    assemble_haplotypes -- the expensive phasing never re-runs.
    """
    R = len(tile.usable)
    L = tile.region_len
    chrom, start = tile.chrom, tile.start
    res = RegionResult(chrom=chrom, start=start, end=start + L)
    res.n_reads = R
    site_pos, S, hp, sym, cov, sa0, sa1, site_h, conn, read_block = dev
    multi = False
    if S == 0:
        pr = PhaseResult(np.zeros(R, np.int8), np.full(R, -1, np.int64), 0, 0,
                         np.zeros(0, np.int64), np.zeros(0, np.int64))
    else:
        # block ids from the device's site-connectivity bits
        # (phasing/phase.py::phase_blocks semantics)
        blocks = np.zeros(S, np.int64)
        if S > 1:
            blocks[1:] = np.cumsum(1 - conn[: S - 1].astype(np.int64))
        n_blocks = int(blocks.max()) + 1
        multi = n_blocks > 1
        # first site index of each block -> per-read phase-set id from the
        # device's read_block assignment (block of the first covered site)
        _, bstart = np.unique(blocks, return_index=True)
        ps = np.full(R, -1, np.int64)
        phased = hp > 0
        rb = np.clip(read_block.astype(np.int64), 0, n_blocks - 1)
        ps[phased] = start + site_pos[bstart[rb[phased]]] + 1
        pr = PhaseResult(hp.astype(np.int8), ps, S, n_blocks,
                         site_pos.astype(np.int64) + start, blocks,
                         site_allele0=np.asarray(sa0, np.uint8),
                         site_allele1=np.asarray(sa1, np.uint8),
                         site_hap1=np.asarray(site_h, np.uint8))
    res.n_phased = int((pr.hp > 0).sum())
    res.n_blocks = pr.n_blocks
    groups = group_reads_by_block(tile.usable, pr)
    hp1: dict[str, np.ndarray] = {}
    hp2: dict[str, np.ndarray] = {}
    name_prefix = f"{chrom}_S{start}"
    if multi and cfg.assembly.method != "olc":
        # per-group host votes (device phasing, host consensus)
        from focalsv_tpu.assembly.consensus import assemble_haplotypes
        hp1, hp2 = assemble_haplotypes(
            tile.usable, groups, start, L, cfg.assembly,
            name_prefix=name_prefix, alns_out=res.contig_alns)
    else:
        from focalsv_tpu.assembly.consensus import SpanValid
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
                valid = SpanValid(tile.row_starts[idxs],
                                  tile.row_starts[idxs] + tile.row_lens[idxs])
                ins_at = decide_insertions(valid, inss, L)
                own, _rival = group_exclusive_sets(groups, psid, k)
                ins_at = add_clip_insertions(ins_at, tile.usable, idxs,
                                             start, L, own=own, valid=valid,
                                             cfg=cfg.assembly)
                contig, segs = stitch_contig_segments(sym[row], cov[row],
                                                      ins_at)
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
