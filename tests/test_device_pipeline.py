"""Bit-parity contract between the host per-region path and the
device-batched execution path (pipeline/device_exec.py).

The device region step (parallel/region_step.py) must reproduce the host
phasing + consensus byte-for-byte for single-block regions; multi-block
regions must transparently fall back to the host path.  process_chromosome
in "device" mode must emit exactly the records of "host" mode.
"""

import dataclasses

import numpy as np
import pytest

from focalsv_tpu.config import preset
from focalsv_tpu.pipeline import device_exec as dx
from focalsv_tpu.pipeline.region import process_region
from focalsv_tpu.testing import simulate as sim


def _mk_regions(dtype: str):
    kw = dict(sub_rate=0.001)
    if dtype == "CLR":
        kw = dict(sub_rate=0.04, ins_rate=0.04, del_rate=0.02)
    elif dtype == "ONT":
        kw = dict(sub_rate=0.03, ins_rate=0.02, del_rate=0.03)
    regions = []
    for i in range(6):
        regions.append(sim.simulate_region(
            seed=7000 + i, ref_len=9000, coverage=18, n_snps=10,
            read_len_mean=4000, **kw))
    # one all-unphased region (no SNPs) and one with no SVs
    regions.append(sim.simulate_region(seed=7100, ref_len=6000, coverage=12,
                                       n_snps=0, read_len_mean=3000, **kw))
    regions.append(sim.simulate_region(seed=7101, ref_len=6000, coverage=12,
                                       n_snps=8, read_len_mean=3000, svs=[],
                                       **kw))
    return regions


def _device_results(regions, cfg):
    tiles = [dx.build_tile(rg.reads, rg.ref, 0, rg.chrom, cfg)
             for rg in regions]
    dev_outs = dx.run_device_step(tiles, cfg)
    return [dx.process_region_device(t, dev_outs.get(i), cfg,
                                     apply_fp_filter=True)
            for i, t in enumerate(tiles)]


def _assert_region_equal(h, d, label):
    np.testing.assert_array_equal(h.phase_hp, d.phase_hp, err_msg=label)
    np.testing.assert_array_equal(h.phase_ps, d.phase_ps, err_msg=label)
    assert sorted(h.contigs_hp1) == sorted(d.contigs_hp1), label
    assert sorted(h.contigs_hp2) == sorted(d.contigs_hp2), label
    for name in h.contigs_hp1:
        np.testing.assert_array_equal(h.contigs_hp1[name],
                                      d.contigs_hp1[name], err_msg=label)
    for name in h.contigs_hp2:
        np.testing.assert_array_equal(h.contigs_hp2[name],
                                      d.contigs_hp2[name], err_msg=label)
    hrec = [(r.pos, r.ref, r.alt, r.gt) for r in h.records]
    drec = [(r.pos, r.ref, r.alt, r.gt) for r in d.records]
    assert hrec == drec, label
    hsnv = [(r.pos, r.ref, r.alt, r.gt, r.info.get("PS"))
            for r in h.snv_records]
    dsnv = [(r.pos, r.ref, r.alt, r.gt, r.info.get("PS"))
            for r in d.snv_records]
    assert hsnv == dsnv, label


@pytest.mark.parametrize("dtype", ["HIFI", "CLR", "ONT"])
def test_device_host_parity(dtype):
    cfg = preset(dtype)
    regions = _mk_regions(dtype)
    host = [process_region(rg.reads, rg.ref, 0, rg.chrom, cfg)
            for rg in regions]
    dev = _device_results(regions, cfg)
    n_sv = 0
    for i, (h, d) in enumerate(zip(host, dev)):
        _assert_region_equal(h, d, f"{dtype} region {i}")
        n_sv += len(h.records)
    assert n_sv > 0   # the parity must be exercised on real SV calls


def test_multiblock_stays_on_device_and_matches_host():
    """A coverage gap splits the het sites into two phase blocks; the
    device path must phase BOTH blocks on device (per-block MEC with
    segment-id prefix sums -- no host re-phasing fallback) and reproduce
    the host result bit-for-bit."""
    cfg = preset("HIFI")
    rg = sim.simulate_region(seed=7200, ref_len=16000, coverage=20,
                             n_snps=16, read_len_mean=3000)
    # carve out the middle third of the reads to disconnect the blocks
    reads = [r for r in rg.reads
             if r.reference_end < 7000 or r.pos > 9500]
    host = process_region(reads, rg.ref, 0, rg.chrom, cfg)
    assert host.n_blocks > 1   # the case must actually be multi-block
    tile = dx.build_tile(reads, rg.ref, 0, rg.chrom, cfg)
    dev_outs = dx.run_device_step([tile], cfg)
    # the device path completes the region itself (no process_region rerun)
    dres = dx.finish_tile(tile, dev_outs[0], cfg, apply_fp_filter=True)
    assert dres is not None
    assert dres.n_blocks == host.n_blocks
    # reads carry per-block phase-set ids, not one global PS
    assert len({int(p) for p in dres.phase_ps if p > 0}) == host.n_blocks
    _assert_region_equal(host, dres, "multiblock")


def test_process_chromosome_device_matches_host(tmp_path):
    import focalsv_tpu.io.bam as bamio
    from focalsv_tpu.io.bed import Region
    from focalsv_tpu.io.fasta import FastaFile, write_fasta
    from focalsv_tpu.pipeline.main import process_chromosome

    cfg = preset("HIFI")
    L = 8000
    chrom_parts = []
    regions = []
    rng_regions = [sim.simulate_region(seed=7300 + i, ref_len=L, coverage=16,
                                       n_snps=8, read_len_mean=3500)
                   for i in range(3)]
    chrom_ref = np.concatenate([rg.ref for rg in rng_regions])
    bam_path = str(tmp_path / "reads.bam")
    w = bamio.BamWriter(bam_path, ["chr21"], [len(chrom_ref)])
    recs = []
    for i, rg in enumerate(rng_regions):
        for rec in rg.reads:
            recs.append(dataclasses.replace(rec, pos=rec.pos + i * L))
        regions.append(Region("chr21", i * L + 100, (i + 1) * L - 100))
    recs.sort(key=lambda r: r.pos)
    for rec in recs:
        w.write(rec)
    w.close()
    bamio.build_bai(bam_path)
    fa_path = str(tmp_path / "ref.fa")
    write_fasta(fa_path, [("chr21", chrom_ref)])
    bam = bamio.ensure_indexed(bam_path)
    fasta = FastaFile.load(fa_path)

    out_h = process_chromosome(
        bam, fasta, "chr21", regions,
        cfg.replace(execution=dataclasses.replace(cfg.execution,
                                                  mode="host")),
        out_dir=str(tmp_path / "host"), num_workers=2)
    out_d = process_chromosome(
        bam, fasta, "chr21", regions, cfg,
        out_dir=str(tmp_path / "dev"), num_workers=2)
    hrec = [(r.pos, r.ref, r.alt, r.gt) for r in out_h.records]
    drec = [(r.pos, r.ref, r.alt, r.gt) for r in out_d.records]
    assert hrec == drec and len(hrec) > 0
    # the device mode must produce the stage-timing artifact
    assert (tmp_path / "dev" / "log" / "stage_times.json").exists()
    # and the longshot-style phased-SNV VCF artifact per region
    import glob

    from focalsv_tpu.io.vcf import read_vcf
    snv_paths = glob.glob(str(tmp_path / "dev" / "regions" / "*" /
                              "region_phased.vcf"))
    assert snv_paths, "region_phased.vcf artifact missing"
    _, snvs = read_vcf(snv_paths[0])
    assert snvs and all(r.gt in ("0|1", "1|0") for r in snvs)
    assert all("PS" in r.info for r in snvs)


def test_forced_dense_encoding_matches_delta():
    """The dense-row fallback encoding (high-noise tiles) must produce the
    same device results as the default delta encoding."""
    import copy

    from focalsv_tpu import native
    from focalsv_tpu.parallel.region_step import BLOCK, pack_row_tile

    cfg = preset("HIFI")
    regions = _mk_regions("HIFI")[:4]
    delta_tiles = [dx.build_tile(rg.reads, rg.ref, 0, rg.chrom, cfg)
                   for rg in regions]
    assert all(t.encoding == "delta" for t in delta_tiles)
    dense_tiles = []
    for rg in regions:
        t = dx.build_tile(rg.reads, rg.ref, 0, rg.chrom, cfg)
        out = native.build_tile_rows(t.usable, 0, t.region_len,
                                     dx._wbucket, BLOCK)
        if out is not None:
            t.nib, starts, t.row_lens, _ins, t.W_pad = out
            t.row_starts = starts
        else:
            from focalsv_tpu.assembly.consensus import compact_pileup_rows
            rows, starts, _ins = compact_pileup_rows(
                t.usable, list(range(len(t.usable))), 0, t.region_len)
            t.row_starts = starts.astype(np.int32)
            t.row_lens = np.array([len(r) for r in rows], np.int32)
            offs = (t.row_starts % BLOCK).astype(np.int32)
            t.W_pad = dx._wbucket(int((t.row_lens + offs).max()))
            t.nib = pack_row_tile(rows, t.W_pad, offsets=offs)
        t.q_starts = (t.row_starts // BLOCK).astype(np.int32)
        t.encoding = "dense"
        dense_tiles.append(t)
    out_a = dx.run_device_step(delta_tiles, cfg)
    out_b = dx.run_device_step(dense_tiles, cfg)
    for i in range(len(regions)):
        ra = dx.process_region_device(delta_tiles[i], out_a.get(i), cfg,
                                      apply_fp_filter=True)
        rb = dx.process_region_device(dense_tiles[i], out_b.get(i), cfg,
                                      apply_fp_filter=True)
        _assert_region_equal(ra, rb, f"encoding region {i}")


def test_high_noise_tile_chooses_dense_and_matches_host():
    """A tile whose deviation payload exceeds the packed-row payload must
    take the dense encoding (the native builder skips the deviation fill
    entirely, build_tile_delta dense_if_over) and still bit-match the
    host path."""
    cfg = preset("HIFI")
    rg = sim.simulate_region(seed=7300, ref_len=6000, coverage=14,
                             n_snps=8, read_len_mean=2500, sub_rate=0.30)
    tile = dx.build_tile(rg.reads, rg.ref, 0, rg.chrom, cfg)
    assert tile.encoding == "dense"
    assert tile.nib is not None and tile.subs is None
    host = process_region(rg.reads, rg.ref, 0, rg.chrom, cfg)
    dev_outs = dx.run_device_step([tile], cfg)
    dres = dx.process_region_device(tile, dev_outs.get(0), cfg,
                                    apply_fp_filter=True)
    _assert_region_equal(host, dres, "high-noise dense")
