"""Bit-parity contract of the multi-process region executor
(pipeline/mp_exec.py) against the single-process device path."""

import numpy as np

from focalsv_tpu.config import preset
from focalsv_tpu.pipeline import device_exec as dx
from focalsv_tpu.testing import simulate as sim


def test_mp_executor_matches_single_process(tmp_path):
    """Same records through MpRegionExecutor (2 children + parent-owned
    dispatch, queues carrying wire buffers) as through the in-process
    tile -> device -> finish path, including a second pass on the warm
    executor (chunk routing, RLE decode, ref re-load from disk)."""
    from focalsv_tpu.pipeline.mp_exec import MpRegionExecutor

    cfg = preset("HIFI")
    jobs = []
    for i in range(6):
        r = sim.simulate_region(seed=600 + i, ref_len=12_000, coverage=18,
                                n_snps=14,
                                svs=[sim.SimSV("DEL", 6_000, 80 + 10 * i,
                                               "0/1")])
        bam = str(tmp_path / f"r{i}.bam")
        ref = str(tmp_path / f"r{i}.npy")
        sim.write_region_bam(r, bam)
        np.save(ref, r.ref)
        jobs.append((bam, ref, "chr21"))

    want = []
    for j in jobs:
        from focalsv_tpu.io.bam import BamReader
        reads = list(BamReader(j[0]))
        ref = np.load(j[1])
        tile = dx.build_tile(reads, ref, 0, "chr21", cfg)
        dev = dx.run_device_step([tile], cfg)
        res = dx.process_region_device(tile, dev.get(0), cfg)
        want.append([(r.pos, r.ref, r.alt, r.gt) for r in res.records])

    with MpRegionExecutor(cfg, n_children=2) as ex:
        for _pass in range(2):
            out = ex.run(jobs, collect="records")
            got = [[(r.pos, r.ref, r.alt, r.gt) for r in res.records]
                   for _n, res in out]
            assert got == want
