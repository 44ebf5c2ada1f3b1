from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from focalsv_tpu.ops import align as alignops
from focalsv_tpu.parallel.batch_executor import dp_batching


def _mk_pair(rng, n=200):
    t = rng.integers(0, 4, n).astype(np.uint8)
    q = np.delete(t, slice(50, 50 + int(rng.integers(1, 10))))
    return q, t


def test_batched_matches_direct():
    rng = np.random.default_rng(0)
    pairs = [_mk_pair(rng) for _ in range(20)]
    direct = [alignops.banded_align_pair(q, t, band=128) for q, t in pairs]
    # init_rt_ms=0: force every job through the device batch (the latency
    # router would otherwise keep jobs this small on the host kernel)
    with dp_batching(max_wait_ms=5.0, init_rt_ms=0.0) as batcher:
        with ThreadPoolExecutor(max_workers=8) as ex:
            batched = list(ex.map(
                lambda p: alignops.banded_align_pair(p[0], p[1], band=128),
                pairs))
    assert batcher.n_jobs == 20
    assert batcher.n_batches < 20, "no batching happened"
    for (s1, c1), (s2, c2) in zip(direct, batched):
        assert s1 == s2
        assert c1 == c2


def test_region_pipeline_under_batching():
    from focalsv_tpu.config import DataType, preset
    from focalsv_tpu.evaluation.compare import match_records, truth_from_sim
    from focalsv_tpu.pipeline.region import process_region
    from focalsv_tpu.testing import simulate as sim

    regions = [sim.simulate_region(seed=200 + i, ref_len=20_000, coverage=18,
                                   n_snps=15) for i in range(4)]
    cfg = preset(DataType.HIFI)
    with dp_batching(max_wait_ms=3.0):
        with ThreadPoolExecutor(max_workers=4) as ex:
            results = list(ex.map(
                lambda rg: process_region(rg.reads, rg.ref, 0, rg.chrom, cfg),
                regions))
    for rg, res in zip(regions, results):
        truth = truth_from_sim(rg.svs, rg.chrom, rg.ref)
        bench = match_records(res.records, truth)
        assert bench.recall == 1.0
