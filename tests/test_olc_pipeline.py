import dataclasses

import numpy as np
import pytest

from focalsv_tpu.config import DataType, preset
from focalsv_tpu.evaluation.compare import match_records, truth_from_sim
from focalsv_tpu.pipeline.region import process_region
from focalsv_tpu.testing import simulate as sim


def test_region_pipeline_with_olc_assembly():
    region = sim.simulate_region(seed=61, ref_len=25_000, coverage=24,
                                 n_snps=25, sub_rate=0.002)
    cfg = preset(DataType.HIFI)
    cfg = dataclasses.replace(
        cfg, assembly=dataclasses.replace(cfg.assembly, method="olc"))
    res = process_region(region.reads, region.ref, 0, region.chrom, cfg)
    truth = truth_from_sim(region.svs, region.chrom, region.ref)
    bench = match_records(res.records, truth)
    assert bench.recall == 1.0, (
        f"recall {bench.recall}; calls="
        f"{[(r.info['SVTYPE'], r.pos, r.info['SVLEN'], r.gt) for r in res.records]}")
    assert bench.gt_concordance == 1.0
