import dataclasses

import numpy as np
import pytest

from focalsv_tpu.config import DataType, preset
from focalsv_tpu.phasing.phase import phase_region
from focalsv_tpu.phasing.realign import read_offset_at, realign_allele_matrix
from focalsv_tpu.io import bam as bamio
from focalsv_tpu.testing import simulate as sim


def test_read_offset_at():
    rec = bamio.BamRecord(
        name="r", flag=0, ref_id=0, pos=100, mapq=60,
        cigar=bamio.parse_cigar_string("10M5D10M5I10M"),
        seq=np.zeros(35, np.uint8), qual=np.zeros(35, np.uint8))
    assert read_offset_at(rec, 105) == 5
    assert read_offset_at(rec, 112) is None   # inside the deletion
    assert read_offset_at(rec, 116) == 11     # after D: ref 115->q10
    assert read_offset_at(rec, 126) == 26     # after the insertion


def test_phasing_with_pairhmm_matches_truth():
    region = sim.simulate_region(seed=5, ref_len=20_000, coverage=20, n_snps=15)
    cfg = dataclasses.replace(preset(DataType.HIFI).phasing, use_pairhmm=True)
    pr = phase_region(region.reads, region.ref, 0, cfg)
    assert pr.n_sites >= 8
    phased = pr.hp > 0
    assert phased.mean() > 0.7
    truth = np.array(region.read_hap)
    agree = (pr.hp[phased] - 1 == truth[phased]).mean()
    assert max(agree, 1 - agree) > 0.9
