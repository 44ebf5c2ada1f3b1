"""Step-0 golden reproduction: detect_regions must REPRODUCE the reference's
shipped 26,834-region auto BED from a signature set, not merely leave it
invariant (a fixed-point test cannot catch clustering-threshold errors).

The construction inverts the HIFI-L1 clustering exactly: every golden region
[S, E] decomposes as core [S+7000, E-7000] (the flank is 7000) and the core
is realized as one INS-signature cluster -- positions tiling the core at
dt_fine (500 bp) spacing, each > min_sig_size (30 bp).  The golden BED's
geometry guarantees the inversion is exact: minimum width is exactly 14000
(single-point cores) and every adjacent same-chromosome gap is >= re_dt
(15000), so no stage of cluster/recluster/merge can split or join anything
(reference params: 0_define_region.py:452-467).
"""

import os

import numpy as np
import pytest

from focalsv_tpu.config import preset
from focalsv_tpu.regions.detect import detect_regions

GOLDEN = "/root/reference/test/SV_Regions_HG002_HIFI_L1_FocalSV-auto.bed"


def _load_golden():
    rows = []
    with open(GOLDEN) as f:
        for line in f:
            c, s, e = line.split()[:3]
            rows.append((c, int(s), int(e)))
    return rows


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="golden BED absent")
def test_detect_regions_reproduces_golden_bed_from_signatures():
    rows = _load_golden()
    cfg = preset("HIFI").detect
    assert (cfg.dt_fine, cfg.min_sig, cfg.re_dt, cfg.flank) == \
        (500, 1, 15_000, 7_000)
    # geometry preconditions of the exact inversion
    prev = {}
    for c, s, e in rows:
        assert e - s >= 2 * cfg.flank
        if c in prev:
            assert s - prev[c] >= cfg.re_dt, "adjacent regions would merge"
        prev[c] = e
    # synthesize the signature set: one INS cluster tiling each core
    sig_ins: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    chroms: list[str] = []
    by_chrom: dict[str, list[int]] = {}
    for c, s, e in rows:
        if c not in by_chrom:
            by_chrom[c] = []
            chroms.append(c)
        core_s, core_e = s + cfg.flank, e - cfg.flank
        pos = list(range(core_s, core_e + 1, cfg.dt_fine))
        if pos[-1] != core_e:
            pos.append(core_e)
        by_chrom[c].extend(pos)
    for c, poss in by_chrom.items():
        p = np.array(poss, np.int64)
        sig_ins[c] = (p, np.full(p.size, 60, np.int64))   # > min_sig_size
    sig_del = {c: (np.zeros(0, np.int64), np.zeros(0, np.int64))
               for c in chroms}
    prior = {c: np.zeros(0, np.int64) for c in chroms}
    regions = detect_regions(sig_del, sig_ins, prior, cfg, chroms=chroms)
    got = [(r.chrom, r.start, r.end) for r in regions]
    assert len(got) == len(rows) == 26_834
    assert got == rows


def test_detect_regions_prior_merge_semantics():
    """The population-prior VCF path: a prior cluster with no read support
    still seeds a region, and a prior cluster within re_dt of a signature
    cluster joins it into one region (0_define_region.py merge_dict flow)."""
    cfg = preset("HIFI").detect
    sig_ins = {"chr1": (np.array([100_000, 100_400], np.int64),
                        np.array([80, 90], np.int64))}
    sig_del = {"chr1": (np.zeros(0, np.int64), np.zeros(0, np.int64))}
    # one prior near the sig cluster (within re_dt), one isolated far away
    prior = {"chr1": np.array([108_000, 500_000], np.int64)}
    regions = detect_regions(sig_del, sig_ins, prior, cfg, chroms=["chr1"])
    spans = [(r.start, r.end) for r in regions]
    assert len(spans) == 2
    # merged region covers sigs + nearby prior, with the 7 kb flank
    assert spans[0] == (100_000 - cfg.flank, 108_000 + cfg.flank)
    # isolated prior seeds its own (point) region
    assert spans[1] == (500_000 - cfg.flank, 500_000 + cfg.flank)
