"""Tandem-array read-evidence arbitration (calling/array_arbitrate.py):
the four behaviors that close the noisy-dtype OLC repeat cell — drop
in-array calls no spanning read supports (auto-pass override), snap
under-length calls to the read-cluster length, impute GT from the phased
read vote, and rescue a strong cluster with no surviving call.  Reference
semantics shape: 5_post_processing/GT_impute.py (reads_sig GT rescue),
ONT_var_process.py:34-45 (read-scan INS union)."""

from dataclasses import dataclass

import numpy as np
import pytest

from focalsv_tpu.calling.array_arbitrate import arbitrate_array_calls
from focalsv_tpu.config import FPFilterConfig
from focalsv_tpu.io.vcf import VcfRecord
from focalsv_tpu.ops import encode as enc
from focalsv_tpu.signatures.sigs import DEL, INS, Sigs


@dataclass
class _Read:
    name: str
    pos: int
    reference_end: int


def _fixture(n_sup=8, sig_len=50, hom=True):
    rng = np.random.default_rng(12345)
    ref = rng.integers(0, 4, 2000).astype(np.uint8)
    unit = rng.integers(0, 4, 10).astype(np.uint8)
    ref[800:1400] = np.tile(unit, 60)
    reads = [_Read(f"r{i}", 0, 1999) for i in range(n_sup)]
    hp = {f"r{i}": (1 if i < n_sup // 2 else 2) for i in range(n_sup)}
    sup = reads if hom else reads[: n_sup // 2]
    sigs = _sigs(np.full(len(sup), DEL, np.int8),
                 np.full(len(sup), 800, np.int64),
                 np.full(len(sup), sig_len, np.int64),
                 [r.name for r in sup])
    return ref, reads, hp, sigs


def _sigs(svtype, pos, svlen, names):
    n = len(pos)
    return Sigs(svtype=svtype, pos=pos, svlen=svlen,
                contig=np.arange(n, dtype=np.int32),
                rstart=np.zeros(n, np.int64), rend=np.zeros(n, np.int64),
                strand=np.zeros(n, np.int8), source=np.zeros(n, np.int8),
                mapq=np.full(n, 60, np.int32), names=list(names))


def _del_rec(pos, length, gt="0/1", ref=None):
    anchor = enc.decode(np.asarray(ref[pos - 1 : pos], np.uint8))
    return VcfRecord("chr1", pos, f"t.DEL.{pos}",
                     anchor + enc.decode(np.asarray(ref[pos : pos + length],
                                                    np.uint8)),
                     anchor, "20", "PASS",
                     info={"SVTYPE": "DEL", "SVLEN": -length}, gt=gt)


def _ins_rec(pos, length, gt="0/1", ref=None):
    anchor = enc.decode(np.asarray(ref[pos - 1 : pos], np.uint8))
    return VcfRecord("chr1", pos, f"t.INS.{pos}", anchor,
                     anchor + enc.decode(np.asarray(ref[pos : pos + length],
                                                    np.uint8)),
                     "20", "PASS",
                     info={"SVTYPE": "INS", "SVLEN": length}, gt=gt)


def test_drop_unsupported_and_rescue():
    """A mis-assembly's in-array INS (no read cluster of that type) drops
    despite being >250 bp (auto-pass override); the read cluster's DEL,
    having no surviving same-type call, is rescued with the hom vote."""
    ref, reads, hp, sigs = _fixture()
    bogus = _ins_rec(810, 300, "1/1", ref=ref)
    far = _del_rec(100, 60, "0/1", ref=ref)   # outside any array: untouched
    kept, dropped = arbitrate_array_calls(
        [bogus, far], sigs, reads, hp, ref, 0, "chr1", FPFilterConfig())
    assert [d.svtype for d in dropped] == ["INS"]
    assert dropped[0].info["ARB"] == "unsupported_in_array"
    assert far in kept
    res = [r for r in kept if r.svtype == "DEL" and r.pos != 100]
    assert len(res) == 1
    assert res[0].svlen == 50 and res[0].gt == "1/1"
    assert res[0].info["ARB"] == "rescued_from_reads"
    assert len(res[0].ref) - len(res[0].alt) == 50


def test_snap_underlength_call_to_read_median():
    """A same-type call at a fraction of the read length (lost units in
    consensus) is rebuilt at the cluster's canonical pos/length."""
    ref, reads, hp, sigs = _fixture()
    under = _del_rec(800, 40, "1/1", ref=ref)   # sim 0.8: kept, resized
    kept, dropped = arbitrate_array_calls(
        [under], sigs, reads, hp, ref, 0, "chr1", FPFilterConfig())
    assert not dropped
    assert len(kept) == 1 and kept[0].svlen == 50
    assert kept[0].info["ARB"] == "length_from_reads"


def test_gt_imputed_from_phased_read_vote():
    """Exact-length call with the wrong genotype: both haplotypes'
    spanning reads support the event, so the hom vote overrides."""
    ref, reads, hp, sigs = _fixture(hom=True)
    rec = _del_rec(800, 50, "0/1", ref=ref)
    kept, dropped = arbitrate_array_calls(
        [rec], sigs, reads, hp, ref, 0, "chr1", FPFilterConfig())
    assert not dropped and len(kept) == 1
    assert kept[0].gt == "1/1"
    assert kept[0].info["ARB"] == "gt_from_reads"


def test_het_support_stays_het():
    """Only hp1's reads carry the signature: the vote keeps 0/1 and an
    agreeing call is untouched."""
    ref, reads, hp, sigs = _fixture(hom=False)
    rec = _del_rec(800, 50, "0/1", ref=ref)
    kept, dropped = arbitrate_array_calls(
        [rec], sigs, reads, hp, ref, 0, "chr1", FPFilterConfig())
    assert not dropped and len(kept) == 1
    assert kept[0].gt == "0/1" and "ARB" not in kept[0].info


def test_noop_outside_arrays_and_when_disabled():
    """No detected unit at the cluster locus (or the config switch off):
    records pass through unchanged."""
    ref, reads, hp, sigs = _fixture()
    # cluster positioned in non-repetitive flank: unit probe fails
    flat = _sigs(sigs.svtype, np.full(len(sigs), 200, np.int64),
                 sigs.svlen, sigs.names)
    rec = _del_rec(205, 20, "0/1", ref=ref)
    kept, dropped = arbitrate_array_calls(
        [rec], flat, reads, hp, ref, 0, "chr1", FPFilterConfig())
    assert kept == [rec] and not dropped
    import dataclasses
    off = dataclasses.replace(FPFilterConfig(), array_arbitrate=False)
    bogus = _ins_rec(810, 300, "1/1", ref=ref)
    kept, dropped = arbitrate_array_calls(
        [bogus], sigs, reads, hp, ref, 0, "chr1", off)
    assert kept == [bogus] and not dropped
