"""Contig-route DUP calling from the indel pipeline's HP*.fa artifacts."""

import os

import numpy as np
import pytest

from focalsv_tpu.complexsv.target import call_dup_from_contigs
from focalsv_tpu.io.fasta import write_fasta


def test_call_dup_from_contigs(tmp_path):
    rng = np.random.default_rng(5)
    ref = rng.integers(0, 4, 80_000).astype(np.uint8)
    dup_start, dup_end = 30_000, 48_000   # 18 kb tandem duplication
    contig = np.concatenate([
        ref[22_000:dup_end], ref[dup_start:dup_end], ref[dup_end:60_000]])
    rdir = os.path.join(str(tmp_path), "chr21", "regions",
                        "Region_chr21_S22000_E60000")
    os.makedirs(rdir)
    write_fasta(os.path.join(rdir, "HP1.fa"), [("c_hp1_1", contig)])
    write_fasta(os.path.join(rdir, "HP2.fa"), [("c_hp2_1", contig)])
    dups = call_dup_from_contigs(str(tmp_path), {"chr21": ref}, "HIFI",
                                 min_support=1)
    assert dups, "no contig-route DUP found"
    best = max(dups, key=lambda r: int(r.info["SUPPORT"]))
    assert abs(best.pos - dup_start) < 2_000
    assert abs(int(best.info["END"]) - dup_end) < 2_000
    assert best.info["SIG_SOURCE"] == "contig"
