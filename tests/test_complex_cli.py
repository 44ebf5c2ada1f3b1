import io
import os
from contextlib import redirect_stdout

import numpy as np
import pytest

from focalsv_tpu.align_engine import Aligner
from focalsv_tpu.complexsv import cli as ccli
from focalsv_tpu.io import bam as bamio
from focalsv_tpu.io.fasta import write_fasta
from focalsv_tpu.io.vcf import read_vcf
from focalsv_tpu.ops import encode as enc


@pytest.fixture(scope="module")
def inv_bam(tmp_path_factory):
    d = tmp_path_factory.mktemp("complexcli")
    rng = np.random.default_rng(21)
    ref = rng.integers(0, 4, 40_000).astype(np.uint8)
    inv_start, inv_end = 18_000, 24_000
    donor = np.concatenate([
        ref[:inv_start], enc.revcomp(ref[inv_start:inv_end]), ref[inv_end:]])
    al = Aligner(ref, t_name="chr21")
    records = []
    for i in range(40):
        s = int(rng.integers(0, len(donor) - 12_000))
        seq = donor[s : s + 12_000]
        alns = al.align(seq, f"r{i}")
        for a in alns:
            records.append(al.to_bam_record(a, seq, alns))
    p = str(d / "inv.bam")
    w = bamio.BamWriter(p, ["chr21"], [40_000])
    for r in sorted(records, key=lambda r: r.pos):
        w.write(r)
    w.close()
    bamio.build_bai(p)
    ref_path = str(d / "ref.fa")
    write_fasta(ref_path, [("chr21", ref)])
    return dict(bam=p, ref=ref_path, dir=str(d),
                inv=(inv_start, inv_end))


def test_complex_cli_auto(inv_bam, tmp_path):
    out = str(tmp_path / "auto")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = ccli.main(["--mode", "auto", "--bam_file", inv_bam["bam"],
                        "-d", "HIFI", "-o", out, "--min_support", "2"])
    assert rc == 0
    vcf = os.path.join(out, "FocalSV_TRA_INV_DUP.vcf")
    _, recs = read_vcf(vcf)
    invs = [r for r in recs if r.info.get("SVTYPE") == "INV"]
    assert invs, recs
    best = max(invs, key=lambda r: int(r.info.get("SUPPORT", 0)))
    assert abs(best.pos - inv_bam["inv"][0]) < 2000


def test_complex_cli_target(inv_bam, tmp_path):
    out = str(tmp_path / "target")
    bed = str(tmp_path / "typed.bed")
    a, b = inv_bam["inv"]
    with open(bed, "w") as f:
        f.write(f"chr21\t{a - 3000}\t{b + 3000}\tINV\n")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = ccli.main(["--mode", "target", "--bam_file", inv_bam["bam"],
                        "--bed_file", bed, "--ref_file", inv_bam["ref"],
                        "-d", "HIFI", "-o", out, "--min_support", "2"])
    assert rc == 0
    _, recs = read_vcf(os.path.join(out, "FocalSV_TRA_INV_DUP.vcf"))
    invs = [r for r in recs if r.info.get("SVTYPE") == "INV"]
    assert invs
