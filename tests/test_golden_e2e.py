"""Committed end-to-end golden fixtures: exact-output regression gate.

The reference ships exact expected outputs as golden files
(test/SV_Regions_HG002_HIFI_L1_FocalSV-auto.bed, the Zenodo chr21 set);
this is the analog for the full pipeline: a committed 150 kb chr21 BAM +
ref + BED per dtype (tests/data/gen_golden.py, fixed seeds) with the
expected final VCF.  Any output drift — even one that stays above the F1
floors of the accuracy gate — fails here.  Regenerate expected.vcf ONLY
for intentional changes:
    PYTHONPATH=. python tests/data/gen_golden.py --update-expected
"""

import os

import pytest

from focalsv_tpu.pipeline import cli

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "data", "golden")


def _run(dtype: str, out_dir: str, execution: str) -> str:
    d = os.path.join(GOLDEN, dtype.lower())
    rc = cli.main([
        "--bam_file", os.path.join(d, "reads.bam"),
        "--ref_file", os.path.join(d, "ref.fa"),
        "--target_bed", os.path.join(d, "regions.bed"),
        "--out_dir", out_dir, "--data_type", dtype,
        "--num_threads", "1", "--execution", execution,
    ])
    assert rc == 0
    return os.path.join(out_dir, "FocalSV_Final_SV.vcf")


def _expected(dtype: str) -> str:
    with open(os.path.join(GOLDEN, dtype.lower(), "expected.vcf")) as f:
        return f.read()


@pytest.mark.parametrize("dtype", ["HIFI", "CLR", "ONT"])
def test_golden_host_byte_exact(dtype, tmp_path):
    out = _run(dtype, str(tmp_path / "host"), "host")
    with open(out) as f:
        got = f.read()
    assert got == _expected(dtype), \
        f"{dtype} pipeline output drifted from committed golden VCF"


def test_golden_device_byte_exact(tmp_path):
    """The production device path must reproduce the same final VCF
    byte-for-byte (bit-parity contract, here enforced against truth)."""
    out = _run("HIFI", str(tmp_path / "dev"), "device")
    with open(out) as f:
        got = f.read()
    assert got == _expected("HIFI"), \
        "device-path output drifted from golden VCF"
