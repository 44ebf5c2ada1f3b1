"""VCF reading/writing with the FocalSV-compatible header and INFO semantics.

The header template and INFO fields (SVTYPE/SVLEN/TIG_REGION/QUERY_STRAND/
SIG_SOURCE/TIG_MAPQ/CollapseId, FORMAT GT) mirror the reference's
``Dippav/header:1-11`` so downstream consumers (Truvari etc.) see identical
semantics.  Sorting + merging replaces the reference's `vcf-sort` / grep-cat
merge (focalsv/focalsv.py:66-70).
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass, field, replace

FOCALSV_HEADER_LINES = [
    "##fileformat=VCFv4.2",
    "##source=FocalSV-TPU",
    '##FILTER=<ID=PASS,Description="All filters passed">',
    '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="Type of SV:DEL=Deletion, '
    'TRA=Translocation, INS=Insertion, DUP=Duplication, INV=Inversion">',
    '##INFO=<ID=SVLEN,Number=.,Type=Integer,Description="Difference in length '
    'between REF and ALT alleles">',
    '##INFO=<ID=END,Number=1,Type=Integer,Description="End position of the variant">',
    '##INFO=<ID=TIG_REGION,Number=.,Type=String,Description="Contig region where '
    'variant was found (one per alt with h1 before h2 for homozygous calls)">',
    '##INFO=<ID=QUERY_STRAND,Number=.,Type=String,Description="Strand of variant '
    'in the contig relative to the reference (order follows TIG_REGION)">',
    '##INFO=<ID=SIG_SOURCE,Number=.,Type=String,Description="Source of the variant '
    'call signature (order follows TIG_REGION)">',
    '##INFO=<ID=TIG_MAPQ,Number=.,Type=String,Description="Mapping quality of the '
    'contigs (order follows TIG_REGION)">',
    '##INFO=<ID=CollapseId,Number=1,Type=Integer,Description="collapse match ID">',
    '##INFO=<ID=SUPPORT,Number=1,Type=Integer,Description="Read signature support">',
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
]

COLUMNS = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tSAMPLE"


@dataclass
class VcfRecord:
    chrom: str
    pos: int  # 1-based, VCF convention
    id: str
    ref: str
    alt: str
    qual: str = "."
    filter: str = "PASS"
    info: dict = field(default_factory=dict)
    gt: str = "./."

    @property
    def svtype(self) -> str:
        return str(self.info.get("SVTYPE", ""))

    @property
    def svlen(self) -> int:
        v = self.info.get("SVLEN")
        if v is None:
            return abs(len(self.alt) - len(self.ref))
        return abs(int(v))

    @property
    def end(self) -> int:
        v = self.info.get("END")
        if v is not None:
            return int(v)
        if self.svtype == "DEL":
            return self.pos + self.svlen
        return self.pos

    def with_info(self, **kw) -> "VcfRecord":
        info = dict(self.info)
        info.update(kw)
        return replace(self, info=info)

    def format_info(self) -> str:
        if not self.info:
            return "."
        parts = []
        for k, v in self.info.items():
            if v is True:
                parts.append(k)
            else:
                parts.append(f"{k}={v}")
        return ";".join(parts)

    def to_line(self) -> str:
        return (
            f"{self.chrom}\t{self.pos}\t{self.id}\t{self.ref}\t{self.alt}\t"
            f"{self.qual}\t{self.filter}\t{self.format_info()}\tGT\t{self.gt}"
        )


def _parse_info(s: str) -> dict:
    info: dict = {}
    if s == ".":
        return info
    for part in s.split(";"):
        if "=" in part:
            k, v = part.split("=", 1)
            info[k] = v
        elif part:
            info[part] = True
    return info


def parse_line(line: str) -> VcfRecord | None:
    """One VCF body line -> VcfRecord (None for malformed/short lines)."""
    p = line.split("\t")
    if len(p) < 5:
        return None
    gt = "./."
    if len(p) >= 10:
        gt = p[9].split(":")[0]
    return VcfRecord(
        chrom=p[0],
        pos=int(p[1]),
        id=p[2],
        ref=p[3],
        alt=p[4],
        qual=p[5] if len(p) > 5 else ".",
        filter=p[6] if len(p) > 6 else ".",
        info=_parse_info(p[7]) if len(p) > 7 else {},
        gt=gt,
    )


def read_vcf(path: str) -> tuple[list[str], list[VcfRecord]]:
    """Returns (header_lines, records)."""
    opener = gzip.open if str(path).endswith(".gz") else open
    header: list[str] = []
    records: list[VcfRecord] = []
    with opener(path, "rt") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            if line.startswith("#"):
                header.append(line)
                continue
            rec = parse_line(line)
            if rec is not None:
                records.append(rec)
    return header, records


def _chrom_key(chrom: str):
    c = chrom[3:] if chrom.startswith("chr") else chrom
    if c.isdigit():
        return (0, int(c), "")
    return (1, 0, c)


def sort_records(records: list[VcfRecord]) -> list[VcfRecord]:
    """Coordinate sort (replaces perl vcf-sort)."""
    return sorted(records, key=lambda r: (_chrom_key(r.chrom), r.pos))


def write_vcf(
    path: str,
    records: list[VcfRecord],
    contigs: dict[str, int] | None = None,
    sample: str = "SAMPLE",
    extra_header: list[str] | None = None,
) -> None:
    with open(path, "w") as f:
        for line in FOCALSV_HEADER_LINES:
            f.write(line + "\n")
        if contigs:
            for name, length in contigs.items():
                f.write(f"##contig=<ID={name},length={length}>\n")
        for line in extra_header or []:
            f.write(line + "\n")
        f.write(COLUMNS.replace("SAMPLE", sample) + "\n")
        for rec in sort_records(records):
            f.write(rec.to_line() + "\n")


def merge_vcfs(paths: list[str], out_path: str, contigs: dict[str, int] | None = None) -> int:
    """Concatenate per-chromosome VCFs and coordinate-sort into one file
    (replaces focalsv.py:66-70 grep-'#' + cat + vcf-sort)."""
    all_records: list[VcfRecord] = []
    for p in paths:
        _, recs = read_vcf(p)
        all_records.extend(recs)
    write_vcf(out_path, all_records, contigs=contigs)
    return len(all_records)
