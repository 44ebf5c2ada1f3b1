"""SAM text format interop (read + write), for debugging and tool exchange."""

from __future__ import annotations

import numpy as np

from focalsv_tpu.io import bam as bamio
from focalsv_tpu.ops import encode as enc


def record_to_sam_line(rec: bamio.BamRecord, ref_names: list[str]) -> str:
    rname = ref_names[rec.ref_id] if 0 <= rec.ref_id < len(ref_names) else "*"
    seq = enc.decode(rec.seq) if rec.seq.shape[0] else "*"
    qual = ("".join(chr(min(q, 93) + 33) for q in rec.qual)
            if rec.qual.shape[0] and rec.qual[0] != 0xFF else "*")
    tags = []
    for k, v in rec.tags.items():
        if isinstance(v, int):
            tags.append(f"{k}:i:{v}")
        elif isinstance(v, float):
            tags.append(f"{k}:f:{v}")
        else:
            tags.append(f"{k}:Z:{v}")
    fields = [rec.name, str(rec.flag), rname, str(rec.pos + 1), str(rec.mapq),
              rec.cigar_string() or "*", "*", "0", str(rec.tlen), seq, qual]
    return "\t".join(fields + tags)


def write_sam(path: str, records: list[bamio.BamRecord],
              ref_names: list[str], ref_lens: list[int]) -> None:
    with open(path, "w") as f:
        f.write("@HD\tVN:1.6\tSO:coordinate\n")
        for n, l in zip(ref_names, ref_lens):
            f.write(f"@SQ\tSN:{n}\tLN:{l}\n")
        for rec in records:
            f.write(record_to_sam_line(rec, ref_names) + "\n")


def parse_sam_line(line: str, ref_ids: dict[str, int]) -> bamio.BamRecord:
    p = line.rstrip("\n").split("\t")
    tags: dict = {}
    for t in p[11:]:
        k, typ, v = t.split(":", 2)
        if typ == "i":
            tags[k] = int(v)
        elif typ == "f":
            tags[k] = float(v)
        else:
            tags[k] = v
    seq = enc.encode(p[9]) if p[9] != "*" else np.zeros(0, np.uint8)
    qual = (np.frombuffer(p[10].encode(), np.uint8) - 33
            if p[10] != "*" else np.full(len(seq), 0xFF, np.uint8))
    return bamio.BamRecord(
        name=p[0], flag=int(p[1]),
        ref_id=ref_ids.get(p[2], -1), pos=int(p[3]) - 1, mapq=int(p[4]),
        cigar=bamio.parse_cigar_string(p[5]),
        seq=seq, qual=np.asarray(qual, np.uint8).copy(), tags=tags)


def read_sam(path: str) -> tuple[list[str], list[int], list[bamio.BamRecord]]:
    ref_names: list[str] = []
    ref_lens: list[int] = []
    records: list[bamio.BamRecord] = []
    ref_ids: dict[str, int] = {}
    with open(path) as f:
        for line in f:
            if line.startswith("@"):
                if line.startswith("@SQ"):
                    fields = dict(x.split(":", 1) for x in line.split("\t")[1:]
                                  if ":" in x)
                    ref_ids[fields["SN"]] = len(ref_names)
                    ref_names.append(fields["SN"])
                    ref_lens.append(int(fields["LN"].strip()))
                continue
            records.append(parse_sam_line(line, ref_ids))
    return ref_names, ref_lens, records
