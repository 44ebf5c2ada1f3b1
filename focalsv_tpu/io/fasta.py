"""FASTA reading/writing with .fai-style random access.

Replaces the reference's `samtools faidx` usage (e.g.
Dippav/DipPAV_variant_call.py:27-49 extracts one chromosome's reference) with
an in-process indexed reader returning uint8 code arrays.
"""

from __future__ import annotations

import gzip
import os
from dataclasses import dataclass

import numpy as np

from focalsv_tpu.ops import encode as enc


def _open(path: str, mode: str = "rt"):
    if str(path).endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


@dataclass
class FastaFile:
    """Indexed FASTA: sequences held as uint8 code arrays keyed by name."""

    names: list[str]
    seqs: dict[str, np.ndarray]

    @classmethod
    def load(cls, path: str) -> "FastaFile":
        names: list[str] = []
        seqs: dict[str, np.ndarray] = {}
        cur = None
        chunks: list[bytes] = []
        opener = gzip.open if str(path).endswith(".gz") else open
        with opener(path, "rb") as f:
            for line in f:
                if line.startswith(b">"):
                    if cur is not None:
                        seqs[cur] = enc.encode(b"".join(chunks))
                    cur = line[1:].split()[0].decode()
                    names.append(cur)
                    chunks = []
                else:
                    chunks.append(line.strip())
        if cur is not None:
            seqs[cur] = enc.encode(b"".join(chunks))
        return cls(names=names, seqs=seqs)

    def fetch(self, name: str, start: int | None = None, end: int | None = None) -> np.ndarray:
        s = self.seqs[name]
        if start is None:
            return s
        start = max(0, int(start))
        end = len(s) if end is None else min(len(s), int(end))
        return s[start:end]

    def lengths(self) -> dict[str, int]:
        return {n: len(self.seqs[n]) for n in self.names}

    def __contains__(self, name: str) -> bool:
        return name in self.seqs


def write_fasta(path: str, records: list[tuple[str, np.ndarray | str]], width: int = 60) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        for name, seq in records:
            if not isinstance(seq, str):
                seq = enc.decode(seq)
            f.write(f">{name}\n")
            for i in range(0, len(seq), width):
                f.write(seq[i : i + width] + "\n")
