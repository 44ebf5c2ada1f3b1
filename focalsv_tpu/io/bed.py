"""BED region I/O and per-chromosome splitting.

Mirrors the reference CLI contracts: target BEDs of (chrom, start, end) rows
(focalsv/focalsv.py:52-64 split_bed/extract_bed) and the step-0 output BED
(0_define_region.py dict2bed :416-423).
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class Region:
    chrom: str
    start: int
    end: int

    @property
    def span(self) -> int:
        return self.end - self.start

    def name(self) -> str:
        """Directory-style region name, mirrors Region_chr*_S*_E* layout."""
        return f"Region_{self.chrom}_S{self.start}_E{self.end}"


def read_bed(path: str) -> list[Region]:
    opener = gzip.open if str(path).endswith(".gz") else open
    out: list[Region] = []
    with opener(path, "rt") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(("#", "track", "browser")):
                continue
            parts = line.split()
            out.append(Region(parts[0], int(float(parts[1])), int(float(parts[2]))))
    return out


def write_bed(path: str, regions: list[Region]) -> None:
    with open(path, "w") as f:
        for r in regions:
            f.write(f"{r.chrom}\t{int(r.start)}\t{int(r.end)}\n")


def split_by_chrom(regions: list[Region]) -> dict[str, list[Region]]:
    out: dict[str, list[Region]] = {}
    for r in regions:
        out.setdefault(r.chrom, []).append(r)
    return out


def regions_to_array(regions: list[Region], chrom_ids: dict[str, int]) -> np.ndarray:
    """(n, 3) int64 array of (chrom_id, start, end) for device-side interval ops."""
    return np.array(
        [[chrom_ids[r.chrom], r.start, r.end] for r in regions], dtype=np.int64
    ).reshape(-1, 3)
