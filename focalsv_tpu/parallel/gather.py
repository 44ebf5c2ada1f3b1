"""Collective SV-record gather: device all_gather instead of file merge.

The reference's multi-node story is "one SLURM job per chromosome into a
shared out_dir, then `cat | vcf-sort`" (README.md:207-213, focalsv.py:66-70)
-- the filesystem as the all-gather fabric.  Here the gather point rides the
accelerator interconnect: each host serializes its shard's VCF records into
fixed-width uint8 payload rows, the rows are all_gathered across processes
via device collectives (`jax.experimental.multihost_utils` -- ICI within a
slice, DCN across hosts), and host 0 decodes, cross-shard-dedups once, and
writes the genome-wide VCF.  SURVEY.md section 2.3's TPU-native equivalent.

Record encoding: one UTF-8 VCF body line per record, padded to the global
max line length (INS records carry their full ALT sequence, so the padding
target is data-dependent; a first tiny all_gather agrees on [count, width]).
"""

from __future__ import annotations

import numpy as np

from focalsv_tpu.io.vcf import VcfRecord, parse_line
from focalsv_tpu.utils.logging import get_logger

logger = get_logger("gather")


def encode_records(records: list[VcfRecord]) -> tuple[np.ndarray, int]:
    """Records -> (N, W) uint8 payload of padded VCF body lines."""
    lines = [r.to_line().encode() for r in records]
    width = max((len(b) for b in lines), default=1)
    out = np.zeros((len(lines), width), np.uint8)
    for i, b in enumerate(lines):
        out[i, : len(b)] = np.frombuffer(b, np.uint8)
    return out, width


def decode_records(payload: np.ndarray) -> list[VcfRecord]:
    """(N, W) uint8 padded lines -> records (zero-padding stripped)."""
    out: list[VcfRecord] = []
    for row in payload:
        line = bytes(row[row != 0]).decode(errors="replace").strip()
        if not line:
            continue
        rec = parse_line(line)
        if rec is not None:
            out.append(rec)
    return out


def allgather_records(records: list[VcfRecord]) -> list[VcfRecord]:
    """All hosts' records, gathered over device collectives.

    Every participating jax process must call this (it is a collective).
    Returns the concatenated global record list on every host, ordered by
    process index.  Single-process: returns ``records`` unchanged.
    """
    import jax
    if jax.process_count() <= 1:
        return list(records)
    from jax.experimental import multihost_utils

    payload, width = encode_records(records)
    # round 1: agree on the global (max count, max width)
    dims = np.array([payload.shape[0], width], np.int64)
    all_dims = np.asarray(multihost_utils.process_allgather(dims))
    n_max = int(all_dims[:, 0].max())
    w_max = int(all_dims[:, 1].max())
    # round 2: the padded payload itself
    padded = np.zeros((max(n_max, 1), w_max), np.uint8)
    if payload.size:
        padded[: payload.shape[0], : payload.shape[1]] = payload
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    out: list[VcfRecord] = []
    for p in range(gathered.shape[0]):
        n_p = int(all_dims[p, 0])
        out.extend(decode_records(gathered[p, :n_p]))
    return out
