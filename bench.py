"""Benchmark: end-to-end region-processing throughput (regions/sec/chip).

Per BASELINE.md the reference publishes no runtime numbers; its metric is
*target regions/sec/chip* vs the 8-thread CPU pipeline.  The reference CPU
pipeline (longshot + hifiasm + minimap2 per region, `--num_threads 8`)
processes on the order of 0.1 regions/s on ~30 kb HiFi regions (hifiasm
dominates); that documented estimate is the vs_baseline denominator until the
reference stack can be timed directly (its binaries are not in this image).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import sys
import time


REFERENCE_REGIONS_PER_SEC = 0.1  # documented estimate, see module docstring


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--regions", type=int, default=32)
    ap.add_argument("--ref-len", type=int, default=30_000)
    ap.add_argument("--coverage", type=float, default=20.0)
    ap.add_argument("--dtype", default="HIFI")
    ap.add_argument("--workers", type=int, default=16)
    args = ap.parse_args()

    import jax
    # persistent compile cache: TPU XLA compiles dominate cold-start time
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from focalsv_tpu.config import preset
    from focalsv_tpu.pipeline.region import process_region
    from focalsv_tpu.testing import simulate as sim

    cfg = preset(args.dtype)

    # pre-simulate inputs (not part of the timed section)
    regions = [
        sim.simulate_region(seed=1000 + i, ref_len=args.ref_len,
                            coverage=args.coverage, n_snps=25)
        for i in range(args.regions)
    ]

    # warmup: compile the DP kernels on one region
    r0 = regions[0]
    process_region(r0.reads, r0.ref, 0, r0.chrom, cfg)

    from concurrent.futures import ThreadPoolExecutor

    # NOTE: the DP batching executor (parallel/batch_executor.py) measured
    # SLOWER here: with <128 concurrent heterogeneous jobs, its single
    # dispatcher serializes device calls that otherwise overlap in-flight
    # across threads.  It stays opt-in for homogeneous bulk workloads.
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=args.workers) as ex:
        results = list(ex.map(
            lambda rg: process_region(rg.reads, rg.ref, 0, rg.chrom, cfg),
            regions))
    n_records = sum(len(r.records) for r in results)
    dt = time.perf_counter() - t0

    rps = args.regions / dt
    print(json.dumps({
        "metric": "regions_per_sec_per_chip",
        "value": round(rps, 3),
        "unit": "regions/s",
        "vs_baseline": round(rps / REFERENCE_REGIONS_PER_SEC, 2),
    }))
    print(f"# {args.regions} regions in {dt:.2f}s, {n_records} SV records",
          file=sys.stderr)


if __name__ == "__main__":
    main()
