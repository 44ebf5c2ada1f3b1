"""Benchmark: end-to-end region-processing throughput (regions/sec/chip).

Per BASELINE.md the reference publishes no runtime numbers; its metric is
*target regions/sec/chip* vs the 8-thread CPU pipeline.  The reference CPU
pipeline (longshot + hifiasm + minimap2 per region, `--num_threads 8`)
processes on the order of 0.1 regions/s on ~30 kb HiFi regions (hifiasm
dominates); that documented estimate is the vs_baseline denominator until the
reference stack can be timed directly (its binaries are not in this image).

"Per chip" means one chip plus its host: regions are embarrassingly parallel
(the reference's joblib axis), so the host's cores each run the region stack
and the chip serves the large-DP kernels.  Worker startup/compile and input
simulation are excluded from the timed section; reading each region's BAM
from disk is *included* (the reference's per-region stack also starts from a
cropped region BAM, 2_phasing/longshot.py:20).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import os
import sys
import tempfile
import time


REFERENCE_REGIONS_PER_SEC = 0.1  # documented estimate, see module docstring

_cfg = None


def _child_init(dtype: str):
    """Worker startup (untimed): import, config, compile/warm the kernels."""
    global _cfg
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from focalsv_tpu.config import preset
    from focalsv_tpu.pipeline.region import process_region
    from focalsv_tpu.testing import simulate as sim
    _cfg = preset(dtype)
    r = sim.simulate_region(seed=999, ref_len=4000, coverage=10.0, n_snps=6)
    process_region(r.reads, r.ref, 0, r.chrom, _cfg)


def _child_run(job) -> int:
    """One region, from its on-disk BAM + ref (the real pipeline data path)."""
    import numpy as np
    from focalsv_tpu.io.bam import BamReader
    from focalsv_tpu.pipeline.region import process_region
    bam_path, ref_path, chrom = job
    reads = list(BamReader(bam_path))
    ref = np.load(ref_path)
    res = process_region(reads, ref, 0, chrom, _cfg)
    return len(res.records)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--regions", type=int, default=32)
    ap.add_argument("--ref-len", type=int, default=30_000)
    ap.add_argument("--coverage", type=float, default=20.0)
    ap.add_argument("--dtype", default="HIFI")
    ap.add_argument("--procs", type=int, default=min(os.cpu_count() or 1, 8),
                    help="worker processes (region data parallelism)")
    args = ap.parse_args()

    import numpy as np
    from focalsv_tpu.testing import simulate as sim

    # pre-simulate inputs to disk (not part of the timed section): one
    # region BAM + reference window per region, the crop-step layout
    tmp = tempfile.mkdtemp(prefix="focalsv_bench_")
    jobs = []
    for i in range(args.regions):
        r = sim.simulate_region(seed=1000 + i, ref_len=args.ref_len,
                                coverage=args.coverage, n_snps=25)
        bam = os.path.join(tmp, f"region_{i}.bam")
        ref = os.path.join(tmp, f"region_{i}.ref.npy")
        sim.write_region_bam(r, bam)
        np.save(ref, r.ref)
        jobs.append((bam, ref, r.chrom))

    if args.procs > 1:
        # NOTE: thread pools measured SLOWER than serial here once small DPs
        # moved to the native host kernel (the region stack became GIL-bound
        # host work); processes are the correct joblib-analog axis.
        import multiprocessing as mp
        ctx = mp.get_context("spawn")
        with ctx.Pool(args.procs, initializer=_child_init,
                      initargs=(args.dtype,)) as pool:
            # force every worker through its (untimed) init before timing
            pool.map(_noop, range(args.procs * 4))
            t0 = time.perf_counter()
            counts = pool.map(_child_run, jobs, chunksize=1)
            dt = time.perf_counter() - t0
        n_records = sum(counts)
    else:
        _child_init(args.dtype)
        t0 = time.perf_counter()
        counts = [_child_run(j) for j in jobs]
        dt = time.perf_counter() - t0
        n_records = sum(counts)

    rps = args.regions / dt
    print(json.dumps({
        "metric": "regions_per_sec_per_chip",
        "value": round(rps, 3),
        "unit": "regions/s",
        "vs_baseline": round(rps / REFERENCE_REGIONS_PER_SEC, 2),
    }))
    print(f"# {args.regions} regions in {dt:.2f}s, {n_records} SV records, "
          f"{args.procs} procs", file=sys.stderr)


def _noop(_):
    return None


if __name__ == "__main__":
    main()
