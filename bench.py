"""Benchmark: end-to-end region-processing throughput (regions/sec/chip).

Per BASELINE.md the reference publishes no runtime numbers; its metric is
*target regions/sec/chip* vs an 8-thread CPU pipeline.  The reference stack
itself CANNOT run in this image (its Python layer imports pysam/edlib/cigar,
none of which are installed, and the hifiasm/longshot/minimap2 binaries are
absent), so the baseline is MEASURED here as the strongest available CPU
pipeline: this framework's own host execution mode (numpy + native C++ DP
kernels) run under JAX_PLATFORMS=cpu with 8 workers on the identical region
set.  That host path is itself far faster than the reference's
Python+subprocess stack (which shells out one longshot + hifiasm + minimap2
process per region), so the reported vs_baseline is a conservative LOWER
bound on the speedup over the actual reference pipeline.

The measured number is the production device path: bucketized pileup tiles
-> one compiled phasing+consensus dispatch per bucket -> host finish with
cross-thread DP batching onto the chip (pipeline/device_exec.py) -- the same
code path `focalsv-tpu` runs.  Reading each region's BAM from disk is
*included* in the timed section for both modes (the reference's per-region
stack also starts from a cropped region BAM, 2_phasing/longshot.py:20).

Workload: 256 regions with a realistic size mix (FocalSV auto regions are
signature clusters +-7 kb flank, target BEDs are bench SVs +-50 kb:
0_define_region.py:462, target_sv/run.sh:5-6), 30x coverage.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} -- value
and vs_baseline are MEDIANS over --repeats device passes and --base-repeats
baseline passes (both spreads are embedded in the JSON: the tunneled device
and the 2-core host both show ~+-30% run-to-run variance, so single best-of
numbers mislead) -- plus a commented stage breakdown.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

# size mix cycled over regions: auto-mode cluster regions (~15-40 kb) and
# target-mode SV +-50 kb windows
SIZE_MIX = (15_000, 30_000, 50_000, 100_000)


def _load_job(job):
    import numpy as np

    from focalsv_tpu.io.bam import BamReader
    bam_path, ref_path, chrom = job
    reads = list(BamReader(bam_path))
    ref = np.load(ref_path)
    return reads, ref, chrom


def _spread(times: list[float]) -> dict:
    ts = sorted(times)
    return {"median": round(ts[len(ts) // 2], 3),
            "min": round(ts[0], 3), "max": round(ts[-1], 3),
            "n_passes": len(ts)}


def run_device_mode_mp(jobs, cfg, n_children: int, repeats: int = 5,
                       mesh=None):
    """The production path with the multi-process host pipeline
    (pipeline/mp_exec.py): worker processes build tiles and finish regions
    GIL-free; the parent owns the device.

    Returns (pass_seconds list, n_records, stats of the median pass)."""
    from focalsv_tpu.pipeline.mp_exec import MpRegionExecutor

    passes = []
    with MpRegionExecutor(cfg, n_children=n_children, mesh=mesh) as ex:
        t0 = time.perf_counter()
        ex.run(jobs, collect="count")      # compiles + warms every bucket
        cold_s = time.perf_counter() - t0
        for _ in range(repeats):
            stats = {}
            t0 = time.perf_counter()
            out = ex.run(jobs, collect="count", stats=stats)
            dt = time.perf_counter() - t0
            n_records = sum(n for n, _ in out)
            passes.append((dt, n_records, stats))
    passes.sort(key=lambda p: p[0])
    med = passes[len(passes) // 2]
    med[2]["cold_s"] = cold_s
    return [p[0] for p in passes], med[1], med[2]


def run_device_mode(jobs, cfg, workers: int, repeats: int = 2):
    """The production path: tile -> device batch -> host finish.

    Returns (seconds, n_records, stats dict with the stage breakdown)."""
    from concurrent.futures import ThreadPoolExecutor

    from focalsv_tpu.pipeline import device_exec as dx
    from focalsv_tpu.pipeline.main import _dp_batching_enabled

    def one_pass(stats=None):
        import contextlib

        # the production streaming pipeline: tile builds, device dispatches,
        # decodes and per-region finishes all overlap
        def mk_job(j):
            return lambda: (lambda r, f, c: dx.build_tile(r, f, 0, c, cfg))(
                *_load_job(j))

        def finish(i, tile, dev):
            return dx.process_region_device(tile, dev, cfg)

        ctx = contextlib.nullcontext()
        if _dp_batching_enabled(cfg):
            from focalsv_tpu.parallel.batch_executor import dp_batching
            ctx = dp_batching()
        with ctx, ThreadPoolExecutor(workers) as ex:
            res = dx.streamed_map(ex, [mk_job(j) for j in jobs], cfg, finish,
                                  stats=stats)
        return sum(len(r.records) for r in res)

    t0 = time.perf_counter()
    one_pass()                      # compiles + warms every bucket
    cold_s = time.perf_counter() - t0
    # best-of-N timed passes: the tunneled test device shows large
    # run-to-run session variance (grant queueing, remote relay load);
    # every pass processes the full region set, so the best pass is an
    # honest end-to-end number, not a partial measurement
    best = None
    for _ in range(repeats):
        stats = {}
        t0 = time.perf_counter()
        n_records = one_pass(stats)
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, n_records, stats)
    best[2]["cold_s"] = cold_s
    return best


def measure_kernel_compute(jobs, cfg):
    """Pure device-compute time of the production phasing+consensus kernel,
    measured transfer-free: the kernel body runs K times inside ONE
    compiled lax.fori_loop dispatch (iterations serialized by a data
    dependency), so the (K-1) marginal iterations contain zero h2d/d2h and
    zero per-call RPC latency -- the tunneled link makes naive per-call
    timing unusable (block_until_ready does not flush it).

    Returns {"kernel_ms_per_batch", "gcells_per_s", "shape"} for the
    largest bucket in the workload, or None."""
    import jax
    import jax.numpy as jnp

    from focalsv_tpu.parallel import region_step as rs
    from focalsv_tpu.pipeline import device_exec as dx

    # build tiles for ONE chunk of the largest bucket
    tiles, keys = [], []
    for j in jobs:
        reads, ref, chrom = _load_job(j)
        t = dx.build_tile(reads, ref, 0, chrom, cfg)
        k = dx._bucket_key(t, cfg)
        if k is not None:
            tiles.append(t)
            keys.append(k)
    if not tiles:
        return None
    key = max(set(keys), key=lambda k: (k[2], keys.count(k)))
    idxs = [i for i, k in enumerate(keys) if k == key][:8]
    G = len(idxs)
    kw = rs.phase_consensus_kwargs(cfg.phasing)
    if key[0] != "delta":
        return None
    kw["Drle"] = dx.drle_of(key)      # the production result encoding
    _, Rp, Lp, Ds, Dd = key
    buf = rs.pack_delta_chunk(tiles, idxs, G, Rp, Lp, Ds, Dd)

    lay = rs.delta_flat_layout(G, Rp, Lp, Ds, Dd)

    def make_run_k(K: int):
        def one_pass(b):
            return rs.phase_consensus_delta_flat.__wrapped__(
                b, G=G, R=Rp, L=Lp, Ds=Ds, Dd=Dd, **kw)

        def body(_, carry):
            b, acc = carry
            out = one_pass(b)
            # loop-carried data dependency so XLA cannot hoist the kernel
            # out of the loop.  The written byte is the last region's last
            # sub_sym slot -- padding unless that tile's substitution count
            # exactly fills its pow2 bucket, and even then the perturbation
            # cannot bias the TIMING: every op in the kernel is
            # fixed-shape, so runtime is data-independent.
            b = b.at[lay["sub_sym"][1] - 1].set(out[0, 0])
            return b, acc + out[0, 0].astype(jnp.int32)

        # jit ONCE per K: rebuilding the jitted callable per rep would
        # re-trace and re-compile, timing compilation instead of compute
        return jax.jit(lambda b: jax.lax.fori_loop(
            0, K, body, (b, jnp.int32(0)))[1])

    t_of = {}
    for K in (1, 5):
        f = make_run_k(K)
        _ = int(f(buf))                  # warm (compile)
        best = None
        for _rep in range(3):            # tunnel load varies: best-of-3
            t0 = time.perf_counter()
            _ = int(f(buf))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        t_of[K] = best
    per_iter = max((t_of[5] - t_of[1]) / 4, 1e-6)
    cells = G * Rp * Lp
    return {
        "kernel_ms_per_batch": round(per_iter * 1e3, 2),
        "gcells_per_s": round(cells / per_iter / 1e9, 1),
        "shape": list(key),
        "G": G,
    }


def run_host_mode(jobs, cfg, workers: int,
                  repeats: int = 3) -> tuple[list[float], int]:
    """The CPU baseline: per-region host numpy/native path on a thread pool
    (numpy + the native DP kernel release the GIL).

    Returns (per-pass seconds, n_records): single numbers hide the +-30%
    run-to-run spread of a 2-core host under GIL contention, so the
    baseline reports the same median/min/max the device side does."""
    import dataclasses as _dc

    from concurrent.futures import ThreadPoolExecutor

    from focalsv_tpu.pipeline.region import process_region
    hcfg = cfg.replace(execution=_dc.replace(cfg.execution, mode="host"))

    def one(job):
        reads, ref, chrom = _load_job(job)
        return len(process_region(reads, ref, 0, chrom, hcfg).records)

    one(jobs[0])                    # untimed warmup
    times = []
    n_records = 0
    for _ in range(repeats):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(workers) as ex:
            counts = list(ex.map(one, jobs))
        times.append(time.perf_counter() - t0)
        n_records = sum(counts)
    return times, n_records


def _make_jobs(tmp, n_regions, coverage, ref_len=None):
    import numpy as np

    from focalsv_tpu.testing import simulate as sim
    jobs = []
    for i in range(n_regions):
        L = ref_len if ref_len else SIZE_MIX[i % len(SIZE_MIX)]
        bam = os.path.join(tmp, f"region_{i}_{L}.bam")
        ref = os.path.join(tmp, f"region_{i}_{L}.ref.npy")
        if not (os.path.exists(bam) and os.path.exists(ref)):
            r = sim.simulate_region(seed=1000 + i, ref_len=L,
                                    coverage=coverage,
                                    n_snps=max(10, L // 1200))
            sim.write_region_bam(r, bam)
            np.save(ref, r.ref)
        jobs.append((bam, ref, "chr21"))
    return jobs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--regions", type=int, default=256)
    ap.add_argument("--ref-len", type=int, default=None,
                    help="fixed region size (default: realistic size mix)")
    ap.add_argument("--coverage", type=float, default=30.0)
    ap.add_argument("--dtype", default="HIFI")
    ap.add_argument("--mode", default="device", choices=["device", "host"])
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--mesh", default=None, metavar="NxM",
                    help="run the device step sharded over an NxM "
                         "{hosts x chips} mesh (one flat 'regions' axis of "
                         "N*M devices).  Ready-to-run pod driver: on a "
                         "multi-host slice, start one process per host "
                         "with jax.distributed initialized (e.g. via "
                         "JAX_COORDINATOR_ADDRESS / launcher env) and "
                         "pass the full slice shape; single-host multi-"
                         "chip needs no setup.  Chunks batch-pad to the "
                         "mesh size; per-chip throughput = value / chips.")
    ap.add_argument("--mp", type=int, default=3, metavar="N",
                    help="device mode: N host worker processes (mp_exec); "
                         "0 = single-process thread pipeline")
    ap.add_argument("--repeats", type=int, default=5,
                    help="timed device passes; median is reported")
    ap.add_argument("--base-repeats", type=int, default=3,
                    help="timed baseline passes; median is reported")
    ap.add_argument("--json-only", action="store_true",
                    help="print only the JSON line (baseline subprocess)")
    ap.add_argument("--jobs-dir", default=None,
                    help="reuse pre-simulated region inputs from this dir")
    args = ap.parse_args()

    if os.environ.get("FOCALSV_FORCE_CPU"):
        # the image's sitecustomize pins the axon TPU platform regardless
        # of JAX_PLATFORMS; this is the escape hatch (virtual-mesh runs)
        import jax
        jax.config.update("jax_platforms", "cpu")

    from focalsv_tpu.config import preset

    cfg = preset(args.dtype)

    # pre-simulate inputs to disk (not part of the timed section): one
    # region BAM + reference window per region, the crop-step layout
    tmp = args.jobs_dir or os.path.join(
        tempfile.gettempdir(),
        f"focalsv_bench_r{args.regions}_c{int(args.coverage)}"
        f"_l{args.ref_len or 'mix'}")
    os.makedirs(tmp, exist_ok=True)
    jobs = _make_jobs(tmp, args.regions, args.coverage, args.ref_len)

    if args.mode == "host":
        times, n_records = run_host_mode(jobs, cfg, args.workers,
                                         repeats=args.base_repeats)
        rps = [args.regions / t for t in times]
        print(json.dumps({"metric": "baseline_regions_per_sec",
                          "value": _spread(rps)["median"],
                          "unit": "regions/s", "vs_baseline": 1.0,
                          "spread": _spread(rps)}))
        if not args.json_only:
            print(f"# host mode: {args.regions} regions, passes "
                  f"{[round(t, 2) for t in times]}s, "
                  f"{n_records} records", file=sys.stderr)
        return

    # measure the CPU baseline in a clean subprocess (forced CPU backend)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    base_cmd = [sys.executable, os.path.abspath(__file__), "--mode", "host",
                "--regions", str(args.regions),
                "--coverage", str(args.coverage), "--dtype", args.dtype,
                "--workers", str(args.workers), "--json-only",
                "--base-repeats", str(args.base_repeats),
                "--jobs-dir", tmp]
    if args.ref_len:
        base_cmd += ["--ref-len", str(args.ref_len)]
    base = subprocess.run(base_cmd, env=env, capture_output=True, text=True,
                          timeout=3600)
    baseline_rps = None
    baseline_spread = None
    for line in base.stdout.splitlines():
        try:
            d = json.loads(line)
            baseline_rps = float(d["value"])
            baseline_spread = d.get("spread")
        except (json.JSONDecodeError, KeyError):
            continue

    mesh = None
    n_chips = 1
    if args.mesh:
        import jax

        from focalsv_tpu.parallel.mesh import make_mesh
        dims = [int(x) for x in args.mesh.lower().split("x")]
        n_chips = 1
        for d in dims:
            n_chips *= d
        avail = len(jax.devices())
        if n_chips > avail:
            print(f"# --mesh {args.mesh} needs {n_chips} devices, "
                  f"only {avail} visible -- set "
                  f"XLA_FLAGS=--xla_force_host_platform_device_count or "
                  f"run on the pod slice", file=sys.stderr)
            sys.exit(2)
        mesh = make_mesh(n_chips)

    if args.mp:
        pass_s, n_records, st = run_device_mode_mp(jobs, cfg, args.mp,
                                                   repeats=args.repeats,
                                                   mesh=mesh)
    else:
        dt_best, n_records, st = run_device_mode(jobs, cfg, args.workers,
                                                 repeats=args.repeats)
        pass_s = [dt_best]
    rps_passes = [args.regions / t for t in pass_s]
    dev_spread = _spread(rps_passes)
    rps = dev_spread["median"]
    dt = args.regions / rps
    vs = round(rps / baseline_rps, 3) if baseline_rps else None
    out = {
        "metric": "regions_per_sec_per_chip",
        "value": round(rps / n_chips, 3),
        "unit": "regions/s",
        "vs_baseline": vs,
        "device": dev_spread,
        "baseline": baseline_spread or {"median": baseline_rps},
        "cold_start_s": round(st.get("cold_s", 0), 1),
    }
    if mesh is not None:
        out["mesh"] = args.mesh
        out["regions_per_sec_all_chips"] = rps
    print(json.dumps(out))
    busy_frac = min(1.0, st.get("device_busy_s", 0.0) / dt) if dt else 0.0
    print(f"# device mode: {args.regions} regions in {dt:.2f}s "
          f"({n_records} records); stage thread-seconds: "
          f"tile_build={st.get('tile_build_s', 0):.2f} "
          f"device_wait={st.get('device_wait_s', 0):.2f} "
          f"host_finish={st.get('finish_s', 0):.2f}; "
          f"device in-flight {st.get('device_busy_s', 0):.2f}s "
          f"({100 * busy_frac:.0f}% of wall), "
          f"{st.get('n_chunks', 0)} chunks, "
          f"h2d {st.get('h2d_bytes', 0) / 1e6:.1f} MB, "
          f"d2h {st.get('d2h_bytes', 0) / 1e6:.1f} MB, "
          f"{st.get('n_host_fallback', 0)} host-fallback tiles; "
          f"cold first pass (incl. compiles / cache load) "
          f"{st.get('cold_s', 0):.1f}s",
          file=sys.stderr)
    print(f"# measured CPU baseline (this framework's host mode, "
          f"{args.workers} workers, JAX_PLATFORMS=cpu): "
          f"{baseline_rps} regions/s. The reference stack cannot run here "
          f"(no pysam/edlib/binaries), so vs_baseline is a lower bound vs "
          f"the actual reference pipeline.", file=sys.stderr)
    try:
        ks = measure_kernel_compute(jobs[3 : 3 + 16 : 4], cfg)
        if ks:
            # upper-bound estimate: every region priced at the LARGEST
            # bucket's per-region kernel cost
            est_compute = (ks["kernel_ms_per_batch"] / 1e3) \
                * (args.regions / ks["G"])
            print(f"# kernel compute (transfer-free, fori-loop marginal): "
                  f"{ks['kernel_ms_per_batch']} ms per {ks['G']}-region "
                  f"batch of bucket {ks['shape']} = "
                  f"{ks['gcells_per_s']} Gcells/s; workload-wide pure "
                  f"compute <= ~{est_compute:.2f}s of the "
                  f"{st.get('device_busy_s', 0):.2f}s device window "
                  f"(<= {100 * est_compute / max(st.get('device_busy_s', 1e-9), 1e-9):.0f}% "
                  f"compute; the rest is transfer + RPC latency + queueing)",
                  file=sys.stderr)
    except Exception as e:
        print(f"# kernel compute measurement failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
