"""Accuracy benchmark: recall / precision / F1 / GT concordance per dtype.

The statistical analog of the reference's HG002 1,000-region Truvari
evaluation (BASELINE.md accuracy table; protocol
evaluation/Table2-4/truvari_eval_wgs.sh:20-24 -- refdist 500, pctsize 0.5,
pctsim 0.5, sizemin 50): N randomized SV-rich regions per data type, the full
per-region stack (phase -> assemble -> call -> refine), Truvari-protocol
matching in-process (evaluation/compare.py).  Truth SVs are drawn log-uniform
in [50, 2000] bp with random type / genotype, plus per-dtype read error
models matching tests/test_pipeline_e2e.py.

Usage: python bench_accuracy.py [--regions 60] [--dtypes HIFI,CLR,ONT]
Prints one JSON line per dtype.
"""

import argparse
import json
import sys

ERR_MODELS = {
    "HIFI": dict(sub_rate=0.002, coverage=22),
    "CLR": dict(sub_rate=0.06, ins_rate=0.03, del_rate=0.03, coverage=28),
    "ONT": dict(sub_rate=0.04, ins_rate=0.02, del_rate=0.02, coverage=28),
}

_state = {}


def _make_case(seed: int, ref_len: int, err: dict, max_svlen: int = 2000):
    import numpy as np
    from focalsv_tpu.testing import simulate as sim

    rng = np.random.default_rng(seed)
    n_sv = int(rng.integers(1, 4))
    svs = []
    lo = 6_000
    span = (ref_len - 12_000) // n_sv
    for i in range(n_sv):
        pos = int(rng.integers(lo + i * span, lo + i * span + span - 3_000))
        length = int(np.exp(rng.uniform(np.log(50), np.log(max_svlen))))
        svtype = "DEL" if rng.random() < 0.5 else "INS"
        gt = "0/1" if rng.random() < 0.5 else "1/1"
        seq = rng.integers(0, 4, length).astype(np.uint8) if svtype == "INS" else None
        svs.append(sim.SimSV(svtype, pos, length, gt, seq=seq))
    return sim.simulate_region(seed=seed, ref_len=ref_len, n_snps=25,
                               svs=svs, **err)


def _child_init(dtype: str):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    from focalsv_tpu.config import preset
    _state["cfg"] = preset(dtype)
    _state["dtype"] = dtype


def _child_run(args):
    seed, ref_len, err, max_svlen = args
    from focalsv_tpu.evaluation.compare import match_records, truth_from_sim
    from focalsv_tpu.pipeline.region import process_region

    region = _make_case(seed, ref_len, err, max_svlen)
    res = process_region(region.reads, region.ref, 0, region.chrom,
                         _state["cfg"])
    truth = truth_from_sim(region.svs, region.chrom, region.ref)
    b = match_records(res.records, truth,
                      check_seq=(_state["dtype"] == "HIFI"))
    return b.tp, b.fp, b.fn, b.gt_correct, b.gt_total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--regions", type=int, default=60)
    ap.add_argument("--ref-len", type=int, default=30_000)
    ap.add_argument("--max-svlen", type=int, default=2000)
    ap.add_argument("--coverage", type=float, default=None)
    ap.add_argument("--dtypes", default="HIFI,CLR,ONT")
    ap.add_argument("--procs", type=int, default=2)
    args = ap.parse_args()

    import multiprocessing as mp
    ctx = mp.get_context("spawn")
    for dtype in args.dtypes.split(","):
        err = dict(ERR_MODELS[dtype])
        if args.coverage is not None:
            err["coverage"] = args.coverage
        jobs = [(4000 + i, args.ref_len, err, args.max_svlen) for i in range(args.regions)]
        if args.procs > 1:
            with ctx.Pool(args.procs, initializer=_child_init,
                          initargs=(dtype,)) as pool:
                rows = pool.map(_child_run, jobs)
        else:
            _child_init(dtype)
            rows = [_child_run(j) for j in jobs]
        tp = sum(r[0] for r in rows)
        fp = sum(r[1] for r in rows)
        fn = sum(r[2] for r in rows)
        gt_c = sum(r[3] for r in rows)
        gt_t = sum(r[4] for r in rows)
        recall = tp / max(tp + fn, 1)
        precision = tp / max(tp + fp, 1)
        f1 = 2 * precision * recall / max(precision + recall, 1e-9)
        print(json.dumps({
            "dtype": dtype, "regions": args.regions,
            "tp": tp, "fp": fp, "fn": fn,
            "recall": round(recall, 4), "precision": round(precision, 4),
            "f1": round(f1, 4),
            "gt_concordance": round(gt_c / max(gt_t, 1), 4),
        }))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
