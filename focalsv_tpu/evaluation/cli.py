"""Evaluation CLI: benchmark a call VCF against a truth VCF with the
reference's Truvari protocol parameters (evaluation/Table2-4/
truvari_eval_wgs.sh:20-24: refdist 500, pctsize 0.5, pctsim 0.5, sizemin 50,
INS and DEL evaluated separately), implemented in-process
(focalsv_tpu/evaluation/compare.py) since truvari is not in this image.

    focalsv-tpu-eval --call calls.vcf --truth truth.vcf [--sizemin 50]
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="focalsv-tpu-eval")
    p.add_argument("--call", required=True)
    p.add_argument("--truth", required=True)
    p.add_argument("--refdist", type=int, default=500)
    p.add_argument("--pctsize", type=float, default=0.5)
    p.add_argument("--pctsim", type=float, default=0.5)
    p.add_argument("--sizemin", type=int, default=50)
    p.add_argument("--svtype", choices=["INS", "DEL", "ALL"], default="ALL")
    args = p.parse_args(argv)

    from focalsv_tpu.evaluation.compare import match_records
    from focalsv_tpu.io.vcf import read_vcf

    _, calls = read_vcf(args.call)
    _, truth = read_vcf(args.truth)
    out = {}
    types = ["INS", "DEL"] if args.svtype == "ALL" else [args.svtype]
    for svtype in types:
        c = [r for r in calls if r.svtype == svtype]
        t = [r for r in truth if r.svtype == svtype]
        b = match_records(c, t, refdist=args.refdist, pctsize=args.pctsize,
                          pctsim=args.pctsim, sizemin=args.sizemin)
        out[svtype] = dict(tp=b.tp, fp=b.fp, fn=b.fn,
                           recall=round(b.recall, 4),
                           precision=round(b.precision, 4),
                           f1=round(b.f1, 4),
                           gt_concordance=round(b.gt_concordance, 4))
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
