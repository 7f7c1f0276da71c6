#!/usr/bin/env python3
"""Scaling-slope harness: profile the heavy-tail queries at two scale
factors and emit a per-query ratio table for SCALING.md.

Runs `sbt "runMain graft.Profile <dir> <queries> --runs N"` once per
scale, parses the `[profile] <name> runI: X.XXX s` lines, and reports
  cold   = run 1 (codegen + JIT + any artifact build: quantizer
           training, IVF index export, bucketed-table writes)
  steady = min(run 2..N) (warm plans, artifacts on disk)
The slope of interest is steady(sfB)/steady(sfA) against the row-count
ratio; cold is reported separately because index builds are one-time.

Usage:
  python3 tools/scaling_run.py --dirA /root/testdata/sf0.1 --dirB data/sf1 \
      --label A=sf0.1 --label B=sf1 --runs 3 --out /tmp/scaling.json q1,q2,...
"""
import argparse
import json
import re
import subprocess
import sys

LINE = re.compile(r"\[profile\] (\S+) run(\d+): ([0-9.]+) s")


def profile(sf_dir, queries, runs, mem):
    cmd = ["sbt", f'runMain graft.Profile {sf_dir} {",".join(queries)} --runs {runs}']
    env = {"SPARK_DRIVER_MEM": mem}
    import os
    print(f"[scaling] profiling {len(queries)} queries at {sf_dir} (runs={runs})", flush=True)
    p = subprocess.run(cmd, capture_output=True, text=True, env={**os.environ, **env})
    out = p.stdout + p.stderr
    times = {}
    for name, run, sec in LINE.findall(out):
        times.setdefault(name, {})[int(run)] = float(sec)
    missing = [q for q in queries if q not in times]
    if missing or p.returncode != 0:
        sys.stderr.write(out[-4000:])
        raise SystemExit(f"profile failed at {sf_dir}: rc={p.returncode} missing={missing}")
    return times


def summarize(times):
    out = {}
    for name, runs in times.items():
        cold = runs.get(1)
        steady = min(v for k, v in runs.items() if k > 1) if len(runs) > 1 else cold
        out[name] = {"cold": cold, "steady": steady}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirA", required=True)
    ap.add_argument("--dirB", required=True)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--mem", default="24g")
    ap.add_argument("--out", default="/tmp/scaling.json")
    ap.add_argument("queries")
    args = ap.parse_args()
    queries = args.queries.split(",")

    a = summarize(profile(args.dirA, queries, args.runs, args.mem))
    b = summarize(profile(args.dirB, queries, args.runs, args.mem))

    rows = []
    for q in queries:
        ra, rb = a[q], b[q]
        rows.append({
            "query": q,
            "steady_a": ra["steady"], "steady_b": rb["steady"],
            "cold_a": ra["cold"], "cold_b": rb["cold"],
            "slope": round(rb["steady"] / max(ra["steady"], 1e-9), 2),
        })
    result = {"dirA": args.dirA, "dirB": args.dirB, "runs": args.runs, "rows": rows}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"{'query':28s} {'steadyA':>8s} {'steadyB':>8s} {'slope':>6s} {'coldB':>8s}")
    for r in rows:
        print(f"{r['query']:28s} {r['steady_a']:8.2f} {r['steady_b']:8.2f} {r['slope']:6.2f} {r['cold_b']:8.2f}")
    print(f"[scaling] wrote {args.out}")


if __name__ == "__main__":
    main()
