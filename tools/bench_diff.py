#!/usr/bin/env python3
"""Compare two Bench JSON outputs (raw JSON line or the driver's
BENCH_r{N}.json wrapper) and print per-query deltas sorted by regression.

Usage: python3 tools/bench_diff.py <old.json> <new.json> [threshold_ratio]
"""
import json, re, sys


def load(path):
    txt = open(path).read()
    try:
        d = json.loads(txt)
        if "queries" in d:
            return d
        # driver wrapper: the bench line is embedded (escaped) in "tail"
        if "tail" in d and d["tail"]:
            m = re.search(r'\{"metric":"total".*?"sf":"[^"]*"\}', d["tail"])
            if m:
                return json.loads(m.group(0))
    except json.JSONDecodeError:
        pass
    # raw log: find the bench line
    m = re.search(r'\{"metric":"total".*?"sf":"[^"]*"\}', txt)
    if m:
        return json.loads(m.group(0))
    raise SystemExit(f"no bench JSON found in {path}")


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    oq, nq = old["queries"], new["queries"]
    # Bench records failed queries as -1: a flip to failure is the worst
    # regression there is — surface it first and keep the sentinel out of
    # ratios and totals
    broke = sorted(n for n in set(oq) & set(nq) if nq[n] < 0 <= oq[n])
    fixed = sorted(n for n in set(oq) & set(nq) if oq[n] < 0 <= nq[n])
    for n in broke:
        print(f"BROKE: {n} (was {oq[n]:.2f}s, now FAILS)")
    for n in fixed:
        print(f"fixed: {n} (was failing, now {nq[n]:.2f}s)")
    common = sorted(n for n in set(oq) & set(nq) if oq[n] >= 0 and nq[n] >= 0)
    rows = [(n, oq[n], nq[n], nq[n] / oq[n] if oq[n] > 0 else float("inf"))
            for n in common]
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':30s} {'old':>7s} {'new':>7s} {'ratio':>6s}")
    for n, o, v, r in rows:
        flag = " <-- " if r >= thresh and v - o > 0.3 else ""
        print(f"{n:30s} {o:7.2f} {v:7.2f} {r:6.2f}{flag}")
    ot = sum(oq[n] for n in common)
    nt = sum(nq[n] for n in common)
    print(f"\ncommon subset: {ot:.1f}s -> {nt:.1f}s ({nt / ot:.2f}x), "
          f"{len(common)} queries")
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        print(f"new queries: {', '.join(only_new)} "
              f"(+{sum(nq[n] for n in only_new):.1f}s)")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:
        pass
