#!/usr/bin/env python3
"""Min-of-N comparison for the r15 series: reads
docs/bench_r15_base_run*.json and docs/bench_r15_opt_run*.json, prints
per-query base->opt deltas (min over runs on each side) sorted by
absolute saving, plus totals. Analysis-only, additions-only."""
import glob
import json


def minmap(pattern):
    out = {}
    for p in sorted(glob.glob(pattern)):
        q = json.load(open(p))["queries"]
        for k, v in q.items():
            if v >= 0:
                out[k] = min(out.get(k, float("inf")), v)
    return out


def main():
    base = minmap("docs/bench_r15_base_run*.json")
    opt = minmap("docs/bench_r15_opt_run*.json")
    common = sorted(set(base) & set(opt))
    rows = [(base[k] - opt[k], k, base[k], opt[k]) for k in common]
    rows.sort(reverse=True)
    print(f"{'query':40s} {'base':>7s} {'opt':>7s} {'delta':>7s} {'x':>5s}")
    for d, k, b, o in rows:
        if abs(d) >= 0.15:
            print(f"{k:40s} {b:7.2f} {o:7.2f} {d:+7.2f} {b / o:5.2f}")
    tb = sum(base[k] for k in common)
    to = sum(opt[k] for k in common)
    import math
    geo = math.exp(sum(math.log(base[k] / opt[k]) for k in common
                       if base[k] > 0 and opt[k] > 0) / len(common))
    print(f"\ntotal (min-of-N, {len(common)} common): "
          f"base {tb:.1f}s -> opt {to:.1f}s ({tb / to:.3f}x, "
          f"geomean {geo:.3f}x)")
    reg = [(k, base[k], opt[k]) for k in common
           if opt[k] > base[k] * 1.10 and opt[k] - base[k] > 0.2]
    print(f"regressions >10% and >0.2s: {len(reg)}")
    for k, b, o in sorted(reg, key=lambda r: r[1] - r[2]):
        print(f"  {k:38s} {b:6.2f} -> {o:6.2f}")


if __name__ == "__main__":
    main()
