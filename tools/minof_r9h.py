#!/usr/bin/env python3
"""Per-query min over docs/bench_r9h_run*.json -> docs/bench_r9_minN.json"""
import glob, json, sys

runs = []
for p in sorted(glob.glob('docs/bench_r9h_run*.json')):
    with open(p) as f:
        runs.append((p, json.load(f)))
if not runs:
    sys.exit("no runs")
names = set()
for _, r in runs:
    names |= set(r['queries'])
mins = {}
for n in sorted(names):
    vals = [r['queries'][n] for _, r in runs if n in r['queries']
            and r['queries'][n] >= 0]
    mins[n] = min(vals) if vals else -1.0
total = sum(v for v in mins.values() if v >= 0)
out = {"metric": "total", "value": total, "unit": "sec",
       "n": len(mins), "runs": len(runs),
       "protocol": "per-query min of %d full passes, sf0.1, local[32]"
                   % len(runs),
       "queries": mins}
with open('docs/bench_r9h_min%d.json' % len(runs), 'w') as f:
    json.dump(out, f)
print("runs:", len(runs), "entries:", len(mins), "total: %.1f s" % total)
for p, r in runs:
    t = sum(v for v in r['queries'].values() if v >= 0)
    print("  %s raw total %.1f s" % (p, t))
# top movers vs per-run
worst = sorted(mins.items(), key=lambda kv: -kv[1])[:12]
print("slowest (min):")
for n, v in worst:
    print("  %-28s %6.2f s" % (n, v))
