#!/usr/bin/env python3
"""Per-query min over docs/bench_r12_run*.json -> docs/bench_r12_minN.json,
plus a protocol-matched like-for-like comparison against the r11 record
(docs/bench_r11_min6.json) on shared entries."""
import glob, json, sys

runs = []
for p in sorted(glob.glob('docs/bench_r12_run*.json')):
    with open(p) as f:
        runs.append((p, json.load(f)))
if not runs:
    sys.exit("no runs")
cpus = sorted({(r.get('cpus'), r.get('cpus_source')) for _, r in runs})
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
       "cpus": runs[0][1].get('cpus'),
       "cpus_source": runs[0][1].get('cpus_source'),
       "protocol": "per-query min of %d full passes, sf0.1, "
                   "default cpus" % len(runs),
       "queries": mins}
with open('docs/bench_r12_min%d.json' % len(runs), 'w') as f:
    json.dump(out, f)
print("runs:", len(runs), "entries:", len(mins),
      "total: %.1f s" % total, "cpus:", cpus)
for p, r in runs:
    t = sum(v for v in r['queries'].values() if v >= 0)
    print("  %s raw total %.1f s" % (p, t))
worst = sorted(mins.items(), key=lambda kv: -kv[1])[:12]
print("slowest (min):")
for n, v in worst:
    print("  %-28s %6.2f s" % (n, v))
try:
    with open('docs/bench_r11_min6.json') as f:
        prev = json.load(f)['queries']
    shared = [n for n in mins if n in prev and mins[n] >= 0
              and prev[n] > 0]
    ratios = sorted(mins[n] / prev[n] for n in shared)
    st = sum(mins[n] for n in shared)
    pt = sum(prev[n] for n in shared)
    new = [n for n in mins if n not in prev and mins[n] >= 0]
    print("vs r11_min6 on %d shared: %.1f vs %.1f s, "
          "median ratio %.3f, worst %.2f" %
          (len(shared), st, pt, ratios[len(ratios) // 2], ratios[-1]))
    print("new entries: %d costing %.1f s" %
          (len(new), sum(mins[n] for n in new)))
    for n in sorted(new, key=lambda n: -mins[n]):
        print("  NEW %-28s %6.2f s" % (n, mins[n]))
    movers = sorted(((mins[n] / prev[n], n) for n in shared
                     if mins[n] > 0.5), reverse=True)[:8]
    print("worst shared movers (>0.5 s):")
    for r_, n in movers:
        print("  %-28s %5.2fx (%.2f vs %.2f)" % (n, r_, mins[n], prev[n]))
except FileNotFoundError:
    print("no r11 record for comparison")
