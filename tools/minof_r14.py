#!/usr/bin/env python3
"""Per-query min over docs/bench_r14_run*.json -> docs/bench_r14_minN.json,
plus a protocol-matched like-for-like comparison against the r13b record
(docs/bench_r13b_min9.json) on shared entries.

ADVICE-r13 hardening vs the r13b script: (a) entries whose every run
errored (sentinel -1.0) are EXCLUDED from the min map and reported
separately, so the headline entry count only counts measured queries;
(b) the shared-entry median guards the empty case instead of raising
IndexError when no shared entry has prev>0 and min>=0.
"""
import glob, json, sys

runs = []
for p in sorted(glob.glob('docs/bench_r14_run*.json')):
    with open(p) as f:
        runs.append((p, json.load(f)))
if not runs:
    sys.exit("no runs")
cpus = sorted({(r.get('cpus'), r.get('cpus_source')) for _, r in runs})
names = set()
for _, r in runs:
    names |= set(r['queries'])
mins, failed = {}, []
for n in sorted(names):
    vals = [r['queries'][n] for _, r in runs if n in r['queries']
            and r['queries'][n] >= 0]
    if vals:
        mins[n] = min(vals)
    else:
        failed.append(n)
total = sum(mins.values())
out = {"metric": "total", "value": total, "unit": "sec",
       "n": len(mins), "runs": len(runs),
       "failed_entries": failed,
       "cpus": runs[0][1].get('cpus'),
       "cpus_source": runs[0][1].get('cpus_source'),
       "protocol": "per-query min of %d full passes, sf0.1, "
                   "default cpus" % len(runs),
       "queries": mins}
with open('docs/bench_r14_min%d.json' % len(runs), 'w') as f:
    json.dump(out, f)
print("runs:", len(runs), "entries:", len(mins),
      "total: %.1f s" % total, "cpus:", cpus)
if failed:
    print("entries with NO successful run (excluded):", failed)
for p, r in runs:
    t = sum(v for v in r['queries'].values() if v >= 0)
    errs = r.get('errors') or {}
    print("  %s raw total %.1f s errors %d" % (p, t, len(errs)))
worst = sorted(mins.items(), key=lambda kv: -kv[1])[:12]
print("slowest (min):")
for n, v in worst:
    print("  %-32s %6.2f s" % (n, v))

# like-for-like vs the r13b record on shared entries
try:
    with open('docs/bench_r13b_min9.json') as f:
        prev = json.load(f)['queries']
except FileNotFoundError:
    sys.exit(0)
shared = sorted(set(prev) & set(mins))
a = sum(prev[n] for n in shared if prev[n] >= 0)
b = sum(mins[n] for n in shared)
ratios = sorted((mins[n] / prev[n], n) for n in shared if prev[n] > 0)
if ratios:
    med = ratios[len(ratios) // 2][0]
    print("shared entries: %d  r13b %.1f s vs r14 %.1f s  median ratio %.2f"
          % (len(shared), a, b, med))
    print("worst shared movers:")
    for r, n in ratios[-6:]:
        print("  %-32s %.2fx (%.2f -> %.2f)" % (n, r, prev[n], mins[n]))
else:
    print("shared entries: %d (no comparable ratios)" % len(shared))
new = sorted(set(mins) - set(prev))
print("new entries: %d  cost %.1f s" % (len(new), sum(mins[n] for n in new)))
for n in new:
    print("  %-32s %6.2f s" % (n, mins[n]))
