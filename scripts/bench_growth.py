#!/usr/bin/env python3
"""Scale-growth table for SURVEY §6: per-query medians at two SFs, flagging
queries whose wall-time growth exceeds ~linear in the data-size ratio.
Usage: bench_growth.py SMALL_DETAIL.json BIG_DETAIL.json SIZE_RATIO [SLACK]
A query is flagged when big/small > SIZE_RATIO * SLACK (default slack 1.5 —
fixed per-query overheads make sub-ratio growth the norm, so anything past
ratio*slack is genuinely super-linear). Prints a markdown table of flagged
queries plus summary stats.
"""
import json
import sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
ratio = float(sys.argv[3])
slack = float(sys.argv[4]) if len(sys.argv) > 4 else 1.5

sq, bq = small["queries"], big["queries"]
shared = sorted(set(sq) & set(bq))
rows = []
for name in shared:
    a, b = sq[name], bq[name]
    if a <= 0 or b <= 0:
        rows.append((name, a, b, None))
        continue
    rows.append((name, a, b, b / a))

ok = [r for r in rows if r[3] is not None]
flagged = [r for r in ok if r[3] > ratio * slack]
flagged.sort(key=lambda r: -r[3])
print(f"shared queries: {len(shared)}; small total "
      f"{sum(sq[n] for n in shared if sq[n] > 0):.1f}s; big total "
      f"{sum(bq[n] for n in shared if bq[n] > 0):.1f}s; size ratio {ratio}x; "
      f"flag threshold {ratio * slack:.1f}x")
growths = sorted(r[3] for r in ok)
print(f"growth median {growths[len(growths)//2]:.2f}x, "
      f"p90 {growths[int(len(growths)*0.9)]:.2f}x, max {growths[-1]:.2f}x")
print()
print(f"| query | {small['sf'].split('/')[-1]} s | {big['sf'].split('/')[-1]} s | growth |")
print("| --- | --- | --- | --- |")
for name, a, b, g in flagged:
    print(f"| {name} | {a:.3f} | {b:.3f} | {g:.1f}x |")
missing = [r[0] for r in rows if r[3] is None]
if missing:
    print(f"\nfailed/absent in one run: {missing}")
only_big = sorted(set(bq) - set(sq))
if only_big:
    print(f"\nonly in big run (new queries, no small baseline): {only_big}")
