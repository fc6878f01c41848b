#!/usr/bin/env python3
"""Merge per-shard (and raised-budget --only override) local_verify logs
into one CORRECTNESS_sf1.txt, later files winning per query — the
rehearsal protocol runs the standard 300 s budget first, then replays the
leftover ORACLE_TIMEOUT rows alone with a bigger budget (driver-side
tooling, like local_verify.py). Usage: merge_sf1.py OUT LOG [LOG...]
"""
import re
import sys

out, logs = sys.argv[1], sys.argv[2:]
rows = {}
for path in logs:
    for line in open(path):
        m = re.match(r"^(\w+)\s{2,}(OK|ROWS_ONLY|ORACLE_TIMEOUT|ORACLE_ERROR|"
                     r"VALUE_MISMATCH|SCHEMA_MISMATCH|TYPE_MISMATCH|ROWCOUNT)(.*)$",
                     line.rstrip("\n"))
        if m:
            rows[m.group(1)] = f"{m.group(2)}{m.group(3)}"
if not rows:
    # empty/truncated/wrong-format input must say so, not die on max()
    # of an empty sequence (the local_verify.py bug class, review r14)
    sys.exit(f"no verdict lines parsed from: {', '.join(logs)}")
w = max(len(n) for n in rows)
with open(out, "w") as f:
    for n in sorted(rows):
        f.write(f"{n:<{w}}  {rows[n]}\n")
ok = sum(1 for v in rows.values() if v.startswith(("OK", "ROWS_ONLY")))
to = sum(1 for v in rows.values() if v.startswith("ORACLE_TIMEOUT"))
bad = len(rows) - ok - to
print(f"{out}: {len(rows)} queries, {ok} ok/rows-only, {to} oracle-timeout, "
      f"{bad} OTHER{' <-- RED' if bad else ''}")
