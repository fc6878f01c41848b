#!/usr/bin/env python3
"""Merge per-shard (and raised-budget --only override) local_verify logs
into one CORRECTNESS_sf1.txt, later files winning per query — the
rehearsal protocol runs the standard 300 s budget first, then replays the
leftover ORACLE_TIMEOUT rows alone with a bigger budget (driver-side
tooling, like local_verify.py). Usage: merge_sf1.py OUT LOG [LOG...]

The verdict token is matched GENERICALLY (any ALL-CAPS token in the
verdict column), not against a hardcoded list — a hardcoded list silently
drops queries whose verdict string local_verify grows later, and a
dropped query reads as covered (ADVICE r14). After merging, the query
set is cross-checked against oracle_sql.json (the authoritative key
list Verify dumps): any missing or unknown query is a non-zero exit,
so the merged file can never under-report coverage.
"""
import json
import os
import re
import sys

out, logs = sys.argv[1], sys.argv[2:]
rows = {}
for path in logs:
    for line in open(path):
        # query name, 2+ spaces, then an ALL-CAPS verdict token (OK,
        # ROWS_ONLY, ORACLE_TIMEOUT, VALUE_MISMATCH, ... or anything a
        # future local_verify emits) and its free-text tail
        m = re.match(r"^(\w+)\s{2,}([A-Z][A-Z_]*)(\s.*|$)",
                     line.rstrip("\n"))
        if m:
            rows[m.group(1)] = f"{m.group(2)}{m.group(3)}"
if not rows:
    # empty/truncated/wrong-format input must say so, not die on max()
    # of an empty sequence (the local_verify.py bug class, review r14)
    sys.exit(f"no verdict lines parsed from: {', '.join(logs)}")

# cross-check against the oracle key list so a shard that silently lost
# queries (crash, truncated log, renamed verdict) fails the merge loudly
oracle_json = os.environ.get("GRAFT_ORACLE_SQL", "target/verify/oracle_sql.json")
if os.path.exists(oracle_json):
    with open(oracle_json) as f:
        expected = set(json.load(f).keys())
    missing = sorted(expected - set(rows))
    unknown = sorted(set(rows) - expected)
    if missing:
        sys.exit(f"{len(missing)} oracle queries absent from the merged logs "
                 f"(lost shard or unparsed verdict): {', '.join(missing[:20])}")
    if unknown:
        print(f"note: {len(unknown)} merged queries not in {oracle_json}: "
              f"{', '.join(unknown[:20])}", file=sys.stderr)
else:
    print(f"note: no {oracle_json} — skipping the coverage cross-check "
          "(set GRAFT_ORACLE_SQL to the Verify dump)", file=sys.stderr)

w = max(len(n) for n in rows)
with open(out, "w") as f:
    for n in sorted(rows):
        f.write(f"{n:<{w}}  {rows[n]}\n")
ok = sum(1 for v in rows.values() if v.startswith(("OK", "ROWS_ONLY")))
to = sum(1 for v in rows.values() if v.startswith("ORACLE_TIMEOUT"))
bad = len(rows) - ok - to
print(f"{out}: {len(rows)} queries, {ok} ok/rows-only, {to} oracle-timeout, "
      f"{bad} OTHER{' <-- RED' if bad else ''}")
