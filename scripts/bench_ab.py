#!/usr/bin/env python3
"""Cross-tree bench A/B (r16, VERDICT r15 #1): run the FULL graft.Bench
(and optionally graft.HttpPerf) from several git trees, interleaved in one
session on one box, so box drift lands on every tree equally and a
recorded delta is attributable to CODE. Usage:

  python3 scripts/bench_ab.py OUT.json phase LABEL=DIR [LABEL=DIR...] \
      [--passes=N] [--sf=DIR]

phase: bench | httpperf. Interleaving order per pass is LABEL order
(A B C, A B C, ...), never grouped — a contention burst then spans trees
instead of poisoning one. The recorded per-tree stat is the element-wise
MIN across its passes (the bench protocol's contention-proof floor).
Driver-side tooling, like local_verify.py.
"""
import json
import os
import subprocess
import sys
import time

out = sys.argv[1]
phase = sys.argv[2]
trees = [a.split("=", 1) for a in sys.argv[3:] if "=" in a and not a.startswith("--")]
passes = next((int(a.split("=")[1]) for a in sys.argv if a.startswith("--passes=")), 2)
sf = next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--sf=")), "/root/testdata/sf0.1")
main = {"bench": "graft.Bench", "httpperf": "graft.HttpPerf"}[phase]

runs = {label: [] for label, _ in trees}
for p in range(passes):
    for label, d in trees:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf, SPARK_GRAFT_CPUS="32")
        t0 = time.time()
        r = subprocess.run(["sbt", "-batch", f"runMain {main}"],
                           cwd=d, env=env, capture_output=True, text=True)
        wall = time.time() - t0
        line = next((l for l in reversed(r.stdout.splitlines())
                     if l.startswith("{")), None)
        if r.returncode != 0 or line is None:
            print(f"[{label} pass{p+1}] FAILED rc={r.returncode}\n"
                  + r.stderr[-2000:], file=sys.stderr)
            sys.exit(1)
        rec = json.loads(line)
        rec["_wall_sec"] = round(wall, 1)
        rec["_pass"] = p + 1
        rec["_started_utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                            time.gmtime(t0))
        runs[label].append(rec)
        key = "value" if phase == "bench" else "graft_write_500batch_sec"
        print(f"[{label} pass{p+1}] {key}={rec.get(key)} wall={wall:.0f}s",
              flush=True)

def summarize(recs):
    if phase == "bench":
        return {
            "total_min": min(r["value"] for r in recs),
            "totals": [round(r["value"], 1) for r in recs],
            "queries_min": {k: min(r["queries"][k] for r in recs)
                            for k in recs[0]["queries"]},
        }
    keys = [k for k, v in recs[0].items()
            if isinstance(v, (int, float)) and k.startswith("graft_")]
    out = {k: min(r[k] for r in recs) for k in keys}
    # r17: HttpPerf carries the full published perf grid — min-reduce each
    # cell's measured seconds across passes, keep shape/reference fields
    if isinstance(recs[0].get("grid"), list):
        out["grid"] = []
        for i, cell in enumerate(recs[0]["grid"]):
            merged = dict(cell)
            for k, v in cell.items():
                if isinstance(v, (int, float)) and not k.startswith(
                        ("num_", "n_", "reference_")):
                    merged[k] = min(r["grid"][i][k] for r in recs)
            out["grid"].append(merged)
    return out

result = {
    "phase": phase, "sf": sf, "passes": passes,
    "interleaving": "per-pass round-robin over trees (one session, one box)",
    "trees": {label: summarize(recs) for label, recs in runs.items()},
    "runs": runs,
}
with open(out, "w") as f:
    json.dump(result, f, indent=1)
print(f"wrote {out}")
