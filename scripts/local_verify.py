#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify at a given
SF, then execute each oracle SQL in DuckDB over the same parquet tables and
compare (column names, row counts, values) with the Spark parquet output.
Usage: python3 scripts/local_verify.py [sfDir] [outDir] [--skip-spark]
"""
import json, math, os, subprocess, sys, glob

import duckdb

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
SF = _pos[0] if len(_pos) > 0 else "/root/testdata/sf0.01"
OUT = _pos[1] if len(_pos) > 1 else "/root/repo/target/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_spark():
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", env=env, capture_output=True, text=True)
    sys.stdout.write("\n".join(r.stdout.splitlines()[-5:]) + "\n")
    if r.returncode != 0:
        print(r.stderr[-3000:])
        sys.exit(1)


# Driver-hash type equivalence (calibrated on CORRECTNESS_r11: queries whose
# oracle types differed from the Spark parquet types ONLY within the plain-int
# family hashed green at the driver; BIGINT-vs-HUGEINT hashed RED three rounds
# running — r4 ts_histogram_quantile, r9 dedup_substring_ratio, r11
# graph_modularity, all "un-CAST sum() → DuckDB HUGEINT"). Anything outside
# this family (HUGEINT, DECIMAL, DOUBLE vs exact, VARCHAR...) must match
# exactly or the driver's serializer diverges even when every value is equal.
_INT_FAMILY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}


def type_class(t):
    t = t.upper()
    return "INT" if t in _INT_FAMILY else t


def type_gate(con, files, sql):
    """Compare DuckDB DESCRIBE types of the oracle result vs the Spark parquet
    schema; return list of (col, spark_type, oracle_type) violations."""
    gt = {r[0]: r[1] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()}
    wt = {r[0]: r[1] for r in con.execute(f"DESCRIBE ({sql})").fetchall()}
    return [(c, gt.get(c), wt[c]) for c in wt
            if c in gt and type_class(gt[c]) != type_class(wt[c])]


def norm_val(v):
    # full-precision compare: r1 measured every query bit-exact across
    # engines, so don't mask regressions behind rounding
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def make_con():
    """One DuckDB env for the gate AND its self-test — they must never
    drift apart, or the self-test proves a different environment."""
    con = duckdb.connect()
    if os.environ.get("GRAFT_DUCK_THREADS"):
        con.execute(f"SET threads={int(os.environ['GRAFT_DUCK_THREADS'])}")
    if os.environ.get("GRAFT_DUCK_MEM"):
        # big-SF rehearsals: cap the oracle's memory so a heavy replay
        # spills to disk instead of OOM-killing the box (r14: dedup_simhash
        # at sf1 reached 108 GiB RSS and con.interrupt() couldn't land
        # mid-allocation — the 300s watchdog needs the query to stay alive)
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCK_MEM']}'")
        # per-process spill dir: concurrent invocations (the sharded sf1
        # protocol) sharing one dir race on cleanup — the first process to
        # exit removes the other's live temp storage and aborts it mid-query
        con.execute(
            f"SET temp_directory='/tmp/graft_duck_spill_{os.getpid()}'")
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _timeout_arg():
    for a in sys.argv[1:]:
        if a.startswith("--oracle-timeout="):
            return float(a.split("=", 1)[1])
    return None


def _shard_arg():
    """--shard=K/N: compare only queries whose sorted index ≡ K (mod N) —
    big-SF rehearsals run hours single-process; round-robin sharding
    spreads the heavy families across parallel invocations."""
    for a in sys.argv[1:]:
        if a.startswith("--shard="):
            k, n = a.split("=", 1)[1].split("/")
            return int(k), int(n)
    return 0, 1


def _only_arg():
    """--only=a,b,c: compare only the named queries — the raised-budget
    second pass over the heavy replay class (run the main sweep with the
    standard budget, then re-run the leftovers alone with a bigger
    --oracle-timeout instead of paying it everywhere)."""
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            return set(a.split("=", 1)[1].split(","))
    return None


def run_oracle(con, sql):
    """Execute an oracle query; with --oracle-timeout=SECS, interrupt a
    DuckDB query that exceeds the budget (scale rehearsals: the exhaustive
    all-pairs oracles are verify-SF-only by declaration)."""
    return _with_watchdog(con, lambda: con.execute(sql).fetchall())


# --- blocked replay of the exhaustive-truth class (r16, VERDICT r15 #4) ---
#
# emb_knn_dist's oracle computes the TRUE within-cell kNN: the `pd` CTE is
# an all-pairs self-join whose hash-aggregate state (pairs x dims) outgrew
# the sf1 rehearsal box's disk. The computation decomposes EXACTLY by IVF
# cell (pairs only form inside one `assign` cell: `na.cell = qa.cell`), so
# the rehearsal replays it one cell at a time — materialize each block into
# an accumulator table, drop the intermediates, merge with the oracle's
# final ORDER BY. Values are bit-identical to the monolithic statement;
# only the peak intermediate footprint changes. Activated per query via
# --blocked=name,name (rehearsal tooling, like --shard/--only).
#
# The block predicate is injected by rewriting the one same-cell join
# condition; the rewrite asserts the anchor occurs EXACTLY once so a future
# oracle edit fails loudly here instead of silently replaying the wrong
# query.
# Each spec is a list of (find, replace) rewrites applied per block (with
# {blk} substituted); every `find` is asserted to occur EXACTLY once so a
# future oracle edit fails loudly instead of silently replaying the wrong
# query. The emb_knn_dist rewrite makes the cell restriction STRUCTURAL:
# a MATERIALIZED per-cell member CTE replaces the post-hoc assign joins —
# measured at sf1, the optimizer left the all-dims a.i = b.i join
# unrestricted (20k x 20k x 64 intermediate) and one block blew a 1800 s
# budget even with the cell literal on both assign references; with the
# members materialized first, a block is (cell_size)^2 x dims and all 16
# replay in minutes. The pair set is unchanged: evr x evr restricted by
# assign-joins with qa.cell = na.cell = {blk} IS eblk x eblk.
BLOCKED = {
    "emb_knn_dist": {
        "rewrites": [
            ("pd AS MATERIALIZED (SELECT a.vec_id AS vid",
             "eblk AS MATERIALIZED (SELECT v.vec_id, v.x, v.i FROM evr v "
             "JOIN assign c ON c.vid = v.vec_id WHERE c.cell = {blk}),\n"
             "              pd AS MATERIALIZED (SELECT a.vec_id AS vid"),
            ("FROM evr a JOIN evr b ON a.i = b.i AND a.vec_id <> b.vec_id",
             "FROM eblk a JOIN eblk b ON a.i = b.i AND a.vec_id <> b.vec_id"),
            ("JOIN assign qa ON qa.vid = a.vec_id", ""),
            ("JOIN assign na ON na.vid = b.vec_id AND na.cell = qa.cell",
             ""),
        ],
        "n_blocks": 16,  # ivfTrainCte(2, 16): cells are 0..15
        # the statement's own global ORDER BY, re-applied after the merge
        # (ADVICE r16 low: a hardcoded merge order silently assumed every
        # blocked oracle sorts by its first four columns — now it is part
        # of the spec and asserted against the statement like the
        # rewrite anchors, so a drifted oracle fails loudly)
        "merge_order": "1, 2, 3, 4",
    },
}


def _blocked_arg():
    for a in sys.argv[1:]:
        if a.startswith("--blocked="):
            return set(a.split("=", 1)[1].split(","))
    return set()


def run_oracle_blocked(con, sql, name):
    """Replay a BLOCKED oracle: run the statement once per block with the
    same-cell join restricted to that block, accumulate, merge. Exact by
    construction (the blocks partition the pair space); each block runs
    under its own watchdog budget."""
    spec = BLOCKED[name]
    for find, _ in spec["rewrites"]:
        assert sql.count(find) == 1, (
            f"{name}: blocked-replay anchor {find!r} not found exactly "
            "once — the oracle SQL changed; update BLOCKED or drop "
            "--blocked for it")
    merge_order = spec["merge_order"]
    assert sql.rstrip().rstrip(";").upper().endswith(
        f"ORDER BY {merge_order}".upper()), (
        f"{name}: the oracle's trailing ORDER BY no longer matches the "
        f"spec's merge_order ({merge_order!r}) — the per-block sort and "
        "the post-merge sort would disagree; update BLOCKED['merge_order']")
    con.execute("DROP TABLE IF EXISTS __blk_acc")
    made = False
    try:
        for blk in range(spec["n_blocks"]):
            bsql = sql
            for find, repl in spec["rewrites"]:
                bsql = bsql.replace(find, repl.format(blk=blk))
            # two-step materialize: INSERT INTO acc (<WITH...>) trips a
            # DuckDB binder quirk (duplicate CTE alias), so each block
            # lands in its own temp table first, then appends as a plain
            # SELECT; the big intermediate is dropped before the next block
            _with_watchdog(con, lambda q=bsql: con.execute(
                f"CREATE OR REPLACE TEMP TABLE __blk AS ({q})"))
            if not made:
                con.execute("CREATE TEMP TABLE __blk_acc AS "
                            "SELECT * FROM __blk")
                made = True
            else:
                con.execute("INSERT INTO __blk_acc SELECT * FROM __blk")
            con.execute("DROP TABLE __blk")
        # the monolithic statement's ORDER BY ran per block; re-apply it
        # globally (from the spec, asserted above against the statement)
        # so the merged list compares row-for-row
        rows = con.execute(
            f"SELECT * FROM __blk_acc ORDER BY {merge_order}").fetchall()
        return rows
    finally:
        for t in ("__blk", "__blk_acc"):
            try:
                con.execute(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass


def _with_watchdog(con, fn):
    """Run fn() under the --oracle-timeout watchdog (interrupt the
    connection when the budget expires)."""
    secs = _timeout_arg()
    if secs is None:
        return fn()
    import threading
    done = threading.Event()

    def watchdog():
        if not done.wait(secs):
            con.interrupt()
    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        return fn()
    except Exception as ex:
        if "INTERRUPT" in str(ex).upper():
            raise TimeoutError(f"oracle exceeded {secs:.0f}s budget")
        raise
    finally:
        done.set()


def verdict_duck(con, oracle, name, files):
    """--duck-cmp: the whole compare runs INSIDE DuckDB — for the
    output-bound exhaustive class (dedup_simhash_buckets at sf1 emits
    206M pairs; fetchall() of that into Python tuples is tens of GB).
    Same schema + type gates as the standard verdict; the value check is
    MULTISET equality (EXCEPT ALL both ways = empty, plus equal counts) —
    order-insensitive, but both engines' results are deterministic
    ORDER BY outputs, so equal multisets of these are equal lists."""
    if name not in oracle:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
        return f"ROWS_ONLY rows={n}"
    sql = oracle[name]
    got_cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()]
    want_cols = [r[0] for r in con.execute(f"DESCRIBE ({sql})").fetchall()]
    if sorted(got_cols) != sorted(want_cols):
        return f"SCHEMA_MISMATCH got={got_cols} want={want_cols}"
    bad_types = type_gate(con, files, sql)
    if bad_types:
        return f"TYPE_MISMATCH (spark,oracle)={bad_types}"
    cols = ", ".join(f'"{c}"' for c in sorted(got_cols))
    try:
        def compare():
            con.execute(f"CREATE OR REPLACE TEMP TABLE __want AS ({sql})")
            nw = con.execute("SELECT count(*) FROM __want").fetchone()[0]
            ng = con.execute(
                f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
            if ng != nw:
                return f"ROWCOUNT got={ng} want={nw}"
            diff = con.execute(
                f"SELECT count(*) FROM ("
                f"(SELECT {cols} FROM read_parquet({files!r})"
                f" EXCEPT ALL SELECT {cols} FROM __want)"
                f" UNION ALL "
                f"(SELECT {cols} FROM __want"
                f" EXCEPT ALL SELECT {cols} FROM read_parquet({files!r}))"
                f")").fetchone()[0]
            if diff:
                return f"VALUE_MISMATCH rows={ng} multiset_diff={diff}"
            return f"OK rows={ng} (duck-cmp multiset)"
        return _with_watchdog(con, compare)
    except TimeoutError as ex:
        return f"ORACLE_TIMEOUT {ex}"
    except Exception as ex:
        return f"ORACLE_ERROR {ex}"
    finally:
        # outside the watchdog's INTERRUPT translation: a late-firing
        # interrupt landing on this DROP must not replace the computed
        # verdict with an uncaught exception (review r15)
        try:
            con.execute("DROP TABLE IF EXISTS __want")
        except Exception:
            pass


def verdict(con, oracle, name, files):
    got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
    got_cols = [d[0] for d in con.description]
    if name not in oracle:
        return f"ROWS_ONLY rows={len(got)}"
    try:
        if name in _blocked_arg() and name in BLOCKED:
            want = run_oracle_blocked(con, oracle[name], name)
            # column names from a zero-cost DESCRIBE of the full statement
            want_cols = [r[0] for r in con.execute(
                f"DESCRIBE ({oracle[name]})").fetchall()]
        else:
            want = run_oracle(con, oracle[name])
            want_cols = [d[0] for d in con.description]
    except TimeoutError as ex:
        # scale rehearsals only (--oracle-timeout): the declared
        # exhaustive-oracle class (all-pairs baselines) is exempt from
        # the big-SF oracle but must be LISTED, never silently capped
        return f"ORACLE_TIMEOUT {ex}"
    except Exception as ex:
        return f"ORACLE_ERROR {ex}"
    if sorted(got_cols) != sorted(want_cols):
        return f"SCHEMA_MISMATCH got={got_cols} want={want_cols}"
    bad_types = type_gate(con, files, oracle[name])
    if bad_types:
        return f"TYPE_MISMATCH (spark,oracle)={bad_types}"
    # driver sorts columns by name before hashing values
    gperm = [got_cols.index(c) for c in sorted(got_cols)]
    wperm = [want_cols.index(c) for c in sorted(want_cols)]
    g = [tuple(norm_val(r[i]) for i in gperm) for r in got]
    w = [tuple(norm_val(r[i]) for i in wperm) for r in want]
    if len(g) != len(w):
        return f"ROWCOUNT got={len(g)} want={len(w)}"
    if g != w:
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b][:3]
        return f"VALUE_MISMATCH rows={len(g)} first_diffs={diffs}"
    return f"OK rows={len(g)}"


def compare():
    con = make_con()
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    k, nsh = _shard_arg()
    only = _only_arg()
    dumped = sorted(n for n in os.listdir(OUT) if os.path.isdir(f"{OUT}/{n}"))
    names = [n for i, n in enumerate(dumped)
             if i % nsh == k and (only is None or n in only)]
    if not names:
        # a typo'd --only (or one disjoint with this --shard) must say so,
        # not die on max() of an empty sequence (code review r14)
        missing = sorted(only - set(dumped)) if only else []
        sys.exit(f"no queries selected (shard {k}/{nsh}"
                 + (f", --only unknown names: {missing}" if missing else "")
                 + ")")
    width = max(len(n) for n in names)
    nok = nto = 0
    # print each verdict as it lands (flushed) — a big-SF compare runs for
    # an hour-plus and a buffered all-at-the-end dump is unobservable
    for name in names:
        vfn = verdict_duck if "--duck-cmp" in sys.argv[1:] else verdict
        r = vfn(con, oracle, name, glob.glob(f"{OUT}/{name}/*.parquet"))
        print(f"{name:<{width}}  {r}", flush=True)
        nok += r.startswith("OK") or r.startswith("ROWS_ONLY")
        nto += r.startswith("ORACLE_TIMEOUT")
    tail = f" ({nto} oracle-timeout, exhaustive class)" if nto else ""
    print(f"== {nok}/{len(names)} pass{tail}")


def self_test():
    """Prove the type gate rejects the recurring red-row class: plant an
    un-CAST integer sum() (DuckDB HUGEINT) as the oracle for a BIGINT
    parquet column and require a TYPE_MISMATCH verdict. Run:
    python3 scripts/local_verify.py --self-test  (needs a prior verify OUT)
    """
    con = make_con()
    files = glob.glob(f"{OUT}/q1_agg/*.parquet")
    if not files:
        sys.exit(f"self-test needs a prior verify run: no parquet under "
                 f"{OUT}/q1_agg (run `python3 scripts/local_verify.py` first)")
    planted = ("SELECT l_returnflag, sum(l_linenumber) AS count_order "
               "FROM lineitem GROUP BY 1")
    bad = type_gate(con, files, planted)
    assert bad and any(t[2] == "HUGEINT" for t in bad), \
        f"type gate FAILED to flag a planted un-CAST sum(): {bad}"
    fixed = planted.replace("sum(l_linenumber)",
                            "CAST(sum(l_linenumber) AS BIGINT)")
    assert not type_gate(con, files, fixed), "CAST form must pass"
    print(f"SELF-TEST OK: planted un-CAST sum() rejected ({bad}), "
          "CAST form accepted")


if __name__ == "__main__":
    if "--self-test" in sys.argv:
        self_test()
        sys.exit(0)
    if "--skip-spark" not in sys.argv:
        run_spark()
    compare()
