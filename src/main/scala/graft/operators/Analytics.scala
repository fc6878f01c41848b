package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Det, Tables}

/** Analytical operators over the star schema + events stream — the query
  * engine a TSDB user needs once data outgrows per-series scans.
  *
  * Scale notes (100 TB / 1000 executors):
  *  - dimension tables (region, nation, supplier, customer-subsets) are
  *    broadcast explicitly — no shuffle on the fact side for those joins;
  *  - fact-fact joins shuffle on the join key and rely on AQE for skew;
  *  - window operators partition by their natural key (user, custkey) so one
  *    hash shuffle feeds all per-key computation;
  *  - every aggregate is partial (map-side combine) by construction.
  */
object Analytics {
  import Det.{dsum, davg, tsMs, tsLit}

  /** Scan → filter → multi-aggregate groupBy (TPC-H Q1 shape). Single shuffle
    * with map-side partial aggregation; filter + 7-col projection push into
    * the scan.
    */
  def q1Agg(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val out = l
      .where(col("l_shipdate") < tsLit(905817600000L)) // 1998-09-15
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(dsum(col("l_quantity")), 2).as("sum_qty"),
        round(dsum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
    Det.ordered(out)
  }

  /** 3-way join + agg + top-N (TPC-H Q3 shape). `customer` filtered then
    * broadcast; orders⋈lineitem shuffles on orderkey.
    */
  def q3JoinAgg(s: SparkSession, d: String): DataFrame = {
    val cutoff = 827366400000L // 1996-03-21
    val c = Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = Tables.orders(s, d).where(col("o_orderdate") < tsLit(cutoff))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val l = Tables.lineitem(s, d).where(col("l_shipdate") > tsLit(cutoff))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), tsMs(col("o_orderdate")).as("o_orderdate_ms"))
      .agg(round(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** 6-way star join with broadcast dimensions (TPC-H Q5 shape). */
  def q5MultiJoin(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d).where(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
    val cDim = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val sDim = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") >= tsLit(820454400000L) && // 1996-01-01
             col("o_orderdate") < tsLit(852076800000L))    // 1997-01-01
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val out = l
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cDim), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sDim),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
    Det.ordered(out)
  }

  /** count(distinct) per group — expands to a two-phase aggregate. */
  def groupDistinct(s: SparkSession, d: String): DataFrame = {
    val out = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))
    Det.ordered(out)
  }

  /** Per-group top-N via row_number — one shuffle on the partition key. */
  def windowTopN(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val out = Tables.orders(s, d)
      .where(col("o_custkey") < 200)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("bigint").as("rn"))
      .where(col("rn") <= 3)
    Det.ordered(out)
  }

  /** Running sum + lag per series ordered by time. */
  def windowRunning(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).where(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), tsMs(col("ts")).as("tms"), col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("tms"), col("event_id"))
    val out = e.select(
      col("user_id"), col("event_id"), col("tms").as("time_ms"),
      round(sum(col("value").cast("decimal(18,4)")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double"), 2)
        .as("running_sum"),
      lag(col("tms"), 1).over(w).as("prev_ms"))
    Det.ordered(out)
  }

  /** Time-RANGE window frame: per-user trailing-1h event count and value
    * sum at every event — the "rate over sliding window" primitive. RANGE
    * frames bound by the ORDER BY value (epoch ms), not row counts.
    */
  def windowRangeFrame(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).where(col("user_id") < 10)
      .select(col("user_id"), col("event_id"), tsMs(col("ts")).as("tms"), col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("tms"))
      .rangeBetween(-3600000L, 0L)
    val out = e.select(
      col("user_id"), col("event_id"), col("tms"),
      count(lit(1)).over(w).as("n_1h"),
      round(sum(col("value").cast("decimal(18,4)")).over(w).cast("double"), 2).as("sum_1h"))
    Det.ordered(out)
  }

  /** Sketch aggregate: HyperLogLog++ distinct-user estimate per event type —
    * the constant-memory path for distinct counts at 100 TB. Estimates are
    * implementation-specific, so this is verified rows-only; `groupDistinct`
    * is the exact twin.
    */
  def approxDistinct(s: SparkSession, d: String): DataFrame = {
    val out = Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        count(lit(1)).as("n"))
    Det.ordered(out)
  }

  /** Gap-based sessionization: lag + cumulative flag sum, the classic
    * two-window formulation. Partitioned by user — one shuffle.
    */
  def sessionize(s: SparkSession, d: String, gapMs: Long = 3600000L): DataFrame = {
    val e = Tables.events(s, d).select(col("user_id"), col("event_id"), tsMs(col("ts")).as("tms"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("tms"), col("event_id"))
    val flagged = e.select(
      col("user_id"), col("event_id"), col("tms"),
      when(col("tms") - lag(col("tms"), 1).over(w) > gapMs || lag(col("tms"), 1).over(w).isNull, 1)
        .otherwise(0).as("new_session"))
    val sessions = flagged.select(
      col("user_id"), col("tms"),
      sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("session_id"))
    val out = sessions.groupBy(col("user_id"), col("session_id"))
      .agg(min(col("tms")).as("start_ms"), max(col("tms")).as("end_ms"), count(lit(1)).as("n_events"))
    Det.ordered(out)
  }

  /** Time-bucket downsampling: per-hour per-series avg/max/count. */
  def downsample(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val out = e.groupBy(
        floor(tsMs(col("ts")) / 3600000L).as("hour_bucket"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(davg(col("value"), 4), 4).as("avg_value"),
        max(col("value")).as("max_value"))
    Det.ordered(out)
  }

  /** As-of join: each event matched to the user's most recent order at or
    * before the event time (nearest-preceding semantics). Formulated as
    * join + row_number so semantics are explicit; at 100 TB the same plan
    * pre-buckets both sides on user and sort-merges within buckets.
    */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).where(col("user_id") < 50)
      .select(col("event_id"), col("user_id"), tsMs(col("ts")).as("tms"))
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), tsMs(col("o_orderdate")).as("oms"))
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("oms").desc, col("o_orderkey").desc)
    val out = e.join(o, col("user_id") === col("o_custkey") && col("oms") <= col("tms"))
      .select(col("event_id"), col("user_id"), col("tms"), col("o_orderkey"), col("oms"),
        row_number().over(w).as("rn"))
      .where(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("o_orderkey"), col("oms").as("asof_order_ms"))
    Det.ordered(out)
  }

  /** The custom-plan as-of join ([[graft.plans.AsofJoin]]) on the same
    * inputs/output as [[asofJoin]] — one sort-merge pass, no candidate-pair
    * materialization. Falls back to the window formulation when the planner
    * strategy is not installed (no `GraftExtensions` in the session).
    */
  def asofJoinNative(s: SparkSession, d: String): DataFrame = {
    val hasStrategy = s.conf.getOption("spark.sql.extensions")
      .exists(_.contains("graft.functions.GraftExtensions"))
    if (!hasStrategy) return asofJoin(s, d)
    val e = Tables.events(s, d).where(col("user_id") < 50)
      .select(col("event_id"), col("user_id"), tsMs(col("ts")).as("tms"))
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), tsMs(col("o_orderdate")).as("oms"))
    val out = AsofJoinOps.asofJoin(e, o,
      leftKey = "user_id", rightKey = "o_custkey",
      leftTimeMs = "tms", rightTimeMs = "oms", rightTiebreaks = Seq("o_orderkey"))
      .select(col("event_id"), col("user_id"), col("o_orderkey"), col("oms").as("asof_order_ms"))
    Det.ordered(out)
  }

  /** Pivot: per-user conditional aggregation by event_type (explicit
    * conditional sums — one shuffle, no per-type scans).
    */
  def pivotAgg(s: SparkSession, d: String): DataFrame = {
    def bucket(t: String) =
      round(sum(when(col("event_type") === t, col("value")).otherwise(lit(0.0))
        .cast("decimal(18,4)")).cast("double"), 2).as(s"${t}_sum")
    val out = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(bucket("purchase"), bucket("click"), bucket("view"), bucket("signup"), bucket("error"),
        count(lit(1)).as("n"))
    Det.ordered(out)
  }

  /** Recursive CTE (Spark 4 WITH RECURSIVE): a calendar day spine generated
    * by recursion, left-joined to per-day counts — the classic dense-spine
    * idiom, demonstrating the iterative SQL surface. Recursion depth is the
    * day span (bounded); each step is one incremental union.
    */
  def recursiveSpine(s: SparkSession, d: String, startMs: Long, endMs: Long): DataFrame = {
    Tables.events(s, d).select(tsMs(col("ts")).as("tms"))
      .createOrReplaceTempView("events_ms")
    val firstDay = Math.floorDiv(startMs, Det.MsInDay)
    val lastDay = Math.floorDiv(endMs - 1, Det.MsInDay)
    s.sql(
      s"""WITH RECURSIVE days(day) AS (
            SELECT CAST($firstDay AS BIGINT)
            UNION ALL SELECT day + 1 FROM days WHERE day < CAST($lastDay AS BIGINT)
          ),
          c AS (SELECT CAST(floor(tms / ${Det.MsInDay}.0) AS BIGINT) AS day,
                       count(*) AS n
                FROM events_ms
                WHERE tms >= $startMs AND tms < $endMs GROUP BY 1)
          SELECT days.day AS day, coalesce(n, CAST(0 AS BIGINT)) AS n
          FROM days LEFT JOIN c ON days.day = c.day
          ORDER BY 1, 2""")
  }

  /** Ordered string aggregation (LISTAGG): each user's time-ordered journey
    * as a compact event-initial string — the sequence-mining input format.
    * One shuffle; the in-group order comes from sorting the collected
    * (time, id, char) structs, not from input order (which is partition-
    * dependent at scale).
    */
  def groupConcat(s: SparkSession, d: String): DataFrame = {
    val out = Tables.events(s, d).where(col("user_id") < 15)
      .select(col("user_id"), tsMs(col("ts")).as("tms"), col("event_id"),
        substring(col("event_type"), 1, 1).as("c"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        concat_ws("", transform(
          sort_array(collect_list(struct(col("tms"), col("event_id"), col("c")))),
          x => x.getField("c"))).as("journey"))
    Det.ordered(out)
  }

  /** rank vs dense_rank tie semantics: orders ranked by price within their
    * priority class — equal prices share a rank (and dense_rank closes the
    * gap), the ranking surface [[windowTopN]]'s row_number deliberately
    * avoids. Price is a 2-decimal exact value, so ties are engine-stable.
    */
  def windowRankDense(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice").desc)
    val out = Tables.orders(s, d).where(col("o_custkey") < 50)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).cast("bigint").as("price_rank"),
        dense_rank().over(w).cast("bigint").as("price_dense_rank"))
    Det.ordered(out)
  }

  /** Gaps-and-islands: maximal runs of consecutive same-type events per
    * user (row_number-difference grouping) — the state-machine companion to
    * time-gap [[sessionize]]. Both window passes share one (user) shuffle.
    */
  def gapsIslands(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tms"), col("event_id"))
    val wt = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("tms"), col("event_id"))
    val out = Tables.events(s, d).where(col("user_id") < 30)
      .select(col("user_id"), col("event_type"), col("event_id"), tsMs(col("ts")).as("tms"))
      .select(col("user_id"), col("event_type"), col("tms"),
        (row_number().over(w) - row_number().over(wt)).as("grp"))
      .groupBy(col("user_id"), col("event_type"), col("grp"))
      .agg(min(col("tms")).as("start_ms"), max(col("tms")).as("end_ms"),
        count(lit(1)).as("run_len"))
      .select(col("user_id"), col("event_type"), col("start_ms"), col("end_ms"),
        col("run_len"))
    Det.ordered(out)
  }

  /** Correlated scalar subquery: events above their own user's mean value.
    * Catalyst decorrelates this into an aggregate + join — the surface
    * matters (ported SQL keeps working), the plan is the efficient one. The
    * mean is an exact decimal sum over a double count, so the comparison
    * threshold is engine-independent.
    */
  def correlatedSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d).select(col("user_id"), col("value"))
      .createOrReplaceTempView("events_corr")
    val out = s.sql(
      """SELECT user_id, count(*) AS n_above
         FROM events_corr e
         WHERE value > (SELECT CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*)
                        FROM events_corr e2 WHERE e2.user_id = e.user_id)
         GROUP BY 1""")
    Det.ordered(out)
  }

  /** LATERAL correlated subquery with per-row ORDER BY/LIMIT — the "top-N
    * per key as a join" SQL surface (the window formulation is
    * [[windowTopN]]; plans converge on the same per-key limit).
    */
  def lateralTopN(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d).select(col("user_id"), col("event_id"), col("value"))
      .createOrReplaceTempView("events_lat")
    val out = s.sql(
      """SELECT u.user_id, l.event_id, l.value
         FROM (SELECT DISTINCT user_id FROM events_lat) u,
              LATERAL (SELECT event_id, value FROM events_lat e
                       WHERE e.user_id = u.user_id
                       ORDER BY value DESC, event_id LIMIT 2) l""")
    Det.ordered(out)
  }

  /** Unpivot (melt): the wide per-type sums from [[pivotAgg]] back to long
    * (user, metric, value) rows — the wide↔long round trip every reporting
    * layer needs. `unpivot` is a zero-shuffle Expand over the aggregate.
    */
  def unpivotAgg(s: SparkSession, d: String): DataFrame = {
    val wide = pivotAgg(s, d)
    val metricCols = wide.columns.filter(_.endsWith("_sum"))
    val out = wide.unpivot(
      Array(col("user_id")), metricCols.map(col), "metric", "type_sum")
    Det.ordered(out)
  }

  /** Exact linear-interpolation percentiles per group. */
  def percentiles(s: SparkSession, d: String): DataFrame = {
    val out = Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.95)"), 4).as("p95"),
        count(lit(1)).as("n"))
    Det.ordered(out)
  }

  /** Global top-K with a deterministic total order — single reduction, no
    * full sort of the fact table (Spark takes per-partition top-K then
    * merges).
    */
  def topkGlobal(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)
  }

  /** Existential semi-join (TPC-H Q4 shape): orders having at least one
    * late-shipped lineitem. `left_semi` keeps the probe side un-duplicated —
    * no fan-out, one shuffle on orderkey.
    */
  def semiJoin(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
    val out = o.join(l,
        col("l_orderkey") === col("o_orderkey") &&
        tsMs(col("l_shipdate")) > tsMs(col("o_orderdate")) + 90L * 86400000L,
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
    Det.ordered(out)
  }

  /** Anti-join: customers with no orders in 2001 (recency churn query). */
  def antiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") >= tsLit(978307200000L)) // 2001-01-01
      .select("o_custkey")
    val out = c.join(o, col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
    Det.ordered(out)
  }

  /** Hierarchical subtotals via ROLLUP — one pass, grouping-set expansion
    * handled by the aggregate, not repeated scans.
    */
  def rollupAgg(s: SparkSession, d: String): DataFrame = {
    val out = Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(dsum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
    out.orderBy(out.columns.map(c => col(c).asc_nulls_first): _*)
  }

  /** Semi-structured extraction: pull a typed field out of the JSON `props`
    * column and aggregate it — the scan-time JSON path every log/telemetry
    * pipeline needs (at 100 TB: push extraction to ingest or use variant
    * shredding; the operator shape is the same).
    */
  def jsonExtract(s: SparkSession, d: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("bigint")
    val out = Tables.events(s, d)
      .select(col("event_type"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n"), min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        sum(col("k")).as("sum_k"))
    Det.ordered(out)
  }

  /** CUBE: all grouping-set combinations of (returnflag, linestatus) in one
    * pass — the OLAP cross-tab companion to [[rollupAgg]].
    */
  def cubeAgg(s: SparkSession, d: String): DataFrame = {
    val out = Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(dsum(col("l_quantity")), 2).as("sum_qty"),
        round(dsum(col("l_extendedprice")), 2).as("sum_price"), count(lit(1)).as("n"))
    out.orderBy(out.columns.map(c => col(c).asc_nulls_first): _*)
  }

  /** Second-moment statistics per group — stddev and correlation — computed
    * from exact DECIMAL partial sums so the result is independent of
    * aggregation order (built-in stddev/corr accumulate doubles, whose
    * association order differs per engine/partitioning). The decimal sums
    * are the same single-shuffle partial-aggregate shape.
    */
  def statsAgg(s: SparkSession, d: String): DataFrame = {
    val v = col("value").cast("decimal(9,4)")
    val u = col("user_id").cast("decimal(9,0)")
    val agg = Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(v).cast("double").as("sv"),
        sum(v * v).cast("double").as("svv"),
        sum(u).cast("double").as("su"),
        sum(u * u).cast("double").as("suu"),
        sum(v * u).cast("double").as("svu"))
    val n = col("n").cast("double")
    val out = agg.select(
      col("event_type"), col("n"),
      // Det.rnd: stddev/corr are division-derived doubles — plain round()
      // diverges from DuckDB within one ulp of a .5 boundary (ADVICE r2)
      Det.rnd(sqrt((col("svv") - col("sv") * col("sv") / n) / (n - 1.0)), 4).as("stddev_value"),
      Det.rnd((n * col("svu") - col("sv") * col("su")) /
        (sqrt(n * col("svv") - col("sv") * col("sv")) *
         sqrt(n * col("suu") - col("su") * col("su"))), 4).as("corr_value_user"))
    Det.ordered(out)
  }

  /** first/last/nth value window functions over an explicit frame — the
    * "open/close/second print" per key-ordered-by-time primitive.
    */
  def windowFirstLast(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).where(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), tsMs(col("ts")).as("tms"), col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("tms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val out = e.select(
      col("user_id"), col("event_id"), col("tms"),
      first(col("value")).over(w).as("first_value"),
      last(col("value")).over(w).as("last_value"),
      nth_value(col("value"), 2).over(w).as("second_value"))
    Det.ordered(out)
  }

  /** As-of join with a staleness tolerance: the nearest preceding order, but
    * only if it is at most `tolMs` old — rows whose best match is staler
    * drop (pandas merge_asof(tolerance=...) semantics).
    */
  def asofTolerance(s: SparkSession, d: String, tolMs: Long = 90L * 86400000L): DataFrame = {
    val e = Tables.events(s, d).where(col("user_id") < 50)
      .select(col("event_id"), col("user_id"), tsMs(col("ts")).as("tms"))
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), tsMs(col("o_orderdate")).as("oms"))
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("oms").desc, col("o_orderkey").desc)
    val out = e.join(o, col("user_id") === col("o_custkey") &&
        col("oms") <= col("tms") && col("oms") >= col("tms") - tolMs)
      .select(col("event_id"), col("user_id"), col("tms"), col("o_orderkey"), col("oms"),
        row_number().over(w).as("rn"))
      .where(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("o_orderkey"), col("oms").as("asof_order_ms"))
    Det.ordered(out)
  }

  /** Ordered funnel: users who viewed, then clicked after the first view,
    * then purchased after that first click. Three conditional min-aggregates
    * over one shuffle key (user) — no per-stage rescans of the fact table.
    */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), tsMs(col("ts")).as("tms"))
    val stages = e.groupBy(col("user_id")).agg(
      min(when(col("event_type") === "view", col("tms"))).as("v_ms"))
    val clicks = e.where(col("event_type") === "click")
      .join(stages.where(col("v_ms").isNotNull), "user_id")
      .where(col("tms") > col("v_ms"))
      .groupBy(col("user_id")).agg(min(col("tms")).as("c_ms"))
    val purchases = e.where(col("event_type") === "purchase")
      .join(clicks, "user_id")
      .where(col("tms") > col("c_ms"))
      .groupBy(col("user_id")).agg(min(col("tms")).as("p_ms"))
    stages.where(col("v_ms").isNotNull).agg(count(lit(1)).as("n_view"))
      .crossJoin(clicks.agg(count(lit(1)).as("n_click_after_view")))
      .crossJoin(purchases.agg(count(lit(1)).as("n_purchase_after_click")))
  }

  /** Cohort retention: users grouped by first-seen week, counted per
    * subsequent active week — the (cohort, offset) retention matrix.
    */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), (floor(tsMs(col("ts")) / Det.MsInDay / 7) * 7).as("week"))
    val cohort = e.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    val active = e.distinct()
    val out = active.join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        ((col("week") - col("cohort_week")) / 7).cast("bigint").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    Det.ordered(out)
  }

  /** Sketch-based quantiles (percentile_approx / GK summary): the bounded-
    * memory companion to the exact [[percentiles]] — at 100 TB the exact
    * sort-based percentile is a full shuffle of the value column, the sketch
    * is a mergeable per-partition summary. Estimates are engine-specific ⇒
    * verified rows-only, like approx_distinct.
    */
  def approxQuantile(s: SparkSession, d: String): DataFrame = {
    val out = Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        percentile_approx(col("value"),
          array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)).as("approx_pcts"))
    Det.ordered(out.select(col("event_type"), col("n"),
      round(element_at(col("approx_pcts"), 1), 4).as("p50"),
      round(element_at(col("approx_pcts"), 2), 4).as("p95"),
      round(element_at(col("approx_pcts"), 3), 4).as("p99")))
  }

  /** Time-to-next-event per user (lead): the dwell/inter-arrival metric —
    * one sort per user key, null for each user's last event.
    */
  def windowLead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tms"), col("event_id"))
    val out = Tables.events(s, d).where(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), col("event_type"), tsMs(col("ts")).as("tms"))
      .select(col("user_id"), col("event_id"), col("event_type"), col("tms"),
        (lead(col("tms"), 1).over(w) - col("tms")).as("ms_to_next"))
    Det.ordered(out)
  }

  /** GROUPING SETS: explicit subtotal dimensions in one pass — the general
    * form of which ROLLUP/CUBE are specializations. Expressed in SQL (the
    * DataFrame API exposes only rollup/cube); still one Catalyst Expand +
    * single-shuffle aggregate.
    */
  def groupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_gs")
    val out = s.sql(
      """SELECT l_returnflag, l_linestatus,
                round(cast(sum(cast(l_quantity as decimal(18,4))) as double), 2) AS sum_qty,
                count(*) AS n
         FROM lineitem_gs
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")
    out.orderBy(out.columns.map(c => col(c).asc_nulls_first): _*)
  }

  /** Distribution ranks per group: quartile (ntile), percent_rank and
    * cume_dist over a deterministic (value, id) order — one sort per key.
    */
  def ntileStats(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    val out = Tables.events(s, d).where(col("user_id") < 10)
      .select(col("event_type"), col("event_id"), col("value"),
        ntile(4).over(w).cast("bigint").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume_dist"))
    Det.ordered(out)
  }

  /** Relational set algebra: users who viewed AND clicked but never
    * purchased — (view ∩ click) ∖ purchase as INTERSECT/EXCEPT, which plan
    * as aggregate + semi/anti joins.
    */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    def users(t: String) =
      e.where(col("event_type") === t).select(col("user_id")).distinct()
    Det.ordered(users("view").intersect(users("click")).except(users("purchase")))
  }

  /** Mode (most frequent value) per group with deterministic ties — the
    * ordered-set aggregate engines bolt on; here one count-shuffle + one
    * per-key top-1.
    */
  def modePerGroup(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("n").desc, col("event_type"))
    val out = counts
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("mode_event"), col("n"))
    Det.ordered(out)
  }

  /** Deterministic ~10% Bernoulli sample keyed on md5(event_id) — the
    * reproducible-sampling primitive for experiment holdouts: membership is
    * a pure function of the row key, so any engine or rerun selects the same
    * rows. Aggregated per type to verify the selection, not the row dump.
    */
  def sampleHash(s: SparkSession, d: String): DataFrame = {
    val bucket = conv(substring(md5(col("event_id").cast("string")), 1, 2), 16, 10)
      .cast("int")
    val out = Tables.events(s, d)
      .where(bucket < 26) // 26/256 ≈ 10.2%
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(dsum(col("value")), 2).as("sum_value"))
    Det.ordered(out)
  }

  /** HAVING over an aggregated subquery joined back to facts (TPC-H Q18
    * shape): orders whose total quantity exceeds a threshold, with customer
    * attribution. The HAVING filter runs on the aggregate side BEFORE the
    * join, so only qualifying keys join back.
    */
  def q18Having(s: SparkSession, d: String, minQty: Double = 300.0): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(round(dsum(col("l_quantity")), 2).as("total_qty"))
      .where(col("total_qty") > minQty)
    val out = big
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        tsMs(col("o_orderdate")).as("o_orderdate_ms"), col("total_qty"))
    Det.ordered(out)
  }

  /** TPC-H Q7 shape (volume shipping): revenue flowing between two specific
    * nations, either direction, grouped by (supplier nation, customer
    * nation, year bucket). Exercises a disjunctive join predicate over two
    * broadcast nation dims on opposite sides of the fact chain. The year
    * bucket is pure epoch-day arithmetic (ms div 365 days) so no calendar
    * library has to agree across engines.
    */
  def q7Volume(s: SparkSession, d: String,
               nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
    val sup = Tables.supplier(s, d).join(broadcast(n),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(s, d).join(broadcast(n),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val out = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"),
        col("l_discount"), tsMs(col("l_shipdate")).as("ship_ms"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .where((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
             (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        expr("ship_ms div 31536000000").as("year_bucket"))
      .agg(count(lit(1)).as("n_items"),
        round(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
    Det.ordered(out)
  }

  /** Market-basket lift over part brands: for brand pairs co-occurring in
    * an order, lift = P(a,b) / (P(a)·P(b)) — >1 means the pair travels
    * together. The pair explode is bounded by order size (≤ C(13,2) here),
    * brands come from a broadcast part join, and the global top-N is a
    * TakeOrdered. All inputs are integer counts; lift is one rounded
    * division.
    */
  def marketBasket(s: SparkSession, d: String, topN: Int = 20): DataFrame = {
    // r18 (guide §2.4/§8): the old shape materialized the distinct
    // (order, brand) table and SELF-JOINED it on the order key — the
    // distinct shuffle, two join exchanges and the pair-count shuffle all
    // carried order-level rows (measured 20 jobs / 2.5 s at sf0.1). The
    // rewrite collapses to ONE shuffle of (okey, brand) rows: collect_set
    // per order dedups in the same aggregation (map-side partial), and the
    // ≤C(13,2) pair fan-out is an in-row array enumeration over the sorted
    // brand set — identical pair multiset ((a<b) once per order), identical
    // per-brand and order counts, no order-keyed join anywhere. The brand
    // roster frame is referenced three times in one plan, so its single
    // exchange is reused (ReuseExchange), never recomputed.
    val byOrder = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("okey"), col("p_brand"))
      .groupBy(col("okey"))
      .agg(sort_array(collect_set(col("p_brand"))).as("bs"))
    val nOrders = byOrder.select(count(lit(1)).as("n_orders"))
    val per = byOrder.select(explode(col("bs")).as("p_brand"))
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n_brand"))
    val pairs = byOrder
      .select(explode(flatten(transform(col("bs"), (a, i) =>
        transform(slice(col("bs"), i + 2, size(col("bs"))), b =>
          struct(a.as("brand_a"), b.as("brand_b")))))).as("p"))
      .groupBy(col("p.brand_a").as("brand_a"), col("p.brand_b").as("brand_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(per.select(col("p_brand").as("brand_a"), col("n_brand").as("n_a")), "brand_a")
      .join(per.select(col("p_brand").as("brand_b"), col("n_brand").as("n_b")), "brand_b")
      .crossJoin(nOrders)
      .select(col("brand_a"), col("brand_b"), col("n_both"),
        Det.rnd((col("n_both") * col("n_orders")) / (col("n_a") * col("n_b")), 4)
          .as("lift"))
      .orderBy(col("lift").desc, col("brand_a"), col("brand_b"))
      .limit(topN)
  }

  /** DAU / WAU stickiness: daily active users and the trailing-7-day active
    * set per day, plus their ratio. The rolling DISTINCT is a MAP-SIDE
    * explode: each (day, user) activity row fans out to the 7 window days it
    * contributes to (`explode(sequence(day, day+6))`), then one
    * count_distinct per day — a fixed 7× fan-out with NO join at all (the
    * `between` band-join alternative plans as a nested-loop that evaluates
    * every day against every row). Days beyond the last activity day fall
    * out in the inner join with the DAU table.
    */
  def dauWau(s: SparkSession, d: String): DataFrame = {
    val du = Tables.events(s, d)
      .select(tsMs(col("ts")).as("tms"), col("user_id"))
      .select(expr(s"tms div ${Det.MsInDay}").as("day"), col("user_id"))
      .distinct().cache()
    val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = du
      .select(explode(sequence(col("day"), col("day") + 6)).as("d"), col("user_id"))
      .groupBy(col("d")).agg(countDistinct(col("user_id")).as("wau"))
    val out = dau.join(wau, dau("day") === wau("d"))
      .select((col("day") * Det.MsInDay).as("day_ms"), col("dau"), col("wau"),
        Det.rnd(col("dau") / col("wau"), 4).as("stickiness"))
    Det.ordered(out)
  }

  /** Audience overlap: Jaccard similarity between event types' user bases —
    * "do clickers also purchase?" as a set-similarity matrix. One distinct
    * (type, user) pass, a user-keyed self-join for intersections, Jaccard
    * from exact counts.
    */
  def audienceOverlap(s: SparkSession, d: String): DataFrame = {
    val ua = Tables.events(s, d)
      .select(col("event_type"), col("user_id")).distinct().cache()
    val sizes = ua.groupBy(col("event_type")).agg(count(lit(1)).as("n_users"))
    val inter = ua.as("a").join(ua.as("b"),
        col("a.user_id") === col("b.user_id") &&
        col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    val out = inter
      .join(sizes.select(col("event_type").as("type_a"), col("n_users").as("n_a")), "type_a")
      .join(sizes.select(col("event_type").as("type_b"), col("n_users").as("n_b")), "type_b")
      .select(col("type_a"), col("type_b"), col("n_both"),
        Det.rnd(col("n_both") / (col("n_a") + col("n_b") - col("n_both")), 4)
          .as("jaccard"))
    Det.ordered(out)
  }

  /** Join-key skew diagnostic — the pre-flight check before any big join:
    * the frequency distribution of a join key (here lineitem.l_orderkey),
    * reduced to max/p50/p99 multiplicity and the hottest key's share of all
    * rows. Two aggregations (key counts, then distribution stats); the
    * decision it feeds is "salt or broadcast?" before shuffling 100 TB.
    */
  def skewStats(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
    val out = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("c")).as("n_rows"),
      max(col("c")).as("max_mult"),
      expr("percentile(c, 0.5)").as("p50_mult_raw"),
      expr("percentile(c, 0.99)").as("p99_mult_raw"))
      .select(col("n_keys"), col("n_rows"), col("max_mult"),
        Det.rnd(col("p50_mult_raw"), 4).as("p50_mult"),
        Det.rnd(col("p99_mult_raw"), 4).as("p99_mult"),
        Det.rnd(col("max_mult") / col("n_rows"), 8).as("top_key_share"))
    out
  }

  /** [[skewStats]] at extreme key cardinality: exact `percentile` buffers
    * every per-key count in one aggregation buffer — fine while the KEY
    * table is small, quadratic pain when the join key has billions of
    * distinct values. This twin swaps in `approx_percentile` (Greenwald-
    * Khanna sketch, bounded memory, mergeable partials) — the form the
    * pre-flight check runs at 100 TB. Estimate by construction ⇒ rows-only,
    * property-bounded against the exact twin in the test suite.
    */
  def skewStatsApprox(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
    counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("c")).as("n_rows"),
      max(col("c")).as("max_mult"),
      expr("approx_percentile(c, 0.5, 10000)").cast("double").as("p50_mult"),
      expr("approx_percentile(c, 0.99, 10000)").cast("double").as("p99_mult"))
      .select(col("n_keys"), col("n_rows"), col("max_mult"),
        col("p50_mult"), col("p99_mult"),
        Det.rnd(col("max_mult") / col("n_rows"), 8).as("top_key_share"))
  }

  /** RFM customer segmentation (recency / frequency / monetary), the
    * classic warehouse scoring query: per customer the days since last
    * order, order count, and total spend, each scored 1-4 against the
    * corpus quartile CUT POINTS. The cut points are a broadcast scalar row
    * (exact percentiles of the per-customer table) and scoring is pure
    * comparison — NO global ntile sort, so the plan has no single-partition
    * stage (the trap ts_top_series fixed in r3). Reference day is the max
    * order date, also carried in-plan.
    */
  def rfmSegments(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), tsMs(col("o_orderdate")).as("oms"), col("o_totalprice"))
    val maxDay = o.select(max(col("oms")).as("ref_ms"))
    val per = o.groupBy(col("o_custkey"))
      .agg(max(col("oms")).as("last_ms"), count(lit(1)).as("frequency"),
        round(dsum(col("o_totalprice")), 2).as("monetary"))
      .crossJoin(maxDay)
      .select(col("o_custkey"),
        // day diffs are exact multiples of MsInDay -> the quotient is an
        // exact integer double; floor (not cast) because DuckDB CAST rounds
        // while Spark CAST truncates
        floor((col("ref_ms") - col("last_ms")) / lit(Det.MsInDay.toDouble))
          .cast("bigint").as("recency_days"),
        col("frequency"), col("monetary"))
    val cuts = per.agg(
      Det.rnd(expr("percentile(recency_days, 0.25)"), 4).as("r1"),
      Det.rnd(expr("percentile(recency_days, 0.5)"), 4).as("r2"),
      Det.rnd(expr("percentile(recency_days, 0.75)"), 4).as("r3"),
      Det.rnd(expr("percentile(frequency, 0.25)"), 4).as("f1"),
      Det.rnd(expr("percentile(frequency, 0.5)"), 4).as("f2"),
      Det.rnd(expr("percentile(frequency, 0.75)"), 4).as("f3"),
      Det.rnd(expr("percentile(monetary, 0.25)"), 4).as("m1"),
      Det.rnd(expr("percentile(monetary, 0.5)"), 4).as("m2"),
      Det.rnd(expr("percentile(monetary, 0.75)"), 4).as("m3"))
    def q(c: Column, c1: Column, c2: Column, c3: Column): Column =
      (lit(1L) + when(c > c1, 1L).otherwise(0L) + when(c > c2, 1L).otherwise(0L) +
        when(c > c3, 1L).otherwise(0L))
    val out = per.crossJoin(cuts)
      .select(col("o_custkey"), col("recency_days"), col("frequency"), col("monetary"),
        q(col("recency_days"), col("r1"), col("r2"), col("r3")).as("r_quartile"),
        q(col("frequency"), col("f1"), col("f2"), col("f3")).as("f_quartile"),
        q(col("monetary"), col("m1"), col("m2"), col("m3")).as("m_quartile"))
    Det.ordered(out)
  }

  /** Time-bounded ordered funnel (ClickHouse `windowFunnel` semantics):
    * stage 2 must follow the user's FIRST view, stage 3 must follow that
    * click, and everything must land inside `windowMs` of the view. Three
    * conditional-min aggregations chained by join-backs — each stage is one
    * shuffle on user_id, and the per-stage tables shrink monotonically (only
    * users who reached stage k join stage k+1).
    */
  def windowFunnel(s: SparkSession, d: String, windowMs: Long = 86400000L): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), tsMs(col("ts")).as("tms"))
    val v = e.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tms")).as("v_ms"))
    val c = e.join(v, "user_id")
      .where(col("event_type") === "click" &&
        col("tms") >= col("v_ms") && col("tms") < col("v_ms") + windowMs)
      .groupBy(col("user_id")).agg(min(col("tms")).as("c_ms"))
    val p = e.join(v, "user_id").join(c, "user_id")
      .where(col("event_type") === "purchase" &&
        col("tms") >= col("c_ms") && col("tms") < col("v_ms") + windowMs)
      .groupBy(col("user_id")).agg(min(col("tms")).as("p_ms"))
    val staged = v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("p_ms").isNotNull, 3L)
          .when(col("c_ms").isNotNull, 2L).otherwise(1L).as("stage"))
    val out = staged.groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
    Det.ordered(out)
  }

  /** Event-transition matrix (Markov journey analytics): for each user's
    * time-ordered event stream, count consecutive event_type transitions
    * globally and derive the per-origin transition probability. One sort
    * per user partition for the lead, one count shuffle, and a tiny window
    * over the |types|² matrix for the row-normalization — the classic
    * "where do users go next" product query.
    */
  def sessionPath(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tms"), col("event_id"))
    val trans = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), tsMs(col("ts")).as("tms"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val wf = Window.partitionBy(col("from_type"))
    val out = trans.select(col("from_type"), col("to_type"), col("n_transitions"),
      Det.rnd(col("n_transitions") / sum(col("n_transitions")).over(wf), 4).as("p"))
    Det.ordered(out)
  }

  /** Range (interval) join: pairs of events of the same user within a
    * 6-hour forward window. Equi-key (user) + band predicate; at scale the
    * band is additionally bucketed by coarse time block to bound the join
    * fan-out.
    */
  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    // Time-bucketed range join: a plain (user, range) join is an equi-join
    // on user with the range as a RESIDUAL filter, so sort-merge enumerates
    // ALL same-user pairs — sum(n_u^2) candidates, which is what made this
    // query grow 17x on a 10x dataset (sf0.1 -> sf1 rehearsal, r13). Adding
    // a window-sized time cell to the join key bounds candidates to the
    // matching + adjacent cell: b_ms in [a_ms, a_ms+W) implies
    // floor(b_ms/W) is floor(a_ms/W) or that +1, so duplicating the b side
    // once per reachable cell (2x one side) replaces the residual scan —
    // candidates now track events per 2W of time per user, not per user
    // history. The interval-join build every streaming/range engine uses;
    // output provably identical (the range predicate still applies).
    val W = 21600000L // 6h window
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"), tsMs(col("ts")).as("tms"))
    val a = e.select(col("user_id").as("a_user"), col("event_id").as("a_id"),
      col("event_type").as("a_type"), col("tms").as("a_ms"),
      floor(col("tms") / W).cast("long").as("a_cell"))
    val b = e.select(col("user_id").as("b_user"), col("event_id").as("b_id"),
      col("event_type").as("b_type"), col("tms").as("b_ms"))
      .withColumn("b_cell", explode(array(
        floor(col("b_ms") / W).cast("long"),
        floor(col("b_ms") / W).cast("long") - 1)))
    val out = a.join(b,
        col("a_user") === col("b_user") && col("a_cell") === col("b_cell") &&
        col("a_id") =!= col("b_id") &&
        col("b_ms") >= col("a_ms") && col("b_ms") < col("a_ms") + W)
      .groupBy(col("a_type"), col("b_type"))
      .agg(count(lit(1)).as("n_pairs"))
    Det.ordered(out)
  }

  /** Cheapest-supplier-per-part (TPC-H Q2 shape, minus the partsupp table —
    * unit price is derived from lineitem). The correlated "price = (SELECT
    * min(price) ...)" subquery is expressed DIRECTLY as its decorrelated
    * form: a min-window over the part key, then rank-1 filter — the plan
    * Catalyst would rewrite the subquery into, with no second scan of the
    * fact table. Supplier/nation/region dims broadcast; one shuffle on
    * l_partkey feeds both the window and the final ordering's TakeOrdered.
    */
  def q2MinCost(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).where(col("p_size") < 10)
      .select("p_partkey", "p_name", "p_brand")
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_name", "s_nationkey")
    val n = Tables.nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
    val r = Tables.region(s, d).where(col("r_name") === "EUROPE")
    val offers = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"),
        Det.rnd(col("l_extendedprice") / col("l_quantity"), 4).as("unit_price"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
    val w = Window.partitionBy(col("p_partkey"))
      .orderBy(col("unit_price"), col("s_suppkey"))
    val out = offers
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("s_name"), col("n_name"), col("unit_price").as("min_unit_price"))
    Det.ordered(out)
  }

  /** Returned-item revenue report (TPC-H Q10 shape): customers ranked by
    * revenue lost to returns in a quarter. Orders filtered to the window,
    * lineitem to returnflag='R'; customer/nation broadcast; one orderkey
    * shuffle + one custkey aggregate, then global top-20 via TakeOrdered
    * (no full sort).
    */
  def q10Returns(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") >= tsLit(812505600000L) &&  // 1995-10-01
             col("o_orderdate") < tsLit(820454400000L))     // 1996-01-01
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(s, d).where(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val c = Tables.customer(s, d).select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val n = Tables.nation(s, d).select("n_nationkey", "n_name")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(round(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Supplier-count-per-part-class (TPC-H Q16 shape): distinct suppliers
    * able to supply each (brand, type-prefix, size) class, excluding an
    * unwanted brand and a "complaints" supplier set via broadcast ANTI join
    * — the not-in-subquery expressed as the plan you'd want (no null-aware
    * nested loop). Supply relationships derive from lineitem; one distinct
    * + one count-distinct aggregate, both partial.
    */
  def q16SupplierCount(s: SparkSession, d: String): DataFrame = {
    val bad = Tables.supplier(s, d).where(col("s_name").like("%7%"))
      .select(col("s_suppkey").as("bad_key"))
    val p = Tables.part(s, d)
      .where(col("p_brand") =!= "Brand#1" && col("p_size").isin(1, 4, 7))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val out = Tables.lineitem(s, d).select("l_partkey", "l_suppkey")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(bad), col("l_suppkey") === col("bad_key"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    Det.ordered(out)
  }

  /** Revenue-change forecast (TPC-H Q6 shape): pure filter + single
    * aggregate — the query whose entire cost is the scan, so the plan's
    * worth is measured by what reaches the parquet reader (shipdate range,
    * discount band and quantity cap all push down; 3-column ReadSchema).
    */
  def q6ForecastRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_shipdate") >= tsLit(820454400000L) &&  // 1996-01-01
             col("l_shipdate") < tsLit(852076800000L) &&   // 1997-01-01
             col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
             col("l_quantity") < 24)
      .agg(round(dsum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  /** Promotion revenue share (TPC-H Q14 shape): conditional aggregate over
    * a broadcast dim join — the CASE rides the same exact-decimal partial
    * sums as the total, so the ratio is engine-exact before rounding.
    */
  def q14PromoShare(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).select("p_partkey", "p_type")
    val promo = when(col("p_type") === "PROMO",
      col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(lit(0.0))
    Tables.lineitem(s, d)
      .where(col("l_shipdate") >= tsLit(841536000000L) &&  // 1996-09-01
             col("l_shipdate") < tsLit(844128000000L))     // 1996-10-01
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(Det.rnd(dsum(promo) * lit(100.0) /
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("promo_revenue_pct"))
  }

  /** Discount-bracket revenue (TPC-H Q19 shape): a disjunction of
    * (brand × quantity-band × size-band) brackets evaluated AFTER one
    * equi-join on partkey — the OR never degrades the join into a nested
    * loop; the small filtered part dim broadcasts and each bracket reports
    * its own revenue (grouped, unlike Q19's single sum, so the oracle
    * checks per-bracket routing too).
    */
  def q19Brackets(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).where(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
      .select("p_partkey", "p_brand", "p_size")
    val l = Tables.lineitem(s, d)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val bracket =
      when(col("p_brand") === "Brand#1" &&
        col("l_quantity").between(1, 11) && col("p_size").between(1, 5), lit(1L))
      .when(col("p_brand") === "Brand#2" &&
        col("l_quantity").between(10, 20) && col("p_size").between(1, 10), lit(2L))
      .when(col("p_brand") === "Brand#3" &&
        col("l_quantity").between(20, 30) && col("p_size").between(1, 15), lit(3L))
    val out = l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .withColumn("bracket", bracket)
      .where(col("bracket").isNotNull)
      .groupBy(col("bracket"))
      .agg(count(lit(1)).as("n_lines"),
        round(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
    Det.ordered(out)
  }

  /** Top supplier by quarterly revenue (TPC-H Q15 shape): the revenue view
    * + its correlated max expressed as aggregate → scalar-max broadcast →
    * equality join back — no global sort, no second fact scan; ties all
    * surface (the Q15 contract).
    */
  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= tsLit(820454400000L) &&  // 1996-01-01
             col("l_shipdate") < tsLit(828316800000L))     // 1996-04-01
      .groupBy(col("l_suppkey"))
      .agg(round(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("max_rev"))
    val out = rev.join(broadcast(mx), col("total_revenue") === col("max_rev"))
      .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
    Det.ordered(out)
  }

  /** Small-quantity revenue loss (TPC-H Q17 shape): lineitems under 20% of
    * their part's average quantity — the correlated per-part AVG subquery
    * decorrelated into one tiny aggregate that broadcasts back onto the
    * fact scan; one scalar result row.
    */
  def q17SmallQty(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).where(col("p_brand") === "Brand#4").select("p_partkey")
    val l = Tables.lineitem(s, d)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val avgq = l.groupBy(col("l_partkey").as("a_key"))
      .agg(Det.davg(col("l_quantity"), 4).as("avg_qty"))
    l.join(broadcast(avgq), col("l_partkey") === col("a_key"))
      .where(col("l_quantity") < col("avg_qty") * lit(0.2))
      .agg(Det.rnd(dsum(col("l_extendedprice")) / lit(7.0), 2).as("avg_yearly"))
  }

  /** Activity concentration: the top-decile "power users" versus everyone
    * else, with each segment's share of total events — the engagement
    * concentration report (an 80/20 check) built on the broadcast exact
    * cut-point pattern (`rfm_segments`): no global ntile sort, one
    * per-user aggregate and one two-row rollup.
    */
  def powerUsers(s: SparkSession, d: String): DataFrame = {
    val per = Tables.events(s, d).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
    val cut = per.agg(Det.rnd(expr("percentile(n, 0.9)"), 4).as("p90"))
    val tot = per.agg(sum(col("n")).as("total"))
    val out = per.crossJoin(broadcast(cut)).crossJoin(broadcast(tot))
      .withColumn("segment",
        when(col("n") >= col("p90"), lit("power")).otherwise(lit("regular")))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"),
        Det.rnd(sum(col("n")) * lit(1.0) / max(col("total")), 4).as("event_share"))
    Det.ordered(out)
  }

  /** National market share (TPC-H Q8 shape): one nation's share of a
    * region's import revenue per year — the CASE-ratio aggregate over a
    * five-way star join with every dimension broadcast; years are 365-day
    * ms-arithmetic buckets (no calendar parity risk). Numerator and
    * denominator ride the same exact-decimal partial sums.
    */
  def q8MarketShare(s: SparkSession, d: String, nation: String = "NATION_3",
                    region: String = "EUROPE"): DataFrame = {
    val n = Tables.nation(s, d)
    val rg = Tables.region(s, d).where(col("r_name") === region)
    val custEu = Tables.customer(s, d)
      .join(broadcast(n.select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(rg), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val sup = Tables.supplier(s, d)
      .join(broadcast(n.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val out = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .join(Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), tsMs(col("o_orderdate")).as("ord_ms")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custEu), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(expr("ord_ms div 31536000000").as("year_bucket"))
      .agg(
        round(dsum(when(col("supp_nation") === nation, rev).otherwise(lit(0.0))), 2)
          .as("nation_revenue"),
        round(dsum(rev), 2).as("total_revenue"))
      .select(col("year_bucket"), col("nation_revenue"), col("total_revenue"),
        Det.rnd(col("nation_revenue") / col("total_revenue"), 4).as("mkt_share"))
    Det.ordered(out)
  }

  /** Customer order-count distribution (TPC-H Q13 shape): LEFT join so
    * zero-order customers survive into the c_count=0 bucket, then the
    * two-level aggregate — the canonical histogram-of-counts plan (both
    * aggregates partial; the second runs on ≤|distinct counts| rows).
    */
  def q13OrderDist(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.customer(s, d).select(col("c_custkey"))
      .join(Tables.orders(s, d)
        .where(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    val out = counts.groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
    Det.ordered(out)
  }

  /** Excess-share promo suppliers (TPC-H Q20 shape): suppliers providing
    * more than 20% of some promo part's total volume — the
    * aggregate → threshold → LEFT SEMI chain (Q20's nested EXISTS done as
    * the plan you'd want: the per-(part, supplier) and per-part aggregates
    * share the partkey shuffle, the surviving supplier ids semi-join the
    * dim, nation broadcast for the rollup).
    */
  def q20PromoSuppliers(s: SparkSession, d: String): DataFrame = {
    val promo = Tables.part(s, d).where(col("p_type") === "PROMO").select("p_partkey")
    val li = Tables.lineitem(s, d)
      .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_suppkey", "l_quantity")
    // r19 REVERT of the r18 window-over-partials shape (VERDICT r18 #2/#5):
    // the isolating interleaved A/B (plans/r19/q20_isolate_ab.txt, three
    // sessions, sentinel-anchored) measured the r17 aggregate-then-rejoin
    // consistently FASTER (min 1.42-1.54 s vs 1.48-1.72 s) — the window's
    // sort over the partkey exchange costs more than the second partial
    // aggregate sharing the same shuffle. Both shapes are digest-identical
    // (Σ of per-supplier decimal sums ≡ the flat per-part decimal sum).
    val perSup = li.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(round(Det.dsum(col("l_quantity")), 2).as("sup_qty"))
    val perPart = li.groupBy(col("l_partkey").as("t_partkey"))
      .agg(round(Det.dsum(col("l_quantity")), 2).as("tot_qty"))
    val heavy = perSup.join(perPart, col("l_partkey") === col("t_partkey"))
      .where(col("sup_qty") > col("tot_qty") * lit(0.2))
      .select(col("l_suppkey")).distinct()
    val out = Tables.supplier(s, d)
      .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"))
    Det.ordered(out)
  }

  /** Idle wealthy customers (TPC-H Q22 shape): above-average-balance
    * customers with no orders in a window — the scalar AVG broadcasts, the
    * NOT EXISTS is a plain LEFT ANTI join on custkey (never the null-aware
    * nested loop a NOT IN over a nullable key degenerates into). Grouped by
    * market segment like Q22's country-code rollup.
    */
  def q22IdleCustomers(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val avgBal = c.where(col("c_acctbal") > 0.0)
      .agg(Det.davg(col("c_acctbal"), 4).as("avg_bal"))
    val recent = Tables.orders(s, d)
      .where(col("o_orderdate") >= tsLit(978307200000L))  // 2001-01-01
      .select(col("o_custkey")).distinct()
    val out = c.crossJoin(broadcast(avgBal))
      .where(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_custs"),
        round(dsum(col("c_acctbal")), 2).as("total_bal"))
    Det.ordered(out)
  }

  /** Last-touch attribution: each purchase credited to the user's most
    * recent click within the lookback window — the as-of join expressed as
    * a per-user window over the merged event stream (one shuffle on user,
    * one sort; no self-join). Revenue rolls up to the attributed click's
    * hour for the channel-report shape.
    */
  def eventAttribution(s: SparkSession, d: String, lookbackMs: Long = 86400000L): DataFrame = {
    val e = Tables.events(s, d)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        tsMs(col("ts")).as("tms"), col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("tms"), col("event_id"))
    val lastClick = when(col("event_type") === "click", col("tms"))
    val tagged = e
      .withColumn("click_ms", last(lastClick, ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .where(col("event_type") === "purchase")
      .where(col("click_ms").isNotNull && col("tms") - col("click_ms") <= lookbackMs)
    val out = tagged
      .groupBy(floor(col("click_ms") / 3600000L).as("click_hour"))
      .agg(count(lit(1)).as("n_purchases"),
        round(dsum(col("value")), 2).as("attributed_revenue"))
    Det.ordered(out)
  }

  /** Linear multi-touch attribution — [[eventAttribution]]'s last-touch
    * rule gives the final click ALL the credit; here every click inside
    * the lookback before a purchase shares it equally (credit = value/n),
    * the other standard attribution model and the one that values
    * upper-funnel touches. One user-keyed range join (the as-of family's
    * shuffle shape: purchases × their own lookback window, never a
    * cartesian), a per-purchase touch count as a window over the join
    * output, exact-decimal credit sums per click hour. Credits are 4-dp
    * rounded BEFORE the hour aggregate so per-purchase splits replay
    * bit-exactly cross-engine.
    */
  def attributionMultiTouch(s: SparkSession, d: String,
                            lookbackMs: Long = 86400000L): DataFrame = {
    val e = Tables.events(s, d)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        tsMs(col("ts")).as("tms"), col("value"))
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("tms").as("p_ms"), col("value"))
    val clicks = e.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("tms").as("c_ms"))
    val touches = purchases.join(clicks,
      col("user_id") === col("c_user") && col("c_ms") < col("p_ms") &&
        col("p_ms") - col("c_ms") <= lookbackMs)
    val wP = Window.partitionBy(col("p_id"))
    val credited = touches
      .withColumn("n_touches", count(lit(1)).over(wP))
      .select(col("c_ms"),
        Det.rnd(col("value") / col("n_touches"), 4).as("credit"))
    val out = credited
      .groupBy(floor(col("c_ms") / 3600000L).as("click_hour"))
      // 4-dp credits sum onto real .xx5 half-cent boundaries, so the final
      // 2-dp round needs the Det.rnd nudge (bare round diverged per engine)
      .agg(count(lit(1)).as("n_touches"),
        Det.rnd(dsum(col("credit")), 2).as("attributed_revenue"))
    Det.ordered(out)
  }

  /** Order-priority checking (TPC-H Q4 shape, adapted: this schema has no
    * commit/receipt dates, so "late" = any line shipped more than 60 days
    * after the order date): per-priority count of orders in one quarter
    * with at least one late line. The EXISTS runs as a LEFT SEMI join —
    * the order row is emitted at most once no matter how many lines are
    * late, and the quarter filter pushes into the orders scan before the
    * join, so the shuffle carries one quarter, not seven years.
    */
  def q4OrderPriority(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") >= tsLit(820454400000L) &&  // 1996-01-01
             col("o_orderdate") < tsLit(828316800000L))      // 1996-04-01
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val late = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
    val out = o.join(late,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
    Det.ordered(out)
  }

  /** Product-type profit center (TPC-H Q9 shape, adapted: no partsupp
    * table, so supply cost is proxied at 10% of the part's retail price per
    * unit): profit by supplier nation and ship year over parts whose name
    * carries the probe substring. Three broadcast dims against one fact
    * scan — the join order Catalyst picks is fact-at-the-bottom with
    * broadcast hash joins stacked above, no fact-side shuffle at all;
    * the year bucket and group-by are the only exchange.
    */
  def q9ProfitCenter(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).where(col("p_name").like("%red%"))
      .select(col("p_partkey"), col("p_retailprice"))
    val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
    val amount = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      lit(0.1) * col("p_retailprice") * col("l_quantity")
    val out = Tables.lineitem(s, d)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .withColumn("ship_ms", tsMs(col("l_shipdate")))
      .groupBy(col("n_name").as("nation"),
        // q7's cross-engine year bucket: epoch-millis div one 365-day year
        expr("ship_ms div 31536000000").as("year_bucket"))
      .agg(round(dsum(amount), 2).as("profit"))
    Det.ordered(out)
  }

  /** Important-stock cut (TPC-H Q11 shape, adapted to lineitem value in
    * place of partsupp positions): per-part revenue from suppliers of two
    * nations, keeping parts worth more than `fraction` of that revenue
    * pool. The HAVING threshold compares against an in-plan broadcast
    * scalar (the global total) — one fact aggregation feeds both sides,
    * and nothing recomputes the pool per group.
    */
  def q11ImportantParts(s: SparkSession, d: String,
                        fraction: Double = 0.001): DataFrame = {
    val sup = Tables.supplier(s, d).join(
        broadcast(Tables.nation(s, d).where(col("n_name").isin("NATION_3", "NATION_4"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val value = Tables.lineitem(s, d)
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("v"))
    val pool = value.agg(dsum(col("v")).as("pool"))
    val out = value.crossJoin(broadcast(pool))
      .where(col("v") > col("pool") * fraction)
      .select(col("l_partkey"), round(col("v"), 2).as("part_value"))
    Det.ordered(out)
  }

  /** Shipping-priority split (TPC-H Q12 shape, adapted: no shipmode column,
    * so lines group by their linestatus; "late" = shipped more than 90 days
    * after the order date in one year): per-status counts of high-priority
    * (1-URGENT / 2-HIGH) vs lower-priority orders among late lines. One
    * fact-fact join on the order key, conditional counts in a single
    * partial-aggregated pass.
    */
  def q12LateLines(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    val out = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linestatus"), col("l_shipdate"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate") >= tsLit(820454400000L) &&   // 1996-01-01
             col("l_shipdate") < tsLit(852076800000L) &&    // 1997-01-01
             col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
    Det.ordered(out)
  }

  /** Suppliers who kept orders waiting (TPC-H Q21 shape, adapted to ship
    * dates: in a multi-supplier order, the supplier whose line ships LAST —
    * strictly after every other supplier's lines — held the order up).
    * The classic EXISTS/NOT-EXISTS pair is computed from two aggregations
    * over one lineitem scan: per-order supplier count + max ship date,
    * then the at-the-max supplier set, kept only when it is a single
    * supplier (a tie means no unique culprit, exactly NOT EXISTS in the
    * original). Top 20 by wait count with a name tie-break.
    */
  def q21WaitingSuppliers(s: SparkSession, d: String): DataFrame = {
    // r18 (guide §2.4): the EXISTS/NOT-EXISTS pair used to be an
    // aggregate-then-rejoin — lineitem shuffled for the per-order aggregate,
    // then the filtered join's output shuffled AGAIN for the at-the-max
    // aggregate. Per-order supplier count and max ship date are now window
    // functions over ONE orderkey exchange, and the at-the-max aggregate
    // reuses that same partitioning — identical rows survive the filter,
    // identical culprits come out, one fact shuffle instead of two.
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val w = Window.partitionBy(col("l_orderkey"))
    val culprit = li
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        size(collect_set(col("l_suppkey")).over(w)).as("n_supp"),
        max(col("l_shipdate")).over(w).as("max_ship"))
      .where(col("n_supp") >= 2 && col("l_shipdate") === col("max_ship"))
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_at_max"),
        max(col("l_suppkey")).as("culprit"))
      .where(col("n_at_max") === 1)
    val out = culprit.groupBy(col("culprit"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))),
        col("culprit") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
    out
  }

  /** Distribution-position windows: percent_rank and cume_dist of order
    * totals within each priority class — both are rank arithmetic over one
    * window sort, rounded through the cross-engine contract.
    */
  def windowPercentRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val out = Tables.orders(s, d).where(col("o_custkey") < 50)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        Det.rnd(percent_rank().over(w), 6).as("pct_rank"),
        Det.rnd(cume_dist().over(w), 6).as("cume"))
    Det.ordered(out)
  }

  /** 2-D Pareto skyline (Börzsönyi et al., ICDE '01): orders no other
    * order dominates — here "at least as early AND at least as valuable,
    * strictly better in one" (the early-big-orders frontier). The naive
    * formulation is a NOT EXISTS over the pair square; the 2-D scale form
    * is ONE window pass: ordered by date, a row survives iff no
    * strictly-earlier row reached its price (RANGE frame running max) and
    * no same-date row strictly beats it — O(n log n) as a single sort,
    * per-segment partitioned so the sort shards. Dominance on exact
    * decimals/millis, no rounding needed.
    */
  def skylinePareto(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"), col("o_orderkey"),
        tsMs(col("o_orderdate")).as("date_ms"), col("o_totalprice"))
    val wEarlier = Window.partitionBy(col("segment")).orderBy(col("date_ms"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSameDay = Window.partitionBy(col("segment"), col("date_ms"))
    val out = o
      .withColumn("best_earlier", max(col("o_totalprice")).over(wEarlier))
      .withColumn("best_same_day", max(col("o_totalprice")).over(wSameDay))
      .where(
        (col("best_earlier").isNull || col("best_earlier") < col("o_totalprice")) &&
          col("best_same_day") === col("o_totalprice"))
      .select(col("segment"), col("o_orderkey"), col("date_ms"),
        col("o_totalprice").as("totalprice"))
    Det.ordered(out)
  }

  /** Two-level (stratified) systematic PPS — the shape [[samplePps]] takes
    * when groups are few and huge: the flat form streams each group's
    * cumulative sum through ONE sorted partition (correct, but a 5-segment
    * corpus at 100 TB serializes on 5 partitions). Here level 1 allocates
    * each of the 16 hash-strata a draw count by running the SAME systematic
    * rule over the strata's weight totals (16 rows per group — broadcast
    * arithmetic), and level 2 draws each stratum's allocation through its
    * own cumulative axis — windows partition on (group, stratum), so
    * parallelism is groups × 16 and no partition ever holds more than a
    * stratum. Per group Σ picks still telescopes to exactly k (level 1
    * telescopes over strata, level 2 over rows within each stratum).
    * Stratified PPS is a standard design (Särndal et al., Model Assisted
    * Survey Sampling §3.7); the draw differs from the flat form's — both
    * are valid PPS schemes, and both are deterministic exact-decimal
    * replays.
    */
  def samplePps2Level(s: SparkSession, d: String, k: Int = 10,
                      nStrata: Int = 16): DataFrame = {
    val j = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"), col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,4)").as("w"),
        md5(col("o_orderkey").cast("string")).as("hx"))
      // stratum = first hex digit of the row hash: deterministic, uniform
      .withColumn("stratum",
        (conv(substring(col("hx"), 1, 1), 16, 10).cast("int") % nStrata))
    def below(x: Column, tot: Column, n: Column): Column =
      floor(n * x.cast("double") / tot.cast("double") + lit(0.5) + lit(1e-9))
    // level 1: stratum weight totals, cumulative in stratum order, k
    // allocated by the systematic rule over the stratum axis
    val wCum1 = Window.partitionBy(col("segment")).orderBy(col("stratum"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll1 = Window.partitionBy(col("segment"))
    val alloc = j.groupBy(col("segment"), col("stratum"))
      .agg(sum(col("w")).as("sw"))
      .withColumn("scum", sum(col("sw")).over(wCum1))
      .withColumn("stot", sum(col("sw")).over(wAll1))
      .select(col("segment"), col("stratum"),
        (below(col("scum"), col("stot"), lit(k))
          - below(col("scum") - col("sw"), col("stot"), lit(k))).cast("int").as("k_b"))
      .where(col("k_b") >= 1)
    // level 2: within each allocated stratum, draw k_b through its own
    // cumulative axis in hash order — parallel across (segment, stratum)
    val wCum2 = Window.partitionBy(col("segment"), col("stratum"))
      .orderBy(col("hx"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll2 = Window.partitionBy(col("segment"), col("stratum"))
    val out = j.join(broadcast(alloc), Seq("segment", "stratum"))
      .withColumn("cum", sum(col("w")).over(wCum2))
      .withColumn("tot", sum(col("w")).over(wAll2))
      .withColumn("picks",
        (below(col("cum"), col("tot"), col("k_b"))
          - below(col("cum") - col("w"), col("tot"), col("k_b"))).cast("bigint"))
      .where(col("picks") >= 1)
      .select(col("segment"), col("stratum").cast("bigint").as("stratum"),
        col("o_orderkey"), col("w").cast("double").as("weight"), col("picks"))
    Det.ordered(out)
  }

  /** Systematic PPS (probability-proportional-to-size) sampling — the
    * production alternative to weighted reservoir sampling for building a
    * training mix: per group, k sample points are placed evenly through the
    * cumulative weight axis at (j+0.5)·W/k, and a row is drawn once per
    * point landing inside its weight interval (rows heavier than W/k can
    * legitimately draw multiple times — `picks` is that multiplicity, the
    * with-replacement PPS semantics). The scan order is a hash of the row
    * key, so the "random" systematic pass is deterministic, shuffle-proof,
    * and cross-engine replayable WITHOUT transcendental priority keys
    * (pow/exp of the A-Res family round differently per libm); the
    * cumulative sums are exact decimals, the only division is nudged
    * through the Det.rnd boundary contract. Cost: one shuffle on the group
    * key + one window pass — the sessionize shape, no global sort, no
    * driver-side state; at 100 TB each group streams through its sorted
    * partition once.
    */
  def samplePps(s: SparkSession, d: String, k: Int = 10): DataFrame = {
    val j = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"), col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,4)").as("w"),
        md5(col("o_orderkey").cast("string")).as("hx"))
    val wOrd = Window.partitionBy(col("segment")).orderBy(col("hx"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("segment"))
    // points-below(x) = floor(k·x/W + 0.5): picks = the count of sample
    // points inside (cum−w, cum]; cum and w are exact decimals so both
    // engines divide the same values (the 1e-9 nudge covers the floor
    // boundary like every Det.rnd site)
    def below(x: Column, tot: Column): Column =
      floor(lit(k) * x.cast("double") / tot.cast("double") + lit(0.5) + lit(1e-9))
    val out = j
      .withColumn("cum", sum(col("w")).over(wOrd))
      .withColumn("tot", sum(col("w")).over(wAll))
      .withColumn("picks",
        (below(col("cum"), col("tot")) - below(col("cum") - col("w"), col("tot")))
          .cast("bigint"))
      .where(col("picks") >= 1)
      .select(col("segment"), col("o_orderkey"),
        col("w").cast("double").as("weight"), col("picks"))
    Det.ordered(out)
  }

  /** Snapshot diff — change-data-capture between two generations of a
    * keyed table: per key, `added` (new generation only), `removed` (old
    * only), `changed` (both, value differs), aggregated to a per-status
    * census. THE primitive of incremental pipelines: an index/dedup/
    * training-data rebuild consumes exactly this delta instead of
    * re-reading the corpus (Delta's change-data-feed shape; graft's
    * manifest mode serves the two sides via readAt). Deterministic
    * generations derived from `events`: gen1 drops event_id % 5 == 0
    * (retention), gen2 drops % 3 == 0 and overwrites value on % 7 == 0
    * (new data + updates). One full-outer shuffle join on the key — the
    * CDC plan at any scale (both sides hash-partition on event_id; AQE
    * handles the skew); the +1.0 overwrite is IEEE-exact, so the changed
    * set is engine-independent.
    */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("event_id"), col("value"))
    val g1 = e.where(col("event_id") % 5 =!= 0)
      .select(col("event_id"), col("value").as("v1"))
    val g2 = e.where(col("event_id") % 3 =!= 0)
      .select(col("event_id"),
        when(col("event_id") % 7 === 0, col("value") + 1)
          .otherwise(col("value")).as("v2"))
    val out = g1.join(g2, Seq("event_id"), "full_outer")
      .select(
        when(col("v1").isNull, "added")
          .when(col("v2").isNull, "removed")
          .when(col("v1") =!= col("v2"), "changed")
          .otherwise("same").as("status"))
      .where(col("status") =!= "same")
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"))
    Det.ordered(out)
  }
}
