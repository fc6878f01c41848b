package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Det, Tables}

/** A points table in the Orestes data model: a time column, a value column,
  * and tag columns that identify the series (reference README "series" =
  * the key/value pairs other than time/value).
  */
case class PointsTable(df: DataFrame, tsCol: String, valueCol: String, tagCols: Seq[String],
                       rawNsCol: Option[String] = None) {
  def timeMs: Column = Det.tsMs(col(tsCol))
  def tags: Seq[Column] = tagCols.map(col)

  /** Time-range predicate on the physical column when one exists (bare-column
    * comparisons push into the parquet scan); falls back to the derived
    * timestamp otherwise.
    */
  def inRange(startMs: Long, endMs: Long): Column = rawNsCol match {
    case Some(ns) =>
      // saturate the ms->ns conversion: Long.MaxValue-ish bounds (the
      // natural "no upper limit") must not overflow into negative nanos
      def ns_(ms: Long): Long =
        if (ms >= Long.MaxValue / 1000000L) Long.MaxValue
        else if (ms <= Long.MinValue / 1000000L) Long.MinValue
        else ms * 1000000L
      col(ns) >= ns_(startMs) && col(ns) < ns_(endMs)
    case None => timeMs >= startMs && timeMs < endMs
  }
}

/** The reference's query surface (read / count / series / select_distinct /
  * retention, lib/orestes-query.js, lib/orestes-remover.js) as DataFrame
  * transformations.
  *
  * Scale design: where Orestes shards into one Cassandra table + one ES index
  * per (space, 7-day bucket) (lib/orestes-utils.js:50-79), we bucket by
  * `floor(epoch_day / granularity) * granularity` — at 100 TB this is the
  * parquet partition key, so time-range predicates become directory pruning
  * and tag predicates push into row-group min/max stats. Reads never shuffle;
  * per-series aggregations shuffle once on the series key.
  */
object Tsdb {
  val GranularityDays = 7
  val MsInDay: Long = Det.MsInDay

  /** The driver's `events` table viewed as the points table: series tags are
    * (user_id, event_type), time is `ts`, value is `value`.
    */
  def points(spark: SparkSession, dir: String): PointsTable = {
    val df = Tables.events(spark, dir)
    val raw = if (df.columns.contains("ts_ns")) Some("ts_ns") else None
    PointsTable(df, "ts", "value", Seq("user_id", "event_type"), raw)
  }

  /** Time bucket (epoch-day rounded down to granularity), the storage shard
    * key — reference roundToGranularity (lib/orestes-utils.js:50-53).
    */
  def bucketOf(timeMs: Column, granularityDays: Int = GranularityDays): Column =
    floor(timeMs / MsInDay / granularityDays) * granularityDays

  /** Offset of a point within its bucket — reference lib/orestes-inserter.js:71. */
  def offsetOf(timeMs: Column, granularityDays: Int = GranularityDays): Column =
    timeMs % (MsInDay * granularityDays)

  private def inRange(pt: PointsTable, startMs: Long, endMs: Long): Column =
    pt.inRange(startMs, endMs)

  /** `/read`: all points in [startMs, endMs) for series matching the filter,
    * sorted per series by time (reference returns per-series sorted point
    * arrays; relationally that is one row per point, fully ordered).
    */
  def read(pt: PointsTable, filter: Column, startMs: Long, endMs: Long): DataFrame = {
    val out = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .select(pt.tags :+ pt.timeMs.as("time_ms") :+ col(pt.valueCol).as("value"): _*)
    Det.ordered(out)
  }

  /** `/read` with aggregations=[{type:"count"}]: per-series point counts. */
  def countPoints(pt: PointsTable, filter: Column, startMs: Long, endMs: Long): DataFrame = {
    val out = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .groupBy(pt.tags: _*)
      .agg(count(lit(1)).as("n"))
    Det.ordered(out)
  }

  /** `/series`: the distinct series (tag sets) with data in the range. */
  def seriesList(pt: PointsTable, filter: Column, startMs: Long, endMs: Long): DataFrame = {
    val out = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .select(pt.tags: _*)
      .distinct()
    Det.ordered(out)
  }

  /** Ranked series retrieval (r14): BM25 over each series' tag bag — one
    * document per distinct series, text = the space-joined tag values
    * (tag columns in sorted name order), scored by the corpus scorers'
    * shared rule ([[graft.text.TextOps.bm25TopKOn]] — same analyzer, same
    * rounding, same `score > 0` inclusion). The document id is
    * [[DocId.encode]] over the sorted tag columns — an INJECTIVE
    * unit-separator join (null ≠ "", separators escaped), so the scorer's
    * (score desc, doc_id) tie-break is a plain string order any engine
    * replays — no hash, no global row numbering — and the CDC index's
    * doc_id-keyed dedup counts exactly the docs this scan counts
    * (ADVICE r14). Returns the top-k series' tags with `score`, ordered
    * (score desc, tags).
    *
    * Scale: the only corpus-sized work is the distinct-series shuffle
    * (what `/series` already pays); scoring is bm25TopKOn's one-scan +
    * broadcast-stats + TakeOrdered plan over the series frame.
    *
    * Prefix terms (r15, VERDICT r14 #8): a trailing-`*` term expands to
    * the live vocabulary's matching terms under the shared rule
    * ([[graft.text.TextOps.expandPrefix]] — lexicographic, capped at
    * Lucene's 50) and the expanded set scores as a normal multi-term
    * query. [[graft.streaming.CdcIndexSync.search]] applies the same
    * rule over its term dictionary, so the rank-identity contract
    * extends to prefix queries.
    */
  def searchSeries(pt: PointsTable, terms: Seq[String], k: Int = 20): DataFrame = {
    require(terms.nonEmpty, "search needs at least one term")
    val tagCols = pt.tagCols.sorted
    // ONE corpus scan (r16, VERDICT r15 #2): the distinct-series frame is
    // small by definition (series cardinality, not points) but its
    // distinct is a full points-scan shuffle — checkpointed eagerly so
    // vocabulary expansion (prefix terms), the scorer's stats+score jobs,
    // and the final tag join all read the materialized frame instead of
    // re-running the scan per job (ts_search_prefix paid it 3×: 3.81 s vs
    // ts_search's 1.16 s at sf0.1)
    val series = seriesCorpus(pt, tagCols).localCheckpoint(true)
    searchSeriesOn(series, tagCols, terms, k)
  }

  /** [[searchSeries]] for the SERVED path (ADVICE r16 low): the batch
    * variant's eager localCheckpoint pins the distinct-series RDD blocks
    * in executor storage until driver GC — per-REQUEST frames would
    * accrete unboundedly between GCs on a loaded facade — and a
    * checkpointed frame is non-recomputable, so an executor loss
    * mid-request fails the query. Here the corpus frame is `persist`ed
    * (recomputable lineage: an executor loss recomputes instead of
    * failing; still one scan — the jobs run sequentially, so the first
    * populates the cache the rest read) and the caller runs the returned
    * cleanup once the response is drained. */
  def searchSeriesUnpinned(pt: PointsTable, terms: Seq[String],
                           k: Int = 20): (DataFrame, () => Unit) = {
    require(terms.nonEmpty, "search needs at least one term")
    val tagCols = pt.tagCols.sorted
    // the pinned plan carries a per-REQUEST nonce column: Dataset
    // persist/unpersist go through the session CacheManager keyed by
    // plan EQUALITY, so two requests over the same store snapshot would
    // otherwise share one cache entry — the first response's post-drain
    // unpersist then yanks the blocks from under the second mid-flight
    // (BlockNotFoundException, measured under sustained /search load in
    // HttpPerf). The nonce makes each request's entry private; the drop
    // below keeps the corpus schema unchanged while the cached subplan
    // still substitutes.
    val pinned = seriesCorpus(pt, tagCols)
      .withColumn("__pin", lit(Graft.nonce()))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (searchSeriesOn(pinned.drop("__pin"), tagCols, terms, k),
      () => { pinned.unpersist(false); () })
  }

  /** The search corpus: one document per distinct series — doc_id =
    * [[DocId.encode]] over the sorted tag columns, text = the
    * space-joined tag values. The ONLY corpus-sized work in a search. */
  private def seriesCorpus(pt: PointsTable, tagCols: Seq[String]): DataFrame =
    pt.df.select(tagCols.map(col): _*).distinct()
      .withColumn("doc_id", DocId.encode(tagCols))
      .withColumn("text", concat_ws(" ",
        tagCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*))

  /** Expansion + scoring + tag join over a MATERIALIZED series corpus —
    * the shared tail of [[searchSeries]]/[[searchSeriesUnpinned]] (one
    * rule, two pinning policies). */
  private def searchSeriesOn(series: DataFrame, tagCols: Seq[String],
                             terms: Seq[String], k: Int): DataFrame = {
    val (exact, prefixes) = graft.text.TextOps.splitSearchTerms(terms)
    val query =
      if (prefixes.isEmpty) exact
      else {
        val vocab = series
          .select(explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
          .where(col("tok") =!= "")
        (exact ++ graft.text.TextOps.expandPrefixes(vocab, prefixes)).distinct
      }
    if (query.isEmpty) // every prefix expanded to nothing: zero matches
      return series
        .select(tagCols.map(col) :+ lit(0.0).as("score"): _*).limit(0)
    val top = graft.text.TextOps.bm25TopKOn(
      series.select(col("doc_id"), col("text")), query, k)
    top.join(series, "doc_id")
      .select(tagCols.map(col) :+ col("score"): _*)
      .orderBy(col("score").desc +: tagCols.map(col): _*)
  }

  /** `/select_distinct`: distinct values of a subset of tag keys. Keys that
    * are not tags of any matching series surface as a null column, matching
    * the reference's missing-field handling
    * (lib/elasticsearch/aggregation.js:36-68).
    */
  def selectDistinct(pt: PointsTable, filter: Column, keys: Seq[String]): DataFrame = {
    val present = pt.df.columns.toSet
    val cols = keys.map { k =>
      if (present(k)) col(k) else lit(null).cast("string").as(k)
    }
    val out = pt.df.where(filter).select(cols: _*).distinct()
    Det.ordered(out)
  }

  /** Retention (`/delete` with keep_days): drop whole buckets whose last day
    * is older than `today - keepDays` (lib/orestes-remover.js:16-39). `today`
    * is taken from the data's max timestamp so the query is deterministic.
    * Returns the surviving buckets with per-bucket counts.
    */
  def retentionSurvivors(pt: PointsTable, keepDays: Int): DataFrame = {
    // `today` = max(timeMs)/day as a broadcast single-row scalar, kept IN the
    // plan (no driver-side .first() job — VERDICT r2 minor); on an empty
    // table the aggregate row has a NULL max, the join keeps nothing, and
    // the empty (bucket_day, n) frame falls out with the right schema.
    val today = pt.df
      .agg(floor(max(pt.timeMs) / MsInDay).cast("bigint").as("today"))
      .where(col("today").isNotNull)
    val out = pt.df
      .select(bucketOf(pt.timeMs).as("bucket_day"))
      .join(broadcast(today))
      // bucket end (inclusive) = bucket_day + granularity - 1, capped at today
      .where(least(col("bucket_day") + (GranularityDays - 1), col("today"))
        > col("today") - keepDays)
      .groupBy("bucket_day")
      .agg(count(lit(1)).as("n"))
    Det.ordered(out)
  }

  /** Ingest validation (lib/orestes-utils.js:158-182): every point must have
    * a parseable time and a numeric non-NaN value. Returns count per
    * validity class; on clean driver data the invalid classes are absent.
    */
  def ingestValidate(pt: PointsTable): DataFrame = {
    val out = pt.df
      .select(
        col(pt.tsCol).isNotNull.as("time_ok"),
        (col(pt.valueCol).isNotNull && !isnan(col(pt.valueCol))).as("value_ok"))
      .groupBy("time_ok", "value_ok")
      .agg(count(lit(1)).as("n"))
    Det.ordered(out)
  }

  /** Series-metadata extraction: the first time each (bucket, series) pair is
    * seen — exactly the set of metadata documents the reference creates in ES
    * per bucket (lib/orestes-inserter.js:98-133), as a query. One shuffle on
    * (bucket, series); map-side partial aggregation does the dedup.
    */
  def ingestDedupMeta(pt: PointsTable): DataFrame = {
    val out = pt.df
      .groupBy(bucketOf(pt.timeMs).as("bucket_day") +: pt.tags: _*)
      .agg(min(pt.timeMs).as("first_ts_ms"), count(lit(1)).as("n"))
    Det.ordered(out)
  }

  /** Per-series derivative (counter rate): for consecutive points of a
    * series ordered by time, (Δvalue / Δt) per second — the `rate()`
    * primitive every metrics store grows (Prometheus/Graphite). One shuffle
    * on the series key; same-timestamp pairs are skipped (Δt = 0).
    */
  def rate(pt: PointsTable, filter: Column, startMs: Long, endMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // (time_ms, value) order: same-millisecond points would otherwise make
    // lag() engine-dependent
    val w = Window.partitionBy(pt.tags: _*).orderBy(col("time_ms"), col("value"))
    val pts = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .select(pt.tags :+ pt.timeMs.as("time_ms") :+ col(pt.valueCol).as("value"): _*)
    val out = pts
      .select(pt.tags ++ Seq(col("time_ms"), col("value"),
        lag(col("time_ms"), 1).over(w).as("prev_ms"),
        lag(col("value"), 1).over(w).as("prev_value")): _*)
      .where(col("prev_ms").isNotNull && col("time_ms") > col("prev_ms"))
      .select(pt.tags ++ Seq(col("time_ms"),
        // Det.rnd also collapses IEEE -0.0 (negative delta rounding to zero)
        Det.rnd((col("value") - col("prev_value")) * 1000.0 / (col("time_ms") - col("prev_ms")), 6)
          .as("rate_per_sec")): _*)
    Det.ordered(out)
  }

  /** Top-K series by point count in range — the "busiest streams" query a
    * metrics UI runs constantly. Per-series counts (one shuffle), then
    * `orderBy(...).limit(k)` — Catalyst plans that as a distributed
    * TakeOrderedAndProject (per-partition top-k, merge k·P rows on the
    * driver), NOT a single-partition global sort, so it survives millions of
    * series. The rank window only ever sees the k surviving rows.
    */
  def topSeries(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
                k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = col("n").desc +: pt.tags.map(_.asc)
    val topK = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .groupBy(pt.tags: _*)
      .agg(count(lit(1)).as("n"))
      .orderBy(ord: _*)
      .limit(k) // TakeOrderedAndProject: never a one-partition global sort
    val w = Window.orderBy(ord: _*) // k rows only — single partition is fine
    topK
      .select(pt.tags ++ Seq(col("n"), row_number().over(w).cast("bigint").as("rank")): _*)
      .orderBy(col("rank"))
  }

  /** Gap-filled downsample: bucket each series to `stepMs`, then materialize
    * every bucket between the series' first and last point, carrying the
    * last observed aggregate forward into empty buckets (LOCF). The dense
    * time grid dashboards and joins expect from a sparse store. Scale shape:
    * one shuffle to the per-bucket aggregate, one explode of (hi-lo) bucket
    * stubs per series — output-proportional, never a global range.
    */
  def gapfill(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
              stepMs: Long = 3600000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val agg = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .groupBy(pt.tags :+ floor(pt.timeMs / stepMs).as("bucket"): _*)
      .agg(count(lit(1)).as("n"), round(Det.davg(col(pt.valueCol), 4), 4).as("avg_value"))
    val spans = agg.groupBy(pt.tags: _*)
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
    val full = spans.select(pt.tags :+ explode(sequence(col("lo"), col("hi"))).as("bucket"): _*)
    val w = Window.partitionBy(pt.tags: _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = full.join(agg, pt.tagCols :+ "bucket", "left")
    val out = joined.select(pt.tags ++ Seq(
      col("bucket"),
      coalesce(col("n"), lit(0L)).as("n"),
      last(col("avg_value"), ignoreNulls = true).over(w).as("avg_value"),
      col("n").isNull.as("is_gap")): _*)
    Det.ordered(out)
  }

  /** Latest point per series in range — the "current value" lookup every
    * metrics store serves from its hot path. One shuffle on the series key;
    * same-millisecond ties break on value (desc) so the result is unique.
    */
  def latest(pt: PointsTable, filter: Column, startMs: Long, endMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(pt.tags: _*).orderBy(col("time_ms").desc, col("value").desc)
    val out = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .select(pt.tags :+ pt.timeMs.as("time_ms") :+ col(pt.valueCol).as("value"): _*)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn")
    Det.ordered(out)
  }

  /** Linear interpolation of each series onto a regular `stepMs` grid
    * between its first and last point — the resample/align primitive that
    * lets sparse series join each other. Same-timestamp points are first
    * reduced to their max. Plan shape: per-(series, ms) reduce, grid-stub
    * explode bounded by span/step, one window sort per series — no global
    * range, no cross-series traffic.
    */
  def interpolate(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
                  stepMs: Long = 3600000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val real = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .groupBy(pt.tags :+ pt.timeMs.as("t"): _*)
      .agg(max(col(pt.valueCol)).as("v"))
      .withColumn("is_grid", lit(0))
    val spans = real.groupBy(pt.tags: _*)
      .agg(ceil(min(col("t")) / lit(stepMs.toDouble)).as("lo"),
        floor(max(col("t")) / lit(stepMs.toDouble)).as("hi"))
      .where(col("lo") <= col("hi"))
    val grid = spans
      .select(pt.tags :+ explode(sequence(col("lo"), col("hi"))).as("g"): _*)
      .select(pt.tags ++ Seq((col("g") * stepMs).as("t"), lit(null).cast("double").as("v"),
        lit(1).as("is_grid")): _*)
    // real row sorts before the grid stub at the same t, so an exact hit
    // lands in the preceding frame (pt_ms == t) and short-circuits below
    val ord = Window.partitionBy(pt.tags: _*).orderBy(col("t"), col("is_grid"))
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val realT = when(col("is_grid") === 0, col("t"))
    val realV = when(col("is_grid") === 0, col("v"))
    val interp = real.unionByName(grid)
      .select(pt.tags ++ Seq(col("t"), col("is_grid"),
        last(realT, ignoreNulls = true).over(wPrev).as("pt_ms"),
        last(realV, ignoreNulls = true).over(wPrev).as("pv"),
        first(realT, ignoreNulls = true).over(wNext).as("nt_ms"),
        first(realV, ignoreNulls = true).over(wNext).as("nv")): _*)
      .where(col("is_grid") === 1)
    val out = interp.select(pt.tags ++ Seq(col("t").as("grid_ms"),
      Det.rnd(when(col("pt_ms") === col("t") || col("nt_ms").isNull, col("pv"))
        .otherwise(col("pv") + (col("nv") - col("pv")) * (col("t") - col("pt_ms"))
          / (col("nt_ms") - col("pt_ms"))), 6).as("value")): _*)
    Det.ordered(out)
  }

  /** Z-score anomalies: points more than `z` sample standard deviations from
    * their series mean. Moments come from exact DECIMAL partial sums (one
    * shuffle), broadcast back onto the scan — association-order independent,
    * so the flagged set is deterministic under any partitioning.
    */
  def anomalies(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
                z: Double = 2.0): DataFrame = {
    val v = col(pt.valueCol).cast("decimal(9,4)")
    val pts = pt.df.where(inRange(pt, startMs, endMs) && filter)
    val moments = pts.groupBy(pt.tags: _*)
      .agg(count(lit(1)).as("n"),
        sum(v).cast("double").as("sv"),
        sum(v * v).cast("double").as("svv"))
      .where(col("n") > 1)
      .select(pt.tags ++ Seq(col("n"),
        (col("sv") / col("n").cast("double")).as("mean"),
        sqrt((col("svv") - col("sv") * col("sv") / col("n").cast("double"))
          / (col("n").cast("double") - 1.0)).as("sd")): _*)
      .where(col("sd") > 0)
    val out = pts
      .select(pt.tags :+ pt.timeMs.as("time_ms") :+ col(pt.valueCol).as("value"): _*)
      .join(broadcast(moments), pt.tagCols)
      .where(abs(col("value") - col("mean")) > col("sd") * z)
      .select(pt.tags ++ Seq(col("time_ms"), col("value"),
        // Det.rnd: zscore is division-derived — see ADVICE r2 on round()
        Det.rnd((col("value") - col("mean")) / col("sd"), 4).as("zscore")): _*)
    Det.ordered(out)
  }

  /** Fixed-width value histogram per series — distribution-at-a-glance for a
    * metrics UI. One shuffle on (series, bin); bins are floor(value/width).
    */
  def histogram(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
                binWidth: Double = 50.0): DataFrame = {
    val out = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .groupBy(pt.tags :+ floor(col(pt.valueCol) / binWidth).cast("bigint").as("bin"): _*)
      .agg(count(lit(1)).as("n"))
    Det.ordered(out)
  }

  /** Per-series linear trend: least-squares slope (value units per hour)
    * and intercept over the range — the trend-detection primitive behind
    * capacity forecasting ("will this disk fill?"). Moments come from exact
    * DECIMAL sums over integer hour offsets (one shuffle, statsAgg's
    * association-order-independent shape); series with < 2 distinct hours
    * have no defined slope and drop out.
    */
  def trend(pt: PointsTable, filter: Column, startMs: Long, endMs: Long): DataFrame = {
    // floor of a double quotient (NOT integer `div`) so the oracle can use
    // the identical expression; hour offsets are exact at these magnitudes
    val xh = floor((pt.timeMs - startMs) / lit(3600000.0)).cast("decimal(9,0)")
    val v = col(pt.valueCol).cast("decimal(9,4)")
    val agg = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .groupBy(pt.tags: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(xh).cast("double").as("sx"),
        sum(xh * xh).cast("double").as("sxx"),
        sum(v).cast("double").as("sy"),
        sum(xh * v).cast("double").as("sxy"))
    val n = col("n").cast("double")
    val denom = n * col("sxx") - col("sx") * col("sx")
    val slope = (n * col("sxy") - col("sx") * col("sy")) / denom
    val out = agg
      .where(col("n") > 1 && denom =!= 0.0)
      .select(pt.tags ++ Seq(col("n"),
        Det.rnd(slope, 6).as("slope_per_hour"),
        Det.rnd((col("sy") - slope * col("sx")) / n, 6).as("intercept")): _*)
    Det.ordered(out)
  }

  /** Day-of-week × hour-of-day activity heatmap per series tag — the
    * operational "when is this system busy" matrix. Day-of-week from pure
    * epoch arithmetic (epoch day 0 was a Thursday ⇒ +3 mod 7 with
    * Monday=0), so no calendar library needs to agree across engines. One
    * shuffle.
    */
  def heatmap(pt: PointsTable, filter: Column, startMs: Long, endMs: Long): DataFrame = {
    val epochDay = floor(pt.timeMs / lit(MsInDay))
    val out = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .groupBy(pt.tags
        :+ ((epochDay + 3) % 7).cast("bigint").as("dow")
        :+ (floor(pt.timeMs / lit(3600000L)) % 24).cast("bigint").as("hour"): _*)
      .agg(count(lit(1)).as("n"),
        round(Det.davg(col(pt.valueCol), 4), 4).as("avg_value"))
    Det.ordered(out)
  }

  /** Top-K movers: the series with the largest absolute day-over-day swing
    * in their daily mean — "what changed the most since yesterday".
    * Deltas come from the lag window per series; the global top-K is a
    * TakeOrdered (never a full sort), the same discipline as
    * [[topSeries]].
    */
  def topMovers(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
                k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .groupBy(pt.tags :+ (floor(pt.timeMs / lit(MsInDay)) * MsInDay)
        .cast("bigint").as("day_ms"): _*)
      .agg(round(Det.davg(col(pt.valueCol), 4), 4).as("avg_value"))
    val w = Window.partitionBy(pt.tags: _*).orderBy(col("day_ms"))
    daily
      .withColumn("prev_avg", lag(col("avg_value"), 1).over(w))
      .where(col("prev_avg").isNotNull)
      .select(pt.tags ++ Seq(col("day_ms"),
        Det.rnd(col("avg_value") - col("prev_avg"), 4).as("delta"),
        Det.rnd(abs(col("avg_value") - col("prev_avg")), 4).as("abs_delta")): _*)
      .orderBy(col("abs_delta").desc +: pt.tags :+ col("day_ms"): _*)
      .limit(k)
  }

  /** Robust outliers via median absolute deviation — the z-score's
    * ([[anomalies]]) heavy-tail-safe sibling: a point is an outlier when
    * |x − median| > k·MAD. Both medians are exact per-series percentiles
    * rounded to 4 dp BEFORE the comparison, so the outlier set is
    * engine-exact (the threshold compare sees only exact decimals). Two
    * per-series aggregations + one join-back — all on the series key, one
    * shuffle partitioning reused.
    */
  def madOutliers(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
                  k: Double = 3.0): DataFrame = {
    val base = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .select(pt.tags :+ pt.timeMs.as("time_ms") :+ col(pt.valueCol).as("value"): _*)
    val med = base.groupBy(pt.tagCols.map(col): _*)
      .agg(Det.rnd(expr("percentile(value, 0.5)"), 4).as("med"))
    val dev = base.join(med, pt.tagCols)
      .withColumn("abs_dev", Det.rnd(abs(col("value") - col("med")), 4))
    val mad = dev.groupBy(pt.tagCols.map(col): _*)
      .agg(Det.rnd(expr("percentile(abs_dev, 0.5)"), 4).as("mad"))
    val out = dev.join(mad, pt.tagCols)
      .where(col("mad") > 0 && col("abs_dev") > lit(k) * col("mad"))
      .select(pt.tags ++ Seq(col("time_ms"), col("value"), col("abs_dev"), col("mad")): _*)
    Det.ordered(out)
  }

  /** Capacity forecast ("when does this series hit the ceiling?"): hours
    * until each series' fitted [[trend]] line reaches `threshold`, for
    * series trending upward. Pure arithmetic over trend's ROUNDED
    * slope/intercept, so the composition inherits trend's cross-engine
    * exactness; no additional shuffle beyond trend's one.
    */
  def forecast(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
               threshold: Double = 150.0): DataFrame = {
    val out = trend(pt, filter, startMs, endMs)
      .where(col("slope_per_hour") > 0)
      .select(pt.tags ++ Seq(col("slope_per_hour"), col("intercept"),
        Det.rnd((lit(threshold) - col("intercept")) / col("slope_per_hour"), 4)
          .as("hours_to_threshold")): _*)
    Det.ordered(out)
  }

  /** Histogram quantile (the Prometheus `histogram_quantile` shape): given
    * per-series fixed-width value bins, estimate quantile `q` by walking the
    * cumulative bin counts to the first bin reaching q·total and linearly
    * interpolating inside it. One shuffle to the bins, one per-series sort —
    * the quantile never sees raw points, which is the whole point at scale
    * (bins are tiny; points are 100 TB).
    */
  def histogramQuantile(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
                        q: Double = 0.5, binWidth: Double = 50.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bins = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .groupBy(pt.tags :+ floor(col(pt.valueCol) / binWidth).cast("bigint").as("bin"): _*)
      .agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy(pt.tags: _*).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(pt.tags: _*)
    val cum = bins.select(pt.tags ++ Seq(col("bin"), col("n"),
      sum(col("n")).over(wCum).as("cum"),
      sum(col("n")).over(wTot).as("total")): _*)
    val target = lit(q) * col("total")
    val wPick = Window.partitionBy(pt.tags: _*).orderBy(col("bin"))
    val out = cum
      .where(col("cum") >= target)
      .select(pt.tags ++ Seq(col("bin"), col("n"), col("cum"), col("total"),
        row_number().over(wPick).as("rk")): _*)
      .where(col("rk") === 1)
      .select(pt.tags ++ Seq(col("total"),
        Det.rnd((col("bin") + (target - (col("cum") - col("n"))) / col("n"))
          * binWidth, 4).as(s"p${(q * 100).toInt}")): _*)
    Det.ordered(out)
  }

  /** Threshold alerts with debounce — Prometheus' `for:` semantics: an alert
    * interval is a run of >= minPoints CONSECUTIVE points above the
    * threshold (single spikes don't page). Islands come from the classic
    * two-row_number difference; one sort per series key. Adjacent identical
    * points can't perturb islands (swapping equal neighbors preserves runs),
    * so the interval set is deterministic.
    */
  def alerts(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
             threshold: Double = 150.0, minPoints: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(pt.tags: _*).orderBy(col("time_ms"), col("value"))
    val flagged = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .select(pt.tags :+ pt.timeMs.as("time_ms") :+ col(pt.valueCol).as("value"): _*)
      .withColumn("rn", row_number().over(w))
      .where(col("value") > threshold)
    val wHot = Window.partitionBy(pt.tags: _*).orderBy(col("time_ms"), col("value"))
    val out = flagged
      .withColumn("grp", col("rn") - row_number().over(wHot))
      .groupBy(pt.tags :+ col("grp"): _*)
      .agg(count(lit(1)).as("n_points"),
        min(col("time_ms")).as("alert_start_ms"),
        max(col("time_ms")).as("alert_end_ms"))
      .where(col("n_points") >= minPoints)
      .select(pt.tags ++ Seq(col("alert_start_ms"), col("alert_end_ms"), col("n_points")): _*)
    Det.ordered(out)
  }

  /** Exact per-window quantile per series (PromQL `quantile_over_time`):
    * linear-interpolation percentile of the values inside each hour bucket.
    * One shuffle on (series, bucket); the percentile itself is a per-group
    * sort of an hour's points — bounded by bucket width, never the range.
    */
  def quantileOverTime(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
                       q: Double = 0.9, bucketMs: Long = 3600000L): DataFrame = {
    val out = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .groupBy(pt.tags :+ (floor(pt.timeMs / bucketMs) * bucketMs)
        .cast("bigint").as("bucket_ms"): _*)
      .agg(count(lit(1)).as("n"),
        // percentile() is exact linear interpolation in both engines
        // (quantile_cont in DuckDB) — same idiom as the `percentiles` query
        Det.rnd(expr(s"percentile(${pt.valueCol}, $q)"), 4).as(s"p${(q * 100).toInt}"))
    Det.ordered(out)
  }

  /** Per-series availability (SLA view): fraction of hour buckets in the
    * range that contain at least one point. The denominator is the fixed
    * range-bucket count, so a silent series scores low rather than dropping
    * out. One shuffle to (series); count(distinct bucket) is per-group.
    */
  def availability(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
                   bucketMs: Long = 3600000L): DataFrame = {
    val totalBuckets = (endMs - startMs + bucketMs - 1) / bucketMs
    val out = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .groupBy(pt.tags: _*)
      .agg(countDistinct(floor(pt.timeMs / bucketMs)).as("buckets_with_data"))
      .select(pt.tags ++ Seq(col("buckets_with_data"), lit(totalBuckets).as("total_buckets"),
        Det.rnd(col("buckets_with_data") / lit(totalBuckets.toDouble), 6)
          .as("availability")): _*)
    Det.ordered(out)
  }

  /** Multi-resolution rollup cascade: daily stats composed FROM the hourly
    * rollup (sums and counts re-aggregate; the daily mean comes from exact
    * DECIMAL hourly sums). This is the incremental-maintenance shape — at
    * 100 TB the hourly table is materialized once per hour and daily/weekly
    * views re-aggregate the rollup, never the raw points. The oracle computes
    * the SAME daily stats straight from raw points, so bit-equality proves
    * the cascade composes losslessly.
    */
  def rollupCascade(pt: PointsTable, filter: Column, startMs: Long, endMs: Long): DataFrame = {
    val hourly = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .groupBy(pt.tags :+ (floor(pt.timeMs / lit(3600000L)) * 3600000L)
        .cast("bigint").as("hour_ms"): _*)
      .agg(count(lit(1)).as("hn"),
        sum(col(pt.valueCol).cast("decimal(18,4)")).as("hsum"),
        max(col(pt.valueCol)).as("hmax"))
    val out = hourly
      .groupBy(pt.tags :+ (floor(col("hour_ms") / lit(MsInDay)) * MsInDay)
        .cast("bigint").as("day_ms"): _*)
      .agg(sum(col("hn")).as("n"),
        round(sum(col("hsum")).cast("double"), 2).as("sum_value"),
        Det.rnd(sum(col("hsum")).cast("double") / sum(col("hn")), 4).as("avg_value"),
        max(col("hmax")).as("max_value"))
    Det.ordered(out)
  }

  /** Centered moving average (±k points) per series — display smoothing.
    * Window sums go through DECIMAL so the mean is exact at any frame
    * alignment; one sort per series, no shuffle beyond the series key.
    */
  def smooth(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
             k: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(pt.tags: _*).orderBy(col("time_ms"), col("value"))
      .rowsBetween(-k, k)
    val out = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .select(pt.tags :+ pt.timeMs.as("time_ms") :+ col(pt.valueCol).as("value"): _*)
      .select(pt.tags ++ Seq(col("time_ms"), col("value"),
        Det.rnd(sum(col("value").cast("decimal(18,4)")).over(w).cast("double")
          / count(lit(1)).over(w), 4).as("smoothed")): _*)
    Det.ordered(out)
  }

  /** Counter increase with reset detection (Prometheus `increase()`): per
    * series, sum consecutive deltas, treating a drop as a counter restart
    * whose contribution is the post-reset value. One window pass per series;
    * contributions are summed as exact decimals.
    */
  def counterIncrease(pt: PointsTable, filter: Column, startMs: Long, endMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(pt.tags: _*).orderBy(col("time_ms"), col("value"))
    val deltas = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .select(pt.tags :+ pt.timeMs.as("time_ms") :+ col(pt.valueCol).as("value"): _*)
      .withColumn("prev", lag(col("value"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(pt.tags ++ Seq(
        when(col("value") < col("prev"), col("value"))
          .otherwise(col("value") - col("prev")).cast("decimal(18,4)").as("contrib"),
        when(col("value") < col("prev"), 1L).otherwise(0L).as("is_reset")): _*)
    val out = deltas.groupBy(pt.tags: _*)
      .agg(round(sum(col("contrib")).cast("double"), 4).as("increase"),
        sum(col("is_reset")).as("n_resets"))
    Det.ordered(out)
  }

  /** Cross-series arithmetic: the per-bucket ratio of two tag selections
    * (PromQL binary-op shape, e.g. clicks/views per hour). Each side is one
    * bucketed aggregate; the division joins on the bucket grid.
    */
  def seriesRatio(pt: PointsTable, numFilter: Column, denFilter: Column,
                  startMs: Long, endMs: Long, stepMs: Long = 3600000L): DataFrame = {
    def side(f: Column, alias: String) = pt.df
      .where(inRange(pt, startMs, endMs) && f)
      .groupBy(floor(pt.timeMs / stepMs).as("bucket"))
      .agg(round(Det.davg(col(pt.valueCol), 4), 4).as(alias))
    val out = side(numFilter, "num_avg").join(side(denFilter, "den_avg"), Seq("bucket"))
      .select(col("bucket"), col("num_avg"), col("den_avg"),
        Det.rnd(try_divide(col("num_avg"), col("den_avg")), 6).as("ratio"))
    Det.ordered(out)
  }

  /** Coefficients of the k-term truncated EWMA: α(1-α)^i, normalized to sum
    * to 1 so the filter is an exact weighted mean of the last k points.
    * Computed once driver-side; the SAME double literals are interpolated
    * into the oracle SQL, so both engines evaluate an identical expression
    * tree (cross-engine determinism without rounding games).
    */
  def ewmaCoefs(alpha: Double = 0.3, k: Int = 8): Seq[Double] = {
    val raw = (0 until k).map(i => alpha * math.pow(1 - alpha, i))
    val norm = raw.sum
    raw.map(_ / norm)
  }

  /** Truncated EWMA smoothing: exponentially-weighted mean of the trailing
    * k points per series, expressed as a FIR lag-chain (k fixed lag terms,
    * one window sort — no per-row recursion, so it parallelizes like any
    * window). Rows without k-1 predecessors are omitted (no partial-window
    * renormalization drift).
    */
  def ewma(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
           alpha: Double = 0.3, k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(pt.tags: _*).orderBy(col("time_ms"), col("value"))
    val coefs = ewmaCoefs(alpha, k)
    val terms: Column = (0 until k).map { i =>
      lit(coefs(i)) * lag(col("value"), i).over(w): Column
    }.reduce(_ + _)
    val out = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .select(pt.tags :+ pt.timeMs.as("time_ms") :+ col(pt.valueCol).as("value"): _*)
      .withColumn("oldest", lag(col("value"), k - 1).over(w))
      .withColumn("ewma", Det.rnd(terms, 6))
      .where(col("oldest").isNotNull)
      .select(pt.tags ++ Seq(col("time_ms"), col("value"), col("ewma")): _*)
    Det.ordered(out)
  }

  /** Time-shift comparison: each (series, bucket) aggregate joined to the
    * SAME series one period earlier — the day-over-day / week-over-week
    * delta every dashboard renders. One bucketed aggregate, self-joined on
    * (series, bucket - shift); at scale both sides share the aggregate's
    * partitioning so the join is co-located.
    */
  def shiftCompare(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
                   stepMs: Long = 3600000L, shiftBuckets: Long = 24L): DataFrame = {
    val agg = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .groupBy(pt.tags :+ floor(pt.timeMs / stepMs).as("bucket"): _*)
      .agg(round(Det.davg(col(pt.valueCol), 4), 4).as("avg_value"))
    val prev = agg.select(pt.tagCols.map(t => col(t).as(s"p_$t")) ++
      Seq((col("bucket") + shiftBuckets).as("p_bucket"), col("avg_value").as("prev_avg")): _*)
    val joinCond = pt.tagCols.map(t => col(t) === col("p_" + t))
      .reduce(_ && _) && col("bucket") === col("p_bucket")
    val out = agg.join(prev, joinCond)
      .select(pt.tags ++ Seq(col("bucket"), col("avg_value"), col("prev_avg"),
        Det.rnd(col("avg_value") - col("prev_avg"), 4).as("delta")): _*)
    Det.ordered(out)
  }

  /** Series-cardinality monitoring: distinct active series per day — the
    * metric every TSDB operator watches for cardinality explosions (a tag
    * gone unbounded shows up here first). Exact per-day distinct via one
    * two-phase aggregate; at extreme scale the HLL variant
    * (`approx_distinct`) replaces the exact inner distinct.
    */
  def cardinality(pt: PointsTable, filter: Column, startMs: Long, endMs: Long): DataFrame = {
    val out = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .select(floor(pt.timeMs / MsInDay).as("day") +: pt.tags: _*)
      .distinct()
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_series"))
    Det.ordered(out)
  }

  /** OHLC downsample: per-(series, bucket) open/high/low/close — the
    * candlestick aggregate. Open/close are the values at the bucket's first/
    * last timestamp, picked via lexicographic (time, value) struct min/max so
    * same-millisecond ties are deterministic; one shuffle, all four bounds in
    * a single partial-aggregated pass (no window sort needed).
    */
  def ohlc(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
           stepMs: Long = 3600000L): DataFrame = {
    val base = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .select(pt.tags :+ floor(pt.timeMs / stepMs).as("bucket") :+
        pt.timeMs.as("t") :+ col(pt.valueCol).as("v"): _*)
    val out = base.groupBy(pt.tags :+ col("bucket"): _*)
      .agg(
        min(struct(col("t"), col("v"))).getField("v").as("open"),
        max(struct(col("t"), col("v"))).getField("v").as("close"),
        max(col("v")).as("high"),
        min(col("v")).as("low"),
        count(lit(1)).as("n"))
    Det.ordered(out)
  }

  /** Seasonal profile: per-series mean value by hour-of-day — the diurnal
    * fingerprint baselining/forecasting starts from. Hour is pure epoch-ms
    * arithmetic (no timezone/calendar dependence); one shuffle on
    * (series, hour).
    */
  def seasonalProfile(pt: PointsTable, filter: Column, startMs: Long, endMs: Long): DataFrame = {
    val out = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .groupBy(pt.tags :+ (floor(pt.timeMs / 3600000L) % 24).as("hour_of_day"): _*)
      .agg(count(lit(1)).as("n"), round(Det.davg(col(pt.valueCol), 4), 4).as("avg_value"))
    Det.ordered(out)
  }

  /** Lag-k autocorrelation (ACF) of the bucketed per-series means — the
    * periodicity detector behind seasonal decomposition (a daily cycle shows
    * as a lag-24 peak on hourly buckets). Each lag's (x, x-shifted-k) pairs
    * come from ONE window sort per series; Pearson r is assembled from
    * exact DECIMAL partial sums (x is a 4-dp bucket mean, so x·y is an
    * 8-dp exact product — sums commute, association-order independent),
    * then one double expression both engines evaluate identically.
    * Zero-variance sides are dropped (r undefined; ANSI divide-by-zero).
    * One bucketing shuffle + per-series window sorts; the final aggregate
    * reuses the series partitioning.
    */
  def autocorr(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
               lags: Seq[Int] = Seq(1, 2, 24), stepMs: Long = 3600000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val paa = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .groupBy(pt.tags :+ floor(pt.timeMs / stepMs).as("bucket"): _*)
      .agg(Det.davg(col(pt.valueCol), 4).as("x"))
    val w = Window.partitionBy(pt.tags: _*).orderBy(col("bucket"))
    val pairs = lags.map { k =>
      paa.withColumn("y", lag(col("x"), k).over(w))
        .where(col("y").isNotNull)
        .withColumn("lag", lit(k.toLong))
    }.reduce(_ unionByName _)
    def d8(c: Column) = sum(c.cast("decimal(28,8)")).cast("double")
    val agg = pairs.groupBy(pt.tags :+ col("lag"): _*)
      .agg(count(lit(1)).as("n_pairs"),
        d8(col("x")).as("sx"), d8(col("y")).as("sy"),
        d8(col("x") * col("y")).as("sxy"),
        d8(col("x") * col("x")).as("sxx"),
        d8(col("y") * col("y")).as("syy"))
      .withColumn("vx", col("n_pairs") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", col("n_pairs") * col("syy") - col("sy") * col("sy"))
      .where(col("vx") > 0 && col("vy") > 0)
    val out = agg.select(pt.tags ++ Seq(col("lag"), col("n_pairs"),
      Det.rnd((col("n_pairs") * col("sxy") - col("sx") * col("sy")) /
        sqrt(col("vx") * col("vy")), 6).as("acf")): _*)
    Det.ordered(out)
  }

  /** CUSUM changepoint detection: per series, the bucket where the running
    * deviation from the series mean peaks — the classic offline
    * change-in-mean estimator (argmax_k |S_k - k·S_n/n|). Running and total
    * sums are exact DECIMAL window aggregates over 4-dp bucket means, so the
    * cusum is an identical double in both engines; the argmax tie-breaks on
    * the earliest bucket. One bucketing shuffle, then two window passes that
    * share the per-series partitioning — at 100 TB the windows stay inside
    * the series partitions (no extra exchange after the aggregate).
    */
  def changepoint(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
                  stepMs: Long = 3600000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val paa = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .groupBy(pt.tags :+ floor(pt.timeMs / stepMs).as("bucket"): _*)
      .agg(Det.davg(col(pt.valueCol), 4).as("x"))
    val run = Window.partitionBy(pt.tags: _*).orderBy(col("bucket"))
    val tot = Window.partitionBy(pt.tags: _*)
    val cusum = paa
      .withColumn("rn", row_number().over(run).cast("bigint"))
      .withColumn("sk", sum(col("x").cast("decimal(18,4)")).over(run).cast("double"))
      .withColumn("n_buckets", count(lit(1)).over(tot))
      .withColumn("sn", sum(col("x").cast("decimal(18,4)")).over(tot).cast("double"))
      .withColumn("cusum", Det.rnd(col("sk") - col("rn") * col("sn") / col("n_buckets"), 4))
    val pick = Window.partitionBy(pt.tags: _*)
      .orderBy(abs(col("cusum")).desc, col("bucket"))
    val out = cusum
      .withColumn("pr", row_number().over(pick))
      .where(col("pr") === 1)
      .select(pt.tags ++ Seq(col("bucket").as("cp_bucket"),
        col("cusum").as("cp_cusum"), col("n_buckets")): _*)
    Det.ordered(out)
  }

  /** Multi-window SLO burn rate: per hour, the error-budget consumption rate
    * over the short (1-bucket) and long (trailing `longN`-bucket) windows,
    * plus the page-worthy flag (both windows burning >1× budget — the
    * standard fast+slow-window alerting rule). The rolling sums are a RANGE
    * frame on the bucket index, so missing hours shrink the long window
    * instead of silently stretching it. The global window runs over the
    * already-aggregated hourly table (O(hours) rows), not the raw points —
    * the only full shuffle is the hourly aggregate.
    */
  def burnRate(pt: PointsTable, badFilter: Column, filter: Column,
               startMs: Long, endMs: Long, stepMs: Long = 3600000L,
               budget: Double = 0.25, longN: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .groupBy(floor(pt.timeMs / stepMs).as("bucket"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(badFilter, lit(1L)).otherwise(lit(0L))).as("n_bad"))
    val w = Window.orderBy(col("bucket")).rangeBetween(-(longN - 1).toLong, 0L)
    val out = hourly
      .withColumn("bad_l", sum(col("n_bad")).over(w))
      .withColumn("tot_l", sum(col("n_total")).over(w))
      .select(col("bucket"), col("n_total"), col("n_bad"),
        Det.rnd(col("n_bad") * lit(1.0) / col("n_total") / budget, 4).as("short_burn"),
        Det.rnd(col("bad_l") * lit(1.0) / col("tot_l") / budget, 4).as("long_burn"))
      .withColumn("alerting",
        (col("short_burn") > 1.0 && col("long_burn") > 1.0).cast("bigint"))
    Det.ordered(out)
  }

  /** SAX symbolization (Lin et al., "Symbolic Aggregate approXimation"):
    * per-series hourly means, z-normalized per series, mapped to a 4-letter
    * alphabet at the N(0,1) quartile breakpoints (±0.6745, 0), then
    * concatenated into one word per (series, day) — the discretized shape
    * fingerprint similarity search and motif discovery run on. Mean/std come
    * from exact DECIMAL sums (identical doubles cross-engine) and z is
    * rounded before the breakpoint compares so a boundary-straddling value
    * can't flip letters between engines. Constant series (sd=0) are dropped.
    * One bucketing shuffle; the window stats and the word-assembly aggregate
    * both reuse the series partitioning.
    */
  def sax(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
          stepMs: Long = 3600000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val paa = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .groupBy(pt.tags :+ floor(pt.timeMs / stepMs).as("bucket"): _*)
      .agg(Det.davg(col(pt.valueCol), 4).as("x"))
    val tot = Window.partitionBy(pt.tags: _*)
    val z = paa
      .withColumn("n", count(lit(1)).over(tot))
      .withColumn("sx", sum(col("x").cast("decimal(18,4)")).over(tot).cast("double"))
      .withColumn("sxx", sum((col("x") * col("x")).cast("decimal(28,8)")).over(tot).cast("double"))
      .withColumn("sd", sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / col("n")))
      .where(col("sd") > 0)
      .withColumn("z", Det.rnd((col("x") - col("sx") / col("n")) / col("sd"), 6))
      .withColumn("sym",
        when(col("z") < -0.6745, lit("a"))
          .when(col("z") < 0, lit("b"))
          .when(col("z") < 0.6745, lit("c"))
          .otherwise(lit("d")))
    val stepsPerDay = (MsInDay / stepMs).max(1L)
    val out = z
      .withColumn("day", floor(col("bucket") / stepsPerDay).cast("bigint"))
      .groupBy(pt.tags :+ col("day"): _*)
      .agg(count(lit(1)).as("n_sym"),
        array_join(transform(array_sort(collect_list(struct(col("bucket"), col("sym")))),
          s => s.getField("sym")), "").as("sax_word"))
    Det.ordered(out)
  }

  /** Coefficients of Brown's double exponential smoothing unrolled to a
    * single FIR: s2 = c ⊛ c over the raw series (convolution of the
    * truncated-normalized EWMA kernel with itself, length 2k-1). Computed
    * once driver-side and shipped as literals so both engines evaluate the
    * identical expression tree.
    */
  def brownCoefs(alpha: Double = 0.3, k: Int = 8): (Seq[Double], Seq[Double]) = {
    val c = ewmaCoefs(alpha, k)
    val d = Array.fill(2 * k - 1)(0.0)
    for (i <- 0 until k; j <- 0 until k) d(i + j) += c(i) * c(j)
    (c, d.toSeq)
  }

  /** Brown's double exponential smoothing + one-step forecast per series
    * over hourly means: s1 = EWMA(x), s2 = EWMA(s1), level = 2s1 − s2,
    * trend = α/(1−α)·(s1−s2), forecast = level + trend. Both smoothers are
    * FIR lag-chains over the SAME window sort (s2's kernel is c⊛c, see
    * [[brownCoefs]]) — no per-row recursion, parallelizes like any window.
    * Rows without 2k-2 predecessors are omitted (no partial-kernel drift).
    */
  def doubleSmooth(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
                   alpha: Double = 0.3, k: Int = 8, stepMs: Long = 3600000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (c, cc) = brownCoefs(alpha, k)
    val paa = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .groupBy(pt.tags :+ floor(pt.timeMs / stepMs).as("bucket"): _*)
      .agg(Det.davg(col(pt.valueCol), 4).as("x"))
    val w = Window.partitionBy(pt.tags: _*).orderBy(col("bucket"))
    def fir(coefs: Seq[Double]): Column =
      coefs.zipWithIndex.map { case (co, i) =>
        lit(co) * lag(col("x"), i).over(w): Column
      }.reduce(_ + _)
    val out = paa
      .withColumn("oldest", lag(col("x"), 2 * k - 2).over(w))
      .withColumn("s1", fir(c))
      .withColumn("s2", fir(cc))
      .where(col("oldest").isNotNull)
      .select(pt.tags ++ Seq(col("bucket"), col("x"),
        Det.rnd(col("s1"), 6).as("s1"), Det.rnd(col("s2"), 6).as("s2"),
        Det.rnd(lit(2.0) * col("s1") - col("s2") +
          lit(alpha / (1 - alpha)) * (col("s1") - col("s2")), 6).as("forecast")): _*)
    Det.ordered(out)
  }

  /** Lagged cross-correlation between two filtered series families (e.g.
    * does click volume lead error rate?): hourly means of each side,
    * equi-joined on (bucket − lag), Pearson r from exact DECIMAL partial
    * sums per lag — [[autocorr]]'s machinery across two series. The join is
    * on the tiny bucketed aggregates, never the raw points.
    */
  def crossCorr(pt: PointsTable, filterA: Column, filterB: Column,
                startMs: Long, endMs: Long, lags: Seq[Int] = Seq(0, 1, 2),
                stepMs: Long = 3600000L): DataFrame = {
    def paa(f: Column) = pt.df
      .where(inRange(pt, startMs, endMs) && f)
      .groupBy(floor(pt.timeMs / stepMs).as("bucket"))
      .agg(Det.davg(col(pt.valueCol), 4).as("x"))
    val a = paa(filterA)
    val b = paa(filterB).select(col("bucket").as("b_bucket"), col("x").as("y"))
    val pairs = lags.map { l =>
      a.join(b, col("bucket") === col("b_bucket") + l)
        .select(lit(l.toLong).as("lag"), col("x"), col("y"))
    }.reduce(_ unionByName _)
    def d8(c: Column) = sum(c.cast("decimal(28,8)")).cast("double")
    val agg = pairs.groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        d8(col("x")).as("sx"), d8(col("y")).as("sy"),
        d8(col("x") * col("y")).as("sxy"),
        d8(col("x") * col("x")).as("sxx"),
        d8(col("y") * col("y")).as("syy"))
      .withColumn("vx", col("n_pairs") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", col("n_pairs") * col("syy") - col("sy") * col("sy"))
      .where(col("vx") > 0 && col("vy") > 0)
    val out = agg.select(col("lag"), col("n_pairs"),
      Det.rnd((col("n_pairs") * col("sxy") - col("sx") * col("sy")) /
        sqrt(col("vx") * col("vy")), 6).as("xcorr"))
    Det.ordered(out)
  }

  /** Classical seasonal decomposition: per series, hourly means split into
    * trend (centered ±12h moving average, full windows only), seasonal
    * (hour-of-day mean of the detrended values), and residual — the
    * additive STL-lite every capacity dashboard draws. The trend mean is an
    * exact DECIMAL window sum over 4-dp bucket means divided by the fixed
    * width; detrended values are ≤6-dp exact, so the seasonal profile's
    * sums commute too. One bucketing shuffle; trend windows and the final
    * join all stay inside the series partitioning, and the 24-row-per-series
    * seasonal table broadcasts back.
    */
  def seasonalDecompose(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
                        stepMs: Long = 3600000L, half: Int = 12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val width = 2 * half + 1
    val paa = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .groupBy(pt.tags :+ floor(pt.timeMs / stepMs).as("bucket"): _*)
      .agg(Det.davg(col(pt.valueCol), 4).as("x"))
    val w = Window.partitionBy(pt.tags: _*).orderBy(col("bucket"))
      .rowsBetween(-half, half)
    val trended = paa
      .withColumn("w_n", count(lit(1)).over(w))
      .withColumn("trend",
        Det.rnd(sum(col("x").cast("decimal(18,4)")).over(w).cast("double") / width, 6))
      .where(col("w_n") === width)
      .withColumn("detrended", col("x") - col("trend"))
      // daily seasonality whatever the bucket width: the cycle length in
      // buckets derives from stepMs (24 phases at the hourly default; a
      // hardcoded %24 would silently shift the cycle for any other step)
      .withColumn("phase", col("bucket") % math.max(Det.MsInDay / stepMs, 1L))
    val seasonal = trended
      .groupBy(pt.tags :+ col("phase"): _*)
      .agg(Det.rnd(sum(col("detrended").cast("decimal(28,8)")).cast("double")
        / count(lit(1)), 6).as("seasonal"))
    val out = trended
      .join(seasonal, pt.tagCols :+ "phase")
      .select(pt.tags ++ Seq(col("bucket"), col("x"), col("trend"), col("seasonal"),
        Det.rnd(col("detrended") - col("seasonal"), 6).as("residual")): _*)
    Det.ordered(out)
  }

  /** Time-weighted average per series over irregular samples: each point's
    * value weighted by its hold time until the next sample (the right mean
    * for gauges sampled on change, where the arithmetic mean over-counts
    * bursts). value×duration products are exact (2-dp value × integer ms)
    * and sum as DECIMAL, so the integral is engine-exact; TWA divides by
    * the covered span. One window sort per series, one aggregate.
    */
  def timeWeightedAvg(pt: PointsTable, filter: Column, startMs: Long, endMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(pt.tags: _*).orderBy(col("t"), col("v"))
    val segs = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .select(pt.tags :+ pt.timeMs.as("t") :+ col(pt.valueCol).as("v"): _*)
      .withColumn("nt", lead(col("t"), 1).over(w))
      .where(col("nt").isNotNull)
      .select(pt.tags ++ Seq(col("v"), (col("nt") - col("t")).as("dur")): _*)
    val out = segs
      .groupBy(pt.tags: _*)
      .agg(count(lit(1)).as("n_segments"),
        sum(col("dur")).as("span_ms"),
        sum((col("v") * col("dur")).cast("decimal(38,2)")).cast("double").as("integral"))
      .where(col("span_ms") > 0)
      .select(pt.tags ++ Seq(col("n_segments"), col("span_ms"),
        Det.rnd(col("integral"), 2).as("integral"),
        Det.rnd(col("integral") / col("span_ms"), 6).as("twa")): _*)
    Det.ordered(out)
  }

  /** Mean-crossing counts per series: how often the signal crosses its own
    * mean upward — the cheap oscillation/burstiness diagnostic (a noisy
    * series crosses constantly, a trending one almost never). The mean is
    * an exact-decimal window aggregate rounded before the compares, so the
    * crossing set is engine-exact; one sort per series.
    */
  def meanCrossings(pt: PointsTable, filter: Column, startMs: Long, endMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(pt.tags: _*).orderBy(col("t"), col("v"))
    val tot = Window.partitionBy(pt.tags: _*)
    val base = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .select(pt.tags :+ pt.timeMs.as("t") :+ col(pt.valueCol).as("v"): _*)
      .withColumn("m", Det.rnd(
        sum(col("v").cast("decimal(18,4)")).over(tot).cast("double") /
          count(lit(1)).over(tot), 4))
      .withColumn("pv", lag(col("v"), 1).over(w))
    val out = base
      .groupBy(pt.tags: _*)
      .agg(count(lit(1)).as("n_points"),
        sum(when(col("pv") < col("m") && col("v") >= col("m"), lit(1L))
          .otherwise(lit(0L))).as("n_up_crossings"))
    Det.ordered(out)
  }

  /** M4 downsampling (Jugel et al., VLDB '14): per (series, pixel bucket)
    * the min/max/first/last POINTS — the four rows that make a line
    * rendering pixel-identical to the raw series at stepMs-per-pixel
    * resolution. [[lttb]] keeps visual salience under a point budget; M4
    * is the lossless-rendering guarantee, and the other standard answer a
    * dashboard backend needs. ONE partial aggregation: min_by/max_by pick
    * the four (t, v) pairs per bucket under TOTAL struct orderings (so
    * ties cannot make the pick nondeterministic), then the ≤4 distinct
    * points explode back out — no window sort, map-side combinable, the
    * same single-shuffle shape as `downsample`.
    */
  def m4(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
         stepMs: Long = 3600000L): DataFrame = {
    val base = pt.df.where(inRange(pt, startMs, endMs) && filter)
      .select(pt.tags :+ pt.timeMs.as("t") :+ col(pt.valueCol).as("v"): _*)
      .withColumn("bucket", floor(col("t") / lit(stepMs.toDouble)).cast("bigint"))
    val tv = struct(col("t"), col("v"))
    val byV = struct(col("v"), col("t"))
    val agg = base.groupBy(pt.tags :+ col("bucket"): _*)
      .agg(
        min_by(tv, byV).as("p_min"), max_by(tv, byV).as("p_max"),
        min(tv).as("p_first"), max(tv).as("p_last"))
    val out = agg
      .select(pt.tags ++ Seq(col("bucket"),
        explode(array(col("p_min"), col("p_max"), col("p_first"), col("p_last")))
          .as("p")): _*)
      .select(pt.tags ++ Seq(col("bucket"), col("p.t").as("time_ms"),
        col("p.v").as("value")): _*)
      .distinct()
    Det.ordered(out)
  }

  /** LTTB-style downsampling (largest-triangle, bucket-mean anchors — the
    * deterministic variant of Steinarsson's largest-triangle-three-buckets):
    * per (series, hourly bucket) keep the ONE point whose triangle against
    * the neighboring buckets' mean anchors has the largest area — the
    * downsampler that preserves visual extremes where OHLC/mean smearing
    * loses them. Anchors are exact-decimal bucket means (time and value)
    * rounded before the area compare; interior buckets only. One bucketing
    * pass + per-bucket rank, all inside the series partitioning.
    */
  def lttb(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
           stepMs: Long = 3600000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // triangle geometry runs in bucket-scaled time (t/stepMs): at raw-ms
    // magnitude the area (~1e8) would outgrow the Det.rnd +1e-9 nudge
    // (double spacing there exceeds it), so areas are kept at O(1e2)
    val base = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .select(pt.tags :+ pt.timeMs.as("t") :+ col(pt.valueCol).as("v"): _*)
      .withColumn("bucket", floor(col("t") / stepMs))
      .withColumn("th", Det.rnd(col("t") / lit(stepMs.toDouble), 6))
    val anchors = base.groupBy(pt.tags :+ col("bucket"): _*)
      .agg(
        Det.rnd(sum(col("t").cast("decimal(28,4)")).cast("double") / count(lit(1))
          / lit(stepMs.toDouble), 6).as("at"),
        Det.davg(col("v"), 4).as("av"))
    val wS = Window.partitionBy(pt.tags: _*).orderBy(col("bucket"))
    val tri = anchors
      .withColumn("pa_t", lag(col("at"), 1).over(wS))
      .withColumn("pa_v", lag(col("av"), 1).over(wS))
      .withColumn("na_t", lead(col("at"), 1).over(wS))
      .withColumn("na_v", lead(col("av"), 1).over(wS))
      .where(col("pa_t").isNotNull && col("na_t").isNotNull)
      .select(pt.tags ++ Seq(col("bucket"), col("pa_t"), col("pa_v"),
        col("na_t"), col("na_v")): _*)
    val wP = Window.partitionBy(pt.tags :+ col("bucket"): _*)
      .orderBy(col("area").desc, col("t"), col("v"))
    val out = base.join(tri, pt.tagCols :+ "bucket")
      .withColumn("area", Det.rnd(abs(
        (col("pa_t") - col("na_t")) * (col("v") - col("pa_v")) -
        (col("pa_t") - col("th")) * (col("na_v") - col("pa_v"))) / 2.0, 4))
      .withColumn("rn", row_number().over(wP))
      .where(col("rn") === 1)
      .select(pt.tags ++ Seq(col("bucket"), col("t"), col("v"), col("area")): _*)
    Det.ordered(out)
  }

  /** Seasonality-aware anomalies: z-score outliers over the RESIDUAL of
    * [[seasonalDecompose]] — the detector that does not page on the daily
    * peak because the peak is in the seasonal term (plain `anomalies` z
    * flags it). Residuals are ≤6-dp exact decimals, so their moments sum
    * exactly; the threshold compares rounded z both engines agree on.
    * Composition reuses the decompose plan: everything stays inside the
    * series partitioning.
    */
  def anomaliesStl(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
                   z: Double = 3.0, stepMs: Long = 3600000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = seasonalDecompose(pt, filter, startMs, endMs, stepMs)
    val tot = Window.partitionBy(pt.tags: _*)
    def d8(c: Column) = sum(c.cast("decimal(28,8)")).over(tot).cast("double")
    // residuals are 6-dp exact, so their squares need 12 decimal places to
    // sum exactly (DECIMAL(28,8) would round the product cross-engine)
    def d12(c: Column) = sum(c.cast("decimal(38,12)")).over(tot).cast("double")
    val scored = dec
      .withColumn("n", count(lit(1)).over(tot))
      .withColumn("sr", d8(col("residual")))
      .withColumn("srr", d12(col("residual") * col("residual")))
      .withColumn("sd", sqrt((col("srr") - col("sr") * col("sr") / col("n")) / col("n")))
      .where(col("sd") > 0)
      .withColumn("rz", Det.rnd((col("residual") - col("sr") / col("n")) / col("sd"), 4))
    val out = scored
      .where(abs(col("rz")) > z)
      .select(pt.tags ++ Seq(col("bucket"), col("x"), col("residual"), col("rz")): _*)
    Det.ordered(out)
  }

  /** Rolling cross-correlation: trailing-24h-window Pearson between two
    * series families per hour — [[crossCorr]]'s moving sibling (does the
    * click→error coupling strengthen during incidents?). All five running
    * sums are exact DECIMAL RANGE-frame aggregates over the joined hourly
    * means, so every window's r is an identical double cross-engine; windows
    * with fewer than `minN` paired buckets or zero variance drop out. The
    * join and every frame run over the tiny bucketed aggregates.
    */
  def rollingCorr(pt: PointsTable, filterA: Column, filterB: Column,
                  startMs: Long, endMs: Long, stepMs: Long = 3600000L,
                  windowN: Int = 24, minN: Int = 12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def paa(f: Column, v: String) = pt.df
      .where(inRange(pt, startMs, endMs) && f)
      .groupBy(floor(pt.timeMs / stepMs).as(if (v == "x") "bucket" else "b_bucket"))
      .agg(Det.davg(col(pt.valueCol), 4).as(v))
    val joined = paa(filterA, "x")
      .join(paa(filterB, "y"), col("bucket") === col("b_bucket"))
    val w = Window.orderBy(col("bucket")).rangeBetween(-(windowN - 1).toLong, 0L)
    def d8(c: Column) = sum(c.cast("decimal(28,8)")).over(w).cast("double")
    val roll = joined
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", d8(col("x"))).withColumn("sy", d8(col("y")))
      .withColumn("sxy", d8(col("x") * col("y")))
      .withColumn("sxx", d8(col("x") * col("x")))
      .withColumn("syy", d8(col("y") * col("y")))
      .withColumn("vx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", col("n") * col("syy") - col("sy") * col("sy"))
      .where(col("n") >= minN && col("vx") > 0 && col("vy") > 0)
    val out = roll.select(col("bucket"), col("n").as("n_pairs"),
      Det.rnd((col("n") * col("sxy") - col("sx") * col("sy")) /
        sqrt(col("vx") * col("vy")), 6).as("rcorr"))
    Det.ordered(out)
  }

  /** Absent-series alerting (PromQL `absent()` over a sliding pair of
    * windows): series that reported in the previous window but are silent
    * in the current one, with their last-seen time and prior point count —
    * the disappearance alert `availability` (which scores known series)
    * cannot raise. Two pruned scans + one LEFT ANTI join on the series key.
    */
  def absentSeries(pt: PointsTable, filter: Column, endMs: Long,
                   windowMs: Long = MsInDay): DataFrame = {
    val prev = pt.df
      .where(inRange(pt, endMs - 2 * windowMs, endMs - windowMs) && filter)
      .groupBy(pt.tags: _*)
      .agg(max(pt.timeMs).as("last_seen_ms"), count(lit(1)).as("n_prev_points"))
    val cur = pt.df
      .where(inRange(pt, endMs - windowMs, endMs) && filter)
      .select(pt.tags: _*).distinct()
    val out = prev.join(cur, pt.tagCols, "left_anti")
    Det.ordered(out)
  }

  /** SAX motif discovery — the reason SAX exists: recurring day-shape words
    * across all (series, day) slots, ranked by support. Words from partial
    * days (fewer than `minSyms` symbols) are noise and drop; top-K via
    * TakeOrdered on (count desc, word) — no global sort.
    */
  def saxMotifs(pt: PointsTable, filter: Column, startMs: Long, endMs: Long,
                k: Int = 20, minSyms: Int = 12): DataFrame = {
    sax(pt, filter, startMs, endMs)
      .where(col("n_sym") >= minSyms)
      .groupBy(col("sax_word"))
      .agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("sax_word"))
      .limit(k)
  }

  /** Hour-of-day quantile bands: the p10/p50/p90 envelope per series and
    * hour — the "normal band" a dashboard shades behind the live line, and
    * the baseline table hour-aware alerting compares against. Exact
    * percentiles per (series, hour) group (24 groups per series; at extreme
    * cardinality `approx_percentile` swaps in under the declared rows-only
    * pattern, like `skew_stats_approx`).
    */
  def bandProfile(pt: PointsTable, filter: Column, startMs: Long, endMs: Long): DataFrame = {
    val out = pt.df
      .where(inRange(pt, startMs, endMs) && filter)
      .groupBy(pt.tags :+ (floor(pt.timeMs / 3600000L) % 24).as("hour_of_day"): _*)
      .agg(count(lit(1)).as("n"),
        Det.rnd(expr(s"percentile(${pt.valueCol}, 0.1)"), 4).as("p10"),
        Det.rnd(expr(s"percentile(${pt.valueCol}, 0.5)"), 4).as("p50"),
        Det.rnd(expr(s"percentile(${pt.valueCol}, 0.9)"), 4).as("p90"))
    Det.ordered(out)
  }

  /** Per-(bucket, series) stats — the storage layout rendered as a query:
    * row key (attrs), clustering (offset) min/max, point count, value sum.
    */
  def bucketStats(pt: PointsTable): DataFrame = {
    val out = pt.df
      .groupBy(bucketOf(pt.timeMs).as("bucket_day") +: pt.tags: _*)
      .agg(
        count(lit(1)).as("n"),
        min(offsetOf(pt.timeMs)).as("min_offset"),
        max(offsetOf(pt.timeMs)).as("max_offset"),
        round(Det.dsum(col(pt.valueCol)), 2).as("sum_value"))
    Det.ordered(out)
  }
}
