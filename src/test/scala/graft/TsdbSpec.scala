package graft

import org.apache.spark.sql.functions._
import graft.tsdb.{EsFilter, Tsdb}

class TsdbSpec extends SparkTestBase {
  private val matchAll = EsFilter.compile("""{"match_all":{}}""")
  private lazy val pt = Tsdb.points(spark, Sf)
  private val start = 1704672000000L // 2024-01-08
  private val end   = 1705881600000L // 2024-01-22

  test("read returns only points in [start, end) with matching tags, sorted") {
    val rows = Tsdb.read(pt, EsFilter.compile("""{"term":{"user_id":7}}"""), start, end)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) == 7L))
    val times = rows.map(_.getLong(2))
    assert(times.forall(t => t >= start && t < end))
  }

  test("countPoints matches read row counts per series") {
    val counts = Tsdb.countPoints(pt, matchAll, start, end)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val raw = Tsdb.read(pt, matchAll, start, end)
      .groupBy("user_id", "event_type").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(counts == raw)
  }

  test("seriesList = distinct tag sets of read output") {
    val series = Tsdb.seriesList(pt, matchAll, start, end).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val fromRead = Tsdb.read(pt, matchAll, start, end).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(series == fromRead)
  }

  test("selectDistinct surfaces missing keys as null column") {
    val rows = Tsdb.selectDistinct(pt, matchAll, Seq("event_type", "no_such_tag")).collect()
    assert(rows.nonEmpty && rows.forall(_.isNullAt(1)))
    assert(rows.map(_.getString(0)).toSet ==
      Set("purchase", "click", "view", "signup", "error"))
  }

  test("bucketStats offsets stay within one granularity span") {
    val weekMs = Tsdb.GranularityDays * Tsdb.MsInDay
    val bad = Tsdb.bucketStats(pt)
      .where(col("min_offset") < 0 || col("max_offset") >= weekMs ||
             col("bucket_day") % Tsdb.GranularityDays =!= 0)
      .count()
    assert(bad == 0)
  }

  test("retention drops exactly the buckets older than keep_days") {
    val all = Tsdb.bucketStats(pt).select("bucket_day").distinct()
      .collect().map(_.getLong(0)).toSet
    val kept = Tsdb.retentionSurvivors(pt, keepDays = 14)
      .collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(all) && kept.nonEmpty)
    assert((all -- kept).forall(b => b < kept.min)) // dropped buckets are the oldest
  }

  test("retention on an empty points table returns empty, not NPE") {
    import spark.implicits._
    val emptyPt = graft.tsdb.PointsTable(
      Seq.empty[(java.sql.Timestamp, Double, Long)].toDF("ts", "value", "user_id"),
      "ts", "value", Seq("user_id"))
    val out = Tsdb.retentionSurvivors(emptyPt, keepDays = 7)
    assert(out.columns.toSeq == Seq("bucket_day", "n") && out.count() == 0)
  }

  test("ingest validation accepts the clean driver data") {
    val rows = Tsdb.ingestValidate(pt).collect()
    assert(rows.length == 1 && rows(0).getBoolean(0) && rows(0).getBoolean(1))
  }

  test("dedup meta has one row per (bucket, series) with n summing to total") {
    val meta = Tsdb.ingestDedupMeta(pt)
    val total = meta.agg(sum("n")).first().getLong(0)
    assert(total == pt.df.count())
    assert(meta.groupBy("bucket_day", "user_id", "event_type").count()
      .where(col("count") > 1).count() == 0)
  }

  private def syntheticPt(rows: Seq[(Long, Double, String)]) = {
    import spark.implicits._
    graft.tsdb.PointsTable(
      rows.toDF("ms", "value", "name")
        .select(org.apache.spark.sql.functions.timestamp_millis(col("ms")).as("ts"),
          col("value"), col("name")),
      "ts", "value", Seq("name"))
  }

  test("interpolate hits exact points and interpolates linearly between them") {
    val h = 3600000L
    // series 'a': points at t=0h (v=10) and t=2h (v=30) -> grid 0h,1h,2h
    val p = syntheticPt(Seq((0L, 10.0, "a"), (2 * h, 30.0, "a")))
    val rows = Tsdb.interpolate(p, matchAll, -1L, 3 * h, stepMs = h)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((0L, 10.0), (h, 20.0), (2 * h, 30.0)))
  }

  test("interpolate reduces same-timestamp points to their max first") {
    val h = 3600000L
    val p = syntheticPt(Seq((0L, 1.0, "a"), (0L, 5.0, "a"), (h, 5.0, "a")))
    val rows = Tsdb.interpolate(p, matchAll, -1L, 2 * h, stepMs = h)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((0L, 5.0), (h, 5.0)))
  }

  test("anomalies flags exactly the >2-sigma points and skips flat series") {
    val h = 3600000L
    // 'flat' has zero variance -> excluded; 'spiky' has one huge outlier
    val base = (0 until 20).map(i => (i * h, 10.0, "spiky"))
    val p = syntheticPt(base :+ (20 * h, 1000.0, "spiky")
      :+ (0L, 7.0, "flat") :+ (h, 7.0, "flat"))
    val out = Tsdb.anomalies(p, matchAll, -1L, 30 * h, z = 2.0).collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "spiky" && out(0).getDouble(2) == 1000.0)
    assert(out(0).getDouble(3) > 4.0, "outlier z-score is large")
  }

  test("latest picks the max-time point per series") {
    val p = syntheticPt(Seq((0L, 1.0, "a"), (5L, 2.0, "a"), (3L, 9.0, "b")))
    val rows = Tsdb.latest(p, matchAll, -1L, 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == Set(("a", 5L, 2.0), ("b", 3L, 9.0)))
  }

  test("histogram bins cover every point exactly once") {
    val n = Tsdb.histogram(pt, matchAll, start, end)
      .agg(sum("n")).first().getLong(0)
    val total = pt.df.where(pt.inRange(start, end)).count()
    assert(n == total)
  }
}
