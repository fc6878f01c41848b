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
}
