package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Format interop: the same rows must survive a parquet → csv/json → read
  * round trip with an explicit schema (no inference pass).
  */
class SourcesSpec extends SparkTestBase {
  private def tmp(name: String) =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), name).toString

  private lazy val sample = graft.core.Tables.events(spark, Sf)
    .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    .where(col("user_id") < 5)

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet

  test("csv round trip preserves rows under an explicit schema") {
    val p = tmp("csv")
    Sources.write(sample, p, "csv")
    val back = Sources.read(spark, p, "csv", Some(sample.schema))
    assert(asSet(back) == asSet(sample))
  }

  test("json round trip preserves rows under an explicit schema") {
    val p = tmp("json")
    Sources.write(sample, p, "json")
    val back = Sources.read(spark, p, "json", Some(sample.schema))
    assert(asSet(back) == asSet(sample))
  }

  test("orc round trip preserves rows and pushes filters into the scan") {
    val p = tmp("orc")
    Sources.write(sample, p, "orc")
    val back = Sources.read(spark, p, "orc")
    assert(asSet(back) == asSet(sample))
    // ORC has the same statistics-bearing scan contract as parquet: the
    // predicate must reach PushedFilters, not evaluate post-scan only
    val filtered = back.where(col("user_id") === 3)
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [") && scan.contains("user_id"), scan)
  }

  test("unsupported formats are rejected, not silently misread") {
    intercept[IllegalArgumentException] {
      Sources.read(spark, "/nowhere", "xml")
    }
  }

  test("persisted IVF codebook reloads and reproduces in-session ANN results bit-exactly") {
    import graft.ann.Ann
    val root = tmp("codebooks")
    val (ivfPath, pqPath) = Ann.saveCodebooks(spark, Sf, root)
    // both artifacts landed as readable parquet tables
    val ivf = Ann.loadCodebook(spark, ivfPath)
    assert(ivf.columns.toSet == Set("c_id", "cv", "cn"))
    assert(ivf.count() > 0)
    assert(Ann.loadCodebook(spark, pqPath).columns.toSet == Set("csp", "c_id", "cv"))
    // the RELOADED codebook drives ivf search to the bit-identical result
    // of the in-session trained one (deterministic training + exact parquet
    // double round-trip)
    val inSession = Ann.ivfTopK(spark, Sf).collect().toSeq
    val reloaded = Ann.ivfTopKWith(spark, Sf, ivf).collect().toSeq
    assert(reloaded == inSession)
  }

  test("bucketed tables join without any exchange (co-located join)") {
    val events = graft.core.Tables.events(spark, Sf)
      .select(col("event_id"), col("user_id"), col("value"))
    val users = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    Sources.writeBucketed(events, "bt_events", "user_id", nBuckets = 4)
    Sources.writeBucketed(users, "bt_users", "user_id", nBuckets = 4)
    try {
      // the merge hint pins a sort-merge join PER QUERY (other suites share
      // this session — never mutate global conf like the broadcast
      // threshold here), so the test proves the BUCKETED path elides the
      // shuffle, not the broadcast path
      val joined = spark.table("bt_events").hint("merge")
        .join(spark.table("bt_users"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // and it computes the right thing
      assert(joined.count() == events.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS bt_events")
      spark.sql("DROP TABLE IF EXISTS bt_users")
    }
  }
}
