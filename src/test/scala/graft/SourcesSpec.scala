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

  test("unsupported formats are rejected, not silently misread") {
    intercept[IllegalArgumentException] {
      Sources.read(spark, "/nowhere", "xml")
    }
  }
}
