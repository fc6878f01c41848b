package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{BurnStream, IngestStream}

class BurnStreamSpec extends SparkTestBase {

  test("streaming burn rate alerts once per closed window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double, Long, String)]
    val validated = IngestStream.validate(
      mem.toDF().toDF("time", "value", "user_id", "event_type"))
    val burn = BurnStream.burn(validated, budget = 0.25)

    val q = burn.writeStream.format("memory").queryName("burn")
      .outputMode("append").start()

    // one 10-min window: 2 errors of 4 events -> ratio 0.5, burn 2.0
    mem.addData(
      ("2024-01-09T10:00:10Z", 1.0, 1L, "click"),
      ("2024-01-09T10:02:00Z", 1.0, 2L, "error"),
      ("2024-01-09T10:04:00Z", 1.0, 3L, "error"),
      ("2024-01-09T10:06:00Z", 1.0, 4L, "view"))
    q.processAllAvailable()
    assert(spark.table("burn").count() == 0, "window still open")

    // an event far past the 30-min watermark closes it
    mem.addData(("2024-01-09T11:30:00Z", 1.0, 5L, "click"))
    q.processAllAvailable()
    val rows = spark.table("burn").collect()
    q.stop()

    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_total") == 4L && r.getAs[Long]("n_bad") == 2L)
    assert(math.abs(r.getAs[Double]("burn") - 2.0) < 1e-9)
    assert(r.getAs[Int]("alerting") == 1)
  }

  test("streaming active-user cardinality merges sketch state per window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double, Long, String)]
    val validated = IngestStream.validate(
      mem.toDF().toDF("time", "value", "user_id", "event_type"))
    val card = BurnStream.activeUsers(validated, windowDur = "10 minutes",
      watermark = "30 minutes")
    val q = card.writeStream.format("memory").queryName("card")
      .outputMode("append").start()

    // 5 events from 3 distinct users in one window, split across batches
    // (sketch state must merge across micro-batches)
    mem.addData(
      ("2024-01-09T10:00:10Z", 1.0, 1L, "click"),
      ("2024-01-09T10:02:00Z", 1.0, 2L, "view"))
    q.processAllAvailable()
    mem.addData(
      ("2024-01-09T10:04:00Z", 1.0, 1L, "click"),
      ("2024-01-09T10:05:00Z", 1.0, 3L, "click"),
      ("2024-01-09T10:06:00Z", 1.0, 2L, "error"))
    q.processAllAvailable()
    mem.addData(("2024-01-09T11:30:00Z", 1.0, 9L, "click"))
    q.processAllAvailable()
    val rows = spark.table("card").collect()
    q.stop()
    assert(rows.length == 1)
    // HLL++ at default rsd is exact at this cardinality
    assert(rows.head.getAs[Long]("approx_users") == 3L)
  }
}
