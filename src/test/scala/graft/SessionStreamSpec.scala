package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{IngestStream, SessionStream}

class SessionStreamSpec extends SparkTestBase {

  test("stateful sessionizer closes sessions on gap and keeps state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double, Long, String)]
    val validated = IngestStream.validate(
      mem.toDF().toDF("time", "value", "user_id", "event_type"))
    val sessions = SessionStream.sessions(spark, validated, gapMs = 3600000L)

    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()

    // batch 1: user 1 opens a session (2 events, 10 min apart)
    mem.addData(
      ("2024-01-09T10:00:00Z", 1.0, 1L, "click"),
      ("2024-01-09T10:10:00Z", 1.0, 1L, "click"))
    q.processAllAvailable()
    assert(spark.table("sess").count() == 0, "session still open after batch 1")

    // batch 2: event 3h later closes the first session and opens a second;
    // state carried across the micro-batch boundary
    mem.addData(("2024-01-09T13:30:00Z", 1.0, 1L, "click"))
    q.processAllAvailable()
    val closed = spark.table("sess").as[SessionStream.ClosedSession].collect()
    q.stop()

    assert(closed.length == 1)
    val s = closed.head
    assert(s.userId == 1L && s.nEvents == 2L)
    assert(s.endMs - s.startMs == 600000L, s"10-minute session, got ${s.endMs - s.startMs}")
  }
}
