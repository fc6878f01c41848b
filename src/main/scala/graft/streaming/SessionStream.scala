package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization with explicit state —
  * `mapGroupsWithState` over per-user event groups, emitting closed sessions
  * when the gap (or state timeout) expires.
  *
  * This is the live counterpart of `Analytics.sessionize`: state is one
  * open-session summary per user (bounded), timeouts evict idle users, and
  * partitioning by user key means state lives where the events shuffle to —
  * the pattern that holds at 1000 executors.
  */
object SessionStream {

  case class Event(userId: Long, timeMs: Long, value: Double)
  case class OpenSession(userId: Long, startMs: Long, lastMs: Long, nEvents: Long)
  case class ClosedSession(userId: Long, startMs: Long, endMs: Long, nEvents: Long)

  /** Fold a batch of events into the open session, emitting sessions closed
    * by a gap within the batch or by state timeout (when enabled).
    */
  def updateSessions(gapMs: Long, withTimeout: Boolean)(
      userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(ClosedSession(s.userId, s.startMs, s.lastMs, s.nEvents))
    }
    val sorted = events.toSeq.sortBy(_.timeMs)
    var open = state.getOption
    val closed = Seq.newBuilder[ClosedSession]
    sorted.foreach { e =>
      open match {
        case Some(s) if e.timeMs - s.lastMs <= gapMs =>
          open = Some(s.copy(lastMs = e.timeMs, nEvents = s.nEvents + 1))
        case Some(s) =>
          closed += ClosedSession(s.userId, s.startMs, s.lastMs, s.nEvents)
          open = Some(OpenSession(userId, e.timeMs, e.timeMs, 1))
        case None =>
          open = Some(OpenSession(userId, e.timeMs, e.timeMs, 1))
      }
    }
    open.foreach { s =>
      state.update(s)
      if (withTimeout) state.setTimeoutDuration(gapMs)
    }
    closed.result().iterator
  }

  /** Wire a validated points stream (see [[IngestStream.validate]]) into the
    * stateful sessionizer.
    *
    * `withTimeout=true` evicts idle users via processing-time timeouts (the
    * production setting — bounded state); the timeout-driven re-triggering
    * makes `processAllAvailable` unsuitable, so deterministic tests run with
    * it off.
    */
  def sessions(spark: SparkSession, validated: Dataset[_], gapMs: Long = 3600000L,
               withTimeout: Boolean = false): Dataset[ClosedSession] = {
    import spark.implicits._
    val timeoutConf =
      if (withTimeout) GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    validated.toDF()
      // user_id is the session key; a point with only other tags is valid
      // for ingest but cannot be sessionized (and would crash the primitive
      // Long encoder) — filter, don't fail the stream
      .where(col("error").isNull && col("user_id").isNotNull)
      .select(col("user_id").as("userId"), col("time_ms").as("timeMs"), col("value"))
      .as[Event]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), timeoutConf)(
        updateSessions(gapMs, withTimeout) _)
  }
}
