package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming SLO burn-rate alerting — the live counterpart of
  * `Tsdb.burnRate`. Event-time windows with a watermark aggregate total and
  * bad counts per window; when a window closes, its error-budget burn and
  * alert flag emit downstream (append mode, so an alert fires exactly once
  * per window). State is one (window → two counters) row per open window —
  * bounded by the watermark horizon, never by stream length; the aggregate
  * is partial map-side like its batch twin.
  */
object BurnStream {

  /** Wire a validated points stream (see [[IngestStream.validate]]) into the
    * burn-rate detector. `budget` is the error-budget ratio (bad/total above
    * it burns >1×).
    */
  def burn(validated: DataFrame, badType: String = "error",
           windowDur: String = "10 minutes", watermark: String = "30 minutes",
           budget: Double = 0.25): DataFrame =
    validated.where(col("error").isNull)
      .select(timestamp_millis(col("time_ms")).as("ts"), col("event_type"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("event_type") === badType, lit(1L)).otherwise(lit(0L))).as("n_bad"))
      .select(col("window.start").as("win_start"), col("n_total"), col("n_bad"),
        (col("n_bad") / col("n_total") / budget).as("burn"))
      .withColumn("alerting", (col("burn") > 1.0).cast("int"))

  /** Streaming active-user cardinality per event-time window — the live
    * counterpart of `ts_cardinality`/`approx_distinct`. HLL++ partials
    * merge associatively, so per-window state is one sketch (KBs) no
    * matter how many users pass through — the only cardinality shape that
    * survives unbounded key spaces on a stream.
    */
  def activeUsers(validated: DataFrame, windowDur: String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    validated.where(col("error").isNull)
      .select(timestamp_millis(col("time_ms")).as("ts"), col("user_id"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("window.start").as("win_start"), col("approx_users"))
}
