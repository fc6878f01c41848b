package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-series anomaly detection with explicit state — the live
  * counterpart of `Tsdb.anomalies`. Each series carries Welford running
  * moments (count, mean, M2) as its state: O(1) per point, no history kept,
  * so state stays bounded no matter how long the series runs — the property
  * that matters at 1000 executors × millions of series. A point is emitted
  * as anomalous when it sits more than `z` sample standard deviations from
  * the mean of everything seen BEFORE it (detection must not let the outlier
  * contaminate its own baseline).
  */
object AnomalyStream {

  case class Point(seriesKey: String, timeMs: Long, value: Double)
  case class Moments(n: Long, mean: Double, m2: Double)
  case class Anomaly(seriesKey: String, timeMs: Long, value: Double, zscore: Double)

  /** Welford update: returns the moments with one more observation. */
  private[graft] def push(m: Moments, x: Double): Moments = {
    val n = m.n + 1
    val delta = x - m.mean
    val mean = m.mean + delta / n
    Moments(n, mean, m.m2 + delta * (x - mean))
  }

  private[streaming] def detect(z: Double, minN: Long)(
      key: String, points: Iterator[Point],
      state: GroupState[Moments]): Iterator[Anomaly] = {
    var m = state.getOption.getOrElse(Moments(0L, 0.0, 0.0))
    val out = Seq.newBuilder[Anomaly]
    points.toSeq.sortBy(p => (p.timeMs, p.value)).foreach { p =>
      if (m.n >= minN) {
        val sd = math.sqrt(m.m2 / (m.n - 1))
        if (sd > 0 && math.abs(p.value - m.mean) > z * sd)
          out += Anomaly(key, p.timeMs, p.value, (p.value - m.mean) / sd)
      }
      m = push(m, p.value)
    }
    state.update(m)
    out.result().iterator
  }

  /** Wire a validated points stream (see [[IngestStream.validate]]) into the
    * detector, keyed by the series tags.
    */
  def anomalies(spark: SparkSession, validated: Dataset[_], z: Double = 3.0,
                minN: Long = 5): Dataset[Anomaly] = {
    import spark.implicits._
    validated.toDF()
      .where(col("error").isNull)
      .select(concat_ws("|", col("user_id"), col("event_type")).as("seriesKey"),
        col("time_ms").as("timeMs"), col("value"))
      .as[Point]
      .groupByKey(_.seriesKey)
      .flatMapGroupsWithState[Moments, Anomaly](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        detect(z, minN) _)
  }
}
