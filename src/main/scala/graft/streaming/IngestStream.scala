package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.core.Det
import graft.tsdb.Tsdb

/** Structured Streaming ingestion — the live equivalent of the reference's
  * `/write` path (lib/orestes-inserter.js): validate points, derive the
  * series key and time bucket, land them partitioned by bucket.
  *
  * Scale design: file/Kafka source → stateless validation → `foreachBatch`
  * append to bucket-partitioned parquet. Each micro-batch is idempotent per
  * path + checkpoint (exactly-once to a deterministic sink); the bucket
  * partition key means downstream time-range queries prune directories, the
  * same way Orestes prunes per-week Cassandra tables.
  */
object IngestStream {

  /** Wire schema of incoming points: {time, value, ...tags} with tags
    * flattened (user_id, event_type) as in the driver's events table.
    */
  val pointSchema: StructType = StructType(Seq(
    StructField("time", StringType),
    StructField("value", DoubleType),
    StructField("user_id", LongType),
    StructField("event_type", StringType)))

  /** Validation per the reference (lib/orestes-utils.js:158-182): parseable
    * time, numeric non-NaN value, at least one tag. Invalid rows get an
    * `error` reason instead of being dropped (the reference reports
    * per-point errors to the writer).
    */
  def validate(raw: DataFrame): DataFrame = {
    // try_to_timestamp: ANSI mode would otherwise fail the micro-batch on
    // one malformed point instead of reporting it
    val t = try_to_timestamp(col("time"))
    raw.select(
      Det.tsMs(t).as("time_ms"),
      col("value"),
      col("user_id"), col("event_type"),
      when(col("time").isNull || t.isNull, "invalid timestamp")
        .when(col("value").isNull || isnan(col("value")), "invalid value")
        .when(col("user_id").isNull && col("event_type").isNull, "metrics must have at least one tag")
        .as("error"))
  }

  /** Valid points with their storage bucket — ready to land. The
    * granularity MUST match the space's configured
    * `table_granularity_days`, or retention would age buckets on the wrong
    * boundary (a 7-day bucket judged by 1-day aging loses up to 6 days of
    * live data).
    */
  def bucketed(validated: DataFrame, granularityDays: Int = Tsdb.GranularityDays): DataFrame =
    validated.where(col("error").isNull)
      .select(col("user_id"), col("event_type"), col("time_ms"), col("value"),
        Tsdb.bucketOf(col("time_ms"), granularityDays).as("bucket_day"))

  /** File-source ingestion: JSON points dir → validated, bucket-partitioned
    * parquet. Checkpointed; restart-safe.
    */
  def start(spark: SparkSession, srcDir: String, sinkDir: String, checkpointDir: String,
            granularityDays: Int = Tsdb.GranularityDays): StreamingQuery = {
    val raw = spark.readStream.schema(pointSchema).json(srcDir)
    bucketed(validate(raw), granularityDays).writeStream
      .option("checkpointLocation", checkpointDir)
      .partitionBy("bucket_day")
      .format("parquet")
      .outputMode("append")
      .start(sinkDir)
  }

  /** Source-agnostic ingestion for live (non-file) sources — a Kafka
    * value-parsed stream or a MemoryStream, anything producing the wire
    * schema. Two differences from the file flavor, both from the reference's
    * live write path (lib/orestes-inserter.js:139-206):
    *
    *  - the per-point ERROR CHANNEL is persisted: rejected points land in
    *    `errDir` with their error reason (the reference returns per-point
    *    errors to the writer; a live pipeline keeps a dead-letter dir);
    *  - exactly-once via idempotent REPLAY: every micro-batch writes under
    *    its own `ingest_batch=<id>` partition with dynamic partition
    *    overwrite, so a batch replayed after a crash REWRITES its own
    *    directories instead of appending duplicates.
    */
  def startFromSource(raw: DataFrame, sinkDir: String, errDir: String,
                      checkpointDir: String,
                      granularityDays: Int = Tsdb.GranularityDays): StreamingQuery =
    sinkValidated(validate(raw), sinkDir, errDir, checkpointDir, granularityDays)

  /** The landing half of [[startFromSource]]/[[startFromBroker]]: per-batch
    * dynamic-overwrite partitions for the good points AND the dead-letter
    * channel, so a replayed batch rewrites itself instead of duplicating.
    */
  private def sinkValidated(validated: DataFrame, sinkDir: String, errDir: String,
                            checkpointDir: String,
                            granularityDays: Int): StreamingQuery =
    validated.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.persist()
        try {
          bucketed(b, granularityDays)
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch", "bucket_day")
            .parquet(sinkDir)
          b.where(col("error").isNotNull)
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(errDir)
        } finally b.unpersist()
        ()
      }
      .start()

  /** What the Kafka connector emits per record — spark-sql-kafka's output
    * schema, column for column (key/value as bytes, source coordinates,
    * broker timestamp). [[startFromBroker]] consumes ONLY this shape, so a
    * real `spark.readStream.format("kafka")` frame is a drop-in. (The
    * connector jar itself is not on this environment's classpath — zero
    * egress — so specs drive the path through a MemoryStream emitting this
    * exact schema.)
    */
  val brokerSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Broker frame → wire-schema points: JSON-decode the value bytes.
    * Records whose value is not valid JSON decode to all-null points and
    * surface through the validator's error channel ("invalid timestamp"),
    * never abort the batch — the at-least-once broker contract is that
    * poison messages go to the dead letter, not down the query.
    */
  def fromBroker(broker: DataFrame): DataFrame =
    broker
      .select(from_json(col("value").cast("string"), pointSchema).as("p"))
      .select(col("p.time"), col("p.value"), col("p.user_id"), col("p.event_type"))

  /** Broker-source ingestion (the Kafka shape of [[startFromSource]]).
    * At-least-once brokers REDELIVER records — a producer retry or a
    * rebalance replays the same (topic, partition, offset) — so the stream
    * first drops duplicate source coordinates within the watermark horizon
    * (state bounded by the horizon, the [[dedupped]] discipline), then
    * decodes, validates and lands through the same idempotent
    * per-batch-overwrite sink. Redelivery inside a batch, across batches,
    * and across a checkpoint restart all land exactly once.
    */
  def startFromBroker(broker: DataFrame, sinkDir: String, errDir: String,
                      checkpointDir: String,
                      granularityDays: Int = Tsdb.GranularityDays,
                      watermark: String = "2 hours"): StreamingQuery = {
    val once = broker
      .withWatermark("timestamp", watermark)
      .dropDuplicatesWithinWatermark("topic", "partition", "offset")
    sinkValidated(validate(fromBroker(once)), sinkDir, errDir, checkpointDir,
      granularityDays)
  }

  /** Stream-stream interval join: each left point matched to right points of
    * the same user within [0, joinWindowMs) after it. Both sides carry
    * watermarks so Spark can bound the join state — the live counterpart of
    * `Analytics.rangeJoin`.
    */
  def streamIntervalJoin(left: DataFrame, right: DataFrame,
                         joinWindowMs: Long = 3600000L,
                         watermark: String = "2 hours"): DataFrame = {
    val l = left.where(col("error").isNull)
      .select(col("user_id").as("l_user"), timestamp_millis(col("time_ms")).as("l_ts"),
        col("value").as("l_value"))
      .withWatermark("l_ts", watermark)
    val r = right.where(col("error").isNull)
      .select(col("user_id").as("r_user"), timestamp_millis(col("time_ms")).as("r_ts"),
        col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    l.join(r,
      col("l_user") === col("r_user") &&
      col("r_ts") >= col("l_ts") &&
      col("r_ts") < col("l_ts") + expr(s"INTERVAL $joinWindowMs MILLISECOND"))
  }

  /** Streaming exact dedup — the live counterpart of `Dedup.exact` for
    * at-least-once sources (a producer retry or replayed Kafka offset
    * re-delivers the same point). Duplicate (series, time) keys are dropped
    * as long as they re-arrive within the watermark horizon; dedup state is
    * bounded by that horizon instead of growing with the stream.
    */
  def dedupped(validated: DataFrame, watermark: String = "2 hours"): DataFrame =
    validated.where(col("error").isNull)
      .select(timestamp_millis(col("time_ms")).as("ts"), col("time_ms"),
        col("user_id"), col("event_type"), col("value"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type", "time_ms")

  /** Incremental hourly-rollup maintenance — the streaming producer of the
    * multi-resolution cascade [[graft.tsdb.Tsdb.rollupCascade]] consumes:
    * each micro-batch writes its per-(series, hour) PARTIAL aggregates
    * (count / exact-DECIMAL sum / max) under its own `ingest_batch`
    * partition with dynamic overwrite, so a replayed batch rewrites itself
    * (idempotent, like [[startFromSource]]). Nothing ever re-scans history:
    * the serving view [[rollupView]] just re-aggregates partials, which
    * compose losslessly.
    */
  def startRollup(raw: DataFrame, rollupDir: String,
                  checkpointDir: String): StreamingQuery =
    validate(raw).writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.where(col("error").isNull)
          .groupBy(col("user_id"), col("event_type"),
            (floor(col("time_ms") / lit(3600000L)) * 3600000L).cast("bigint").as("hour_ms"))
          .agg(count(lit(1)).as("hn"),
            sum(col("value").cast("decimal(18,4)")).as("hsum"),
            max(col("value")).as("hmax"))
          .withColumn("ingest_batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("ingest_batch")
          .parquet(rollupDir)
        ()
      }
      .start()

  /** Serving view over the partial-rollup table: hourly totals composed
    * from per-batch partials — bit-identical to aggregating the raw points
    * (sums of sums, counts of counts; the exactness argument is
    * [[graft.tsdb.Tsdb.rollupCascade]]'s).
    */
  def rollupView(s: SparkSession, rollupDir: String): DataFrame =
    s.read.parquet(rollupDir)
      .groupBy(col("user_id"), col("event_type"), col("hour_ms"))
      .agg(sum(col("hn")).as("n"),
        sum(col("hsum")).cast("double").as("sum_value"),
        max(col("hmax")).as("max_value"))

  /** Live per-series counts over event-time windows with a watermark — the
    * streaming equivalent of `/read` + count aggregation. Late data beyond
    * the watermark is dropped; state is bounded.
    */
  def windowedCounts(validated: DataFrame, windowDur: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    validated.where(col("error").isNull)
      .select(timestamp_millis(col("time_ms")).as("ts"), col("user_id"), col("event_type"),
        col("value"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
}
