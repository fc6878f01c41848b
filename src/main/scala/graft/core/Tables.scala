package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Loaders for the driver-generated parquet tables.
  *
  * Every query takes an `sfDir` so the same plan runs at any scale factor.
  * At 100 TB these would be bucketed/partitioned catalog tables; the access
  * pattern (projection + predicate pushdown into the parquet scan) is
  * identical.
  */
object Tables {
  /** Every driver-generated table, in dependency-free order. */
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects; with `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as
    * a nanos BIGINT. We keep the raw column as `ts_ns` — time-range
    * predicates on the bare physical column push into the parquet scan
    * (row-group pruning) — and derive a microsecond-truncated `ts` timestamp
    * for everything else (same truncation DuckDB's epoch_ms applies).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

/** Determinism helpers shared by queries and their DuckDB oracles.
  *
  * Cross-engine hash-equality rules:
  *  - timestamps surface as epoch-millis BIGINT (`tsMs`) — never raw
  *    timestamps (parquet unit / NTZ differences);
  *  - double aggregates go through DECIMAL(18,4) partial sums (exact,
  *    association-order independent) and come back as rounded DOUBLE;
  *  - every result is fully ordered by its output columns.
  */
object Det {
  val MsInDay: Long = 86400000L

  /** Timestamp column -> epoch millis, robust to TIMESTAMP vs TIMESTAMP_NTZ. */
  def tsMs(c: Column): Column = unix_millis(c.cast("timestamp"))

  /** Epoch-millis constant as a foldable timestamp literal: comparing a
    * timestamp column against this (instead of wrapping the column in
    * unix_millis) keeps the predicate on the bare column, so it pushes into
    * the parquet scan. Equivalent to `epoch_ms(col) <op> ms` for the
    * day-resolution columns it is used on.
    */
  def tsLit(ms: Long): Column = timestamp_millis(lit(ms))

  /** Exact sum of a ≤4-decimal double column, returned as double. */
  def dsum(c: Column): Column =
    sum(c.cast("decimal(18,4)")).cast("double")

  /** Cross-engine-stable rounding for DIVISION-derived doubles (means,
    * ratios, rates, interpolations). Spark's round() rounds the double's
    * shortest decimal repr half-up while DuckDB rounds the binary value, so
    * a quotient within one double-ulp of a .5 boundary (e.g. a ratio whose
    * shortest repr is "0.65975") rounds differently per engine. The +1e-9
    * nudge lands both engines on the same side of every boundary; values
    * farther than 1e-9 from a boundary are unaffected. Exact-decimal values
    * (the dsum family) don't need this: they are exactly representable at
    * our magnitudes, and both engines round exact values identically.
    */
  def rnd(c: Column, scale: Int): Column =
    round(c + lit(1e-9), scale) + lit(0.0) // + 0.0: Spark rounds tiny negatives to -0.0, DuckDB to 0.0

  /** Order-insensitive mean of a ≤4-decimal double column, rounded. */
  def davg(c: Column, scale: Int = 4): Column =
    rnd(sum(c.cast("decimal(18,4)")).cast("double") / count(c), scale)

  /** Fully order a result by all its output columns — the determinism
    * convention every oracle-checked query ends with.
    */
  def ordered(df: DataFrame): DataFrame =
    df.orderBy(df.columns.toIndexedSeq.map(col): _*)
}
