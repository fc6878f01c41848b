package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format-agnostic table IO. The engine is storage-first parquet (columnar,
  * splittable, statistics-bearing — the only sane 100 TB format), but
  * pipelines interchange with CSV/JSON at their edges; these helpers keep
  * that interop in one place.
  *
  * Schemas are explicit for csv/json: schema inference is a full extra pass
  * over the data (unacceptable at scale) and infers unstable types between
  * runs. Parquet carries its own schema.
  */
object Sources {

  def read(spark: SparkSession, path: String, format: String = "parquet",
           schema: Option[StructType] = None): DataFrame = format match {
    case "parquet" => spark.read.parquet(path)
    // ORC: the other columnar statistics-bearing format Spark ships
    // natively — same pushdown/pruning properties as parquet, self-schemed
    case "orc" => spark.read.orc(path)
    case "csv" =>
      val r = spark.read.option("header", "true")
      schema.fold(r.option("inferSchema", "true"))(r.schema)
        .csv(path)
    case "json" =>
      schema.fold(spark.read)(spark.read.schema).json(path)
    case other => throw new IllegalArgumentException(s"unsupported format: $other")
  }

  def write(df: DataFrame, path: String, format: String = "parquet",
            mode: SaveMode = SaveMode.Overwrite): Unit = format match {
    case "parquet" => df.write.mode(mode).parquet(path)
    case "orc" => df.write.mode(mode).orc(path)
    case "csv" => df.write.mode(mode).option("header", "true").csv(path)
    case "json" => df.write.mode(mode).json(path)
    case other => throw new IllegalArgumentException(s"unsupported format: $other")
  }

  /** Bucketed managed table: `bucketBy(key) + sortBy(key)` so repeated joins
    * and aggregations on the key are CO-LOCATED — Catalyst sees the hash
    * distribution and elides the exchange entirely. At 100 TB this is the
    * difference between shuffling the fact table per join and never
    * shuffling it: bucket once at write time, join shuffle-free forever
    * (both sides bucketed on the join key with the same count). The sortBy
    * keeps row-group stats selective within each bucket file.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int = 8, sortCols: Seq[String] = Nil): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key)
      .sortBy(key, sortCols: _*)
      .format("parquet")
      .saveAsTable(table)
}
