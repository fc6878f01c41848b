package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (64-dim float vectors).
  *
  * Vector math is pure higher-order-function expressions (`zip_with` +
  * `aggregate`), fully codegen'd — no UDF deserialization in the scan loop.
  */
object Ann {

  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .select(col("vec_id"), col("v"),
        sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)).as("nrm"))

  private def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x) / (na * nb)

  /** Brute-force exact top-k cosine neighbors for the query subset — the
    * correctness baseline every ANN variant is judged against. One broadcast
    * of the (small) query set against a single scan of the corpus.
    */
  def bruteForceTopK(s: SparkSession, d: String, k: Int = 5, nQueries: Int = 20): DataFrame = {
    val e = withNorm(Tables.embeddings(s, d))
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    val out = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(cosine(col("qv"), col("v"), col("qn"), col("nrm")), 6).as("cosine"))
      .select(col("q_id"), col("n_id"), col("cosine"),
        row_number().over(w).cast("bigint").as("rank"))
      .where(col("rank") <= k)
    out.orderBy(out.columns.map(col): _*)
  }

  /** Deterministic pseudo-random hyperplane component: plane p, dimension i
    * -> uniform-ish value in [-1, 1) derived from md5 — reproducible in any
    * engine, no RNG state.
    */
  private def planeComponent(p: Column, i: Column): Column =
    (conv(substring(md5(concat(p.cast("string"), lit("_"), i.cast("string"))), 1, 4), 16, 10)
      .cast("double") / 32768.0) - 1.0

  /** Random-hyperplane LSH bucket signature: one sign bit per plane. */
  def lshBuckets(s: SparkSession, d: String, nPlanes: Int = 8): DataFrame = {
    val e = withNorm(Tables.embeddings(s, d))
    val sign = (p: Int) => {
      val dot = aggregate(
        zip_with(col("v"), sequence(lit(0), size(col("v")) - 1),
          (x, i) => x * planeComponent(lit(p), i)),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1)).otherwise(lit(0))
    }
    e.select(col("vec_id") +: col("v") +: col("nrm") +:
      (0 until nPlanes).map(p => sign(p).as(s"b$p")): _*)
      .withColumn("bucket",
        (0 until nPlanes).map(p => col(s"b$p") * (1 << p): Column).reduce(_ + _))
      .select(col("vec_id"), col("v"), col("nrm"), col("bucket"))
  }

  /** LSH-bucketed ANN: top-k neighbors searched only within the query's
    * bucket — the plan that scales to 100 TB (bucket id is the shuffle key;
    * each bucket is a small local problem; recall is tuned by nPlanes and
    * multi-probing). Approximate by construction => verified rows-only.
    */
  def lshTopK(s: SparkSession, d: String, k: Int = 5, nQueries: Int = 20): DataFrame = {
    val b = lshBuckets(s, d)
    val q = b.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("bucket").as("q_bucket"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    val out = b.join(broadcast(q),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(cosine(col("qv"), col("v"), col("qn"), col("nrm")), 6).as("cosine"))
      .select(col("q_id"), col("n_id"), col("cosine"),
        row_number().over(w).cast("bigint").as("rank"))
      .where(col("rank") <= k)
    out.orderBy(out.columns.map(col): _*)
  }
}
