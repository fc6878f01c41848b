package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (64-dim float vectors).
  *
  * Vector math is pure higher-order-function expressions (`zip_with` +
  * `aggregate`), fully codegen'd — no UDF deserialization in the scan loop.
  */
object Ann {

  private def withNorm(s: SparkSession, df: DataFrame): DataFrame =
    df.select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .select(col("vec_id"), col("v"),
        sqrt(VectorFunctions.dot(s, col("v"), col("v"))).as("nrm"))

  private def cosine(s: SparkSession, a: Column, b: Column, na: Column, nb: Column): Column =
    VectorFunctions.dot(s, a, b) / (na * nb)

  /** Brute-force exact top-k cosine neighbors for the query subset — the
    * correctness baseline every ANN variant is judged against. One broadcast
    * of the (small) query set against a single scan of the corpus.
    */
  def bruteForceTopK(s: SparkSession, d: String, k: Int = 5, nQueries: Int = 20): DataFrame = {
    val e = withNorm(s, Tables.embeddings(s, d))
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    val out = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(cosine(s, col("qv"), col("v"), col("qn"), col("nrm")), 6).as("cosine"))
      .select(col("q_id"), col("n_id"), col("cosine"),
        row_number().over(w).cast("bigint").as("rank"))
      .where(col("rank") <= k)
    out.orderBy(out.columns.map(col): _*)
  }

  /** Deterministic pseudo-random hyperplane: dimension i of plane p is
    * derived from md5("<p>_<i>") -> uniform-ish in [-1, 1). Planes are
    * constants, so they are materialized driver-side once and shipped as
    * array literals — the per-row work is one codegen'd dot per plane.
    */
  private[ann] def plane(p: Int, dims: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dims) { i =>
      val h = md.digest(s"${p}_$i".getBytes("UTF-8"))
      val v = ((h(0) & 0xff) << 8) | (h(1) & 0xff) // first 4 hex digits
      v / 32768.0 - 1.0
    }
  }

  /** Random-hyperplane LSH bucket signature: one sign bit per plane. */
  def lshBuckets(s: SparkSession, d: String, nPlanes: Int = 8, dims: Int = 64): DataFrame = {
    val e = withNorm(s, Tables.embeddings(s, d))
    val sign = (p: Int) =>
      when(VectorFunctions.dot(s, col("v"), typedLit(plane(p, dims).toSeq)) >= 0, lit(1))
        .otherwise(lit(0))
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
        round(cosine(s, col("qv"), col("v"), col("qn"), col("nrm")), 6).as("cosine"))
      .select(col("q_id"), col("n_id"), col("cosine"),
        row_number().over(w).cast("bigint").as("rank"))
      .where(col("rank") <= k)
    out.orderBy(out.columns.map(col): _*)
  }
}
