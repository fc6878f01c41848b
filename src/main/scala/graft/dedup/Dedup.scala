package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.text.TextOps

/** Deduplication operators for training-data pipelines over `documents` /
  * `embeddings`.
  *
  * Determinism: all hashing is md5-based (identical in Spark and DuckDB), so
  * the oracles replicate signatures bit-for-bit. Scale: exact dedup is one
  * hash shuffle; MinHash-LSH is the 100 TB path (linear in corpus size,
  * candidate pairs only within band buckets); pairwise Jaccard/SimHash
  * verification happens only on candidates at scale — here they also run
  * exhaustively because the verified SF is small.
  */
object Dedup {

  val ShingleK = 3
  val MinhashSeeds = 16
  val BandRows = 4 // 4 bands x 4 rows

  /** Exact dedup: group by normalized-content hash, keep the smallest id. */
  def exact(s: SparkSession, d: String): DataFrame = {
    val out = Tables.documents(s, d)
      .groupBy(md5(TextOps.norm(col("text"))).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
    out.orderBy(out.columns.map(col): _*)
  }

  /** doc_id -> exploded distinct shingle rows. */
  private def shingleRows(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(TextOps.shingles(col("text"), ShingleK)).as("shingle"))

  /** N-gram Jaccard near-dup pairs: |A∩B| / |A∪B| >= tau over distinct
    * 3-shingles. Shingle-inverted-index join (never a cross join): pairs are
    * generated only for documents sharing a shingle.
    */
  def ngramJaccard(s: SparkSession, d: String, tau: Double = 0.8): DataFrame = {
    val sh = shingleRows(s, d).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_inter"))
    val out = inter
      .join(sizes.select(col("doc_id").as("a_id"), col("n_shingles").as("a_n")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n_shingles").as("b_n")), "b_id")
      .select(col("a_id"), col("b_id"),
        round(col("n_inter") * lit(1.0) / (col("a_n") + col("b_n") - col("n_inter")), 4)
          .as("jaccard"))
      .where(col("jaccard") >= tau)
    out.orderBy(out.columns.map(col): _*)
  }

  /** MinHash signature rows: for seed s, sig = min over shingles of
    * md5("<seed>|<shingle>") — md5's output order is a uniform permutation
    * of the shingle space, so the min is a proper minhash and is identical
    * in any engine with md5.
    */
  private def minhashSigs(s: SparkSession, d: String): DataFrame =
    shingleRows(s, d)
      .select(col("doc_id"), explode(sequence(lit(0), lit(MinhashSeeds - 1))).as("seed"),
        col("shingle"))
      .groupBy(col("doc_id"), col("seed"))
      .agg(min(md5(concat(col("seed").cast("string"), lit("|"), col("shingle")))).as("sig"))

  /** MinHash + LSH banding: band key = md5 of the band's concatenated
    * signature rows; candidate pairs are documents sharing any band bucket.
    * This is the dedup plan that survives 100 TB: one shuffle to signatures,
    * one shuffle to band buckets, pair generation only within buckets.
    */
  def minhashLsh(s: SparkSession, d: String): DataFrame = {
    val bands = minhashSigs(s, d)
      .groupBy(col("doc_id"), floor(col("seed") / BandRows).as("band"))
      .agg(md5(concat_ws(",",
        transform(array_sort(collect_list(struct(col("seed"), col("sig")))),
          x => x.getField("sig")))).as("band_key"))
    val out = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    out.orderBy(out.columns.map(col): _*)
  }

  /** 64-bit SimHash near-dup pairs (hamming distance <= maxHamming).
    *
    * Bit b of a document = sign of the sum over distinct tokens of
    * (bit b of md5(token) ? +1 : -1). Computed relationally:
    * (doc, token) × 64 bit positions → per-(doc, bit) vote sums → pairwise
    * hamming via a bit-position join. At 100 TB the signature step is the
    * same; hamming search switches to bucketed probing on signature chunks
    * (pigeonhole), not the exhaustive pair join used at verify SF.
    */
  def simhashPairs(s: SparkSession, d: String, maxHamming: Int = 8): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
      .select(col("doc_id"), md5(col("tok")).as("h"))
    val bits = tok
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(63))).as("b"))
      .select(col("doc_id"), col("b"),
        // nibble value of hex digit b/4, tested at bit (3 - b%4)
        ((floor(conv(substring(col("h"), (col("b") / 4).cast("int") + 1, lit(1)), 16, 10)
            .cast("int") / pow(lit(2.0), lit(3) - col("b") % 4)) % 2) === 1).as("bit"))
    val signs = bits
      .groupBy(col("doc_id"), col("b"))
      .agg((sum(when(col("bit"), 1).otherwise(-1)) > 0).as("sbit"))
    val out = signs.as("a").join(signs.as("b"),
        col("a.b") === col("b.b") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(sum(when(col("a.sbit") =!= col("b.sbit"), 1).otherwise(0)).as("hamming"))
      .where(col("hamming") <= maxHamming)
    out.orderBy(out.columns.map(col): _*)
  }

  /** Embedding-cosine near-dup pairs (rounded cosine >= tau). Exhaustive at
    * verify SF; the 100 TB path is [[graft.ann.Ann.lshBuckets]] — pairs only
    * within random-hyperplane buckets.
    */
  def embeddingPairs(s: SparkSession, d: String, tau: Double = 0.4): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .select(col("vec_id"), col("v"),
        aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x).as("nsq"))
    val out = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        round(
          aggregate(zip_with(col("a.v"), col("b.v"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
            / sqrt(col("a.nsq") * col("b.nsq")), 6).as("cosine"))
      .where(col("cosine") >= tau)
    out.orderBy(out.columns.map(col): _*)
  }
}
