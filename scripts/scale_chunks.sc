// Scale experiment: chunk-level first-occurrence dedup as the corpus grows.
// Clone-inflate the sf0.01 documents corpus (every clone repeats every chunk,
// the worst case for the chunk-hash shuffle: duplicate groups grow linearly
// with the multiplier) and measure the docChunks -> dedupChunks pipeline wall
// time and output shape at 1x / 4x / 10x. The expectation that makes this the
// 100 TB plan: runtime grows linearly with rows (one hash shuffle + one
// partitioned window), never quadratically with duplicate count.
// Run: LANG=C.UTF-8 /opt/spark/bin/spark-shell --jars target/scala-2.13/orestesspark_2.13-0.1.0.jar \
//   --driver-java-options -Dfile.encoding=UTF-8 --conf spark.master=local[8] \
//   --conf spark.sql.shuffle.partitions=8 -i scripts/scale_chunks.sc
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
spark.sparkContext.setLogLevel("ERROR")
val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
  .select(col("doc_id"), col("text"))
val base = docs.count()
for (mult <- Seq(1, 4, 10)) {
  val inflated = (0 until mult).map(i =>
    docs.select((col("doc_id") + i * 1000000L).as("doc_id"), col("text")))
    .reduce(_ union _).cache()
  inflated.count()
  val t0 = System.nanoTime()
  // same pipeline as Dedup.dedupChunks, over the inflated corpus
  val toks = inflated.select(col("doc_id"), graft.text.TextOps.tokens(col("text")).as("toks"))
    .select(col("doc_id"), col("toks"), size(col("toks")).as("nt"))
  val chunks = toks
    .select(col("doc_id"), col("toks"),
      explode(sequence(lit(0), expr("(nt + 11) div 12") - 1)).as("chunk_idx"))
    .select(col("doc_id"), col("chunk_idx").cast("bigint").as("chunk_idx"),
      md5(array_join(slice(col("toks"), col("chunk_idx") * 12 + 1, lit(16)), " "))
        .as("chunk_hash"))
  val w = Window.partitionBy(col("chunk_hash")).orderBy(col("doc_id"), col("chunk_idx"))
  val out = chunks.withColumn("rn", row_number().over(w))
    .groupBy(col("doc_id"))
    .agg(count(lit(1)).as("n_chunks"),
      sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"))
  val agg = out.agg(sum(col("n_chunks")), sum(col("n_kept"))).collect()(0)
  val t1 = System.nanoTime()
  println(f"SCALE mult=$mult%2d docs=${base * mult}%6d chunks=${agg.getLong(0)}%8d " +
    f"kept=${agg.getLong(1)}%7d dedup=${(t1 - t0) / 1e9}%6.1fs")
  inflated.unpersist()
}
println("SCALE_DONE")
