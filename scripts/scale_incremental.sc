// Scale experiment: snapshot-delta dedup as the EXISTING corpus grows. The
// daily-increment claim is that checking a fixed new batch costs
// |new|·bucket-density — probing the old side's band index — so wall time
// should stay near-flat while the old corpus inflates, whereas re-running
// full-corpus LSH dedup grows with the whole corpus. Old-side clones get
// fresh ids BELOW the split so the index grows without changing the new
// batch.
// Run: LANG=C.UTF-8 /opt/spark/bin/spark-shell --jars target/scala-2.13/orestesspark_2.13-0.1.0.jar \
//   --driver-java-options -Dfile.encoding=UTF-8 --conf spark.master=local[8] \
//   --conf spark.sql.shuffle.partitions=8 -i scripts/scale_incremental.sc
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
  .select(col("doc_id"), col("text"))
val split = 250L
val newBatch = docs.where(col("doc_id") >= split)
val oldBase = docs.where(col("doc_id") < split)
for (mult <- Seq(1, 4, 10)) {
  val oldSide = (0 until mult).map(i =>
    oldBase.select((col("doc_id") - i * 1000000L).as("doc_id"), col("text")))
    .reduce(_ union _) // clone ids stay below the split
  val corpus = oldSide.union(newBatch)
  val sh = graft.dedup.Dedup.shingleRowsOf(corpus).cache()
  sh.count()
  val t0 = System.nanoTime()
  val inc = graft.dedup.Dedup.incrementalDedupOn(sh, split).count()
  val t1 = System.nanoTime()
  val full = graft.dedup.Dedup.minhashLshOn(sh).count()
  val t2 = System.nanoTime()
  println(f"SCALE mult=$mult%2d old=${250 * mult}%6d new=250 " +
    f"inc_rows=$inc%6d inc=${(t1 - t0) / 1e9}%6.1fs " +
    f"full_pairs=$full%8d full=${(t2 - t1) / 1e9}%6.1fs")
  sh.unpersist()
}
println("SCALE_DONE")
