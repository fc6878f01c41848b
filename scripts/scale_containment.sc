// Scale experiment: containment dedup under clone inflation — the workload
// that exposes the uncapped inverted-index join's quadratic blowup. Clone-
// inflating the corpus multiplies EVERY shingle's document frequency by the
// multiplier, so uncapped pair generation grows ~mult² per shared shingle,
// while the df-capped plan (Dedup.containmentPairsCapped, maxDf=50) drops
// over-shared (boilerplate) shingles BEFORE the join and keeps per-shingle
// work bounded by maxDf². The measurement that makes the cap the 100 TB
// plan: capped runtime and pair counts stay flat as copies inflate while
// the uncapped candidate count explodes.
// Run: LANG=C.UTF-8 /opt/spark/bin/spark-shell --jars target/scala-2.13/orestesspark_2.13-0.1.0.jar \
//   --driver-java-options -Dfile.encoding=UTF-8 --conf spark.master=local[8] \
//   --conf spark.sql.shuffle.partitions=8 -i scripts/scale_containment.sc
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
  .select(col("doc_id"), col("text"))
val base = docs.count()
for (mult <- Seq(1, 4, 10)) {
  val inflated = (0 until mult).map(i =>
    docs.select((col("doc_id") + i * 1000000L).as("doc_id"), col("text")))
    .reduce(_ union _)
  val sh = graft.dedup.Dedup.shingleRowsOf(inflated).cache()
  sh.count()
  // uncapped inverted-index candidate pairs (the cost driver of
  // Dedup.containmentPairs before any thresholding)
  val t0 = System.nanoTime()
  val uncappedPairs = sh.as("a").join(sh.as("b"),
      col("a.shingle") === col("b.shingle") && col("a.doc_id") =!= col("b.doc_id"))
    .groupBy(col("a.doc_id"), col("b.doc_id")).count().count()
  val t1 = System.nanoTime()
  val cappedPairs = graft.dedup.Dedup.containmentPairsCappedOn(sh, 0.9, 50).count()
  val t2 = System.nanoTime()
  println(f"SCALE mult=$mult%2d docs=${base * mult}%6d " +
    f"uncapped_pairs=$uncappedPairs%10d uncapped=${(t1 - t0) / 1e9}%6.1fs " +
    f"capped_pairs=$cappedPairs%8d capped=${(t2 - t1) / 1e9}%6.1fs")
  sh.unpersist()
}
println("SCALE_DONE")
