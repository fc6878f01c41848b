// Scale experiment: winnowing-based near-dup detection under clone
// inflation. Every clone shares its original's full fingerprint set, so an
// UNCAPPED fingerprint join grows ~mult² per fingerprint, while the df-cap
// (TextOps.winnowingPairsOn, maxDf=50 here to keep base-df-1 clone families
// joinable at mult=10) bounds per-fingerprint join width — same principle
// as the capped containment join, at winnowing's ~2/(w+1) fingerprint
// density instead of full shingle density. The measurement: capped runtime
// stays flat while uncapped candidates explode quadratically.
// Run: /opt/spark/bin/spark-shell --jars target/scala-2.13/orestesspark_2.13-0.1.0.jar \
//   --conf spark.master=local[8] --conf spark.sql.shuffle.partitions=8 \
//   -i scripts/scale_winnowing.sc
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
  .select(col("doc_id"), col("text"))
val base = docs.count()
for (mult <- Seq(1, 4, 10)) {
  val inflated = (0 until mult).map(i =>
    docs.select((col("doc_id") + i * 1000000L).as("doc_id"), col("text")))
    .reduce(_ union _)
  val fp = graft.text.TextOps.winnowingFingerprintsOf(inflated).cache()
  val nFp = fp.count()
  val t0 = System.nanoTime()
  val uncapped = fp.as("a").join(fp.as("b"),
      col("a.wmin") === col("b.wmin") && col("a.doc_id") < col("b.doc_id"))
    .groupBy(col("a.doc_id"), col("b.doc_id")).count().count()
  val t1 = System.nanoTime()
  val capped = graft.text.TextOps.winnowingPairsOn(fp, minShared = 5, maxDf = 50).count()
  val t2 = System.nanoTime()
  println(f"SCALE mult=$mult%2d docs=${base * mult}%6d fp_rows=$nFp%8d " +
    f"uncapped_pairs=$uncapped%10d uncapped=${(t1 - t0) / 1e9}%6.1fs " +
    f"capped_pairs=$capped%8d capped=${(t2 - t1) / 1e9}%6.1fs")
  fp.unpersist()
}
println("SCALE_DONE")
