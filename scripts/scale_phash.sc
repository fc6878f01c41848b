// Scale experiment: perceptual-hash near-dup search as the media corpus
// grows. Inflate the sf0.01 documents corpus with mutated clones (a distinct
// token appended — shifts every aHash block boundary, so clones are NOT
// near-dups and the TRUE pair count stays flat while the corpus grows) and
// measure the exhaustive pair search vs the pigeonhole-bucketed twin at
// 1x / 4x / 10x over the REAL Multimodal.phashPairs / phashDedup code
// (the inflated corpus is written as a documents.parquet the loaders read).
//
// The claim this checks: the exhaustive search pays the corpus square
// regardless of how many pairs exist; the bucketed search pays
// (pair space / bucket count) + true candidates — at maxHamming 12 over
// 64 bits that is a fixed 13-chunk fan-out whose win is a constant factor
// here (near-uniform random hashes), and grows to ~256k x at production
// thresholds (hamming <= 3 -> 4 chunks x 16 bits). Watch the exhaustive
// column grow ~quadratically while bucketed grows slower.
// Run: LANG=C.UTF-8 /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//   --conf spark.sql.extensions=graft.functions.GraftExtensions \
//   --conf spark.master=local[8] --conf spark.sql.shuffle.partitions=8 \
//   -i scripts/scale_phash.sc
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
val base = docs.count()
for (mult <- Seq(1, 10, 40)) {
  val dir = s"target/scale-phash-$mult"
  val inflated = (0 until mult).map(i =>
    docs.select((col("doc_id") + i * 1000000L).as("doc_id"),
      // scrambled clone: every word rehashed per clone index, so inflation
      // adds DISTINCT content and the true pair count stays flat. (A first
      // attempt merely appended a clone marker — and the aHash matched the
      // clones anyway, the robustness a perceptual hash is built for; this
      // experiment needs the corpus to grow, not the duplicate groups.)
      (if (i == 0) col("text")
       else concat_ws(" ",
         transform(split(col("text"), " "), w => md5(concat(w, lit(i.toString))))))
        .as("text")))
    .reduce(_ union _)
  inflated.write.mode("overwrite").parquet(s"$dir/documents.parquet")
  // build the memoized signature table once, untimed (the stored index both
  // searches probe — neither timed number should include the build)
  graft.multimodal.Multimodal.phashDedup(spark, dir).count()
  // two radii: the query default (12 — where this corpus's text near-dups
  // sit on the aHash) and a production pHash radius (3 — near-identical
  // media). Pigeonhole chunk width = 64/(r+1): at r=3 the 4 chunks are 16
  // bits (selective buckets), at r=12 the 13 chunks are 4-5 bits (32-value
  // buckets — candidates approach the pair space and the xor-scan twin
  // wins). The crossover is the point of this experiment.
  for (h <- Seq(12, 3)) {
    val t0 = System.nanoTime()
    val nEx = graft.multimodal.Multimodal.phashPairs(spark, dir, maxHamming = h).count()
    val t1 = System.nanoTime()
    val nBk = graft.multimodal.Multimodal.phashDedup(spark, dir, maxHamming = h).count()
    val t2 = System.nanoTime()
    assert(nEx == nBk, s"bucketed twin diverged: $nEx vs $nBk")
    println(f"SCALE mult=$mult%2d h=$h%2d docs=${base * mult}%6d pairs=$nEx%6d " +
      f"exhaustive=${(t1 - t0) / 1e9}%6.1fs bucketed=${(t2 - t1) / 1e9}%6.1fs")
  }
}
println("SCALE_DONE")
