// Scale experiment: the bloom membership prefilter as the HISTORICAL index
// grows. dedup_bloom's claim is that the new batch is screened map-only
// against a broadcast bloom of the history, so (a) the number of rows that
// would reach the exact shuffle join collapses to true dups + ~1% false
// positives REGARDLESS of history size, and (b) probe wall time stays
// near-flat while the history inflates (the filter build is one linear
// aggregate; the probe is O(|new|)). Clones get fresh ids on the even
// (history) side so the index grows without changing the new batch.
// Run: LANG=C.UTF-8 JAVA_TOOL_OPTIONS=-Dfile.encoding=UTF-8 \
//   /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//   --conf spark.master=local[8] --conf spark.sql.shuffle.partitions=8 \
//   --conf spark.sql.extensions=graft.functions.GraftExtensions \
//   -i scripts/scale_bloom.sc
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
  .select(col("doc_id"), md5(graft.text.TextOps.norm(col("text"))).as("h"))
val fresh = docs.where(col("doc_id") % 2 === 1).localCheckpoint(true)
val oldBase = docs.where(col("doc_id") % 2 === 0)
for (mult <- Seq(1, 4, 10)) {
  // clones keep even parity and unique ids; each clone round also gets a
  // salted hash so the INDEX cardinality truly grows (a same-hash clone
  // would dedup inside the bloom builder)
  val oldSide = (0 until mult).map(i =>
    oldBase.select((col("doc_id") - i * 1000000L).as("doc_id"),
      (if (i == 0) col("h") else md5(concat(col("h"), lit(i.toString)))).as("h")))
    .reduce(_ union _).localCheckpoint(true)
  val nOld = oldSide.count()
  val t0 = System.nanoTime()
  val out = graft.dedup.Dedup.bloomDedupOn(oldSide, fresh).cache()
  val rows = out.count()
  val hits = out.agg(sum(col("bloom_hit")), sum(col("exact_dup"))).first()
  val t1 = System.nanoTime()
  println(f"SCALE mult=$mult%2d old=$nOld%7d new=$rows%5d " +
    f"join_rows=${hits.getLong(0)}%5d true_dups=${hits.getLong(1)}%5d " +
    f"probe=${(t1 - t0) / 1e9}%6.1fs")
  out.unpersist()
}
println("SCALE_DONE")
