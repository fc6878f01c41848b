// Scale experiment: the CDC index's ledger fold (r15, VERDICT r14 #1).
// The claim: every search probe scans ALL accreted ingest_batch partitions
// of the counts ledger (one per sync, forever), so probe cost grows with
// sync COUNT, not matching postings; compactIndex folds the history to one
// base partition and probe cost snaps back — while results stay rank- and
// score-identical. Measured here: search latency at 1 vs ~N accreted
// batches vs after the fold, plus the partition counts.
// Run: LANG=C.UTF-8 /opt/spark/bin/spark-shell --jars target/scala-2.13/orestesspark_2.13-0.1.0.jar \
//   --driver-java-options -Dfile.encoding=UTF-8 --conf spark.master=local[8] \
//   --conf spark.sql.shuffle.partitions=8 -i scripts/scale_indexfold.sc
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
import spark.implicits._

val root = java.nio.file.Files.createTempDirectory(
  java.nio.file.Paths.get("target"), "scale-fold").toString
val g = new graft.tsdb.Graft(spark, s"$root/store", manifest = true)
val dir = s"$root/index"

def w(day: Int, n: Int, gen: Int): Unit =
  g.write((0 until n).map(i =>
    (f"2024-01-$day%02dT10:${i % 60}%02d:00Z", i.toDouble,
      s"svc-$gen-$i", s"host-${i % 20}")).toDF("time", "value", "name", "host"))

w(1, 200, 0)
graft.streaming.CdcIndexSync.build(g, dir)

def probeMs(): Double = (0 until 7).map { _ =>
  val t0 = System.nanoTime()
  graft.streaming.CdcIndexSync.search(spark, dir, Seq("host-3", "svc-0-1")).collect()
  (System.nanoTime() - t0) / 1e6
}.sorted.apply(3) // median

probeMs() // warm the JVM/codegen so "fresh" is not charged for startup
val fresh = probeMs()

// accrete: one sync per appended batch, each its own ledger partition
val syncs = 24
(1 to syncs).foreach { k =>
  w(1 + (k % 27), 10, k)
  graft.streaming.CdcIndexSync.sync(g, dir)
}
val batches = graft.streaming.CdcIndexSync.ledgerBatches(spark, dir)
val accreted = probeMs()
val before = graft.streaming.CdcIndexSync
  .search(spark, dir, Seq("host-3", "svc-0-1")).collect().toSeq

val t0 = System.nanoTime()
graft.streaming.CdcIndexSync.compactIndex(spark, dir)
val foldSec = (System.nanoTime() - t0) / 1e9
val folded = probeMs()
val after = graft.streaming.CdcIndexSync
  .search(spark, dir, Seq("host-3", "svc-0-1")).collect().toSeq
assert(before == after, "fold changed search results")
val batches2 = graft.streaming.CdcIndexSync.ledgerBatches(spark, dir)

println(f"SCALE fold: probe fresh(1 batch)=$fresh%6.0f ms  " +
  f"accreted($batches batches)=$accreted%6.0f ms  " +
  f"folded($batches2 batch)=$folded%6.0f ms  fold=$foldSec%.1f s  " +
  "results identical across the fold")
println("SCALE_DONE")
