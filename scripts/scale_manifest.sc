// Scale experiment: manifest-mode read planning as the FILE COUNT grows.
// Two claims. (1) Correctness: a manifest store and a plain store fed the
// same batches serve identical reads, at every fragmentation level. (2) The
// 100 TB shape: read-PLANNING cost in manifest mode is one small-file fetch,
// independent of how many data files exist — while plain mode's recursive
// listing grows with the file count (on S3-family stores, LIST is the
// slowest metadata op and the dominant cost of planning a 100k-file scan;
// the local-FS gap here understates it by orders of magnitude). Also
// measured: snapshot-pinned replay across a compaction (zero errors) and
// vacuum reclaiming exactly the retired generation.
// Run: /opt/spark/bin/spark-shell --jars target/scala-2.13/orestesspark_2.13-0.1.0.jar \
//   --conf spark.master=local[8] --conf spark.sql.shuffle.partitions=8 \
//   --conf spark.sql.extensions=graft.functions.GraftExtensions \
//   --conf spark.sql.session.timeZone=UTC -i scripts/scale_manifest.sc
spark.sparkContext.setLogLevel("ERROR")
import org.apache.spark.sql.functions._
val base = java.nio.file.Files.createTempDirectory(
  java.nio.file.Paths.get("target"), "scale-manifest").toString
val gm = new graft.tsdb.Graft(spark, s"$base/m", manifest = true)
val gp = new graft.tsdb.Graft(spark, s"$base/p")
val t0ms = 1704672000000L
def pts(b: Int) = {
  import spark.implicits._
  (0 until 200).map(i =>
    (t0ms + (b % 30).toLong * 86400000L + i * 1000L + b, (b * 1000 + i).toDouble,
      "cpu", s"h${i % 20}")).toDF("time", "value", "name", "host")
}
// inflate fragmentation in waves; at each level compare content and time
// the PLANNING step (frame construction = snapshot fetch vs dir listing)
for (wave <- 0 until 4) {
  for (b <- wave * 60 until (wave + 1) * 60) { gm.write(pts(b)); gp.write(pts(b)) }
  val nFiles = {
    val d = new java.io.File(s"$base/p/default")
    d.listFiles.filter(_.getName.startsWith("bucket_day=" ))
      .map(_.listFiles.count(_.getName.endsWith(".parquet"))).sum
  }
  def planMs(g: graft.tsdb.Graft): Double = {
    val t0 = System.nanoTime()
    g.read("""{"term":{"host":"h3"}}""").queryExecution.executedPlan
    (System.nanoTime() - t0) / 1e6
  }
  val (mMs, pMs) = (planMs(gm), planMs(gp))
  val same = gm.read("""{"match_all":{}}""").orderBy("time_ms", "host").collect()
    .sameElements(gp.read("""{"match_all":{}}""").orderBy("time_ms", "host").collect())
  println(f"SCALE wave=$wave%2d data_files=$nFiles%5d plan_manifest_ms=$mMs%8.1f " +
    f"plan_listing_ms=$pMs%8.1f content_equal=$same")
}
// r14: COMMIT cost as the live-file count grows 10x. The snapshot is a
// manifest list (one #seg ref per bucket); an append commit reads and
// rewrites ONLY the touched bucket's segment, so committing a one-bucket
// batch must stay flat while total files grow — the r13 layout rewrote
// the FULL file list per commit (its one named scale ceiling). Measured:
// wall time of a fixed single-bucket 200-point write at each inflation
// level, plus the newest snapshot file's byte size (O(buckets), not
// O(files)).
{
  val g2 = new graft.tsdb.Graft(spark, s"$base/c", manifest = true)
  // CONTROL: a store whose size never grows, measured with the identical
  // append at every level — long Spark sessions drift (GC, listener bus,
  // filesystem cache), and the control separates that drift from any
  // file-count dependence. The claim is grown/control flat, not raw ms.
  val gCtl = new graft.tsdb.Graft(spark, s"$base/ctl", manifest = true)
  var files = 0
  def liveFiles: Int = {
    val d = new java.io.File(s"$base/c/default")
    if (!d.exists) 0
    else d.listFiles.filter(_.getName.startsWith("bucket_day="))
      .map(_.listFiles.count(_.getName.endsWith(".parquet"))).sum
  }
  def snapBytes: Long = {
    val md = new java.io.File(s"$base/c/.manifest/default")
    md.listFiles.filter(f => f.getName.startsWith("m") &&
      f.getName.tail.forall(_.isDigit))
      .maxBy(_.getName.tail.toLong).length
  }
  for (level <- 0 until 4) {
    // inflate: 60 writes spread across 30 buckets per level
    for (b <- level * 60 until (level + 1) * 60) g2.write(pts(b))
    // measure: 5 one-bucket appends into a bucket FRESH at this level
    // (same touched-segment size at every level, so the number isolates
    // "does commit cost grow with TOTAL live files"), median wall ms
    def mpts(i: Int) = {
      import spark.implicits._
      (0 until 200).map(j =>
        (t0ms + (40L + level) * 86400000L + i * 300000L + j * 1000L,
          (i * 1000 + j).toDouble, "cpu", s"h${j % 20}"))
        .toDF("time", "value", "name", "host")
    }
    def median5(g: graft.tsdb.Graft): Double = (0 until 5).map { i =>
      val t0 = System.nanoTime()
      g.write(mpts(i))
      (System.nanoTime() - t0) / 1e6
    }.sorted.apply(2)
    val (grown, ctl) = (median5(g2), median5(gCtl))
    println(f"SCALE_COMMIT level=$level%2d live_files=$liveFiles%5d " +
      f"one_bucket_append_ms=$grown%8.1f control_ms=$ctl%8.1f " +
      f"ratio=${grown / ctl}%5.2f snapshot_bytes=$snapBytes%6d")
  }
}

// pinned replay across compaction: plan first, compact, then execute fully
val pinned = gm.read("""{"match_all":{}}""")
val expect = pinned.count()
val swaps = gm.compact()
println(s"SCALE compacted_buckets=${swaps.size} pinned_replay=${pinned.count()} expected=$expect")
val reclaimed = gm.vacuum(keepSnapshots = 1)
println(s"SCALE vacuum_reclaimed_files=${reclaimed.size} " +
  s"post_vacuum_count=${gm.read("""{"match_all":{}}""").count()}")
println("SCALE_DONE")
