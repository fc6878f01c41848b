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
// pinned replay across compaction: plan first, compact, then execute fully
val pinned = gm.read("""{"match_all":{}}""")
val expect = pinned.count()
val swaps = gm.compact()
println(s"SCALE compacted_buckets=${swaps.size} pinned_replay=${pinned.count()} expected=$expect")
val reclaimed = gm.vacuum(keepSnapshots = 1)
println(s"SCALE vacuum_reclaimed_files=${reclaimed.size} " +
  s"post_vacuum_count=${gm.read("""{"match_all":{}}""").count()}")
println("SCALE_DONE")
