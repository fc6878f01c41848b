// Scale experiment: continuous facade ingest as HISTORY grows. The claim is
// that landing batch N costs |batch| work, independent of how many batches
// already landed: the file-source checkpoint means each trigger reads only
// NEW spool files, cleanSource=delete bounds the directory the source
// lists, and the append write touches only the target bucket dirs. A
// per-POST re-scan of history (or an unbounded spool listing) would show
// per-batch latency growing with N; flat latency is the 100 TB shape
// (ingest cost tracks arrival rate, not store size).
// Run: /opt/spark/bin/spark-shell --jars target/scala-2.13/orestesspark_2.13-0.1.0.jar \
//   --conf spark.master=local[8] --conf spark.sql.shuffle.partitions=8 \
//   --conf spark.sql.extensions=graft.functions.GraftExtensions \
//   --conf spark.sql.session.timeZone=UTC -i scripts/scale_continuous.sc
import com.fasterxml.jackson.databind.ObjectMapper
spark.sparkContext.setLogLevel("ERROR")
val mapper = new ObjectMapper()
val root = java.nio.file.Files.createTempDirectory(
  java.nio.file.Paths.get("target"), "scale-cont").toString
val g = new graft.tsdb.Graft(spark, root)
val base = 1704672000000L
def batch(b: Int) = (0 until 500).map(i => mapper.readTree(
  s"""{"time":${base + b.toLong * 500 + i},"value":$i.0,"name":"cpu","host":"h${i % 10}"}"""))
// waves of 40 batches; measure wall time per wave INCLUDING the landed
// barrier — flat per-wave time across waves = cost independent of history
for (wave <- 0 until 5) {
  val t0 = System.nanoTime()
  for (b <- wave * 40 until (wave + 1) * 40) g.writeSpooled(batch(b))
  g.awaitContinuous()
  val sec = (System.nanoTime() - t0) / 1e9
  val spoolFiles = Option(new java.io.File(s"$root/.spool/default").listFiles())
    .map(_.count(_.getName.endsWith(".jsonl"))).getOrElse(0)
  println(f"SCALE wave=$wave%2d batches_before=${wave * 40}%4d " +
    f"wave_sec=$sec%6.2f spool_files_after=$spoolFiles%5d")
}
println(s"SCALE total_points=${g.read("""{"match_all":{}}""").count()}")
g.stopContinuous()
println("SCALE_DONE")
