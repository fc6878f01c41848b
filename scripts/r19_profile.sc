// Per-query overhead decomposition for the optimization round: for each
// query, time plan construction, then two warm executions, and count the
// Spark jobs/stages each execution submits (job barriers = fixed latency
// that survives min-of-passes). Run via spark-shell -I (see r18_plans.sc
// header for the conf line). Env: R19_QUERIES (comma list or "all"),
// R19_SF (default sf0.1), R19_OUT (default target/r19_profile.json).
// NOTE: written for -I line-mode: no blank lines inside expressions, every
// continuation line ends with an operator or open brace.
spark.sparkContext.setLogLevel("ERROR")
val d = sys.env.getOrElse("R19_SF", "/root/testdata/sf0.1")
val outPath = sys.env.getOrElse("R19_OUT", "target/r19_profile.json")
val qsel = sys.env.getOrElse("R19_QUERIES", "all")
val names: Seq[String] = { if (qsel == "all") graft.SparkEntry.queries.keys.toSeq.sorted else qsel.split(",").map(_.trim).filter(_.nonEmpty).toSeq }
object Counters {
  @volatile var jobs = 0
  @volatile var stages = 0
  @volatile var tasks = 0
  def reset(): Unit = { jobs = 0; stages = 0; tasks = 0 }
}
val listener = new org.apache.spark.scheduler.SparkListener {
  override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
    Counters.jobs += 1; Counters.stages += j.stageInfos.size
  }
  override def onStageCompleted(st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
    Counters.tasks += st.stageInfo.numTasks
  }
}
spark.sparkContext.addSparkListener(listener)
graft.core.Tables.names.foreach { t =>
  try spark.read.parquet(s"$d/$t.parquet").count() catch { case _: Throwable => () }
}
try { graft.SparkEntry.queries("ann_ivf")(spark, d).count(); spark.catalog.clearCache() } catch { case _: Throwable => () }
val sb = new StringBuilder("{\n")
var first = true
names.foreach { name =>
  try {
    val fn = graft.SparkEntry.queries(name)
    val t0 = System.nanoTime()
    val df0 = fn(spark, d)
    df0.queryExecution.assertAnalyzed()
    val tPlan = (System.nanoTime() - t0) / 1e9
    Counters.reset()
    val t1 = System.nanoTime()
    fn(spark, d).count()
    val r1 = (System.nanoTime() - t1) / 1e9
    val (j1, s1, k1) = (Counters.jobs, Counters.stages, Counters.tasks)
    spark.catalog.clearCache()
    Counters.reset()
    val t2 = System.nanoTime()
    fn(spark, d).count()
    val r2 = (System.nanoTime() - t2) / 1e9
    val (j2, s2, k2) = (Counters.jobs, Counters.stages, Counters.tasks)
    spark.catalog.clearCache()
    if (!first) sb ++= ",\n"
    first = false
    sb ++= f"""  "$name": {"plan_s": $tPlan%.3f, "run1_s": $r1%.3f, "run2_s": $r2%.3f, "jobs": $j2, "stages": $s2, "tasks": $k2, "jobs_run1": $j1}"""
    println(f"[prof] $name%-32s plan=$tPlan%6.3f run1=$r1%6.3f run2=$r2%6.3f jobs=$j2%3d stages=$s2%3d tasks=$k2%5d")
  } catch { case e: Throwable =>
    println(s"[prof] $name FAILED: ${e.getMessage.take(120)}") }
}
sb ++= "\n}\n"
java.nio.file.Files.write(java.nio.file.Paths.get(outPath), sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
println(s"PROFILE_DONE -> $outPath")
