// Dump .explain("formatted") for a list of SparkEntry queries into
// plans/r19/<query>_<suffix>.txt (the optimization-round evidence files).
// Run: /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//   --conf spark.sql.extensions=graft.functions.GraftExtensions \
//   --conf spark.sql.session.timeZone=UTC \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true \
//   --conf spark.sql.optimizer.runtimeFilter.bloomFilter.enabled=true \
//   --conf spark.sql.shuffle.partitions=8 --master local[8] \
//   -I scripts/r18_plans.sc
// Env: R19_QUERIES=comma,list  R19_SUFFIX=before|after  [R19_SF=/root/testdata/sf0.1]
spark.sparkContext.setLogLevel("ERROR")
val d = sys.env.getOrElse("R19_SF", "/root/testdata/sf0.1")
val suffix = sys.env.getOrElse("R19_SUFFIX", "before")
val qs = sys.env.getOrElse("R19_QUERIES", "").split(",").map(_.trim).filter(_.nonEmpty)
java.nio.file.Files.createDirectories(java.nio.file.Paths.get("plans/r19"))
qs.foreach { name =>
  try {
    val df = graft.SparkEntry.queries(name)(spark, d)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"plans/r19/${name}_$suffix.txt"),
      formatted.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[plans] wrote plans/r19/${name}_$suffix.txt")
  } catch { case e: Throwable =>
    println(s"[plans] $name FAILED: ${e.getMessage.take(200)}") }
}
println("PLANS_DONE")
