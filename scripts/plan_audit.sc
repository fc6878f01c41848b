// Audit every SparkEntry query's physical plan for scale-hostile shapes:
// BroadcastNestedLoopJoin (all-pairs) and single-partition exchanges that
// feed non-scalar work. Declared-exhaustive oracle baselines are expected
// hits; anything else is a regression. Run via spark-shell -i.
spark.sparkContext.setLogLevel("ERROR")
val d = "/root/testdata/sf0.001"
val report = scala.collection.mutable.ArrayBuffer[String]()
graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, f) =>
  try {
    val plan = f(spark, d).queryExecution.executedPlan.toString
    val bnlj = plan.contains("BroadcastNestedLoopJoin")
    val single = plan.contains("Exchange SinglePartition")
    if (bnlj || single) report += s"$name bnlj=$bnlj singlePartitionExchange=$single"
  } catch { case e: Throwable => report += s"$name ERROR ${e.getMessage.take(100)}" }
}
println("AUDIT_BEGIN")
println(report.mkString("\n"))
println("AUDIT_END")
