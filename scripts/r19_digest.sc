// Result digests for a list of queries: collects each query's FULL ordered
// result and prints one md5 per query — run in two trees to prove
// result-identity of an optimization. Env: R19_QUERIES, R19_SF, R19_OUT.
spark.sparkContext.setLogLevel("ERROR")
val d = sys.env.getOrElse("R19_SF", "/root/testdata/sf0.01")
val outPath = sys.env.getOrElse("R19_OUT", "target/r19_digest.txt")
val qs = sys.env.getOrElse("R19_QUERIES", "").split(",").map(_.trim).filter(_.nonEmpty)
val sb = new StringBuilder
qs.foreach { name =>
  try {
    val df = graft.SparkEntry.queries(name)(spark, d)
    val rows = df.collect().map(_.toString).mkString("\n")
    val schema = df.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest((schema + "\n" + rows).getBytes("UTF-8")).map("%02x".format(_)).mkString
    sb ++= s"$name $h rows=${df.count()}\n"
    println(s"[digest] $name $h")
  } catch { case e: Throwable =>
    sb ++= s"$name ERROR ${e.getMessage.take(120)}\n"
    println(s"[digest] $name ERROR ${e.getMessage.take(200)}") }
}
java.nio.file.Files.write(java.nio.file.Paths.get(outPath), sb.toString.getBytes("UTF-8"))
println("DIGEST_DONE")
