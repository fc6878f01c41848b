val d = "/root/testdata/sf0.1"
val out = new java.io.PrintWriter("/root/repo/target/r9_ivf2.txt")
def p(s: String) = { out.println(s); out.flush() }
try {
  val warm = graft.SparkEntry.queries("ts_read")
  var t0 = System.nanoTime(); warm(spark, d).count()
  p(f"warmup ${(System.nanoTime()-t0)/1e9}%6.2f s")
  val fn = graft.SparkEntry.queries("ann_ivf")
  for (i <- 1 to 2) { t0 = System.nanoTime(); val n = fn(spark, d).count(); p(f"ann_ivf$i n=$n ${(System.nanoTime()-t0)/1e9}%6.2f s") }
} catch { case e: Throwable => p("ERR " + e) }
out.close(); sys.exit(0)
