// round-9 directive timing: cold+warm per key at sf0.1
val d = "/root/testdata/sf0.1"
val keys = Seq("dedup_simhash", "dedup_simhash_buckets",
  "ts_read_filter_phrase_slop", "ts_read_filter_span",
  "text_winnowing", "dedup_winnowing", "dedup_containment_capped",
  "ann_ivf")
val out = new java.io.PrintWriter("/root/repo/target/r9_timing.txt")
for (k <- keys) {
  val fn = graft.SparkEntry.queries(k)
  def one(): Double = {
    val t0 = System.nanoTime(); val n = fn(spark, d).count()
    val dt = (System.nanoTime() - t0) / 1e9
    out.println(f"$k%-28s n=$n%-9d $dt%7.2f s"); out.flush(); dt
  }
  one(); one()
}
out.close()
sys.exit(0)
