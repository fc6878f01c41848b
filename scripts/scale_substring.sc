// Scale experiment: exact-substring span dedup as the corpus grows.
// Clone-inflate the sf0.01 documents corpus — the WORST case for this
// operator: every 8-gram of every document becomes corpus-repeated, so the
// duplicated-gram set covers the whole gram table and every position is a
// hit. The expectation that makes this the 100 TB plan: runtime grows
// linearly with rows (one gram-hash count shuffle + one semi join + one
// doc-keyed window; each position emitted at most once — there is NO pair
// join anywhere), never quadratically with duplicate count.
// Run: LANG=C.UTF-8 /opt/spark/bin/spark-shell --jars target/scala-2.13/orestesspark_2.13-0.1.0.jar \
//   --driver-java-options -Dfile.encoding=UTF-8 --conf spark.master=local[8] \
//   --conf spark.sql.shuffle.partitions=8 -i scripts/scale_substring.sc
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
  .select(col("doc_id"), col("text"))
val base = docs.count()
for (mult <- Seq(1, 4, 10)) {
  val inflated = (0 until mult).map(i =>
    docs.select((col("doc_id") + i * 1000000L).as("doc_id"), col("text")))
    .reduce(_ union _).cache()
  inflated.count()
  val t0 = System.nanoTime()
  val spans = graft.dedup.Dedup.substringSpansOf(
    graft.dedup.Dedup.posGramRowsOf(inflated, 8), 8)
  val agg = spans.agg(count(lit(1)), sum(col("span_end") - col("span_start") + 1),
    sum(col("n_grams"))).collect()(0)
  val t1 = System.nanoTime()
  println(f"SCALE mult=$mult%2d docs=${base * mult}%6d spans=${agg.getLong(0)}%7d " +
    f"dupToks=${agg.getLong(1)}%8d grams=${agg.getLong(2)}%8d " +
    f"spans=${(t1 - t0) / 1e9}%6.1fs")
  inflated.unpersist()
}
println("SCALE_DONE")
sys.exit(0)
