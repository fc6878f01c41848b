// Scale experiment: label-propagation communities under CLONE inflation —
// does the labeler add any cost blowup beyond the candidate graph it
// labels? Injecting `mult` clones of a small doc subset turns each clone
// group into a mult-clique in the LSH candidate graph (edges ~ C(mult,2)
// per group — the graph ITSELF grows quadratically in the hub multiplier,
// a property of the corpus, not the algorithm). The claim that makes LPA
// the 100 TB community labeler: each round is one label-table join to the
// stationary edge list + one (vertex, label) count shuffle, so per-round
// cost is LINEAR in |E| — runtime should track the edge count, never the
// shared-neighbor mult^3 square that scale_graph.sc measures for the
// uncapped similarity join on the same inflated graphs. Per-edge time
// flat (or falling, as fixed costs amortize) across two orders of edge
// growth = the evidence.
// NOTE: statements deliberately avoid leading-dot continuation lines —
// spark-shell -I closes a statement at a balanced line end, which would
// silently split the chain (observed: the select() fell off and the raw
// 5-column parquet frame reached the union).
// Run: LANG=C.UTF-8 /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//   --driver-java-options -Dfile.encoding=UTF-8 --conf spark.master=local[8] \
//   --conf spark.sql.shuffle.partitions=8 -I scripts/scale_lpa.sc
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
spark.sparkContext.setLogLevel("ERROR")
val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(col("doc_id"), col("text"))
val hubs = docs.where(col("doc_id") < 25) // the injected clone groups
for (mult <- Seq(1, 40, 80)) {
  val clones = (1 until mult).map(i => hubs.select((col("doc_id") + i * 1000000L).as("doc_id"), col("text")))
  val inflated = clones.foldLeft(docs)(_ union _)
  val sh = graft.dedup.Dedup.shingleRowsOf(inflated)
  val e0 = graft.dedup.Dedup.minhashLshOn(sh).select(col("a_id"), col("b_id")).localCheckpoint(true)
  val edges = e0.union(e0.select(col("b_id").as("a_id"), col("a_id").as("b_id"))).localCheckpoint(true)
  val nE = edges.count()
  // the labelPropagation loop body, inlined over the inflated graph
  val t0 = System.nanoTime()
  var lbl = edges.select(col("a_id").as("id")).distinct().select(col("id"), col("id").as("lbl"))
  for (_ <- 0 until 3) {
    val wVote = Window.partitionBy(col("b_id")).orderBy(col("n").desc, col("lbl"))
    val votes = edges.join(lbl, col("a_id") === col("id")).select(col("b_id"), col("lbl")).union(lbl.select(col("id").as("b_id"), col("lbl")))
    lbl = votes.groupBy(col("b_id"), col("lbl")).agg(count(lit(1)).as("n")).withColumn("rn", row_number().over(wVote)).where(col("rn") === 1).select(col("b_id").as("id"), col("lbl")).localCheckpoint(true)
  }
  val nComm = lbl.select(col("lbl")).distinct().count()
  val t1 = System.nanoTime()
  val secs = (t1 - t0) / 1e9
  println(f"SCALE mult=$mult%2d edges=$nE%9d communities=$nComm%6d lpa=${secs}%6.1fs us_per_edge=${secs * 1e6 / nE}%8.1f")
}
println("SCALE_DONE")
