// Scale experiment: structural (neighbor-set) similarity under HUB
// inflation — the workload that exposes the uncapped shared-neighbor
// self-join's quadratic blowup. Real dedup graphs are heavy-tailed (see
// graph_degree_dist): a handful of template/boilerplate documents acquire
// thousands of near-dup neighbors. Injecting `mult` clones of a small doc
// subset reproduces that: each clone group is a mult-clique in the LSH
// candidate graph, so every clone is a degree-(mult-1) vertex and the
// uncapped shared-neighbor join emits ~mult·C(mult,2) pair rows PER GROUP
// (cubic in the hub degree), while the degree-capped plan
// (Graph.structuralSimilarityCapped, maxDeg=50) drops edges into hub
// vertices BEFORE the self-join. The measurement that makes the cap the
// 100 TB plan: capped pair counts and runtime stay flat as hubs inflate
// while the uncapped pair count explodes.
// Run: LANG=C.UTF-8 /opt/spark/bin/spark-shell --jars target/scala-2.13/orestesspark_2.13-0.1.0.jar \
//   --driver-java-options -Dfile.encoding=UTF-8 --conf spark.master=local[8] \
//   --conf spark.sql.shuffle.partitions=8 -i scripts/scale_graph.sc
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
  .select(col("doc_id"), col("text"))
val hubs = docs.where(col("doc_id") < 25) // the injected template docs
for (mult <- Seq(1, 40, 80)) {
  val inflated = (1 until mult).map(i =>
      hubs.select((col("doc_id") + i * 1000000L).as("doc_id"), col("text")))
    .foldLeft(docs)(_ union _)
  val sh = graft.dedup.Dedup.shingleRowsOf(inflated)
  val e = graft.dedup.Dedup.minhashLshOn(sh).localCheckpoint(true)
  val ed = e.select(col("a_id").as("src"), col("b_id").as("dst"))
    .union(e.select(col("b_id").as("src"), col("a_id").as("dst"))).cache()
  val edges = ed.count()
  // uncapped shared-neighbor candidate pairs (the cost driver of
  // Graph.structuralSimilarity before the Jaccard math)
  val t0 = System.nanoTime()
  val uncappedPairs = ed.as("x").join(ed.as("y"),
      col("x.dst") === col("y.dst") && col("x.src") < col("y.src"))
    .groupBy(col("x.src"), col("y.src")).count().count()
  val t1 = System.nanoTime()
  val cappedPairs = graft.operators.Graph.structuralSimilarityCappedOn(e, 50).count()
  val t2 = System.nanoTime()
  println(f"SCALE mult=$mult%2d edges=$edges%8d " +
    f"uncapped_pairs=$uncappedPairs%10d uncapped=${(t1 - t0) / 1e9}%6.1fs " +
    f"capped_pairs=$cappedPairs%8d capped=${(t2 - t1) / 1e9}%6.1fs")
  ed.unpersist()
}
println("SCALE_DONE")
