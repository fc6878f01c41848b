// Scale experiment: connected-component dedup clusters as the corpus grows.
// Clone-inflate the sf0.01 documents corpus (each clone is a perfect
// near-duplicate, so every copy lands in the LSH candidate graph — the
// worst case for the cluster step) and measure minhashLshOn + clustersOn
// wall time and output shape at 1x / 4x / 10x.
// Run: LANG=C.UTF-8 /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//   --driver-java-options -Dfile.encoding=UTF-8 --conf spark.master=local[8] \
//   --conf spark.sql.shuffle.partitions=8 -i scripts/scale_clusters.sc
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
  val edges = graft.dedup.Dedup.minhashLshOn(graft.dedup.Dedup.shingleRowsOf(inflated))
  val nEdges = edges.count()
  val t1 = System.nanoTime()
  val labels = graft.dedup.Dedup.clustersOn(edges)
  val nNodes = labels.count()
  val nClusters = labels.select("cluster_id").distinct().count()
  val t2 = System.nanoTime()
  println(f"SCALE mult=$mult%2d docs=${base * mult}%6d edges=$nEdges%8d " +
    f"nodes=$nNodes%7d clusters=$nClusters%6d lsh=${(t1 - t0) / 1e9}%6.1fs cc=${(t2 - t1) / 1e9}%6.1fs")
  inflated.unpersist()
}
println("SCALE_DONE")
