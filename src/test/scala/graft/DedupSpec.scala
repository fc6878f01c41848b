package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

class DedupSpec extends SparkTestBase {

  test("exact dedup keeps the smallest doc_id and covers every document") {
    val out = Dedup.exact(spark, Sf)
    val total = out.agg(sum("n_dups")).first().getLong(0)
    assert(total == graft.core.Tables.documents(spark, Sf).count())
  }

  test("minhash-LSH candidates contain every very-near-duplicate pair") {
    // LSH with 4 bands x 4 rows catches J≈0.99 pairs with prob 1-(1-J^4)^4 ≈ 1.
    val near = Dedup.ngramJaccard(spark, Sf, tau = 0.95)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cands = Dedup.minhashLsh(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(near.nonEmpty, "test data should contain planted near-duplicates")
    assert(near.subsetOf(cands), s"missed: ${near -- cands}")
  }

  test("jaccard is symmetric-free, bounded, and thresholded") {
    val rows = Dedup.ngramJaccard(spark, Sf, tau = 0.8).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getDouble(2) >= 0.8 && r.getDouble(2) <= 1.0))
  }

  test("simhash hamming distance is a near-duplicate signal") {
    val pairs = Dedup.simhashPairs(spark, Sf, maxHamming = 20)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs.values.forall(h => h >= 0 && h <= 20))
    // the planted 0.99-jaccard pairs hash to nearby signatures (the signal);
    // individual pairs can drift when the flipped tokens sit on close votes
    val near = Dedup.ngramJaccard(spark, Sf, tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val found = near.filter(pairs.contains)
    assert(found.length * 10 >= near.length * 8, s"only ${found.length}/${near.length} within 20")
    val meanNear = found.map(pairs).sum.toDouble / found.length
    assert(meanNear < 10, s"mean hamming of near-dups $meanNear")
  }

  test("embedding pairs respect the rounded-cosine threshold") {
    val rows = Dedup.embeddingPairs(spark, Sf, tau = 0.3).collect()
    assert(rows.forall(r => r.getDouble(2) >= 0.3 && r.getDouble(2) <= 1.0))
  }

  test("clusters assign one label per connected component, the min doc_id") {
    val labels = Dedup.clusters(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = Dedup.minhashLsh(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty && labels.nonEmpty)
    // every candidate edge is intra-cluster (labels are transitive closure)
    assert(edges.forall { case (a, b) => labels(a) == labels(b) })
    // the label is a member of its own cluster and is the minimum id
    labels.groupBy(_._2).foreach { case (label, members) =>
      val ids = members.keys.toSeq
      assert(ids.min == label, s"cluster $label not labeled by min id")
    }
  }
}
