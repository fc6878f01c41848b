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

  test("substring spans merge overlapping windows and break on gaps > k") {
    import spark.implicits._
    // k=3 grams: "a b c" repeats across docs 1/2/3 and within doc 3;
    // "b c d" links docs 1 and 2; everything else is unique
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x a b c d y z w"),
      (3L, "a b c m n o p a b c")).toDF("doc_id", "text")
    val spans = Dedup.substringSpansOf(Dedup.posGramRowsOf(docs, 3), 3)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(spans.toSeq == Seq(
      (1L, 0, 3, 2L), // hits at 0,1 overlap -> one span over tokens 0..3
      (2L, 1, 4, 2L),
      (3L, 0, 2, 1L), // same doc repeats "a b c" 7 tokens apart: gap > k
      (3L, 7, 9, 1L)))
  }

  test("keep-first substring spans spare each gram's globally-first copy") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x a b c d y z w"),
      (3L, "a b c m n o p a b c")).toDF("doc_id", "text")
    val g = Dedup.posGramRowsOf(docs, 3)
    val spans = Dedup.substringSpansKeepFirstOf(g, 3)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // doc 1 holds the first copy of both shared grams -> untouched; later
    // copies in docs 2 and 3 (incl. doc 3's within-doc repeat) are cut
    assert(spans.toSeq == Seq(
      (2L, 1, 4, 2L),
      (3L, 0, 2, 1L),
      (3L, 7, 9, 1L)))
    // keep-first hit positions are a subset of the all-copies hit positions
    val all = Dedup.substringSpansOf(g, 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(spans.forall { case (id, s0, e0, _) =>
      all.exists { case (i2, s2, e2) => i2 == id && s2 <= s0 && e0 <= e2 }
    })
  }

  test("substring dup ratio sums exactly the disjoint span lengths") {
    val spans = Dedup.substringSpans(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val spanTokens = spans.groupBy(_._1)
      .map { case (id, ss) => id -> ss.map(s => s._3 - s._2 + 1L).sum }
    val ratio = Dedup.substringDupRatio(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(spans.nonEmpty, "test data should contain duplicated 8-grams")
    ratio.foreach { case (id, n, dup, rt) =>
      assert(dup == spanTokens.getOrElse(id, 0L), s"doc $id dup_tokens")
      assert(dup <= n && rt >= 0.0 && rt <= 1.0)
      // spans within a doc never overlap (dup budget is an exact count)
      val ss = spans.filter(_._1 == id).sortBy(_._2)
      ss.sliding(2).foreach {
        case Array(a, b) => assert(b._2 > a._3 + 1, s"doc $id spans touch")
        case _ =>
      }
    }
  }
}
