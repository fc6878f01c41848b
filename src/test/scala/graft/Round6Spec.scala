package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Properties of the round-6 operators: the degree-capped structural
  * similarity (hub neighbors dropped before the shared-neighbor self-join).
  */
class Round6Spec extends SparkTestBase {

  test("graph similarity cap is exact when no vertex exceeds it") {
    // a cap above every vertex's degree must change nothing
    val uncapped = Graph.structuralSimilarity(spark, Sf).collect().toSet
    val loose = Graph.structuralSimilarityCapped(spark, Sf, maxDeg = 1000000)
      .collect().toSet
    assert(loose == uncapped)
  }

  test("bpe merge counts never increase round over round") {
    // merging the max-count pair can only lower or preserve every other
    // pair's count, and any new pair's count is bounded by a pre-merge one
    val m = graft.text.TextOps.bpeMergeTrain(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).sortBy(_._1)
    assert(m.length == 6 && m.map(_._1).toSeq == (0L to 5L))
    assert(m.forall(_._2 > 0))
    m.sliding(2).foreach { case Array((_, c1), (_, c2)) =>
      assert(c2 <= c1, s"round counts must be non-increasing: ${m.toSeq}")
    }
  }

  test("bpe encode applies the learned merges: fewer units, merged units exist") {
    val base = graft.core.Tables.documents(spark, Sf)
      .select(col("doc_id"), size(graft.text.TextOps.tokens(col("text"))).as("n_base"))
    val enc = graft.text.TextOps.bpeEncode(spark, Sf)
    val joined = enc.join(base, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (units, merged, b) = (r.getLong(1), r.getLong(2), r.getInt(3).toLong)
      // every word-level merge collapses two adjacent tokens into one unit
      assert(units >= 1 && merged >= 0 && merged <= units)
      assert(units <= b, s"encode cannot grow the unit count: $r")
      // every join removes exactly one unit, so joins = n_base - n_units,
      // and each merged unit holds at least one join
      assert(b - units >= merged, s"join accounting violated: $r")
    }
    // the trained rules actually fire somewhere in the corpus
    assert(joined.map(_.getLong(2)).sum > 0, "no merged units produced")
  }

  test("dsir weights rank the target language above the rest") {
    // the estimator's point: docs resembling the target distribution (en)
    // must average a higher importance logit than docs that don't
    val w = graft.text.TextOps.dsirWeights(spark, Sf)
    val docs = graft.core.Tables.documents(spark, Sf).select(col("doc_id"), col("lang"))
    val byLang = w.join(docs, "doc_id")
      .groupBy(col("lang")).agg(avg(col("dsir_logw")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val others = byLang.filter(_._1 != "en").values
    assert(others.nonEmpty && byLang("en") > others.max,
      s"en must outrank all other langs: $byLang")
  }

  test("knn-distance score is a valid bounded cosine statistic") {
    val r = graft.ann.Ann.embKnnDist(spark, Sf, k = 5)
    assert(r.count() > 0)
    val bad = r.where(col("k_found") <= 0 || col("k_found") > 5 ||
      col("avg_cos") < -1.000001 || col("avg_cos") > 1.000001 ||
      col("min_cos") > col("avg_cos") + 1e-9).count()
    assert(bad == 0)
  }

  test("graph similarity cap bounds per-neighbor join width") {
    val capped = Graph.structuralSimilarityCapped(spark, Sf, maxDeg = 50)
    // neighbor Jaccard stays a valid ratio over the surviving neighborhoods
    assert(capped.where(col("neighbor_jaccard") <= 0 ||
      col("neighbor_jaccard") > 1).count() == 0)
    // every vertex in the candidate graph has degree >= 1, so a zero cap
    // drops every edge -> no pairs can form at all
    assert(Graph.structuralSimilarityCapped(spark, Sf, maxDeg = 0).count() == 0)
  }
}
