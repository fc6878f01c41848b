package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.operators.Analytics

/** Properties of the round-5 operators: the dau_wau map-side-explode plan,
  * df-capped containment dedup, the approx skew diagnostic, and the
  * oracle-checked multimodal recall harness.
  */
class Round5Spec extends SparkTestBase {

  test("dau_wau plans with no nested-loop join (map-side explode)") {
    val q = Analytics.dauWau(spark, Sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"dau_wau must not band-join:\n$plan")
    val bad = q.where(col("dau") > col("wau") ||
      col("stickiness") <= 0 || col("stickiness") > 1).count()
    assert(bad == 0)
    assert(q.count() > 0)
  }

  test("containment cap is exact when no shingle exceeds it") {
    // a cap above every shingle's document frequency must change nothing
    val uncapped = Dedup.containmentPairs(spark, Sf).collect().toSet
    val loose = Dedup.containmentPairsCapped(spark, Sf, maxDf = 1000000).collect().toSet
    assert(loose == uncapped)
  }

  test("containment cap bounds per-shingle join width") {
    val capped = Dedup.containmentPairsCapped(spark, Sf, maxDf = 50)
    // containment stays a valid ratio over the surviving shingles
    assert(capped.where(col("containment") <= 0 || col("containment") > 1).count() == 0)
    // a maximally tight cap keeps only df=1 shingles -> no shared shingles,
    // so no pairs can form at all
    assert(Dedup.containmentPairsCapped(spark, Sf, maxDf = 1).count() == 0)
  }

  test("skew_stats_approx matches the exact twin within sketch error") {
    val exact = Analytics.skewStats(spark, Sf).collect().head
    val approx = Analytics.skewStatsApprox(spark, Sf).collect().head
    assert(approx.getAs[Long]("n_keys") == exact.getAs[Long]("n_keys"))
    assert(approx.getAs[Long]("n_rows") == exact.getAs[Long]("n_rows"))
    assert(approx.getAs[Long]("max_mult") == exact.getAs[Long]("max_mult"))
    // GK with accuracy 10000: rank error <= n/10000 -> at this SF the
    // quantiles land within one multiplicity step of the exact value
    assert(math.abs(approx.getAs[Double]("p50_mult") - exact.getAs[Double]("p50_mult")) <= 1.0)
    assert(math.abs(approx.getAs[Double]("p99_mult") - exact.getAs[Double]("p99_mult")) <= 1.0)
  }

  test("mm_recall measures a valid recall over the hex embedding") {
    val r = Multimodal.mmRecall(spark, Sf).collect().head
    val (hits, truth) = (r.getAs[Long]("n_hits"), r.getAs[Long]("n_truth"))
    assert(truth > 0 && hits >= 0 && hits <= truth)
    val rec = r.getAs[Double]("recall")
    assert(rec >= 0.0 && rec <= 1.0)
    // multi-table LSH on 16-dim hex embeddings should find a decent share
    // of true neighbors even on this adversarially-uniform corpus
    assert(rec > 0.1, s"recall collapsed: $rec")
  }

  test("hex embedding is 16-dim in [-1, 1)") {
    val e = Multimodal.hexEmbedding(spark, Sf)
    val bad = e.where(size(col("v")) =!= 16 ||
      exists(col("v"), x => x < -1.0 || x >= 1.0)).count()
    assert(bad == 0)
  }
}
