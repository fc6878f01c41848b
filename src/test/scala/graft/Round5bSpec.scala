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

  test("ts_double_smooth: forecast equals level + trend from the FIR pair") {
    val r = Tsdb.doubleSmooth(pts, all, Start, End)
    assert(r.count() > 0)
    // recombine rounded s1/s2 -> forecast must be within rounding slack
    val viol = r.where(abs(lit(2.0) * col("s1") - col("s2") +
      lit(0.3 / 0.7) * (col("s1") - col("s2")) - col("forecast")) > 1e-4).count()
    assert(viol == 0)
    // kernel sanity: both FIR kernels sum to 1
    val (c, cc) = Tsdb.brownCoefs()
    assert(math.abs(c.sum - 1.0) < 1e-12 && math.abs(cc.sum - 1.0) < 1e-12)
  }

  test("ts_cross_corr emits one valid correlation per lag") {
    val r = Tsdb.crossCorr(Tsdb.points(spark, Sf),
      col("event_type") === "click", col("event_type") === "error", Start, End)
    assert(r.where(col("xcorr") < -1.0 || col("xcorr") > 1.0).count() == 0)
    assert(r.select("lag").distinct().count() == r.count())
  }

  test("q6/q14/q19 scalar shapes produce sane aggregates") {
    val q6 = Analytics.q6ForecastRevenue(spark, Sf).collect().head
    assert(q6.getAs[Double]("revenue") > 0)
    val q14 = Analytics.q14PromoShare(spark, Sf).collect().head
    val pct = q14.getAs[Double]("promo_revenue_pct")
    assert(pct >= 0 && pct <= 100)
    val q19 = Analytics.q19Brackets(spark, Sf)
    assert(q19.count() <= 3 && q19.where(col("revenue") <= 0).count() == 0)
  }

  test("window_percent_rank stays in [0,1] and cume_dist is monotone") {
    val r = Analytics.windowPercentRank(spark, Sf)
    assert(r.where(col("pct_rank") < 0 || col("pct_rank") > 1 ||
      col("cume") <= 0 || col("cume") > 1).count() == 0)
    assert(r.where(col("cume") < col("pct_rank")).count() == 0)
  }

  test("emb_centroid_dist scores every vector against its own label centroid") {
    val r = Ann.embCentroidDist(spark, Sf)
    val n = spark.read.parquet(s"$Sf/embeddings.parquet").count()
    assert(r.count() == n)
    assert(r.where(col("cos_centroid") < -1.0 || col("cos_centroid") > 1.0).count() == 0)
    // own-label centroids align better than chance: mean cosine positive
    val mean = r.agg(avg(col("cos_centroid"))).collect().head.getDouble(0)
    assert(mean > 0.0, s"mean centroid cosine $mean")
  }

  test("graph_degree_dist conserves nodes and edge endpoints") {
    val r = graft.operators.Graph.degreeDist(spark, Sf).collect()
    val nodes = r.map(_.getAs[Long]("n_nodes")).sum
    val ends = r.map(x => x.getAs[Long]("deg") * x.getAs[Long]("n_nodes")).sum
    val edges = graft.dedup.Dedup.minhashLsh(spark, Sf).count()
    assert(ends == 2 * edges)
    assert(nodes > 0)
  }

  test("ngram_coverage scores all shingled docs, benchmark overlap in [0,1]") {
    val r = TextOps.ngramCoverage(spark, Sf)
    assert(r.where(col("coverage") < 0 || col("coverage") > 1).count() == 0)
    assert(r.where(col("n_covered") > col("n_shingles")).count() == 0)
    assert(r.where(col("doc_id") < 10).count() == 0)
  }

  test("q22_idle_customers only counts above-average idle customers") {
    val r = Analytics.q22IdleCustomers(spark, Sf)
    val total = r.agg(sum(col("n_custs"))).collect().head.getLong(0)
    val allCust = spark.read.parquet(s"$Sf/customer.parquet").count()
    assert(total > 0 && total < allCust)
  }

  test("event_attribution only credits clicks within the lookback window") {
    val r = Analytics.eventAttribution(spark, Sf)
    assert(r.count() > 0)
    assert(r.where(col("attributed_revenue") < 0).count() == 0)
    // attributed purchases never exceed total purchases
    val purchases = spark.read.parquet(s"$Sf/events.parquet")
      .where(col("event_type") === "purchase").count()
    val attributed = r.agg(sum(col("n_purchases"))).collect().head.getLong(0)
    assert(attributed <= purchases)
  }

  test("dedup_winnowing overlaps are consistent with the shared counts") {
    val r = TextOps.winnowingPairs(spark, Sf)
    assert(r.where(col("a_overlap") <= 0 || col("a_overlap") > 1 ||
      col("b_overlap") <= 0 || col("b_overlap") > 1).count() == 0)
    assert(r.where(col("n_shared") < 5).count() == 0)
    assert(r.where(col("a_id") >= col("b_id")).count() == 0)
  }

  test("q8_market_share stays a valid share and denominators cover numerators") {
    val r = Analytics.q8MarketShare(spark, Sf)
    assert(r.count() > 0)
    assert(r.where(col("mkt_share") < 0 || col("mkt_share") > 1).count() == 0)
    assert(r.where(col("nation_revenue") > col("total_revenue")).count() == 0)
  }

  test("q13_order_dist conserves the customer population") {
    val r = Analytics.q13OrderDist(spark, Sf)
    val total = r.agg(sum(col("custdist"))).collect().head.getLong(0)
    assert(total == spark.read.parquet(s"$Sf/customer.parquet").count())
  }

  test("mix_temperature flattens the mixture toward uniform") {
    val r = Analytics // touch to avoid unused warnings
    val m = TextOps.mixTemperature(spark, Sf)
    // temp shares still sum to ~1
    val ts = m.agg(sum(col("temp_share"))).collect().head.getDouble(0)
    assert(math.abs(ts - 1.0) < 1e-3, s"temp shares sum $ts")
    // tempering upweights below-average sources and downweights the largest
    val viol = m.where(col("share") < lit(1.0) / m.count() &&
      col("multiplier") < 1.0).count()
    assert(viol == 0)
  }

  test("ts_seasonal_decompose recombines additively") {
    val r = Tsdb.seasonalDecompose(pts, all, Start, End)
    assert(r.count() > 0)
    val viol = r.where(abs(col("x") - (col("trend") + col("seasonal") + col("residual"))) > 1e-4).count()
    assert(viol == 0)
    // residuals average to ~0 within each (series, hour-of-day) cell — exact
    // by construction (residual = detrended - its cell mean) up to rounding
    val bias = r.groupBy(col("event_type"), col("bucket") % 24)
      .agg(avg(col("residual")).as("b"))
      .where(abs(col("b")) > 1e-4).count()
    assert(bias == 0)
  }

  test("round-5 plans take the scale-safe physical shapes") {
    // Q2's correlated min: rank-1 window with the group-limit pushdown
    val q2 = Analytics.q2MinCost(spark, Sf).queryExecution.executedPlan.toString
    assert(q2.contains("WindowGroupLimit"), s"q2 missing rank pushdown:\n$q2")
    assert(!q2.contains("BroadcastNestedLoopJoin"))
    // attribution is ONE window pass — no join of any kind
    val at = Analytics.eventAttribution(spark, Sf).queryExecution.executedPlan.toString
    assert(!at.contains("Join"), s"attribution must not join:\n$at")
    // Q16's NOT IN runs as a broadcast anti hash join, not null-aware BNLJ
    val q16 = Analytics.q16SupplierCount(spark, Sf).queryExecution.executedPlan.toString
    assert(q16.contains("BroadcastHashJoin") && q16.contains("LeftAnti"), q16)
    assert(!q16.contains("BroadcastNestedLoopJoin"))
    // winnowing pair generation stays hash joins end to end
    val dw = TextOps.winnowingPairs(spark, Sf).queryExecution.executedPlan.toString
    assert(!dw.contains("BroadcastNestedLoopJoin"))
  }

  test("ts_time_weighted_avg stays inside the sample value range") {
    val r = Tsdb.timeWeightedAvg(Tsdb.points(spark, Sf),
      EsFilter.compile("""{"match_all":{}}"""), Start, End)
    assert(r.count() > 0)
    // TWA is a convex combination of sampled values
    val mm = spark.read.parquet(s"$Sf/events.parquet")
      .agg(min(col("value")), max(col("value"))).collect().head
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    assert(r.where(col("twa") < lo - 1e-6 || col("twa") > hi + 1e-6).count() == 0)
    assert(r.where(col("span_ms") <= 0).count() == 0)
  }

  test("ts_mean_crossings bounded by point count") {
    val r = Tsdb.meanCrossings(Tsdb.points(spark, Sf),
      EsFilter.compile("""{"match_all":{}}"""), Start, End)
    assert(r.count() > 0)
    assert(r.where(col("n_up_crossings") * 2 > col("n_points")).count() == 0)
  }

  test("ts_lttb keeps exactly one point per interior bucket") {
    val r = Tsdb.lttb(pts, all, Start, End)
    assert(r.count() > 0)
    assert(r.groupBy(col("event_type"), col("bucket")).count()
      .where(col("count") > 1).count() == 0)
    assert(r.where(col("area") < 0).count() == 0)
  }

  test("ts_anomaly_stl only flags beyond-threshold residuals") {
    val r = Tsdb.anomaliesStl(pts, all, Start, End, z = 2.5)
    assert(r.where(abs(col("rz")) <= 2.5).count() == 0)
    // the residual z-detector flags a SUBSET of buckets, never everything
    val total = Tsdb.seasonalDecompose(pts, all, Start, End).count()
    assert(r.count() < total / 10)
  }

  test("q20_promo_suppliers only counts above-share suppliers") {
    val r = Analytics.q20PromoSuppliers(spark, Sf)
    val total = r.agg(sum(col("n_suppliers"))).collect().head.getLong(0)
    val allSup = spark.read.parquet(s"$Sf/supplier.parquet").count()
    assert(total > 0 && total <= allSup)
  }

  test("license_filter: restricted takes precedence and thirds are classified") {
    val r = TextOps.licenseFilter(spark, Sf)
    assert(r.where(col("license_class") === "restricted" &&
      col("n_restricted") === 0).count() == 0)
    val classes = r.groupBy(col("license_class")).count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(classes.keySet == Set("permissive", "restricted", "unknown"))
    // two thirds of docs carry no license line
    assert(classes("unknown") > classes("permissive"))
  }

  test("url_dedup collapses all four surface variants of each canonical url") {
    val r = TextOps.urlDedup(spark, Sf)
    assert(r.where(col("canonical_url").rlike("^https?://|www\\.|[?#:]")).count() == 0)
    assert(r.where(col("n_variants") > col("n_docs")).count() == 0)
    val docs = r.agg(sum(col("n_docs"))).collect().head.getLong(0)
    assert(docs == spark.read.parquet(s"$Sf/documents.parquet").count())
  }

  test("emb_pca_1d: projections centered, sign-fixed, variance-bearing") {
    val r = Ann.embPca1d(spark, Sf)
    val n = spark.read.parquet(s"$Sf/embeddings.parquet").count()
    assert(r.count() == n)
    // projections of centered data have ~zero mean
    val mean = r.agg(avg(col("pc1"))).collect().head.getDouble(0)
    assert(math.abs(mean) < 0.01, s"pc1 mean $mean")
    // the principal direction carries real variance
    val sd = r.agg(stddev(col("pc1"))).collect().head.getDouble(0)
    assert(sd > 0.01, s"pc1 sd $sd")
  }

  test("ts_rolling_corr windows stay valid correlations") {
    val r = Tsdb.rollingCorr(Tsdb.points(spark, Sf),
      col("event_type") === "click", col("event_type") === "error", Start, End)
    assert(r.where(col("rcorr") < -1.0 || col("rcorr") > 1.0).count() == 0)
    assert(r.where(col("n_pairs") < 12 || col("n_pairs") > 24).count() == 0)
  }

  test("ts_absent only reports series silent in the current window") {
    val End = 1705881600000L
    val r = Tsdb.absentSeries(Tsdb.points(spark, Sf),
      EsFilter.compile("""{"match_all":{}}"""), End)
    assert(r.count() > 0)
    // no reported series has any point in the current window
    val cur = spark.read.parquet(s"$Sf/events.parquet")
      .where(unix_millis(col("ts").cast("timestamp")).between(End - 86400000L, End - 1))
      .select(col("user_id"), col("event_type")).distinct()
    assert(r.join(cur, Seq("user_id", "event_type")).count() == 0)
  }

  test("minhash_est_quality: estimates track exact Jaccard within sketch noise") {
    val r = graft.dedup.Dedup.minhashEstQuality(spark, Sf)
    assert(r.count() > 0)
    assert(r.where(col("est_jaccard") < 0 || col("est_jaccard") > 1 ||
      col("jaccard") < 0 || col("jaccard") > 1).count() == 0)
    // 16-seed binomial sd <= 0.125; allow 4 sd for the worst pair
    assert(r.where(abs(col("est_error")) > 0.5).count() == 0)
  }

  test("dedup_incremental covers every new doc and never checks new-vs-new") {
    val r = graft.dedup.Dedup.incrementalDedup(spark, Sf, splitId = 250L)
    assert(r.where(col("doc_id") < 250).count() == 0)
    assert(r.where(col("keep") === 1 && col("n_old_matches") > 0).count() == 0)
    // both outcomes occur on this corpus (it contains old/new near-dups)
    assert(r.where(col("keep") === 0).count() > 0)
    assert(r.where(col("keep") === 1).count() > 0)
  }

  test("graph_similarity: neighbor Jaccard is a valid ratio over real overlaps") {
    val r = graft.operators.Graph.structuralSimilarity(spark, Sf)
    assert(r.where(col("neighbor_jaccard") <= 0 ||
      col("neighbor_jaccard") > 1).count() == 0)
    assert(r.where(col("a_id") >= col("b_id")).count() == 0)
  }

  test("power_users: segments partition users and shares sum to one") {
    val r = Analytics.powerUsers(spark, Sf).collect()
    assert(r.length == 2)
    val users = r.map(_.getAs[Long]("n_users")).sum
    assert(users == spark.read.parquet(s"$Sf/events.parquet")
      .select("user_id").distinct().count())
    assert(math.abs(r.map(_.getAs[Double]("event_share")).sum - 1.0) < 1e-3)
    val power = r.find(_.getAs[String]("segment") == "power").get
    // top decile holds at least its proportional share
    assert(power.getAs[Long]("n_events") * users >=
      power.getAs[Long]("n_users") * r.map(_.getAs[Long]("n_events")).sum)
  }

  test("langid_confusion covers every document exactly once") {
    val r = TextOps.langidConfusion(spark, Sf)
    val total = r.agg(sum(col("n"))).collect().head.getLong(0)
    assert(total == spark.read.parquet(s"$Sf/documents.parquet").count())
    val langs = Set("en", "es", "fr", "de", "zh")
    assert(r.collect().forall(x =>
      langs(x.getAs[String]("lang")) && langs(x.getAs[String]("pred_lang"))))
  }

  test("ts_sax_motifs ranks words by support") {
    // sf0.001's hourly coverage is sparse -> lower the partial-day floor
    val r = Tsdb.saxMotifs(pts, all, Start, End, minSyms = 2).collect()
    assert(r.nonEmpty && r.length <= 20)
    val sup = r.map(_.getAs[Long]("support"))
    assert(sup.sameElements(sup.sortBy(-_)))
  }

  test("ts_band_profile: bands are ordered and cover all series-hours") {
    val r = Tsdb.bandProfile(pts, all, Start, End)
    assert(r.count() > 0)
    assert(r.where(col("p10") > col("p50") || col("p50") > col("p90")).count() == 0)
    assert(r.where(col("hour_of_day") < 0 || col("hour_of_day") > 23).count() == 0)
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
