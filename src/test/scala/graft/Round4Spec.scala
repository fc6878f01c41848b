package graft

import org.apache.spark.sql.functions._
import graft.ann.Ann
import graft.dedup.Dedup
import graft.operators.{Analytics, Graph}
import graft.text.TextOps
import graft.tsdb.{EsFilter, Tsdb}

/** Properties of the round-4 operators (chunking, chunk dedup, BPE pairs,
  * entropy, semdedup, graph analytics, quantile/availability/rollup TSDB).
  */
class Round4Spec extends SparkTestBase {
  private val Start = 1704672000000L
  private val End   = 1705881600000L
  private def pts = Tsdb.points(spark, Sf)
  private val all = EsFilter.compile("""{"match_all":{}}""")

  test("quantile_over_time: p90 lies within each bucket's [min, max]") {
    val q = Tsdb.quantileOverTime(pts.copy(tagCols = Seq("event_type")), all, Start, End)
    val bounds = pts.df
      .where(pts.inRange(Start, End))
      .groupBy(col("event_type"),
        (floor(pts.timeMs / 3600000L) * 3600000L).cast("bigint").as("bucket_ms"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val bad = q.join(bounds, Seq("event_type", "bucket_ms"))
      .where(col("p90") < col("lo") - 0.001 || col("p90") > col("hi") + 0.001)
      .count()
    assert(bad == 0)
    assert(q.count() > 0)
  }

  test("availability is in (0, 1] and bounded by bucket counts") {
    val a = Tsdb.availability(pts, all, Start, End)
    assert(a.count() > 0)
    val bad = a.where(col("availability") <= 0 || col("availability") > 1 ||
      col("buckets_with_data") > col("total_buckets")).count()
    assert(bad == 0)
  }

  test("rollup cascade: daily-from-hourly equals daily-from-raw") {
    val cascade = Tsdb.rollupCascade(pts, all, Start, End)
    val direct = pts.df
      .where(pts.inRange(Start, End))
      .groupBy(pts.tags :+ (floor(pts.timeMs / lit(Tsdb.MsInDay)) * Tsdb.MsInDay)
        .cast("bigint").as("day_ms"): _*)
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2).as("sum_value"))
    val joined = cascade.select(col("user_id"), col("event_type"), col("day_ms"),
        col("n").as("cn"), col("sum_value").as("cs"))
      .join(direct, Seq("user_id", "event_type", "day_ms"))
    assert(joined.count() == cascade.count())
    assert(joined.where(col("cn") =!= col("n") || col("cs") =!= col("sum_value")).count() == 0)
  }

  test("doc_chunks: covers every token, respects width, counts ceil(n/step)") {
    val chunks = TextOps.docChunks(spark, Sf)
    val toks = Tables2.docTokens(spark, Sf)
    val per = chunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"), sum(col("chunk_tokens")).as("tok_with_overlap"),
        max(col("chunk_tokens")).as("widest"))
      .join(toks, "doc_id")
    // ceil(n/12) chunks; width cap 16; overlapped token mass >= raw tokens
    assert(per.where(col("n_chunks") =!= ceil(col("nt") / 12.0).cast("long")).count() == 0)
    assert(per.where(col("widest") > 16).count() == 0)
    assert(per.where(col("tok_with_overlap") < col("nt")).count() == 0)
  }

  test("dedup_chunks: kept counts bounded and kept chunks = distinct hashes") {
    val d = Dedup.dedupChunks(spark, Sf)
    assert(d.where(col("n_kept") > col("n_chunks") || col("kept_ratio") <= 0 ||
      col("kept_ratio") > 1).count() == 0)
    val totalKept = d.agg(sum(col("n_kept"))).collect()(0).getLong(0)
    val distinctHashes = TextOps.docChunks(spark, Sf)
      .select(col("chunk_hash")).distinct().count()
    assert(totalKept == distinctHashes)
  }

  test("bpe_pairs: descending counts, deterministic ties") {
    val p = TextOps.bpePairs(spark, Sf).collect()
    assert(p.length == 20)
    val counts = p.map(_.getLong(2))
    assert(counts.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("entropy: bounded by ln(n_types), zero iff single type") {
    val e = TextOps.entropy(spark, Sf)
    val bad = e.where(col("entropy") < -0.001 ||
      col("entropy") > log(col("n_types").cast("double")) + 0.001).count()
    assert(bad == 0)
    assert(e.where(col("n_types") === 1 && col("entropy") =!= 0.0).count() == 0)
  }

  test("semdedup: flags are 0/1 and the first vector of each cell survives") {
    val sd = Ann.semdedup(spark, Sf)
    assert(sd.where(col("is_dup") =!= 0 && col("is_dup") =!= 1).count() == 0)
    val firstPerCell = sd.groupBy(col("cell")).agg(min(col("vec_id")).as("vec_id"))
    val flaggedFirst = sd.join(firstPerCell, Seq("cell", "vec_id"))
      .where(col("is_dup") === 1).count()
    assert(flaggedFirst == 0)
  }

  test("pagerank: ranks positive and total mass ~ 1") {
    val pr = Graph.pagerank(spark, Sf)
    if (pr.count() > 0) {
      assert(pr.where(col("pr") <= 0).count() == 0)
      val total = pr.agg(sum(col("pr"))).collect()(0).getDouble(0)
      // rounding at 8dp per round loses at most ~n*1e-8 of mass
      assert(math.abs(total - 1.0) < 0.01, s"total rank mass $total")
    }
  }

  test("priority dedup: keeper belongs to the cluster and has minimal source rank") {
    val pd = Dedup.priorityDedup(spark, Sf)
    val labels = Dedup.clusters(spark, Sf)
    // every keeper is a member of its own cluster
    val orphans = pd.join(labels,
      pd("keep_id") === labels("doc_id") && pd("cluster_id") === labels("cluster_id"),
      "left_anti").count()
    assert(orphans == 0)
    assert(pd.where(col("n_members") < 2).count() == 0 ||
      pd.count() > 0) // clusters have >= 2 members by construction of the edge set
  }

  test("mix weights: shares sum to ~1 and weights invert the share skew") {
    val mw = TextOps.mixWeights(spark, Sf).collect()
    val shareSum = mw.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 0.001)
    // weight * share == 1/n_sources for every source (up to rounding)
    val n = mw.length.toDouble
    mw.foreach { r =>
      assert(math.abs(r.getDouble(4) * r.getDouble(3) - 1.0 / n) < 0.001)
    }
  }

  test("containment: bounded by 1, and exact clones contain each other both ways") {
    val c = Dedup.containmentPairs(spark, Sf)
    assert(c.where(col("containment") > 1.0001 || col("containment") < 0.9).count() == 0)
    val full = c.where(col("containment") >= 0.9999)
      .select(col("a_id"), col("b_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // full containment of equal-size docs is symmetric
    val sizes = Dedup.shingleRowsOf(graft.core.Tables.documents(spark, Sf))
      .groupBy(col("doc_id")).count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    full.foreach { case (a, b) =>
      if (sizes(a) == sizes(b)) assert(full.contains((b, a)), s"($b,$a) missing")
    }
  }

  test("session_path: outgoing transition probabilities sum to ~1 per origin") {
    val sp = Analytics.sessionPath(spark, Sf)
    val sums = sp.groupBy(col("from_type")).agg(sum(col("p")).as("ps")).collect()
    assert(sums.nonEmpty)
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 0.01, r.toString))
  }

  test("window funnel: stages partition view-users and shrink monotonically") {
    val wf = Analytics.windowFunnel(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viewUsers = graft.core.Tables.events(spark, Sf)
      .where(col("event_type") === "view").select(col("user_id")).distinct().count()
    assert(wf.values.sum == viewUsers) // every view-user lands in exactly one stage
    // unbounded funnel can only be reached by >= as many users as the bounded one
    val unbounded = Analytics.windowFunnel(spark, Sf, windowMs = Long.MaxValue / 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(unbounded.getOrElse(3L, 0L) >= wf.getOrElse(3L, 0L))
  }

  test("boilerplate: ratios bounded and flagged mass matches high-df chunks") {
    val b = TextOps.boilerplate(spark, Sf)
    assert(b.where(col("boiler_ratio") < 0 || col("boiler_ratio") > 1 ||
      col("n_boiler") > col("n_chunks")).count() == 0)
    val flagged = b.agg(sum(col("n_boiler"))).collect()(0).getLong(0)
    val expected = TextOps.docChunks(spark, Sf)
      .join(TextOps.docChunks(spark, Sf).select(col("doc_id"), col("chunk_hash")).distinct()
        .groupBy(col("chunk_hash")).agg(count(lit(1)).as("df")), "chunk_hash")
      .where(col("df") >= 5).count()
    assert(flagged == expected)
  }

  test("ivfpq candidates respect the probed-cell restriction (subset of pq_adc space)") {
    val ivfpq = Ann.ivfPqTopK(spark, Sf, k = 1000000).select(col("q_id"), col("n_id"))
    val pq = Ann.pqTopK(spark, Sf, k = 1000000).select(col("q_id"), col("n_id"))
    // every ivfpq-scored pair must also be scorable by unrestricted ADC
    assert(ivfpq.join(pq, Seq("q_id", "n_id"), "left_anti").count() == 0)
  }

  test("recall harness: bounded by 1, and wider probes never lose recall") {
    val r = Ann.recallAtK(spark, Sf).collect()
      .map(row => row.getString(0) -> row.getDouble(3)).toMap
    assert(r.size == 5) // 4 top-k methods + the ivf_knn10 operating point (r6)
    r.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
    assert(r("ivf_nprobe2") >= r("ivf_nprobe1"))
  }

  test("rfm: quartile scores are 1..4 and a higher-spend customer never scores lower") {
    val rfm = Analytics.rfmSegments(spark, Sf)
    assert(rfm.where(col("r_quartile") < 1 || col("r_quartile") > 4 ||
      col("f_quartile") < 1 || col("f_quartile") > 4 ||
      col("m_quartile") < 1 || col("m_quartile") > 4).count() == 0)
    // monotone: m_quartile ordered consistently with monetary
    val rows = rfm.select(col("monetary"), col("m_quartile")).collect()
      .map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    rows.sliding(2).foreach { case Array(a, b) => assert(a._2 <= b._2); case _ => }
  }

  test("skew stats: multiplicities ordered p50 <= p99 <= max, share in (0,1]") {
    val r = Analytics.skewStats(spark, Sf).collect()(0)
    val (p50, p99, mx) = (r.getDouble(3), r.getDouble(4), r.getLong(2).toDouble)
    assert(p50 <= p99 + 1e-9 && p99 <= mx + 1e-9)
    assert(r.getDouble(5) > 0 && r.getDouble(5) <= 1.0)
  }

  test("vocab growth: cumulative curve is nondecreasing and ends at full vocab") {
    val vg = TextOps.vocabGrowth(spark, Sf).collect().sortBy(_.getLong(0))
    val cums = vg.map(_.getLong(3))
    cums.sliding(2).foreach { case Array(a, b) => assert(a <= b); case _ => }
    val vocab = graft.core.Tables.documents(spark, Sf)
      .select(explode(TextOps.tokens(col("text"))).as("t")).distinct().count()
    assert(cums.last == vocab)
    assert(vg.map(_.getLong(2)).sum == vocab) // new_types partitions the vocab
  }

  test("forecast: only upward trends, positive hours iff below threshold") {
    val f = graft.tsdb.Tsdb.forecast(pts.copy(tagCols = Seq("event_type")), all, Start, End)
    f.collect().foreach { r =>
      assert(r.getDouble(1) > 0) // slope
      val hours = r.getDouble(3)
      val intercept = r.getDouble(2)
      if (intercept < 150.0) assert(hours > 0)
    }
  }

  test("MAD outliers: every flagged point exceeds 3x the series MAD") {
    val m = graft.tsdb.Tsdb.madOutliers(pts.copy(tagCols = Seq("event_type")), all, Start, End)
    assert(m.where(col("abs_dev") <= lit(3.0) * col("mad")).count() == 0)
    // robust: outliers are a strict minority of the range's points
    val total = pts.df.where(pts.inRange(Start, End)).count()
    assert(m.count() < total / 2)
  }

  test("q7: only the requested nation pair appears and revenue is positive") {
    // sf0.001 has no NATION_1<->NATION_2 trades; use a pair that exists there
    val q7 = Analytics.q7Volume(spark, Sf, "NATION_20", "NATION_11").collect()
    assert(q7.nonEmpty)
    val dirs = q7.map(r => (r.getString(0), r.getString(1))).toSet
    assert(dirs.subsetOf(Set(("NATION_20", "NATION_11"), ("NATION_11", "NATION_20"))))
    q7.foreach(r => assert(r.getDouble(4) > 0))
  }

  test("market basket: lift descending with deterministic ties, counts consistent") {
    val mb = Analytics.marketBasket(spark, Sf).collect()
    assert(mb.length <= 20 && mb.nonEmpty)
    mb.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(3) >= b.getDouble(3))
      case _ =>
    }
  }

  test("audience overlap: jaccard bounded by min-size/union of the pair") {
    val ao = Analytics.audienceOverlap(spark, Sf)
    assert(ao.count() == 10) // C(5,2) event-type pairs all overlap somewhere
    assert(ao.where(col("jaccard") <= 0 || col("jaccard") > 1).count() == 0)
  }

  test("heatmap: dow in [0,6], hour in [0,23], counts cover the range") {
    val h = graft.tsdb.Tsdb.heatmap(pts.copy(tagCols = Seq("event_type")), all, Start, End)
    assert(h.where(col("dow") < 0 || col("dow") > 6 ||
      col("hour") < 0 || col("hour") > 23).count() == 0)
    val total = h.agg(sum(col("n"))).collect()(0).getLong(0)
    assert(total == pts.df.where(pts.inRange(Start, End)).count())
  }

  test("top movers: k rows, descending absolute deltas, abs matches delta") {
    val m = graft.tsdb.Tsdb.topMovers(pts, all, Start, End).collect()
    assert(m.length <= 10 && m.nonEmpty)
    m.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(4) >= b.getDouble(4))
      case _ =>
    }
    m.foreach(r => assert(math.abs(math.abs(r.getDouble(3)) - r.getDouble(4)) < 1e-9))
  }

  test("scoped dedup: per-scope keeps >= global keeps, scope counts consistent") {
    val sc = Dedup.exactScoped(spark, Sf)
    val globalHashes = Dedup.exact(spark, Sf).count()
    assert(sc.count() >= globalHashes) // one row per (scope, hash) >= per hash
    assert(sc.where(col("n_sources") < 1 || col("n_dups_in_scope") < 1).count() == 0)
  }

  test("dau/wau: wau >= dau, stickiness in (0,1]") {
    val s7 = Analytics.dauWau(spark, Sf)
    assert(s7.count() > 0)
    assert(s7.where(col("wau") < col("dau") || col("stickiness") <= 0 ||
      col("stickiness") > 1).count() == 0)
  }

  test("triangle credits come in multiples of three") {
    val t = Graph.triangleCounts(spark, Sf)
    val total = t.agg(coalesce(sum(col("n_triangles")), lit(0L))).collect()(0).getLong(0)
    assert(total % 3 == 0)
  }
}

/** Tiny helper shared by Round4Spec assertions. */
object Tables2 {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  def docTokens(s: SparkSession, d: String): DataFrame =
    graft.core.Tables.documents(s, d)
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).as("nt"))
}
