package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.operators.Analytics
import graft.text.TextOps

/** Round-9 additions: fuzzy decontamination, CCNet perplexity buckets,
  * budgeted epoch allocation.
  */
class Round9Spec extends SparkTestBase {

  test("fuzzy decontamination flags verified near-dups of the benchmark set") {
    val r = Dedup.decontaminateFuzzy(spark, Sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getLong(3)))
    // corpus side vs benchmark side, verdict consistent with the threshold
    r.foreach { case (doc, bench, j, c) =>
      assert(doc >= 50 && bench < 50, s"sides crossed: $doc vs $bench")
      assert(j >= 0.0 && j <= 1.0)
      assert(c == (if (j >= 0.5) 1L else 0L))
    }
    // LSH at 4x4 bands catches J≈0.95+ pairs essentially surely: every
    // exact near-dup pair straddling the benchmark boundary must surface
    val truth = Dedup.ngramJaccard(spark, Sf, tau = 0.95).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
      .filter { case (a, b) => a < 50 && b >= 50 }
    val got = r.map { case (doc, bench, _, _) => (bench, doc) }.toSet
    assert(truth.nonEmpty, "test data should plant near-dups of docs < 50")
    assert(truth.forall(got.contains), s"missed: ${truth.filterNot(got.contains).toSeq}")
  }

  test("ccnet buckets are balanced per-language terciles of the LM score") {
    val r = TextOps.ccnetBuckets(spark, Sf).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getDouble(2), x.getString(3)))
    assert(r.length == TextOps.lmScore(spark, Sf).count())
    assert(r.forall(x => Set("head", "middle", "tail").contains(x._4)))
    r.groupBy(_._2).foreach { case (lang, docs) =>
      val sizes = docs.groupBy(_._4).view.mapValues(_.length)
      // ntile(3): bucket sizes differ by at most one within a language
      assert(sizes.values.max - sizes.values.min <= 1,
        s"$lang tercile sizes: ${sizes.toMap}")
      // every head doc scores at least every tail doc (desc fluency order)
      val head = docs.filter(_._4 == "head").map(_._3)
      val tail = docs.filter(_._4 == "tail").map(_._3)
      if (head.nonEmpty && tail.nonEmpty)
        assert(head.min >= tail.max - 1e-9, s"$lang head/tail inverted")
    }
  }

  test("epoch allocation hits the uniform target until the cap binds") {
    val budget = 2000000L
    val r = TextOps.mixEpochs(spark, Sf, budget).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getDouble(3),
        x.getDouble(4), x.getLong(5), x.getLong(6)))
    assert(r.nonEmpty)
    val nSources = r.length
    r.foreach { case (src, nTok, target, raw, ep, planned, capped) =>
      assert(target == budget / nSources)
      assert(capped == (if (raw > 4.0) 1L else 0L), s"$src capped flag")
      assert(math.abs(ep - math.min(raw, 4.0)) < 1e-9, s"$src epochs")
      // planned tokens realize epochs * n_tokens, so an uncapped source
      // lands on its target share (up to the 4-dp epoch rounding)
      assert(math.abs(planned - ep * nTok) <= 0.5 + 1e-9)
      if (capped == 0L)
        assert(math.abs(planned - target) <= nTok * 1e-3 + 1,
          s"$src planned $planned vs target $target")
      else assert(planned < target)
    }
  }

  test("q4 counts each late order once regardless of its late-line count") {
    val r = Analytics.q4OrderPriority(spark, Sf).collect()
      .map(x => (x.getString(0), x.getLong(1))).toMap
    assert(r.nonEmpty && r.values.forall(_ > 0))
    // every counted order exists exactly once: the semi join can never
    // exceed the quarter's order population per priority
    val orders = graft.core.Tables.orders(spark, Sf)
      .where(col("o_orderdate") >= graft.core.Det.tsLit(820454400000L) &&
             col("o_orderdate") < graft.core.Det.tsLit(828316800000L))
      .groupBy(col("o_orderpriority")).count().collect()
      .map(x => (x.getString(0), x.getLong(1))).toMap
    r.foreach { case (p, c) => assert(c <= orders(p), s"$p overcounted") }
  }

  test("q9 profit groups cover exactly the red-part ship years") {
    val r = Analytics.q9ProfitCenter(spark, Sf).collect()
    assert(r.nonEmpty)
    // 1995..2001 data ⇒ epoch-millis year buckets 25..32
    assert(r.forall(x => x.getLong(1) >= 25 && x.getLong(1) <= 32))
    assert(r.map(_.getString(0)).toSet.size <= 25)
  }

  test("q11 keeps exactly the parts above the value-pool fraction") {
    val r = Analytics.q11ImportantParts(spark, Sf).collect()
      .map(x => (x.getLong(0), x.getDouble(1)))
    assert(r.nonEmpty)
    val pool = r.map(_._2).sum // kept values are a lower bound on the pool
    r.foreach { case (_, v) => assert(v > 0.0 && v <= pool) }
    assert(r.map(_._1).distinct.length == r.length)
  }

  test("q12 splits every late line into exactly one priority class") {
    val r = Analytics.q12LateLines(spark, Sf).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.nonEmpty)
    val o = graft.core.Tables.orders(spark, Sf)
      .select(col("o_orderkey"), col("o_orderdate"))
    val late = graft.core.Tables.lineitem(spark, Sf)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate") >= graft.core.Det.tsLit(820454400000L) &&
             col("l_shipdate") < graft.core.Det.tsLit(852076800000L) &&
             col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .count()
    assert(r.map(x => x._2 + x._3).sum == late, "high+low must cover all late lines")
  }

  test("q21 blames only the unique last-shipping supplier of shared orders") {
    val r = Analytics.q21WaitingSuppliers(spark, Sf).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    assert(r.nonEmpty && r.length <= 20)
    // descending wait counts with a deterministic name tie-break
    r.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1), s"$a !>= $b")
      case _ =>
    }
    assert(r.map(_._1).distinct.length == r.length)
  }
}
