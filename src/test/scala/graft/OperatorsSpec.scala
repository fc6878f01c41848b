package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

class OperatorsSpec extends SparkTestBase {

  test("asofJoin picks the nearest preceding order per event") {
    val out = Analytics.asofJoin(spark, Sf).collect()
    assert(out.nonEmpty)
    // brute-force check a sample of events on the driver
    val orders = graft.core.Tables.orders(spark, Sf)
      .select(col("o_custkey"), col("o_orderkey"), graft.core.Det.tsMs(col("o_orderdate")).as("oms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sample = out.take(50)
    sample.foreach { r =>
      val (user, got, gotMs) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val best = orders.filter(o => o._1 == user)
        .maxBy(o => (o._3, o._2)) // all orders precede 2024 events -> latest order wins
      assert(got == best._2 && gotMs == best._3, s"event ${r.getLong(0)}")
    }
  }

  test("sessionize: consecutive events within a session gap-bounded, sessions ordered") {
    val sess = Analytics.sessionize(spark, Sf).collect()
    assert(sess.nonEmpty)
    sess.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // session ids are 1..n dense per user
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      // sessions do not overlap and are separated by more than the gap
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.getLong(2) - a.getLong(3) > 3600000L)
        case _ =>
      }
    }
    // every session's duration accounts for its points: start<=end, n>=1
    assert(sess.forall(r => r.getLong(2) <= r.getLong(3) && r.getLong(4) >= 1))
  }

  test("windowTopN returns at most 3 rows per customer, price-descending") {
    val rows = Analytics.windowTopN(spark, Sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val byRank = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(byRank.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    }
  }

  test("rangeJoin pairs are time-ordered within the window") {
    // indirect invariant: pair counts are symmetric-free (b after a only),
    // so total pairs <= n*(n-1) and the query is non-empty at this SF
    val n = Analytics.rangeJoin(spark, Sf).agg(sum("n_pairs")).first().getLong(0)
    assert(n > 0)
  }

  test("native as-of join plan equals the window formulation row-for-row") {
    val window = Analytics.asofJoin(spark, Sf).collect().map(_.toSeq).toSeq
    val native = Analytics.asofJoinNative(spark, Sf).collect().map(_.toSeq).toSeq
    assert(native.nonEmpty && native == window)
    // and it actually planned through the custom operator
    val plan = Analytics.asofJoinNative(spark, Sf).queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoinExec") || plan.contains("AsofJoin"), plan.take(500))
  }

  test("native as-of join drops NULL keys like the equi-join formulation") {
    import spark.implicits._
    val left = Seq((1L, Option(5L), 100L), (2L, Option.empty[Long], 100L))
      .toDF("event_id", "k", "tms")
    val right = Seq((Option(5L), 10L, 50L), (Option.empty[Long], 11L, 50L))
      .toDF("rk", "o_id", "oms")
    val out = graft.operators.AsofJoinOps.asofJoin(left, right,
      leftKey = "k", rightKey = "rk", leftTimeMs = "tms", rightTimeMs = "oms",
      rightTiebreaks = Seq("o_id")).collect()
    assert(out.length == 1 && out(0).getLong(0) == 1L,
      s"only the non-null key matches: ${out.mkString(";")}")
  }

  test("native as-of join: null left time never matches, even Long.MinValue right rows") {
    import spark.implicits._
    val left = Seq((1L, 5L, Option.empty[Long]), (2L, 5L, Option(100L)))
      .toDF("event_id", "k", "tms")
    val right = Seq((5L, 10L, Long.MinValue), (5L, 11L, 50L)).toDF("rk", "o_id", "oms")
    val out = graft.operators.AsofJoinOps.asofJoin(left, right,
      leftKey = "k", rightKey = "rk", leftTimeMs = "tms", rightTimeMs = "oms",
      rightTiebreaks = Seq("o_id")).collect()
    assert(out.length == 1 && out(0).getLong(0) == 2L && out(0).getLong(4) == 11L,
      s"null-time left row must not match the MinValue right row: ${out.mkString(";")}")
  }

  test("salted join equals the plain join; salted agg equals the plain agg") {
    import graft.operators.SkewJoin
    val e = graft.core.Tables.events(spark, Sf)
    val dim = graft.core.Tables.customer(spark, Sf)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val plain = e.join(dim, "user_id").count()
    val salted = SkewJoin.saltedJoin(e, dim, "user_id", saltFrom = "event_id").count()
    assert(plain == salted && plain > 0)

    val plainAgg = e.groupBy("user_id").agg(count(lit(1)).as("n"), sum("value").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val saltedAgg = SkewJoin.saltedCountSum(e, "user_id", "value", "event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(plainAgg == saltedAgg)
  }

  test("q5 plan broadcasts the dimension tables") {
    val plan = Analytics.q5MultiJoin(spark, Sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
  }

  test("q1 plan pushes the shipdate filter into the scan") {
    val plan = Analytics.q1Agg(spark, Sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"), plan)
  }

  test("gaps-islands runs partition the filtered events exactly") {
    val runs = Analytics.gapsIslands(spark, Sf)
    val totalInRuns = runs.agg(sum("run_len")).first().getLong(0)
    val expected = graft.core.Tables.events(spark, Sf)
      .where(col("user_id") < 30).count()
    assert(totalInRuns == expected, s"$totalInRuns != $expected")
    // runs of the same (user, type) never overlap in time
    val overlapping = runs.as("a").join(runs.as("b"),
        col("a.user_id") === col("b.user_id") &&
        col("a.event_type") === col("b.event_type") &&
        col("a.start_ms") < col("b.start_ms") &&
        col("b.start_ms") <= col("a.end_ms")).count()
    assert(overlapping == 0, "island intervals must be disjoint per (user, type)")
  }

  test("hash sampling selects a stable ~10% fraction") {
    val sampled = Analytics.sampleHash(spark, Sf).agg(sum("n")).first().getLong(0)
    val total = graft.core.Tables.events(spark, Sf).count()
    val frac = sampled.toDouble / total
    assert(frac > 0.05 && frac < 0.18, s"sample fraction $frac far from 26/256")
    // determinism: same rows on a rerun
    val again = Analytics.sampleHash(spark, Sf).agg(sum("n")).first().getLong(0)
    assert(again == sampled)
  }

  test("mode per group returns exactly one row per user, the true argmax") {
    val modes = Analytics.modePerGroup(spark, Sf)
    val users = graft.core.Tables.events(spark, Sf).select("user_id").distinct().count()
    assert(modes.count() == users)
    val counts = graft.core.Tables.events(spark, Sf)
      .groupBy("user_id", "event_type").count().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).max).toMap
    modes.collect().foreach { r =>
      assert(r.getLong(2) == counts(r.getLong(0)), s"mode count not the max: $r")
    }
  }

  test("ewma stays within the trailing window's value range") {
    import graft.tsdb.{EsFilter, Tsdb}
    val out = Tsdb.ewma(Tsdb.points(spark, Sf),
      EsFilter.compile("""{"match_all":{}}"""), 1704672000000L, 1705881600000L)
    val (lo, hi) = (0.0, 1000.0) // events.value range superset
    out.collect().foreach { r =>
      val e = r.getDouble(4)
      assert(e >= lo && e <= hi, s"ewma $e outside plausible range")
    }
    val coefs = Tsdb.ewmaCoefs()
    assert(math.abs(coefs.sum - 1.0) < 1e-12, "normalized coefficients sum to 1")
  }

  test("funnel stage counts are monotone non-increasing") {
    val r = Analytics.funnel(spark, Sf).collect()(0)
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p && v > 0, s"funnel $v >= $c >= $p")
  }

  test("ohlc bounds: low <= open/close <= high, n sums to the range count") {
    import graft.tsdb.{EsFilter, Tsdb}
    val start = 1704672000000L; val end = 1705881600000L
    val pt = Tsdb.points(spark, Sf).copy(tagCols = Seq("event_type"))
    val out = Tsdb.ohlc(pt, EsFilter.compile("""{"match_all":{}}"""), start, end).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (open, close, high, low) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(low <= open && open <= high && low <= close && close <= high,
        s"ohlc bounds violated: $r")
    }
    val total = out.map(_.getLong(6)).sum
    assert(total == pt.df.where(pt.inRange(start, end)).count())
  }
}
