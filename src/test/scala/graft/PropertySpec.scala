package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.tsdb.{EsFilter, Tsdb}

/** ScalaCheck properties for the pure kernels (run through a plain
  * scalacheck runner inside funsuite).
  */
class PropertySpec extends SparkTestBase {
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("approx_distinct is within 3 sigma of the exact distinct count per group") {
    // rsd = 0.02 in Analytics.approxDistinct -> 3σ = 6% relative error;
    // +2 absolute slack keeps tiny groups (σ rounds to ~0) honest
    val approx = graft.operators.Analytics.approxDistinct(spark, Sf)
      .select(col("event_type"), col("approx_users")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.core.Tables.events(spark, Sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val tol = math.max(3 * 0.02 * ex, 2.0)
      assert(math.abs(approx(k) - ex) <= tol,
        s"$k: approx ${approx(k)} vs exact $ex exceeds 3 sigma ($tol)")
    }
  }

  test("approx_quantile lands within the GK rank-error window of the exact quantiles") {
    // percentile_approx accuracy 10000 -> rank error ε = 1/10000; allow a
    // generous ε = 0.01 window: approx q must lie within the exact
    // [q-ε, q+ε] quantile values
    val approx = graft.operators.Analytics.approxQuantile(spark, Sf).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val vals = graft.core.Tables.events(spark, Sf)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    val eps = 0.01
    approx.foreach { case (k, qs) =>
      val sorted = vals(k)
      def exactAt(q: Double): Double =
        sorted(math.max(0, math.min(sorted.length - 1, (q * (sorted.length - 1)).round.toInt)))
      Seq(0.5, 0.95, 0.99).zip(qs).foreach { case (q, a) =>
        val lo = exactAt(q - eps); val hi = exactAt(q + eps)
        assert(a >= lo - 1e-9 && a <= hi + 1e-9,
          s"$k p$q: approx $a outside exact rank window [$lo, $hi]")
      }
    }
  }

  test("pigeonhole chunking finds every pair within the hamming bound") {
    // the guarantee dedup_simhash_buckets relies on: splitting 64 bits into
    // maxH+1 near-equal chunks (the same bounds arithmetic as
    // Dedup.simhashBucketedPairs), any two signatures with hamming <= maxH
    // agree exactly on at least one chunk
    val maxH = 8
    val nChunks = maxH + 1
    val bounds = (0 to nChunks).map(i => i * 64 / nChunks)
    def chunkVal(sig: Long, c: Int): Long =
      (bounds(c) until bounds(c + 1)).map(b => ((sig >>> b) & 1L) << (b - bounds(c))).sum
    val gen = for {
      sig <- Gen.long
      nFlips <- Gen.choose(0, maxH)
      flips <- Gen.listOfN(nFlips, Gen.choose(0, 63))
    } yield (sig, flips.distinct.foldLeft(sig)((s, b) => s ^ (1L << b)))
    check(Prop.forAll(gen) { case (a, b) =>
      java.lang.Long.bitCount(a ^ b) > maxH ||
        (0 until nChunks).exists(c => chunkVal(a, c) == chunkVal(b, c))
    })
  }

  private lazy val qsDf = {
    import spark.implicits._
    Seq(
      (1L, "purchase", 10.0), (2L, "click", 50.0), (3L, "error", 99.5),
      (4L, "signup", 0.0), (5L, "purchase", 75.0))
      .toDF("user_id", "event_type", "value")
  }

  private def ids(json: String): Seq[Long] =
    qsDf.where(EsFilter.compile(json)).select("user_id")
      .collect().map(_.getLong(0)).sorted.toSeq

  test("query_string compiles to the same rows as the equivalent hand-built filter") {
    // random conjunctions/disjunctions of field:value terms over the sample
    // df agree with the directly-constructed term/bool filters (each case is
    // two Spark jobs -> fewer iterations than the pure properties)
    val fields = Seq("event_type" -> Seq("purchase", "click", "error", "signup"),
      "user_id" -> Seq("1", "2", "3", "4", "5"))
    val termGen = for {
      (f, vs) <- Gen.oneOf(fields)
      v <- Gen.oneOf(vs)
    } yield (f, v)
    val gen = for { a <- termGen; b <- termGen; op <- Gen.oneOf("AND", "OR") } yield (a, b, op)
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25),
      Prop.forAll(gen) { case ((f1, v1), (f2, v2), op) =>
        val qs = ids(s"""{"query_string":{"query":"$f1:$v1 $op $f2:$v2"}}""")
        val bool = if (op == "AND") "must" else "should"
        val ref = ids(
          s"""{"bool":{"$bool":[{"term":{"$f1":"$v1"}},{"term":{"$f2":"$v2"}}]}}""")
        qs == ref
      })
    assert(res.passed, res.status.toString)
  }

  test("wildcard-free patterns match exactly themselves") {
    val gen = Gen.nonEmptyListOf(Gen.frequency(
      (8, Gen.alphaNumChar), (1, Gen.oneOf('.', '[', '(', '+', '$', '^')))).map(_.mkString)
    check(Prop.forAll(gen) { s =>
      val re = EsFilter.wildcardToRegex(s)
      s.matches(re) && !(s + "x").matches(re) && !("x" + s).matches(re)
    })
  }

  test("wildcard * and ? expand as expected") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    check(Prop.forAll(word, word, word) { (a, b, mid) =>
      val star = EsFilter.wildcardToRegex(a + "*" + b)
      val q = EsFilter.wildcardToRegex(a + "?" + b)
      (a + mid + b).matches(star) && (a + b).matches(star) &&
        (a + "z" + b).matches(q) && !(a + "zz" + b).matches(q)
    })
  }

  test("welford moments match the two-pass mean/variance on any sample") {
    import graft.streaming.AnomalyStream.{Moments, push}
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-1000.0, 1000.0))
    check(Prop.forAll(gen) { xs =>
      val m = xs.foldLeft(Moments(0L, 0.0, 0.0))(push)
      val mean = xs.sum / xs.length
      val m2 = xs.map(x => (x - mean) * (x - mean)).sum
      m.n == xs.length &&
        math.abs(m.mean - mean) < 1e-9 * (1 + math.abs(mean)) &&
        math.abs(m.m2 - m2) < 1e-6 * (1 + m2)
    })
  }

  test("interpolation output lies between its bracketing point values") {
    import spark.implicits._
    val h = 3600000L
    // random sparse series over a 12h span, values in [0, 100]
    val pts = Gen.listOfN(12,
      Gen.zip(Gen.chooseNum(0L, 12 * h), Gen.chooseNum(0.0, 100.0))).sample.get
      .distinctBy(_._1)
    val pt = graft.tsdb.PointsTable(
      pts.map { case (t, v) => (t, v, "s") }.toDF("ms", "value", "name")
        .select(timestamp_millis(col("ms")).as("ts"), col("value"), col("name")),
      "ts", "value", Seq("name"))
    val out = Tsdb.interpolate(pt,
      EsFilter.compile("""{"match_all":{}}"""), -1L, 13 * h, stepMs = h).collect()
    val (lo, hi) = (pts.map(_._2).min, pts.map(_._2).max)
    out.foreach { r =>
      val v = r.getDouble(2)
      // tolerance covers the operator's 4-dp output rounding: a value equal
      // to the extremum may round up to 5e-5 beyond it
      assert(v >= lo - 1e-4 && v <= hi + 1e-4,
        s"interpolated $v escapes the observed range [$lo, $hi]")
    }
  }

  test("counter increase is the sum of positive deltas when there are no resets") {
    import spark.implicits._
    // strictly increasing counter -> increase = last - first, zero resets
    val vals = Gen.listOfN(20, Gen.chooseNum(0.5, 10.0)).sample.get
      .scanLeft(0.0)(_ + _).map(v => math.rint(v * 10000) / 10000) // 4-decimal grid
    val rows = vals.zipWithIndex.map { case (v, i) => (i * 60000L, v, "c") }
    val pt = graft.tsdb.PointsTable(
      rows.toDF("ms", "value", "name")
        .select(timestamp_millis(col("ms")).as("ts"), col("value"), col("name")),
      "ts", "value", Seq("name"))
    val out = Tsdb.counterIncrease(pt,
      EsFilter.compile("""{"match_all":{}}"""), -1L, Long.MaxValue / 2).collect()
    assert(out.length == 1)
    assert(out(0).getLong(2) == 0L, "no resets in a monotone counter")
    assert(math.abs(out(0).getDouble(1) - (vals.last - vals.head)) < 1e-6)
  }

  test("graft_osa kernel matches the full-matrix OSA specification") {
    import graft.functions.OsaDistance
    // specification: textbook full-matrix OSA (vs the kernel's 3-row DP)
    def spec(a: String, b: String): Int = {
      val (n, m) = (a.length, b.length)
      val dm = Array.ofDim[Int](n + 1, m + 1)
      for (i <- 0 to n) dm(i)(0) = i
      for (j <- 0 to m) dm(0)(j) = j
      for (i <- 1 to n; j <- 1 to m) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        dm(i)(j) = math.min(math.min(dm(i - 1)(j) + 1, dm(i)(j - 1) + 1),
          dm(i - 1)(j - 1) + cost)
        if (i > 1 && j > 1 && a(i - 1) == b(j - 2) && a(i - 2) == b(j - 1))
          dm(i)(j) = math.min(dm(i)(j), dm(i - 2)(j - 2) + 1)
      }
      dm(n)(m)
    }
    def lev(a: String, b: String): Int = { // plain Levenshtein: OSA's ceiling
      val (n, m) = (a.length, b.length)
      val dm = Array.ofDim[Int](n + 1, m + 1)
      for (i <- 0 to n) dm(i)(0) = i
      for (j <- 0 to m) dm(0)(j) = j
      for (i <- 1 to n; j <- 1 to m)
        dm(i)(j) = math.min(math.min(dm(i - 1)(j) + 1, dm(i)(j - 1) + 1),
          dm(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dm(n)(m)
    }
    // 3-letter alphabet so transpositions occur constantly
    val gen = Gen.listOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    check(Prop.forAll(gen, gen) { (a, b) =>
      val d = OsaDistance.osa(a, b)
      d == spec(a, b) && d == OsaDistance.osa(b, a) && d <= lev(a, b) &&
        d <= math.max(a.length, b.length)
    })
    check(Prop.forAll(gen)(a => OsaDistance.osa(a, a) == 0))
  }

  test("graft_osa expression agrees with the kernel through codegen") {
    import spark.implicits._
    val pairs = Seq(("click", "cilck"), ("abcdef", "abcdfe"), ("same", "same"),
      ("", "abc"), ("kitten", "sitting"))
    val rows = pairs.toDF("a", "b").select(col("a"), col("b"),
      call_function("graft_osa", col("a"), col("b")).as("osa"),
      levenshtein(col("a"), col("b")).as("lev")).collect()
    rows.foreach { r =>
      assert(r.getInt(2) ==
        graft.functions.OsaDistance.osa(r.getString(0), r.getString(1)))
      assert(r.getInt(2) <= r.getInt(3), "OSA can never exceed Levenshtein")
    }
    // the transposition pair is exactly distance 1 under OSA (2 under lev)
    val t = rows.find(_.getString(1) == "cilck").get
    assert(t.getInt(2) == 1 && t.getInt(3) == 2)
  }

  test("randomized filter trees either compile+analyze or reject with a clear error") {
    // robustness contract of the DSL compiler: every tree built from the
    // supported grammar — including empty strings, unicode, unknown tags,
    // wildcard metacharacters, deep nesting — either compiles to a Column
    // that ANALYZES against the points schema, or throws
    // IllegalArgumentException (the rejected-not-approximated path). Any
    // other throw (MatchError, NPE, Spark AnalysisException) is a compiler
    // bug. Plan-only forcing keeps 150 samples cheap.
    val base = Tsdb.points(spark, Sf).df.limit(50).localCheckpoint(true)
    val field = Gen.oneOf("user_id", "event_type", "props.k", "nosuchtag")
    val value = Gen.oneOf("click", "view", "42", "", "ñé", "a*b?", "a b c")
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val leaf: Gen[String] = Gen.oneOf(
      Gen.zip(field, value).map { case (f, v) => s"""{"term":{${q(f)}:${q(v)}}}""" },
      Gen.zip(field, Gen.listOfN(2, value)).map { case (f, vs) =>
        s"""{"terms":{${q(f)}:[${vs.map(q).mkString(",")}]}}""" },
      Gen.zip(field, Gen.chooseNum(-5, 50), Gen.chooseNum(-5, 50)).map {
        case (f, a, b) => s"""{"range":{${q(f)}:{"gte":$a,"lt":$b}}}""" },
      Gen.zip(field, value).map { case (f, v) => s"""{"prefix":{${q(f)}:${q(v)}}}""" },
      Gen.zip(field, value).map { case (f, v) => s"""{"wildcard":{${q(f)}:${q(v)}}}""" },
      field.map(f => s"""{"exists":{"field":${q(f)}}}"""),
      field.map(f => s"""{"missing":{"field":${q(f)}}}"""),
      Gen.zip(field, value).map { case (f, v) =>
        s"""{"match":{${q(f)}:{"query":${q(v)}}}}""" },
      Gen.const("""{"match_all":{}}"""))
    def tree(depth: Int): Gen[String] =
      if (depth <= 0) leaf
      else Gen.frequency(
        4 -> leaf,
        2 -> Gen.zip(Gen.listOfN(2, tree(depth - 1)), Gen.listOfN(2, tree(depth - 1)),
          Gen.chooseNum(0, 3)).map { case (must, should, msm) =>
          s"""{"bool":{"must":[${must.mkString(",")}],""" +
            s""""should":[${should.mkString(",")}],"minimum_should_match":$msm}}""" },
        1 -> Gen.listOfN(2, tree(depth - 1)).map(ts => s"""{"and":[${ts.mkString(",")}]}"""),
        1 -> Gen.listOfN(2, tree(depth - 1)).map(ts => s"""{"or":[${ts.mkString(",")}]}"""),
        1 -> tree(depth - 1).map(t => s"""{"not":$t}"""))
    check(Prop.forAll(tree(3)) { json =>
      try {
        // the schema-aware storage-path contract: unknown fields match
        // nothing instead of throwing (ts_read_filter_unknown_tag)
        base.where(EsFilter.compile(json, base.columns.toSeq))
          .queryExecution.executedPlan
        true
      } catch {
        case _: IllegalArgumentException => true // rejected, not approximated
      }
    })
  }

  test("bucket/offset decompose every timestamp consistently") {
    // evaluated through the same Column expressions the engine uses
    import spark.implicits._
    val weekMs = Tsdb.GranularityDays * Tsdb.MsInDay
    val ts = Gen.listOfN(500, Gen.chooseNum(0L, 4102444800000L)).sample.get // through 2100
    val rows = ts.toDF("t")
      .select(col("t"), Tsdb.bucketOf(col("t")).as("b"), Tsdb.offsetOf(col("t")).as("o"))
      .collect()
    rows.foreach { r =>
      val (t, b, o) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(b % Tsdb.GranularityDays == 0)
      assert(b * Tsdb.MsInDay + o == t, s"bucket start + offset must reassemble t=$t")
      assert(o >= 0 && o < weekMs)
    }
  }

  test("minimum_should_match grammar holds ES's spec across the whole input space") {
    // the shared parser (r13) behind match / mlt / bool / terms_set /
    // combined_fields: "N" requires N, "-N" requires total-N, "P%" requires
    // floor(P% of total), "-P%" requires total - floor(P% of total);
    // disjunction callers floor at 1, bool keeps <=0 as should-optional
    val totals = Gen.choose(1, 12)
    check(Prop.forAll(totals, Gen.choose(0, 12)) { (t: Int, n: Int) =>
      EsFilter.msmOf(n.toString, t) == math.max(1, n) &&
        EsFilter.msmOf(s"-$n", t) == math.max(1, t - n) &&
        EsFilter.msmOf(s"-$n", t, floorOne = false) == t - n
    })
    check(Prop.forAll(totals, Gen.choose(0, 100)) { (t: Int, p: Int) =>
      val floor = math.floor(p / 100.0 * t).toInt
      EsFilter.msmOf(s"$p%", t) == math.max(1, floor) &&
        EsFilter.msmOf(s"-$p%", t) == math.max(1, t - floor)
    })
    // duality: requiring "all but N" plus allowing N covers the total
    check(Prop.forAll(totals, Gen.choose(0, 12)) { (t: Int, n: Int) =>
      EsFilter.msmOf(s"-$n", t, floorOne = false) + n == t
    })
    // conditional forms are rejected by name, never approximated
    intercept[IllegalArgumentException] { EsFilter.msmOf("3<90%", 5) }
  }
}
