package graft

import org.apache.spark.sql.functions._
import graft.ann.Ann
import graft.text.TextOps

class AnnTextSpec extends SparkTestBase {

  test("brute-force top-k: dense ranks, descending cosine, no self-matches") {
    val rows = Ann.bruteForceTopK(spark, Sf, k = 5, nQueries = 10).collect()
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.length == 5)
      assert(rs.forall(_.getLong(1) != q))
      val byRank = rs.sortBy(_.getLong(3))
      assert(byRank.map(_.getLong(3)).toSeq == (1L to 5L))
      val cos = byRank.map(_.getDouble(2))
      assert(cos.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    }
  }

  test("LSH top-k neighbors are a subset of each query's full neighbor list") {
    val brute = Ann.bruteForceTopK(spark, Sf, k = 1000000, nQueries = 5)
    // every LSH hit must carry the same cosine the exhaustive search computed
    val bruteMap = brute.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Ann.lshTopK(spark, Sf, k = 5, nQueries = 5).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(bruteMap.contains(key) && math.abs(bruteMap(key) - r.getDouble(2)) < 1e-9)
    }
  }

  test("langid scores are consistent with the argmax prediction") {
    val rows = TextOps.langId(spark, Sf).collect()
    rows.foreach { r =>
      val scores = Map("en" -> r.getLong(1), "es" -> r.getLong(2), "fr" -> r.getLong(3),
        "de" -> r.getLong(4), "zh" -> r.getLong(5))
      assert(scores(r.getString(6)) == scores.values.max)
    }
  }

  test("quality ratios live in [0,1] and score in [0,1]") {
    val bad = TextOps.quality(spark, Sf)
      .where(col("alpha_ratio") < 0 || col("alpha_ratio") > 1 ||
             col("punct_ratio") < 0 || col("punct_ratio") > 1 ||
             col("stopword_ratio") < 0 || col("stopword_ratio") > 1 ||
             col("quality_score") < 0 || col("quality_score") > 1)
      .count()
    assert(bad == 0)
  }

  test("fingerprint: bag_fp is word-order independent, content_fp is not") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("doc_id", "text")
    val fps = docs.select(
      md5(TextOps.norm(col("text"))).as("content_fp"),
      md5(concat_ws(" ", array_sort(array_distinct(TextOps.tokens(col("text")))))).as("bag_fp"))
      .collect()
    assert(fps(0).getString(1) == fps(1).getString(1))
    assert(fps(0).getString(0) != fps(1).getString(0))
  }

  test("token counts: ws and regex tokenizers agree on simple text") {
    import spark.implicits._
    val df = Seq((1L, "hello world foo")).toDF("doc_id", "text")
    val r = df.select(
      size(TextOps.tokens(col("text"))).as("ws"),
      regexp_count(col("text"), lit("[a-zA-Z0-9]+|[^a-zA-Z0-9 ]")).as("re")).first()
    assert(r.getInt(0) == 3 && r.getInt(1) == 3)
  }

  test("heavy hitters: Misra-Gries honors the frequency guarantee vs exact counts") {
    import spark.implicits._
    val cap = 10
    // skewed stream: item "hot_i" appears (20-i)*50 times, plus 2000 unique rares
    val hot = (0 until 5).flatMap(i => Seq.fill((20 - i) * 50)(s"hot_$i"))
    val rare = (0 until 2000).map(i => s"rare_$i")
    val data = scala.util.Random.shuffle(hot ++ rare).toDF("tok").repartition(7)
    val n = hot.length + rare.length
    val hh = udaf(new graft.functions.HeavyHitters(cap),
      org.apache.spark.sql.Encoders.STRING)
    val got = data.agg(hh(col("tok")).as("h"))
      .select(explode(col("h")).as("e"))
      .select(col("e.item"), col("e.approx_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = (hot ++ rare).groupBy(identity).view.mapValues(_.size.toLong).toMap
    // every item with true frequency > N/cap must be reported
    exact.filter(_._2 > n / cap).keys.foreach { k =>
      assert(got.contains(k), s"guaranteed heavy hitter $k missing")
    }
    // reported counts never exceed the true count and undercount by <= N/cap
    got.foreach { case (k, c) =>
      assert(c <= exact(k), s"$k overcounted: $c > ${exact(k)}")
      assert(c >= exact(k) - n / cap, s"$k undercounted beyond the bound")
    }
  }

  test("compression ratio behaves like a quality signal") {
    import graft.text.TextOps
    val rows = TextOps.compressionRatio(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bytes, comp, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(comp > 0 && bytes > 0)
      // deflate overhead caps out quickly; ratio stays in a sane band
      assert(ratio > 0.0 && ratio < 1.2, s"ratio $ratio out of band")
      assert(math.abs(ratio - comp.toDouble / bytes) < 1e-3)
    }
    // determinism: a second run produces identical rows
    val again = TextOps.compressionRatio(spark, Sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // monotonicity: highly repetitive text compresses much harder than
    // shuffled high-entropy text of the same length
    import spark.implicits._
    val rep = ("spark " * 200).trim
    val rand = new scala.util.Random(7)
    val noisy = Seq.fill(rep.length)(('a' + rand.nextInt(26)).toChar).mkString
    val df = Seq((1L, rep), (2L, noisy)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet("target/comp-test/documents.parquet")
    val two = TextOps.compressionRatio(spark, "target/comp-test").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(two(1L) < two(2L) / 2,
      s"repetitive ${two(1L)} should compress far below noisy ${two(2L)}")
  }
}
