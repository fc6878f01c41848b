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
}
