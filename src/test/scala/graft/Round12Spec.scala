package graft

import org.apache.spark.sql.functions._

/** Round-12 additions: out-of-order streaming near-dup corrections,
  * HTTP-level two-space isolation, SQL front door, retention-vs-write
  * races, and continuous facade ingest.
  */
class Round12Spec extends SparkTestBase {

  test("streaming near-dup: out-of-order arrival matches the batch a<b relation via corrections") {
    import java.nio.file.{Files, Paths}
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def tmp(n: String) = {
      val p = s"target/stream-test/neardup12-$n-${System.nanoTime()}"
      Files.createDirectories(Paths.get(p)); p
    }
    val (idx, dec, ckpt) = (tmp("idx"), tmp("dec"), tmp("ckpt"))
    val a = "the quick brown fox jumps over the lazy dog while seven wizards " +
      "brew strong coffee under pale moonlight near the ancient stone bridge " +
      "across the silver river valley before dawn"
    val aNear = a.replace("coffee", "tea")
    val b = "orbital mechanics requires careful numerical integration of " +
      "perturbation forces acting on satellites across many revolutions " +
      "with drag harmonics and third body terms included everywhere"
    val corpus = Map(3L -> aNear, 7L -> b, 10L -> a)

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = graft.streaming.NearDupStream.start(docs, idx, dec, ckpt)
    // the LARGER id arrives first...
    mem.addData((10L, a), (7L, b))
    q.processAllAvailable()
    def decisions() = graft.streaming.NearDupStream.decisionsOf(spark, dec)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ...and is (correctly) kept at that point: nothing smaller collides yet
    assert(decisions() == Map(10L -> 0L, 7L -> 0L))
    // ...then a SMALLER-id near-clone lands in a later batch
    mem.addData((3L, aNear))
    q.processAllAvailable(); q.stop()

    // the batch reference relation on doc_id order, independent of arrival:
    // (3,10) collide => 10 is the dup, 3 is kept
    val pairs = graft.dedup.Dedup.minhashLshOn(
      graft.dedup.Dedup.shingleRowsOf(
        corpus.toSeq.map { case (i, t) => (i, t) }.toDF("doc_id", "text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((3L, 10L)), "test premise: the near pair must collide")
    val expected = corpus.keySet.toSeq.map(d =>
      d -> (if (corpus.keySet.exists(x => x < d && pairs.contains((x, d)))) 1L
            else 0L)).toMap
    assert(decisions() == expected,
      s"correction must flag the earlier larger-id doc: ${decisions()} vs $expected")
    assert(decisions()(10L) == 1L && decisions()(3L) == 0L)
    // the correction row lives in the LATER batch's partition — the earlier
    // partition is never rewritten (crash-replay bit-identity preserved)
    val raw = spark.read.parquet(dec)
      .select(col("doc_id"), col("is_dup"), col("ingest_batch").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(raw.contains((10L, 0L, 0L)) && raw.contains((10L, 1L, 1L)),
      s"append-log shape: original keep + later correction, got $raw")
  }
}
