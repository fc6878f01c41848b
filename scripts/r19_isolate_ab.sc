// Isolating A/B for the two r18 rewrites VERDICT r18 #5 flagged as
// bench-unproven: q20_promo_suppliers (window-over-partials vs the r17
// aggregate-then-rejoin) and text_lm_score (memoized bigrams/probs vs the
// r17 three-pass shape). Both variants run INTERLEAVED in ONE session with
// untouched sentinels, N passes, min per variant — box drift lands on both
// equally. Run via spark-shell -I (same confs as r19_plans.sc).
// NOTE -I line mode: no blank lines inside expressions.
spark.sparkContext.setLogLevel("ERROR")
import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Det, Tables}
val d = sys.env.getOrElse("R19_SF", "/root/testdata/sf0.1")
graft.core.Tables.names.foreach { t =>
  try spark.read.parquet(s"$d/$t.parquet").count() catch { case _: Throwable => () }
}
def q20Old(): DataFrame = {
  val promo = Tables.part(spark, d).where(col("p_type") === "PROMO").select("p_partkey")
  val li = Tables.lineitem(spark, d)
    .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
    .select("l_partkey", "l_suppkey", "l_quantity")
  val perSup = li.groupBy(col("l_partkey"), col("l_suppkey"))
    .agg(round(Det.dsum(col("l_quantity")), 2).as("sup_qty"))
  val perPart = li.groupBy(col("l_partkey").as("t_partkey"))
    .agg(round(Det.dsum(col("l_quantity")), 2).as("tot_qty"))
  val heavy = perSup.join(perPart, col("l_partkey") === col("t_partkey"))
    .where(col("sup_qty") > col("tot_qty") * lit(0.2))
    .select(col("l_suppkey")).distinct()
  val out = Tables.supplier(spark, d)
    .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
    .join(broadcast(Tables.nation(spark, d)), col("s_nationkey") === col("n_nationkey"))
    .groupBy(col("n_name"))
    .agg(count(lit(1)).as("n_suppliers"))
  Det.ordered(out)
}
def lmOld(): DataFrame = {
  val toks = Tables.documents(spark, d).select(col("doc_id"), graft.text.TextOps.tokens(col("text")).as("toks"))
  val big = toks.where(size(col("toks")) >= 2)
    .select(col("doc_id"),
      explode(expr("transform(sequence(1, size(toks)-1), " +
        "i -> struct(element_at(toks, i) AS w1, element_at(toks, i+1) AS w2))")).as("bg"))
    .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  val cb2 = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
  val cb1 = big.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
  val probs = cb2.join(cb1, "w1")
    .select(col("w1"), col("w2"),
      Det.rnd(col("c2") * lit(1.0) / col("c1"), 8).cast("decimal(12,8)").as("p"))
  val out = big.join(probs, Seq("w1", "w2"))
    .groupBy(col("doc_id"))
    .agg(count(lit(1)).as("n_bigrams"),
      Det.rnd(sum(col("p")).cast("double") / count(lit(1)), 6).as("avg_p"))
  Det.ordered(out)
}
val variants: Seq[(String, () => DataFrame)] = Seq(
  ("q20_old", () => q20Old()),
  ("q20_new", () => graft.SparkEntry.queries("q20_promo_suppliers")(spark, d)),
  ("lm_old", () => lmOld()),
  ("lm_new", () => graft.SparkEntry.queries("text_lm_score")(spark, d)),
  ("sent_ts_read", () => graft.SparkEntry.queries("ts_read")(spark, d)),
  ("sent_minhash", () => graft.SparkEntry.queries("dedup_minhash")(spark, d)))
val samples = scala.collection.mutable.Map[String, List[Double]]()
for (p <- 1 to 4) {
  System.gc(); Thread.sleep(1000)
  variants.foreach { case (name, fn) =>
    val t0 = System.nanoTime()
    try { fn().count() } catch { case e: Throwable => println(s"[ab-err] $name ${e.getMessage.take(120)}") }
    val dt = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    samples.put(name, samples.getOrElse(name, Nil) :+ dt)
  }
}
samples.toSeq.sortBy(_._1).foreach { case (n, xs) =>
  println(f"[ab] $n%-14s min=${xs.min}%6.3f samples=${xs.map(x => f"$x%.3f").mkString(",")}")
}
println("AB_DONE")
