package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** One heavy-hitter estimate: item and its Misra–Gries count (an
  * undercount of the true frequency by at most N/capacity).
  */
case class HHEntry(item: String, approx_count: Long)

/** Misra–Gries heavy hitters as a custom typed Aggregator — the mergeable
  * bounded-memory frequency sketch (Agarwal et al., "Mergeable Summaries",
  * PODS '12). Every partition keeps at most `capacity` counters regardless
  * of cardinality; partial buffers merge associatively, so the whole corpus
  * reduces map-side like any algebraic aggregate. Guarantees: any item with
  * true frequency > N/capacity survives to the output, and each reported
  * count is within N/capacity of the true frequency (never above it).
  *
  * This is the 100 TB answer to "top tokens" when an exact (token, count)
  * shuffle (see `text_bigrams`) would move the whole vocabulary; the sketch
  * moves `capacity` counters per partition instead. Counts depend on
  * encounter order ⇒ verified rows-only, with the guarantee asserted in
  * ScalaTest against exact counts.
  */
class HeavyHitters(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[HHEntry]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    b.get(item) match {
      case Some(c) => b.updated(item, c + 1L)
      case None if b.size < capacity => b.updated(item, 1L)
      case None => // decrement-all step: no counter hits zero silently grows
        b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (summed.size <= capacity) summed
    else {
      // subtract the (capacity+1)-th largest count from everything — the
      // mergeable-summaries reduction that preserves the error bound
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      summed.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
    }
  }

  override def finish(b: Map[String, Long]): Seq[HHEntry] =
    b.toSeq.sortBy { case (item, c) => (-c, item) }
      .take(capacity)
      .map { case (item, c) => HHEntry(item, c) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[HHEntry]] =
    ExpressionEncoder[Seq[HHEntry]]()
}
