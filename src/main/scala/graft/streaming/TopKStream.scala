package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters — bounded-memory top-k over an unbounded
  * stream, the live counterpart of the batch `heavy_hitters` query
  * ([[graft.functions.HeavyHitters]], Misra–Gries). Each group key carries
  * the MG counter map (≤ `capacity` entries) plus its observation count as
  * state: O(capacity) memory per group FOREVER, which is the only top-k
  * shape that survives an unbounded item space on a stream (an exact
  * (item, count) state grows with the vocabulary). The MG guarantees carry
  * over unchanged: any item with true frequency > N/capacity is present,
  * and every reported count undercounts by at most N/capacity.
  *
  * The state update is the SAME sequential reduce step the batch
  * Aggregator runs, applied in explicit `seq` order — so a single-ordered
  * replay through the stream leaves counters BIT-IDENTICAL to folding the
  * batch sketch over the concatenated input (the equivalence Round11Spec
  * asserts across micro-batch boundaries).
  *
  * PRECONDITION for that bit-identity (ADVICE r11): observations must
  * reach the operator in seq-CONSISTENT batches — no observation may
  * arrive in a later micro-batch than one with a larger seq. `update()`
  * sorts by seq only WITHIN a batch; `GroupState` cannot reorder across
  * triggers, so a straggler with a smaller seq landing after a larger one
  * is applied out of order and the MG state may diverge from the ordered
  * batch fold (still a valid MG sketch of the multiset — the frequency
  * and undercount guarantees hold regardless — just not bit-identical).
  * Sources that assign seq at ingest (the intended wiring) satisfy this
  * by construction.
  */
object TopKStream {

  /** One observation: `seq` fixes the within-batch apply order (MG is
    * order-dependent; groupByKey shuffles would otherwise make the state
    * depend on partitioning).
    */
  case class Obs(groupKey: String, item: String, seq: Long)

  case class TopK(groupKey: String, item: String, approx_count: Long, n_seen: Long)

  private[graft] case class MgState(counts: Map[String, Long], n: Long)

  /** The Misra–Gries reduce step — mirrors
    * [[graft.functions.HeavyHitters.reduce]] exactly (same decrement-all
    * semantics), so stream state and batch sketch cannot drift.
    */
  private[graft] def mgReduce(b: Map[String, Long], item: String,
                              capacity: Int): Map[String, Long] =
    b.get(item) match {
      case Some(c) => b.updated(item, c + 1L)
      case None if b.size < capacity => b.updated(item, 1L)
      case None => b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
    }

  private[streaming] def update(capacity: Int, k: Int)(
      key: String, obs: Iterator[Obs],
      state: GroupState[MgState]): Iterator[TopK] = {
    var st = state.getOption.getOrElse(MgState(Map.empty, 0L))
    obs.toSeq.sortBy(_.seq).foreach { o =>
      st = MgState(mgReduce(st.counts, o.item, capacity), st.n + 1L)
    }
    state.update(st)
    st.counts.toSeq.sortBy { case (i, c) => (-c, i) }.take(k)
      .map { case (i, c) => TopK(key, i, c, st.n) }.iterator
  }

  /** Wire an observation stream into the sketch. Emits each group's current
    * top-`k` (with its total-seen N, the error-bound denominator) every
    * trigger that touches the group — Update-mode semantics, matching a
    * live "top tokens right now" dashboard.
    */
  def topK(spark: SparkSession, observations: Dataset[_], capacity: Int = 8,
           k: Int = 3): Dataset[TopK] = {
    import spark.implicits._
    observations.toDF()
      .select(col("groupKey").cast("string"), col("item").cast("string"),
        col("seq").cast("long"))
      .as[Obs]
      .groupByKey(_.groupKey)
      .flatMapGroupsWithState[MgState, TopK](
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        update(capacity, k) _)
  }
}
