package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextOps
import graft.tsdb.Graft

/** The CDC consumer: incremental maintenance of the series-retrieval
  * (BM25) index driven by [[Graft.changes]] — the loop the store-level
  * change feed exists for. The reference keeps its series-metadata search
  * fresh because every write goes through Elasticsearch
  * (lib/orestes/index.js posts each new series to ES); graft's analogue
  * is a persisted index over the series tag bags that a maintenance
  * sweep advances from one committed snapshot to the next, paying only
  * for what changed.
  *
  * Contract: after `sync`, [[search]] over the index is rank- and
  * score-identical to [[graft.tsdb.Tsdb.searchSeries]] scanning the
  * store directly, and to an index rebuilt from scratch at the same
  * snapshot — proven row for row in the spec. One scoring rule serves
  * all surfaces ([[IndexStream.searchOn]]: corpus stats derived at query
  * time, the shared 6-decimal rounding and `score > 0` inclusion).
  *
  * Incremental cost model (the 100 TB story): `sync` reads ONLY the
  * change feed — [[Graft.changes]] skips bucket days whose immutable
  * segment reference is identical in both snapshots, so a sync after a
  * one-bucket append diffs one bucket, and a sync across a pure
  * compaction reads nothing and writes nothing (spec-proven no-op).
  * Series liveness is tracked in the index itself as a point-count
  * ledger (`counts/`: one (doc_id, delta) row per touched series per
  * sync), so deciding whether a removal killed its series never rescans
  * the store. Postings/doclen are written once per series ever seen;
  * a series whose count returns above zero resurrects with no rewrite.
  * The ledger grows one row per TOUCHED series per sync — series-metadata
  * scale, folded back to one row per series by the next [[build]]
  * (a rebuild IS the ledger fold, run like compaction: offline
  * maintenance, while `sync` is the online path).
  *
  * Layout is [[IndexStream]]'s (postings term-hash-bucketed so a query
  * prunes to its terms' buckets) plus the counts ledger, all partitioned
  * by `ingest_batch` = the store snapshot seq the batch lands. Commit
  * point: a `_sync/snap_<seq>` marker created AFTER the batch's data —
  * readers take `committedSnap` (the max marker) and filter every read
  * to `ingest_batch <= committed`, so a crashed half-written sync is
  * invisible; the next sync deletes leftover partitions above the
  * marker and re-lands the batch bit-identically (the
  * [[DedupStream]]/[[QualityStream]] replay discipline).
  */
object CdcIndexSync {

  private val MatchAll = """{"match_all":{}}"""

  private def fsOf(s: SparkSession, p: String): (FileSystem, HPath) = {
    val hp = new HPath(p)
    (hp.getFileSystem(s.sparkContext.hadoopConfiguration), hp)
  }

  /** The snapshot seq the index is committed at: the highest `_sync`
    * marker, or None for an unbuilt index. */
  def committedSnap(s: SparkSession, indexDir: String): Option[Long] = {
    val (fs, dir) = fsOf(s, s"$indexDir/_sync")
    if (!fs.exists(dir)) None
    else {
      val seqs = fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("snap_")).map(_.stripPrefix("snap_").toLong)
      if (seqs.isEmpty) None else Some(seqs.max)
    }
  }

  /** Markers are create-only (never overwritten): data first, marker
    * last, so the marker's existence proves its batch landed whole. */
  private def markCommitted(s: SparkSession, indexDir: String,
                            snap: Long): Unit = {
    val (fs, dir) = fsOf(s, s"$indexDir/_sync")
    fs.mkdirs(dir)
    val out = fs.create(new HPath(dir, s"snap_$snap"), false)
    out.close()
  }

  /** The tag columns of a points/changes frame, sorted — the ONE column
    * order both doc_id and text use, matching Tsdb.searchSeries. */
  private def tagColsOf(d: DataFrame, extra: Set[String]): Seq[String] =
    d.columns.filterNot(extra).sorted.toSeq

  private def docIdCol(tagCols: Seq[String]): Column =
    concat_ws("\u0001",
      tagCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)

  private def textCol(tagCols: Seq[String]): Column =
    concat_ws(" ",
      tagCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)

  private def tagsFile(indexDir: String) = s"$indexDir/_sync/tags"

  private def writeTags(s: SparkSession, indexDir: String,
                        tagCols: Seq[String]): Unit = {
    val (fs, _) = fsOf(s, indexDir)
    val out = fs.create(new HPath(tagsFile(indexDir)), true)
    out.write(tagCols.mkString("\n").getBytes("UTF-8"))
    out.close()
  }

  /** The tag-column names (sorted) the index's doc identity was built
    * from — `search`'s doc_id splits back into values in THIS order. */
  def tags(s: SparkSession, indexDir: String): Seq[String] =
    readTags(s, indexDir)

  private def readTags(s: SparkSession, indexDir: String): Seq[String] = {
    val (fs, _) = fsOf(s, indexDir)
    val in = fs.open(new HPath(tagsFile(indexDir)))
    val body = new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    in.close()
    body.split('\n').toSeq.filter(_.nonEmpty)
  }

  /** The daemon entry point: [[build]] on first touch, [[sync]] after —
    * one call a standing maintenance sweep can make unconditionally. */
  def syncOrBuild(g: Graft, indexDir: String,
                  space: String = "default"): Long = {
    val s = org.apache.spark.sql.SparkSession.active
    if (committedSnap(s, indexDir).isEmpty) build(g, indexDir, space)
    else sync(g, indexDir, space)
  }

  /** Tokenize docs `(doc_id, text)` and land postings + doclen for them,
    * and the count ledger rows, all under `ingest_batch = snap` with
    * dynamic partition overwrite (replay rewrites, never duplicates). */
  private def landBatch(indexDir: String, snap: Long,
                        newDocs: DataFrame, deltas: DataFrame): Unit = {
    val tok = newDocs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .where(col("tok") =!= "")
      .localCheckpoint(true) // one tokenize feeds postings AND lengths
    tok.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      // the ONE term-hash rule (IndexStream owns it next to its driver
      // twin bucketIdOf): an inline copy could drift and make search read
      // the wrong partitions, silently losing postings
      .withColumn("bucket", IndexStream.bucketCol(col("tok")))
      .withColumn("ingest_batch", lit(snap))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket", "ingest_batch")
      .parquet(s"$indexDir/postings")
    tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      .withColumn("ingest_batch", lit(snap))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch")
      .parquet(s"$indexDir/doclen")
    deltas.select(col("doc_id"), col("delta").cast("long"))
      .withColumn("ingest_batch", lit(snap))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch")
      .parquet(s"$indexDir/counts")
  }

  /** Full (re)build at the store's current committed snapshot: the
    * offline path — one scan of the store, postings/doclen for every
    * live series, the ledger folded to one exact point count per series.
    * Wipes any prior index state first (a rebuild supersedes the whole
    * history, including dead series' postings and ledger rows).
    * Returns the snapshot the index now reflects.
    */
  def build(g: Graft, indexDir: String, space: String = "default"): Long = {
    val snaps = g.snapshots(space)
    if (snaps.isEmpty) throw new IllegalStateException(
      s"no committed snapshots in space '$space' — the index needs a " +
        "manifest-mode store with at least one write (plain-mode stores " +
        "have no snapshots to sync against)")
    val snap = snaps.max
    val pts = g.readAt(snap, MatchAll, space)
    val s = pts.sparkSession
    val (fs, dir) = fsOf(s, indexDir)
    if (fs.exists(dir)) fs.delete(dir, true)
    val tagCols = tagColsOf(pts, Set("time_ms", "value"))
    val withId = pts.withColumn("doc_id", docIdCol(tagCols))
    val deltas = withId.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("delta"))
    val docs = withId
      .select(col("doc_id"), textCol(tagCols).as("text")).distinct()
    landBatch(indexDir, snap, docs, deltas)
    writeTags(s, indexDir, tagCols)
    markCommitted(s, indexDir, snap)
    snap
  }

  /** Delete data partitions above the committed marker — a crashed
    * sync's leftovers, which would otherwise become visible the moment
    * a LATER marker lands. */
  private def cleanupAbove(s: SparkSession, indexDir: String,
                           committed: Long): Unit = {
    val (fs, _) = fsOf(s, indexDir)
    def sweep(p: HPath): Unit = if (fs.exists(p))
      fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory) {
          if (n.startsWith("ingest_batch=") &&
            n.stripPrefix("ingest_batch=").toLong > committed)
            fs.delete(st.getPath, true)
          else if (n.startsWith("bucket=")) sweep(st.getPath)
        }
      }
    Seq("postings", "doclen", "counts")
      .foreach(d => sweep(new HPath(s"$indexDir/$d")))
  }

  /** Advance the index from its committed snapshot to the store's
    * current one, reading only the change feed. New series land postings
    * + doclen; every touched series lands a point-count delta; a series
    * whose count reaches zero stops matching (and resurrects for free if
    * points return). If the store's tag schema evolved (a new tag column
    * appeared), the per-column doc identity of every existing doc shifts,
    * so the index falls back to [[build]] — incremental maintenance is
    * only sound while doc identity is stable. Returns the snapshot the
    * index now reflects (a no-op when already current).
    */
  def sync(g: Graft, indexDir: String, space: String = "default"): Long = {
    val s = org.apache.spark.sql.SparkSession.active
    val from = committedSnap(s, indexDir).getOrElse(
      throw new IllegalStateException(
        s"no committed index at $indexDir — run build first"))
    val snaps = g.snapshots(space)
    if (snaps.isEmpty) throw new IllegalStateException(
      s"space '$space' has no committed snapshots but the index claims " +
        s"snapshot $from — the index was built against a different store")
    val to = snaps.max
    if (to == from) return from
    // two no-diff-exists states, both resolved by the full rebuild (a
    // consumer whose checkpoint was truncated rereads from scratch):
    // vacuum expired the index's base snapshot, or the store's history
    // RESTARTED below it (space wiped and re-created — the maintenance
    // sweep must recover, not wedge every later space's pass)
    if (to < from || !snaps.contains(from)) return build(g, indexDir, space)
    cleanupAbove(s, indexDir, from)
    val ch = g.changes(from, to, space)
    val tagCols = tagColsOf(ch,
      Set("time_ms", "old_value", "new_value", "change"))
    if (tagCols != readTags(s, indexDir)) return build(g, indexDir, space)
    val touched = ch.where(col("change") =!= "changed")
      .withColumn("doc_id", docIdCol(tagCols))
      .withColumn("text", textCol(tagCols))
    val deltas = touched.groupBy(col("doc_id"))
      .agg(sum(when(col("change") === "added", 1L).otherwise(-1L))
        .as("delta"),
        first(col("text")).as("text"))
      .where(col("delta") =!= 0L)
      .localCheckpoint(true) // feeds the ledger write AND new-doc probe
    if (deltas.isEmpty) { // pure physical rewrite: nothing to land
      markCommitted(s, indexDir, to)
      return to
    }
    // a doc the index has EVER seen keeps its postings (dead or alive —
    // resurrection is a ledger flip); only never-seen docs index anew
    val known = s.read.parquet(s"$indexDir/counts")
      .where(col("ingest_batch") <= from).select("doc_id").distinct()
    val newDocs = deltas.where(col("delta") > 0)
      .join(known, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("text"))
    landBatch(indexDir, to, newDocs, deltas.select("doc_id", "delta"))
    markCommitted(s, indexDir, to)
    to
  }

  /** BM25 top-k over the synced index: postings restricted to the query
    * terms' hash buckets, docs restricted to series whose ledger sum is
    * positive at the committed snapshot, scored by the shared rule
    * ([[IndexStream.searchOn]]). Matches [[graft.tsdb.Tsdb.searchSeries]]
    * row for row; `doc_id` is the \u0001-joined tag string.
    */
  def search(s: SparkSession, indexDir: String, query0: Seq[String],
             k: Int = 20, committedAt: Option[Long] = None): DataFrame = {
    // committedAt: a caller that already resolved the marker (the facade's
    // per-request cache) passes it to skip this listing on the hot path
    val committed = committedAt.orElse(committedSnap(s, indexDir)).getOrElse(
      throw new IllegalStateException(
        s"no committed index at $indexDir — run build first"))
    val query = query0.distinct
    val alive = s.read.parquet(s"$indexDir/counts")
      .where(col("ingest_batch") <= committed)
      .groupBy(col("doc_id")).agg(sum(col("delta")).as("npoints"))
      .where(col("npoints") > 0).select("doc_id")
    val dl = s.read.parquet(s"$indexDir/doclen")
      .where(col("ingest_batch") <= committed)
      .select(col("doc_id"), col("dl"))
      .join(alive, "doc_id")
    val buckets = query.map(IndexStream.bucketIdOf).distinct
    val post = s.read.parquet(s"$indexDir/postings")
      .where(col("ingest_batch") <= committed &&
        col("bucket").isin(buckets: _*) && col("tok").isin(query: _*))
      .join(alive, "doc_id")
    IndexStream.searchOn(post, dl, query, k)
  }
}
