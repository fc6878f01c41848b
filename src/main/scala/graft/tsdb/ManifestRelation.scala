package graft.tsdb

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Metadata-free scan over a manifest snapshot: the v2 manifest carries
  * every live file's path + size AND the live data schema, so the scan
  * relation is assembled entirely from that one small file — no directory
  * listing, no per-file stat, no parquet footer read. This is the planning
  * half of what a manifest table format buys at 100 TB: against an
  * S3-family store, LIST/HEAD round-trips dominate the cost of planning a
  * 100k-file scan (passing explicit paths to `spark.read.parquet` is WORSE
  * than globbing — Spark stats each path as its own root; measured 10x the
  * glob's planning time on a local FS, more on an object store), while one
  * manifest GET is O(1). Execution is stock Spark: the relation is a plain
  * `HadoopFsRelation` over `ParquetFileFormat`, so whole-stage codegen,
  * vectorized reading, pushed filters and partition pruning (via
  * [[GraftManifestFileIndex.listFiles]]) all apply unchanged.
  *
  * v3 manifests additionally carry a per-file `[min, max]` `time_ms` zone
  * map (collected by one commit-time job — Iceberg's per-file column
  * stats), which [[GraftManifestFileIndex.listFiles]] evaluates against
  * the query's pushed time bounds: a narrow window INSIDE a day bucket
  * skips the bucket's non-overlapping files entirely — driver-side, from
  * manifest metadata alone, before parquet ever sees a footer. Files
  * without stats (v1/v2 lines) are never skipped.
  */
object ManifestRelation {
  /** bucket_day as partition inference would type it (day ordinals fit Int). */
  private val PartitionSchema =
    StructType(Seq(StructField("bucket_day", IntegerType, nullable = false)))

  /** Build the DataFrame for `files` ((relative path, size) pairs under
    * `spaceDir`) with the given data schema JSON — zero metadata calls.
    * `stats` maps a relative path to its `[min, max]` `time_ms` zone map.
    */
  def frame(spark: SparkSession, spaceDir: String,
            files: Seq[(String, Long)], schemaJson: String,
            stats: Map[String, (Long, Long)] = Map.empty,
            dicts: Map[String, Map[String, Seq[String]]] = Map.empty)
      : DataFrame = {
    val dataSchema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val p = new HPath(spaceDir)
    val qBase = p.getFileSystem(spark.sessionState.newHadoopConf()).makeQualified(p)
    val zones = new java.util.HashMap[String, (Long, Long)]()
    val tagDicts = new java.util.HashMap[String, Map[String, Set[String]]]()
    val byDay = files
      .groupBy(_._1.takeWhile(_ != '/').stripPrefix("bucket_day=").toInt)
      .map { case (day, fl) =>
        day -> fl.map { case (rel, size) =>
          // a synthetic status: size from the manifest, mtime/blocksize
          // immaterial (the format splits by maxPartitionBytes)
          val st = new FileStatus(size, false, 1, 128L * 1024 * 1024, 0L,
            new HPath(qBase, rel))
          stats.get(rel).foreach(zones.put(st.getPath.toString, _))
          dicts.get(rel).filter(_.nonEmpty).foreach(d =>
            tagDicts.put(st.getPath.toString,
              d.map { case (c, vs) => c -> vs.toSet }))
          st
        }.toArray
      }
    val idx = new GraftManifestFileIndex(qBase, byDay, PartitionSchema, zones,
      tagDicts)
    val rel = HadoopFsRelation(idx, PartitionSchema, dataSchema, None,
      new ParquetFileFormat, Map.empty[String, String])(spark)
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      LogicalRelation(rel, isStreaming = false))
  }
}

/** A [[FileIndex]] whose listing IS the manifest: one `PartitionDirectory`
  * per bucket day, statuses synthesized from manifest entries. Partition
  * filters are evaluated here (bound by name, the
  * PartitioningAwareFileIndex discipline), so `WHERE bucket_day >= d`
  * prunes buckets exactly as directory-discovered partitioning would —
  * without ever having discovered directories. Data filters on `time_ms`
  * are evaluated against each file's manifest zone map (when present),
  * skipping files whose `[min, max]` range cannot overlap the query
  * window — the within-bucket half of pruning, still metadata-only.
  */
private class GraftManifestFileIndex(base: HPath,
                                     byDay: Map[Int, Array[FileStatus]],
                                     pSchema: StructType,
                                     zones: java.util.Map[String, (Long, Long)],
                                     tagDicts: java.util.Map[String, Map[String, Set[String]]])
    extends FileIndex {
  override def rootPaths: Seq[HPath] = Seq(base)
  override def partitionSchema: StructType = pSchema

  /** The conjunctive `[lo, hiIncl]` window (both bounds INCLUSIVE) the
    * pushed `time_ms` comparisons imply — conservative: only plain
    * attr-vs-literal comparisons narrow the window; anything else leaves
    * it unbounded on that side. The upper bound is tracked inclusively
    * (ADVICE r13): converting `<=` to a half-open bound with +1 saturates
    * at Long.MaxValue, turning `time_ms <= Long.MaxValue` (or `=`) into
    * an exclusive bound that wrongly skips a file whose min time_ms is
    * Long.MaxValue. Strict `<` converts with -1; its underflow at
    * Long.MinValue leaves the bound at MaxValue, which can only KEEP
    * files (conservative, never a wrong skip).
    */
  private def timeBounds(dataFilters: Seq[Expression]): (Long, Long) = {
    var lo = Long.MinValue
    var hiIncl = Long.MaxValue
    def litOf(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, _) => Some(v.toLong)
      case _ => None
    }
    def isTime(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == "time_ms"
      case _ => false
    }
    // strict-bound converters: underflow/overflow saturate OUTWARD (keep
    // more files), never inward
    def ltToIncl(v: Long): Long = if (v == Long.MinValue) Long.MaxValue else v - 1
    def gtToIncl(v: Long): Long = if (v == Long.MaxValue) Long.MinValue else v + 1
    dataFilters.foreach {
      case GreaterThanOrEqual(a, l) if isTime(a) =>
        litOf(l).foreach(v => lo = math.max(lo, v))
      case GreaterThan(a, l) if isTime(a) =>
        litOf(l).foreach(v => lo = math.max(lo, gtToIncl(v)))
      case LessThan(a, l) if isTime(a) =>
        litOf(l).foreach(v => hiIncl = math.min(hiIncl, ltToIncl(v)))
      case LessThanOrEqual(a, l) if isTime(a) =>
        litOf(l).foreach(v => hiIncl = math.min(hiIncl, v))
      case EqualTo(a, l) if isTime(a) =>
        litOf(l).foreach { v => lo = math.max(lo, v); hiIncl = math.min(hiIncl, v) }
      // literal-on-left mirrors
      case GreaterThanOrEqual(l, a) if isTime(a) =>
        litOf(l).foreach(v => hiIncl = math.min(hiIncl, v))
      case GreaterThan(l, a) if isTime(a) =>
        litOf(l).foreach(v => hiIncl = math.min(hiIncl, ltToIncl(v)))
      case LessThan(l, a) if isTime(a) =>
        litOf(l).foreach(v => lo = math.max(lo, gtToIncl(v)))
      case LessThanOrEqual(l, a) if isTime(a) =>
        litOf(l).foreach(v => lo = math.max(lo, v))
      case EqualTo(l, a) if isTime(a) =>
        litOf(l).foreach { v => lo = math.max(lo, v); hiIncl = math.min(hiIncl, v) }
      case _ => ()
    }
    (lo, hiIncl)
  }

  /** Positive string-equality constraints per column from the pushed
    * conjuncts (`EqualTo`/`In`/`InSet` with string literals, either
    * literal side) — per column, the intersection of each conjunct's
    * allowed-value set. Anything else (negations, disjunctions, other
    * types) contributes nothing and never prunes.
    */
  private def tagConstraints(dataFilters: Seq[Expression]): Map[String, Set[String]] = {
    def strLit(e: Expression): Option[String] = e match {
      case Literal(v: UTF8String, StringType) => Some(v.toString)
      case _ => None
    }
    var out = Map.empty[String, Set[String]]
    def add(name: String, vs: Set[String]): Unit =
      out = out.updated(name, out.get(name).map(_ intersect vs).getOrElse(vs))
    // one conjunct's (column, allowed values), when it is a positive
    // string-equality form — including a DISJUNCTION of such forms over
    // the SAME column (how the ES `terms` filter compiles)
    def allowedOf(e: Expression): Option[(String, Set[String])] = e match {
      case EqualTo(a: AttributeReference, l) if strLit(l).isDefined =>
        Some(a.name -> Set(strLit(l).get))
      case EqualTo(l, a: AttributeReference) if strLit(l).isDefined =>
        Some(a.name -> Set(strLit(l).get))
      case In(a: AttributeReference, list)
          if list.nonEmpty && list.forall(strLit(_).isDefined) =>
        Some(a.name -> list.flatMap(strLit).toSet)
      case InSet(a: AttributeReference, hset)
          if hset.nonEmpty && hset.forall(_.isInstanceOf[UTF8String]) =>
        Some(a.name -> hset.map(_.asInstanceOf[UTF8String].toString))
      case org.apache.spark.sql.catalyst.expressions.Or(l, r) =>
        (allowedOf(l), allowedOf(r)) match {
          case (Some((cl, vl)), Some((cr, vr))) if cl == cr =>
            Some(cl -> (vl ++ vr))
          case _ => None
        }
      case _ => None
    }
    dataFilters.foreach(e => allowedOf(e).foreach { case (c, vs) => add(c, vs) })
    out
  }

  /** Positive prefix constraints per column from the pushed conjuncts —
    * one entry per CONJUNCT: `(column, allowed prefixes)`, satisfied when
    * some dictionary value starts with any of the prefixes. Extraction is
    * deliberately minimal (r14 directive #8): `StartsWith` with a literal
    * prefix, possibly OR-ed over the SAME column (how the ES `prefix`
    * filter inside a `should` compiles) — never negations, never other
    * string predicates (`Not(StartsWith)` / contains / regex contribute
    * nothing and never prune). Kept as a per-conjunct list rather than
    * intersected like the equality sets: two prefix conjuncts on one
    * column must BOTH be witnessed, and prefix sets have no closed-form
    * intersection.
    */
  private def prefixConstraints(dataFilters: Seq[Expression])
      : Seq[(String, Set[String])] = {
    def strLit(e: Expression): Option[String] = e match {
      case Literal(v: UTF8String, StringType) => Some(v.toString)
      case _ => None
    }
    def prefixOf(e: Expression): Option[(String, Set[String])] = e match {
      case org.apache.spark.sql.catalyst.expressions.StartsWith(
          a: AttributeReference, l) if strLit(l).isDefined =>
        Some(a.name -> Set(strLit(l).get))
      case org.apache.spark.sql.catalyst.expressions.Or(l, r) =>
        (prefixOf(l), prefixOf(r)) match {
          case (Some((cl, vl)), Some((cr, vr))) if cl == cr =>
            Some(cl -> (vl ++ vr))
          case _ => None
        }
      case _ => None
    }
    dataFilters.flatMap(prefixOf)
  }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val (lo, hiIncl) = timeBounds(dataFilters)
    val cons = tagConstraints(dataFilters)
    val pfx = prefixConstraints(dataFilters)
    def live(st: FileStatus): Boolean = (zones.get(st.getPath.toString) match {
      case null => true // no zone map recorded: never skip
      case (mn, mx) => mx >= lo && mn <= hiIncl
    }) && (tagDicts.get(st.getPath.toString) match {
      case null => true // no dictionary recorded: never skip
      case d => cons.forall { case (cName, allowed) =>
        d.get(cName) match {
          case Some(vals) => allowed.exists(vals.contains)
          case None => true // column over the cap (or absent): unknown set
        }
      } && pfx.forall { case (cName, prefixes) =>
        d.get(cName) match {
          case Some(vals) => vals.exists(v => prefixes.exists(v.startsWith))
          case None => true // column over the cap (or absent): unknown set
        }
      }
    })
    val unconstrained =
      lo == Long.MinValue && hiIncl == Long.MaxValue && cons.isEmpty && pfx.isEmpty
    val dirs = byDay.toSeq.sortBy(_._1)
      .map { case (day, sts) =>
        val kept = if (unconstrained) sts else sts.filter(live)
        PartitionDirectory(InternalRow(day), kept)
      }
      .filter(_.files.nonEmpty)
    if (partitionFilters.isEmpty) dirs
    else {
      val bound = partitionFilters.reduce(And).transform {
        case a: AttributeReference =>
          val i = pSchema.indexWhere(_.name == a.name)
          BoundReference(i, pSchema(i).dataType, nullable = true)
      }
      val pred = Predicate.createInterpreted(bound)
      dirs.filter(d => pred.eval(d.values))
    }
  }

  override def inputFiles: Array[String] =
    byDay.values.flatten.map(_.getPath.toString).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = byDay.values.flatten.map(_.getLen).sum
}
