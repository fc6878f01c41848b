package graft.tsdb

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}

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
  */
object ManifestRelation {
  /** bucket_day as partition inference would type it (day ordinals fit Int). */
  private val PartitionSchema =
    StructType(Seq(StructField("bucket_day", IntegerType, nullable = false)))

  /** Build the DataFrame for `files` ((relative path, size) pairs under
    * `spaceDir`) with the given data schema JSON — zero metadata calls.
    */
  def frame(spark: SparkSession, spaceDir: String,
            files: Seq[(String, Long)], schemaJson: String): DataFrame = {
    val dataSchema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val p = new HPath(spaceDir)
    val qBase = p.getFileSystem(spark.sessionState.newHadoopConf()).makeQualified(p)
    val byDay = files
      .groupBy(_._1.takeWhile(_ != '/').stripPrefix("bucket_day=").toInt)
      .map { case (day, fl) =>
        day -> fl.map { case (rel, size) =>
          // a synthetic status: size from the manifest, mtime/blocksize
          // immaterial (the format splits by maxPartitionBytes)
          new FileStatus(size, false, 1, 128L * 1024 * 1024, 0L,
            new HPath(qBase, rel))
        }.toArray
      }
    val idx = new GraftManifestFileIndex(qBase, byDay, PartitionSchema)
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
  * without ever having discovered directories.
  */
private class GraftManifestFileIndex(base: HPath,
                                     byDay: Map[Int, Array[FileStatus]],
                                     pSchema: StructType) extends FileIndex {
  override def rootPaths: Seq[HPath] = Seq(base)
  override def partitionSchema: StructType = pSchema

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val dirs = byDay.toSeq.sortBy(_._1)
      .map { case (day, sts) => PartitionDirectory(InternalRow(day), sts) }
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
