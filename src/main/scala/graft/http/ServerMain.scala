package graft.http

import org.apache.spark.sql.SparkSession
import graft.tsdb.Graft

/** Boot the facade the way the reference boots (`node orestes.js` reads
  * conf/orestes-config.json at startup — orestes.js:62 — and listens on its
  * configured port): one command, a config file, a store root.
  *
  * `runMain graft.http.ServerMain [configPath] [storeRoot]`
  *  - configPath defaults to the reference's own conf/orestes-config.json
  *    (cassandra/elasticsearch blocks are accepted-and-ignored, so a
  *    reference operator's existing file boots unchanged); a missing file
  *    boots the defaults (port 9668, 7-day buckets) with a notice.
  *  - storeRoot defaults to ./graft-data (any Hadoop-FS URI works —
  *    file:/hdfs:/s3a:).
  *
  * A per-space `keep_days` in the config turns on the retention daemon:
  * the sweep the reference runs per `/delete` request
  * (orestes-remover.js:16-39) runs here on a timer, hourly, so configured
  * retention is a standing policy rather than a client obligation.
  *
  * Since r14 two more operational defaults ride the boot:
  *  - the store boots in MANIFEST mode unless the config says
  *    `"manifest_snapshots": false` (bootstrapManifest adopts an existing
  *    plain store on first touch, so the flip is migration-free; plain
  *    mode remains the documented fallback — see README);
  *  - a standing COMPACTION daemon sweeps every `compaction_sweep_minutes`
  *    (default 60; <= 0 disables): any space whose fragmentation report
  *    shows a bucket past `compaction_max_files` (default 8) or still
  *    carrying write-sequence stamps is compacted — the maintenance the
  *    reference delegates to Cassandra's SSTable compaction, as a policy
  *    instead of an operator chore. Each sweep then vacuums every space
  *    down to `vacuum_keep_snapshots` (default 2; <= 0 disables the
  *    vacuum half): manifest-mode compaction/retention are metadata-only,
  *    so the daemon owns physical reclaim too — bounded disk is a boot
  *    default, not an operator chore; the orphan grace window keeps the
  *    sweep safe against other processes' in-flight commits.
  */
object ServerMain {
  /** Wire config -> store -> server (the testable core of the boot).
    * Returns the parsed Config too — the daemons read the SAME parse the
    * store booted from, so the two can never drift (code review r14). */
  def boot(spark: SparkSession, configPath: String,
           root: String): (Graft, GraftHttpServer, Graft.Config) = {
    val cfg =
      try Graft.loadConfig(spark, configPath)
      catch {
        case _: java.io.FileNotFoundException =>
          System.err.println(s"[graft] no config at $configPath — booting defaults")
          Graft.Config(Graft.DefaultPort, Map.empty)
      }
    val store = new Graft(spark, root,
      granularityDays = cfg.spaceGranularity.getOrElse("default",
        _root_.graft.tsdb.Tsdb.GranularityDays),
      spaceGranularity = cfg.spaceGranularity,
      spaceKeepDays = cfg.spaceKeepDays,
      manifest = cfg.manifestSnapshots)
    // `search_index` (manifest mode only): /search serves from the
    // CDC-maintained series index under the store root, synced by the
    // maintenance sweep — the reference's ES architecture (search hits an
    // index, not the store), traded opt-in for /search freshness
    val idxBase =
      if (cfg.searchIndex && cfg.manifestSnapshots)
        Some(s"$root/.search-index")
      else None
    (store, new GraftHttpServer(store, spark, port = cfg.port,
      continuousIngest = cfg.continuousIngest, searchIndexDir = idxBase), cfg)
  }

  /** One maintenance pass over every space's search index (build on first
    * touch, CDC sync after) — called by the standing sweep and by specs. */
  def searchIndexSweep(g: Graft, idxBase: String): Unit =
    g.spaces().foreach { sp =>
      _root_.graft.streaming.CdcIndexSync.syncOrBuild(g, s"$idxBase/$sp", sp)
    }

  def main(args: Array[String]): Unit = {
    val configPath = args.lift(0).getOrElse("conf/orestes-config.json")
    val root = args.lift(1).getOrElse("graft-data")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .appName("graft-server")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (g, srv, cfgForDaemons) = boot(spark, configPath, root)
    val port = srv.start()
    println(s"graft serving on 127.0.0.1:$port, store at $root")
    // configured retention becomes a standing hourly sweep
    val sweeper =
      if (gKeepDays(g).nonEmpty) {
        val ex = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
          r => { val t = new Thread(r, "graft-retention"); t.setDaemon(true); t })
        ex.scheduleAtFixedRate(() =>
          try {
            val dropped = g.retentionSweep()
            dropped.filter(_._2.nonEmpty).foreach { case (sp, days) =>
              println(s"[graft] retention dropped buckets $days from $sp") }
          } catch { case e: Throwable =>
            System.err.println(s"[graft] retention sweep failed: ${e.getMessage}") },
          1, 60, java.util.concurrent.TimeUnit.MINUTES)
        Some(ex)
      } else None
    // the compaction half (r14): a standing sweep that converges
    // fragmented buckets to the target file count and retires merge
    // stamps, on the same mutation lock every write takes — readers
    // never see it (manifest mode) or retry by contract (plain mode)
    val compactor =
      if (cfgForDaemons.compactionSweepMinutes > 0) {
        val mins = cfgForDaemons.compactionSweepMinutes.toLong
        val ex = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
          r => { val t = new Thread(r, "graft-compaction"); t.setDaemon(true); t })
        ex.scheduleAtFixedRate(() =>
          try {
            val done = g.compactionSweep(cfgForDaemons.compactionMaxFiles)
            done.foreach { case (sp, swaps) =>
              println(s"[graft] compacted $sp: " + swaps.map { case (d, b, a) =>
                s"day $d $b->$a files" }.mkString(", ")) }
            // the physical-reclaim half (code review r14): in manifest
            // mode compaction and retention are metadata-only, so a
            // served store must also vacuum or disk grows without bound.
            // The default orphan grace keeps this safe against another
            // process's in-flight commits.
            // the served search index rides the same sweep (its staleness
            // bound IS the sweep cadence). Runs BEFORE vacuum: sync diffs
            // from the index's committed snapshot, which an hour of writes
            // plus vacuum's keep-newest-N would otherwise have expired —
            // after sync the index sits at the newest snapshot, which
            // vacuum always keeps (and if an operator vacuumed past the
            // index out-of-band, sync falls back to a rebuild)
            if (cfgForDaemons.searchIndex && cfgForDaemons.manifestSnapshots)
              searchIndexSweep(g, s"$root/.search-index")
            if (cfgForDaemons.manifestSnapshots &&
                cfgForDaemons.vacuumKeepSnapshots > 0)
              g.spaces().foreach { sp =>
                val freed = g.vacuum(sp, cfgForDaemons.vacuumKeepSnapshots)
                if (freed.nonEmpty)
                  println(s"[graft] vacuum reclaimed ${freed.size} files from $sp")
              }
          } catch { case e: Throwable =>
            System.err.println(s"[graft] compaction sweep failed: ${e.getMessage}") },
          mins, mins, java.util.concurrent.TimeUnit.MINUTES)
        Some(ex)
      } else None
    sys.addShutdownHook {
      sweeper.foreach(_.shutdownNow())
      compactor.foreach(_.shutdownNow())
      srv.stop() // flushes queued writes
      g.stopContinuous() // loss-free: uncommitted spool files replay on boot
      spark.stop()
    }
    Thread.currentThread().join() // serve until killed
  }

  private def gKeepDays(g: Graft): Map[String, Int] = g.configuredKeepDays
}
