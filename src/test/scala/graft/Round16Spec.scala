package graft

import java.nio.file.{Files, Paths}
import org.apache.hadoop.fs.{Path => HPath}
import graft.streaming.{CdcIndexSync, CdcStream}
import graft.tsdb.Graft

/** Round-16 directives: the CDC-index markers ride the store's claim
  * toolkit (VERDICT r15 #3 — an index on an unknown object store refuses
  * loudly instead of silently racing), the fold marker is crash-atomic
  * and a pre-fix empty marker resolves to the committed generation below
  * (ADVICE r15 high), concurrent late-landings of one batch serialize
  * under the per-(generation, batch) land claim (ADVICE r15 medium), and
  * two CdcStream consumers sharing a stateDir race benignly (VERDICT r15
  * #7).
  */
class Round16Spec extends SparkTestBase {
  import spark.implicits._

  private val MatchAll = """{"match_all":{}}"""

  private def freshRoot(tag: String) =
    Files.createTempDirectory(Paths.get("target"), tag)
      .toAbsolutePath.toString

  private def indexed(dir: String, terms: Seq[String], k: Int = 20): Seq[(String, Double)] =
    CdcIndexSync.search(spark, dir, terms, k).collect().toSeq
      .map(r => (r.getAs[String]("doc_id"), r.getAs[Double]("score")))

  private def fsAt(p: String) =
    new HPath(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // --------------------------------------------------------------------
  // Directive #3: index markers through the store's claim primitive
  // --------------------------------------------------------------------

  test("index markers ride the claim toolkit: auto REFUSES an object-store scheme for build/sync/fold, create-exclusive folds and loses races cleanly (r16 #3)") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.mocks3.impl", classOf[MockS3Fs].getName)

    // (a) a consumer-state/index marker dir on an unknown scheme refuses
    // loudly at the COMMIT, naming the config key — CdcStream.commit is
    // the one funnel every index/consumer marker goes through
    val ex = intercept[IllegalStateException] {
      CdcStream.commit(spark, s"mocks3:${freshRoot("graft-r16a")}", 1L)
    }
    assert(ex.getMessage.contains("commit_primitive"), ex.getMessage)
    assert(ex.getMessage.contains("mocks3"), ex.getMessage)

    // (b) a store configured create-exclusive hands the SAME setting to
    // its index: build + sync + fold all commit their markers on the
    // object-store scheme, and search parity holds across the fold
    val root = s"mocks3:${freshRoot("graft-r16b")}"
    val g = new Graft(spark, root, manifest = true,
      commitPrimitive = Graft.PrimCreateExclusive)
    def w(rows: (String, Double, String, String)*) =
      g.write(rows.toSeq.toDF("time", "value", "name", "host"))
    val dir = s"$root/index"
    w(("2024-01-09T10:00:00Z", 1.0, "cpu", "web-01"))
    CdcIndexSync.build(g, dir)
    w(("2024-01-10T10:00:00Z", 2.0, "mem", "db-01"))
    CdcIndexSync.sync(g, dir)
    w(("2024-01-11T10:00:00Z", 3.0, "gpu", "ml-01"))
    CdcIndexSync.sync(g, dir)
    assert(CdcIndexSync.ledgerBatches(spark, dir) >= 2)
    val before = indexed(dir, Seq("cpu", "db-01"))
    assert(before.nonEmpty)

    // fold with auto on mocks3: refused BEFORE any staging work
    val exF = intercept[IllegalStateException] {
      CdcIndexSync.compactIndex(spark, dir)
    }
    assert(exF.getMessage.contains("commit_primitive"), exF.getMessage)
    assert(exF.getMessage.contains("fold marker"), exF.getMessage)

    // fold with the store's configured primitive: commits, parity holds
    val gen = CdcIndexSync.compactIndex(spark, dir, g.configuredClaim)
    assert(gen == 1L)
    assert(indexed(dir, Seq("cpu", "db-01")) == before,
      "search must be rank/score-identical across the object-store fold")

    // (c) the claim-race loser: a concurrent folder lands fold_2 INSIDE
    // this attempt's commit window (the hook runs after staging, before
    // the claim — the real race, made deterministic); this attempt must
    // LOSE the create-exclusive claim, keep the winner's marker, and
    // delete only its own staging
    w(("2024-01-12T10:00:00Z", 4.0, "net", "edge-01"))
    CdcIndexSync.sync(g, dir)
    w(("2024-01-13T10:00:00Z", 5.0, "disk", "db-02"))
    CdcIndexSync.sync(g, dir)
    val fs = fsAt(root)
    val winnerStage = "g2-winnerstage"
    CdcIndexSync.foldCommitHook = () => {
      fs.mkdirs(new HPath(s"$dir/$winnerStage"))
      assert(Graft.claimAt(fs, new HPath(s"$dir/_sync/fold_2"), winnerStage,
        Graft.PrimCreateExclusive))
    }
    val genLost =
      try CdcIndexSync.compactIndex(spark, dir, g.configuredClaim)
      finally CdcIndexSync.foldCommitHook = () => ()
    assert(genLost == 1L, "a lost fold claim returns the old generation")
    val leftover = fs.listStatus(new HPath(dir)).map(_.getPath.getName)
      .filter(n => n.startsWith("g2-") && n != winnerStage)
    assert(leftover.isEmpty,
      s"the loser must delete its OWN staging only: $leftover")
    assert(fs.exists(new HPath(s"$dir/$winnerStage")),
      "the winner's staged generation must survive the loser's cleanup")
  }

  // --------------------------------------------------------------------
  // ADVICE r15 high: crash-atomic fold commit / phantom-generation repair
  // --------------------------------------------------------------------

  test("an empty-bodied fold marker with no directory resolves to the generation BELOW (pre-crash docs stay searchable) and the next fold claims a fresh number (ADVICE r15 high)") {
    val root = freshRoot("graft-r16c")
    val dir = s"$root/index"
    val g = new Graft(spark, root, manifest = true)
    def w(rows: (String, Double, String, String)*) =
      g.write(rows.toSeq.toDF("time", "value", "name", "host"))
    w(("2024-01-09T10:00:00Z", 1.0, "cpu", "web-01"),
      ("2024-01-09T11:00:00Z", 2.0, "mem", "db-01"))
    CdcIndexSync.build(g, dir)
    w(("2024-01-10T10:00:00Z", 3.0, "gpu", "ml-01"))
    CdcIndexSync.sync(g, dir)
    w(("2024-01-11T10:00:00Z", 4.0, "net", "edge-01"))
    CdcIndexSync.sync(g, dir)
    val before = Seq(Seq("cpu"), Seq("gpu"), Seq("net"))
      .map(q => indexed(dir, q))
    assert(before.forall(_.nonEmpty))

    // the pre-r16 crash: fold_1 created VISIBLE with no body, no staged
    // dir, no legacy g1 dir — the old resolver fell back to the phantom
    // "g1" and served an EMPTY index (readFam reads absence as empty);
    // syncs would land into the phantom and docs vanished permanently
    Files.write(Paths.get(s"$dir/_sync/fold_1"), Array.emptyByteArray)
    CdcIndexSync.dropStateCaches()
    val st = CdcIndexSync.state(spark, dir).get
    assert(st.gen == 0L && st.genDir == "",
      s"an uncommitted fold must resolve to the generation below: $st")
    assert(Seq(Seq("cpu"), Seq("gpu"), Seq("net")).map(q => indexed(dir, q))
      == before, "pre-crash documents must stay searchable")

    // a later sync keeps landing into the COMMITTED generation
    w(("2024-01-12T10:00:00Z", 5.0, "disk", "db-02"))
    CdcIndexSync.sync(g, dir)
    assert(indexed(dir, Seq("disk")).nonEmpty)
    // disk's arrival changed n_docs (so every idf) — the fold-invariance
    // baseline is the POST-disk answer set
    val afterDisk = Seq(Seq("cpu"), Seq("gpu"), Seq("net"), Seq("disk"))
      .map(q => indexed(dir, q))

    // the next fold cannot reuse the occupied number (its claim would
    // lose forever and wedge the fold): it claims fold_2 and commits
    val gen = CdcIndexSync.compactIndex(spark, dir)
    assert(gen == 2L, s"the fold must skip the dead marker's number: $gen")
    assert(CdcIndexSync.ledgerBatches(spark, dir) == 1)
    assert(Seq(Seq("cpu"), Seq("gpu"), Seq("net"), Seq("disk"))
      .map(q => indexed(dir, q)) == afterDisk,
      "parity must hold across the recovery fold")
  }

  // --------------------------------------------------------------------
  // ADVICE r15 medium: the per-(generation, batch) land claim
  // --------------------------------------------------------------------

  test("concurrent late-landings of one batch serialize: one copier wins, the loser waits for done (never a second overwrite), a crashed winner fails the loser LOUDLY (ADVICE r15 medium)") {
    val root = freshRoot("graft-r16d")
    val dir = s"$root/index"
    val fs = fsAt(root)
    fs.mkdirs(new HPath(s"$dir/g1-stage"))
    val resolved = Graft.resolveClaim(fs, Graft.PrimAuto, "spec")

    // winner writes once; a second ensure of the same (gen, batch) is a
    // done-marker no-op
    var writes = 0
    CdcIndexSync.ensureLanded(spark, dir, "g1-stage", 7L, resolved) {
      writes += 1
    }
    CdcIndexSync.ensureLanded(spark, dir, "g1-stage", 7L, resolved) {
      writes += 1
    }
    assert(writes == 1, s"the batch must land exactly once: $writes")

    // loser-waits: hold batch 8's claim as a concurrent copier, finish it
    // from another thread mid-wait — the loser must NOT run its own write
    assert(Graft.claimAt(fs, new HPath(s"$dir/g1-stage/_land/b8.claim"),
      "", resolved))
    val finisher = new Thread(() => {
      Thread.sleep(300)
      val out = fs.create(new HPath(s"$dir/g1-stage/_land/b8.done"), true)
      out.close()
    })
    finisher.start()
    var loserWrote = false
    CdcIndexSync.ensureLanded(spark, dir, "g1-stage", 8L, resolved) {
      loserWrote = true
    }
    finisher.join()
    assert(!loserWrote,
      "the claim loser must wait for the winner's done, never re-copy")

    // truly CONCURRENT double-ensure, made deterministic with the claim
    // hook: A claims batch 10 and pauses inside its commit window; B
    // arrives while A holds the claim, loses it, and must WAIT for A's
    // done instead of running a second overlapping overwrite — the exact
    // interleaving the partition-union hazard (ADVICE r15 medium) needs
    val held = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val once = new java.util.concurrent.atomic.AtomicBoolean(false)
    CdcIndexSync.landClaimHook = () =>
      if (once.compareAndSet(false, true)) { held.countDown(); release.await() }
    val wroteA = new java.util.concurrent.atomic.AtomicBoolean(false)
    val wroteB = new java.util.concurrent.atomic.AtomicBoolean(false)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val a = new Thread(() =>
      try CdcIndexSync.ensureLanded(spark, dir, "g1-stage", 10L, resolved) {
        wroteA.set(true)
      } catch { case t: Throwable => errs.add(t) })
    try {
      a.start()
      held.await()
      val b = new Thread(() =>
        try CdcIndexSync.ensureLanded(spark, dir, "g1-stage", 10L, resolved) {
          wroteB.set(true)
        } catch { case t: Throwable => errs.add(t) })
      b.start()
      Thread.sleep(200) // B is in its wait loop while A holds the claim
      assert(!wroteA.get && !wroteB.get,
        "nothing may write while the claim is held in the commit window")
      release.countDown()
      a.join(); b.join()
      assert(errs.isEmpty, s"concurrent ensures must both succeed: $errs")
      assert(wroteA.get && !wroteB.get,
        "exactly the claim WINNER writes; the loser waits for done")
    } finally { CdcIndexSync.landClaimHook = () => (); release.countDown() }

    // crashed winner: claim held, done never lands — the loser fails
    // loudly instead of leaving the generation silently incomplete
    assert(Graft.claimAt(fs, new HPath(s"$dir/g1-stage/_land/b9.claim"),
      "", resolved))
    val oldWait = CdcIndexSync.landWaitMs
    CdcIndexSync.landWaitMs = 200L
    try {
      val ex = intercept[IllegalStateException] {
        CdcIndexSync.ensureLanded(spark, dir, "g1-stage", 9L, resolved)(())
      }
      assert(ex.getMessage.contains("crashed mid-landing"), ex.getMessage)
    } finally CdcIndexSync.landWaitMs = oldWait
  }

  // --------------------------------------------------------------------
  // VERDICT r15 #7: two CdcStream consumers sharing one stateDir
  // --------------------------------------------------------------------

  test("two sweeps sharing a CdcStream stateDir race benignly: concurrent foreachDiff advances land idempotently and the state equals a from-scratch recompute (r15 #7)") {
    val root = freshRoot("graft-r16e")
    val g = new Graft(spark, root, manifest = true)
    def w(rows: (String, Double, String)*) =
      g.write(rows.toSeq.toDF("time", "value", "name"))
    val stateDir = s"$root/consumer"
    val schema = new org.apache.spark.sql.types.StructType()
      .add("name", org.apache.spark.sql.types.StringType)
      .add("n", org.apache.spark.sql.types.LongType)
      .add("ingest_batch", org.apache.spark.sql.types.LongType)

    // the consumer: per-series point counts, landed idempotently
    def sweep(): Long =
      CdcStream.foreachDiff(g, stateDir = stateDir) { (full, to) =>
        CdcStream.land(full.groupBy("name")
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n")),
          s"$stateDir/counts", to)
      } { (diff, to) =>
        import org.apache.spark.sql.functions._
        CdcStream.land(diff.where(col("change") =!= "changed")
          .groupBy("name")
          .agg(sum(when(col("change") === "added", 1L).otherwise(-1L))
            .as("n")),
          s"$stateDir/counts", to)
      }

    def recompute(): Map[String, Long] =
      g.read(MatchAll).groupBy("name")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    def state(): Map[String, Long] =
      CdcStream.readState(spark, s"$stateDir/counts", schema)
        .groupBy("name")
        .agg(org.apache.spark.sql.functions.sum("n").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    w(("2024-01-09T10:00:00Z", 1.0, "cpu"), ("2024-01-09T11:00:00Z", 2.0, "mem"))
    sweep()
    w(("2024-01-10T10:00:00Z", 3.0, "cpu"))

    // TWO standing sweeps fire together on the same advance — both may
    // compute the same (from, to] diff; landing is keyed by `to` under
    // dynamic partition overwrite, so whichever order the writes and the
    // create-only nonce markers interleave in, the state never
    // double-counts. Surviving threads rethrow so a NON-benign outcome
    // (either sweep throwing) fails the spec loudly.
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map(_ => new Thread(() =>
      try sweep() catch { case t: Throwable => errs.add(t) }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"concurrent sweeps must both succeed: $errs")
    assert(state() == recompute(),
      s"racing sweeps must leave the exact state: ${state()} vs ${recompute()}")
    assert(state()("cpu") == 2L)

    // duplicate-seq markers (both racers committed the same `to`) must
    // resolve: committed() returns that seq and the NEXT advance prunes
    val committed = CdcStream.committed(spark, stateDir).get
    assert(committed.snap == g.snapshots().max)
    w(("2024-01-11T10:00:00Z", 4.0, "mem"))
    sweep()
    assert(state() == recompute())
    val markers = fsAt(stateDir)
      .listStatus(new HPath(s"$stateDir/_sync"))
      .map(_.getPath.getName).filter(_.startsWith("snap_"))
    assert(markers.forall(_.startsWith(s"snap_${g.snapshots().max}-")),
      s"the new advance must prune every lower-seq marker: ${markers.toSeq}")
  }
}
