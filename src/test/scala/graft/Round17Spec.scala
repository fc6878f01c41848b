package graft

import java.nio.file.{Files, Paths}
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import graft.streaming.CdcIndexSync
import graft.text.TextOps
import graft.tsdb.Graft

/** Round-17 directives: the wide↔long BM25 scorer equality is pinned
  * DIRECTLY at the WideQueryMax crossover (VERDICT r16 #2 — previously
  * only transitive through oracles), a failed land-claim winner releases
  * its claim so losers re-claim instead of timing out (ADVICE r16 low),
  * a crashed-winner landing is repairable from the landing ledger itself
  * (ADVICE r16 medium — repairLandings), dead index generations are
  * vacuumable between folds (VERDICT r16 #5), and the commit claim is
  * exercised by a second PROCESS (VERDICT r16 #4) — which found and now
  * pins two real multi-process compaction bugs: concurrent compactors
  * shared one staging dir name and eagerly deleted each other's live
  * staging (silent duplication/loss), fixed by nonce'd staging +
  * stale-swap validation inside the commit closure. The r17 serving-read
  * rebuild is pinned too: the fused /read nesting applies last-write-wins
  * identically to the merged flat read under real overwrites, and the
  * plain-mode schema cache surfaces new/foreign columns instead of
  * silently dropping them.
  */
class Round17Spec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(tag: String) =
    Files.createTempDirectory(Paths.get("target"), tag)
      .toAbsolutePath.toString

  private def fsAt(p: String) =
    new HPath(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // --------------------------------------------------------------------
  // Directive #2: wide↔long scorer equality AT the crossover
  // --------------------------------------------------------------------

  /** A corpus whose vocabulary spans the crossover: 40 docs, tokens
    * t00..t24 with doc-dependent frequencies plus shared filler, so per-
    * term df, tf, and dl all vary and a drifted scorer cannot hide in a
    * degenerate distribution. */
  private def crossoverCorpus() = {
    val docs = (0 until 40).map { i =>
      val toks = (0 until 25).flatMap { t =>
        // term t appears in doc i with frequency (i + t) % 4 (0 = absent)
        Seq.fill((i + t) % 4)(f"t$t%02d")
      } ++ Seq.fill(i % 7 + 1)("filler")
      (f"doc$i%02d", toks.mkString(" "))
    }
    docs.toDF("doc_id", "text")
  }

  private def scored(docs: org.apache.spark.sql.DataFrame,
                     query: Seq[String], prefix: Boolean): Seq[(String, Long, Double)] = {
    val out = if (prefix) TextOps.bm25TopKOnPrefix(docs, query, 100)
              else TextOps.bm25TopKOn(docs, query, 100)
    out.collect().toSeq.map(r => (r.getAs[String]("doc_id"),
      r.getAs[Long]("dl"), r.getAs[Double]("score")))
  }

  test("wide and long BM25 scorers are bit-identical for the SAME query at the WideQueryMax boundary — 16 and 17 terms, both entry points (VERDICT r16 #2)") {
    val docs = crossoverCorpus().localCheckpoint(true)
    // 16 terms = at the boundary (wide by default); 17 = just past it
    // (long by default). Each set mixes present terms with one absent
    // term ("zzz-absent") — absent terms contribute exactly 0.000000 in
    // the wide shape and drop out of the long shape's postings join, a
    // corner a drifted edit could break silently.
    val q16 = (0 until 15).map(t => f"t$t%02d") :+ "zzz-absent"
    val q17 = (0 until 16).map(t => f"t$t%02d") :+ "zzz-absent"
    val saved = TextOps.WideQueryMax
    try {
      for (q <- Seq(q16, q17); prefix <- Seq(false, true)) {
        TextOps.WideQueryMax = 1000 // force the wide per-term-column shape
        val wide = scored(docs, q, prefix)
        TextOps.WideQueryMax = 0 // force the explode/join long shape
        val long = scored(docs, q, prefix)
        assert(wide.nonEmpty, s"degenerate corpus: no hits for $q")
        assert(wide == long,
          s"wide and long scorers drifted for |q|=${q.size} prefix=$prefix:\n" +
            s"  wide=${wide.take(5)}...\n  long=${long.take(5)}...")
      }
    } finally TextOps.WideQueryMax = saved
  }

  test("the default crossover routes 16 terms wide and 17 long, and a prefix expansion spanning the boundary scores identically to its expanded exact query") {
    val docs = crossoverCorpus().localCheckpoint(true)
    // "t*" expands to every t00..t24 present in the corpus (25 terms,
    // past the boundary) under the shared cap-50 rule; handing the SAME
    // expanded list as exact terms must score identically — the prefix
    // path adds expansion, never a different scorer
    val viaPrefix = scored(docs, Seq("t*"), prefix = true)
    val expanded = (0 until 25).map(t => f"t$t%02d")
    val viaExact = scored(docs, expanded, prefix = false)
    assert(viaPrefix == viaExact,
      "prefix expansion must feed the SAME scorer as exact terms")
    // and the boundary itself: 16 exact terms (wide path) vs the same 16
    // through the prefix entry point (which pre-aggregates tf) agree
    val q16 = (0 until 16).map(t => f"t$t%02d")
    assert(scored(docs, q16, prefix = false) == scored(docs, q16, prefix = true),
      "the two entry points drifted at the 16-term boundary")
  }

  // --------------------------------------------------------------------
  // ADVICE r16 low: a failed winner releases its land claim
  // --------------------------------------------------------------------

  test("a land-claim winner whose write FAILS releases the claim: a retry (or concurrent loser) re-claims and lands instead of timing out (ADVICE r16 low)") {
    val root = freshRoot("graft-r17a")
    val dir = s"$root/index"
    val fs = fsAt(root)
    fs.mkdirs(new HPath(s"$dir/g1-stage"))
    val resolved = Graft.resolveClaim(fs, Graft.PrimAuto, "spec")

    // first attempt fails mid-write; the claim must NOT survive it
    val boom = intercept[RuntimeException] {
      CdcIndexSync.ensureLanded(spark, dir, "g1-stage", 5L, resolved) {
        throw new RuntimeException("transient write failure")
      }
    }
    assert(boom.getMessage == "transient write failure")
    assert(!fs.exists(new HPath(s"$dir/g1-stage/_land/b5.claim")),
      "a failed winner must release its claim for retries")
    assert(!fs.exists(new HPath(s"$dir/g1-stage/_land/b5.done")),
      "a failed write must never flip done")

    // the retry claims and lands — no landWaitMs stall, no manual surgery
    var wrote = false
    CdcIndexSync.ensureLanded(spark, dir, "g1-stage", 5L, resolved) {
      wrote = true
    }
    assert(wrote && fs.exists(new HPath(s"$dir/g1-stage/_land/b5.done")))

    // concurrent shape: A claims, fails inside the commit window while B
    // waits — B must observe the released claim, RE-CLAIM, and land,
    // never time out against a claim nobody holds
    val held = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val once = new java.util.concurrent.atomic.AtomicBoolean(false)
    CdcIndexSync.landClaimHook = () =>
      if (once.compareAndSet(false, true)) { held.countDown(); release.await() }
    val wroteB = new java.util.concurrent.atomic.AtomicBoolean(false)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val a = new Thread(() =>
      try CdcIndexSync.ensureLanded(spark, dir, "g1-stage", 6L, resolved) {
        throw new RuntimeException("winner dies after claiming")
      } catch { case t: Throwable => if (t.getMessage != "winner dies after claiming") errs.add(t) })
    try {
      a.start()
      held.await()
      val b = new Thread(() =>
        try CdcIndexSync.ensureLanded(spark, dir, "g1-stage", 6L, resolved) {
          wroteB.set(true)
        } catch { case t: Throwable => errs.add(t) })
      b.start()
      Thread.sleep(150) // B enters its wait loop while A holds the claim
      release.countDown()
      a.join(); b.join()
      assert(errs.isEmpty, s"unexpected failures: $errs")
      assert(wroteB.get, "the loser must take over a released claim")
      assert(fs.exists(new HPath(s"$dir/g1-stage/_land/b6.done")))
    } finally { CdcIndexSync.landClaimHook = () => (); release.countDown() }
  }

  // --------------------------------------------------------------------
  // ADVICE r16 medium: crashed-winner landings are repairable
  // --------------------------------------------------------------------

  test("repairLandings re-lands a crashed-winner batch from the grace generation: the committed-but-invisible batch becomes searchable without a rebuild (ADVICE r16 medium)") {
    val root = freshRoot("graft-r17b")
    val g = new Graft(spark, root, manifest = true)
    val dir = s"$root/index"
    def w(rows: (String, Double, String)*) =
      g.write(rows.toSeq.toDF("time", "value", "name"))

    // gen 0 with one extra batch, then a fold whose commit RACES a sync:
    // epsilon commits into gen 0 while the fold stages gen 1, so the
    // fold's post-commit late-copy carries it forward — the one landing
    // path that leaves a (claim, done) pair in the new generation
    w(("2024-01-01T00:00:00Z", 1.0, "alpha"), ("2024-01-01T00:00:01Z", 1.0, "beta"))
    CdcIndexSync.build(g, dir)
    w(("2024-01-02T00:00:00Z", 1.0, "gamma"))
    CdcIndexSync.sync(g, dir)
    var epsBatch = -1L
    CdcIndexSync.foldCommitHook = () => {
      w(("2024-01-04T00:00:00Z", 1.0, "epsilon"))
      CdcIndexSync.sync(g, dir)
      epsBatch = CdcIndexSync.committedSnap(spark, dir).get
    }
    try assert(CdcIndexSync.compactIndex(spark, dir) == 1L)
    finally CdcIndexSync.foldCommitHook = () => ()
    val st = CdcIndexSync.state(spark, dir).get
    assert(st.gen == 1L && epsBatch > 0)
    val fs = fsAt(root)
    val landDir = s"$dir/${st.genDir}/_land"
    assert(fs.exists(new HPath(s"$landDir/b$epsBatch.done")),
      "precondition: the fold late-copied the racing sync's batch")
    assert(CdcIndexSync.search(spark, dir, Seq("epsilon"), 5)
      .collect().length == 1, "precondition: epsilon searchable post-fold")

    // simulate the winner dying between claim and done: rewind the done
    // marker and remove the copied partitions from the active generation
    // — the exact on-disk state the crash leaves
    fs.delete(new HPath(s"$landDir/b$epsBatch.done"), false)
    Seq("postings", "doclen", "counts", "termdict").foreach { fam =>
      fs.delete(new HPath(
        s"$dir/${st.genDir}/$fam/ingest_batch=$epsBatch"), true)
    }
    assert(CdcIndexSync.search(spark, dir, Seq("epsilon"), 5)
      .collect().isEmpty, "precondition: the batch is invisible")

    // a fresh sync starts ABOVE the committed marker — it cannot repair
    w(("2024-01-05T00:00:00Z", 1.0, "zeta"))
    CdcIndexSync.sync(g, dir)
    assert(CdcIndexSync.search(spark, dir, Seq("epsilon"), 5).collect().isEmpty,
      "syncs start above the marker; only the repair sweep can re-land")

    // the repair: stale claim taken over, batch re-landed from the grace
    // generation (gen 0 landed it first), epsilon searchable again
    val repaired = CdcIndexSync.repairLandings(spark, dir, staleMs = 0L)
    assert(repaired.map(_._2).contains(epsBatch),
      s"repairLandings must report the re-landed batch, got $repaired")
    assert(CdcIndexSync.search(spark, dir, Seq("epsilon"), 5)
      .collect().length == 1, "the repaired batch must be searchable")
    // idempotent: a second sweep finds nothing stale
    assert(CdcIndexSync.repairLandings(spark, dir, staleMs = 0L).isEmpty)
    // and the repaired index still agrees with a from-scratch rebuild
    val rebuiltDir = s"$root/index2"
    CdcIndexSync.build(g, rebuiltDir)
    val a = CdcIndexSync.search(spark, dir, Seq("alpha", "epsilon", "zeta"), 20)
      .collect().toSeq.map(r => (r.getString(0), r.getAs[Double]("score")))
    val b = CdcIndexSync.search(spark, rebuiltDir, Seq("alpha", "epsilon", "zeta"), 20)
      .collect().toSeq.map(r => (r.getString(0), r.getAs[Double]("score")))
    assert(a == b, s"repaired index drifted from a rebuild:\n  $a\n  $b")
  }

  // --------------------------------------------------------------------
  // VERDICT r16 #5: generation GC between folds
  // --------------------------------------------------------------------

  test("vacuumIndex reclaims crash staging and out-of-grace generations between folds, keeps active + grace, and never touches live higher-seq staging (VERDICT r16 #5)") {
    val root = freshRoot("graft-r17c")
    val g = new Graft(spark, root, manifest = true)
    val dir = s"$root/index"
    def w(rows: (String, Double, String)*) =
      g.write(rows.toSeq.toDF("time", "value", "name"))

    w(("2024-01-01T00:00:00Z", 1.0, "alpha"))
    CdcIndexSync.build(g, dir)
    // fresh index at gen 0: vacuum is a no-op (any g* dir could be live)
    assert(CdcIndexSync.vacuumIndex(spark, dir).isEmpty)

    // two folds: gen 1 (grace = root families), then gen 2 (grace = g1)
    w(("2024-01-02T00:00:00Z", 1.0, "beta"))
    CdcIndexSync.sync(g, dir)
    w(("2024-01-03T00:00:00Z", 1.0, "gamma"))
    CdcIndexSync.sync(g, dir)
    assert(CdcIndexSync.compactIndex(spark, dir) == 1L)
    w(("2024-01-04T00:00:00Z", 1.0, "delta"))
    CdcIndexSync.sync(g, dir)
    w(("2024-01-05T00:00:00Z", 1.0, "epsilon"))
    CdcIndexSync.sync(g, dir)
    assert(CdcIndexSync.compactIndex(spark, dir) == 2L)
    val st = CdcIndexSync.state(spark, dir).get
    assert(st.gen == 2L)
    val fs = fsAt(root)

    // plant the garbage the daemon must sweep: a crashed fold's unmarked
    // staging at seq 2 (lost the race to the committed g2), and a live
    // CONCURRENT fold's staging at seq 3 (must survive)
    fs.mkdirs(new HPath(s"$dir/g2-deadbeef/postings"))
    fs.mkdirs(new HPath(s"$dir/g3-livefold/postings"))

    val reclaimed = CdcIndexSync.vacuumIndex(spark, dir)
    assert(reclaimed.contains("g2-deadbeef"),
      s"crash staging at or below the active seq must be reclaimed: $reclaimed")
    assert(!fs.exists(new HPath(s"$dir/g2-deadbeef")))
    assert(fs.exists(new HPath(s"$dir/g3-livefold")),
      "higher-seq dirs may be a concurrent fold's live staging")
    assert(fs.exists(new HPath(s"$dir/${st.genDir}")), "active stays")
    // grace (g1's dir) stays; the gen-0 root families are out of grace
    val g1dir = CdcIndexSync.state(spark, dir).get // re-resolve post-vacuum
    assert(g1dir.genDir == st.genDir)
    assert(!fs.exists(new HPath(s"$dir/postings")),
      "gen-0 root families are past the grace window once grace is g1")
    // search still answers across the vacuum, identical to a rebuild
    val hits = CdcIndexSync.search(spark, dir,
      Seq("alpha", "epsilon"), 10).collect()
    assert(hits.length == 2, s"vacuum broke search: ${hits.toSeq}")
    // idempotent: nothing left to reclaim (g3 is still above the active
    // seq and still protected)
    assert(CdcIndexSync.vacuumIndex(spark, dir).isEmpty)
    assert(fs.exists(new HPath(s"$dir/g3-livefold")))
    fs.delete(new HPath(s"$dir/g3-livefold"), true)
  }

  // --------------------------------------------------------------------
  // r17 serving-read rebuild: the fused LWW and the schema cache
  // --------------------------------------------------------------------

  test("fused /read nesting applies last-write-wins exactly: overwrites collapse to the max-wseq value, agreeing with the merged flat read row for row") {
    val root = freshRoot("graft-r17lww")
    val g = new Graft(spark, root)
    def w(rows: (String, Double, String)*) =
      g.write(rows.toSeq.toDF("time", "value", "name"))
    // three writes: base points, an overwrite of t1 on series a, and a
    // second overwrite of t1 plus a fresh t3 — the fused per-array dedup
    // must keep exactly the LAST write per (series, time)
    w(("2024-01-01T00:00:01Z", 1.0, "a"), ("2024-01-01T00:00:02Z", 2.0, "a"),
      ("2024-01-01T00:00:01Z", 9.0, "b"))
    w(("2024-01-01T00:00:01Z", 10.0, "a"))
    w(("2024-01-01T00:00:01Z", 100.0, "a"), ("2024-01-01T00:00:03Z", 3.0, "a"))
    val nested = g.readSeries("""{"match_all":{}}""").collect()
    val bySeries = nested.map(r => r.getAs[String]("name") ->
      r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("points"))
        .map(p => (p.getLong(0), p.getDouble(1)))).toMap
    assert(bySeries("a") == Seq(
      (1704067201000L, 100.0), (1704067202000L, 2.0), (1704067203000L, 3.0)),
      s"fused LWW drifted: ${bySeries("a")}")
    assert(bySeries("b") == Seq((1704067201000L, 9.0)))
    // and the nested shape agrees with the MERGED flat read (the
    // window-based lwwMerged path) — one rule, two physical shapes
    val flat = g.read("""{"match_all":{}}""")
      .collect().map(r => (r.getAs[String]("name"),
        r.getAs[Long]("time_ms"), r.getAs[Double]("value"))).toSet
    val fromNested = bySeries.toSeq.flatMap { case (n, pts) =>
      pts.map(p => (n, p._1, p._2)) }.toSet
    assert(flat == fromNested,
      s"fused nesting and merged flat read disagree:\n  $flat\n  $fromNested")
  }

  test("plain-mode schema cache: new tag columns surface immediately after the write that adds them, and out-of-band files force re-inference (never a silently dropped column)") {
    val root = freshRoot("graft-r17sc")
    val g = new Graft(spark, root)
    g.write(Seq(("2024-01-01T00:00:01Z", 1.0, "a"))
      .toDF("time", "value", "name"))
    assert(g.read("""{"match_all":{}}""").columns.toSet ==
      Set("name", "time_ms", "value"))
    // a second write introduces a NEW tag column: the prime-on-write path
    // must merge it into the cached schema — a stale cache here would
    // silently drop the column from every read until invalidation
    g.write(Seq(("2024-01-01T00:00:02Z", 2.0, "b", "web"))
      .toDF("time", "value", "name", "dc"))
    val df = g.read("""{"match_all":{}}""")
    assert(df.columns.toSet == Set("name", "dc", "time_ms", "value"),
      s"new tag lost by the schema cache: ${df.columns.toSeq}")
    assert(df.where(col("dc") === "web").count() == 1)
    // out-of-band mutation (a file this Graft instance did not write):
    // the file-list signature misses and the read re-infers, surfacing
    // the foreign column
    val stranger = Seq((1704067203000L, 3.0, "c", 7L, 99L))
      .toDF("time_ms", "value", "name", "zone", "__wseq")
    stranger.write.mode("append")
      .parquet(s"$root/default/bucket_day=19723")
    val df2 = g.read("""{"match_all":{}}""")
    assert(df2.columns.toSet == Set("name", "dc", "zone", "time_ms", "value"),
      s"out-of-band column lost: ${df2.columns.toSeq}")
    assert(df2.count() == 3)
  }

  // --------------------------------------------------------------------
  // VERDICT r16 #4: the commit claim vs a second PROCESS
  // --------------------------------------------------------------------

  test("two JVMs committing concurrently to one manifest store: snapshot chain linear, zero lost commits, compactions racing appends (VERDICT r16 #4)") {
    val root = freshRoot("graft-r17race")
    val go = java.nio.file.Paths.get(root, "go")
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val cp = sys.props("java.class.path")
    // the forked test JVM carries the Spark-on-JDK17 --add-opens set —
    // reuse it verbatim for the children
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(a => a == "--add-opens" || a.endsWith("=ALL-UNNAMED"))
      .toSeq
    val nBatches = 6
    def launch(id: String): (Process, java.io.File) = {
      val cwd = Files.createTempDirectory(Paths.get("target"),
        s"claimrace-cwd-$id").toFile
      val log = new java.io.File(s"target/claimrace-$id.log")
      val pb = new ProcessBuilder(
        (Seq(javaBin) ++ jvmArgs ++ Seq("-Xmx3g",
          "-Dspark.ui.enabled=false",
          "-cp", cp, "graft.ClaimRace",
          root, id, nBatches.toString, go.toString)): _*)
      pb.directory(cwd)
      pb.redirectErrorStream(true)
      pb.redirectOutput(log)
      (pb.start(), log)
    }
    val (pa, logA) = launch("A")
    val (pb, logB) = launch("B")
    // both sessions boot first, then the go-file drops the barrier so the
    // commit windows genuinely overlap
    Thread.sleep(500)
    Files.createFile(go)
    assert(pa.waitFor(10, java.util.concurrent.TimeUnit.MINUTES) &&
      pb.waitFor(10, java.util.concurrent.TimeUnit.MINUTES),
      "a claim-race writer hung")
    def logTail(f: java.io.File) =
      new String(Files.readAllBytes(f.toPath)).linesIterator
        .filter(_.contains("[claimrace")).mkString("\n")
    assert(pa.exitValue() == 0 && pb.exitValue() == 0,
      s"writer failed:\nA:\n${logTail(logA)}\nB:\n${logTail(logB)}")

    // zero lost commits: every batch from BOTH writers is readable
    val g = new Graft(spark, root, manifest = true)
    val counts = g.read("""{"match_all":{}}""")
      .groupBy("name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("wA" -> nBatches * 10L, "wB" -> nBatches * 10L),
      s"lost commits: $counts\nA:\n${logTail(logA)}\nB:\n${logTail(logB)}")

    // linear snapshot chain: consecutive seqs, no gaps — every lost claim
    // re-applied on the fresh state, none gave up or double-claimed
    val snaps = g.snapshots()
    assert(snaps == (1L to snaps.max),
      s"snapshot chain not linear: $snaps")
    // 12 appends + up to 4 compaction commits (a compaction that finds
    // nothing to do commits nothing)
    assert(snaps.max >= 2L * nBatches, s"missing commits: $snaps")

    // both PIDs' logs are the artifact: each writer logged its own pid
    // and every committed seq (target/claimrace-{A,B}.log)
    assert(logTail(logA).contains("pid=") && logTail(logB).contains("pid="))
    assert(logTail(logA).contains(s"done: ${nBatches * 10} points"))
    assert(logTail(logB).contains(s"done: ${nBatches * 10} points"))
  }
}
