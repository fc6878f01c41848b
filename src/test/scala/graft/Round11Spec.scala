package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import com.fasterxml.jackson.databind.ObjectMapper
import graft.http.GraftHttpServer
import graft.tsdb.Graft

/** Round-11 additions: the coalesced (queued) HTTP write path — group
  * commit for small batches (the reference's perf-test.js workload shape,
  * scripts/perf-test.js:50-57) with the reference's per-point validation
  * semantics intact (lib/orestes-inserter.js:183-201).
  */
class Round11Spec extends SparkTestBase {
  private val mapper = new ObjectMapper()

  private def post(port: Int, path: String, body: String): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def parquetFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).toSeq.flatten.flatMap { f =>
      if (f.isDirectory) parquetFiles(f)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    }

  test("small-batch POSTs coalesce into one flush job (not one job per POST)") {
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "graft-q-coalesce").toString
    val srv = new GraftHttpServer(new Graft(spark, root), spark)
    val port = srv.start()
    try {
      // 20 batches of 5 points, all in one bucket_day — the direct path
      // would run 20 write jobs and leave >= 20 files in the bucket
      (0 until 20).foreach { b =>
        val pts = (0 until 5).map { i =>
          s"""{"time":${1704794400000L + b * 5 + i},"value":${b * 5 + i}.0,"name":"cpu","host":"h${i % 3}"}"""
        }.mkString(",")
        val (wc, wb) = post(port, "/write", s"[$pts]")
        assert(wc == 200 && mapper.readTree(wb).get("errors").size() == 0, wb)
      }
      // read-your-writes: the read flushes the queue first
      val (rc, rb) = post(port, "/read",
        s"""{"start":0,"end":${1704794400000L + 1000}}""")
      assert(rc == 200, rb)
      val series = mapper.readTree(rb).get("series")
      val total = (0 until series.size()).map(series.get(_).get("points").size()).sum
      assert(total == 100, rb.take(500))
      // ONE flush job wrote everything: at most one file per task (local[4])
      // in the single bucket, not one-plus per POST
      val files = parquetFiles(new java.io.File(root))
      assert(files.nonEmpty && files.size <= 4,
        s"expected <= 4 files from one coalesced flush, got ${files.size}")
    } finally srv.stop()
  }

  test("queued writes return the engine path's per-point errors immediately") {
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "graft-q-errors").toString
    val srv = new GraftHttpServer(new Graft(spark, root), spark)
    val port = srv.start()
    try {
      val (wc, wb) = post(port, "/write",
        """[{"time":"2024-01-09T10:00:00Z","value":1.0,"name":"ok"},
            {"time":"nope","value":2.0,"name":"badtime"},
            {"time":"2024-01-09T10:00:01Z","name":"noval"},
            {"time":"2024-01-09T10:00:02Z","value":4.0}]""")
      assert(wc == 200, wb)
      val errs = mapper.readTree(wb).get("errors")
      val msgs = (0 until errs.size()).map(errs.get(_).get("error").asText())
      assert(msgs == Seq("invalid timestamp", "invalid value",
        "metrics must have at least one tag"), msgs.toString)
      // the rejected points ride along in the error objects (reference shape)
      assert(errs.get(0).get("name").asText() == "badtime", wb)
      // only the valid point landed
      val (_, rb) = post(port, "/read", "{}")
      val series = mapper.readTree(rb).get("series")
      assert(series.size() == 1 &&
        series.get(0).get("tags").get("name").asText() == "ok", rb)
    } finally srv.stop()
  }

  test("queued batches keep last-write-wins order within one flush") {
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "graft-q-lww").toString
    val srv = new GraftHttpServer(new Graft(spark, root), spark)
    val port = srv.start()
    try {
      // same (series, time) across two queued POSTs: the later POST must
      // win even though both land in the SAME flush job — and the lower
      // value proves it's the sequence deciding, not the value tiebreak
      post(port, "/write", """[{"time":1704794400000,"value":9.0,"name":"cpu"}]""")
      post(port, "/write", """[{"time":1704794400000,"value":3.0,"name":"cpu"}]""")
      val (_, rb) = post(port, "/read", "{}")
      val series = mapper.readTree(rb).get("series")
      assert(series.size() == 1, rb)
      val pts = series.get(0).get("points")
      assert(pts.size() == 1 && pts.get(0).get(1).asDouble() == 3.0, rb)
    } finally srv.stop()
  }

  test("queued and direct writes interleave in true order") {
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "graft-q-mixed").toString
    val graft = new Graft(spark, root)
    // queued first (acked, still in memory), then a DIRECT engine write of
    // the same point: both paths stamp from ONE strictly-monotonic
    // generator, so the later call wins deterministically — even within
    // the same millisecond (no sleep needed)
    graft.writeQueued(Seq(mapper.readTree(
      """{"time":1704794400000,"value":5.0,"name":"cpu"}""")))
    import spark.implicits._
    graft.write(spark.read.json(Seq(
      """{"time":1704794400000,"value":7.0,"name":"cpu"}""").toDS()))
    val rows = graft.read("""{"match_all":{}}""", startMs = 0,
      endMs = Long.MaxValue).collect()
    assert(rows.length == 1 && rows(0).getAs[Double]("value") == 7.0,
      rows.mkString(","))
    // and the reverse: direct first, queued second -> queued wins
    graft.writeQueued(Seq(mapper.readTree(
      """{"time":1704794400000,"value":11.0,"name":"cpu"}""")))
    val rows2 = graft.read("""{"match_all":{}}""", startMs = 0,
      endMs = Long.MaxValue).collect()
    assert(rows2.length == 1 && rows2(0).getAs[Double]("value") == 11.0,
      rows2.mkString(","))
  }

  test("ServerMain.boot serves a reference-shaped config end to end") {
    // the reference's one-command boot (node orestes.js + its config file):
    // the same file shape — extra backend blocks ignored, per-space
    // granularities and keep_days honored — wires store + facade
    val dir = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "graft-boot")
    val cfgPath = dir.resolve("orestes-config.json")
    Files.write(cfgPath,
      """{"port": 0,
          "cassandra": {"contactPoints": ["localhost"]},
          "elasticsearch": {"host": "localhost"},
          "spaces": {"default": {"table_granularity_days": 1,
                                 "keep_days": 100000}}}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (g, srv, _) = graft.http.ServerMain.boot(spark,
      cfgPath.toString, dir.resolve("store").toString)
    assert(g.configuredKeepDays == Map("default" -> 100000))
    val port = srv.start()
    try {
      val (wc, wb) = post(port, "/write",
        """[{"time":"2024-01-09T10:00:00Z","value":5.0,"name":"cpu"}]""")
      assert(wc == 200 && mapper.readTree(wb).get("errors").size() == 0, wb)
      val (rc, rb) = post(port, "/read", "{}")
      assert(rc == 200, rb)
      assert(mapper.readTree(rb).get("series").size() == 1, rb)
      // the configured standing retention applies through the same store
      assert(g.retentionSweep() == Map("default" -> Seq()))
      // a missing config file boots defaults instead of crashing
      val (g2, _, _) = graft.http.ServerMain.boot(spark,
        dir.resolve("nope.json").toString, dir.resolve("store2").toString)
      assert(g2.configuredKeepDays.isEmpty)
    } finally srv.stop()
  }

  test("concurrent queued writes with interleaved reads are lossless") {
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "graft-q-conc").toString
    val srv = new GraftHttpServer(new Graft(spark, root), spark)
    val port = srv.start()
    try {
      // 6 writer threads x 10 POSTs x 10 disjoint points, racing 2 reader
      // threads whose /read calls trigger flushes mid-stream — every
      // accepted point must survive exactly once (the queue swap, the
      // per-batch sequence stamps, and dynamic flush must not lose or
      // duplicate under contention)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val writers = (0 until 6).map { w =>
        java.util.concurrent.CompletableFuture.runAsync(() => {
          (0 until 10).foreach { b =>
            val pts = (0 until 10).map { i =>
              val id = w * 1000 + b * 10 + i
              s"""{"time":${1704794400000L + id},"value":$id.0,"name":"cpu","w":"w$w"}"""
            }.mkString(",")
            val (wc, wb) = post(port, "/write", s"[$pts]")
            if (wc != 200 || mapper.readTree(wb).get("errors").size() != 0)
              errs.add(s"writer $w batch $b: $wc $wb")
          }
        }, pool)
      }
      val readers = (0 until 2).map { r =>
        java.util.concurrent.CompletableFuture.runAsync(() => {
          (0 until 5).foreach { _ =>
            val (rc, _) = post(port, "/read", """{"start":0,"end":1704794500000}""")
            if (rc != 200) errs.add(s"reader $r: $rc")
            Thread.sleep(20)
          }
        }, pool)
      }
      (writers ++ readers).foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      pool.shutdown()
      assert(errs.isEmpty, errs.toArray.mkString("; "))
      val (rc, rb) = post(port, "/read", """{"start":0,"end":1704794500000}""")
      assert(rc == 200, rb)
      val series = mapper.readTree(rb).get("series")
      val total = (0 until series.size()).map(series.get(_).get("points").size()).sum
      assert(total == 600, s"expected 600 points, read $total")
    } finally srv.stop()
  }

  test("the queue flushes on its size threshold without waiting for a read") {
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "graft-q-thresh").toString
    val graft = new Graft(spark, root, maxQueuedPoints = 25)
    def batch(b: Int) = (0 until 10).map { i =>
      mapper.readTree(
        s"""{"time":${1704794400000L + b * 10 + i},"value":1.0,"name":"cpu"}""")
    }
    graft.writeQueued(batch(0)); graft.writeQueued(batch(1))
    // 20 queued < 25: nothing durable yet
    assert(parquetFiles(new java.io.File(root)).isEmpty)
    graft.writeQueued(batch(2))
    // 30 >= 25: the third ack itself triggered the flush — data is on
    // parquet with NO read having run (the bounded crash-loss window)
    assert(parquetFiles(new java.io.File(root)).nonEmpty)
    assert(spark.read.parquet(s"$root/default").count() == 30)
  }

  test("streaming IVF inverted file: append without retrain, replay-safe probe") {
    import java.nio.file.{Files, Paths}
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def tmp(n: String) = {
      val p = s"target/stream-test/ann-$n-${System.nanoTime()}"
      Files.createDirectories(Paths.get(p)); p
    }
    val (idx, ckpt) = (tmp("idx"), tmp("ckpt"))
    // the fixed train-once codebook every consumer shares (deterministic)
    val codebook = graft.ann.Ann.ivfCodebook(spark, Sf)
    // new vectors = copies of corpus embeddings 7/8/9 under fresh ids, so a
    // probe with the original vector must land in the SAME cell and score
    // cosine 1.0 against its streamed twin
    val base = graft.core.Tables.embeddings(spark, Sf)
      .where(col("vec_id").isin(7L, 8L, 9L))
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val vecs = mem.toDF().toDF("vec_id", "embedding")
    val q = graft.streaming.AnnStream.start(vecs, codebook, idx, ckpt)
    mem.addData((1007L, base(7L)), (1008L, base(8L)))
    q.processAllAvailable()
    mem.addData((1009L, base(9L)))
    q.processAllAvailable(); q.stop()
    // the index layout is (cell, ingest_batch)-partitioned: the probe's
    // cell restriction is partition pruning on storage
    val cellDirs = Option(new java.io.File(idx).listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty, "expected cell=* partition directories")
    assert(spark.read.parquet(idx).count() == 3)

    // probe with the original corpus vector: its streamed twin is the top
    // neighbor at cosine 1.0 (identical vector, same cell by construction)
    val queries = graft.core.Tables.embeddings(spark, Sf)
      .where(col("vec_id") === 7L).select(col("vec_id"), col("embedding"))
    val probe = graft.streaming.AnnStream.probe(spark, idx, queries, codebook)
    val top = probe.collect()
    assert(top.nonEmpty)
    assert(top(0).getAs[Long]("n_id") == 1007L &&
      top(0).getAs[Double]("cosine") == 1.0, top.mkString(","))
    // the cell restriction reaches the index scan as DYNAMIC PARTITION
    // PRUNING on the (cell, ingest_batch) layout — probe cost is cell
    // occupancy at the storage level, not a post-scan filter
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic partition pruning on cell:\n${plan.take(1200)}")

    // restart on the SAME checkpoint: replayed batches must not duplicate
    // (dynamic partition overwrite on (cell, ingest_batch)); a new batch
    // appends and is immediately probe-visible
    val q2 = graft.streaming.AnnStream.start(vecs, codebook, idx, ckpt)
    mem.addData((2008L, base(8L)))
    q2.processAllAvailable(); q2.stop()
    val all = spark.read.parquet(idx).select("vec_id").as[Long].collect().sorted
    assert(all.toSeq == Seq(1007L, 1008L, 1009L, 2008L), all.mkString(","))
    val q8 = graft.core.Tables.embeddings(spark, Sf)
      .where(col("vec_id") === 8L).select(col("vec_id"), col("embedding"))
    val top8 = graft.streaming.AnnStream.probe(spark, idx, q8, codebook).collect()
    assert(top8.take(2).map(_.getAs[Long]("n_id")).toSet == Set(1008L, 2008L),
      top8.mkString(","))
  }

  test("intervals kernel matches a brute-force oracle: nested budgets + minimal-interval filters") {
    import spark.implicits._
    import graft.tsdb.EsFilter
    // EXHAUSTIVE: all token sequences of length 1..6 over {a, b, c} (1092
    // docs) against an independently written implementation of the
    // interval semantics — nested sub-match budgets (minimal sub-interval
    // candidates, actual widths, non-overlap) and filter rules applied per
    // minimal cover for positive modes / any cover for not_ modes.
    val alpha = Seq("a", "b", "c")
    val docs = (1 to 6).flatMap(n =>
      Seq.fill(n)(alpha).foldLeft(Seq(Seq.empty[String]))((acc, as) =>
        acc.flatMap(pre => as.map(pre :+ _))))
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }
      .toDF("id", "text")

    type Iv = (Int, Int)
    def minimalOf(cs: Seq[Iv]): Seq[Iv] =
      cs.filterNot(c => cs.exists(o =>
        o != c && o._1 >= c._1 && o._2 <= c._2))
    def subMinimal(toks: Seq[String], terms: Seq[String], slop: Int,
                   ordered: Boolean): Seq[Iv] = {
      def assigns(i: Int, used: List[Int]): Seq[List[Int]] =
        if (i == terms.size) Seq(used.reverse)
        else toks.zipWithIndex.filter(_._1 == terms(i)).map(_._2)
          .filter(p => !used.contains(p) && (!ordered || used.isEmpty || p > used.head))
          .flatMap(p => assigns(i + 1, p :: used)).toSeq
      val covers = assigns(0, Nil).map(ps => (ps.min, ps.max))
        .filter { case (s, e) => (e - s + 1) - terms.size <= slop }.distinct
      minimalOf(covers)
    }
    // a slot is a single token or a nested (terms, slop, ordered) sub-match
    type Slot = Either[String, (Seq[String], Int, Boolean)]
    def coversOf(toks: Seq[String], slots: Seq[Slot], slop: Int,
                 ordered: Boolean): Seq[Iv] = {
      val cands: Seq[Seq[Iv]] = slots.map {
        case Left(t) => toks.zipWithIndex.filter(_._1 == t).map(p => (p._2, p._2))
        case Right((ts, ss, so)) => subMinimal(toks, ts, ss, so)
      }
      def rec(i: Int, chosen: List[Iv]): Seq[List[Iv]] =
        if (i == slots.size) Seq(chosen.reverse)
        else cands(i)
          .filter(iv => chosen.forall(c => iv._2 < c._1 || iv._1 > c._2))
          .filter(iv => !ordered || chosen.isEmpty || iv._1 > chosen.head._2)
          .flatMap(iv => rec(i + 1, iv :: chosen))
      rec(0, Nil).filter { ivs =>
        if (ordered)
          ivs.size <= 1 || ivs.sliding(2).map {
            case Seq(x, y) => y._1 - x._2 - 1 }.sum <= slop
        else {
          val cs = ivs.map(_._1).min
          val ce = ivs.map(_._2).max
          (ce - cs + 1) - ivs.map(iv => iv._2 - iv._1 + 1).sum <= slop
        }
      }.map(ivs => (ivs.map(_._1).min, ivs.map(_._2).max)).distinct
    }
    def rel(mode: String, c: Iv, f: Iv): Boolean = mode.stripPrefix("not_") match {
      case "containing"   => f._1 >= c._1 && f._2 <= c._2
      case "contained_by" => f._1 <= c._1 && f._2 >= c._2
      case "overlapping"  => f._1 <= c._2 && f._2 >= c._1
      case "after"        => c._1 > f._2
      case "before"       => c._2 < f._1
    }
    def brute(toks: Seq[String], slots: Seq[Slot], slop: Int, ordered: Boolean,
              filter: Option[(String, String)]): Boolean = {
      val covers = coversOf(toks, slots, slop, ordered)
      filter match {
        case None => covers.nonEmpty
        case Some((mode, ft)) =>
          val fIvs = toks.zipWithIndex.filter(_._1 == ft).map(p => (p._2, p._2))
          if (mode.startsWith("not_"))
            covers.exists(c => !fIvs.exists(f => rel(mode, c, f)))
          else
            minimalOf(covers).exists(c => fIvs.exists(f => rel(mode, c, f)))
      }
    }
    def slotJson(s: Slot): String = s match {
      case Left(t) => s"""{"match":{"query":"$t"}}"""
      case Right((ts, ss, so)) =>
        s"""{"match":{"query":"${ts.mkString(" ")}","ordered":$so,"max_gaps":$ss}}"""
    }
    def check(slots: Seq[Slot], slop: Int, ordered: Boolean,
              filter: Option[(String, String)]): Unit = {
      val json = (slots, filter) match {
        case (Seq(Left(t1), Left(t2)), Some((mode, ft))) =>
          s"""{"intervals":{"text":{"match":{"query":"$t1 $t2","ordered":$ordered,
               "max_gaps":$slop,"filter":{"$mode":{"match":{"query":"$ft"}}}}}}}"""
        case _ =>
          val ivs = slots.map(slotJson).mkString(",")
          s"""{"intervals":{"text":{"all_of":{"ordered":$ordered,
               "max_gaps":$slop,"intervals":[$ivs]}}}}"""
      }
      val got = df.where(EsFilter.compile(json))
        .select("id").collect().map(_.getLong(0)).toSet
      val want = docs.zipWithIndex.collect {
        case (t, i) if brute(t, slots, slop, ordered, filter) => i.toLong }.toSet
      assert(got == want, s"slots=$slots slop=$slop ordered=$ordered " +
        s"filter=$filter: kernel ${got.size} docs vs brute ${want.size}; " +
        s"diff=${(got diff want) ++ (want diff got)}")
    }
    // nested budgets, unordered and ordered outer
    for (slop <- 0 to 2; subSlop <- 0 to 1; subOrd <- Seq(true, false)) {
      check(Seq(Left("a"), Right((Seq("b", "c"), subSlop, subOrd))), slop,
        ordered = false, None)
      check(Seq(Left("a"), Right((Seq("b", "c"), subSlop, subOrd))), slop,
        ordered = true, None)
    }
    // repeated terms inside a nested sub-match
    check(Seq(Right((Seq("a", "a"), 1, false)), Left("b")), 1, ordered = false, None)
    // THREE slots with a nested member — the shape whose gaps-mode prune
    // needs the max-width (not min-width) future credit (r11 code review)
    for (slop <- 0 to 3) {
      check(Seq(Left("a"), Left("b"), Right((Seq("c", "c"), 2, false))), slop,
        ordered = false, None)
      check(Seq(Left("a"), Left("b"), Right((Seq("c", "c"), 2, false))), slop,
        ordered = true, None)
    }
    // filter rules per minimal interval (incl. the repeated-term shape that
    // exposes non-minimal covers)
    for (mode <- Seq("containing", "not_containing", "contained_by",
                     "not_contained_by", "overlapping", "not_overlapping",
                     "after", "before");
         slop <- Seq(1, 3))
      check(Seq(Left("a"), Left("c")), slop, ordered = false, Some((mode, "b")))
    for (mode <- Seq("containing", "not_containing"))
      check(Seq(Left("a"), Left("a")), 2, ordered = false, Some((mode, "b")))
  }

  test("slot wire format round-trips every alternative kind") {
    import graft.functions.SloppySlot
    val rnd = new scala.util.Random(11)
    def term() = ("a" + rnd.alphanumeric.filter(_.isLetter).take(
      1 + rnd.nextInt(6)).mkString).toLowerCase
    def slot(): SloppySlot = rnd.nextInt(4) match {
      case 0 =>
        // pre/post ride the wire only alongside excludes (the span_not
        // window has no meaning without them)
        val exc = if (rnd.nextBoolean()) Seq(term()) else Nil
        SloppySlot(Seq.fill(1 + rnd.nextInt(3))(term()), exc,
          if (exc.nonEmpty) rnd.nextInt(3) else 0,
          if (exc.nonEmpty) rnd.nextInt(3) else 0,
          prefixes = Seq.fill(rnd.nextInt(2))(term()),
          wildcards = Seq.fill(rnd.nextInt(2))(term() + "*" + (if (rnd.nextBoolean()) "?" else "")),
          fuzzies = Seq.fill(rnd.nextInt(2))(graft.functions.FuzzySpec(
            term(), rnd.nextInt(3), rnd.nextBoolean(), rnd.nextInt(3))))
      case 1 => SloppySlot(Nil, Nil, 0, 0, Nil, Seq.fill(2 + rnd.nextInt(2))(term()))
      case 2 => SloppySlot(Nil, Nil, 0, 0, Nil, Seq.fill(2 + rnd.nextInt(2))(term()),
        subSlop = rnd.nextInt(5), subOrdered = rnd.nextBoolean())
      case 3 => SloppySlot(Nil, Nil, 0, 0,
        wildcards = Seq("*" + term()),
        fuzzies = Seq(graft.functions.FuzzySpec(term(), 1)))
    }
    (0 until 200).foreach { _ =>
      val slots = Seq.fill(1 + rnd.nextInt(3))(slot())
      val decoded = SloppySlot.decode(SloppySlot.encode(slots)).toSeq
      assert(decoded == slots, s"round-trip broke:\n$slots\n$decoded")
    }
    // the separators/markers are rejected, not mis-parsed
    intercept[IllegalArgumentException] {
      SloppySlot.encode(Seq(SloppySlot(Seq("a|b"), Nil, 0, 0)))
    }
    intercept[IllegalArgumentException] {
      SloppySlot.encode(Seq(SloppySlot(Nil, Nil, 0, 0, wildcards = Seq("a^b"))))
    }
  }

  test("gaps-mode prune admits wide nested intervals (r11 review regression)") {
    // aa@0 .. x@5 .. y@8 bb@9 .. x@20 y@21: the valid assignment binds the
    // WIDE nested interval [5,8] inside the aa..bb cover (gaps 10-6=4<=5).
    // A min-width future credit pruned the branch at the bb binding
    // (10-(1+1+2)=6>5) before the nested slot could supply its width.
    val doc = "aa f f f f x f f y bb f f f f f f f f f f x y"
    assert(graft.functions.SloppyMatch.matches(
      doc, "aa bb x+y^2^0", 5, inOrder = false, prefix = false, gaps = true))
    // end-to-end through the ES compiler
    import spark.implicits._
    val df = Seq((1L, doc)).toDF("id", "text")
    assert(df.where(graft.tsdb.EsFilter.compile(
      """{"intervals":{"text":{"all_of":{"max_gaps":5,"intervals":[
           {"match":{"query":"aa"}},{"match":{"query":"bb"}},
           {"match":{"query":"x y","max_gaps":2}}]}}}}""")).count() == 1)
  }

  test("queued-path validation edge cases match the direct path (r11 review)") {
    val utc = java.time.ZoneOffset.UTC
    def v(json: String) = Graft.validatePoint(mapper.readTree(json), utc)
    // Spark's string->double cast accepts the short infinity literals that
    // Double.parseDouble does not — both write paths must agree
    assert(v("""{"time":1,"value":"inf","name":"x"}""").isRight)
    assert(v("""{"time":1,"value":"-Inf","name":"x"}""").isRight)
    assert(v("""{"time":1,"value":"Infinity","name":"x"}""").isRight)
    assert(v("""{"time":1,"value":"NaN","name":"x"}""") == Left("invalid value"))
    assert(v("""{"time":1,"value":"abc","name":"x"}""") == Left("invalid value"))
    // the reserved __wseq field is not a tag: acking this point would make
    // the whole flush job fail its tagCols require
    assert(v("""{"time":1,"value":1.0,"__wseq":99}""")
      == Left("metrics must have at least one tag"))
    // a client "error" field must not mask the validation verdict
    val g = new Graft(spark, Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "graft-q-errfield").toString)
    val errs = g.writeQueued(Seq(mapper.readTree(
      """{"time":"nope","value":1.0,"name":"x","error":"client note"}""")))
    assert(errs.size == 1 &&
      mapper.readTree(errs.head).get("error").asText() == "invalid timestamp", errs)
  }

  test("a failed flush re-queues acked points instead of dropping them") {
    // a root no filesystem write can land in (even as uid 0): the flush
    // job fails, and the SECOND flush must fail again — proof the lines
    // were restored rather than silently discarded with the ack kept
    val g = new Graft(spark, "/proc/self/graft-noperm")
    val errs = g.writeQueued(Seq(mapper.readTree(
      """{"time":1704794400000,"value":1.0,"name":"cpu"}""")))
    assert(errs.isEmpty)
    intercept[Exception] { g.flushQueued() }
    intercept[Exception] { g.flushQueued() }
  }

  test("driver-side time parsing agrees with Spark's cast on generated shapes") {
    import spark.implicits._
    val utc = java.time.ZoneOffset.UTC
    val rnd = new scala.util.Random(7)
    // generated timestamp strings across the accepted grammar (date-only,
    // space/T separators, fractions, Z / offset zones) plus bare-millis and
    // garbage forms; the queued path's accept/reject AND the computed
    // millis must both agree with the engine expression the direct path
    // evaluates: coalesce(try_to_timestamp(s), timestamp_millis(try_cast))
    def gen(): String = rnd.nextInt(8) match {
      case 0 => f"${1990 + rnd.nextInt(50)}%04d-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d"
      case 1 => f"${1990 + rnd.nextInt(50)}%04d-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"
      case 2 => f"${1990 + rnd.nextInt(50)}%04d-${1 + rnd.nextInt(12)}%02dT${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d"
      case 3 => f"${1990 + rnd.nextInt(50)}%04d-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02dT${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d.${rnd.nextInt(1000)}%03dZ"
      case 4 => f"${1990 + rnd.nextInt(50)}%04d-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02dT${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d+0${1 + rnd.nextInt(8)}:00"
      case 5 => (rnd.nextLong() % 4000000000000L).toString // bare millis
      case 6 => f"${1990 + rnd.nextInt(50)}%04d-${13 + rnd.nextInt(80)}%02d-01" // bad month
      case 7 => s"junk${rnd.nextInt(100)}"
    }
    val shapes = Seq.fill(300)(gen()).distinct
    val sparkMs: Map[String, Option[Long]] = shapes.toDF("s")
      .selectExpr("s", "unix_millis(CAST(coalesce(try_to_timestamp(s), " +
        "timestamp_millis(try_cast(s AS LONG))) AS TIMESTAMP)) AS ms")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    shapes.foreach { s =>
      val driver = Graft.parseTimeString(s, utc)
      assert(driver == sparkMs(s),
        s"'$s': driver=$driver spark=${sparkMs(s)}")
    }
  }

  test("driver-side time parsing matches the engine's accepted shapes") {
    val utc = java.time.ZoneOffset.UTC
    // the shapes reference clients send (ISO instant / offset / local /
    // date-only / bare millis) — driver parse must agree with the Spark path
    assert(Graft.parseTimeString("2024-01-09T10:00:00Z", utc)
      .contains(1704794400000L))
    assert(Graft.parseTimeString("2024-01-09T10:00:00+00:00", utc)
      .contains(1704794400000L))
    assert(Graft.parseTimeString("2024-01-09 10:00:00.123", utc)
      .contains(1704794400123L))
    assert(Graft.parseTimeString("2024-01-09", utc).contains(1704758400000L))
    assert(Graft.parseTimeString("2024", utc).contains(1704067200000L))
    assert(Graft.parseTimeString("1704794401000", utc).contains(1704794401000L))
    assert(Graft.parseTimeString("-86400000", utc).contains(-86400000L))
    assert(Graft.parseTimeString("nope", utc).isEmpty)
    assert(Graft.parseTimeString("2024-13-01", utc).isEmpty) // bad month
    // engine agreement witness: the Spark expressions the direct path uses
    // produce the same millis for each accepted shape
    import spark.implicits._
    val shapes = Seq("2024-01-09T10:00:00Z", "2024-01-09 10:00:00.123",
      "2024-01-09", "2024", "1704794401000", "-86400000")
    val sparkMs = spark.sql(
      shapes.map(s => s"SELECT unix_millis(CAST(coalesce(try_to_timestamp('$s'), " +
        s"timestamp_millis(try_cast('$s' AS LONG))) AS TIMESTAMP)) AS ms")
        .mkString(" UNION ALL ")).as[Long].collect().toSeq
    assert(shapes.map(s => Graft.parseTimeString(s, utc).get) == sparkMs,
      s"driver=${shapes.map(s => Graft.parseTimeString(s, utc))} spark=$sparkMs")
  }

  test("residual PQ encodes tighter than raw-vector PQ at the same code size") {
    import org.apache.spark.sql.functions._
    // the claim that justifies ann_ivfpq_residual: identical code bytes
    // (m=4 subspaces x 16 codes), but the sub-codebooks quantize residuals
    // whose variance the coarse IVF quantizer already collapsed — measured
    // 0.741 -> 0.669 avg rel_err at sf0.001 (0.739 -> 0.669 at sf0.01)
    val raw = graft.ann.Ann.pqReconError(spark, Sf)
    val res = graft.ann.Ann.pqResReconError(spark, Sf)
    val rawAvg = raw.agg(avg(col("rel_err"))).head.getDouble(0)
    val resAvg = res.agg(avg(col("rel_err"))).head.getDouble(0)
    assert(resAvg < rawAvg, s"residual rel_err $resAvg !< raw $rawAvg")
    // same-denominator contract: the two reports use the same ||v||^2, so
    // they are comparable row by row, not just on average
    val mism = raw.select(col("vec_id"), col("norm2").as("n_raw"))
      .join(res.select(col("vec_id"), col("norm2").as("n_res")), "vec_id")
      .where(col("n_raw") =!= col("n_res")).count()
    assert(mism == 0, s"$mism vectors disagree on the norm denominator")
    // the decomposed score dot(q,c) + residual-ADC ranks real neighbors:
    // the residual path's top-5 overlaps the exhaustive float truth at
    // least as well as a deterministic floor (structure, not noise)
    val topk = graft.ann.Ann.ivfPqResidualTopK(spark, Sf)
    assert(topk.count() > 0)
    assert(topk.where(col("rank") > 5).count() == 0)
  }

  test("PPS sampler draws exactly k picks per group (telescoping invariant)") {
    import org.apache.spark.sql.functions._
    // sum of picks per group telescopes to points-below(W) - points-below(0)
    // = k exactly, independent of the weight distribution — the invariant
    // that makes the draw a fixed-size sample, not an expected-size one
    val perGroup = graft.operators.Analytics.samplePps(spark, Sf)
      .groupBy(col("segment")).agg(sum(col("picks")).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(perGroup.nonEmpty && perGroup.values.forall(_ == 10L),
      s"each segment must draw exactly 10: $perGroup")
    // the two-level stratified form telescopes at BOTH levels: level 1's
    // stratum allocations sum to k per group, level 2 draws each
    // allocation exactly — so the same invariant must hold end to end
    val twoLevel = graft.operators.Analytics.samplePps2Level(spark, Sf)
      .groupBy(col("segment")).agg(sum(col("picks")).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(twoLevel.nonEmpty && twoLevel.values.forall(_ == 10L),
      s"two-level: each segment must draw exactly 10: $twoLevel")
  }

  test("streaming heavy hitters: MG state across micro-batches equals the batch fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import graft.streaming.TopKStream
    // a skewed item stream: 'a' dominates, 'b' second, long tail of rare
    // items that must cycle through the decrement-all step
    val items = (0 until 40).map(i => "a") ++ (0 until 25).map(i => "b") ++
      (0 until 30).map(i => s"tail${i % 15}")
    val shuffled = new scala.util.Random(7).shuffle(items.toList).zipWithIndex
    val (batch1, batch2) = shuffled.splitAt(50)
    val mem = MemoryStream[(String, String, Long)]
    val out = TopKStream.topK(spark,
      mem.toDF().toDF("groupKey", "item", "seq"), capacity = 6, k = 3)
    val q = out.writeStream.format("memory").queryName("topk")
      .outputMode("update").start()
    mem.addData(batch1.map { case (it, i) => ("g", it, i.toLong) }: _*)
    q.processAllAvailable()
    mem.addData(batch2.map { case (it, i) => ("g", it, i.toLong) }: _*)
    q.processAllAvailable()
    q.stop()
    // the reference: the SAME reduce folded over the full ordered sequence
    // (what the batch HeavyHitters Aggregator computes on one partition)
    val ref = shuffled.sortBy(_._2).map(_._1)
      .foldLeft(Map.empty[String, Long])((m, it) => TopKStream.mgReduce(m, it, 6))
    val refTop = ref.toSeq.sortBy { case (i, c) => (-c, i) }.take(3)
    val last = spark.table("topk").where(col("n_seen") === items.size)
      .select(col("item"), col("approx_count"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy { case (i, c) => (-c, i) }
    assert(last.toSeq == refTop,
      s"stream state must equal the batch fold: stream=${last.toSeq} ref=$refTop")
    // the MG guarantee on the dominant item: undercount bounded by N/cap
    val aCount = last.toMap.getOrElse("a", 0L)
    assert(aCount >= 40L - items.size / 6, s"a=$aCount violates the MG bound")
  }

  test("streaming near-dup index: LSH flags match the batch keep-first relation, replay-safe") {
    import java.nio.file.{Files, Paths}
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions.col
    def tmp(n: String) = {
      val p = s"target/stream-test/neardup-$n-${System.nanoTime()}"
      Files.createDirectories(Paths.get(p)); p
    }
    val (idx, dec, ckpt) = (tmp("idx"), tmp("dec"), tmp("ckpt"))
    val a = "the quick brown fox jumps over the lazy dog while seven wizards " +
      "brew strong coffee under pale moonlight near the ancient stone bridge " +
      "across the silver river valley before dawn"
    val aNear = a.replace("coffee", "tea") // one-token edit: near, not exact
    val b = "orbital mechanics requires careful numerical integration of " +
      "perturbation forces acting on satellites across many revolutions " +
      "with drag harmonics and third body terms included everywhere"
    val c = "completely unrelated corpus text about cooking pasta with " +
      "garlic olive oil and fresh basil leaves in a wide shallow pan " +
      "over medium heat until fragrant and golden"
    val bNear = b.replace("satellites", "spacecraft")
    val corpus = Map(1L -> a, 2L -> b, 3L -> aNear, 4L -> c, 5L -> a, 6L -> bNear)

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = graft.streaming.NearDupStream.start(docs, idx, dec, ckpt)
    mem.addData((1L, a), (2L, b))
    q.processAllAvailable()
    // batch 2: a near-clone of an indexed doc, a novel doc, an exact clone
    mem.addData((3L, aNear), (4L, c), (5L, a))
    q.processAllAvailable(); q.stop()

    // the reference relation: batch LSH candidates over the same corpus
    // under the pairwise rule (a doc is a dup when ANY candidate pair
    // (a, d) with a < d exists — dedup_curve's removal semantics). This
    // is the rule that is micro-batch-boundary invariant for a
    // non-transitive collision relation, and the stream indexes every
    // doc's bands to implement exactly it.
    def expected(ids: Seq[Long]): Map[Long, Long] = {
      val pairs = graft.dedup.Dedup.minhashLshOn(
        graft.dedup.Dedup.shingleRowsOf(
          ids.map(i => (i, corpus(i))).toDF("doc_id", "text")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      ids.map(d => d -> (if (ids.exists(a => a < d && pairs.contains((a, d)))) 1L
                         else 0L)).toMap
    }
    def decisions() = graft.streaming.NearDupStream.decisionsOf(spark, dec)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(decisions() == expected(Seq(1L, 2L, 3L, 4L, 5L)),
      s"streamed flags must equal the batch pairwise relation: ${decisions()}")
    // the capability the exact hash misses: the one-token edit IS flagged
    assert(decisions()(3L) == 1L, "near-clone must be flagged")
    assert(decisions()(5L) == 1L && decisions()(4L) == 0L)

    // restart on the SAME checkpoint: a near-clone of batch-1 content is
    // still flagged against the persisted band index
    val q2 = graft.streaming.NearDupStream.start(docs, idx, dec, ckpt)
    mem.addData((6L, bNear))
    q2.processAllAvailable(); q2.stop()
    assert(decisions() == expected(Seq(1L, 2L, 3L, 4L, 5L, 6L)))
    assert(decisions()(6L) == 1L, "near-clone across restart must be flagged")
    // the index holds band rows for EVERY doc seen (batching invariance:
    // LSH collision is not transitive, so a kept-only index would decide
    // differently across batch boundaries)
    val idxDocs = spark.read.parquet(idx).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(idxDocs == decisions().keySet)
  }

  test("fragmentation report drives compaction: stamped multi-file buckets collapse") {
    import java.nio.file.{Files, Paths}
    val s = spark; import s.implicits._
    val root = Files.createTempDirectory(
      Paths.get("target"), "graft-frag").toString
    val g = new Graft(spark, root)
    // three separate writes into the same bucket day -> >= 3 stamped files
    (0 until 3).foreach { i =>
      g.write(spark.read.json(Seq(
        s"""{"time":${1704794400000L + i},"value":$i.0,"name":"cpu"}""").toDS()))
    }
    val before = g.fragmentation()
    assert(before.nonEmpty, "report must list the written bucket")
    assert(before.head._2 >= 3, s"expected >=3 files: $before")
    assert(before.head._4, "fresh writes carry stamps (merge window on reads)")
    val nBefore = g.read("""{"match_all":{}}""").count()
    g.compact()
    val after = g.fragmentation()
    assert(after.head._2 == 1 && !after.head._4,
      s"compacted bucket must be one stamp-free file: $after")
    // compaction is physical-layout-only: the data is unchanged
    assert(g.read("""{"match_all":{}}""").count() == nBefore)
  }

  test("yield funnel telescopes and the dedup curve is monotone") {
    import org.apache.spark.sql.functions.col
    // corpus_yield: stages apply to each other's survivors, so remaining
    // counts are non-increasing and remaining+dropped telescopes exactly
    val fun = graft.dedup.Dedup.corpusYield(spark, Sf)
      .orderBy(col("stage_ord")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(fun.length == 5 && fun.head._2 == "raw")
    fun.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur._3 <= prev._3, s"remaining must not grow: $prev -> $cur")
      assert(cur._3 + cur._4 == prev._3,
        s"remaining+dropped must telescope: $prev -> $cur")
    }
    // dedup_curve: raising the threshold can only shrink the surviving
    // pair set and the removal set
    val curve = graft.dedup.Dedup.dedupCurve(spark, Sf)
      .orderBy(col("tau")).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(curve.length == 10)
    curve.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._2 <= lo._2 && hi._3 <= lo._3,
        s"curve must be monotone non-increasing: $lo -> $hi")
    }
  }

  test("self-vote LPA merges duplicate pairs; communities are denser than random") {
    import org.apache.spark.sql.functions._
    // the oscillation regression: pure synchronous LPA leaves an isolated
    // duplicate PAIR split (labels swap forever); the self-vote converges
    // it — so the near-dup graph's modularity must be strongly positive
    // (Q -> 0.09 without the self-vote, 0.92 with it at this SF), and the
    // labeler must find at least one multi-member community
    val q = graft.operators.Graph.modularity(spark, Sf)
    val total = q.agg(sum(col("q_part"))).head.getDouble(0)
    assert(total > 0.5, s"modularity $total should be strongly positive")
    assert(q.where(col("n_members") >= 2).count() > 0,
      "at least one merged community (pairs must not stay split)")
  }
}
