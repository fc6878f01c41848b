package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Det
import graft.dedup.Dedup

/** Graph analytics over the near-duplicate candidate graph (vertices = docs,
  * edges = MinHash-LSH candidate pairs) — the same graph
  * [[graft.dedup.Dedup.clustersOn]] labels. PageRank surfaces the most
  * "central" documents of each near-dup cluster (canonical-pick signal);
  * triangle counts measure cluster density (a near-clique of k clones holds
  * C(k,3) triangles, a chain holds none — cheap evidence that a candidate
  * cluster is a true duplicate group rather than LSH noise).
  *
  * Determinism contract (same as the trained-ANN family): every
  * division-derived value is rounded to an exact decimal before it is summed,
  * so each PageRank iteration is association-order independent and the DuckDB
  * oracle replays all iterations bit-exactly as unrolled CTEs.
  */
object Graph {

  /** PageRank (damping 0.85) on the symmetrized candidate graph, `iters`
    * rounds from a uniform start. Per round: one join of the tiny rank table
    * to the edge list + one sum shuffle on the destination — the textbook
    * distributed PageRank shape (edges never move; ranks do). Ranks are
    * DECIMAL(12,8), re-rounded each round ([[Det.rnd]]).
    */
  def pagerank(s: SparkSession, d: String, iters: Int = 3): DataFrame = {
    val e0 = Dedup.minhashLsh(s, d).select(col("a_id"), col("b_id"))
    val edges = e0
      .union(e0.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .localCheckpoint(true) // reused every iteration; self-frees on GC
    val deg = edges.groupBy(col("a_id").as("id")).agg(count(lit(1)).as("deg"))
    val nv = deg.select(count(lit(1)).as("n_v"))
    // n_v rides along as a broadcast scalar column — no driver-side .first()
    var r = deg.crossJoin(nv).select(col("id"), col("deg"), col("n_v"),
      Det.rnd(lit(1.0) / col("n_v"), 8).cast("decimal(12,8)").as("r"))
    for (_ <- 0 until iters) {
      val contrib = edges.join(r, edges("a_id") === r("id"))
        .select(col("b_id").as("dst"),
          Det.rnd(col("r").cast("double") / col("deg"), 8).cast("decimal(12,8)").as("c"))
      val inSum = contrib.groupBy(col("dst")).agg(sum(col("c")).as("in_sum"))
      r = r.join(inSum, r("id") === inSum("dst"), "left")
        .select(col("id"), col("deg"), col("n_v"),
          Det.rnd(lit(0.15) / col("n_v") +
            lit(0.85) * coalesce(col("in_sum").cast("double"), lit(0.0)), 8)
            .cast("decimal(12,8)").as("r"))
        // r19: lazy — plan stays a truncated leaf per round, blocks
        // materialize inside the query's action (no per-round job barrier)
        .localCheckpoint(false) // tiny rank table; truncates per-round lineage
    }
    Det.ordered(r.select(col("id").as("doc_id"), col("deg").as("degree"),
      col("r").cast("double").as("pr")))
  }

  /** Label-propagation community detection (Raghavan et al. 2007) on the
    * symmetrized candidate graph — the lighter sibling of
    * [[graft.dedup.Dedup]]'s connected components: where CC merges anything
    * reachable (one bridge edge fuses two clone families), LPA's
    * majority-vote converges on DENSELY-linked groups, so a spurious LSH
    * bridge between two true duplicate clusters doesn't collapse them.
    * Synchronous iterations from self-labels, with each vertex's OWN label
    * in the vote (the self-loop variant): pure synchronous LPA oscillates
    * on bipartite structure — an isolated duplicate PAIR swaps labels every
    * round and never merges, the most common shape in a near-dup graph —
    * while the self-vote breaks the 2-cycle and converges pairs to the
    * smaller id in one round. Each round is one join of the tiny label
    * table to the stationary edge list + one (vertex, label) count
    * shuffle — edges never move, exactly PageRank's distribution shape.
    * Ties break on the smaller label, so every round (and therefore the
    * oracle's unrolled replay) is deterministic.
    */
  def labelPropagation(s: SparkSession, d: String, iters: Int = 3): DataFrame = {
    val e0 = Dedup.minhashLsh(s, d).select(col("a_id"), col("b_id"))
    val edges = e0
      .union(e0.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .localCheckpoint(true) // reused every iteration; self-frees on GC
    var lbl = edges.select(col("a_id").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
    for (_ <- 0 until iters) {
      // r19 (guide §2.4, VERDICT r18 #2): ONE exchange per vote round. The
      // vote stream is hash-partitioned by b_id once; the (b_id, lbl) count
      // and the per-vertex argmax both have their clustering satisfied by
      // that partitioning (b_id ⊆ {b_id, lbl}), so neither aggregate adds
      // an exchange — where the r18 shape paid exchange(b_id, lbl) for the
      // count plus exchange(b_id)+sort for the window. The argmax itself is
      // max_by over (n, −lbl): largest count first, then largest −lbl =
      // SMALLEST label — exactly the window's (n desc, lbl asc) tie-break,
      // and ties are impossible deeper because lbl is unique per group row.
      lbl = edges.join(lbl, col("a_id") === col("id"))
        .select(col("b_id"), col("lbl"))
        .union(lbl.select(col("id").as("b_id"), col("lbl"))) // self-vote
        .repartition(col("b_id"))
        .groupBy(col("b_id"), col("lbl"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("b_id"))
        .agg(max_by(col("lbl"), struct(col("n"), -col("lbl"))).as("lbl"))
        .select(col("b_id").as("id"), col("lbl"))
        // r19: LAZY checkpoint — the returned plan is already a truncated
        // LogicalRDD leaf (so per-round planning stays O(1)), but the
        // blocks materialize inside the query's own action instead of one
        // eager job barrier per round (the round count here is fixed
        // oracle semantics; only the per-round plan changed)
        .localCheckpoint(false) // tiny label table; truncates round lineage
    }
    val sizes = lbl.groupBy(col("lbl")).agg(count(lit(1)).as("community_size"))
    val out = lbl.join(sizes, "lbl")
      .select(col("id").as("doc_id"), col("lbl").as("community"),
        col("community_size"))
    Det.ordered(out)
  }

  /** Newman modularity of the [[labelPropagation]] communities — the
    * metric that tells whether the labels found STRUCTURE (every index in
    * this engine ships with its quality report: recall for ANN, occupancy
    * for IVF, recon error for PQ; this is the community labeler's). Per
    * community c: q_part = e_c/m − (d_c/2m)², where e_c = intra-community
    * edges, d_c = the community's degree mass, m = undirected edge count;
    * Σ q_part is Newman's Q (positive ⇒ denser than the degree-preserving
    * random graph). Two broadcast-sized aggregates over the stationary
    * edge list — nothing touches pair space beyond the edges themselves.
    */
  def modularity(s: SparkSession, d: String, iters: Int = 3): DataFrame = {
    // minhashLsh is already memoized + checkpointed (Dedup.scala); an extra
    // localCheckpoint here would eagerly materialize a second sorted copy
    // of the full pair table per call (review finding, this round)
    val e0 = Dedup.minhashLsh(s, d).select(col("a_id"), col("b_id"))
    val lbl = labelPropagation(s, d, iters)
      .select(col("doc_id"), col("community"))
      .localCheckpoint(true) // small label table, scanned by two aggregates
    val m = e0.agg(count(lit(1)).as("m_edges"))
    val intra = e0
      .join(lbl.select(col("doc_id").as("a_id"), col("community").as("ca")), "a_id")
      .join(lbl.select(col("doc_id").as("b_id"), col("community").as("cb")), "b_id")
      .where(col("ca") === col("cb"))
      .groupBy(col("ca").as("community"))
      .agg(count(lit(1)).as("intra_edges"))
    val deg = e0.select(col("a_id").as("doc_id"))
      .union(e0.select(col("b_id").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("deg"))
    val base = lbl.join(deg, "doc_id")
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_members"), sum(col("deg")).as("deg_sum"))
    val half = col("deg_sum") / (lit(2) * col("m_edges"))
    val out = base
      .join(intra, Seq("community"), "left")
      .select(col("community"), col("n_members"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"), col("deg_sum"))
      .crossJoin(m) // 1-row scalar, the in-plan-scalar idiom
      .select(col("community"), col("n_members"), col("intra_edges"), col("deg_sum"),
        Det.rnd(col("intra_edges") / col("m_edges") - half * half, 6).as("q_part"))
    Det.ordered(out)
  }

  /** Per-vertex triangle counts on the candidate graph: triangles come from
    * the oriented (a<b<c) three-way join over the deduplicated edge list —
    * each triangle found exactly once, then credited to all three corners.
    * At scale this is the standard edge-oriented triangle enumeration: the
    * join keys are vertex ids (shuffle-friendly) and the oriented edge list
    * keeps every join side smaller than the raw adjacency.
    */
  def triangleCounts(s: SparkSession, d: String): DataFrame = {
    val e = Dedup.minhashLsh(s, d).select(col("a_id"), col("b_id"))
      .localCheckpoint(true)
    val tri = e.as("e1").join(e.as("e2"), col("e2.a_id") === col("e1.b_id"))
      .join(e.as("e3"),
        col("e3.a_id") === col("e1.a_id") && col("e3.b_id") === col("e2.b_id"))
      .select(col("e1.a_id").as("x"), col("e1.b_id").as("y"), col("e2.b_id").as("z"))
    val out = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_triangles"))
    Det.ordered(out)
  }

  /** Structural (neighbor-set Jaccard) node similarity — the
    * link-prediction primitive: two documents are structurally similar when
    * their near-duplicate NEIGHBORHOODS overlap, even if they never shared
    * a band themselves. Pairs generate through shared neighbors (bounded by
    * per-neighbor degree², the same hot-key profile as the inverted-index
    * joins — at 100 TB a degree cap drops hub neighbors first), then exact
    * Jaccard over degree counts.
    */
  def structuralSimilarity(s: SparkSession, d: String): DataFrame = {
    // localCheckpoint, not cache(): the edge frame is consumed only through
    // the returned plan, so a CacheManager entry would outlive the query
    // (ADVICE r5) — checkpoint blocks free themselves when the plan is GC'd
    val e = Dedup.minhashLsh(s, d).localCheckpoint(true)
    val ed = e.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(e.select(col("b_id").as("src"), col("a_id").as("dst")))
    val deg = ed.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val shared = ed.as("x").join(ed.as("y"),
        col("x.dst") === col("y.dst") && col("x.src") < col("y.src"))
      .groupBy(col("x.src").as("a_id"), col("y.src").as("b_id"))
      .agg(count(lit(1)).as("n_shared"))
    val out = shared
      .join(deg.select(col("id").as("a_id"), col("deg").as("a_deg")), "a_id")
      .join(deg.select(col("id").as("b_id"), col("deg").as("b_deg")), "b_id")
      .select(col("a_id"), col("b_id"), col("n_shared"),
        Det.rnd(col("n_shared") * lit(1.0) /
          (col("a_deg") + col("b_deg") - col("n_shared")), 4).as("neighbor_jaccard"))
    Det.ordered(out)
  }

  /** [[structuralSimilarity]] with a hub-degree cap — the plan that survives
    * 100 TB. The shared-neighbor self-join is quadratic in the hottest
    * vertex's degree (a hub with n neighbors emits ~n² pair rows, and
    * [[degreeDist]] exists precisely because dedup graphs are heavy-tailed),
    * so edges INTO vertices of degree > `maxDeg` are dropped before the
    * self-join: a hub neighbor is shared by everything and carries no
    * discriminative signal — the same rationale as the df cap in
    * [[graft.dedup.Dedup.containmentPairsCapped]]. Neighborhood Jaccard is
    * then exact over the surviving (non-hub-mediated) neighborhoods, and
    * per-neighbor join width is bounded by maxDeg² independent of graph
    * size. With maxDeg above the true max degree this is exactly
    * [[structuralSimilarity]].
    */
  def structuralSimilarityCapped(s: SparkSession, d: String,
                                 maxDeg: Int = 50): DataFrame =
    structuralSimilarityCappedOn(Dedup.minhashLsh(s, d), maxDeg)

  /** Same, over any (a_id, b_id) candidate edge set — reused by the
    * clone-inflation scale experiment so it measures the exact production
    * plan.
    */
  def structuralSimilarityCappedOn(e0: DataFrame, maxDeg: Int): DataFrame = {
    val e = e0.localCheckpoint(true)
    val ed = e.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(e.select(col("b_id").as("src"), col("a_id").as("dst")))
    val deg = ed.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    // hub filter: drop edges whose DST (the shared-neighbor candidate) is a
    // hub, BEFORE the self-join that multiplies per-dst edge counts
    val kept = ed.join(
        deg.where(col("deg") <= maxDeg).select(col("id").as("dst")), "dst")
      .localCheckpoint(true)
    // degrees over the surviving edges, so the Jaccard stays an exact ratio
    // of the capped neighborhoods (the containmentPairsCapped contract)
    val cdeg = kept.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val shared = kept.as("x").join(kept.as("y"),
        col("x.dst") === col("y.dst") && col("x.src") < col("y.src"))
      .groupBy(col("x.src").as("a_id"), col("y.src").as("b_id"))
      .agg(count(lit(1)).as("n_shared"))
    val out = shared
      .join(cdeg.select(col("id").as("a_id"), col("deg").as("a_deg")), "a_id")
      .join(cdeg.select(col("id").as("b_id"), col("deg").as("b_deg")), "b_id")
      .select(col("a_id"), col("b_id"), col("n_shared"),
        Det.rnd(col("n_shared") * lit(1.0) /
          (col("a_deg") + col("b_deg") - col("n_shared")), 4).as("neighbor_jaccard"))
    Det.ordered(out)
  }

  /** Degree distribution of the similarity graph: how many documents have
    * how many near-duplicate neighbors — the shape diagnostic (a heavy tail
    * here predicts the hot-key blowups every pairwise dedup must survive).
    * Two tiny aggregates over the candidate edge list.
    */
  def degreeDist(s: SparkSession, d: String): DataFrame = {
    val e = Dedup.minhashLsh(s, d)
    val deg = e.select(col("a_id").as("id"))
      .union(e.select(col("b_id").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val out = deg.groupBy(col("deg")).agg(count(lit(1)).as("n_nodes"))
    Det.ordered(out)
  }
}
