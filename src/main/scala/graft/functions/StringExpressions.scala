package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Optimal String Alignment (restricted Damerau-Levenshtein) distance —
  * Levenshtein plus single adjacent transpositions, each substring edited at
  * most once. This is the edit distance Lucene's fuzzy automata use with the
  * Elasticsearch default `transpositions: true` (a plain `levenshtein` would
  * miss 'cilck' ~ 'click' at distance 1), so it is what the ES `fuzzy`
  * filter compiles to. Evaluates inside the scan stage: codegen calls the
  * same static kernel as the interpreted path.
  */
case class OsaDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_osa expects (string, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_osa"

  override def nullSafeEval(l: Any, r: Any): Any =
    OsaDistance.osa(l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.OsaDistance.osa($a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Lucene sloppy-phrase / span_near / intervals matcher as a native
  * expression — the same semantics as [[graft.tsdb.EsFilter]]'s
  * higher-order-function formulation (its documented fallback), compiled to
  * one JVM kernel call per row instead of an interpreted Catalyst HOF tree
  * per row: the query terms must map to DISTINCT token positions
  * p_0..p_{n-1} (term i at p_i; with `prefix`, the last term matches as a
  * token prefix) with match width
  * `max_i(p_i - i) - min_i(p_i - i) <= slop`; with `inOrder` (the span_near
  * form) positions must be strictly increasing and the budget is the total
  * intervening-position count `(p_{n-1} - p_0) - (n - 1) <= slop`; with
  * `gaps` (the unordered `intervals` form) order is free and the budget is
  * the covering-interval gap count `(max_i(p_i) - min_i(p_i)) - (n - 1) <=
  * slop` (Lucene's UnorderedIntervalsSource width rule).
  * `terms` ride as a construction-time constant (always literal in the ES
  * DSL), so codegen passes them as a referenced object, not a per-row child.
  */
case class SloppyMatch(child: Expression, terms: String, slop: Int,
                       inOrder: Boolean, prefix: Boolean,
                       gaps: Boolean = false,
                       filterMode: String = "", filterTerms: String = "",
                       script: (Int, Int, Int) => Boolean = null)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sloppy expects a string field, got ${child.dataType.simpleString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_sloppy"

  override def nullSafeEval(v: Any): Any =
    SloppyMatch.matches(v.asInstanceOf[UTF8String].toString,
      terms, slop, inOrder, prefix, gaps, filterMode, filterTerms, script)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("sloppyTerms", terms, "java.lang.String")
    val fm = ctx.addReferenceObj("sloppyFilterMode", filterMode, "java.lang.String")
    val ft = ctx.addReferenceObj("sloppyFilterTerms", filterTerms, "java.lang.String")
    // the script predicate rides the codegen references array (serialized
    // with the plan like any literal), so the script-filter path is as
    // cluster-correct as the string args — no executor-side registry needed
    val sc =
      if (script == null) "null"
      else ctx.addReferenceObj("sloppyScript", script, "scala.Function3")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.SloppyMatch.matches($s.toString(), " +
        s"$t, $slop, $inOrder, $prefix, $gaps, $fm, $ft, (scala.Function3) $sc);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One position SLOT of a sloppy/span match: a document position can fill
  * the slot when its token matches ANY of `includes` exactly OR starts with
  * any of `prefixes` (the intervals `prefix` rule — Lucene expands the
  * prefix to its term set, equivalently a startsWith position test), and NO
  * token matching an `excludes` entry sits within `[p - pre, p + post]`
  * (Lucene SpanNotQuery's overlap window on single-token spans). Plain
  * phrase terms are slots with empty excludes and no prefixes.
  *
  * A slot with non-empty `phrase` is instead a FIXED-PHRASE interval
  * (Lucene `Intervals.phrase`, the `all_of` sub-source form `ordered:true,
  * max_gaps:0`): it fills at start position s when the tokens at
  * `s..s+len-1` equal the phrase exactly, and it occupies that whole
  * interval in the budget math — ordered gap budgets count from its END,
  * the unordered covering budget subtracts its full width, and chosen
  * intervals must not overlap (the single-token distinct-positions rule
  * generalized). Phrase slots carry no alternatives/excludes/prefixes.
  */
/** One fuzzy alternative of a slot: a token fills it when its first
  * `prefixLen` characters equal the term's (Lucene's `prefix_length` — the
  * pinned prefix takes no edits) and the remainders are within `dist`
  * edits — OSA when `transpositions` (the ES default `true`), plain
  * Levenshtein otherwise (r12: both knobs implemented, closing the last
  * rejected fuzzy forms).
  */
case class FuzzySpec(term: String, dist: Int, transpositions: Boolean = true,
                     prefixLen: Int = 0)

case class SloppySlot(includes: Seq[String], excludes: Seq[String],
                      pre: Int, post: Int, prefixes: Seq[String] = Nil,
                      phrase: Seq[String] = Nil, subSlop: Int = -1,
                      subOrdered: Boolean = false,
                      wildcards: Seq[String] = Nil,
                      fuzzies: Seq[FuzzySpec] = Nil) {
  /** Nominal (minimum-possible) interval width: 1 for token slots, the
    * token count for fixed phrases and nested sub-matches (a nested
    * interval is at least as wide as its token count). */
  def width: Int = if (phrase.nonEmpty) phrase.length else 1
  /** A nested sloppy sub-interval (an `all_of` sub-match with its OWN gap
    * budget — Lucene's Ordered/UnorderedIntervalsSource nested inside the
    * enclosing source): tokens in `phrase`, budget `subSlop`, order
    * `subOrdered`. Its candidates are the sub-match's MINIMAL intervals
    * (Lucene iterators yield minimal intervals), each occupying its actual
    * width in the enclosing budget. A fixed phrase is the degenerate
    * subSlop=0/ordered case kept as its own fast path. */
  def nested: Boolean = subSlop >= 0
}

object SloppySlot {
  /** Wire format for the `graft_sloppy` terms argument: slots joined by a
    * space; each slot `inc1|inc2` or `inc1|inc2~exc1|exc2~pre~post`, with
    * prefix alternatives carrying a trailing `*` marker (`co*`), a
    * fixed-phrase slot `tok1+tok2+tok3`, or a nested sloppy sub-match
    * `tok1+tok2^slop^o` (o = 1 ordered / 0 unordered). The separators and
    * markers cannot appear inside analyzed tokens (the analyzer splits on
    * whitespace and these filters target word terms), and encode REJECTS
    * terms containing them rather than mis-parsing.
    */
  // alternative-type tags for wildcard / fuzzy entries in the alternatives
  // segment — control chars that never survive whitespace analysis, so no
  // legitimate analyzed token collides with them
  private val WildTag = '\u0001'
  private val FuzzTag = '\u0002'

  def encode(slots: Seq[SloppySlot]): String = {
    slots.foreach { sl =>
      require(sl.phrase.nonEmpty || sl.includes.nonEmpty || sl.prefixes.nonEmpty ||
        sl.wildcards.nonEmpty || sl.fuzzies.nonEmpty,
        "slot needs at least one include term, prefix, wildcard, fuzzy, or phrase")
      require(sl.phrase.isEmpty ||
        (sl.includes.isEmpty && sl.excludes.isEmpty && sl.prefixes.isEmpty &&
          sl.wildcards.isEmpty && sl.fuzzies.isEmpty),
        "phrase slots carry no alternatives, excludes, or prefixes")
      require(!sl.nested || sl.phrase.length >= 2,
        "nested sub-match slots need at least two tokens")
      (sl.includes ++ sl.excludes ++ sl.prefixes ++ sl.phrase ++
        sl.fuzzies.map(_.term)).foreach(t => require(
        t.nonEmpty && !t.exists(c =>
          c == '|' || c == '~' || c == '*' || c == '+' || c == '^' ||
            c == WildTag || c == FuzzTag || c.isWhitespace),
        s"unsupported characters in span/phrase term: '$t'"))
      // wildcard patterns legitimately carry * and ? (they ride tagged, so
      // no marker collision) but still may not hold the slot separators
      sl.wildcards.foreach(w => require(
        w.nonEmpty && !w.exists(c =>
          c == '|' || c == '~' || c == '+' || c == '^' ||
            c == WildTag || c == FuzzTag || c.isWhitespace),
        s"unsupported characters in wildcard pattern: '$w'"))
      sl.fuzzies.foreach { fs =>
        require(fs.dist >= 0 && fs.prefixLen >= 0,
          "fuzzy distance and prefix length must be non-negative") }
    }
    slots.map { sl =>
      if (sl.nested)
        s"${sl.phrase.mkString("+")}^${sl.subSlop}^${if (sl.subOrdered) 1 else 0}"
      else if (sl.phrase.nonEmpty) sl.phrase.mkString("+")
      else {
        val inc = (sl.includes ++ sl.prefixes.map(_ + "*") ++
          sl.wildcards.map(WildTag + _) ++
          sl.fuzzies.map(fs => s"$FuzzTag${fs.dist}:" +
            s"${if (fs.transpositions) 1 else 0}:${fs.prefixLen}$FuzzTag${fs.term}"))
          .mkString("|")
        if (sl.excludes.isEmpty) inc
        else s"$inc~${sl.excludes.mkString("|")}~${sl.pre}~${sl.post}"
      }
    }.mkString(" ")
  }

  def decode(s: String): Array[SloppySlot] =
    s.split(" ").map { part =>
      if (part.contains('^')) {
        val seg = part.split('^')
        SloppySlot(Nil, Nil, 0, 0, Nil, seg(0).split('+').toSeq,
          seg(1).toInt, seg(2) == "1")
      } else if (part.contains('+'))
        SloppySlot(Nil, Nil, 0, 0, Nil, part.split('+').toSeq)
      else {
        val seg = part.split("~")
        val alts = seg(0).split('|').toSeq
        val wild = alts.filter(_.head == WildTag).map(_.tail)
        val fuzz = alts.filter(_.head == FuzzTag).map { a =>
          val body = a.tail
          val cut = body.indexOf(FuzzTag)
          val knobs = body.substring(0, cut).split(':')
          FuzzySpec(body.substring(cut + 1), knobs(0).toInt,
            knobs(1) == "1", knobs(2).toInt)
        }
        val plain = alts.filterNot(a => a.head == WildTag || a.head == FuzzTag)
        val (pfx, inc) = plain.partition(_.endsWith("*"))
        val slot =
          if (seg.length == 1) SloppySlot(inc, Nil, 0, 0)
          else SloppySlot(inc, seg(1).split('|').toSeq, seg(2).toInt, seg(3).toInt)
        slot.copy(prefixes = pfx.map(_.dropRight(1)),
          wildcards = wild, fuzzies = fuzz)
      }
    }

  /** ES wildcard pattern (`*`, `?`) -> anchored Java regex (the same
    * conversion the wildcard QUERY applies; owned here so the kernel stays
    * independent of the filter compiler).
    */
  def wildcardRegex(pat: String): String = {
    val sb = new StringBuilder("^")
    pat.foreach {
      case '*' => sb.append(".*")
      case '?' => sb.append('.')
      case c if "\\.[]{}()<>+-=!$^|,#&~".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    sb.append('$').toString()
  }
}

object SloppyMatch {
  /** Does a token fill a fuzzy alternative? Lucene's prefix_length rule:
    * the pinned prefix (capped at the term length) must match exactly and
    * takes no edits; the remainders are compared at the slot's distance —
    * OSA with transpositions (the ES default), plain Levenshtein without.
    * Cheap length gate before the O(len²) DP.
    */
  private[functions] def fuzzyMatches(tok: String, fs: FuzzySpec): Boolean = {
    val pl = math.min(fs.prefixLen, fs.term.length)
    if (pl > 0 && (tok.length < pl || !tok.regionMatches(0, fs.term, 0, pl)))
      return false
    val a = if (pl == 0) tok else tok.substring(pl)
    val b = if (pl == 0) fs.term else fs.term.substring(pl)
    if (math.abs(a.length - b.length) > fs.dist) return false
    (if (fs.transpositions) OsaDistance.osa(a, b) else OsaDistance.lev(a, b)) <= fs.dist
  }

  /** One kernel shared by codegen and the interpreter. Tokenization mirrors
    * Spark's `split(lower(field), "\\s+")` (limit -1 keeps trailing
    * empties), then a DFS assignment search over each slot's candidate
    * INTERVAL list — positions (p, p) for token slots, (s, s+len−1) for
    * fixed phrases, the sub-match's minimal intervals for nested slots —
    * with sound pruning: the adjusted-position range (out-of-order), the
    * running gap total (in-order) and the raw-endpoint range (`gaps` mode)
    * only grow as intervals are bound, so a branch over budget can never
    * recover.
    *
    * Filter rules run per MINIMAL interval, like Lucene's iterators: a
    * positive rule (containing / contained_by / overlapping / after /
    * before) accepts an assignment only when its cover both stands in the
    * rule's relation to some filter interval AND is minimal — no other
    * valid assignment's cover sits strictly inside it (Lucene suppresses
    * non-minimal intervals before filtering; ADVICE r10 #2's witness:
    * 'alpha beta alpha gamma' with match 'alpha gamma' filter containing
    * 'beta' does NOT match, because the minimal cover [2,3] holds no beta
    * and the beta-containing cover [0,3] is suppressed). The not_ forms
    * need no minimality pass: a cover avoiding the relation exists iff a
    * minimal one does (shrinking a cover only removes relations).
    */
  def matches(field: String, termsStr: String, slop: Int,
              inOrder: Boolean, prefix: Boolean,
              gaps: Boolean = false,
              filterMode: String = "", filterTerms: String = "",
              script: (Int, Int, Int) => Boolean = null): Boolean = {
    val toks = field.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
    val slots = SloppySlot.decode(termsStr)
    val n = slots.length
    // nominal widths: 1 for token slots, phrase length for phrase/nested
    // slots. cumW(i) = Σ_{m<i} width(m) generalizes the adjusted position
    // p − i for the sloppy-phrase mode (whose slots are all fixed-width —
    // nested variable-width slots only occur under inOrder/gaps).
    val w = new Array[Int](n)
    val cumW = new Array[Int](n)
    var wTot = 0
    var i = 0
    while (i < n) { w(i) = slots(i).width; cumW(i) = wTot; wTot += w(i); i += 1 }
    require(inOrder || gaps || slots.forall(!_.nested),
      "nested sub-match slots need the ordered or unordered intervals mode")
    // candidate intervals per slot
    val candS = new Array[Array[Int]](n)
    val candE = new Array[Array[Int]](n)
    i = 0
    while (i < n) {
      val sl = slots(i)
      if (sl.nested) {
        val (ss, ee) = minimalCovers(toks, sl.phrase, sl.subSlop, sl.subOrdered)
        candS(i) = ss; candE(i) = ee
      } else {
        val isPrefix = prefix && i == n - 1
        val wre = sl.wildcards.map(w =>
          java.util.regex.Pattern.compile(SloppySlot.wildcardRegex(w))).toArray
        def phraseAt(j: Int): Boolean = {
          if (j + sl.phrase.length > toks.length) return false
          var o = 0
          while (o < sl.phrase.length) {
            if (toks(j + o) != sl.phrase(o)) return false
            o += 1
          }
          true
        }
        def incMatch(j: Int): Boolean = {
          if (sl.phrase.nonEmpty) return phraseAt(j)
          var a = 0
          while (a < sl.includes.length) {
            if (if (isPrefix) toks(j).startsWith(sl.includes(a))
                else toks(j) == sl.includes(a)) return true
            a += 1
          }
          a = 0
          while (a < sl.prefixes.length) {
            if (toks(j).startsWith(sl.prefixes(a))) return true
            a += 1
          }
          a = 0
          while (a < wre.length) {
            if (wre(a).matcher(toks(j)).matches()) return true
            a += 1
          }
          a = 0
          while (a < sl.fuzzies.length) {
            if (fuzzyMatches(toks(j), sl.fuzzies(a))) return true
            a += 1
          }
          false
        }
        def exclNear(p: Int): Boolean = {
          var q = math.max(0, p - sl.pre)
          val hi = math.min(toks.length - 1, p + sl.post)
          while (q <= hi) {
            var a = 0
            while (a < sl.excludes.length) {
              if (toks(q) == sl.excludes(a)) return true
              a += 1
            }
            q += 1
          }
          false
        }
        // single pass per position: incMatch may run the O(len²) OSA
        // kernel per fuzzy alternative — never evaluate it twice
        val ps = scala.collection.mutable.ArrayBuffer.empty[Int]
        var j = 0
        while (j < toks.length) {
          if (incMatch(j) && !exclNear(j)) ps += j
          j += 1
        }
        candS(i) = ps.toArray
        candE(i) = candS(i).map(_ + w(i) - 1)
      }
      // conjunctive guard: every slot must be fillable
      if (candS(i).length == 0) return false
      i += 1
    }
    // MAXIMUM candidate width per slot and its suffix sum — the sound
    // credit for what future slots may still subtract from the unordered
    // covering budget. A wider future interval can sit INSIDE the partial
    // cover, adding width without extending it, so the final gap count can
    // undershoot any estimate using smaller widths: final gaps ≥
    // partialCover − (boundWidths + Σ maxFutureWidths), and only THAT
    // lower bound may prune (a min-width credit rejected valid matches —
    // caught by code review r11, regression-tested in Round11Spec). For
    // all-width-1 slots max == min and the prune is exact, as before.
    val sufMaxW = new Array[Int](n + 1)
    i = n - 1
    while (i >= 0) {
      var mw = 0
      var k = 0
      while (k < candS(i).length) {
        val cw = candE(i)(k) - candS(i)(k) + 1
        if (cw > mw) mw = cw
        k += 1
      }
      sufMaxW(i) = sufMaxW(i + 1) + mw
      i -= 1
    }
    // intervals filter rule: candidate intervals of the single filter slot
    // (token alternatives, a fixed phrase, or a nested sub-match)
    var fS: Array[Int] = null
    var fE: Array[Int] = null
    if (filterMode.nonEmpty && filterMode != "script") {
      val fsl = SloppySlot.decode(filterTerms)(0)
      if (fsl.nested) {
        val (ss, ee) = minimalCovers(toks, fsl.phrase, fsl.subSlop, fsl.subOrdered)
        fS = ss; fE = ee
      } else {
        val fwre = fsl.wildcards.map(w =>
          java.util.regex.Pattern.compile(SloppySlot.wildcardRegex(w))).toArray
        def fMatch(j: Int): Boolean = {
          if (fsl.phrase.nonEmpty) {
            if (j + fsl.phrase.length > toks.length) return false
            var o = 0
            while (o < fsl.phrase.length) {
              if (toks(j + o) != fsl.phrase(o)) return false
              o += 1
            }
            true
          } else {
            var a = 0
            while (a < fsl.includes.length) {
              if (toks(j) == fsl.includes(a)) return true
              a += 1
            }
            a = 0
            while (a < fsl.prefixes.length) {
              if (toks(j).startsWith(fsl.prefixes(a))) return true
              a += 1
            }
            a = 0
            while (a < fwre.length) {
              if (fwre(a).matcher(toks(j)).matches()) return true
              a += 1
            }
            a = 0
            while (a < fsl.fuzzies.length) {
              if (fuzzyMatches(toks(j), fsl.fuzzies(a))) return true
              a += 1
            }
            false
          }
        }
        val fps = scala.collection.mutable.ArrayBuffer.empty[Int]
        var j = 0
        while (j < toks.length) { if (fMatch(j)) fps += j; j += 1 }
        fS = fps.toArray
        fE = fS.map(_ + fsl.width - 1)
      }
      if (!filterMode.startsWith("not_") && fS.length == 0) return false
    }
    // one assignment search, reusable as the minimality probe: when
    // `strictWithin`, it asks whether ANY valid assignment's cover sits
    // strictly inside [loS, hiE] (the filter rule is NOT applied there —
    // minimality is a property of the source's intervals alone).
    def search(loS: Int, hiE: Int, strictWithin: Boolean): Boolean = {
      val chS = new Array[Int](n)
      val chE = new Array[Int](n)
      def accept(): Boolean = {
        var cs = Int.MaxValue
        var ce = -1
        var m = 0
        while (m < n) {
          if (chS(m) < cs) cs = chS(m)
          if (chE(m) > ce) ce = chE(m)
          m += 1
        }
        if (strictWithin) return cs > loS || ce < hiE
        if (filterMode.isEmpty) return true
        if (filterMode == "script") {
          // Lucene's Intervals.filter(script) shape: the predicate sees
          // interval.start / interval.end / interval.gaps of each MINIMAL
          // interval (gaps = interior positions not covered by the chosen
          // sub-intervals); keep the document when some minimal interval
          // passes
          var wSum = 0
          var m2 = 0
          while (m2 < n) { wSum += chE(m2) - chS(m2) + 1; m2 += 1 }
          return script(cs, ce, (ce - cs + 1) - wSum) &&
            !search(cs, ce, strictWithin = true)
        }
        var found = false
        var t = 0
        while (t < fS.length && !found) {
          val js = fS(t)
          val je = fE(t)
          found = filterMode match {
            case "containing" | "not_containing"     => js >= cs && je <= ce
            case "contained_by" | "not_contained_by" => js <= cs && je >= ce
            case "overlapping" | "not_overlapping"   => js <= ce && je >= cs
            case "after"                             => cs > je
            case "before"                            => ce < js
            case other => throw new IllegalStateException(
              s"unknown intervals filter mode: $other")
          }
          t += 1
        }
        if (filterMode.startsWith("not_")) !found
        // positive rules fire per minimal interval: a cover with another
        // valid cover strictly inside is suppressed, keep searching
        else found && !search(cs, ce, strictWithin = true)
      }
      // minB/maxB track the range bound so far: adjusted starts s_k −
      // cumW(k) out-of-order (for all-width-1 slots the classic p_k − k),
      // RAW interval endpoints in `gaps` mode (min start / max end — the
      // covering budget (maxEnd − minStart + 1) − Σwidths ≤ slop, pruned
      // early via the future-width lower bound sufMinW). gapsAcc carries
      // the ordered mode's running total of intervening positions; wAcc
      // the widths bound so far (nested intervals vary in width).
      def dfs(i: Int, minB: Int, maxB: Int, gapsAcc: Int, wAcc: Int): Boolean = {
        if (i == n) return accept()
        val ss = candS(i)
        val ee = candE(i)
        var k = 0
        while (k < ss.length) {
          val s = ss(k)
          val e = ee(k)
          if (s >= loS && e <= hiE) {
            // chosen intervals must not overlap — for width-1 slots exactly
            // the distinct-positions rule
            var free = true
            var m = 0
            while (m < i && free) {
              if (s <= chE(m) && e >= chS(m)) free = false
              m += 1
            }
            if (free) {
              val stepGaps =
                if (!inOrder || i == 0) 0 else s - chE(i - 1) - 1
              val ok =
                if (inOrder)
                  // strictly after the previous interval's end, with the
                  // total intervening-position budget still affordable
                  (i == 0 || s > chE(i - 1)) && gapsAcc + stepGaps <= slop
                else if (i == 0) true // first binding: the cover is one interval
                else if (gaps)
                  (math.max(maxB, e) - math.min(minB, s) + 1) -
                    (wAcc + (e - s + 1) + sufMaxW(i + 1)) <= slop
                else {
                  val adj = s - cumW(i)
                  math.max(maxB, adj) - math.min(minB, adj) <= slop
                }
              if (ok) {
                chS(i) = s
                chE(i) = e
                val (lo, hi) = if (gaps) (s, e) else { val adj = s - cumW(i); (adj, adj) }
                if (dfs(i + 1,
                    if (i == 0) lo else math.min(minB, lo),
                    if (i == 0) hi else math.max(maxB, hi),
                    gapsAcc + stepGaps, wAcc + (e - s + 1))) return true
              }
            }
          }
          k += 1
        }
        false
      }
      dfs(0, 0, 0, 0, 0)
    }
    search(0, Int.MaxValue, strictWithin = false)
  }

  /** All MINIMAL intervals of a sub-match (exact terms, gap budget `slop`,
    * `ordered` or not) over the token array — the candidates a nested
    * `all_of` sub-source contributes, and what Lucene's interval iterators
    * emit. Enumerates valid assignments (distinct positions; ordered ⇒
    * strictly increasing; covering gap count (max − min + 1) − k ≤ slop,
    * which for in-order positions equals the total-intervening-positions
    * budget), collects their covers, and keeps the covers with no other
    * valid cover strictly inside. Returned sorted by start.
    */
  private[graft] def minimalCovers(toks: Array[String], terms: Seq[String],
                                   slop: Int, ordered: Boolean): (Array[Int], Array[Int]) = {
    val k = terms.length
    val pos = new Array[Array[Int]](k)
    var i = 0
    while (i < k) {
      val t = terms(i)
      var cnt = 0
      var j = 0
      while (j < toks.length) { if (toks(j) == t) cnt += 1; j += 1 }
      if (cnt == 0) return (Array.empty[Int], Array.empty[Int])
      val ps = new Array[Int](cnt)
      var m = 0
      j = 0
      while (j < toks.length) { if (toks(j) == t) { ps(m) = j; m += 1 }; j += 1 }
      pos(i) = ps
      i += 1
    }
    val covers = new java.util.HashSet[Long]()
    val ch = new Array[Int](k)
    def dfs(i: Int, lo: Int, hi: Int): Unit = {
      if (i == k) { covers.add(lo.toLong << 32 | hi.toLong); return }
      val ps = pos(i)
      var m = 0
      while (m < ps.length) {
        val p = ps(m)
        var free = true
        var q = 0
        while (q < i && free) { if (ch(q) == p) free = false; q += 1 }
        if (free && (!ordered || i == 0 || p > ch(i - 1))) {
          val nlo = if (i == 0) p else math.min(lo, p)
          val nhi = if (i == 0) p else math.max(hi, p)
          // sound prune: the cover only widens; its final gap count
          // (cover − k) already exceeding the budget can't recover
          if ((nhi - nlo + 1) - k <= slop) {
            ch(i) = p
            dfs(i + 1, nlo, nhi)
          }
        }
        m += 1
      }
    }
    dfs(0, 0, 0)
    val all = covers.toArray(new Array[java.lang.Long](0)).map(_.longValue())
    val keep = all.filter { c =>
      val (cs, ce) = ((c >> 32).toInt, (c & 0xffffffffL).toInt)
      !all.exists { o =>
        val (os, oe) = ((o >> 32).toInt, (o & 0xffffffffL).toInt)
        os >= cs && oe <= ce && (os > cs || oe < ce)
      }
    }.sorted
    (keep.map(c => (c >> 32).toInt), keep.map(c => (c & 0xffffffffL).toInt))
  }
}

object OsaDistance {
  /** Plain Levenshtein (no transpositions) — what an ES fuzzy source with
    * `transpositions: false` compiles to. Matches Spark's built-in
    * `levenshtein` semantics, so the fuzzy QUERY's column formulation and
    * this kernel agree.
    */
  def lev(a: String, b: String): Int = {
    val (n, m) = (a.length, b.length)
    if (n == 0) return m
    if (m == 0) return n
    var prev = new Array[Int](m + 1)
    var curr = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      curr(0) = i
      j = 1
      while (j <= m) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        curr(j) = math.min(math.min(curr(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m)
  }

  /** Two-row DP plus the transposition diagonal; O(|a|·|b|) time, O(|b|)
    * space. Static so generated code and the interpreter share one kernel.
    */
  def osa(a: String, b: String): Int = {
    val (n, m) = (a.length, b.length)
    if (n == 0) return m
    if (m == 0) return n
    var prev2 = new Array[Int](m + 1) // row i-2
    var prev = new Array[Int](m + 1)  // row i-1
    var curr = new Array[Int](m + 1)  // row i
    var j = 0
    while (j <= m) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      curr(0) = i
      j = 1
      while (j <= m) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        var d = math.min(math.min(curr(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        if (i > 1 && j > 1 && a.charAt(i - 1) == b.charAt(j - 2) &&
            a.charAt(i - 2) == b.charAt(j - 1))
          d = math.min(d, prev2(j - 2) + 1)
        curr(j) = d
        j += 1
      }
      val t = prev2; prev2 = prev; prev = curr; curr = t
      i += 1
    }
    prev(m)
  }
}
