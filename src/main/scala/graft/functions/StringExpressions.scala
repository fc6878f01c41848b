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
                       gaps: Boolean = false)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sloppy expects a string field, got ${child.dataType.simpleString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_sloppy"

  override def nullSafeEval(v: Any): Any =
    SloppyMatch.matches(v.asInstanceOf[UTF8String].toString,
      terms, slop, inOrder, prefix, gaps)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("sloppyTerms", terms, "java.lang.String")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.SloppyMatch.matches($s.toString(), " +
        s"$t, $slop, $inOrder, $prefix, $gaps);")
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
  */
case class SloppySlot(includes: Seq[String], excludes: Seq[String],
                      pre: Int, post: Int, prefixes: Seq[String] = Nil)

object SloppySlot {
  /** Wire format for the `graft_sloppy` terms argument: slots joined by a
    * space; each slot `inc1|inc2` or `inc1|inc2~exc1|exc2~pre~post`, with
    * prefix alternatives carrying a trailing `*` marker (`co*`). The
    * separators and the marker cannot appear inside analyzed tokens (the
    * analyzer splits on whitespace and these filters target word terms),
    * and encode REJECTS terms containing them rather than mis-parsing.
    */
  def encode(slots: Seq[SloppySlot]): String = {
    slots.foreach { sl =>
      require(sl.includes.nonEmpty || sl.prefixes.nonEmpty,
        "slot needs at least one include term or prefix")
      (sl.includes ++ sl.excludes ++ sl.prefixes).foreach(t => require(
        t.nonEmpty && !t.exists(c =>
          c == '|' || c == '~' || c == '*' || c.isWhitespace),
        s"unsupported characters in span/phrase term: '$t'"))
    }
    slots.map { sl =>
      val inc = (sl.includes ++ sl.prefixes.map(_ + "*")).mkString("|")
      if (sl.excludes.isEmpty) inc
      else s"$inc~${sl.excludes.mkString("|")}~${sl.pre}~${sl.post}"
    }.mkString(" ")
  }

  def decode(s: String): Array[SloppySlot] =
    s.split(" ").map { part =>
      val seg = part.split("~")
      val (pfx, inc) = seg(0).split('|').toSeq.partition(_.endsWith("*"))
      val slot =
        if (seg.length == 1) SloppySlot(inc, Nil, 0, 0)
        else SloppySlot(inc, seg(1).split('|').toSeq, seg(2).toInt, seg(3).toInt)
      slot.copy(prefixes = pfx.map(_.dropRight(1)))
    }
}

object SloppyMatch {
  /** One kernel shared by codegen and the interpreter. Tokenization mirrors
    * Spark's `split(lower(field), "\\s+")` (limit -1 keeps trailing
    * empties), then a DFS assignment search over each slot's position list
    * with sound pruning: the adjusted-position range (out-of-order), the
    * running gap total (in-order) and the raw-position range (`gaps` mode)
    * only grow as terms are bound, so a branch over budget can never
    * recover.
    */
  def matches(field: String, termsStr: String, slop: Int,
              inOrder: Boolean, prefix: Boolean,
              gaps: Boolean = false): Boolean = {
    val toks = field.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
    val slots = SloppySlot.decode(termsStr)
    val n = slots.length
    val pos = new Array[Array[Int]](n)
    var i = 0
    while (i < n) {
      val sl = slots(i)
      val isPrefix = prefix && i == n - 1
      def incMatch(j: Int): Boolean = {
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
      var cnt = 0
      var j = 0
      while (j < toks.length) {
        if (incMatch(j) && !exclNear(j)) cnt += 1
        j += 1
      }
      if (cnt == 0) return false // conjunctive guard: every slot must be fillable
      val ps = new Array[Int](cnt)
      var k = 0
      j = 0
      while (j < toks.length) {
        if (incMatch(j) && !exclNear(j)) { ps(k) = j; k += 1 }
        j += 1
      }
      pos(i) = ps
      i += 1
    }
    val chosen = new Array[Int](n)
    // minB/maxB track the range bound so far: adjusted positions p_k - k
    // out-of-order, RAW positions in `gaps` mode (whose budget is the
    // covering-interval width (max - min) - (n - 1) over ALL n terms —
    // checkable early because the range only widens as terms are bound)
    def dfs(i: Int, minB: Int, maxB: Int): Boolean = {
      if (i == n) return true
      val ps = pos(i)
      var k = 0
      while (k < ps.length) {
        val p = ps(k)
        var distinct = true
        var m = 0
        while (m < i && distinct) { if (chosen(m) == p) distinct = false; m += 1 }
        if (distinct) {
          val ok =
            if (inOrder)
              // strictly after the previous term, with the total-gap budget
              // so far still affordable (future gaps only add)
              (i == 0 || p > chosen(i - 1)) &&
                (i == 0 || p - chosen(0) - i <= slop)
            else if (i == 0) true // first binding: the range is a point
            else if (gaps)
              math.max(maxB, p) - math.min(minB, p) - (n - 1) <= slop
            else {
              val adj = p - i
              math.max(maxB, adj) - math.min(minB, adj) <= slop
            }
          if (ok) {
            chosen(i) = p
            val b = if (gaps) p else p - i
            if (dfs(i + 1,
                if (i == 0) b else math.min(minB, b),
                if (i == 0) b else math.max(maxB, b))) return true
          }
        }
        k += 1
      }
      false
    }
    dfs(0, 0, 0)
  }
}

object OsaDistance {
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
