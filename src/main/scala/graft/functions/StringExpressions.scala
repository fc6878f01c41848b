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
