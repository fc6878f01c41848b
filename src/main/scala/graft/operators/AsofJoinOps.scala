package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import graft.plans.AsofJoin

/** Public entry for the custom-plan as-of join (see [[graft.plans.AsofJoin]]
  * for semantics and the scale rationale). Requires
  * `graft.functions.GraftExtensions` in the session, which injects the
  * planner strategy.
  */
object AsofJoinOps {

  /** Inner as-of join: every left row pairs with the right row holding the
    * greatest `rightTimeMs <= leftTimeMs` for the same key; ties on time
    * resolve to the greatest `rightTiebreaks`. Time columns must be BIGINT
    * (epoch millis).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTimeMs: String, rightTimeMs: String,
               rightTiebreaks: Seq[String] = Nil): DataFrame = {
    def attr(df: DataFrame, n: String) =
      df.queryExecution.analyzed.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"no column '$n' in [${df.columns.mkString(", ")}]"))
    val plan = AsofJoin(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      Seq(attr(left, leftKey)), Seq(attr(right, rightKey)),
      attr(left, leftTimeMs), attr(right, rightTimeMs),
      rightTiebreaks.map(attr(right, _)))
    GraftSqlBridge.ofRows(left.sparkSession, plan)
  }
}
