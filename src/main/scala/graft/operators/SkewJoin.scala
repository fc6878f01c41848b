package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join split is the first line of defense (enabled by default);
  * salting is the explicit fallback for cases AQE cannot rebalance — skewed
  * aggregation keys, or a hot key that must co-locate with replicated
  * dimension rows. The big side gets a deterministic salt from a
  * high-cardinality column; the small side is replicated once per salt, so
  * one hot key spreads over `nSalts` reducers.
  */
object SkewJoin {

  /** Join `big` to `small` on `key`, spreading each key over `nSalts`
    * partitions. `saltFrom` must be a (near-)unique column of `big` so rows
    * of a hot key distribute evenly. Result equals the plain inner join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFrom: String, nSalts: Int = 8): DataFrame = {
    val salted = big.withColumn("__salt", pmod(hash(col(saltFrom)), lit(nSalts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial + final) aggregation for skewed group keys: first
    * aggregate on (key, salt), then merge the partials per key. Works for
    * algebraic aggregates (sum/count/min/max).
    */
  def saltedCountSum(big: DataFrame, key: String, valueCol: String,
                     saltFrom: String, nSalts: Int = 8): DataFrame =
    big.withColumn("__salt", pmod(hash(col(saltFrom)), lit(nSalts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum_value"))
}
