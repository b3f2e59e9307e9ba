package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: when a handful of hot keys dominate
  * the left side, a plain shuffle join sends every hot-key row to one
  * reducer. Salting splits each hot key across `saltFactor` reducers by
  * appending a random-but-deterministic salt on the left and replicating
  * the right side once per salt value.
  *
  * AQE's skew-join handles the sort-merge case at runtime; explicit
  * salting remains the tool when AQE can't see the skew (aggregations
  * after the join keyed on the same column, or a broadcast-ineligible
  * right side with a single monster key). Deterministic salt (hash of a
  * unique column, not rand()) keeps retried tasks and re-runs identical.
  *
  * Cost model: right side grows ×saltFactor — use for dimension-to-fact
  * skew, not fact-to-fact; saltFactor ≈ hot-key rows / healthy-partition
  * rows.
  */
object SkewJoin {

  /** Inner equi-join `left(key) = right(key)` with salting.
    *
    * The replicated right side carries a SHUFFLE_HASH hint: the operator
    * exists precisely for the broadcast-ineligible case, so the plan must
    * be a shuffled hash join on (key, salt) — hash, not sort-merge,
    * because sorting the hot partitions is the very cost salting is
    * spreading, and the ×saltFactor dim side is still the smaller build
    * side. The hint also keeps small-data tests on the production plan
    * instead of silently broadcasting the dim.
    *
    * @param saltBy unique left column whose hash spreads the salt */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String,
      saltBy: String, saltFactor: Int): DataFrame = {
    val l = left.withColumn("_salt", pmod(hash(col(saltBy)), lit(saltFactor)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r.hint("shuffle_hash"), Seq(key, "_salt")).drop("_salt")
  }
}
