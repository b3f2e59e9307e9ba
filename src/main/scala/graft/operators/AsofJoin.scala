package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, attach the latest right row
  * with `rightTime <= leftTime` within the same key group — the canonical
  * point-in-time feature lookup of a training-data pipeline (label event ←
  * most recent feature snapshot, without future leakage).
  *
  * Beyond-reference operator (the reference has no temporal joins);
  * expressed as a composition Spark already optimizes instead of a custom
  * physical operator:
  *
  *   1. tag and union both sides (right sorts before left on time ties,
  *      so an exactly-simultaneous snapshot is visible to its label row);
  *   2. one window pass per key ordered by (time, side, tiebreak) carries
  *      the last-seen right payload forward (`last(..., ignoreNulls)` over
  *      a struct, so genuinely-null payload fields survive);
  *   3. keep the left rows, unwrap the carried payload.
  *
  * Scale design: ONE hash shuffle on the key + a per-partition sort —
  * the same cost as a regular equi-join. The naive alternative (range
  * join `r.ts <= l.ts` + per-left max) explodes to O(|L|·|R|) pairs per
  * key before pruning; this stays O(|L|+|R|). Skewed keys behave like any
  * windowed aggregation (AQE-visible, saltable upstream if one user owns
  * the stream).
  *
  * Tie rule (stated, and mirrored literally in the oracle): equal
  * `rightTime` candidates resolve to the largest `tiebreak` value.
  */
object AsofJoin {

  /** @param rValues right-side payload columns to attach (prefixed `asof_`)
    * @param tiebreak right-side column ordering simultaneous right rows */
  def asof(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rValues: Seq[String], tiebreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
    val r = right.select(
      col(key), col(rightTime).as("_t"), lit(0).as("_side"),
      struct(((rValues :+ tiebreak).distinct).map(col): _*).as("_payload"),
      col(tiebreak).as("_tb"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col("_t"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("_asof",
      last(when(col("_side") === 0, col("_payload")), ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        rValues.map(v => col("_asof").getField(v).as(s"asof_$v")): _*)
  }
}
