package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: match probe rows whose scalar value falls inside
  * `[lo, hi]` intervals — bucketized into an equi-join so Catalyst never
  * falls back to a broadcast-nested-loop over the raw range predicate.
  *
  * Shape: each interval is exploded to the fixed-width buckets it covers;
  * each probe row is assigned its single bucket; the join is a plain
  * equi-join on bucket id followed by the exact range filter. A probe row
  * lives in exactly one bucket, so a (probe, interval) match is produced
  * exactly once — no post-join dedup.
  *
  * Scale design: the bucketed join shuffles on bucket id like any
  * equi-join (or broadcasts when the interval side is small); cost is
  * O(|probe| + Σ interval_width/bucketWidth) rows into the join instead
  * of the O(|probe|·|intervals|) pairs a nested-loop range predicate
  * scans. `bucketWidth` trades interval-explosion fan-out against bucket
  * selectivity — set it near the median interval width.
  */
object RangeJoin {

  /** @param probeCol  scalar column of `probe` tested against intervals
    * @param loCol/hiCol inclusive interval bounds on `intervals` */
  def intervalJoin(
      probe: DataFrame, probeCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    val w = lit(bucketWidth)
    val expanded = intervals.withColumn("_bucket",
      explode(sequence(floor(col(loCol) / w).cast("long"),
        floor(col(hiCol) / w).cast("long"))))
    val bucketed = probe.withColumn("_bucket",
      floor(col(probeCol) / w).cast("long"))
    bucketed.join(expanded, "_bucket")
      .filter(col(probeCol) >= col(loCol) && col(probeCol) <= col(hiCol))
      .drop("_bucket")
  }
}
