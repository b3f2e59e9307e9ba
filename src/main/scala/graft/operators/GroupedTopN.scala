package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-N rows without a per-group window partition.
  *
  * `row_number() OVER (PARTITION BY group)` puts each group's FULL
  * membership on one task — the dominant-group failure mode at 100 TB
  * (same pathology [[GroupedPrefixSum]] avoids). Two phases instead:
  *
  *   1. local rank within (physical partition, group): the window keys on
  *      (_pid, group), so a dominant group is spread across as many tasks
  *      as it has input partitions; each task ranks only its own slice and
  *      keeps at most n rows per (pid, group);
  *   2. global rank over the survivors: ≤ n·P rows per group (bounded by
  *      the cap and the partition count, never by group size), so the
  *      per-group window that would have serialized the stage now runs on
  *      a metadata-sized input.
  *
  * Requires a total order (unique tiebreaker) within each group, so the
  * kept set is independent of partitioning — the contract every
  * deterministic sampler here shares.
  */
object GroupedTopN {

  /** Keeps the first `n` rows of each `group` under `order`. */
  def topN(df: DataFrame, group: Seq[String], order: Seq[Column], n: Int): DataFrame = {
    require(!df.columns.exists(c => c == "_pid" || c == "_r"),
      "GroupedTopN working columns (_pid, _r) collide with input columns")
    val gCols = group.map(col)
    val local = Window.partitionBy(col("_pid") +: gCols: _*).orderBy(order: _*)
    val survivors = df
      .withColumn("_pid", spark_partition_id())
      .withColumn("_r", row_number().over(local))
      .filter(col("_r") <= n)
      .drop("_pid", "_r")
    val global = Window.partitionBy(gCols: _*).orderBy(order: _*)
    survivors
      .withColumn("_r", row_number().over(global))
      .filter(col("_r") <= n)
      .drop("_r")
  }
}
