package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Grouped running total without a per-group window partition.
  *
  * `Window.partitionBy(group).orderBy(order)` puts each group on ONE task —
  * a dominant group (e.g. the `en` slice of a corpus) serializes the whole
  * stage at 100 TB. This computes the same running sum with the two-pass
  * shape of the global-rank window (`Windows.scala` q_window_ntile):
  *
  *   1. range-partition by (group, order) — a big group spans many
  *      partitions, each holding a contiguous slice;
  *   2. per-(partition, group) subtotals — metadata-sized (partitions ×
  *      live groups per partition; a partition overlaps at most a handful
  *      of groups because group leads the range order);
  *   3. prefix-sum the subtotals per group on the driver, broadcast the
  *      offsets back, and add them to a partition-local running sum.
  *
  * Requires the order columns to be unique per row within a group (the
  * usual tiebreaker contract) — uniqueness makes the result independent of
  * partition boundaries. The input is persisted so both passes see the
  * same sampled range bounds.
  */
object GroupedPrefixSum {

  /** Adds `out` = running sum of `value` within `group` ordered by `order`
    * (inclusive of the current row). Returns (result, unpersist handle). */
  def runningSum(
      df: DataFrame,
      group: Seq[String],
      order: Seq[Column],
      value: Column,
      out: String): DataFrame = {
    val s = df.sparkSession
    val nPart = s.conf.get("spark.sql.shuffle.partitions").toInt
    val sortCols = group.map(col) ++ order
    val ranged = df
      .repartitionByRange(nPart, sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_v", value)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-(partition, group) subtotals — metadata-sized
    val subs = ranged.groupBy(("_pid" +: group).map(col): _*)
      .agg(sum(col("_v")).as("_s"))
      .collect()
    val offsets: Seq[(Int, Seq[Any], Long)] = subs
      .map(r => (r.getInt(0), group.indices.map(i => r.get(i + 1)), r.getLong(group.size + 1)))
      .groupBy(_._2)
      .toSeq.flatMap { case (g, rows) =>
        var acc = 0L
        rows.toSeq.sortBy(_._1).map { case (pid, _, sub) =>
          val off = acc; acc += sub; (pid, g, off)
        }
      }
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, IntegerType, StructField, StructType}
    val groupFields = group.map(gn => df.schema(gn))
    val offSchema = StructType(
      StructField("_pid", IntegerType, nullable = false) +:
        groupFields :+ StructField("_off", LongType, nullable = false))
    val offDf = s.createDataFrame(
      s.sparkContext.parallelize(
        offsets.map { case (pid, g, off) => Row.fromSeq(pid +: g :+ off) }, 1),
      offSchema)
    // pass 2: partition-local running sum + the group's prefix offset
    val wLocal = Window.partitionBy(("_pid" +: group).map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offDf), "_pid" +: group)
      .withColumn(out, col("_off") + sum(col("_v")).over(wLocal))
      .drop("_pid", "_v", "_off")
  }
}
