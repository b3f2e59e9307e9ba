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
  * partition boundaries. NULL group keys form one group, matching
  * `Window.partitionBy` / SQL GROUP BY semantics (the offset join is
  * null-safe).
  *
  * Cache lifecycle: the range-partitioned input must be pinned so pass 2
  * sees the exact partition ids pass 1's subtotals were keyed by (a
  * recomputation would re-sample the range bounds). The input is
  * localCheckpoint-ed eagerly — one materialization serves both passes,
  * lineage is cut, and the blocks are freed by the ContextCleaner once the
  * returned frame becomes unreachable (r16: the earlier shape persisted the
  * input AND checkpointed the result, a second corpus-sized write+read per
  * call purely to release the cache handle). On a real cluster, point
  * `sparkContext.setCheckpointDir` at reliable storage and swap
  * `localCheckpoint` for `checkpoint` if executor loss during the
  * downstream consumption must be survivable.
  */
object GroupedPrefixSum {

  /** Adds `out` = running sum of `value` within `group` ordered by `order`
    * (inclusive of the current row). Eager by default: the range-
    * partitioned INPUT is checkpointed before returning (see cache-
    * lifecycle note above); the returned join+window evaluates lazily over
    * those fixed blocks. `eager = false` is for PLAN INSPECTION ONLY
    * (tests asserting the two-pass shape, which a checkpoint scan hides):
    * the internally persisted range-partitioned input has no exposed
    * handle and stays cached until the session's next clearCache —
    * production callers must use the eager default. */
  def runningSum(
      df: DataFrame,
      group: Seq[String],
      order: Seq[Column],
      value: Column,
      out: String,
      eager: Boolean = true): DataFrame = {
    val working = Set("_pid", "_v", "_off", "_opid", "_s") ++
      group.indices.map(i => s"_g$i")
    require(!df.columns.exists(working),
      s"GroupedPrefixSum working columns (${working.mkString(", ")}) collide with input columns")
    val s = df.sparkSession
    val nPart = s.conf.get("spark.sql.shuffle.partitions").toInt
    val sortCols = group.map(col) ++ order
    val ranged0 = df
      .repartitionByRange(nPart, sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_v", value)
    // ONE materialization (r16, guide §2.4/§5): the eager path pins the
    // sampled range partitioning by localCheckpoint-ing the INPUT — pass 1
    // (the subtotal collect) and pass 2 (the returned join+window) both
    // read the same fixed _pid blocks, lineage is cut, and there is no
    // corpus-sized cache handle to leak (blocks are freed by the
    // ContextCleaner once the returned frame becomes unreachable). The
    // pre-r16 shape persisted `ranged` AND localCheckpoint-ed the RESULT —
    // a second corpus-sized write+read per call whose only purpose was
    // releasing that cache before returning; with the checkpoint at the
    // input there is nothing to release. The lazy (plan-inspection) path
    // keeps the persist so the two-pass plan stays visible.
    val ranged =
      if (eager) ranged0.localCheckpoint(true)
      else ranged0.persist(StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-(partition, group) subtotals. BOUND: this collect is
    // O(partitions × groups-touching-a-partition-boundary) rows — with
    // range partitioning on (group, order) a group spans ≥2 partitions
    // only when it straddles a boundary, so the table is ≤ partitions +
    // distinct-groups rows, NOT their product. It is the one "metadata"
    // collect here that grows with the partition count: at 100× the
    // partitions budget ~100× these few-column rows (tens of MB at
    // 100k partitions), still driver-safe; a deployment that also has
    // millions of DISTINCT groups should aggregate the offsets
    // distributively (a second shuffle) instead.
    val subs = ranged.groupBy(("_pid" +: group).map(col): _*)
      .agg(sum(col("_v")).as("_s"))
      .collect()
    val offsets: Seq[(Int, Seq[Any], Long)] = subs
      .map { r =>
        // an all-NULL value slice sums to NULL — contributes 0 to offsets
        val sub = if (r.isNullAt(group.size + 1)) 0L else r.getLong(group.size + 1)
        (r.getInt(0), group.indices.map(i => r.get(i + 1)), sub)
      }
      .groupBy(_._2)
      .toSeq.flatMap { case (g, rows) =>
        var acc = 0L
        rows.toSeq.sortBy(_._1).map { case (pid, _, sub) =>
          val off = acc; acc += sub; (pid, g, off)
        }
      }
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, IntegerType, StructField, StructType}
    val groupFields = group.zipWithIndex.map { case (gn, i) =>
      df.schema(gn).copy(name = s"_g$i")
    }
    val offSchema = StructType(
      StructField("_opid", IntegerType, nullable = false) +:
        groupFields :+ StructField("_off", LongType, nullable = false))
    val offDf = s.createDataFrame(
      s.sparkContext.parallelize(
        offsets.map { case (pid, g, off) => Row.fromSeq(pid +: g :+ off) }, 1),
      offSchema)
    // pass 2: partition-local running sum + the group's prefix offset.
    // Null-safe on the group keys so a NULL group joins its own offset
    // instead of being dropped (plain equality would lose those rows).
    val joinCond = group.zipWithIndex
      .map { case (g, i) => col(g) <=> col(s"_g$i") }
      .foldLeft(col("_pid") === col("_opid"))(_ && _)
    val wLocal = Window.partitionBy(("_pid" +: group).map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offDf), joinCond)
      .withColumn(out, col("_off") + sum(col("_v")).over(wLocal))
      .drop("_opid" +: group.indices.map(i => s"_g$i"): _*)
      .drop("_pid", "_v", "_off")
  }
}
