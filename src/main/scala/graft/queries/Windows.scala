package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{GQuery, Tables}

/** Window-function surface (SURVEY.md §2.5 — declared beyond-reference:
  * the reference has no window functions; Spark gives rank/lag/frames free).
  *
  * Determinism: every window ORDER BY includes a unique key (o_orderkey) so
  * rank == row_number and frame contents are identical across engines; the
  * cumulative double sums are therefore summed in the same sequence in both
  * Spark and DuckDB and match bit-for-bit before rounding.
  *
  * Scale: a window partitioned by o_custkey shuffles once on the partition
  * key; no driver-side state. Frames are rows-bounded (no whole-partition
  * buffering beyond the running aggregate).
  */
object Windows {

  val queries: Seq[GQuery] = Seq(

    GQuery(
      "q_window_rank",
      """SELECT o_custkey, o_orderkey, o_totalprice, rn, rk, drk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER w AS rn,
        |         rank()       OVER w AS rk,
        |         dense_rank() OVER w AS drk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_totalprice DESC, o_orderkey)) t
        |WHERE rn <= 2
        |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.load(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"))
        .filter(col("rn") <= 2)
        .orderBy("o_custkey", "rn")
    },

    GQuery(
      "q_window_running",
      """SELECT o_custkey, o_orderkey,
        |       round(sum(o_totalprice) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, d, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum("o_totalprice").over(w), 2).as("running"))
        .orderBy("o_custkey", "o_orderkey")
    },

    GQuery(
      "q_window_lag_lead",
      """SELECT o_custkey, o_orderkey,
        |       lag(o_totalprice)  OVER w AS prev_price,
        |       lead(o_totalprice) OVER w AS next_price
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.load(s, d, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          lag("o_totalprice", 1).over(w).as("prev_price"),
          lead("o_totalprice", 1).over(w).as("next_price"))
        .orderBy("o_custkey", "o_orderkey")
    },

    GQuery(
      "q_window_frame",
      """SELECT o_custkey, o_orderkey,
        |       CAST(round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w * 100 AS BIGINT)
        |                  * 100.0 / count(*) OVER w) AS BIGINT) / 10000.0 AS mavg
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      // frame avg in integer space: exact decimal cents summed over the
      // frame / frame count, so incremental-frame double drift and
      // rounding ties are both impossible (see q_text_quality)
      Tables.load(s, d, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          (round((sum(col("o_totalprice").cast("decimal(18,2)")).over(w) * 100)
            .cast("long") * lit(100.0) / count(lit(1)).over(w)).cast("long") /
            lit(10000.0)).as("mavg"))
        .orderBy("o_custkey", "o_orderkey")
    },

    GQuery(
      "q_window_ntile",
      """SELECT o_orderkey, nt,
        |       CAST(round((rn - 1) * 1000000.0 / greatest(n - 1, 1)) AS BIGINT) / 1000000.0 AS prank,
        |       CAST(round(rn * 1000000.0 / n) AS BIGINT) / 1000000.0 AS cdist
        |FROM (
        |  SELECT o_orderkey,
        |         ntile(4)       OVER w AS nt,
        |         row_number()   OVER w AS rn,
        |         count(*)       OVER () AS n
        |  FROM orders WHERE o_custkey < 20
        |  WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey)) t
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      // A bare `Window.orderBy` (no partitionBy) would move ALL rows into a
      // single WindowExec partition — the classic global-order bottleneck.
      // Instead: range-partition by the order key, take per-partition
      // counts (metadata-sized), prefix-sum them on the driver, and add
      // the offset to a per-partition row_number — a two-pass global rank
      // that stays fully parallel. The ordering includes a unique
      // tiebreaker, so rank = row_number and the rank-derived functions
      // are closed-form from (rn, n): SQL NTILE gives the n mod k
      // remainder rows to the FIRST buckets (sizes ceil(n/k) then
      // floor(n/k)); percent_rank = (rn-1)/(n-1), cume_dist = rn/n.
      val order = Seq(col("o_totalprice").desc, col("o_orderkey"))
      val ranged = Tables.load(s, d, "orders")
        .filter(col("o_custkey") < 20)
        .repartitionByRange(s.conf.get("spark.sql.shuffle.partitions").toInt, order: _*)
        .withColumn("_pid", spark_partition_id())
        // persist: the count job and the rank job below must see the SAME
        // range boundaries — re-executing the sample-based range exchange
        // in each job could legally derive different bounds at scale
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cnts = ranged.groupBy("_pid").count().collect()
        .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val n = cnts.map(_._2).sum
      val offsets = {
        var acc = 0L
        cnts.map { case (p, c) => val o = acc; acc += c; (p, o) }.toSeq
      }
      import s.implicits._
      val offDf = offsets.toDF("_pid", "_off")
      val wLocal = Window.partitionBy("_pid").orderBy(order: _*)
      ranged.join(broadcast(offDf), "_pid")
        .withColumn("_rn", col("_off") + row_number().over(wLocal))
        .select(col("o_orderkey"),
          RankMath.ntile(col("_rn"), n, 4).cast("int").as("nt"),
          // integer-space ratio rounding (see q_text_quality)
          (round((col("_rn") - 1) * lit(1000000.0) / math.max(n - 1, 1))
            .cast("long") / lit(1000000.0)).as("prank"),
          (round(col("_rn") * lit(1000000.0) / n).cast("long") / lit(1000000.0))
            .as("cdist"))
        .orderBy("o_orderkey")
    },

    // --- grouping sets (§2.4 beyond-reference) ----------------------------
    GQuery(
      "q_rollup",
      """SELECT r_name, n_name, count(*) AS n_supp FROM (
        |  SELECT r.r_name, n.n_name FROM supplier s
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey) t
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) { (s, d) =>
      // Dataset.rollup on a join-derived frame trips Spark's ambiguous-
      // self-join detector (grouping attrs keep join lineage through
      // Expand), so this one goes through the SQL front door — same
      // Catalyst plan, same broadcast joins (nation/region are tiny dims).
      Tables.registerAll(s, d)
      s.sql(
        """SELECT r_name, n_name, count(*) AS n_supp
          |FROM supplier s
          |JOIN nation n ON s.s_nationkey = n.n_nationkey
          |JOIN region r ON n.n_regionkey = r.r_regionkey
          |GROUP BY ROLLUP (r_name, n_name)
          |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
    },

    // Batch gap-sessionization over the events table: the classic
    // clickstream operator (12-hour inactivity gap → session id via
    // flag-then-running-sum), then per-session stats. The streaming twin
    // is q_stream_session (session_window); this is the backfill/batch
    // path over historical data.
    //   Determinism: all-integer outputs — timestamps become epoch
    // millis (unix_millis/epoch_ms agree, session TZ UTC both engines);
    // the lag/sum windows order by (tms, event_id) with event_id unique.
    //   Scale: ONE shuffle on user_id serves both window functions and
    // the session aggregate (same partitioning); no driver state, frames
    // are running-sum only. The user_id predicate is pushed to the scan.
    GQuery(
      "q_sessionize",
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS tms
        |  FROM events WHERE user_id < 120),
        |f AS (
        |  SELECT user_id, event_id, event_type, tms,
        |         CASE WHEN lag(tms) OVER w IS NULL
        |                   OR tms - lag(tms) OVER w > 43200000 THEN 1
        |              ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
        |g AS (
        |  SELECT user_id, event_type, tms,
        |         CAST(sum(new_s) OVER (PARTITION BY user_id
        |           ORDER BY tms, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |           AS session_id
        |  FROM f)
        |SELECT user_id, session_id,
        |       CAST(count(*) AS BIGINT) AS events,
        |       CAST(min(tms) AS BIGINT) AS start_ms,
        |       CAST(max(tms) - min(tms) AS BIGINT) AS duration_ms,
        |       CAST(count(DISTINCT event_type) AS BIGINT) AS types
        |FROM g GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("tms"), col("event_id"))
      val run = Window.partitionBy("user_id").orderBy(col("tms"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, d, "events")
        .filter(col("user_id") < 120)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_millis(col("ts")).as("tms"))
        .withColumn("new_s",
          when(lag("tms", 1).over(w).isNull
            || col("tms") - lag("tms", 1).over(w) > 43200000L, 1).otherwise(0))
        .withColumn("session_id", sum("new_s").over(run).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("events"),
          min("tms").cast("long").as("start_ms"),
          (max("tms") - min("tms")).cast("long").as("duration_ms"),
          countDistinct("event_type").cast("long").as("types"))
        .orderBy("user_id", "session_id")
    },

    // Time-series gap-fill: per-user hourly resample with a dense bucket
    // grid and forward-filled last-observation carry — the resample/ffill
    // primitive every metrics store and feature pipeline needs. Buckets
    // are INTEGER hour indices (floor(epoch_ms/3600000)): no timestamp
    // formatting or timezone in the compared output, and both engines
    // floor the same exactly-representable double.
    //   Scale: the dense grid is generated per user from its own
    // (min,max) bucket bounds via sequence-explode — distributed, sized
    // by that user's span, no driver ranges; the fill is a left join on
    // (user, h) — co-partitioned keys — plus a per-user ordered window
    // (bounded state per user), never a global sort. First bucket per
    // user is observed by construction, so the carry never starts NULL.
    GQuery(
      "q_ts_gapfill",
      """WITH e AS (
        |  SELECT user_id, event_id,
        |         CAST(floor(epoch_ms(ts) / 3600000) AS BIGINT) AS h
        |  FROM events WHERE user_id < 40),
        |obs AS (
        |  SELECT user_id, h, CAST(count(*) AS BIGINT) AS n_events,
        |         CAST(max(event_id) AS BIGINT) AS max_eid
        |  FROM e GROUP BY user_id, h),
        |bounds AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM obs GROUP BY user_id),
        |grid AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS h FROM bounds),
        |f AS (
        |  SELECT g.user_id, g.h, coalesce(o.n_events, 0) AS n_events,
        |         last_value(o.max_eid IGNORE NULLS) OVER (
        |           PARTITION BY g.user_id ORDER BY g.h
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_eid
        |  FROM grid g LEFT JOIN obs o USING (user_id, h))
        |SELECT user_id, h, CAST(n_events AS BIGINT) AS n_events, last_eid
        |FROM f ORDER BY user_id, h""".stripMargin) { (s, d) =>
      val e = Tables.load(s, d, "events")
        .filter(col("user_id") < 40)
        .select(col("user_id"), col("event_id"),
          floor(unix_millis(col("ts")) / lit(3600000L)).cast("long").as("h"))
      val obs = e.groupBy("user_id", "h")
        .agg(count(lit(1)).as("n_events"), max("event_id").as("max_eid"))
      val grid = obs.groupBy("user_id")
        .agg(min("h").as("h0"), max("h").as("h1"))
        .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("h"))
      val w = Window.partitionBy("user_id").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(obs, Seq("user_id", "h"), "left")
        .select(col("user_id"), col("h"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          last(col("max_eid"), ignoreNulls = true).over(w).as("last_eid"))
        .orderBy("user_id", "h")
    },

    GQuery(
      "q_cube",
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) {
      (s, d) =>
        Tables.load(s, d, "lineitem")
          .cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
    },

    // Arbitrary GROUPING SETS (the general form ROLLUP/CUBE specialize):
    // the four explicit sets compile to ONE Expand + hash aggregate —
    // one scan, one shuffle, same as a plain GROUP BY; all-integer
    // aggregates keep the compare exact.
    GQuery(
      "q_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |       CAST(max(o_orderkey) AS BIGINT) AS max_key
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) {
      (s, d) =>
        Tables.registerAll(s, d)
        s.sql(
          """SELECT o_orderstatus, o_orderpriority,
            |       count(*) AS n_orders,
            |       min(o_orderkey) AS min_key,
            |       max(o_orderkey) AS max_key
            |FROM orders
            |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
            |                        (o_orderstatus), (o_orderpriority), ())
            |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    },

    // PIVOT: status categories rotated into columns with an EXPLICIT
    // value list — no collect-distinct pre-pass, so the plan is a single
    // conditional aggregation (one scan, one shuffle) at any scale. The
    // oracle states the same thing as portable conditional counts; empty
    // cells are 0 on both sides (Spark pivot yields NULL there —
    // coalesced explicitly).
    GQuery(
      "q_pivot",
      """SELECT o_orderpriority,
        |       CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
        |       CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
        |       CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
        |FROM orders
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.load(s, d, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("P"), lit(0L)).as("P"))
        .orderBy("o_orderpriority")
    }
  )
}
