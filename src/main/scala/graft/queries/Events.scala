package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{GQuery, Tables}

/** Event-analytics operators over the `events` stream table: ordered
  * funnels, cohort retention, and SCD Type-2 dimension history — the
  * warehouse patterns a reference user runs downstream of federation
  * (beyond-reference; the reference's closest surface is plain GROUP BY
  * over a backend, e.g. the ES terms aggs in
  * `backends/elasticsearch/sqltoes.go:285-365`).
  */
object Events {

  def queries: Seq[GQuery] = Seq(

    // Ordered three-step funnel (view → click → purchase): each user's
    // step-k time is the earliest qualifying event STRICTLY AFTER their
    // step-(k-1) time and within a 24-hour conversion window (without
    // the window every user on a long-lived table eventually converts
    // and the funnel degenerates). The scale shape is the point: THREE chained
    // unbounded window aggregates over the same user_id partitioning =
    // ONE hash exchange, three in-memory passes — no self-joins (the
    // naive formulation is k joins on user_id), no per-user arrays. The
    // per-user reduce reuses the window's partitioning, so the whole
    // funnel is a single shuffle of the events table plus a global agg.
    GQuery(
      "q_events_funnel",
      """WITH a AS (
        |  SELECT user_id, ts, event_type,
        |         min(CASE WHEN event_type = 'view' THEN ts END)
        |           OVER (PARTITION BY user_id) AS t1
        |  FROM events),
        |b AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1
        |                      AND ts <= t1 + INTERVAL 24 HOUR THEN ts END)
        |              OVER (PARTITION BY user_id) AS t2
        |  FROM a),
        |c AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2
        |                      AND ts <= t2 + INTERVAL 24 HOUR THEN ts END)
        |              OVER (PARTITION BY user_id) AS t3
        |  FROM b),
        |u AS (SELECT user_id, min(t1) t1, min(t2) t2, min(t3) t3 FROM c GROUP BY 1)
        |SELECT CAST(count(t1) AS BIGINT) AS n_view,
        |       CAST(count(t2) AS BIGINT) AS n_view_click,
        |       CAST(count(t3) AS BIGINT) AS n_view_click_purchase
        |FROM u""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id")
      Tables.load(s, d, "events")
        .select("user_id", "ts", "event_type")
        .withColumn("t1",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("t2",
          min(when(col("event_type") === "click" && col("ts") > col("t1") &&
            col("ts") <= col("t1") + expr("INTERVAL 24 HOURS"),
            col("ts"))).over(w))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" && col("ts") > col("t2") &&
            col("ts") <= col("t2") + expr("INTERVAL 24 HOURS"),
            col("ts"))).over(w))
        .groupBy("user_id") // reuses the window's hash partitioning: no new shuffle
        .agg(min("t1").as("t1"), min("t2").as("t2"), min("t3").as("t3"))
        .agg(count("t1").as("n_view"),
          count("t2").as("n_view_click"),
          count("t3").as("n_view_click_purchase"))
    },

    // Cohort retention: users grouped by first-seen day, counted distinct
    // in each subsequent week offset. Day-granular cohorts dodge the
    // engines' week-start conventions; the offset is exact integer day
    // arithmetic. Two shuffles total at any scale: the first-seen reduce
    // (by user) and the cell aggregate (by cohort, offset, then distinct
    // users per cell — Spark plans the distinct as a partial/final pair).
    GQuery(
      "q_events_retention",
      """WITH first AS (
        |  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day FROM events GROUP BY 1)
        |SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
        |       CAST(datediff('day', f.cohort_day, CAST(e.ts AS DATE)) // 7 AS BIGINT)
        |         AS offset_week,
        |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM events e JOIN first f ON e.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val ev = Tables.load(s, d, "events")
      val first = ev.groupBy("user_id")
        .agg(min("ts").cast("date").as("cohort_day"))
      ev.join(first, Seq("user_id"))
        .select(
          date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
          expr("datediff(CAST(ts AS DATE), cohort_day) div 7")
            .cast("long").as("offset_week"),
          col("user_id"))
        .groupBy("cohort_day", "offset_week")
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_day", "offset_week")
    },

    // OHLC downsampling bars — the time-series resample that turns an
    // event stream into per-(series, day) open/high/low/close/volume
    // rows. First/last are row_number picks over (ts, event_id) — a
    // total order, so ties cannot flip the bar — and BOTH window passes
    // plus the final aggregate share one (event_type, day) exchange.
    // No floating-point arithmetic at all (every output is a picked or
    // compared input double), so the bars are exact without rounding.
    GQuery(
      "q_ts_ohlc",
      """WITH r AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, value,
        |         row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |                            ORDER BY ts, event_id) AS rn_a,
        |         row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
        |       CAST(count(*) AS BIGINT) AS volume,
        |       max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |       max(value) AS high, min(value) AS low,
        |       max(CASE WHEN rn_d = 1 THEN value END) AS close
        |FROM r GROUP BY event_type, day
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("event_type"), col("day"))
      Tables.load(s, d, "events")
        .select(col("event_type"), col("ts").cast("date").as("day"),
          col("value"), col("ts"), col("event_id"))
        .withColumn("rn_a", row_number().over(w.orderBy(col("ts"), col("event_id"))))
        .withColumn("rn_d", row_number().over(
          w.orderBy(col("ts").desc, col("event_id").desc)))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("volume"),
          max(when(col("rn_a") === 1, col("value"))).as("open"),
          max("value").as("high"), min("value").as("low"),
          max(when(col("rn_d") === 1, col("value"))).as("close"))
        .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("volume"), col("open"), col("high"), col("low"), col("close"))
        .orderBy("event_type", "day")
    },

    // SCD Type-2 merge: fold a new snapshot into a versioned dimension
    // history (valid_from/valid_to/is_current), the classic warehouse
    // dimension-maintenance operator. Snapshots are the CDC fixtures
    // (q_cdc_snapshot_diff): v1 misses doc_id%13==0, v2 misses %17==0
    // and rewrites %11==0. FINGERPRINT-FIRST like the diff: both sides
    // reduce to (key, md5) before the ONE full-outer join, and each
    // joined key emits its history rows from a generator expression —
    // no second pass, no payload shuffle. Closed rows get valid_to=2;
    // live rows carry valid_to NULL + is_current.
    GQuery(
      "q_cdc_scd2",
      """WITH oldv AS (
        |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 13 <> 0),
        |newv AS (
        |  SELECT doc_id,
        |         md5(CASE WHEN doc_id % 11 = 0 THEN upper(text) ELSE text END) AS h
        |  FROM documents WHERE doc_id % 17 <> 0),
        |j AS (SELECT o.doc_id AS od, o.h AS oh, n.doc_id AS nd, n.h AS nh
        |      FROM oldv o FULL OUTER JOIN newv n ON o.doc_id = n.doc_id)
        |SELECT * FROM (
        |  SELECT od AS doc_id, oh AS h, 1 AS valid_from,
        |         CASE WHEN nd IS NULL OR oh <> nh THEN 2 END AS valid_to,
        |         (nd IS NOT NULL AND oh = nh) AS is_current
        |  FROM j WHERE od IS NOT NULL
        |  UNION ALL
        |  SELECT nd, nh, 2, NULL, true
        |  FROM j WHERE nd IS NOT NULL AND (od IS NULL OR oh <> nh))
        |ORDER BY doc_id, valid_from""".stripMargin) { (s, d) =>
      val base = Tables.load(s, d, "documents")
      val oldv = base.filter(col("doc_id") % 13 =!= 0)
        .select(col("doc_id").as("od"), md5(col("text")).as("oh"))
      val newv = base.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id").as("nd"),
          md5(when(col("doc_id") % 11 === 0, upper(col("text")))
            .otherwise(col("text"))).as("nh"))
      oldv.join(newv, col("od") === col("nd"), "full_outer")
        .select(explode(array(
          // the old side's row: closed if the key vanished or changed
          when(col("od").isNotNull, struct(
            col("od").as("doc_id"), col("oh").as("h"),
            lit(1).as("valid_from"),
            when(col("nd").isNull || col("oh") =!= col("nh"), lit(2))
              .as("valid_to"),
            (col("nd").isNotNull && col("oh") === col("nh")).as("is_current"))),
          // the new side's row: only for added or changed keys
          when(col("nd").isNotNull && (col("od").isNull || col("oh") =!= col("nh")),
            struct(col("nd").as("doc_id"), col("nh").as("h"),
              lit(2).as("valid_from"), lit(null).cast("int").as("valid_to"),
              lit(true).as("is_current"))))).as("r"))
        .filter(col("r").isNotNull)
        .select("r.doc_id", "r.h", "r.valid_from", "r.valid_to", "r.is_current")
        .orderBy("doc_id", "valid_from")
    },

    // Rolling z-score anomaly detection (the metrics/fraud pattern over a
    // behavioral stream): each event compares its value against the mean
    // and variance of that user's PREVIOUS ten events; it is anomalous
    // when it sits more than three standard deviations out. Everything
    // is integer-exact: values become cents, and the 3-sigma test
    // cross-multiplies (n*x - s)^2 > 9 * (n*ss - s^2) so neither engine
    // ever divides (mean = s/n and var = (n*ss - s^2)/n^2 never appear
    // as doubles). Windows with fewer than five prior events abstain.
    //
    // Scale: ONE hash exchange on user_id, then a bounded ROWS-frame
    // window (three running sums over the same sort) — no self-join, no
    // per-user collect. Key cardinality grows with users, so the
    // partitioning is skew-free at any corpus size.
    GQuery(
      "q_events_anomaly",
      """WITH c AS (
        |  SELECT event_id, user_id, ts,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |w AS (
        |  SELECT event_id, user_id, cents,
        |         CAST(count(*) OVER win AS BIGINT) AS n,
        |         CAST(coalesce(sum(cents) OVER win, 0) AS BIGINT) AS s,
        |         CAST(coalesce(sum(cents * cents) OVER win, 0) AS BIGINT) AS ss
        |  FROM c
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, cents, n,
        |       n >= 5 AND (n * cents - s) * (n * cents - s) > 9 * (n * ss - s * s)
        |         AS is_anomaly
        |FROM w ORDER BY event_id""".stripMargin) { (s, d) =>
      val win = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
      val cents = round(col("value") * 100).cast("long")
      Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("ts"), cents.as("cents"))
        .withColumn("n", count(lit(1)).over(win).cast("long"))
        .withColumn("s", coalesce(sum("cents").over(win), lit(0)).cast("long"))
        .withColumn("ss",
          coalesce(sum(col("cents") * col("cents")).over(win), lit(0)).cast("long"))
        .select(col("event_id"), col("user_id"), col("cents"), col("n"),
          (col("n") >= 5 &&
            (col("n") * col("cents") - col("s")) * (col("n") * col("cents") - col("s")) >
              lit(9) * (col("n") * col("ss") - col("s") * col("s")))
            .as("is_anomaly"))
        .orderBy("event_id")
    }
  )
}
