package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{GQuery, Tables}

/** Join surface (SURVEY.md §2.3) plus set operations (§2.7).
  *
  * The reference implements only INNER equi-joins (heterogeneous-source
  * merge join in qlbridge, `backends/tests/multi_backend_test.go:168-200`);
  * outer/semi/anti joins and set ops are declared beyond-reference, free
  * from Catalyst.
  *
  * Scale notes: dimension tables (region 5 rows, nation 25 rows — fixed
  * size at any SF) are explicitly `broadcast()` so the fact-side scan never
  * shuffles for them; fact⋈fact joins (orders⋈lineitem) shuffle on the join
  * key, which AQE converts to a broadcast join when the filtered side turns
  * out small at runtime.
  */
object Joins {

  val queries: Seq[GQuery] = Seq(

    GQuery(
      "q_join_inner",
      """SELECT n.n_name, count(*) AS n_orders,
        |       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 1) AS DOUBLE) AS revenue
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin) { (s, d) =>
      val o = Tables.load(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      val c = Tables.load(s, d, "customer")
      val n = Tables.load(s, d, "nation")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")), 1)
            .cast("double").as("revenue"))
        .orderBy("n_name")
    },

    // TPC-H Q3 shape: two fact tables + dimension filter, top-k on an agg.
    GQuery(
      "q3_shipping",
      """SELECT l.l_orderkey,
        |       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |                      (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 1) AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1997-03-15'
        |  AND l.l_shipdate > TIMESTAMP '1997-03-15'
        |GROUP BY l.l_orderkey
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      val c = Tables.load(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.load(s, d, "orders")
        .filter(col("o_orderdate") < lit("1997-03-15").cast("timestamp"))
      val l = Tables.load(s, d, "lineitem")
        .filter(col("l_shipdate") > lit("1997-03-15").cast("timestamp"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, l("l_orderkey") === o("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)"))), 1)
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // TPC-H Q5 shape: the 6-table join-order stress headline — three fact/
    // bulk tables and three dimensions with the local-supplier correlation
    // (c_nationkey = s_nationkey) that forces a genuinely multi-way plan.
    // Scale: region/nation broadcast (fixed size at any SF); supplier
    // broadcasts at bench SFs via honest size estimates; the two fact
    // joins shuffle on their keys and AQE re-plans from runtime sizes —
    // exactly the shape a 1000-executor cluster runs as TPC-H Q5.
    GQuery(
      "q5_local_supplier",
      """SELECT n.n_name,
        |       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |                      (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 1) AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n.n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      val c = Tables.load(s, d, "customer")
      val o = Tables.load(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = Tables.load(s, d, "lineitem")
      val su = Tables.load(s, d, "supplier")
      val n = Tables.load(s, d, "nation")
      val r = Tables.load(s, d, "region").filter(col("r_name") === "ASIA")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, l("l_orderkey") === o("o_orderkey"))
        .join(su, l("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)"))), 1)
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q18 (large-volume customers): the agg-THEN-join stress shape —
    // lineitem pre-aggregates per order (map-side-combined, one shuffle on
    // l_orderkey), the HAVING filter shrinks the fact side to the rare
    // heavy orders BEFORE any join, then orders joins on the same key
    // (AQE re-plans the post-filter side to a broadcast) and the top-100
    // lands as TakeOrdered, never a global sort. Aggregating after the
    // 3-way join instead would shuffle the full lineitem x orders row set.
    GQuery(
      "q18_large_orders",
      """SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        |       o.o_totalprice, CAST(sum(l.l_quantity) AS BIGINT) AS total_qty
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(l_quantity) > 250)
        |GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        |ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
      val l = Tables.load(s, d, "lineitem")
      val heavy = l.groupBy("l_orderkey")
        .agg(sum("l_quantity").as("total_qty"))
        .filter(col("total_qty") > 250)
      val o = Tables.load(s, d, "orders")
      val c = Tables.load(s, d, "customer")
      heavy
        .join(o, heavy("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          col("total_qty").cast("long").as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    GQuery(
      "q_join_left",
      """SELECT n.n_name, count(s.s_suppkey) AS n_supp
        |FROM nation n LEFT JOIN supplier s ON n.n_nationkey = s.s_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin) { (s, d) =>
      val n = Tables.load(s, d, "nation")
      val su = Tables.load(s, d, "supplier")
      n.join(su, n("n_nationkey") === su("s_nationkey"), "left")
        .groupBy("n_name")
        .agg(count(col("s_suppkey")).as("n_supp"))
        .orderBy("n_name")
    },

    GQuery(
      "q_join_right",
      """SELECT n.n_name, s.s_suppkey
        |FROM supplier s RIGHT JOIN nation n ON n.n_nationkey = s.s_nationkey
        |WHERE n.n_nationkey < 5
        |ORDER BY n.n_name, s.s_suppkey NULLS FIRST""".stripMargin) { (s, d) =>
      val n = Tables.load(s, d, "nation").filter(col("n_nationkey") < 5)
      val su = Tables.load(s, d, "supplier")
      su.join(n, n("n_nationkey") === su("s_nationkey"), "right")
        .select(col("n_name"), col("s_suppkey"))
        .orderBy(col("n_name"), col("s_suppkey").asc_nulls_first)
    },

    GQuery(
      "q_join_full",
      """WITH a AS (SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 20),
        |     b AS (SELECT n_nationkey AS k FROM nation WHERE n_nationkey >= 5)
        |SELECT a.k AS left_key, b.k AS right_key
        |FROM a FULL JOIN b ON a.k = b.k
        |ORDER BY a.k NULLS FIRST, b.k NULLS FIRST""".stripMargin) { (s, d) =>
      val n = Tables.load(s, d, "nation")
      val a = n.filter(col("n_nationkey") < 20).select(col("n_nationkey").as("k"))
      val b = n.filter(col("n_nationkey") >= 5).select(col("n_nationkey").as("k"))
      a.join(b, a("k") === b("k"), "full")
        .select(a("k").as("left_key"), b("k").as("right_key"))
        .orderBy(col("left_key").asc_nulls_first, col("right_key").asc_nulls_first)
    },

    GQuery(
      "q_join_semi",
      """SELECT c_custkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |              AND o.o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val c = Tables.load(s, d, "customer")
      val o = Tables.load(s, d, "orders").filter(col("o_totalprice") > 450000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    },

    GQuery(
      "q_join_anti",
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |                  AND o.o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val c = Tables.load(s, d, "customer")
      val o = Tables.load(s, d, "orders").filter(col("o_totalprice") > 450000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    },

    GQuery(
      "q_cross",
      """SELECT a.r_name AS r1, b.r_name AS r2
        |FROM region a CROSS JOIN region b
        |ORDER BY r1, r2""".stripMargin) { (s, d) =>
      val r = Tables.load(s, d, "region")
      val a = r.select(col("r_name").as("r1"))
      val b = r.select(col("r_name").as("r2"))
      a.crossJoin(b).orderBy("r1", "r2")
    },

    // --- set operations (§2.7, beyond-reference) --------------------------
    GQuery(
      "q_union",
      """SELECT c_nationkey AS k FROM customer
        |UNION
        |SELECT s_nationkey AS k FROM supplier
        |ORDER BY k""".stripMargin) { (s, d) =>
      val c = Tables.load(s, d, "customer").select(col("c_nationkey").as("k"))
      val su = Tables.load(s, d, "supplier").select(col("s_nationkey").as("k"))
      c.union(su).distinct().orderBy("k")
    },

    GQuery(
      "q_union_all",
      """SELECT k, count(*) AS n FROM (
        |  SELECT c_nationkey AS k FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS k FROM supplier) t
        |GROUP BY k ORDER BY k""".stripMargin) { (s, d) =>
      val c = Tables.load(s, d, "customer").select(col("c_nationkey").as("k"))
      val su = Tables.load(s, d, "supplier").select(col("s_nationkey").as("k"))
      c.union(su).groupBy("k").agg(count(lit(1)).as("n")).orderBy("k")
    },

    GQuery(
      "q_intersect",
      """SELECT o_custkey AS k FROM orders WHERE o_totalprice > 450000
        |INTERSECT
        |SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000
        |ORDER BY k""".stripMargin) { (s, d) =>
      val o = Tables.load(s, d, "orders").filter(col("o_totalprice") > 450000)
        .select(col("o_custkey").as("k"))
      val c = Tables.load(s, d, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("k"))
      o.intersect(c).orderBy("k")
    },

    GQuery(
      "q_except",
      """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9500
        |EXCEPT
        |SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
        |ORDER BY k""".stripMargin) { (s, d) =>
      val c = Tables.load(s, d, "customer").filter(col("c_acctbal") > 9500)
        .select(col("c_custkey").as("k"))
      val o = Tables.load(s, d, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("k"))
      c.except(o).orderBy("k")
    },

    // Range join (graft.operators.RangeJoin): orders banded into
    // (overlapping) price intervals via the bucketized equi-join — the
    // oracle runs the raw range predicate directly.
    GQuery(
      "q_range_join",
      """SELECT b.band_id, count(*) AS n_orders,
        |       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 1) AS DOUBLE) AS total
        |FROM orders o
        |JOIN (VALUES (1, 0.0, 50000.0), (2, 25000.0, 100000.0),
        |             (3, 100000.0, 200000.0), (4, 150000.0, 300000.0),
        |             (5, 300000.0, 700000.0)) AS b(band_id, lo, hi)
        |  ON o.o_totalprice >= b.lo AND o.o_totalprice <= b.hi
        |GROUP BY b.band_id
        |ORDER BY b.band_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val bands = Seq(
        (1, 0.0, 50000.0), (2, 25000.0, 100000.0), (3, 100000.0, 200000.0),
        (4, 150000.0, 300000.0), (5, 300000.0, 700000.0))
        .toDF("band_id", "lo", "hi")
      val orders = Tables.load(s, d, "orders")
      graft.operators.RangeJoin
        .intervalJoin(orders, "o_totalprice", bands, "lo", "hi", 25000.0)
        .groupBy("band_id")
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")), 1)
            .cast("double").as("total"))
        .orderBy("band_id")
    },

    // As-of join (graft.operators.AsofJoin): each click is matched to the
    // user's most recent prior-or-simultaneous view — the point-in-time
    // feature lookup. The DuckDB oracle states the semantics as a LATERAL
    // top-1 per left row with the same (ts DESC, event_id DESC) tie rule.
    GQuery(
      "q_asof_join",
      """SELECT c.event_id, c.user_id, c.ts, c.value,
        |       v.event_id AS asof_event_id, v.value AS asof_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN LATERAL (
        |  SELECT event_id, value FROM events v
        |  WHERE v.event_type = 'view' AND v.user_id = c.user_id AND v.ts <= c.ts
        |  ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) v ON TRUE
        |ORDER BY c.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.load(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val views = ev.filter(col("event_type") === "view")
        .select("user_id", "ts", "event_id", "value")
      graft.operators.AsofJoin
        .asof(clicks, views, "user_id", "ts", "ts",
          rValues = Seq("event_id", "value"), tiebreak = "event_id")
        .orderBy("event_id")
    },

    // Salted skew join (operators.SkewJoin): the salt must be semantically
    // invisible — the gate checks the salted fact⨝dim join aggregates to
    // exactly the plain join's result, which is also the oracle. The salt
    // spreads each hot supplier key across 8 reducers; the dim side is
    // replicated 8× (the documented dimension-to-fact cost model).
    GQuery(
      "q_skew_join",
      """SELECT s.s_nationkey, count(*) AS n_items,
        |       CAST(round(sum(CAST(l.l_quantity AS DECIMAL(18,2))), 1) AS DOUBLE) AS total_qty
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |WHERE l.l_orderkey % 3 = 0
        |GROUP BY s.s_nationkey ORDER BY s.s_nationkey""".stripMargin) { (s, d) =>
      // the measured fact slice is a deterministic third of lineitem: the
      // gate proves salted == plain-oracle equivalence and the pinned
      // shuffle-hash shape (PlanSpec), not bulk shuffle throughput — the
      // full-table cost is the operator's documented 100 TB trade, no
      // need to pay it per bench run
      val li = Tables.load(s, d, "lineitem")
        .filter(col("l_orderkey") % 3 === 0)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_quantity"))
      val sup = Tables.load(s, d, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      graft.operators.SkewJoin.saltedJoin(li, sup, "l_suppkey", "l_orderkey", 8)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_quantity").cast("decimal(18,2)")), 1)
            .cast("double").as("total_qty"))
        .orderBy("s_nationkey")
    }
  )
}
