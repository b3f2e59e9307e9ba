package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{GQuery, Tables}

/** Scalar function / expression surface (SURVEY.md §2.8).
  *
  * Covers the qlbridge builtin families the reference loads wholesale
  * (string, math, date, json, regex, casts, CASE) with Spark's codegen'd
  * `functions._` equivalents. Cross-engine gotchas encoded here:
  *   - DuckDB CAST(double AS INT) rounds, Spark truncates → use floor();
  *   - transcendental fns (ln/exp) can differ in the last ULP → round(6);
  *   - Spark weekday(ts)+1 == DuckDB isodow (Mon=1..Sun=7);
  *   - timestamps are emitted as formatted strings (date_format vs strftime)
  *     to sidestep parquet LTZ/NTZ ambiguity in the compare.
  */
object Scalars {

  val queries: Seq[GQuery] = Seq(

    GQuery(
      "q_string_funcs",
      """SELECT p_partkey,
        |       upper(p_name) AS uname,
        |       lower(p_brand) AS lbrand,
        |       substring(p_name, 1, 4) AS pre4,
        |       length(p_name) AS nlen,
        |       replace(p_type, 'ECONOMY', 'ECON') AS rtype,
        |       concat(p_brand, ':', p_type) AS btype,
        |       trim(concat(' ', p_name, ' ')) AS trimmed,
        |       reverse(p_brand) AS rbrand,
        |       lpad(CAST(p_size AS VARCHAR), 4, '0') AS szpad,
        |       split_part(p_name, ' ', 1) AS first_word
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.load(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        lower(col("p_brand")).as("lbrand"),
        substring(col("p_name"), 1, 4).as("pre4"),
        length(col("p_name")).as("nlen"),
        regexp_replace(col("p_type"), lit("ECONOMY"), lit("ECON")).as("rtype"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("btype"),
        trim(concat(lit(" "), col("p_name"), lit(" "))).as("trimmed"),
        reverse(col("p_brand")).as("rbrand"),
        lpad(col("p_size").cast("string"), 4, "0").as("szpad"),
        split(col("p_name"), " ").getItem(0).as("first_word"))
        .orderBy("p_partkey")
    },

    GQuery(
      "q_math_funcs",
      """SELECT l_orderkey, l_linenumber,
        |       round(abs(l_discount - l_tax), 4) AS adiff,
        |       CAST(floor(l_quantity) AS BIGINT) AS fq,
        |       CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS ck,
        |       l_partkey % 7 AS m7,
        |       round(sqrt(l_quantity), 6) AS sq,
        |       round(ln(l_extendedprice), 6) AS lnp,
        |       round(power(l_discount, 2), 8) AS d2
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(abs(col("l_discount") - col("l_tax")), 4).as("adiff"),
          floor(col("l_quantity")).as("fq"),
          ceil(col("l_extendedprice") / 1000).as("ck"),
          (col("l_partkey") % 7).as("m7"),
          round(sqrt(col("l_quantity")), 6).as("sq"),
          round(log(col("l_extendedprice")), 6).as("lnp"),
          round(pow(col("l_discount"), 2), 8).as("d2"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    GQuery(
      "q_case_when",
      """SELECT bucket, count(*) AS n,
        |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 1) AS DOUBLE) AS total
        |FROM (SELECT CASE WHEN o_totalprice > 300000 THEN 'big'
        |                  WHEN o_totalprice > 100000 THEN 'mid'
        |                  ELSE 'small' END AS bucket, o_totalprice
        |      FROM orders) t
        |GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      Tables.load(s, d, "orders")
        .select(
          when(col("o_totalprice") > 300000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("bucket"),
          col("o_totalprice"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")), 1)
            .cast("double").as("total"))
        .orderBy("bucket")
    },

    GQuery(
      "q_casts",
      """SELECT o_orderkey,
        |       CAST(o_orderkey AS VARCHAR) AS key_str,
        |       CAST(floor(o_totalprice) AS BIGINT) AS price_int,
        |       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS odate,
        |       CAST(o_orderstatus = 'O' AS INT) AS is_open
        |FROM orders WHERE o_orderkey < 500
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.load(s, d, "orders")
        .filter(col("o_orderkey") < 500)
        .select(
          col("o_orderkey"),
          col("o_orderkey").cast("string").as("key_str"),
          floor(col("o_totalprice")).cast("long").as("price_int"),
          date_format(col("o_orderdate").cast("date"), "yyyy-MM-dd").as("odate"),
          (col("o_orderstatus") === "O").cast("int").as("is_open"))
        .orderBy("o_orderkey")
    },

    GQuery(
      "q_date_funcs",
      """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |       count(*) AS n,
        |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 1) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin) { (s, d) =>
      Tables.load(s, d, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")), 1)
            .cast("double").as("total"))
        .orderBy("yr", "mo")
    },

    GQuery(
      "q_date_parts",
      """SELECT event_id,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |       day(ts) AS dd, hour(ts) AS hh, minute(ts) AS mi,
        |       isodow(ts) AS dow,
        |       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS ts_hour
        |FROM events WHERE event_id < 200
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.load(s, d, "events")
        .filter(col("event_id") < 200)
        .select(
          col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
          dayofmonth(col("ts")).as("dd"),
          hour(col("ts")).as("hh"),
          minute(col("ts")).as("mi"),
          (weekday(col("ts")) + 1).as("dow"),
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
            .as("ts_hour"))
        .orderBy("event_id")
    },

    GQuery(
      "q_json",
      """SELECT event_type,
        |       count(*) AS n,
        |       CAST(round(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) * 10000.0
        |                  / count(json_extract_string(props, '$.k'))) AS BIGINT) / 10000.0 AS avg_k,
        |       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val k = get_json_object(col("props"), "$.k").cast("long")
      Tables.load(s, d, "events")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          // integer-space avg rounding (see q_text_quality)
          (round(sum(k) * lit(10000.0) / count(k)).cast("long") / lit(10000.0))
            .as("avg_k"),
          max(k).as("max_k"))
        .orderBy("event_type")
    },

    // Spark 4 VARIANT path for JSON columns (the reference's JsonType,
    // results_mysql.go:248-249, surfaces MYSQL_TYPE_JSON; SURVEY §1.2 maps
    // it to StringType+funcs OR VariantType in Spark 4 — this is the
    // variant arm). parse_json builds the binary variant once; typed path
    // extraction (variant_get) replaces per-access string re-parsing —
    // at 100 TB the parse happens once per row, not once per predicate.
    GQuery(
      "q_json_variant",
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 95
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.load(s, d, "events")
        .select(col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
        .filter(col("k") >= 95)
        .orderBy("event_id")
    },

    GQuery(
      "q_regex",
      """SELECT p_partkey, p_name,
        |       regexp_extract(p_name, '^(\w+)', 1) AS head_word
        |FROM part
        |WHERE regexp_matches(p_name, '^(red|blue) ')
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.load(s, d, "part")
        .filter(col("p_name").rlike("^(red|blue) "))
        .select(col("p_partkey"), col("p_name"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("head_word"))
        .orderBy("p_partkey")
    },

    GQuery(
      "q_coalesce_nullif",
      """SELECT n.n_nationkey,
        |       coalesce(CAST(s.cnt AS BIGINT), 0) AS n_supp,
        |       nullif(n.n_regionkey, 0) AS region_or_null
        |FROM nation n
        |LEFT JOIN (SELECT s_nationkey, count(*) AS cnt FROM supplier
        |           WHERE s_acctbal > 5000 GROUP BY s_nationkey) s
        |  ON n.n_nationkey = s.s_nationkey
        |ORDER BY n.n_nationkey""".stripMargin) { (s, d) =>
      val n = Tables.load(s, d, "nation")
      val su = Tables.load(s, d, "supplier")
        .filter(col("s_acctbal") > 5000)
        .groupBy("s_nationkey").agg(count(lit(1)).as("cnt"))
      n.join(su, n("n_nationkey") === su("s_nationkey"), "left")
        .select(
          col("n_nationkey"),
          coalesce(col("cnt"), lit(0L)).as("n_supp"),
          nullif(col("n_regionkey"), lit(0)).as("region_or_null"))
        .orderBy("n_nationkey")
    }
  )
}
