package graft.queries

import graft.core.{GQuery, Tables}
import graft.engine.GraftEngine

/** Queries routed through the SQL-text front door (GraftEngine.sql) rather
  * than the DataFrame API — proving the dialect shims (qlbridge function
  * aliases, @-variable substitution) resolve inside full Catalyst plans.
  */
object DialectSql {

  val queries: Seq[GQuery] = Seq(

    // Prepared statements through the front door (reference: COM_STMT_PREPARE
    // dispatch, frontends/mysqlfe/mysql_handler.go:142): PREPARE / EXECUTE
    // USING with positional `?` binding, then DEALLOCATE — the oracle is the
    // statement with the parameters inlined.
    GQuery(
      "q_prepared",
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |WHERE o_totalprice > 450000.0 AND o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.registerAll(s, d)
      val eng = new GraftEngine(s)
      eng.sql("PREPARE q_gate_stmt FROM 'SELECT o_orderkey, o_orderpriority, " +
        "o_totalprice FROM orders WHERE o_totalprice > ? AND " +
        "o_orderpriority = ? ORDER BY o_orderkey'")
      val out = eng.sql("EXECUTE q_gate_stmt USING 450000.0, '1-URGENT'")
      eng.sql("DEALLOCATE q_gate_stmt")
      out
    },

    GQuery(
      "q_dialect_funcs",
      """SELECT p_partkey,
        |       CAST(p_size AS BIGINT) AS psize,
        |       upper(p_name) AS uname,
        |       (p_name IS NOT NULL) AS has_name,
        |       md5(p_brand) AS brand_md5
        |FROM part
        |WHERE p_name LIKE 'red%'
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.registerAll(s, d)
      new GraftEngine(s).sql(
        """SELECT p_partkey,
          |       toint(p_size) AS psize,
          |       toupper(p_name) AS uname,
          |       exists(p_name) AS has_name,
          |       hash_md5(p_brand) AS brand_md5
          |FROM part
          |WHERE hasprefix(p_name, 'red')
          |ORDER BY p_partkey""".stripMargin)
    },

    // qlbridge string/url/email builtin family over synthesized values
    // (the fixtures carry no email/url columns, so the query builds them
    // deterministically from documents and both engines parse them back).
    GQuery(
      "q_dialect_strings",
      """SELECT doc_id,
        |       split_part(em, '@', 1) AS uname,
        |       lower(split_part(em, '@', 2)) AS dom,
        |       regexp_extract(url, 'http://([^/]+)', 1) AS h,
        |       regexp_extract(url, 'http://[^/]+(/[^?]*)', 1) AS p,
        |       regexp_extract(url, '[?&]lang=([^&]*)', 1) AS q,
        |       coalesce(NULL, lang, 'xx') AS l,
        |       CAST(length(source) AS BIGINT) AS src_len,
        |       replace(source, 'src', 'origin-') AS origin,
        |       concat_ws('-', lang, source) AS tag
        |FROM (SELECT doc_id, lang, source,
        |             concat('User.', CAST(doc_id AS VARCHAR), '@', source, '.Example.COM') AS em,
        |             concat('http://', source, '.example.com/docs/',
        |                    CAST(doc_id AS VARCHAR), '?lang=', lang) AS url
        |      FROM documents WHERE doc_id < 200) t
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.registerAll(s, d)
      new GraftEngine(s).sql(
        """SELECT doc_id,
          |       emailname(em) AS uname,
          |       emaildomain(em) AS dom,
          |       host(url) AS h,
          |       path(url) AS p,
          |       qs(url, 'lang') AS q,
          |       oneof(NULL, lang, 'xx') AS l,
          |       toint(len(source)) AS src_len,
          |       replace(source, 'src', 'origin-') AS origin,
          |       join(lang, source, '-') AS tag
          |FROM (SELECT doc_id, lang, source,
          |             concat('User.', doc_id, '@', source, '.Example.COM') AS em,
          |             concat('http://', source, '.example.com/docs/',
          |                    doc_id, '?lang=', lang) AS url
          |      FROM documents WHERE doc_id < 200) t
          |ORDER BY doc_id""".stripMargin)
    },

    GQuery(
      "q_session_vars",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 495000
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.registerAll(s, d)
      val eng = new GraftEngine(s)
      eng.sql("SET @price_floor = 495000")
      eng.sql(
        """SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_totalprice > @price_floor
          |ORDER BY o_orderkey""".stripMargin)
    },

    // Statement surface: DESCRIBE through the engine front door
    // (reference rewrites SHOW/DESCRIBE to schema-table selects,
    // mysql_handler.go:239-240); the oracle states the expected schema
    // literally. Sorted by column name for the determinism contract.
    GQuery(
      "q_describe",
      """SELECT * FROM (VALUES
        |  ('n_name',      'string', CAST(NULL AS VARCHAR)),
        |  ('n_nationkey', 'int',    CAST(NULL AS VARCHAR)),
        |  ('n_regionkey', 'int',    CAST(NULL AS VARCHAR)))
        |       AS t(col_name, data_type, comment)
        |ORDER BY col_name""".stripMargin) { (s, d) =>
      Tables.registerAll(s, d)
      new GraftEngine(s).sql("DESCRIBE nation").orderBy("col_name")
    },

    // SHOW CREATE TABLE renders MySQL-style DDL (reference:
    // sql_writer.go:164-201); oracle states the rendering literally.
    GQuery(
      "q_show_create",
      """SELECT * FROM (VALUES ('nation',
        |  'CREATE TABLE `nation` (' || chr(10) ||
        |  '  `n_nationkey` int(11),' || chr(10) ||
        |  '  `n_name` varchar(255),' || chr(10) ||
        |  '  `n_regionkey` int(11)' || chr(10) ||
        |  ') ENGINE=InnoDB DEFAULT CHARSET=utf8;'))
        |       AS t("Table", "Create Table")""".stripMargin) { (s, d) =>
      Tables.registerAll(s, d)
      new GraftEngine(s).sql("SHOW CREATE TABLE nation")
    },

    GQuery(
      "q_json_dialect",
      """SELECT event_id, json_extract_string(props, '$.k') AS k
        |FROM events WHERE event_id < 50
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.registerAll(s, d)
      new GraftEngine(s).sql(
        """SELECT event_id, json_jmespath(props, '$.k') AS k
          |FROM events WHERE event_id < 50
          |ORDER BY event_id""".stripMargin)
    }
  )
}
