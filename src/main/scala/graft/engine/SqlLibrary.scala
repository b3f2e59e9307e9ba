package graft.engine

import org.apache.spark.sql.SparkSession

import graft.queries.Curation

/** The curation operators as a SQL-text library: Spark 4's SQL UDFs
  * (scalar and table-valued) let the engine expose its deterministic
  * curation primitives to a pure-SQL client — the same front-door story
  * as the reference's function registry
  * (dataux frontends/mysqlfe/mysql_functions.go:20-78), but with
  * table-valued functions the reference never had. Registered idempotently
  * per session by [[GraftEngine]]; a JDBC client gets them by issuing the
  * same statements (or via an init script).
  *
  * The bodies are plain Catalyst SQL, so everything here inherits
  * whole-stage codegen and the single-pass shapes of the operator forms —
  * a SQL UDF is inlined into the caller's plan, not interpreted per row.
  */
object SqlLibrary {

  /** Spark's SQL parser backslash-unescapes string literals (unlike the
    * DuckDB oracle's), so a regex embedded in a statement needs its
    * backslashes doubled to survive parsing intact. */
  private def sqlLit(re: String): String = re.replace("\\", "\\\\")

  /** CREATE OR REPLACE statements for the library. Kept as data so tests
    * and an external init script share the exact definitions. */
  def statements: Seq[String] = Seq(
    // deterministic sampling coin in [0, 100) — Curation's arithmetic
    s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_coin(id BIGINT)
       |RETURNS BIGINT
       |RETURN ((id % ${Curation.P}) * ${Curation.KNUTHP}) % ${Curation.P} % 100""".stripMargin,
    // whitespace tokenizer (the shared TextHash tokenization)
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_tokens(text STRING)
      |RETURNS ARRAY<STRING>
      |RETURN filter(split(lower(text), '\\s+'), x -> x != '')""".stripMargin,
    // PII/blocklist scrub (email, IPv4, blocked terms -> mask)
    s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_redact(text STRING)
       |RETURNS STRING
       |RETURN regexp_replace(regexp_replace(regexp_replace(lower(text),
       |  '${sqlLit(Curation.EmailRe)}', '${Curation.Mask}'),
       |  '${sqlLit(Curation.Ipv4Re)}', '${Curation.Mask}'),
       |  '${sqlLit(Curation.BlockRe)}', '${Curation.Mask}')""".stripMargin,
    // RAG chunking as a TABLE function: windows of `w` tokens every `s`
    // tokens; used with LATERAL for per-document fan-out
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_chunks(text STRING, w INT, s INT)
      |RETURNS TABLE (chunk_id BIGINT, n_tokens BIGINT, chunk_md5 STRING)
      |RETURN SELECT ci AS chunk_id,
      |       CAST(size(slice(toks, CAST(ci*s+1 AS INT), w)) AS BIGINT) AS n_tokens,
      |       md5(CAST(concat_ws(' ', slice(toks, CAST(ci*s+1 AS INT), w)) AS BINARY)) AS chunk_md5
      |FROM (SELECT filter(split(lower(text), '\\s+'), x -> x != '') AS toks) t
      |LATERAL VIEW explode(
      |  CASE WHEN size(toks) = 0 THEN array()
      |       ELSE sequence(0L, (greatest(CAST(size(toks) AS BIGINT) - w, 0L) + s - 1) DIV s)
      |  END) AS ci""".stripMargin)

  // once per session: GraftEngine is constructed inside measured gate
  // closures, and re-parsing four CREATE FUNCTION bodies each time would
  // tax every engine query (same memo pattern as HashFunctions.ensure).
  // Weakly keyed: a long-lived process creating many sessions (one per
  // Thrift connection) must let dead sessions — and their state — collect.
  private val registered =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Idempotently register the library in `spark`'s session (memoized). */
  def ensure(spark: SparkSession): Unit =
    if (registered.add(spark)) statements.foreach(spark.sql(_))
}
