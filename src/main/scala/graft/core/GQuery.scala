package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query in the engine's declared surface (SURVEY.md §2).
  *
  * @param name    stable key, referenced by the driver's correctness gate
  * @param fn      Spark implementation: (session, sfDir) => result
  * @param oracle  equivalent ANSI SQL for DuckDB over the same parquet
  *                tables; None for ops not expressible in SQL (the driver
  *                then records a weaker rows-only check)
  *
  * Determinism contract (so the driver's hash-compare is stable):
  *   - every query ORDER BYs a unique key set, in both Spark and oracle;
  *   - floating-point outputs are rounded to a fixed scale in both;
  *   - integer sums are cast to BIGINT in the oracle (DuckDB widens integer
  *     SUM to HUGEINT, Spark to LONG).
  */
final case class GQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GQuery {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): GQuery =
    GQuery(name, fn, Some(oracle))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): GQuery =
    GQuery(name, fn, None)
}
