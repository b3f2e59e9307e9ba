package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. All queries go through here so
  * that scans stay declarative (`spark.read.parquet`) and Catalyst can push
  * filters/projections into the parquet reader. At cluster scale the same
  * API points at a directory of many files; nothing here assumes a single
  * file.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** The driver has shipped `events.ts` as either TIMESTAMP(NANOS) (which
    * Spark's parquet reader rejects outright — PARQUET_TYPE_ILLEGAL — so we
    * read nanos as raw longs and truncate to microseconds, the same ns→µs
    * truncation DuckDB applies) or plain TIMESTAMP(MICROS) (which Spark
    * reads as TIMESTAMP_NTZ). Normalize both to session-TZ TimestampType —
    * the session TZ is pinned to UTC everywhere, so the NTZ cast is a
    * wall-clock no-op and both engines see identical timestamps.
    */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long fallback for TIMESTAMP(NANOS) files
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Register every table as a temp view named after the table, so SQL-text
    * entry points (`spark.sql`) see the same catalog the DataFrame API uses.
    * Idempotent per (session, sfDir): repeated calls from different query
    * bodies cost one conf lookup, not a re-read of all ten tables.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    val key = "graft.registered.sfdir"
    if (!spark.conf.getOption(key).contains(sfDir)) {
      all.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
      spark.conf.set(key, sfDir)
    }
  }
}
