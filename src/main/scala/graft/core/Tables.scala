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
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view named after the table, so SQL-text
    * entry points (`spark.sql`) see the same catalog the DataFrame API uses.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}
