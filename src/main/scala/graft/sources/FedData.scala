package graft.sources

import java.io.File

import org.apache.spark.sql.SparkSession

import graft.core.Tables

/** Materializes the federation fixtures: copies of driver parquet tables
  * re-encoded as CSV/JSONL *through the connector's own write path*, so the
  * correctness gate can compare connector reads against the DuckDB oracle
  * over the original parquet.
  *
  * This mirrors how the reference's file-source tests stage CSV fixtures
  * next to the other backends (dataux backends/files/filesource_test.go:
  * 258-304) and gives every q_src_* query a heterogeneous lineage:
  * parquet → DSv2 append (csv/jsonl) → DSv2 scan with pushdown.
  *
  * Idempotent per scale factor via a `_READY` marker; the copy itself is a
  * distributed write (one part file per input partition), not a driver
  * collect, so the same code path stages fixtures at any scale.
  */
object FedData {

  val SourceName = "fed"

  /** Tables staged into the `fed` source: (catalog table, format, parquet
    * origin, part files). Multi-file tables are the connector's scan
    * parallelism unit — one partition per file — so the fact-sized tables
    * are staged as several part files. */
  private val Staged = Seq(
    ("nation_csv", "csv", "nation", 1),
    ("orders_csv", "csv", "orders", 8),
    ("customer_json", "json", "customer", 4))

  private val lock = new Object

  /** Ensure catalog + staged data for `sfDir`; returns the source root. */
  def ensure(spark: SparkSession, sfDir: String): SourceDef = lock.synchronized {
    SourceRegistry.ensureCatalog(spark)
    val sfName = new File(sfDir).getName
    val root = new File(new File(sys.props("user.dir"), "target/graft-fed"), sfName)
    val existing = SourceRegistry.get(SourceName)
    val src =
      if (existing.exists(_.path == root.getPath)) existing.get
      else SourceRegistry.register(SourceDef(SourceName, root.getPath, "csv"))
    val marker = new File(root, "_READY")
    if (!marker.isFile) {
      if (root.isDirectory) delete(root)
      root.mkdirs()
      Staged.foreach { case (table, fmt, parquet, nParts) =>
        val df = Tables.load(spark, sfDir, parquet)
        FileTable.create(src, table, df.schema, fmt)
        df.repartition(nParts)
          .writeTo(s"${SourceRegistry.CatalogName}.$SourceName.$table").append()
      }
      marker.createNewFile()
    }
    src
  }

  private def delete(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(delete)
    f.delete()
  }
}
