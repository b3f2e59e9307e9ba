package graft.sources

import java.io.{BufferedWriter, File, FileWriter}

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{AlwaysTrue, Filter}
import org.apache.spark.sql.types.{DataType, StructType}

/** Append write path for [[FileTable]] — the connector's insert sink
  * (reference: per-backend `CreateMutator`/`Put` upserts,
  * dataux backends/cassandra/sql_to_cql.go:246-361).
  *
  * Standard two-phase file commit: each task writes a hidden
  * `.tmp-<query>-<partition>` file, the driver renames all temp files to
  * visible `part-*` files in `commit()` and deletes them in `abort()`, so
  * readers never observe a partial write. One output file per input
  * partition preserves upstream parallelism — at cluster scale the table
  * accumulates many part files, which is exactly what the one-partition-
  * per-file scan side wants. Empty partitions produce no file.
  */
class FileWriteBuilder(
    table: FileTable, dirPath: String, format: String,
    schema: StructType, queryId: String)
  extends WriteBuilder with SupportsOverwrite {

  private var overwriteFilters: Array[Filter] = Array.empty

  /** INSERT OVERWRITE / REPLACE TABLE: matching rows are removed in the
    * driver-side commit (before the new part files become visible), so a
    * reader sees either the old or the new data, never a mix of halves.
    * Truncate (`AlwaysTrue`) deletes the old part files outright. */
  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    val unsupported = filters.filterNot {
      case _: AlwaysTrue => true
      case f => table.acceptsFilter(f)
    }
    if (unsupported.nonEmpty)
      throw new UnsupportedOperationException(
        s"overwrite by ${unsupported.mkString(", ")} not supported")
    overwriteFilters = filters
    this
  }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new FileBatchWrite(table, dirPath, format, schema, queryId, overwriteFilters)
    override def description(): String = s"GraftFileWrite format=$format dir=$dirPath"
  }
}

/** keyMin/keyMax: rendered min/max of the table's first declared key
  * column over this file's rows (null = no keys or no non-null values) —
  * the per-file range metadata behind get-by-key file pruning. */
final case class FileCommitMessage(
    tmpPath: String, finalName: String,
    keyMin: String = null, keyMax: String = null)
  extends WriterCommitMessage

class FileBatchWrite(
    table: FileTable, dirPath: String, format: String,
    schema: StructType, queryId: String,
    overwriteFilters: Array[Filter] = Array.empty)
  extends BatchWrite {

  // index of the table's first declared key column (range metadata unit)
  private val keyIdx: Int = table.keys.headOption
    .map(k => schema.fieldNames.indexWhere(_.equalsIgnoreCase(k))).getOrElse(-1)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new FileDataWriterFactory(dirPath, format, schema.json, queryId, keyIdx)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    if (overwriteFilters.nonEmpty) {
      if (overwriteFilters.forall(_.isInstanceOf[AlwaysTrue]))
        table.dataFiles().foreach(_.delete())
      else table.deleteWhere(overwriteFilters)
    }
    messages.foreach {
      case FileCommitMessage(tmp, fin, _, _) =>
        val t = new File(tmp)
        if (t.isFile && !t.renameTo(new File(new File(dirPath), fin)))
          throw new IllegalStateException(s"commit rename failed: $tmp -> $fin")
      case null => // empty partition
    }
    // record per-file key ranges alongside the data (driver-side, after
    // the renames — the metadata behind get-by-key file pruning)
    KeyRanges.merge(new File(dirPath), messages.collect {
      case FileCommitMessage(_, fin, mn, mx) if mn != null =>
        fin -> (mn, mx)
    }.toMap)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case FileCommitMessage(tmp, _, _, _) => new File(tmp).delete()
      case null =>
    }
}

class FileDataWriterFactory(
    dirPath: String, format: String, schemaJson: String, queryId: String,
    keyIdx: Int = -1)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new FileDataWriter(dirPath, format, schemaJson, queryId, partitionId, taskId, keyIdx)
}

class FileDataWriter(
    dirPath: String, format: String, schemaJson: String,
    queryId: String, partitionId: Int, taskId: Long, keyIdx: Int = -1)
  extends DataWriter[InternalRow] {

  private val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  private val codec = FileCodec.forFormat(format)
  private val toScala = schema.fields.map(f =>
    CatalystTypeConverters.createToScalaConverter(f.dataType))
  private val tmp = new File(dirPath,
    f".tmp-$queryId-$partitionId%05d-$taskId")
  private val finalName = f"part-$queryId-$partitionId%05d.${codec.extension}"

  private var out: BufferedWriter = _
  private var keyMin: Any = null
  private var keyMax: Any = null

  override def write(record: InternalRow): Unit = {
    if (out == null) { // lazily created: empty partitions write no file
      tmp.getParentFile.mkdirs()
      out = FileCodec.utf8Writer(tmp)
      codec.writeHeader(out, schema)
    }
    val ext = Array.tabulate[Any](schema.length) { i =>
      if (record.isNullAt(i)) null
      else toScala(i)(record.get(i, schema.fields(i).dataType))
    }
    if (keyIdx >= 0 && ext(keyIdx) != null) {
      val k = ext(keyIdx)
      if (keyMin == null || FilterEval.cmp(k, keyMin).exists(_ < 0)) keyMin = k
      if (keyMax == null || FilterEval.cmp(k, keyMax).exists(_ > 0)) keyMax = k
    }
    codec.write(out, ext, schema)
  }

  override def commit(): WriterCommitMessage = {
    if (out == null) null
    else {
      out.close(); out = null
      FileCommitMessage(tmp.getPath, finalName,
        LineCodec.render(keyMin), LineCodec.render(keyMax))
    }
  }

  override def abort(): Unit = close()

  override def close(): Unit = {
    if (out != null) { out.close(); out = null; tmp.delete() }
  }
}
