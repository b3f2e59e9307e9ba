package graft.sources

import java.io.File

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming._
import org.apache.spark.sql.sources.Filter

/** Structured Streaming source over a connector table: new part files are
  * the stream (the same contract as Spark's own file stream source — the
  * table must be append-only; INSERTs add files, and a file is immutable
  * once its commit renames it visible).
  *
  * Offsets are the set of consumed file names (order-independent: part
  * names carry a random query id, so a lexicographic high-watermark would
  * drop late-sorting files). At this table scale that set is small; a
  * production port compacts it into a metadata log exactly like
  * `FileStreamSource` does — the offset SEMANTICS (exactly-once at file
  * granularity, replayable from the checkpoint) are what this implements.
  *
  * Each batch plans one partition per new file through the same
  * [[FilePartition]]/[[FilePartitionReaderFactory]] machinery as the batch
  * scan, so pushed filters and column pruning apply to streaming reads
  * unchanged.
  */
class FileMicroBatchStream(
    dirPath: String,
    extension: String,
    format: String,
    parseSchemaJson: String,
    outputSchemaJson: String,
    outputIndices: Array[Int],
    pushed: Array[Filter])
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val mapper = new ObjectMapper()

  private def currentNames: Set[String] =
    FileTable.dataFiles(new File(dirPath), extension).map(_.getName).toSet

  // Trigger.AvailableNow pins the target offset at query start so the run
  // terminates even if writers keep appending
  @volatile private var availableNowTarget: Option[Set[String]] = None

  private def toOffset(names: Set[String]): FilesOffset = FilesOffset(
    mapper.writeValueAsString(names.toSeq.sorted.toArray))

  override def initialOffset(): Offset = toOffset(Set.empty)

  override def deserializeOffset(json: String): Offset = FilesOffset(json)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(currentNames)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    toOffset(availableNowTarget.getOrElse(currentNames))

  override def reportLatestOffset(): Offset = toOffset(currentNames)

  private def names(o: Offset): Set[String] = o match {
    case FilesOffset(json) =>
      mapper.readValue(json, classOf[Array[String]]).toSet
    case other => throw new IllegalStateException(s"foreign offset: $other")
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    // append-only contract enforcement: if a consumed file no longer
    // exists, the table was compacted/rewritten under this stream — the
    // replacement files would replay every row as duplicates (and a
    // just-deleted file would read as empty). Fail loudly; restart the
    // stream with a fresh checkpoint after table maintenance.
    val live = currentNames
    val vanished = names(start) -- live
    require(vanished.isEmpty,
      s"streaming source $dirPath violated the append-only contract: " +
        s"consumed files were rewritten (OPTIMIZE/UPDATE under an active " +
        s"stream?): ${vanished.toSeq.sorted.take(5).mkString(", ")}")
    val newNames = (names(end) -- names(start)).toSeq.sorted
    newNames.map { n =>
      val f = new File(dirPath, n)
      require(f.isFile,
        s"streaming source $dirPath: planned file vanished before read: $n")
      FilePartition(Array(FileChunk(f.getPath, 0L, f.length())), format,
        parseSchemaJson, outputSchemaJson, outputIndices, pushed,
        limit = -1, topN = Array.empty, offset = 0): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FilePartitionReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Offset = JSON array of consumed file names. */
final case class FilesOffset(jsonValue: String) extends Offset {
  override def json(): String = jsonValue
}
