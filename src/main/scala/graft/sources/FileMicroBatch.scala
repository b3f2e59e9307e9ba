package graft.sources

import java.io.File

import scala.collection.concurrent.TrieMap

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming._
import org.apache.spark.sql.sources.Filter

/** Structured Streaming source over a connector table: new part files are
  * the stream (the same contract as Spark's own file stream source — the
  * table must be append-only; INSERTs add files, and a file is immutable
  * once its commit renames it visible).
  *
  * Offsets are COMPACT: `{"id": N}` pointing into a [[FilesMetadataLog]]
  * kept under the query's checkpoint location, exactly the
  * FileStreamSource design — each log entry records the file-name DELTA
  * its batch discovered, every [[FilesMetadataLog.CompactInterval]]-th
  * entry folds the full set so far and older entries are deleted. The
  * offset JSON written per batch is therefore O(1) for the life of the
  * stream (the previous design serialized the full consumed-name set into
  * every offset — O(total files ever) checkpoint growth on a long-lived
  * table). Exactly-once at file granularity and checkpoint replay are
  * unchanged; pre-compaction checkpoints (v1 name-set offsets) still
  * deserialize and resume.
  *
  * Admission control: `maxFilesPerTrigger` caps the files admitted per
  * micro-batch (rate limiting for backfills); Trigger.AvailableNow pins
  * the target file set at query start so the run terminates even if
  * writers keep appending.
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
    pushed: Array[Filter],
    checkpointLocation: String,
    maxFilesPerTrigger: Option[Int] = None)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val mapper = new ObjectMapper()

  // the engine hands the per-source checkpoint dir as a `file:` URI (or a
  // scheme-less path when configured so); either way the log lives inside it
  private val log = new FilesMetadataLog(new File(FileMicroBatchStream.localFile(
    checkpointLocation), "graft-files"))

  private def currentNames: Set[String] =
    FileTable.dataFiles(new File(dirPath), extension).map(_.getName).toSet

  @volatile private var availableNowTarget: Option[Set[String]] = None

  override def initialOffset(): Offset = FilesSeqOffset(-1L)

  override def deserializeOffset(json: String): Offset = {
    val t = json.trim
    if (t.startsWith("[")) FilesOffset(json) // v1 checkpoint: explicit names
    else FilesSeqOffset(mapper.readTree(t).get("id").asLong())
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(currentNames)

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  /** Discover new files, record their names as a log delta, and return the
    * resulting log position. The log write happens here (not in commit) so
    * a planned-but-uncommitted batch replays the identical file set from
    * the checkpoint after a crash. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val target = availableNowTarget.getOrElse(currentNames)
    val known = log.namesUpTo(log.latestId)
    var delta = (target -- known).toSeq.sorted
    limit match {
      case m: ReadMaxFiles => delta = delta.take(m.maxFiles())
      case _ =>
    }
    if (delta.isEmpty) FilesSeqOffset(log.latestId)
    else FilesSeqOffset(log.append(delta))
  }

  override def reportLatestOffset(): Offset = FilesSeqOffset(log.latestId)

  private def names(o: Offset): Set[String] = o match {
    case FilesSeqOffset(id) => log.namesUpTo(id)
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

object FileMicroBatchStream {
  /** `file:` URI or plain path → local File (this connector is local-fs
    * scoped; see the FileTable scale note on the Hadoop FileSystem seam). */
  def localFile(location: String): File = {
    val u = try new java.net.URI(location) catch { case _: Exception => null }
    if (u != null && u.getScheme == "file") new File(u.getPath)
    else new File(location)
  }
}

/** v2 offset: a position in the [[FilesMetadataLog]] — O(1) however many
  * files the stream has consumed. */
final case class FilesSeqOffset(id: Long) extends Offset {
  override def json(): String = s"""{"id":$id}"""
}

/** v1 offset (pre-compaction checkpoints): JSON array of consumed file
  * names. Still deserialized so existing checkpoints resume; every new
  * offset is written as [[FilesSeqOffset]]. */
final case class FilesOffset(jsonValue: String) extends Offset {
  override def json(): String = jsonValue
}

/** FileStreamSource-style compacted metadata log: entry `<id>` is a JSON
  * array of the file names first seen at log position `id`; every
  * [[FilesMetadataLog.CompactInterval]]-th position (id % interval ==
  * interval-1, like Spark's CompactibleFileStreamLog) is written as the
  * FULL accumulated set (`<id>.compact`) and entries older than the
  * PREVIOUS compact position are deleted — so the log directory holds at
  * most ~2 compaction windows of files while any recent offset stays
  * resolvable. Writes are atomic (tmp + rename). Resolution results are
  * memoized per id (append-only log ⇒ safe).
  */
class FilesMetadataLog(dir: File) {

  import FilesMetadataLog.CompactInterval

  dir.mkdirs()
  private val mapper = new ObjectMapper()
  private val cache = TrieMap.empty[Long, Set[String]]

  private def isCompact(id: Long): Boolean = id % CompactInterval == CompactInterval - 1

  private def entryFile(id: Long): File =
    new File(dir, if (isCompact(id)) s"$id.compact" else id.toString)

  private def listIds: Seq[Long] =
    Option(dir.listFiles()).getOrElse(Array.empty[File])
      .flatMap(f => scala.util.Try(f.getName.stripSuffix(".compact").toLong).toOption)
      .sorted.toSeq

  def latestId: Long = listIds.lastOption.getOrElse(-1L)

  private def readEntry(id: Long): Seq[String] = {
    val node = mapper.readTree(entryFile(id))
    (0 until node.size()).map(node.get(_).asText())
  }

  /** All file names recorded at positions <= id. */
  def namesUpTo(id: Long): Set[String] = {
    if (id < 0) return Set.empty
    cache.getOrElseUpdate(id, {
      // nearest compact position at or below id; earlier entries are
      // folded into it (and may already be deleted)
      val base = (id + 1) / CompactInterval * CompactInterval - 1
      val seed: Set[String] =
        if (base >= 0 && entryFile(base).isFile) readEntry(base).toSet
        else if (base >= 0)
          throw new IllegalStateException(
            s"files metadata log $dir: compact entry $base missing for offset $id")
        else Set.empty
      (math.max(0L, base + 1) to id).foldLeft(seed) { (acc, i) =>
        if (entryFile(i).isFile) acc ++ readEntry(i)
        else throw new IllegalStateException(
          s"files metadata log $dir: entry $i missing for offset $id")
      }
    })
  }

  /** Record a delta at the next position; compact + clean up on interval
    * boundaries. Returns the new position. */
  def append(delta: Seq[String]): Long = synchronized {
    val id = latestId + 1
    val payload: Seq[String] =
      if (isCompact(id)) (namesUpTo(id - 1) ++ delta).toSeq.sorted
      else delta
    val tmp = new File(dir, s".${entryFile(id).getName}.tmp")
    val w = FileCodec.utf8Writer(tmp)
    try w.write(mapper.writeValueAsString(payload.toArray)) finally w.close()
    if (!tmp.renameTo(entryFile(id)))
      throw new IllegalStateException(s"files metadata log write failed: $id")
    if (isCompact(id)) {
      // retain two full compaction windows (including the older window's
      // compact entry, which mid-window offsets resolve through); a
      // recoverable offset is never older than the last committed batch,
      // which is well inside that range
      val floor = id - 2 * CompactInterval - 1
      listIds.filter(_ <= floor).foreach(i => entryFile(i).delete())
    }
    id
  }
}

object FilesMetadataLog {
  /** Every N-th log position folds the full name set (Spark default-ish). */
  val CompactInterval = 10
}
