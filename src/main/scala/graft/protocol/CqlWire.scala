package graft.protocol

import java.io.{DataInputStream, IOException, OutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** Cassandra native protocol v4 framing and value codecs, written from
  * the public protocol spec (the transport the reference's Cassandra
  * backend speaks through gocql; its SQL→CQL translation is
  * `backends/cassandra/sql_to_cql.go:430-560`). Network byte order
  * (big-endian) throughout — the opposite of BSON.
  *
  * Carried subset: the frame header (version/flags/stream/opcode/length),
  * STARTUP/READY, QUERY (with page-size + paging-state flags), RESULT
  * Rows (global_tables_spec metadata, has_more_pages paging), and ERROR.
  * Value codecs cover the reference's Cassandra type surface
  * (`backends/cassandra/source.go:185-239`): bigint, int, smallint,
  * double, float, varchar, boolean, timestamp (epoch millis).
  */
object CqlWire {

  val VersionRequest: Int = 0x04
  val VersionResponse: Int = 0x84

  object Op {
    val Error = 0x00
    val Startup = 0x01
    val Ready = 0x02
    val Options = 0x05
    val Supported = 0x06
    val Query = 0x07
    val Result = 0x08
  }

  /** CQL type option ids (protocol §6). */
  object T {
    val Bigint = 0x0002
    val Boolean = 0x0004
    val Double = 0x0007
    val Float = 0x0008
    val Int = 0x0009
    val Timestamp = 0x000B
    val Varchar = 0x000D
    val Smallint = 0x0013
    // collection option ids (native protocol v3+): the metadata option
    // carries the element type option(s) after the id
    val List = 0x0020
    val Map = 0x0021
    val Set = 0x0022

    /** Collection types ride as PACKED ints internally (the wire writes
      * the real [option][element option...] sequence): base id in the
      * high half, scalar element id(s) in the low bytes — matching the
      * reference's scalar-element coverage (cassandra/source.go:202-255
      * handles set<text>/set<int>/map<_, scalar>). */
    def listOf(elem: Int): Int = (List << 16) | elem
    def setOf(elem: Int): Int = (Set << 16) | elem
    def mapOf(k: Int, v: Int): Int = (Map << 16) | (k << 8) | v
    def baseOf(tid: Int): Int = tid >>> 16
    def isCollection(tid: Int): Boolean = baseOf(tid) != 0
  }

  final case class Frame(opcode: Int, stream: Int, body: Array[Byte])

  def writeFrame(out: OutputStream, f: Frame, response: Boolean): Unit = {
    val buf = ByteBuffer.allocate(9 + f.body.length)
    buf.put((if (response) VersionResponse else VersionRequest).toByte)
    buf.put(0.toByte) // flags: no compression, no tracing
    buf.putShort(f.stream.toShort)
    buf.put(f.opcode.toByte)
    buf.putInt(f.body.length)
    buf.put(f.body)
    out.write(buf.array())
    out.flush()
  }

  def readFrame(in: DataInputStream): Frame = {
    val header = new Array[Byte](9)
    in.readFully(header)
    val h = ByteBuffer.wrap(header)
    h.get() // version
    h.get() // flags
    val stream = h.getShort.toInt
    val opcode = h.get() & 0xFF
    val len = h.getInt
    val body = new Array[Byte](len)
    in.readFully(body)
    Frame(opcode, stream, body)
  }

  // ---- primitive writers -------------------------------------------------

  final class BodyOut {
    private val out = new java.io.ByteArrayOutputStream(256)
    def bytes: Array[Byte] = out.toByteArray
    def putByte(v: Int): this.type = { out.write(v); this }
    def putShort(v: Int): this.type = {
      out.write((v >>> 8) & 0xFF); out.write(v & 0xFF); this
    }
    def putInt(v: Int): this.type = {
      putShort((v >>> 16) & 0xFFFF); putShort(v & 0xFFFF); this
    }
    def putLong(v: Long): this.type = { putInt((v >>> 32).toInt); putInt(v.toInt); this }
    def putString(s: String): this.type = { // [string]: short length + utf8
      val b = s.getBytes(UTF_8); putShort(b.length); out.write(b, 0, b.length); this
    }
    def putLongString(s: String): this.type = { // [long string]: int length
      val b = s.getBytes(UTF_8); putInt(b.length); out.write(b, 0, b.length); this
    }
    def putBytes(b: Array[Byte]): this.type = { // [bytes]: int length, -1 = null
      if (b == null) putInt(-1) else { putInt(b.length); out.write(b, 0, b.length) }
      this
    }
    def putStringMap(m: Map[String, String]): this.type = {
      putShort(m.size); m.foreach { case (k, v) => putString(k); putString(v) }; this
    }
  }

  final class BodyIn(body: Array[Byte]) {
    private val buf = ByteBuffer.wrap(body)
    def getByte: Int = buf.get() & 0xFF
    def getShort: Int = buf.getShort & 0xFFFF
    def getInt: Int = buf.getInt
    def getLong: Long = buf.getLong
    def getString: String = {
      val n = getShort; val b = new Array[Byte](n); buf.get(b); new String(b, UTF_8)
    }
    def getLongString: String = {
      val n = getInt; val b = new Array[Byte](n); buf.get(b); new String(b, UTF_8)
    }
    def getBytes: Array[Byte] = {
      val n = getInt
      if (n < 0) null else { val b = new Array[Byte](n); buf.get(b); b }
    }
    def getStringMap: Map[String, String] =
      (0 until getShort).map(_ => (getString, getString)).toMap
    def remaining: Int = buf.remaining()
  }

  // ---- value codecs ------------------------------------------------------

  /** Encode one external-typed value as its CQL [bytes] payload. */
  def encodeValue(v: Any, typeId: Int): Array[Byte] = v match {
    case null => null
    case _ =>
      val b = typeId match {
        case T.Bigint => ByteBuffer.allocate(8).putLong(v.asInstanceOf[Number].longValue())
        case T.Int => ByteBuffer.allocate(4).putInt(v.asInstanceOf[Number].intValue())
        case T.Smallint => ByteBuffer.allocate(2).putShort(v.asInstanceOf[Number].shortValue())
        case T.Double => ByteBuffer.allocate(8).putDouble(v.asInstanceOf[Number].doubleValue())
        case T.Float => ByteBuffer.allocate(4).putFloat(v.asInstanceOf[Number].floatValue())
        case T.Boolean =>
          ByteBuffer.allocate(1).put(if (v.asInstanceOf[Boolean]) 1.toByte else 0.toByte)
        case T.Timestamp =>
          val t = v.asInstanceOf[java.sql.Timestamp]
          require(t.getNanos % 1000000 == 0, s"sub-millisecond timestamp not CQL-exact: $t")
          ByteBuffer.allocate(8).putLong(t.getTime)
        case T.Varchar => return v.toString.getBytes(UTF_8)
        // collection payloads (v3+): [int32 n] then each element as
        // [bytes] (int32 length + payload); maps interleave key, value
        case tid if T.baseOf(tid) == T.List || T.baseOf(tid) == T.Set =>
          val elem = tid & 0xFFFF
          // collected Spark arrays are mutable.ArraySeq — accept any Seq
          val items = v.asInstanceOf[scala.collection.Seq[_]]
          val parts = items.map(x => encodeValue(x, elem))
          val out = ByteBuffer.allocate(4 + parts.map(p =>
            4 + (if (p == null) 0 else p.length)).sum)
          out.putInt(items.size)
          parts.foreach { p =>
            if (p == null) out.putInt(-1)
            else { out.putInt(p.length); out.put(p) }
          }
          out
        case tid if T.baseOf(tid) == T.Map =>
          val (kt, vt) = ((tid >> 8) & 0xFF, tid & 0xFF)
          val m = v.asInstanceOf[scala.collection.Map[_, _]].toSeq
          val parts = m.flatMap { case (k, x) =>
            Seq(encodeValue(k, kt), encodeValue(x, vt))
          }
          val out = ByteBuffer.allocate(4 + parts.map(p =>
            4 + (if (p == null) 0 else p.length)).sum)
          out.putInt(m.size)
          parts.foreach { p =>
            if (p == null) out.putInt(-1)
            else { out.putInt(p.length); out.put(p) }
          }
          out
        case other => throw new IllegalArgumentException(f"unsupported CQL type 0x$other%04x")
      }
      val arr = new Array[Byte](b.position())
      b.flip(); b.get(arr)
      arr
  }

  /** Decode one CQL [bytes] payload to an external-typed value. */
  def decodeValue(b: Array[Byte], typeId: Int): Any = {
    if (b == null) return null
    val buf = ByteBuffer.wrap(b)
    typeId match {
      case T.Bigint => buf.getLong: java.lang.Long
      case T.Int => buf.getInt: java.lang.Integer
      case T.Smallint => buf.getShort: java.lang.Short
      case T.Double => buf.getDouble: java.lang.Double
      case T.Float => buf.getFloat: java.lang.Float
      case T.Boolean => (buf.get() != 0): java.lang.Boolean
      case T.Timestamp => new java.sql.Timestamp(buf.getLong)
      case T.Varchar => new String(b, UTF_8)
      case tid if T.baseOf(tid) == T.List || T.baseOf(tid) == T.Set =>
        val elem = tid & 0xFFFF
        val n = buf.getInt
        (0 until n).map { _ =>
          val len = buf.getInt
          if (len < 0) null
          else { val e = new Array[Byte](len); buf.get(e); decodeValue(e, elem) }
        }
      case tid if T.baseOf(tid) == T.Map =>
        val (kt, vt) = ((tid >> 8) & 0xFF, tid & 0xFF)
        val n = buf.getInt
        def one(t: Int): Any = {
          val len = buf.getInt
          if (len < 0) null
          else { val e = new Array[Byte](len); buf.get(e); decodeValue(e, t) }
        }
        (0 until n).map(_ => (one(kt), one(vt))).toMap
      case other => throw new IOException(f"unsupported CQL type 0x$other%04x")
    }
  }

  // ---- message builders --------------------------------------------------

  def startupBody(): Array[Byte] =
    new BodyOut().putStringMap(Map("CQL_VERSION" -> "3.0.0")).bytes

  /** QUERY body: long-string CQL + consistency ONE + flags carrying an
    * optional page size and paging state. */
  def queryBody(cql: String, pageSize: Int, pagingState: Array[Byte]): Array[Byte] = {
    val b = new BodyOut().putLongString(cql).putShort(0x0001)
    var flags = 0
    if (pageSize > 0) flags |= 0x04
    if (pagingState != null) flags |= 0x08
    b.putByte(flags)
    if (pageSize > 0) b.putInt(pageSize)
    if (pagingState != null) b.putBytes(pagingState)
    b.bytes
  }

  final case class ParsedQuery(cql: String, pageSize: Int, pagingState: Array[Byte])

  def parseQueryBody(body: Array[Byte]): ParsedQuery = {
    val in = new BodyIn(body)
    val cql = in.getLongString
    in.getShort // consistency
    val flags = in.getByte
    val pageSize = if ((flags & 0x04) != 0) in.getInt else -1
    val pagingState = if ((flags & 0x08) != 0) in.getBytes else null
    ParsedQuery(cql, pageSize, pagingState)
  }

  /** RESULT Rows body. `cols` = (name, typeId); `rows` = encoded cells. */
  def rowsBody(keyspace: String, table: String, cols: Seq[(String, Int)],
      rows: Seq[Array[Array[Byte]]], morePagesState: Array[Byte]): Array[Byte] = {
    val b = new BodyOut()
    b.putInt(0x0002) // kind = Rows
    var flags = 0x0001 // global_tables_spec
    if (morePagesState != null) flags |= 0x0002
    b.putInt(flags)
    b.putInt(cols.size)
    if (morePagesState != null) b.putBytes(morePagesState)
    b.putString(keyspace).putString(table)
    cols.foreach { case (name, tid) =>
      b.putString(name)
      // collection options carry their element type option(s) after the
      // id — the REAL v4 metadata shape; scalar elements only
      T.baseOf(tid) match {
        case 0 => b.putShort(tid)
        case T.Map =>
          b.putShort(T.Map); b.putShort((tid >> 8) & 0xFF); b.putShort(tid & 0xFF)
        case base => b.putShort(base); b.putShort(tid & 0xFFFF)
      }
    }
    b.putInt(rows.size)
    rows.foreach(_.foreach(b.putBytes))
    b.bytes
  }

  final case class RowsResult(cols: Seq[(String, Int)],
      rows: Seq[Array[Array[Byte]]], pagingState: Array[Byte])

  def parseResultBody(body: Array[Byte]): RowsResult = {
    val in = new BodyIn(body)
    val kind = in.getInt
    if (kind == 0x0001) return RowsResult(Nil, Nil, null) // Void
    require(kind == 0x0002, s"unsupported RESULT kind $kind")
    val flags = in.getInt
    val nCols = in.getInt
    val pagingState = if ((flags & 0x0002) != 0) in.getBytes else null
    if ((flags & 0x0001) != 0) { in.getString; in.getString } // keyspace, table
    val cols = (0 until nCols).map { _ =>
      val name = in.getString
      val tid = in.getShort
      require(tid != 0x0000, "custom types not supported")
      val full = tid match {
        case T.List => T.listOf(in.getShort)
        case T.Set => T.setOf(in.getShort)
        case T.Map => T.mapOf(in.getShort, in.getShort)
        case prim => prim
      }
      (name, full)
    }
    val nRows = in.getInt
    val rows = (0 until nRows).map(_ => Array.fill(nCols)(in.getBytes))
    RowsResult(cols, rows, pagingState)
  }

  def errorBody(code: Int, msg: String): Array[Byte] =
    new BodyOut().putInt(code).putString(msg).bytes

  def parseErrorBody(body: Array[Byte]): (Int, String) = {
    val in = new BodyIn(body)
    (in.getInt, in.getString)
  }
}
