package graft.protocol

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.types._

/** MySQL client/server wire protocol codec — the byte-level layer shared by
  * [[MysqlServer]] and [[MysqlClient]].
  *
  * The reference's identity is a MySQL proxy: any stock mysql client dials
  * it and speaks the real protocol (dataux proxy/server.go:62-110,
  * vendored/mixer/mysql/ packetio + resultset codecs,
  * frontends/mysqlfe/mysql_handler.go:130-166 COM_* dispatch). This file
  * re-implements that surface from the PUBLIC protocol specification
  * (protocol v10 handshake, HandshakeResponse41, text resultsets): nothing
  * here is transliterated — the reference vendors a Go packet library;
  * this is a from-scratch Scala codec.
  *
  * Scope: protocol 41 text protocol with classic EOF framing (no
  * CLIENT_DEPRECATE_EOF), `mysql_native_password` auth with real scramble
  * verification, multi-packet payload splitting at 0xffffff.
  */
object MysqlWire {

  // ---- capability flags (protocol constants) -----------------------------
  val ClientLongPassword     = 0x00000001
  val ClientFoundRows        = 0x00000002
  val ClientLongFlag         = 0x00000004
  val ClientConnectWithDb    = 0x00000008
  val ClientProtocol41       = 0x00000200
  val ClientTransactions     = 0x00002000
  val ClientSecureConnection = 0x00008000
  val ClientPluginAuth       = 0x00080000

  /** Capabilities this engine's listener advertises. */
  val ServerCapabilities: Int =
    ClientLongPassword | ClientLongFlag | ClientConnectWithDb |
      ClientProtocol41 | ClientTransactions | ClientSecureConnection |
      ClientPluginAuth

  // ---- command bytes -----------------------------------------------------
  val ComQuit: Int = 0x01
  val ComInitDb: Int = 0x02
  val ComQuery: Int = 0x03
  val ComFieldList: Int = 0x04
  val ComPing: Int = 0x0e
  val ComStmtPrepare: Int = 0x16
  val ComStmtExecute: Int = 0x17
  val ComStmtClose: Int = 0x19

  // ---- column type codes (text protocol) ---------------------------------
  val TypeTiny: Int = 0x01
  val TypeShort: Int = 0x02
  val TypeLong: Int = 0x03
  val TypeFloat: Int = 0x04
  val TypeDouble: Int = 0x05
  val TypeTimestamp: Int = 0x07
  val TypeLongLong: Int = 0x08
  val TypeDate: Int = 0x0a
  val TypeDatetime: Int = 0x0c
  val TypeNewDecimal: Int = 0xf6
  val TypeBlob: Int = 0xfc
  val TypeVarString: Int = 0xfd

  val CharsetUtf8: Int = 33   // utf8_general_ci
  val CharsetBinary: Int = 63 // numerics/blob carry the binary charset

  /** Spark type → MySQL column type byte (the engine's own
    * `GraftEngine.mysqlType` names are the DDL-level view of this same
    * mapping; reference sql_writer.go:36-78). */
  def typeCode(dt: DataType): Int = dt match {
    case BooleanType | ByteType => TypeTiny
    case ShortType => TypeShort
    case IntegerType => TypeLong
    case LongType => TypeLongLong
    case FloatType => TypeFloat
    case DoubleType => TypeDouble
    case _: DecimalType => TypeNewDecimal
    case DateType => TypeDate
    case TimestampType | TimestampNTZType => TypeDatetime
    case BinaryType => TypeBlob
    case _ => TypeVarString // strings + complex (sent as JSON text)
  }

  /** Wire type byte → the Spark type a client reconstructs (the reverse of
    * [[typeCode]]; TINY comes back as INT — the wire cannot distinguish
    * BOOLEAN from TINYINT, exactly as in MySQL itself). */
  def sparkType(code: Int): DataType = code match {
    case TypeTiny | TypeShort | TypeLong => IntegerType
    case TypeLongLong => LongType
    case TypeFloat => FloatType
    case TypeDouble | TypeNewDecimal => DoubleType
    case TypeDate => DateType
    case TypeDatetime | TypeTimestamp => TimestampType
    case TypeBlob => BinaryType
    case _ => StringType
  }

  def charsetFor(dt: DataType): Int = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | _: DecimalType | BinaryType => CharsetBinary
    case _ => CharsetUtf8
  }

  // ======================================================================
  // packet framing: [len:3 LE][seq:1][payload]; payloads of exactly
  // 0xffffff continue into the next packet (empty terminator if a payload
  // is a multiple of 0xffffff).
  // ======================================================================

  final val MaxPacketPayload = 0xffffff

  /** Stateful framed reader/writer over one socket's streams. Sequence ids
    * reset per command via [[resetSeq]]. */
  final class PacketIO(in0: InputStream, out0: OutputStream) {
    private val in = new BufferedInputStream(in0, 64 * 1024)
    private val out = new BufferedOutputStream(out0, 64 * 1024)
    private var seq: Int = 0

    def resetSeq(): Unit = seq = 0

    private def readFully(buf: Array[Byte], off: Int, len: Int): Unit = {
      var done = 0
      while (done < len) {
        val n = in.read(buf, off + done, len - done)
        if (n < 0) throw new EOFException("peer closed mid-packet")
        done += n
      }
    }

    /** Read one logical payload (reassembling 0xffffff continuations). */
    def read(): Array[Byte] = {
      val head = new Array[Byte](4)
      readFully(head, 0, 4)
      val len = (head(0) & 0xff) | ((head(1) & 0xff) << 8) | ((head(2) & 0xff) << 16)
      seq = ((head(3) & 0xff) + 1) & 0xff
      val first = new Array[Byte](len)
      readFully(first, 0, len)
      if (len < MaxPacketPayload) first
      else {
        val all = new java.io.ByteArrayOutputStream()
        all.write(first)
        var more = true
        while (more) {
          readFully(head, 0, 4)
          val l = (head(0) & 0xff) | ((head(1) & 0xff) << 8) | ((head(2) & 0xff) << 16)
          seq = ((head(3) & 0xff) + 1) & 0xff
          val chunk = new Array[Byte](l)
          readFully(chunk, 0, l)
          all.write(chunk)
          more = l == MaxPacketPayload
        }
        all.toByteArray
      }
    }

    /** Write one logical payload, splitting at 0xffffff: every frame of
      * exactly 0xffffff bytes is followed by another (possibly empty) one,
      * so a length-multiple-of-max payload ends with an empty terminator. */
    def write(payload: Array[Byte]): Unit = {
      var off = 0
      var continue = true
      while (continue) {
        val n = math.min(payload.length - off, MaxPacketPayload)
        writeFrame(payload, off, n)
        off += n
        continue = n == MaxPacketPayload
      }
    }

    private def writeFrame(payload: Array[Byte], off: Int, n: Int): Unit = {
      out.write(n & 0xff); out.write((n >> 8) & 0xff); out.write((n >> 16) & 0xff)
      out.write(seq & 0xff)
      seq = (seq + 1) & 0xff
      out.write(payload, off, n)
    }

    def flush(): Unit = out.flush()
  }

  // ======================================================================
  // primitive encode/decode
  // ======================================================================

  final class ByteWriter {
    private val buf = new java.io.ByteArrayOutputStream(256)
    def u8(v: Int): this.type = { buf.write(v & 0xff); this }
    def u16(v: Int): this.type = { buf.write(v & 0xff); buf.write((v >> 8) & 0xff); this }
    def u24(v: Int): this.type = { u16(v); buf.write((v >> 16) & 0xff); this }
    def u32(v: Long): this.type = {
      buf.write((v & 0xff).toInt); buf.write(((v >> 8) & 0xff).toInt)
      buf.write(((v >> 16) & 0xff).toInt); buf.write(((v >> 24) & 0xff).toInt); this
    }
    def u64(v: Long): this.type = { u32(v & 0xffffffffL); u32((v >>> 32) & 0xffffffffL); this }
    def raw(b: Array[Byte]): this.type = { buf.write(b, 0, b.length); this }
    def zeros(n: Int): this.type = { var i = 0; while (i < n) { buf.write(0); i += 1 }; this }
    def cstr(s: String): this.type = { raw(s.getBytes(UTF_8)); u8(0) }
    def lenencInt(v: Long): this.type =
      if (v >= 0 && v < 251) u8(v.toInt)
      else if (v >= 0 && v < 65536) { u8(0xfc); u16(v.toInt) }
      else if (v >= 0 && v < (1 << 24)) { u8(0xfd); u24(v.toInt) }
      else { u8(0xfe); u64(v) }
    def lenencBytes(b: Array[Byte]): this.type = { lenencInt(b.length.toLong); raw(b) }
    def lenencStr(s: String): this.type = lenencBytes(s.getBytes(UTF_8))
    def bytes: Array[Byte] = buf.toByteArray
  }

  final class ByteReader(val b: Array[Byte]) {
    var pos: Int = 0
    def remaining: Int = b.length - pos
    def u8(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    def peek: Int = b(pos) & 0xff
    def u16(): Int = u8() | (u8() << 8)
    def u24(): Int = u16() | (u8() << 16)
    def u32(): Long = u16().toLong | (u16().toLong << 16)
    def u64(): Long = u32() | (u32() << 32)
    def raw(n: Int): Array[Byte] = { val v = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; v }
    def rest(): Array[Byte] = raw(remaining)
    def cstr(): String = {
      val end = b.indexOf(0.toByte, pos)
      require(end >= 0, "unterminated cstring")
      val s = new String(b, pos, end - pos, UTF_8); pos = end + 1; s
    }
    def skip(n: Int): Unit = pos += n
    /** Returns -1 for the 0xfb NULL marker (row context). */
    def lenencInt(): Long = u8() match {
      case 0xfb => -1L
      case 0xfc => u16().toLong
      case 0xfd => u24().toLong
      case 0xfe => u64()
      case v => v.toLong
    }
    def lenencBytes(): Array[Byte] = { val n = lenencInt(); raw(n.toInt) }
    def lenencStr(): String = new String(lenencBytes(), UTF_8)
  }

  // ======================================================================
  // auth: mysql_native_password scramble
  //   token = SHA1(password) XOR SHA1(salt ++ SHA1(SHA1(password)))
  // ======================================================================

  def nativePasswordScramble(password: String, salt: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.emptyByteArray
    val sha1 = MessageDigest.getInstance("SHA-1")
    val p1 = sha1.digest(password.getBytes(UTF_8))
    sha1.reset()
    val p2 = sha1.digest(p1)
    sha1.reset()
    sha1.update(salt)
    sha1.update(p2)
    val mix = sha1.digest()
    val out = new Array[Byte](p1.length)
    var i = 0
    while (i < p1.length) { out(i) = (p1(i) ^ mix(i)).toByte; i += 1 }
    out
  }

  /** Server-side check: token is valid for `password` under `salt`. */
  def verifyNativePassword(token: Array[Byte], password: String, salt: Array[Byte]): Boolean =
    MessageDigest.isEqual(token, nativePasswordScramble(password, salt))

  // ======================================================================
  // packets
  // ======================================================================

  final case class Handshake(
      protocolVersion: Int,
      serverVersion: String,
      connectionId: Long,
      salt: Array[Byte],        // 20 bytes (part1 ++ part2-without-NUL)
      capabilities: Int,
      charset: Int,
      statusFlags: Int,
      authPlugin: String)

  /** Initial Handshake Packet, protocol version 10. */
  def encodeHandshake(h: Handshake): Array[Byte] = {
    val w = new ByteWriter
    w.u8(h.protocolVersion)
    w.cstr(h.serverVersion)
    w.u32(h.connectionId)
    w.raw(h.salt.take(8)); w.u8(0)              // auth-plugin-data-part-1 + filler
    w.u16(h.capabilities & 0xffff)
    w.u8(h.charset)
    w.u16(h.statusFlags)
    w.u16((h.capabilities >>> 16) & 0xffff)
    w.u8(h.salt.length + 1)                      // auth data len (incl. NUL)
    w.zeros(10)
    w.raw(h.salt.drop(8)); w.u8(0)              // part-2, NUL-terminated
    w.cstr(h.authPlugin)
    w.bytes
  }

  def decodeHandshake(p: Array[Byte]): Handshake = {
    val r = new ByteReader(p)
    val proto = r.u8()
    require(proto == 10, s"unsupported protocol version $proto")
    val version = r.cstr()
    val connId = r.u32()
    val salt1 = r.raw(8); r.skip(1)
    val capLow = r.u16()
    val charset = r.u8()
    val status = r.u16()
    val capHigh = r.u16()
    val caps = capLow | (capHigh << 16)
    val authLen = r.u8()
    r.skip(10)
    val salt2 =
      if ((caps & ClientSecureConnection) != 0) {
        val n = math.max(13, authLen - 8) // includes trailing NUL
        val raw = r.raw(n)
        raw.takeWhile(_ != 0)
      } else Array.emptyByteArray
    val plugin = if ((caps & ClientPluginAuth) != 0 && r.remaining > 0) r.cstr() else ""
    Handshake(proto, version, connId, salt1 ++ salt2, caps, charset, status, plugin)
  }

  final case class HandshakeResponse(
      capabilities: Int,
      maxPacket: Long,
      charset: Int,
      username: String,
      authToken: Array[Byte],
      database: Option[String],
      authPlugin: String)

  def encodeHandshakeResponse(h: HandshakeResponse): Array[Byte] = {
    val w = new ByteWriter
    w.u32(h.capabilities.toLong & 0xffffffffL)
    w.u32(h.maxPacket)
    w.u8(h.charset)
    w.zeros(23)
    w.cstr(h.username)
    if ((h.capabilities & ClientSecureConnection) != 0) {
      w.u8(h.authToken.length); w.raw(h.authToken)
    } else { w.raw(h.authToken); w.u8(0) }
    h.database.filter(_ => (h.capabilities & ClientConnectWithDb) != 0)
      .foreach(w.cstr)
    if ((h.capabilities & ClientPluginAuth) != 0) w.cstr(h.authPlugin)
    w.bytes
  }

  def decodeHandshakeResponse(p: Array[Byte]): HandshakeResponse = {
    val r = new ByteReader(p)
    val caps = r.u32().toInt
    require((caps & ClientProtocol41) != 0, "client does not speak protocol 41")
    val maxPacket = r.u32()
    val charset = r.u8()
    r.skip(23)
    val user = r.cstr()
    val token =
      if ((caps & ClientSecureConnection) != 0) { val n = r.u8(); r.raw(n) }
      else { // NUL-terminated legacy form
        val end = r.b.indexOf(0.toByte, r.pos)
        val t = java.util.Arrays.copyOfRange(r.b, r.pos, if (end < 0) r.b.length else end)
        r.pos = if (end < 0) r.b.length else end + 1
        t
      }
    val db =
      if ((caps & ClientConnectWithDb) != 0 && r.remaining > 0) Some(r.cstr()) else None
    val plugin =
      if ((caps & ClientPluginAuth) != 0 && r.remaining > 0) r.cstr() else ""
    HandshakeResponse(caps, maxPacket, charset, user, token, db, plugin)
  }

  /** OK_Packet: header 0x00. */
  def encodeOk(affected: Long, lastInsertId: Long = 0, status: Int = 0x0002,
               warnings: Int = 0, info: String = ""): Array[Byte] = {
    val w = new ByteWriter
    w.u8(0x00).lenencInt(affected).lenencInt(lastInsertId).u16(status).u16(warnings)
    if (info.nonEmpty) w.raw(info.getBytes(UTF_8))
    w.bytes
  }

  final case class Ok(affected: Long, lastInsertId: Long, status: Int, warnings: Int)

  def decodeOk(p: Array[Byte]): Ok = {
    val r = new ByteReader(p)
    require(r.u8() == 0x00, "not an OK packet")
    Ok(r.lenencInt(), r.lenencInt(), r.u16(), r.u16())
  }

  /** ERR_Packet: header 0xff, code, '#' + 5-char sqlstate, message. */
  def encodeErr(code: Int, sqlState: String, message: String): Array[Byte] = {
    val w = new ByteWriter
    w.u8(0xff).u16(code)
    w.u8('#'.toInt).raw(sqlState.take(5).padTo(5, '0').getBytes(UTF_8))
    w.raw(message.getBytes(UTF_8))
    w.bytes
  }

  final case class Err(code: Int, sqlState: String, message: String)

  def decodeErr(p: Array[Byte]): Err = {
    val r = new ByteReader(p)
    require(r.u8() == 0xff, "not an ERR packet")
    val code = r.u16()
    var state = ""
    if (r.remaining > 0 && r.peek == '#'.toInt) { r.skip(1); state = new String(r.raw(5), UTF_8) }
    Err(code, state, new String(r.rest(), UTF_8))
  }

  /** EOF_Packet (classic, protocol 41): 0xfe + warnings + status. Only
    * recognizable as EOF when the payload is short (<9 bytes). */
  def encodeEof(warnings: Int = 0, status: Int = 0x0002): Array[Byte] =
    new ByteWriter().u8(0xfe).u16(warnings).u16(status).bytes

  def isEof(p: Array[Byte]): Boolean = p.nonEmpty && (p(0) & 0xff) == 0xfe && p.length < 9
  def isErr(p: Array[Byte]): Boolean = p.nonEmpty && (p(0) & 0xff) == 0xff
  def isOk(p: Array[Byte]): Boolean = p.nonEmpty && (p(0) & 0xff) == 0x00

  final case class ColumnDef(
      schema: String, table: String, name: String,
      charset: Int, columnLength: Long, typeCode: Int,
      flags: Int, decimals: Int)

  /** Column Definition 41. */
  def encodeColumnDef(c: ColumnDef): Array[Byte] = {
    val w = new ByteWriter
    w.lenencStr("def")
    w.lenencStr(c.schema)
    w.lenencStr(c.table)
    w.lenencStr(c.table) // org_table
    w.lenencStr(c.name)
    w.lenencStr(c.name)  // org_name
    w.lenencInt(0x0c)    // fixed-length fields block
    w.u16(c.charset)
    w.u32(c.columnLength)
    w.u8(c.typeCode)
    w.u16(c.flags)
    w.u8(c.decimals)
    w.u16(0) // filler
    w.bytes
  }

  def decodeColumnDef(p: Array[Byte]): ColumnDef = {
    val r = new ByteReader(p)
    val _catalog = r.lenencStr()
    val schema = r.lenencStr()
    val table = r.lenencStr()
    val _orgTable = r.lenencStr()
    val name = r.lenencStr()
    val _orgName = r.lenencStr()
    r.lenencInt() // 0x0c
    val charset = r.u16()
    val len = r.u32()
    val tpe = r.u8()
    val flags = r.u16()
    val dec = r.u8()
    ColumnDef(schema, table, name, charset, len, tpe, flags, dec)
  }

  /** Text-protocol resultset row: lenenc string per value, 0xfb for NULL. */
  def encodeTextRow(values: Seq[Option[Array[Byte]]]): Array[Byte] = {
    val w = new ByteWriter
    values.foreach {
      case Some(b) => w.lenencBytes(b)
      case None => w.u8(0xfb)
    }
    w.bytes
  }

  def decodeTextRow(p: Array[Byte], nCols: Int): IndexedSeq[Option[String]] = {
    val r = new ByteReader(p)
    (0 until nCols).map { _ =>
      if (r.peek == 0xfb) { r.skip(1); None }
      else Some(r.lenencStr())
    }
  }

  // ======================================================================
  // binary protocol (COM_STMT_EXECUTE parameters + binary resultset rows)
  // ======================================================================

  /** COM_STMT_PREPARE_OK header. */
  def encodeStmtPrepareOk(stmtId: Int, numColumns: Int, numParams: Int): Array[Byte] =
    new ByteWriter().u8(0x00).u32(stmtId.toLong).u16(numColumns).u16(numParams)
      .u8(0).u16(0).bytes

  final case class StmtPrepareOk(stmtId: Int, numColumns: Int, numParams: Int)

  def decodeStmtPrepareOk(p: Array[Byte]): StmtPrepareOk = {
    val r = new ByteReader(p)
    require(r.u8() == 0x00, "not a STMT_PREPARE_OK packet")
    val stmtId = r.u32().toInt
    val numColumns = r.u16()
    val numParams = r.u16()
    StmtPrepareOk(stmtId, numColumns, numParams)
  }

  /** One binary value, by wire type code. Temporal values travel as the
    * packed length-prefixed form from the public binary-protocol spec. */
  def writeBinaryValue(w: ByteWriter, tpe: Int, v: Any): Unit = (tpe, v) match {
    case (TypeTiny, b: Boolean) => w.u8(if (b) 1 else 0)
    case (TypeTiny, n: Number) => w.u8(n.intValue())
    case (TypeShort, n: Number) => w.u16(n.intValue())
    case (TypeLong, n: Number) => w.u32(n.longValue() & 0xffffffffL)
    case (TypeLongLong, n: Number) => w.u64(n.longValue())
    case (TypeFloat, n: Number) =>
      w.u32(java.lang.Float.floatToIntBits(n.floatValue()).toLong & 0xffffffffL)
    case (TypeDouble, n: Number) => w.u64(java.lang.Double.doubleToLongBits(n.doubleValue()))
    case (TypeDate, d: java.time.LocalDate) =>
      w.u8(4).u16(d.getYear).u8(d.getMonthValue).u8(d.getDayOfMonth)
    case (TypeDatetime | TypeTimestamp, t: java.time.LocalDateTime) =>
      w.u8(11).u16(t.getYear).u8(t.getMonthValue).u8(t.getDayOfMonth)
        .u8(t.getHour).u8(t.getMinute).u8(t.getSecond)
        .u32((t.getNano / 1000).toLong)
    case (TypeBlob, b: Array[Byte]) => w.lenencBytes(b)
    case (_, s) => w.lenencStr(String.valueOf(s))
  }

  def readBinaryValue(r: ByteReader, tpe: Int): Any = readBinaryValue(r, tpe, false)

  /** `unsigned` = the 0x80 flag byte from a COM_STMT_EXECUTE type pair:
    * integer widths then decode without sign extension. */
  def readBinaryValue(r: ByteReader, tpe: Int, unsigned: Boolean): Any = tpe match {
    case TypeTiny => if (unsigned) r.u8() else r.u8().toByte.toInt
    case TypeShort => if (unsigned) r.u16() else r.u16().toShort.toInt
    case TypeLong => if (unsigned) r.u32() else r.u32().toInt
    case TypeLongLong => r.u64() // unsigned >Long.Max is out of surface
    case TypeFloat => java.lang.Float.intBitsToFloat(r.u32().toInt)
    case TypeDouble => java.lang.Double.longBitsToDouble(r.u64())
    case TypeDate =>
      val n = r.u8()
      if (n == 0) java.time.LocalDate.of(1970, 1, 1)
      else { val y = r.u16(); java.time.LocalDate.of(y, r.u8(), r.u8()) }
    case TypeDatetime | TypeTimestamp =>
      val n = r.u8()
      if (n == 0) java.time.LocalDateTime.of(1970, 1, 1, 0, 0)
      else {
        val y = r.u16(); val mo = r.u8(); val d = r.u8()
        var dt = java.time.LocalDateTime.of(y, mo, d, 0, 0)
        if (n >= 7) dt = dt.withHour(r.u8()).withMinute(r.u8()).withSecond(r.u8())
        if (n >= 11) dt = dt.withNano(r.u32().toInt * 1000)
        dt
      }
    case TypeBlob => r.lenencBytes()
    case _ => r.lenencStr()
  }

  /** Binary resultset row: 0x00 header, NULL bitmap with a 2-bit offset,
    * then non-NULL values in column order. */
  def encodeBinaryRow(types: IndexedSeq[Int], values: IndexedSeq[Option[Any]]): Array[Byte] = {
    val w = new ByteWriter
    w.u8(0x00)
    val bitmap = new Array[Byte]((values.length + 7 + 2) / 8)
    values.zipWithIndex.foreach { case (v, i) =>
      if (v.isEmpty) bitmap((i + 2) / 8) = (bitmap((i + 2) / 8) | (1 << ((i + 2) % 8))).toByte
    }
    w.raw(bitmap)
    values.zipWithIndex.foreach {
      case (Some(v), i) => writeBinaryValue(w, types(i), v)
      case (None, _) =>
    }
    w.bytes
  }

  def decodeBinaryRow(p: Array[Byte], types: IndexedSeq[Int]): IndexedSeq[Option[Any]] = {
    val r = new ByteReader(p)
    require(r.u8() == 0x00, "not a binary row")
    val bitmap = r.raw((types.length + 7 + 2) / 8)
    types.indices.map { i =>
      val isNull = (bitmap((i + 2) / 8) & (1 << ((i + 2) % 8))) != 0
      if (isNull) None else Some(readBinaryValue(r, types(i)))
    }
  }
}
