package graft.protocol

import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import scala.util.control.NonFatal

import MysqlWire._

/** Minimal MySQL protocol-41 client — the peer that proves the listener
  * speaks the real wire format (and the transport behind the
  * `q_src_mysql_wire` correctness gate). Speaks the same public protocol
  * as any stock client: v10 handshake, `mysql_native_password` scramble,
  * COM_QUERY text resultsets, OK/ERR/EOF framing.
  */
final class MysqlClient(host: String, port: Int, user: String, password: String) {

  final case class QueryError(code: Int, sqlState: String, message: String)
    extends RuntimeException(s"[$code/$sqlState] $message")

  final case class ResultSet(
      columns: IndexedSeq[ColumnDef],
      rows: IndexedSeq[IndexedSeq[Option[String]]])

  private val sock = new Socket(host, port)
  sock.setTcpNoDelay(true)
  private val io = new PacketIO(sock.getInputStream, sock.getOutputStream)

  /** The server's greeting, kept for protocol assertions in specs. */
  val greeting: Handshake = decodeHandshake(io.read())

  {
    val token = nativePasswordScramble(password, greeting.salt)
    io.write(encodeHandshakeResponse(HandshakeResponse(
      capabilities = ClientProtocol41 | ClientSecureConnection |
        ClientPluginAuth | ClientLongPassword | ClientTransactions,
      maxPacket = 16 * 1024 * 1024,
      charset = CharsetUtf8,
      username = user,
      authToken = token,
      database = None,
      authPlugin = "mysql_native_password")))
    io.flush()
    val p = io.read()
    if (isErr(p)) { val e = decodeErr(p); close(); throw QueryError(e.code, e.sqlState, e.message) }
    require(isOk(p), "expected OK after auth")
  }

  /** COM_QUERY: Left(ok) for statements, Right(resultset) for queries. */
  def query(sql: String): Either[Ok, ResultSet] = {
    io.resetSeq()
    io.write(Array[Byte](ComQuery.toByte) ++ sql.getBytes(UTF_8))
    io.flush()
    val first = io.read()
    if (isErr(first)) { val e = decodeErr(first); throw QueryError(e.code, e.sqlState, e.message) }
    if (isOk(first)) return Left(decodeOk(first))
    val nCols = new ByteReader(first).lenencInt().toInt
    val cols = (0 until nCols).map(_ => decodeColumnDef(io.read()))
    val sep = io.read()
    require(isEof(sep), "expected EOF after column definitions")
    val rows = Vector.newBuilder[IndexedSeq[Option[String]]]
    var done = false
    while (!done) {
      val p = io.read()
      if (isEof(p)) done = true
      else if (isErr(p)) { val e = decodeErr(p); throw QueryError(e.code, e.sqlState, e.message) }
      else rows += decodeTextRow(p, nCols)
    }
    Right(ResultSet(cols, rows.result()))
  }

  /** Convenience: resultset-or-throw. */
  def select(sql: String): ResultSet = query(sql) match {
    case Right(rs) => rs
    case Left(_) => throw new IllegalStateException(s"statement returned no resultset: $sql")
  }

  // ---- binary prepared-statement protocol (COM_STMT_*) -------------------

  final case class BinaryResultSet(
      columns: IndexedSeq[ColumnDef],
      rows: IndexedSeq[IndexedSeq[Option[Any]]])

  def stmtPrepare(sql: String): StmtPrepareOk = {
    io.resetSeq()
    io.write(Array[Byte](ComStmtPrepare.toByte) ++ sql.getBytes(UTF_8))
    io.flush()
    val first = io.read()
    if (isErr(first)) { val e = decodeErr(first); throw QueryError(e.code, e.sqlState, e.message) }
    val ok = decodeStmtPrepareOk(first)
    if (ok.numParams > 0) { // param definition packets + EOF
      (0 until ok.numParams).foreach(_ => io.read())
      require(isEof(io.read()), "expected EOF after parameter definitions")
    }
    if (ok.numColumns > 0) {
      (0 until ok.numColumns).foreach(_ => io.read())
      require(isEof(io.read()), "expected EOF after column definitions")
    }
    ok
  }

  private def paramType(v: Any): Int = v match {
    case null => TypeVarString
    case _: Boolean => TypeTiny
    case _: Byte => TypeTiny
    case _: Short => TypeShort
    case _: Int => TypeLong
    case _: Long => TypeLongLong
    case _: Float => TypeFloat
    case _: Double => TypeDouble
    case _: java.time.LocalDate => TypeDate
    case _: java.time.LocalDateTime => TypeDatetime
    case _: Array[Byte] => TypeBlob
    case _ => TypeVarString
  }

  /** Execute with binary-encoded parameters; the response is a BINARY
    * resultset (typed values, NULL bitmap rows), not text. */
  def stmtExecute(stmtId: Int, params: Seq[Any]): Either[Ok, BinaryResultSet] = {
    val w = new ByteWriter
    w.u8(ComStmtExecute).u32(stmtId.toLong).u8(0).u32(1L)
    if (params.nonEmpty) {
      val bitmap = new Array[Byte]((params.length + 7) / 8)
      params.zipWithIndex.foreach { case (v, i) =>
        if (v == null) bitmap(i / 8) = (bitmap(i / 8) | (1 << (i % 8))).toByte
      }
      w.raw(bitmap)
      w.u8(1) // new-params-bound
      val types = params.map(paramType)
      types.foreach(t => w.u16(t))
      params.zip(types).foreach { case (v, t) =>
        if (v != null) writeBinaryValue(w, t, v)
      }
    }
    io.resetSeq()
    io.write(w.bytes)
    io.flush()
    val first = io.read()
    if (isErr(first)) { val e = decodeErr(first); throw QueryError(e.code, e.sqlState, e.message) }
    if (isOk(first)) return Left(decodeOk(first))
    val nCols = new ByteReader(first).lenencInt().toInt
    val cols = (0 until nCols).map(_ => decodeColumnDef(io.read()))
    require(isEof(io.read()), "expected EOF after column definitions")
    val types = cols.map(_.typeCode)
    val rows = Vector.newBuilder[IndexedSeq[Option[Any]]]
    var done = false
    while (!done) {
      val p = io.read()
      if (isEof(p)) done = true
      else if (isErr(p)) { val e = decodeErr(p); throw QueryError(e.code, e.sqlState, e.message) }
      else rows += decodeBinaryRow(p, types)
    }
    Right(BinaryResultSet(cols, rows.result()))
  }

  def stmtClose(stmtId: Int): Unit = {
    io.resetSeq()
    io.write(new ByteWriter().u8(ComStmtClose).u32(stmtId.toLong).bytes)
    io.flush() // fire-and-forget per the protocol
  }

  def ping(): Boolean = {
    io.resetSeq()
    io.write(Array[Byte](ComPing.toByte))
    io.flush()
    isOk(io.read())
  }

  def close(): Unit = {
    try { io.resetSeq(); io.write(Array[Byte](ComQuit.toByte)); io.flush() }
    catch { case NonFatal(_) => }
    try sock.close() catch { case NonFatal(_) => }
  }
}
