package graft.protocol

import java.io.{DataInputStream, IOException, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

/** MongoDB wire protocol (OP_MSG + BSON), the transport the reference's
  * Mongo backend speaks through mgo (`backends/mongo/sql_to_mgo.go:75-249`
  * compiles WHERE into a bson filter document and runs `find` with sort/
  * limit/skip; `mgo_results.go:100-180` iterates the cursor). Implemented
  * here from the public BSON/OP_MSG specs: little-endian BSON documents
  * framed in OP_MSG (opcode 2013) messages, `find`/`getMore` commands,
  * cursor-batched replies.
  *
  * The subset of BSON types carried is exactly the reference's Mongo type
  * surface (`backends/mongo/mgo_source.go:269-311` maps sampled bson
  * values to int/float/string/bool/time/arrays/docs): double 0x01, string
  * 0x02, document 0x03, array 0x04, bool 0x08, UTC datetime 0x09 (millis
  * — day-granularity TPC-H timestamps are exact), null 0x0A, regex 0x0B,
  * int32 0x10, int64 0x12.
  */
object Bson {

  /** An ordered BSON document. Values: null, Boolean, Int, Long, Double,
    * String, java.sql.Timestamp (also accepts java.time
    * LocalDateTime/Instant, normalized to BSON datetime), BDoc,
    * Seq[Any], BRegex. */
  final case class BDoc(fields: Seq[(String, Any)]) {
    def get(key: String): Option[Any] = fields.collectFirst { case (`key`, v) => v }
    def render: String = fields.map { case (k, v) => s"$k: ${renderV(v)}" }
      .mkString("{", ", ", "}")
  }
  object BDoc {
    val empty: BDoc = BDoc(Nil)
  }

  /** BSON regular expression (type 0x0B): `pattern` is a Java-compatible
    * regex, `options` the flag cstring (we only emit ""). */
  final case class BRegex(pattern: String, options: String)

  private def renderV(v: Any): String = v match {
    case d: BDoc => d.render
    case s: Seq[_] => s.map(renderV).mkString("[", ", ", "]")
    case r: BRegex => s"/${r.pattern}/${r.options}"
    case s: String => "\"" + s + "\""
    case null => "null"
    case other => other.toString
  }

  // ---- encoding ----------------------------------------------------------

  def encode(doc: BDoc): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(256)
    writeDoc(out, doc)
    out.toByteArray
  }

  private def writeDoc(out: java.io.ByteArrayOutputStream, doc: BDoc): Unit = {
    val body = new java.io.ByteArrayOutputStream(128)
    doc.fields.foreach { case (k, v) => writeElement(body, k, v) }
    val total = 4 + body.size() + 1
    writeInt32(out, total)
    body.writeTo(out)
    out.write(0x00)
  }

  private def writeElement(out: java.io.ByteArrayOutputStream, name: String, v: Any): Unit = {
    def header(tpe: Int): Unit = { out.write(tpe); writeCString(out, name) }
    v match {
      case null => header(0x0A)
      case d: java.lang.Double => header(0x01); writeInt64(out, java.lang.Double.doubleToLongBits(d))
      case f: java.lang.Float => writeElement(out, name, f.doubleValue())
      case s: String =>
        header(0x02)
        val bytes = s.getBytes(UTF_8)
        writeInt32(out, bytes.length + 1); out.write(bytes, 0, bytes.length); out.write(0x00)
      case d: BDoc => header(0x03); writeDoc(out, d)
      case arr: Seq[_] =>
        header(0x04)
        writeDoc(out, BDoc(arr.zipWithIndex.map { case (e, i) => i.toString -> e }))
      case b: java.lang.Boolean => header(0x08); out.write(if (b) 1 else 0)
      case t: java.sql.Timestamp =>
        // BSON datetime is millisecond-granular; refuse loudly rather than
        // silently truncating sub-ms values (day-granular TPC-H is exact)
        require(t.getNanos % 1000000 == 0, s"sub-millisecond timestamp not BSON-exact: $t")
        header(0x09); writeInt64(out, t.getTime)
      case t: java.time.LocalDateTime => // TIMESTAMP_NTZ: UTC wall clock
        writeElement(out, name,
          java.sql.Timestamp.from(t.toInstant(java.time.ZoneOffset.UTC)))
      case i: java.time.Instant =>
        writeElement(out, name, java.sql.Timestamp.from(i))
      case r: BRegex => header(0x0B); writeCString(out, r.pattern); writeCString(out, r.options)
      case i: java.lang.Integer => header(0x10); writeInt32(out, i)
      case s: java.lang.Short => header(0x10); writeInt32(out, s.intValue())
      case l: java.lang.Long => header(0x12); writeInt64(out, l)
      case other => throw new IllegalArgumentException(
        s"unsupported BSON value ${other.getClass.getName}")
    }
  }

  private def writeCString(out: java.io.ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    require(!b.contains(0.toByte), s"embedded NUL in cstring: $s")
    out.write(b, 0, b.length); out.write(0x00)
  }

  private def writeInt32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
    out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
  }

  private def writeInt64(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    writeInt32(out, v.toInt); writeInt32(out, (v >>> 32).toInt)
  }

  // ---- decoding ----------------------------------------------------------

  def decode(bytes: Array[Byte]): BDoc = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    readDoc(buf)
  }

  private def readDoc(buf: ByteBuffer): BDoc = {
    val start = buf.position()
    val len = buf.getInt
    val fields = Seq.newBuilder[(String, Any)]
    while (buf.position() < start + len - 1) {
      val tpe = buf.get() & 0xFF
      val name = readCString(buf)
      val v: Any = tpe match {
        case 0x01 => java.lang.Double.longBitsToDouble(buf.getLong): java.lang.Double
        case 0x02 =>
          val n = buf.getInt
          val b = new Array[Byte](n - 1); buf.get(b); buf.get() // trailing NUL
          new String(b, UTF_8)
        case 0x03 => readDoc(buf)
        case 0x04 => readDoc(buf).fields.map(_._2)
        case 0x08 => (buf.get() != 0): java.lang.Boolean
        case 0x09 => new java.sql.Timestamp(buf.getLong)
        case 0x0A => null
        case 0x0B => BRegex(readCString(buf), readCString(buf))
        case 0x10 => buf.getInt: java.lang.Integer
        case 0x12 => buf.getLong: java.lang.Long
        case other => throw new IOException(f"unsupported BSON element type 0x$other%02x")
      }
      fields += name -> v
    }
    val end = buf.get() // document terminator
    if (end != 0) throw new IOException("malformed BSON document (missing NUL)")
    BDoc(fields.result())
  }

  private def readCString(buf: ByteBuffer): String = {
    val sb = new java.io.ByteArrayOutputStream(16)
    var b = buf.get()
    while (b != 0) { sb.write(b); b = buf.get() }
    new String(sb.toByteArray, UTF_8)
  }
}

/** OP_MSG framing: standard 16-byte MsgHeader (length, requestID,
  * responseTo, opCode 2013) + uint32 flagBits + one kind-0 section
  * carrying the command/reply document.
  *
  * OP_COMPRESSED (opCode 2012) wraps an OP_MSG: after the header,
  * int32 originalOpcode + int32 uncompressedSize + uint8 compressorId
  * (2 = zlib) + the deflated original message body. BSON batches
  * compress several-fold, so on a 100 TB federation the negotiated
  * compressor is most of the wire budget; both directions here follow
  * the public wire-compression spec (negotiated in `hello`, never
  * applied to `hello` itself). */
object OpMsg {

  val OpCode = 2013
  val OpCompressed = 2012
  /** zlib's compressorId in the OP_COMPRESSED spec (0 = noop, 1 =
    * snappy, 2 = zlib, 3 = zstd; the JDK ships zlib). */
  val Zlib: Byte = 2

  def write(out: OutputStream, requestId: Int, responseTo: Int, doc: Bson.BDoc,
      compress: Boolean = false): Unit = {
    val body = Bson.encode(doc)
    val buf =
      if (!compress) {
        val total = 16 + 4 + 1 + body.length
        val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
        b.putInt(total).putInt(requestId).putInt(responseTo).putInt(OpCode)
        b.putInt(0) // flagBits: no checksum, no moreToCome
        b.put(0.toByte) // section kind 0
        b.put(body)
        b
      } else {
        // the "original message body" is everything after the header:
        // flagBits + section kind + BSON
        val orig = ByteBuffer.allocate(4 + 1 + body.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        orig.putInt(0).put(0.toByte).put(body)
        val deflated = zlibDeflate(orig.array())
        val total = 16 + 4 + 4 + 1 + deflated.length
        val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
        b.putInt(total).putInt(requestId).putInt(responseTo).putInt(OpCompressed)
        b.putInt(OpCode)              // originalOpcode
        b.putInt(orig.capacity())     // uncompressedSize
        b.put(Zlib)                   // compressorId
        b.put(deflated)
        b
      }
    out.write(buf.array())
    out.flush()
  }

  /** Read one OP_MSG; returns (requestId, command document). */
  def read(in: DataInputStream): (Int, Bson.BDoc) = {
    val (rid, doc, _) = readEx(in)
    (rid, doc)
  }

  /** Read one message, transparently inflating OP_COMPRESSED(zlib);
    * returns (requestId, document, wasCompressed) so a server can mirror
    * the sender's encoding on the reply. */
  def readEx(in: DataInputStream): (Int, Bson.BDoc, Boolean) = {
    val header = new Array[Byte](16)
    in.readFully(header)
    val h = ByteBuffer.wrap(header).order(ByteOrder.LITTLE_ENDIAN)
    val total = h.getInt
    val requestId = h.getInt
    h.getInt // responseTo
    val opCode = h.getInt
    val raw = new Array[Byte](total - 16)
    in.readFully(raw)
    val (body, compressed) = opCode match {
      case OpCode => (raw, false)
      case OpCompressed =>
        val b = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
        val origOp = b.getInt
        if (origOp != OpCode)
          throw new IOException(s"compressed originalOpcode $origOp unsupported")
        val uncompressedSize = b.getInt
        val compressorId = b.get()
        val payload = new Array[Byte](raw.length - 9)
        b.get(payload)
        val inflated = compressorId match {
          case Zlib => zlibInflate(payload, uncompressedSize)
          case 0 => payload // noop compressor
          case other => throw new IOException(s"unsupported compressorId $other")
        }
        if (inflated.length != uncompressedSize)
          throw new IOException(s"inflated ${inflated.length} bytes, " +
            s"frame declared $uncompressedSize")
        (inflated, true)
      case other => throw new IOException(s"unsupported opcode $other")
    }
    val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
    b.getInt // flagBits
    val kind = b.get()
    if (kind != 0) throw new IOException(s"unsupported section kind $kind")
    val doc = new Array[Byte](body.length - 5)
    b.get(doc)
    (requestId, Bson.decode(doc), compressed)
  }

  private def zlibDeflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 3 + 64)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def zlibInflate(data: Array[Byte], sizeHint: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(math.max(64, sizeHint))
    val buf = new Array[Byte](4096)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput())
        throw new IOException("truncated zlib payload")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }
}
