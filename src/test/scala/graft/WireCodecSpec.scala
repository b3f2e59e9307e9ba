package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.protocol.{Bson, OpMsg}
import graft.protocol.Bson.BDoc

/** Framing invariants of the OP_COMPRESSED wire path that the
  * fixture-driven connector specs don't pin: arbitrary payload shapes
  * must survive the deflate/inflate round-trip bit-for-bit, corrupted
  * frames must fail LOUDLY (a silent mis-parse would feed garbage rows
  * downstream), and the plain/compressed arms must stay byte-compatible
  * on the same stream (the post-hello transition). */
class WireCodecSpec extends AnyFunSuite {

  private def roundTrip(doc: BDoc, compress: Boolean): (Int, BDoc, Boolean) = {
    val out = new ByteArrayOutputStream()
    OpMsg.write(out, 42, 7, doc, compress = compress)
    OpMsg.readEx(new DataInputStream(new ByteArrayInputStream(out.toByteArray)))
  }

  private val docs: Seq[BDoc] = Seq(
    BDoc.empty,
    BDoc(Seq("a" -> (1: java.lang.Integer))),
    // deeply nested + arrays + nulls + doubles + longs + strings with
    // multi-byte UTF-8 — every BSON arm the codec carries
    BDoc(Seq(
      "find" -> ("collection_name": Any),
      "n" -> (java.lang.Long.MAX_VALUE: Any),
      "d" -> (3.14159: java.lang.Double),
      "nul" -> null,
      "uni" -> ("héllo wörld é中文": Any),
      "arr" -> (Seq[Any](1: java.lang.Integer, "two",
        BDoc(Seq("three" -> (3: java.lang.Integer)))): Any),
      "sub" -> (BDoc(Seq("deep" -> (BDoc(Seq("deeper" -> ("v": Any))): Any))): Any))),
    // highly repetitive (compresses hard) and incompressible-ish shapes
    BDoc(Seq("rep" -> (("ab" * 5000): Any))),
    BDoc(Seq("mix" -> ((0 until 500).map(i => s"t${i * 7919}").mkString(" "): Any))))

  test("every payload shape round-trips OP_COMPRESSED bit-for-bit") {
    docs.foreach { doc =>
      val (rid, got, wasCompressed) = roundTrip(doc, compress = true)
      assert(rid == 42)
      assert(wasCompressed, "the frame must actually be OP_COMPRESSED")
      assert(got == doc, s"zlib round-trip diverged for ${doc.render.take(60)}")
      // and the plain arm stays intact
      val (_, plain, wasPlain) = roundTrip(doc, compress = false)
      assert(!wasPlain && plain == doc)
    }
  }

  test("compression actually shrinks compressible frames") {
    val rep = BDoc(Seq("rep" -> (("spam " * 2000): Any)))
    val plain = new ByteArrayOutputStream()
    val comp = new ByteArrayOutputStream()
    OpMsg.write(plain, 1, 0, rep, compress = false)
    OpMsg.write(comp, 1, 0, rep, compress = true)
    assert(comp.size() * 5 < plain.size(),
      s"repetitive BSON must compress hard: ${comp.size()} vs ${plain.size()}")
  }

  test("plain and compressed frames interleave on one stream (post-hello shape)") {
    val out = new ByteArrayOutputStream()
    OpMsg.write(out, 1, 0, docs(1), compress = false) // the hello
    OpMsg.write(out, 2, 0, docs(2), compress = true)  // post-negotiation
    OpMsg.write(out, 3, 0, docs(3), compress = true)
    val in = new DataInputStream(new ByteArrayInputStream(out.toByteArray))
    val (r1, d1, c1) = OpMsg.readEx(in)
    val (r2, d2, c2) = OpMsg.readEx(in)
    val (r3, d3, c3) = OpMsg.readEx(in)
    assert((r1, d1, c1) == ((1, docs(1), false)))
    assert((r2, d2, c2) == ((2, docs(2), true)))
    assert((r3, d3, c3) == ((3, docs(3), true)))
  }

  test("corrupted compressed frames fail loudly, never mis-parse") {
    val out = new ByteArrayOutputStream()
    OpMsg.write(out, 9, 0, docs(2), compress = true)
    val bytes = out.toByteArray
    // flip a byte in the deflated payload (past the 16B header + 9B
    // compression sub-header): inflate must throw, not hand back junk
    val corrupted = bytes.clone()
    corrupted(bytes.length - 3) = (corrupted(bytes.length - 3) ^ 0x5a).toByte
    intercept[Exception] {
      OpMsg.readEx(new DataInputStream(new ByteArrayInputStream(corrupted)))
    }
    // a frame whose declared uncompressedSize disagrees with the inflated
    // length must also refuse (truncation/corruption guard)
    val lied = bytes.clone()
    // uncompressedSize sits at offset 20 (after header + originalOpcode)
    lied(20) = (lied(20) + 1).toByte
    intercept[Exception] {
      OpMsg.readEx(new DataInputStream(new ByteArrayInputStream(lied)))
    }
  }

  test("unknown compressor ids are refused") {
    val out = new ByteArrayOutputStream()
    OpMsg.write(out, 9, 0, docs(1), compress = true)
    val bytes = out.toByteArray
    bytes(24) = 7 // compressorId byte (after 16B header + 4B opcode + 4B size)
    val e = intercept[Exception] {
      OpMsg.readEx(new DataInputStream(new ByteArrayInputStream(bytes)))
    }
    assert(e.getMessage.contains("compressorId"))
  }
}
