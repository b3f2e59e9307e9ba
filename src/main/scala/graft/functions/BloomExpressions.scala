package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Distributed Bloom filter build + membership probe, as native Catalyst
  * nodes (SURVEY §2.11 distributed-UDAF pattern; the LLM-pipeline use is
  * benchmark DECONTAMINATION at corpus scale: the eval-set n-gram index
  * is a few MB of bits broadcast to every task, so the 100-TB corpus side
  * is pruned to candidate rows BEFORE any shuffle — only candidates reach
  * the exact confirm join, keeping the result value-exact while the
  * shuffle shrinks by the true-negative rate).
  *
  * Why not Spark's own bloom machinery: `bloom_filter_agg` /
  * `might_contain` are internal-registry functions reserved for the
  * runtime-filter rewrite, not a public API. This is an independent
  * implementation: one 64-bit input hash, Kirsch–Mitzenmacher double
  * hashing (k probe positions from h1 + i·h2 — the standard trick from
  * the public literature), OR-mergeable word arrays so partial aggregates
  * combine map-side like any built-in agg.
  *
  * Sizing contract: `numBits` is a builder-time literal. At 10 bits per
  * element / k=7 the false-positive rate is <1%; a 1e8-element eval set is
  * ~125 MB of bits — still broadcastable. Beyond that, split the eval set
  * into hash-range slices with one bloom each (the probe side ANDs its
  * slice only), which this layout supports by construction.
  *
  * Serialized layout (little-endian): [numHashes:int][numBits:long][words…]
  */
object BloomRuntime {
  final val HeaderBytes = 12

  def wordsFor(numBits: Long): Int = (((numBits + 63) >>> 6)).toInt

  /** Second hash for double hashing. This must be a full mixer, not an
    * affine map: with numBits a power of two, an affine step (h·C+D) is
    * itself affine in h mod numBits, so (h1, step) pairs of different
    * keys lie on a line and their probe progressions collide together —
    * measured 30× the design FPR. The splitmix64 finalizer breaks that
    * correlation; `| 1` keeps the stride odd (co-prime with 2^k layouts). */
  @inline private def h2(h: Long): Long = {
    var z = h
    z ^= z >>> 30; z *= 0xbf58476d1ce4e5b9L
    z ^= z >>> 27; z *= 0x94d049bb133111ebL
    z ^= z >>> 31
    z | 1L
  }

  def put(words: Array[Long], numBits: Long, numHashes: Int, h: Long): Unit = {
    val step = h2(h)
    var i = 0
    while (i < numHashes) {
      val bit = ((h + i.toLong * step) & Long.MaxValue) % numBits
      words((bit >>> 6).toInt) |= 1L << (bit & 63)
      i += 1
    }
  }

  def serialize(words: Array[Long], numBits: Long, numHashes: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(HeaderBytes + words.length * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(numHashes)
    bb.putLong(numBits)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  def deserializeWords(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = (bytes.length - HeaderBytes) / 8
    val words = new Array[Long](n)
    var i = 0
    while (i < n) { words(i) = bb.getLong(HeaderBytes + i * 8); i += 1 }
    words
  }

  /** Probe — called per corpus row from generated code; reads the two
    * header fields and k words straight out of the byte array, no
    * deserialization. */
  def mightContain(bytes: Array[Byte], h: Long): Boolean = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val numHashes = bb.getInt(0)
    val numBits = bb.getLong(4)
    val step = h2(h)
    var i = 0
    while (i < numHashes) {
      val bit = ((h + i.toLong * step) & Long.MaxValue) % numBits
      val word = bb.getLong(HeaderBytes + (bit >>> 6).toInt * 8)
      if ((word & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** `bloom_build(hash64, numBits, numHashes)` — aggregate a column of
  * 64-bit hashes into serialized bloom bytes. Partial buffers are plain
  * word arrays; merge is bitwise OR, so the build is map-side combined
  * and shuffles exactly one buffer per partition. */
@ExpressionDescription(usage = "bloom_build(h, numBits, k) - bloom bytes over 64-bit hashes")
case class BloomBuildAgg(
    child: Expression,
    numBits: Long,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits <= (Int.MaxValue.toLong - BloomRuntime.HeaderBytes) * 8,
    s"bloom_build: numBits out of range: $numBits")
  require(numHashes > 0 && numHashes <= 16, s"bloom_build: k out of range: $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  require(child.dataType == LongType,
    s"bloom_build: input must be a 64-bit hash (LONG), got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](BloomRuntime.wordsFor(numBits))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomRuntime.put(buf, numBits, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    BloomRuntime.serialize(buf, numBits, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomRuntime.serialize(buf, numBits, numHashes)

  override def deserialize(storage: Array[Byte]): Array[Long] =
    BloomRuntime.deserializeWords(storage)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "bloom_build"
}

/** `bloom_contains(bloomBytes, hash64)` — membership probe; stays inside
  * whole-stage codegen (the generated code is one static call over the
  * already-evaluated operands, so a bloom-prefiltered scan keeps its
  * WholeStageCodegen span). */
@ExpressionDescription(usage = "bloom_contains(bloom, h) - bloom membership probe")
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def nullSafeEval(bloom: Any, h: Any): Any =
    BloomRuntime.mightContain(bloom.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) =>
      s"graft.functions.BloomRuntime.mightContain($b, $h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_contains"
}
