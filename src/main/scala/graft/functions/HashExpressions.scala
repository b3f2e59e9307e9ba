package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the dedup/fingerprint operators.
  *
  * These are native expressions with `doGenCode` (not UDFs): the generated
  * code is a single static call into TextHash, so projections using them
  * stay inside whole-stage codegen with no boxing or Row materialization —
  * the per-row hot path a 100 TB scan actually executes.
  *
  * Column construction goes through the public FunctionRegistry +
  * `functions.call_function` path (no `private[sql]` Spark internals); the
  * constant k/n/band parameters arrive as foldable literal arguments and are
  * evaluated once at registration-builder time.
  */

/** polyHash(string) → BIGINT (see TextHash for the arithmetic). */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextHash.polyHashU(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.polyHashU($c)")
  override protected def withNewChildInternal(c: Expression): PolyHash = copy(c)
  override def prettyName: String = "poly_hash"
}

/** min_hash_sig(string, k, n) → ARRAY<BIGINT> of k minhash values over
  * n-word shingles. */
case class MinHashSig(child: Expression, k: Int, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextHash.minHashSigU(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minHashSigU($c, $k, $n)")
  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
  override def prettyName: String = "min_hash_sig"
}

/** sim_hash64(string) → BIGINT (60-bit simhash over word unigrams). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextHash.simHash64U(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simHash64U($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  override def prettyName: String = "sim_hash64"
}

/** band_hash(sig_array, start, r) → BIGINT: fold of r signature values,
  * used to key LSH band buckets. */
case class BandHash(child: Expression, start: Int, r: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextHash.bandHashU(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], start, r)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.bandHashU($c, $start, $r)")
  override protected def withNewChildInternal(c: Expression): BandHash =
    copy(child = c)
  override def prettyName: String = "band_hash"
}

/** shingle_hashes(string, n) → ARRAY<BIGINT>: polyHash of every n-word
  * shingle (not deduplicated; wrap in array_distinct for set semantics). */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextHash.shingleHashesU(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.shingleHashesU($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

/** deflate_len(string) → BIGINT: zlib-deflated byte length of the UTF-8
  * text (level 6). The compressibility ratio deflate_len/octet_length is
  * the Gopher/RefinedWeb-family repetition signal: templated or repeated
  * text compresses far below natural prose. Codegen'd; the deflater is
  * a per-thread native handle reused across rows. */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextHash.deflateLenU(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.deflateLenU($c)")
  override protected def withNewChildInternal(c: Expression): DeflateLen = copy(c)
  override def prettyName: String = "deflate_len"
}

/** gram_covers(string) → struct<tok_chars, top2_cover, dup3_chars>
  * (all BIGINT): one-pass n-gram repetition covers over the whitespace
  * tokens — the Gopher top-2-gram coverage and duplicated-3-gram char
  * mass. Codegen'd call into a tight hash-map loop (TextHash.gramCoversU);
  * replaces an interpreter-bound higher-order-function formulation the
  * 10× stress arm measured ~18× slower end to end. */
case class GramCovers(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("tok_chars", LongType, nullable = false),
    StructField("top2_cover", LongType, nullable = false),
    StructField("dup3_chars", LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    TextHash.gramCoversU(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.gramCoversU($c)")
  override protected def withNewChildInternal(c: Expression): GramCovers = copy(c)
  override def prettyName: String = "gram_covers"
}

/** term_freqs(string) → ARRAY<STRUCT<term STRING, tf BIGINT>>: per-document
  * term frequencies over the whitespace tokens, one struct per distinct
  * token. Codegen'd call into a single hash-map pass
  * (TextHash.termFreqsU) — O(tokens) per row, vs the O(distinct × tokens)
  * interpreter-bound `transform(array_distinct, x -> size(filter(...)))`
  * formulation it replaces in the TF-IDF keyword gate. */
case class TermFreqs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextHash.termFreqsU(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.termFreqsU($c)")
  override protected def withNewChildInternal(c: Expression): TermFreqs = copy(c)
  override def prettyName: String = "term_freqs"
}

/** fix_text(string) → STRUCT<fixed STRING, was_mojibake BOOLEAN>: strict
  * double-decode mojibake repair + Unicode NFC normalization in one
  * codegen'd pass (TextFix.fixTextU) — the encoding hygiene step ahead of
  * every dedup/tokenization signal. */
case class FixText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("fixed", StringType, nullable = false),
    StructField("was_mojibake", BooleanType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    TextFix.fixTextU(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextFix.fixTextU($c)")
  override protected def withNewChildInternal(c: Expression): FixText = copy(c)
  override def prettyName: String = "fix_text"
}

/** Column-level API for the hash expressions.
  *
  * `ensure(spark)` registers the expressions in the session's
  * FunctionRegistry (idempotent, cheap); the Column builders then resolve
  * through `call_function`, the public analysis-time path.
  */
object HashFunctions {

  /** Evaluate a foldable literal argument to Int at builder time; raises
    * an analysis-time error (not an executor NumberFormatException) for
    * non-integral arguments like `min_hash_sig(text, 64.0, 3)`. */
  private def intArg(e: Expression, fn: String): Int = {
    require(e.foldable, s"$fn: parameter must be a literal, got $e")
    e.eval(null) match {
      case i: Int    => i
      case l: Long   => l.toInt
      case s: Short  => s.toInt
      case b: Byte   => b.toInt
      case d: org.apache.spark.sql.types.Decimal if d.toBigDecimal.isWhole =>
        d.toBigDecimal.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: parameter must be an integral literal, got " +
          s"$other (${if (other == null) "NULL" else other.getClass.getSimpleName})")
    }
  }

  /** Like [[intArg]] but keeps the full Long range (bloom bit counts can
    * exceed Int.MaxValue at large eval-set sizes). */
  private def longArg(e: Expression, fn: String): Long = {
    require(e.foldable, s"$fn: parameter must be a literal, got $e")
    e.eval(null) match {
      case i: Int    => i.toLong
      case l: Long   => l
      case s: Short  => s.toLong
      case b: Byte   => b.toLong
      case d: org.apache.spark.sql.types.Decimal if d.toBigDecimal.isWhole =>
        d.toBigDecimal.toLong
      case other => throw new IllegalArgumentException(
        s"$fn: parameter must be an integral literal, got " +
          s"$other (${if (other == null) "NULL" else other.getClass.getSimpleName})")
    }
  }

  private def str(e: Expression): Expression =
    if (e.dataType == StringType) e else Cast(e, StringType)

  private def i64(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  // once per session: repeated ensure() calls are a set lookup, and the
  // temp functions are only (re)registered a single time per session
  private val ensured = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** One builder per function name — shared by the per-session ensure()
    * path and the SparkSessionExtensions deployment path. */
  private[functions] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "poly_hash" -> (a => PolyHash(str(a.head))),
    "min_hash_sig" -> (a =>
      MinHashSig(str(a.head), intArg(a(1), "min_hash_sig"), intArg(a(2), "min_hash_sig"))),
    "sim_hash64" -> (a => SimHash64(str(a.head))),
    "band_hash" -> (a =>
      BandHash(a.head, intArg(a(1), "band_hash"), intArg(a(2), "band_hash"))),
    "shingle_hashes" -> (a =>
      ShingleHashes(str(a.head), intArg(a(1), "shingle_hashes"))),
    "bloom_build" -> (a =>
      BloomBuildAgg(i64(a.head), longArg(a(1), "bloom_build"), intArg(a(2), "bloom_build"))),
    "bloom_contains" -> (a => BloomMightContain(a.head, i64(a(1)))),
    "deflate_len" -> (a => DeflateLen(str(a.head))),
    "gram_covers" -> (a => GramCovers(str(a.head))),
    "term_freqs" -> (a => TermFreqs(str(a.head))),
    "fix_text" -> (a => FixText(str(a.head))))

  def ensure(spark: SparkSession): Unit = if (ensured.add(spark)) {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }

  /** Build-time injection for `spark.sql.extensions=graft.GraftExtensions`:
    * every session constructed with the extension has the functions from
    * birth — no driver-side ensure() needed. */
  def injectInto(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(getClass.getName, name), b))
    }
  }

  /** Builders self-register in the active session, so callers that skip
    * ensure() never hit an 'undefined function' analysis error. */
  private def ready(): Unit =
    SparkSession.getActiveSession.foreach(ensure)

  def poly_hash(c: Column): Column = { ready(); call_function("poly_hash", c) }
  def min_hash_sig(c: Column, k: Int, n: Int): Column = {
    ready(); call_function("min_hash_sig", c, lit(k), lit(n))
  }
  def sim_hash64(c: Column): Column = { ready(); call_function("sim_hash64", c) }
  def band_hash(c: Column, start: Int, r: Int): Column = {
    ready(); call_function("band_hash", c, lit(start), lit(r))
  }
  def shingle_hashes(c: Column, n: Int): Column = {
    ready(); call_function("shingle_hashes", c, lit(n))
  }
  def bloom_build(c: Column, numBits: Long, k: Int): Column = {
    ready(); call_function("bloom_build", c, lit(numBits), lit(k))
  }
  def bloom_contains(bloom: Column, h: Column): Column = {
    ready(); call_function("bloom_contains", bloom, h)
  }
  def deflate_len(c: Column): Column = { ready(); call_function("deflate_len", c) }

  def gram_covers(c: Column): Column = { ready(); call_function("gram_covers", c) }

  def term_freqs(c: Column): Column = { ready(); call_function("term_freqs", c) }

  def fix_text(c: Column): Column = { ready(); call_function("fix_text", c) }
}
