package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** Vector arithmetic for the embedding operators.
  *
  * `aggregate`/`zip_with` higher-order functions evaluate their lambda
  * per element in the interpreter — a 64-dim dot over a million candidate
  * pairs is ~10^8 interpreted closure calls. This native expression
  * compiles to one static call inside whole-stage codegen, with the SAME
  * left-to-right accumulation order as both the HOF fold and DuckDB's
  * list_dot_product, so results are bit-identical across all three.
  */
object VecMath {
  /** Σ a(i)·b(i), left-to-right (index order). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Σ a(i)·b(i) over BIGINT arrays — exact integer, order-free, so it
    * is a drop-in for the `aggregate(zip_with(...))` fold regardless of
    * accumulation order. */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** Σ (a(i)−b(i))² over BIGINT arrays — exact integer, order-free. */
  def sqDistLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { val d = a.getLong(i) - b.getLong(i); s += d * d; i += 1 }
    s
  }

  /** 0-based index of the centroid (array<array<double>>) nearest to x
    * (array<long>) under squared L2. Accumulation is left-to-right in
    * index order starting from 0.0 — the SAME IEEE addition sequence as
    * the `aggregate(zip_with(...))` fold and DuckDB's `list_reduce`
    * with a prepended 0.0 — and ties break to the FIRST (lowest-index)
    * minimum, matching `array_position(d, array_min(d))` and the
    * oracle's `ORDER BY dist, cl` rn=1. So swapping the interpreted HOF
    * chain for this native loop is bit-identical, not just "close". */
  def argminSq(x: ArrayData, cents: ArrayData): Int = {
    val k = cents.numElements()
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      val m = cents.getArray(c)
      val n = math.min(x.numElements(), m.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = x.getLong(i).toDouble - m.getDouble(i)
        s += d * d
        i += 1
      }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }
}

/** vec_dot(array<double>, array<double>) → DOUBLE. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecMath.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecMath.dot($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecDot = copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** vec_dot_long(array<bigint>, array<bigint>) → BIGINT (exact). */
case class VecDotLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecMath.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecMath.dotLong($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecDotLong = copy(left = l, right = r)
  override def prettyName: String = "vec_dot_long"
}

/** vec_argmin_sq(array<bigint>, array<array<double>>) → INT: index of
  * the nearest centroid under squared L2 (first-min tiebreak). */
case class VecArgminSq(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecMath.argminSq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecMath.argminSq($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecArgminSq = copy(left = l, right = r)
  override def prettyName: String = "vec_argmin_sq"
}

/** vec_sqdist_long(array<bigint>, array<bigint>) → BIGINT (exact). */
case class VecSqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecMath.sqDistLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecMath.sqDistLong($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecSqDistLong = copy(left = l, right = r)
  override def prettyName: String = "vec_sqdist_long"
}

object VecFunctions {

  private val ensured = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  def ensure(spark: SparkSession): Unit = if (ensured.add(spark)) {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", a => VecDot(a.head, a(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot_long", a => VecDotLong(a.head, a(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_sqdist_long", a => VecSqDistLong(a.head, a(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_argmin_sq", a => VecArgminSq(a.head, a(1)), "built-in")
  }

  /** See [[graft.GraftExtensions]]. */
  def injectInto(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(getClass.getName, "vec_dot"),
      a => VecDot(a.head, a(1))))
    ext.injectFunction((FunctionIdentifier("vec_dot_long"),
      new ExpressionInfo(getClass.getName, "vec_dot_long"),
      a => VecDotLong(a.head, a(1))))
    ext.injectFunction((FunctionIdentifier("vec_sqdist_long"),
      new ExpressionInfo(getClass.getName, "vec_sqdist_long"),
      a => VecSqDistLong(a.head, a(1))))
    ext.injectFunction((FunctionIdentifier("vec_argmin_sq"),
      new ExpressionInfo(getClass.getName, "vec_argmin_sq"),
      a => VecArgminSq(a.head, a(1))))
  }

  def vec_dot(a: Column, b: Column): Column = {
    SparkSession.getActiveSession.foreach(ensure)
    call_function("vec_dot", a, b)
  }

  def vec_dot_long(a: Column, b: Column): Column = {
    SparkSession.getActiveSession.foreach(ensure)
    call_function("vec_dot_long", a, b)
  }

  def vec_sqdist_long(a: Column, b: Column): Column = {
    SparkSession.getActiveSession.foreach(ensure)
    call_function("vec_sqdist_long", a, b)
  }

  def vec_argmin_sq(x: Column, cents: Column): Column = {
    SparkSession.getActiveSession.foreach(ensure)
    call_function("vec_argmin_sq", x, cents)
  }
}
