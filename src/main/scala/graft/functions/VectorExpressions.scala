package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

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

object VecFunctions {

  private val ensured = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  def ensure(spark: SparkSession): Unit = if (ensured.add(spark)) {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", a => VecDot(a.head, a(1)), "built-in")
  }

  /** See [[graft.GraftExtensions]]. */
  def injectInto(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(getClass.getName, "vec_dot"),
      a => VecDot(a.head, a(1))))
  }

  def vec_dot(a: Column, b: Column): Column = {
    SparkSession.getActiveSession.foreach(ensure)
    call_function("vec_dot", a, b)
  }
}
