package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Parser extension exposing the FULL graft dialect to every SQL entry
  * point — `spark.sql`, the Thrift/JDBC server, Spark Connect — without a
  * driver-side [[GraftEngine]] call (reference UX: any MySQL client
  * speaks the whole dialect through the wire listener,
  * dataux proxy/server.go:62-110).
  *
  * Interception is surgical: [[GraftEngine.isDialect]] matches only the
  * statement shapes the default parser would reject (SET @var, SHOW
  * VARIABLES, MySQL SHOW CREATE, PREPARE/EXECUTE, UPSERT/OPTIMIZE on
  * `graft.` tables, @var references) — everything else goes to the
  * delegate untouched. Intercepted text executes through the session's
  * [[GraftEngine]] (one per session, weakly held, so Thrift connections
  * get isolated session variables) and the result's logical plan is
  * returned; the engine's own nested `spark.sql` calls re-enter this
  * parser on the same thread and are routed straight to the delegate by
  * the re-entrancy guard.
  */
class GraftParser(session: SparkSession, delegate: ParserInterface)
  extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    if (!GraftParser.inEngine.get() && GraftEngine.isDialect(sqlText)) {
      GraftParser.inEngine.set(true)
      try GraftEngine.forSession(session).sql(sqlText).queryExecution.logical
      finally GraftParser.inEngine.set(false)
    } else delegate.parsePlan(sqlText)

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftParser {
  private val inEngine = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }
}
