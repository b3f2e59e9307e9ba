package graft.engine

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.functions.Dialect

/** Session facade — the Spark-native equivalent of the reference's MySQL
  * frontend (frontends/mysqlfe/mysql_handler.go:236-264 dispatch +
  * mysql_session.go:17-83 session variables).
  *
  * Statement surface:
  *   - SET @var = <literal>   — user variables, later substituted into SQL
  *   - SELECT @var / @@sysvar — resolved from the session/system maps
  *   - SHOW VARIABLES [LIKE]  — system-variable table
  *   - SHOW CREATE TABLE t    — MySQL-style DDL rendering
  *                              (frontends/mysqlfe/sql_writer.go:164-201)
  *   - BEGIN/COMMIT/ROLLBACK  — accepted no-ops (no transactions, as in the
  *                              reference, mysql_handler.go:205-213)
  *   - everything else        — @-substitution then spark.sql (full Catalyst)
  *
  * Everything heavy stays in Spark; this class only owns the dialect shims,
  * so it adds no per-row overhead at any scale.
  */
class GraftEngine(val spark: SparkSession) {

  Dialect.register(spark)

  private val userVars = TrieMap.empty[String, String]

  /** MySQL-ish system variables the reference answers (@@max_allowed_packet
    * et al., mysql_session.go). Values are engine-appropriate defaults. */
  val sysVars: Map[String, String] = Map(
    "max_allowed_packet" -> "67108864",
    "version" -> "8.0-graft-spark",
    "version_comment" -> "graft spark engine",
    "sql_mode" -> "ANSI",
    "autocommit" -> "1",
    "tx_isolation" -> "REPEATABLE-READ",
    "character_set_client" -> "utf8",
    "collation_connection" -> "utf8_general_ci")

  private val SetVar = """(?is)\s*SET\s+@(\w+)\s*(?::?=)\s*(.+?)\s*;?\s*""".r
  private val TxnNoop = """(?is)\s*(BEGIN|COMMIT|ROLLBACK)\s*;?\s*""".r
  private val ShowVars = """(?is)\s*SHOW\s+(?:SESSION\s+|GLOBAL\s+)?VARIABLES(?:\s+LIKE\s+'(.*)')?\s*;?\s*""".r
  private val ShowCreate = """(?is)\s*SHOW\s+CREATE\s+TABLE\s+`?(\w+)`?\s*;?\s*""".r

  def sql(text: String): DataFrame = text match {
    case SetVar(name, value) =>
      // evaluate the RHS once so `SET @x = 1 + 1` stores "2"
      val v = spark.sql(s"SELECT ($value) AS v").collect()(0).get(0)
      userVars.put(name, literal(v))
      spark.emptyDataFrame

    case TxnNoop(_) => spark.emptyDataFrame

    case ShowVars(like) =>
      import spark.implicits._
      val pat = Option(like).map(_.replace("%", ".*"))
      sysVars.toSeq.sortBy(_._1)
        .filter { case (k, _) => pat.forall(k.matches) }
        .toDF("Variable_name", "Value")

    case ShowCreate(t) =>
      import spark.implicits._
      Seq((t, showCreateTable(t))).toDF("Table", "Create Table")

    case other => spark.sql(substitute(other))
  }

  /** Replace @@sysvars and @uservars with their literal values. */
  def substitute(text: String): String = {
    val s1 = "@@(?:session\\.|global\\.)?(\\w+)".r.replaceAllIn(text, m =>
      scala.util.matching.Regex.quoteReplacement(
        sysVars.get(m.group(1).toLowerCase)
          .map(v => s"'$v'").getOrElse("NULL")))
    "@(\\w+)".r.replaceAllIn(s1, m =>
      scala.util.matching.Regex.quoteReplacement(
        userVars.getOrElse(m.group(1), "NULL")))
  }

  private def literal(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case ts: java.sql.Timestamp => s"TIMESTAMP '$ts'"
    case other => other.toString
  }

  /** MySQL-style DDL rendering of a catalog table
    * (reference: frontends/mysqlfe/sql_writer.go:164-201 + type switch
    * sql_writer.go:36-78). */
  def showCreateTable(name: String): String = {
    val schema = spark.table(name).schema
    val cols = schema.fields.map { f =>
      val t = mysqlType(f.dataType)
      val nn = if (f.nullable) "" else " NOT NULL"
      s"  `${f.name}` $t$nn"
    }
    s"CREATE TABLE `$name` (\n${cols.mkString(",\n")}\n) ENGINE=InnoDB DEFAULT CHARSET=utf8;"
  }

  /** value.ValueType → MySQL type names (sql_writer.go:36-78). */
  def mysqlType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType => "int(11)"
    case LongType => "bigint"
    case FloatType | DoubleType => "double"
    case _: DecimalType => "double"
    case BooleanType => "tinyint(1)"
    case TimestampType | TimestampNTZType => "datetime"
    case DateType => "date"
    case BinaryType => "blob"
    case StringType => "varchar(255)"
    case _: ArrayType | _: MapType | _: StructType => "text"
    case _ => "text"
  }
}
