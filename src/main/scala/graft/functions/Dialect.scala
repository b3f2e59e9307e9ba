package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{LongType, DoubleType}

/** qlbridge/MySQL dialect function aliases (SURVEY.md §2.8).
  *
  * The reference loads qlbridge's builtin library wholesale
  * (frontends/mysqlfe/testmysql/runtestserver.go:75); the subset its own
  * tests exercise is registered here as thin aliases over native Catalyst
  * expressions — no UDFs, so everything stays inside whole-stage codegen.
  *
  * Dotted reference names (hash.md5, json.jmespath) are exposed with
  * underscores (hash_md5, json_jmespath): dots are not valid in Spark
  * function identifiers.
  *
  * Note: registering `exists(col)` (reference: not-missing,
  * backends/elasticsearch/sqltoes.go:557-586) shadows Spark's higher-order
  * `exists(array, lambda)` for sessions that call register(); the engine's
  * own surface does not use the array form.
  */
object Dialect {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def add(name: String)(b: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, b, "built-in")

    // type coercions (sql_to_mgo.go / lytics_test.go:197 usage)
    add("toint")(a => Cast(a.head, LongType))
    add("tonumber")(a => Cast(a.head, DoubleType))
    add("todate")(a => new ParseToDate(a.head))
    add("todatein")(a => new ParseToTimestamp(a.head, a(1)))

    // predicates (sqltoes.go:557-586, sql_to_mgo.go:612-655)
    add("exists")(a => IsNotNull(a.head))
    add("missing")(a => IsNull(a.head))
    add("hasprefix")(a => StartsWith(a.head, a(1)))
    add("hassuffix")(a => EndsWith(a.head, a(1)))
    add("prefix")(a => StartsWith(a.head, a(1)))

    // strings (qlbridge builtins: tolower, contains, join…)
    add("tolower")(a => Lower(a.head))
    add("toupper")(a => Upper(a.head))
    add("charlength")(a => Length(a.head))

    // dates (qlbridge yy/mm/dayofweek/hourofday)
    add("yy")(a => Year(a.head))
    add("mm")(a => Month(a.head))
    add("dayofmonth_f")(a => DayOfMonth(a.head))
    add("hourofday")(a => Hour(a.head))

    // qlbridge builtin library (the reference loads it wholesale;
    // these are the documented string/url/email builtins): every alias
    // maps to a native codegen'd Catalyst expression.
    add("oneof")(a => Coalesce(a))
    add("len")(a => Length(a.head))
    add("contains")(a => Contains(a.head, a(1)))
    add("split")(a => StringSplit(a.head, a(1), Literal(-1)))
    // join(v1, v2, ..., sep): last argument is the separator
    add("join")(a => ConcatWs(a.last +: a.init))
    add("replace")(a =>
      StringReplace(a.head, a(1), if (a.size >= 3) a(2) else Literal("")))
    add("strip")(a => StringTrim(a.head))
    add("email")(a => Lower(StringTrim(a.head)))
    add("emailname")(a => SubstringIndex(StringTrim(a.head), Literal("@"), Literal(1)))
    add("emaildomain")(a =>
      Lower(SubstringIndex(StringTrim(a.head), Literal("@"), Literal(-1))))
    add("host")(a => ParseUrl(Seq(a.head, Literal("HOST"))))
    add("path")(a => ParseUrl(Seq(a.head, Literal("PATH"))))
    add("qs")(a => ParseUrl(Seq(a.head, Literal("QUERY"), a(1))))
    add("urldecode")(a => UrlDecode(a.head))
    add("totimestamp")(a => Cast(a.head, org.apache.spark.sql.types.TimestampType))

    // hashing / json
    add("hash_md5")(a => Md5(Cast(a.head, org.apache.spark.sql.types.BinaryType)))
    add("json_jmespath")(a => GetJsonObject(a.head, a(1)))

    // MySQL session functions (frontends/mysqlfe/mysql_functions.go:20-34).
    // current_user() is a Spark builtin already; the rest are registered as
    // foldable literals — they evaluate once at plan time, never per row.
    add("connection_id")(_ => Literal(connectionId(spark)))
    add("database")(_ => Literal(spark.catalog.currentDatabase))
  }

  /** Stable per-session connection id (reference: one id per MySQL
    * connection; here one per SparkSession, as a session ≈ connection). */
  private val ids = new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Long]()
  private val nextId = new java.util.concurrent.atomic.AtomicLong(0L)
  private def connectionId(spark: SparkSession): Long =
    ids.computeIfAbsent(spark, _ => nextId.incrementAndGet())
}
