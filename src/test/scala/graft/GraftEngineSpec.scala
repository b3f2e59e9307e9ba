package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.engine.GraftEngine

class GraftEngineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val engine: GraftEngine = {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    new GraftEngine(spark)
  }

  test("SET @var then use in a query (mysql_session.go semantics)") {
    engine.sql("SET @min_price = 400000")
    val n = engine.sql(
      "SELECT count(*) AS n FROM orders WHERE o_totalprice > @min_price")
      .collect()(0).getLong(0)
    val direct = spark.sql(
      "SELECT count(*) AS n FROM orders WHERE o_totalprice > 400000")
      .collect()(0).getLong(0)
    assert(n == direct && n > 0)
  }

  test("WITH distributed=true, node_ct=N hints accept (the reference's syntax)") {
    // the exact statement shape from backends/mongo/mgo_test.go:366
    val df = engine.sql(
      "SELECT o_orderpriority, count(*) AS ct FROM orders " +
        "GROUP BY o_orderpriority WITH distributed=true, node_ct=2")
    assert(df.rdd.getNumPartitions == 2, "node_ct maps to the output fan-out")
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = spark.sql("SELECT o_orderpriority, count(*) AS ct FROM orders " +
      "GROUP BY o_orderpriority").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, "the hint must not change the result")
    // a CTE-leading WITH is untouched by the hint stripper
    assert(engine.sql("WITH t AS (SELECT 1 AS x) SELECT x FROM t")
      .collect()(0).getInt(0) == 1)
  }

  test("node_ct drives WIRE-SCAN fan-out, not just output partitions") {
    // a Mongo wire table with range-split metadata, read through the
    // engine under the distribution hint: the hint must reach
    // planInputPartitions (sql_master.go:78-97 sizes the worker fleet
    // from the same statement attribute)
    import org.apache.spark.sql.types._
    import graft.sources._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))
    val rows: Seq[Array[Any]] = (0L until 300L).map(i => Array[Any](i, i * 2.0))
    LoopbackMongoServer.register("hint_fan", schema, rows)
    val (host, port) = LoopbackMongoServer.ensureStarted()
    MongoEndpoints.register(MongoEndpoint("mongotest", "hint_fan", schema,
      MongoEndpointSpec(host, port, LoopbackMongoServer.Db, "hint_fan",
        MongoClientConfig(batchSize = 64, retryBackoffMs = 5)),
      splits = Some(WireSplits("id", Seq(50L, 100L, 150L, 200L, 250L)))))
    if (SourceRegistry.get("mongotest").isEmpty)
      SourceRegistry.register(SourceDef("mongotest",
        new java.io.File(sys.props("user.dir"), "target/graft-test/mongotest").getPath,
        "json", "mongo"))
    SourceRegistry.ensureCatalog(spark)
    val t = s"${SourceRegistry.CatalogName}.mongotest.hint_fan"

    def scanParts(df: org.apache.spark.sql.DataFrame): Seq[Int] = {
      def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
          : org.apache.spark.sql.execution.SparkPlan = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case other => other
      }
      unwrap(df.queryExecution.executedPlan).collectLeaves().collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.size
      }
    }

    val hinted = engine.sql(s"SELECT id FROM $t WITH distributed=true, node_ct=3")
    assert(scanParts(hinted) == Seq(3),
      "node_ct=3 must reach the wire scan's partition planning")
    assert(hinted.collect().map(_.getLong(0)).sorted.toSeq == (0L until 300L),
      "fan-out must not change the result")
    // without the hint, the table's own metadata count applies (6 ranges)
    val plain = engine.sql(s"SELECT id FROM $t")
    assert(scanParts(plain) == Seq(6))
    // the hint is statement-scoped: it must NOT leak into the next one
    val hinted2 = engine.sql(s"SELECT id FROM $t WITH distributed=true, node_ct=2")
    val after = engine.sql(s"SELECT id FROM $t")
    assert(scanParts(after) == Seq(6), "node_ct must not bleed across statements")
    // ... nor into a scan planned OUTSIDE the engine (the hint rides in
    // the statement's own plan, not in session state)
    assert(scanParts(spark.table(t).select("id")) == Seq(6),
      "a plain spark.table scan after a hinted statement keeps its own fan-out")
    // and the hinted DataFrame keeps its fan-out even though other
    // statements ran before it was planned — the hint survives laziness
    assert(scanParts(hinted2) == Seq(2))
    assert(hinted2.count() == 300L, "fan-out must not change the result")
  }

  test("SET @var evaluates expressions eagerly") {
    engine.sql("SET @two = 1 + 1")
    assert(engine.substitute("SELECT @two") == "SELECT 2")
  }

  test("@@system variables resolve") {
    val v = engine.sql("SELECT @@max_allowed_packet AS v").collect()(0).getString(0)
    assert(v == "67108864")
  }

  test("SHOW VARIABLES returns the sysvar table, LIKE filters") {
    assert(engine.sql("SHOW VARIABLES").count() == engine.sysVars.size)
    val rows = engine.sql("SHOW VARIABLES LIKE 'version%'").collect()
    assert(rows.map(_.getString(0)).toSet == Set("version", "version_comment"))
  }

  test("BEGIN/COMMIT/ROLLBACK are accepted no-ops") {
    Seq("BEGIN", "COMMIT", "ROLLBACK").foreach { stmt =>
      assert(engine.sql(stmt).collect().isEmpty)
    }
  }

  test("SHOW CREATE TABLE renders MySQL-style DDL (sql_writer.go:164-201)") {
    val ddl = engine.sql("SHOW CREATE TABLE lineitem")
      .collect()(0).getString(1)
    assert(ddl.startsWith("CREATE TABLE `lineitem`"))
    assert(ddl.contains("`l_orderkey` bigint"))
    assert(ddl.contains("`l_returnflag` varchar(255)"))
    assert(ddl.contains("`l_shipdate` datetime"))
    assert(ddl.contains("`l_linenumber` int(11)"))
  }

  test("SHOW TABLES / DESCRIBE work natively") {
    val tables = engine.sql("SHOW TABLES").collect().map(_.getString(1)).toSet
    assert(Tables.all.toSet.subsetOf(tables))
    val desc = engine.sql("DESCRIBE lineitem").collect()
    assert(desc.exists(r => r.getString(0) == "l_orderkey"))
  }

  test("malformed SQL errors gracefully (mgo_test.go:111-121)") {
    val e1 = intercept[Exception](engine.sql("SELEC 1 FORM dual"))
    assert(e1.getMessage.nonEmpty)
    val e2 = intercept[Exception](engine.sql("SELECT no_such_col FROM lineitem"))
    assert(e2.getMessage.nonEmpty)
    // the session survives a bad statement
    assert(engine.sql("SELECT 1 AS ok").collect()(0).getInt(0) == 1)
  }

  test("dialect functions: toint/hasprefix/exists/json_jmespath") {
    val r = engine.sql(
      """SELECT toint('42') AS i, hasprefix('redcar', 'red') AS p,
        |       exists('x') AS e, json_jmespath('{"a": 7}', '$.a') AS j
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) == 42L && r.getBoolean(1) && r.getBoolean(2) &&
      r.getString(3) == "7")
  }
}
