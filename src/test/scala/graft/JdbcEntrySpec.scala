package graft

import java.net.{ServerSocket, Socket}
import java.sql.DriverManager

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
import org.scalatest.funsuite.AnyFunSuite

/** External wire-protocol entry point (reference UX: any mysql client can
  * connect to the proxy listener, dataux proxy/server.go:62-110,
  * frontends/mysqlfe/mysql_handler.go:130-166). The Spark-native
  * counterpart is the Hive Thrift server: this spec boots it against the
  * engine's session and drives a query through a real out-of-process-style
  * JDBC connection — proving a user needs no Scala at all to reach the
  * engine, just a JDBC URL.
  *
  * The JDBC session is a NEW Spark session (thrift sessions don't share
  * temp views), so the queries go through surfaces that survive session
  * forks: path-based parquet tables and the conf-registered `graft`
  * catalog (whose SourceRegistry state is JVM-global, as on a real
  * driver).
  */
class JdbcEntrySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def freePort(): Int = {
    val ss = new ServerSocket(0)
    try ss.getLocalPort finally ss.close()
  }

  private def awaitPort(port: Int, timeoutMs: Long = 60000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var open = false
    while (!open && System.currentTimeMillis() < deadline) {
      try { new Socket("localhost", port).close(); open = true }
      catch { case _: Exception => Thread.sleep(250) }
    }
    assert(open, s"thrift server did not open port $port")
  }

  test("an external JDBC client reaches the engine through the Thrift server") {
    // keep the embedded metastore's derby files out of the repo
    System.setProperty("derby.system.home", "/tmp/graft-derby")
    graft.sources.FedData.ensure(spark, sfDir)
    val port = freePort()
    spark.sqlContext.setConf("hive.server2.thrift.port", port.toString)
    spark.sqlContext.setConf("hive.server2.thrift.bind.host", "localhost")
    val server = HiveThriftServer2.startWithContext(spark.sqlContext)
    try {
      awaitPort(port)
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val conn = DriverManager.getConnection(
        s"jdbc:hive2://localhost:$port/default", "anonymous", "")
      try {
        val st = conn.createStatement()
        // the flagship aggregation, as SQL text over a path table —
        // exactly what an external BI tool would send
        val rs = st.executeQuery(
          s"""SELECT l_returnflag, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
             |FROM parquet.`$sfDir/lineitem.parquet`
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
        var rows = List.empty[(String, Long)]
        while (rs.next()) rows ::= (rs.getString(1), rs.getLong(2))
        val viaJdbc = rows.reverse
        val direct = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .groupBy("l_returnflag")
          .agg(org.apache.spark.sql.functions.sum("l_quantity").cast("long"))
          .orderBy("l_returnflag")
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        assert(viaJdbc == direct, s"jdbc=$viaJdbc direct=$direct")
        assert(viaJdbc.nonEmpty)
        // the connector catalog works over JDBC too: the forked thrift
        // session starts from base conf, so the client binds the catalog
        // with a SET (what spark-defaults.conf would carry in production);
        // the registry state behind it is JVM-global on the driver
        st.execute(
          "SET spark.sql.catalog.graft=" +
            classOf[graft.sources.GraftCatalog].getName)
        val rs2 = st.executeQuery(
          "SELECT count(*) AS n FROM graft.fed.nation_csv")
        assert(rs2.next() && rs2.getLong(1) > 0)
        rs2.close(); st.close()
      } finally conn.close()
    } finally server.stop()
  }
}
