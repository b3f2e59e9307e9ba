package graft

import org.apache.spark.sql.SparkSession

/** Round-17 throwaway measurement harness (deleted before round close):
  * splits the wire-gate cost into fixture-side vs engine-side per the
  * VERDICT item — times raw PIT page requests at several page sizes and
  * the client-side decode in isolation.
  */
object Scratch17 {
  def main(args: Array[String]): Unit = {
    if (sys.env.get("SCRATCH_NODELAY").contains("1"))
      System.setProperty("sun.net.httpserver.nodelay", "true")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.datasourceV2JoinPushdown", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.registerAll(spark, sfDir)
    graft.sources.FedData.ensure(spark, sfDir)

    val ep = graft.sources.EsEndpoints.get("es", "orders_es").get
    val client = new graft.sources.HttpRestClient(ep.spec.baseUrl, ep.spec.cfg)
    val M = graft.sources.EsDsl.M

    // open a PIT
    def openPit(): String = M.readTree(client.postJson(
      s"/es/${ep.spec.table}/_pit", "", Map("keep_alive" -> "5m"))).path("id").asText()

    def pageLoop(size: Int, maxPages: Int, label: String): Unit = {
      val pit = openPit()
      var lastSort = -1L
      var pages = 0
      var rows = 0L
      var bytes = 0L
      val t0 = System.nanoTime()
      var done = false
      while (!done && pages < maxPages) {
        val body = M.createObjectNode()
        body.put("size", size)
        val pn = body.putObject("pit"); pn.put("id", pit); pn.put("keep_alive", "5m")
        body.putArray("sort").addObject().put("_shard_doc", "asc")
        if (lastSort >= 0) body.putArray("search_after").add(lastSort)
        val respStr = client.postJson("/es/_search", body.toString)
        bytes += respStr.length
        val resp = M.readTree(respStr)
        val hits = resp.path("hits").path("hits")
        import scala.jdk.CollectionConverters._
        val arr = hits.elements().asScala.toArray
        arr.lastOption.foreach(h => lastSort = h.path("sort").get(0).asLong())
        rows += arr.length
        if (arr.length < size) done = true
        pages += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[scratch] $label%-22s size=$size%5d pages=$pages%4d rows=$rows%7d " +
        f"chars=${bytes / 1024}%7dK total=$dt%6.3fs ms/page=${dt * 1000 / math.max(1, pages)}%8.2f")
    }

    // warm up the server + JIT
    pageLoop(512, 5, "warmup")
    pageLoop(512, 10000, "pit size=512")
    pageLoop(512, 10000, "pit size=512 (rep2)")
    pageLoop(2048, 10000, "pit size=2048")
    pageLoop(8192, 10000, "pit size=8192")
    pageLoop(1, 200, "pit size=1 (latency)")

    // BQ side: time the paged join query
    val bq = graft.sources.BqEndpoints.get("bq", "orders_bqw").get
    val bclient = new graft.sources.HttpRestClient(bq.spec.baseUrl, bq.spec.cfg)
    val sql = "SELECT t0.o_orderkey, t0.o_custkey, t0.o_totalprice, t1.c_custkey, t1.c_name " +
      "FROM orders_bqw t0 JOIN customer_bqw t1 ON t0.o_custkey = t1.c_custkey " +
      "WHERE t0.o_totalprice IS NOT NULL AND t0.o_totalprice > 400000.0 " +
      "AND t0.o_custkey IS NOT NULL AND t1.c_custkey IS NOT NULL"
    def bqLoop(maxResults: Int, label: String): Unit = {
      var pageToken = ""
      var pages = 0
      var rows = 0L
      var bytes = 0L
      val t0 = System.nanoTime()
      var done = false
      while (!done) {
        val req = M.createObjectNode()
        req.put("query", sql)
        req.put("maxResults", maxResults)
        if (pageToken.nonEmpty) req.put("pageToken", pageToken)
        val respStr = bclient.postJson(s"/bq/orders_bqw/query", req.toString)
        bytes += respStr.length
        val resp = M.readTree(respStr)
        rows += resp.path("rows").size()
        pages += 1
        pageToken = resp.path("pageToken").asText("")
        if (pageToken.isEmpty) done = true
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[scratch] $label%-22s size=$maxResults%5d pages=$pages%4d rows=$rows%7d " +
        f"chars=${bytes / 1024}%7dK total=$dt%6.3fs ms/page=${dt * 1000 / math.max(1, pages)}%8.2f")
    }
    bqLoop(512, "bq warmup")
    bqLoop(512, "bq size=512")
    bqLoop(512, "bq size=512 (rep2)")
    bqLoop(4096, "bq size=4096")

    spark.stop()
    sys.exit(0)
  }
}
