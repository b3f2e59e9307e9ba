package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources._

/** Randomized property for the ordered-window soundness rule on the
  * Mongo scan: a broadcast dim join above a plain fact scan may ship
  * the build-side keys as a runtime `$in` (the 100 TB fact-scan
  * reducer), but above a DELEGATED window (`ORDER BY ... LIMIT` /
  * `OFFSET` pushed whole into one find) the scan must REFUSE runtime
  * filtering — a server that applies the join keys before the window
  * returns top-n of the filtered subset, which joins into rows the
  * true result cannot contain. Random dim key sets (some matching rows
  * inside the window, some outside it, some matching nothing) drive
  * both arms; every result must equal the same query over a local copy
  * of the corpus (engine-as-oracle). Regressing the guard fails the
  * windowed arm on any key set that intersects the fact outside its
  * window. Seeded — deterministic. */
class MongoRuntimeFilterPropertySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val rnd = new java.util.Random(20260823L)

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("seg", StringType),
    StructField("v", LongType)))

  private def corpus(n: Int): Seq[Array[Any]] = (0L until n.toLong).map { i =>
    Array[Any](i,
      if (rnd.nextInt(5) == 0) null else ("S" + ('A' + rnd.nextInt(4)).toChar),
      rnd.nextInt(50).toLong)
  }

  private def table(name: String, rows: Seq[Array[Any]]): String = {
    LoopbackMongoServer.register(name, schema, rows)
    val (host, port) = LoopbackMongoServer.ensureStarted()
    LoopbackMongoServer.failNext.set(0)
    LoopbackMongoServer.delayMs.set(0)
    MongoEndpoints.register(MongoEndpoint("mongotest", name, schema,
      MongoEndpointSpec(host, port, LoopbackMongoServer.Db, name,
        MongoClientConfig(batchSize = 64, retryBackoffMs = 5))))
    if (SourceRegistry.get("mongotest").isEmpty)
      SourceRegistry.register(SourceDef("mongotest",
        new java.io.File(sys.props("user.dir"), "target/graft-test/mongotest").getPath,
        "json", "mongo"))
    SourceRegistry.ensureCatalog(spark)
    s"${SourceRegistry.CatalogName}.mongotest.$name"
  }

  private def local(rows: Seq[Array[Any]]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row.fromSeq(r.toSeq)): _*), schema)

  private def canon(rows: Array[Row]): Seq[String] =
    rows.map(_.toSeq.map(v => if (v == null) "<NULL>" else v.toString)
      .mkString("|")).toSeq.sorted

  test("runtime reduction composes with windows only by windowing FIRST") {
    for (iter <- 1 to 14) {
      val n = 40 + rnd.nextInt(80)
      val rows = corpus(n)
      val tbl = table(s"mrfprop$iter", rows)

      // random selective dim over range() so the filter survives
      // optimization and the broadcast side carries live keys
      val keyCount = 1 + rnd.nextInt(6)
      val keys = Seq.fill(keyCount)(rnd.nextInt(n + 10).toLong).distinct
      def dim() = spark.range(0, (n + 10).toLong)
        .filter(col("id").isin(keys: _*))
        .select(col("id").as("dim_id"))

      val windowed = rnd.nextInt(3) // 0 = plain, 1 = topN, 2 = topN+offset
      val k = 1 + rnd.nextInt(15)
      val off = 1 + rnd.nextInt(6)
      val desc = rnd.nextBoolean()

      def build(fact: DataFrame): DataFrame = {
        val sub = windowed match {
          case 0 => fact
          case 1 =>
            (if (desc) fact.orderBy(col("id").desc) else fact.orderBy(col("id")))
              .limit(k)
          case 2 =>
            (if (desc) fact.orderBy(col("id").desc) else fact.orderBy(col("id")))
              .offset(off).limit(k)
        }
        sub.join(broadcast(dim()), col("id") === col("dim_id"))
          .select("id", "seg", "v")
      }

      val got = canon(build(spark.table(tbl)).collect())
      val want = canon(build(local(rows)).collect())
      assert(got == want,
        s"iter $iter windowed=$windowed keys=$keys k=$k off=$off desc=$desc:\n" +
          s" got=$got\nwant=$want")
    }
  }
}
