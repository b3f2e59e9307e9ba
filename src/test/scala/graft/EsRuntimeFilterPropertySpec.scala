package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources._

/** ES twin of MongoRuntimeFilterPropertySpec: random broadcast-dim key
  * sets drive plain, TopN, and TopN+OFFSET fact subqueries under the
  * runtime `terms` reducer, asserting every join result equals the
  * engine-as-oracle (window FIRST, then join). A sorted search that
  * gained a terms filter beneath its window would return top-n of the
  * filtered subset — rows the true result cannot contain would join
  * through; `filterAttributes` returns empty on sorted scans to
  * prevent exactly that. Seeded — deterministic. */
class EsRuntimeFilterPropertySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val rnd = new java.util.Random(20260824L)

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("seg", StringType),
    StructField("v", LongType)))

  private def corpus(n: Int): Seq[Array[Any]] = (0L until n.toLong).map { i =>
    Array[Any](i,
      if (rnd.nextInt(5) == 0) null else ("S" + ('A' + rnd.nextInt(4)).toChar),
      rnd.nextInt(50).toLong)
  }

  private def table(name: String, rows: Seq[Array[Any]]): String = {
    LoopbackRestServer.register(name, schema, rows)
    val base = LoopbackRestServer.ensureStarted()
    EsEndpoints.register(EsEndpoint("estest", name, schema,
      EsEndpointSpec(base, name,
        HttpRestConfig(pageSize = 16, retryBackoffMs = 5))))
    if (SourceRegistry.get("estest").isEmpty)
      SourceRegistry.register(SourceDef("estest",
        new java.io.File(sys.props("user.dir"), "target/graft-test/estest").getPath,
        "json", "es"))
    SourceRegistry.ensureCatalog(spark)
    s"${SourceRegistry.CatalogName}.estest.$name"
  }

  private def local(rows: Seq[Array[Any]]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row.fromSeq(r.toSeq)): _*), schema)

  private def canon(rows: Array[Row]): Seq[String] =
    rows.map(_.toSeq.map(v => if (v == null) "<NULL>" else v.toString)
      .mkString("|")).toSeq.sorted

  test("terms reduction composes with sorted windows only by windowing FIRST") {
    for (iter <- 1 to 14) {
      val n = 40 + rnd.nextInt(80)
      val rows = corpus(n)
      val tbl = table(s"esrfprop$iter", rows)

      val keyCount = 1 + rnd.nextInt(6)
      val keys = Seq.fill(keyCount)(rnd.nextInt(n + 10).toLong).distinct
      def dim() = spark.range(0, (n + 10).toLong)
        .filter(col("id").isin(keys: _*))
        .select(col("id").as("dim_id"))

      val windowed = rnd.nextInt(3)
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
