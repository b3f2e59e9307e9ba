package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources._

/** BigTable twin of MongoRuntimeFilterPropertySpec: random broadcast-
  * dim key sets drive plain, TopN, and TopN+OFFSET fact subqueries
  * under the runtime rowKeys reducer, optionally with a static key
  * range the runtime keys must INTERSECT (not widen); every join
  * result must equal the engine-as-oracle (window FIRST, then join). A
  * row-key-sorted scan that gained a rowKeys batch beneath its window
  * would return top-n of the filtered subset. Seeded — deterministic. */
class BtRuntimeFilterPropertySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val rnd = new java.util.Random(20260825L)

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("id", LongType),
    StructField("seg", StringType)))

  private def corpus(n: Int): Seq[Array[Any]] = (0L until n.toLong).map { i =>
    Array[Any](f"row#$i%05d", i,
      if (rnd.nextInt(5) == 0) null else ("S" + ('A' + rnd.nextInt(4)).toChar))
  }

  private def table(name: String, rows: Seq[Array[Any]]): String = {
    LoopbackRestServer.registerBt(name, schema, "k", rows)
    val baseUrl = LoopbackRestServer.ensureStarted()
    LoopbackRestServer.failNext.set(0)
    BtEndpoints.register(BtEndpoint("bttest", name, schema, "k",
      BtEndpointSpec(baseUrl, name, "k",
        HttpRestConfig(pageSize = 16, retryBackoffMs = 5))))
    if (SourceRegistry.get("bttest").isEmpty)
      SourceRegistry.register(SourceDef("bttest",
        new java.io.File(sys.props("user.dir"), "target/graft-test/bttest").getPath,
        "json", "bt"))
    SourceRegistry.ensureCatalog(spark)
    s"${SourceRegistry.CatalogName}.bttest.$name"
  }

  private def local(rows: Seq[Array[Any]]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row.fromSeq(r.toSeq)): _*), schema)

  private def canon(rows: Array[Row]): Seq[String] =
    rows.map(_.toSeq.map(v => if (v == null) "<NULL>" else v.toString)
      .mkString("|")).toSeq.sorted

  test("rowKeys reduction composes with key windows only by windowing FIRST") {
    for (iter <- 1 to 14) {
      val n = 40 + rnd.nextInt(80)
      val rows = corpus(n)
      val tbl = table(s"btrfprop$iter", rows)

      val keyCount = 1 + rnd.nextInt(6)
      val keys = Seq.fill(keyCount)(rnd.nextInt(n + 10).toLong).distinct
      def dim() = spark.range(0, (n + 10).toLong)
        .filter(col("id").isin(keys: _*))
        .select(format_string("row#%05d", col("id")).as("dk"))

      val windowed = rnd.nextInt(3) // 0 = plain scan, 1 = topN, 2 = topN+offset
      val k = 1 + rnd.nextInt(15)
      val off = 1 + rnd.nextInt(6)
      val desc = rnd.nextBoolean()
      // sometimes a static key range the runtime keys must intersect
      val lowCut: Option[String] =
        if (windowed == 0 && rnd.nextBoolean())
          Some(f"row#${rnd.nextInt(n)}%05d")
        else None

      def build(fact: DataFrame): DataFrame = {
        val base = lowCut.fold(fact)(c => fact.filter(col("k") >= c))
        val sub = windowed match {
          case 0 => base
          case 1 =>
            (if (desc) base.orderBy(col("k").desc) else base.orderBy(col("k")))
              .limit(k)
          case 2 =>
            (if (desc) base.orderBy(col("k").desc) else base.orderBy(col("k")))
              .offset(off).limit(k)
        }
        sub.join(broadcast(dim()), col("k") === col("dk"))
          .select("k", "id", "seg")
      }

      val got = canon(build(spark.table(tbl)).collect())
      val want = canon(build(local(rows)).collect())
      assert(got == want,
        s"iter $iter windowed=$windowed keys=$keys k=$k off=$off desc=$desc " +
          s"lowCut=$lowCut:\n got=$got\nwant=$want")
    }
  }
}
