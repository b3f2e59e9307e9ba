package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway A/B diagnosis harness for the r16 optimization round: times
  * hand-built VARIANTS of a query body under the bench's exact protocol
  * (noop sink, median of reps) to attribute cost inside one plan. Not a
  * declared query; deleted before the round closes.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.write.format("noop").mode("overwrite").save() // warm

    val cols = Seq("l_orderkey", "l_linenumber", "l_returnflag",
      "l_linestatus", "l_shipdate")
    def rendered(e: Column, c: String): Column =
      if (c == "l_shipdate") date_format(e, "yyyy-MM-dd HH:mm:ss")
      else e.cast("string")

    def profileAggs(distincts: Boolean, lens: Boolean): DataFrame = {
      val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
        Seq(count(col(c)).as(s"nn_$c")) ++
          (if (distincts) Seq(countDistinct(col(c)).as(s"nd_$c")) else Nil) ++
          Seq(rendered(min(col(c)), c).as(s"min_$c"),
            rendered(max(col(c)), c).as(s"max_$c")) ++
          (if (lens) Seq(sum(length(rendered(col(c), c))).as(s"len_$c")) else Nil)
      }
      li.agg(aggs.head, aggs.tail: _*)
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "full" -> (() => profileAggs(true, true)),
      "no_distinct" -> (() => profileAggs(false, true)),
      "no_len" -> (() => profileAggs(true, false)),
      "neither" -> (() => profileAggs(false, false)))

    val reps = sys.env.getOrElse("SCRATCH_REPS", "5").toInt
    def timeIt(name: String)(run: () => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"SCRATCH $name%-12s median=${ts((ts.size - 1) / 2)}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    variants.foreach { case (name, fn) =>
      timeIt(name)(() => fn().write.format("noop").mode("overwrite").save())
    }
    // alternative exact-distinct shapes vs the Expand plan
    timeIt("five_jobs")(() =>
      cols.foreach(c => li.agg(countDistinct(col(c))).collect()))
    timeIt("five_pool") { () =>
      import scala.concurrent.{Await, Future, ExecutionContext}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val fs = cols.map(c => Future(li.agg(countDistinct(col(c))).collect()))
      fs.foreach(Await.result(_, Duration.Inf))
      pool.shutdown()
    }
    timeIt("tagged")(() =>
      li.select(posexplode(array(cols.map(c => col(c).cast("string")): _*)))
        .filter(col("col").isNotNull)
        .groupBy("pos").agg(countDistinct(col("col")))
        .collect())
    spark.stop()
    sys.exit(0)
  }
}
