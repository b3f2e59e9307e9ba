package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: print the formatted physical plan of named queries.
  *
  * Usage: runMain graft.Explain <sfDir> <name>[,<name>...]
  * (no names = every registered query). Part of the per-round perf
  * discipline: after correctness is green, read the plan you shipped.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSeq
      else SparkEntry.allQueries.map(_.name)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // DSv2 same-server join pushdown (Mongo $lookup, BQ statement render)
      // is harness-level session config, not per-query mutation — set once
      // here so query builders never leak plan-changing conf into the
      // shared session (ADVICE r14)
      .config("spark.sql.optimizer.datasourceV2JoinPushdown", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n")
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          try fn(spark, sfDir).explain("formatted")
          catch { case e: Throwable => println(s"[explain] failed: $e") }
        case None => println("[explain] unknown query")
      }
    }
    spark.stop()
    sys.exit(0) // see Verify: never hang on a leaked non-daemon thread
  }
}
