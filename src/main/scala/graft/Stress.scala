package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress arm: runs the scale-critical LLM-pipeline operators
  * (MinHash LSH, connected components, incremental dedup, k-means,
  * GroupedTopN, BPE encode, bigram-LM scoring, embedding covariance,
  * semantic dedup — the last with cell count scaled to the corpus, the
  * SemDeDup recipe — plus DSIR weighting, the exact quality band, the
  * sketch-vs-exact eval, and PageRank over key-offset replica subgraphs)
  * at 1× and at R× (default 10×) corpus size and emits per-operator
  * scaling ratios to `BENCH_STRESS_r08.json`.
  *
  * The R× corpus replicates sf0.1's documents/embeddings with PERTURBED
  * payloads (per-replica token interleave / vector offset) so replicas
  * are distinct documents, not near-duplicates of each other — the
  * near-dup pair structure should scale ~R×, and a quadratic pair
  * blow-up (the classic LSH hot-bucket failure) shows up as a
  * super-linear `pairs_ratio`.
  *
  * Three signals per operator, 1× vs R×:
  *   - `sec`: wall time (noop-sink materialization, Bench conventions);
  *   - `rows`: result rows — pair/cluster blow-up detector;
  *   - `max_task_in_mb`: the largest single task's input+shuffle-read —
  *     the "no single-task group" detector (a dominant group collapsing
  *     onto one task scales this ~R×; balanced plans keep it ~flat or
  *     bounded by file split size).
  *
  * Exit 1 if any ratio exceeds its declared near-linear bound (R × 3
  * slack for rows/time, R × 1.5 for max-task bytes) — a loud gate, not a
  * dashboard.
  */
object Stress {

  private final class MaxTaskBytes extends SparkListener {
    val maxBytes = new AtomicLong(0)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        val in = m.inputMetrics.bytesRead +
          m.shuffleReadMetrics.localBytesRead + m.shuffleReadMetrics.remoteBytesRead
        var cur = maxBytes.get()
        while (in > cur && !maxBytes.compareAndSet(cur, in)) cur = maxBytes.get()
      }
    }
    def reset(): Unit = maxBytes.set(0)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val r = sys.env.getOrElse("SPARK_GRAFT_STRESS_X", "10").toInt
    val out = args.headOption.getOrElse("/root/repo/BENCH_STRESS_r08.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new MaxTaskBytes
    spark.sparkContext.addSparkListener(listener)

    // ---- stage the two corpora --------------------------------------
    val base = new java.io.File(sys.props("user.dir"), "target/graft-stress")
    val d1 = new java.io.File(base, "x1")
    val dR = new java.io.File(base, s"x$r")
    def stage(dir: java.io.File, reps: Int): Unit = {
      val marker = new java.io.File(dir, "_STAGED_v2")
      if (marker.isFile) return
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val repl = explode(sequence(lit(0), lit(reps - 1))).as("r")
      // per-replica token interleave: an `x<r>` token lands between every
      // pair of words, so every 3-shingle of replica r contains x<r> —
      // replicas of one doc share no shingles across r (independent
      // documents), while a near-dup PAIR inside the original corpus
      // stays a near-dup pair inside every replica (structure ~R×, the
      // linear-growth ground truth the ratios assert against)
      docs.select(col("*"), repl)
        .select(
          (col("doc_id") + col("r") * 10000000L).as("doc_id"),
          when(col("r") === 0, col("text"))
            .otherwise(regexp_replace(col("text"), lit("\\s+"),
              concat(lit(" x"), col("r"), lit(" ")))).as("text0"),
          col("lang"), col("source"))
        .select(col("doc_id"), col("text0").as("text"), col("lang"),
          col("source"), length(col("text0")).cast("long").as("n_chars"))
        .repartition(32)
        .write.mode("overwrite").parquet(new java.io.File(dir, "documents.parquet").getPath)
      emb.select(col("*"), repl)
        .select(
          (col("vec_id") + col("r") * 10000000L).as("vec_id"),
          transform(col("embedding"),
            x => (x + col("r").cast("float") * lit(0.001f)).cast("float"))
            .as("embedding"),
          col("label"))
        .repartition(32)
        .write.mode("overwrite").parquet(new java.io.File(dir, "embeddings.parquet").getPath)
      // key-offset replicas of the PageRank inputs: each replica is a
      // DISJOINT subgraph (customers/suppliers offset per replica), so
      // nodes, edges, and per-iteration join work all scale exactly R× —
      // the linear ground truth. Only the join/key columns are staged
      // (the stress ops read nothing else from these tables).
      spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"), repl)
        .select((col("o_orderkey") + col("r") * 10000000L).as("o_orderkey"),
          (col("o_custkey") + col("r") * 10000000L).as("o_custkey"))
        .repartition(32)
        .write.mode("overwrite").parquet(new java.io.File(dir, "orders.parquet").getPath)
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey"), repl)
        .select((col("l_orderkey") + col("r") * 10000000L).as("l_orderkey"),
          (col("l_suppkey") + col("r") * 10000000L).as("l_suppkey"))
        .repartition(32)
        .write.mode("overwrite").parquet(new java.io.File(dir, "lineitem.parquet").getPath)
      marker.createNewFile()
    }
    stage(d1, 1)
    stage(dR, r)

    val allOps = Seq(
      "q_dedup_minhash_lsh", "q_dedup_clusters", "q_dedup_incremental",
      "q_kmeans", "q_curation_domain_cap",
      // round-8 additions to the family
      "q_text_bpe_encode", "q_text_lm_score", "q_embed_covariance",
      "q_dedup_semantic",
      "q_dedup_blocks", "q_embed_pca", "q_text_cms", "q_curation_shards",
      "q_curation_dsir", "q_curation_quality_band", "q_dedup_minhash_eval",
      "q_graph_pagerank", "q_dedup_spans")
    // optional comma-separated subset for fast local iteration; the
    // driver never sets it → full sweep
    val ops = sys.env.get("SPARK_GRAFT_STRESS_OPS")
      .map(s => allOps.filter(s.split(",").map(_.trim).toSet))
      .getOrElse(allOps)

    // q_dedup_semantic scales its cell count with the corpus (the
    // SemDeDup recipe: constant per-cell pairwise work); everything else
    // runs identically at both sizes
    def configure(op: String, reps: Int): Unit =
      if (op == "q_dedup_semantic")
        spark.conf.set("spark.graft.semdedup.k", (16 * reps).toString)

    // warm-up (parser, codegen, parquet readers) outside measured regions
    spark.read.parquet(new java.io.File(d1, "documents.parquet").getPath)
      .write.format("noop").mode("overwrite").save()
    spark.sql("SELECT md5('warmup') AS h").collect()

    final case class Obs(sec: Double, rows: Long, maxTaskMb: Double)
    def run(name: String, dir: String): Obs = {
      spark.catalog.clearCache()
      System.gc()
      listener.reset()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      // execute the physical plan AS PLANNED and count its rows: a
      // df.count() would let Catalyst prune every computed column out of
      // pure-projection operators (BPE encode would degrade to a parquet
      // row count answered from footer metadata)
      val rows = df.queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the async listener bus drain task events
      Obs(dt, rows, listener.maxBytes.get() / 1048576.0)
    }

    var failed = List.empty[String]
    val rows = ops.map { op =>
      configure(op, 1)
      val o1 = run(op, d1.getPath)
      configure(op, r)
      val oR = run(op, dR.getPath)
      def ratio(a: Double, b: Double): Double = if (a > 0) b / a else -1
      val tR = ratio(o1.sec, oR.sec)
      val rowsR = ratio(o1.rows.toDouble, oR.rows.toDouble)
      val taskR = ratio(math.max(o1.maxTaskMb, 1.0), math.max(oR.maxTaskMb, 1.0))
      // near-linear bounds: rows/time within 3x of proportional; the
      // biggest single task must not grow with corpus size beyond 1.5x
      // proportional (balanced plans keep it ~flat)
      if (rowsR > 3.0 * r) failed ::= s"$op rows blow-up: x$rowsR"
      if (tR > 3.0 * r) failed ::= s"$op time blow-up: x$tR"
      if (taskR > 1.5 * r) failed ::= s"$op single-task hot spot: x$taskR"
      System.err.println(f"[stress] $op%-24s 1x: ${o1.sec}%6.2fs ${o1.rows}%8d rows " +
        f"${o1.maxTaskMb}%7.1fMB | ${r}x: ${oR.sec}%6.2fs ${oR.rows}%8d rows " +
        f"${oR.maxTaskMb}%7.1fMB | ratios t=$tR%4.1f rows=$rowsR%4.1f task=$taskR%4.1f")
      s""""$op":{"sec_1x":${o1.sec},"sec_${r}x":${oR.sec},"time_ratio":$tR,""" +
        s""""rows_1x":${o1.rows},"rows_${r}x":${oR.rows},"rows_ratio":$rowsR,""" +
        s""""max_task_in_mb_1x":${o1.maxTaskMb},"max_task_in_mb_${r}x":${oR.maxTaskMb},""" +
        s""""max_task_ratio":$taskR}"""
    }
    val line = s"""{"metric":"stress","replication":$r,"sf":"$sfDir",""" +
      s""""operators":{${rows.mkString(",")}},""" +
      s""""failed":[${failed.map(f => "\"" + f + "\"").mkString(",")}]}"""
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
