package graft

import org.apache.spark.sql.SparkSession

/** Multi-executor smoke arm: runs the headline + scale-family queries
  * under `local-cluster[2,16,4096]` — TWO real executor JVMs with their
  * own heaps and classloaders — to catch single-JVM assumptions that
  * `local[32]` can never see (driver-registry lookups from executors,
  * non-serializable closures, localCheckpoint lifetimes, broadcast
  * sizes). This is the arm that forced the REST partition to carry a
  * serializable endpoint spec instead of relying on the driver registry.
  *
  * Launched as its own JVM (one SparkContext per JVM; Bench forks it and
  * embeds the result as the `cluster_smoke` block). Assertion level is
  * rows>0 + no exception per query — the value oracle runs in the
  * driver's sf0.01 gate; this arm proves the EXECUTION SHAPE survives
  * real executor boundaries.
  */
object ClusterSmoke {

  /** headline batch queries + the stress scale family + the federation
    * queries whose connectors exercise executor-side readers. */
  val ops: Seq[String] = (Seq(
    "q1_agg", "q3_shipping", "q5_local_supplier", "q_scan_project",
    "q_topk", "q_join_inner", "q_group_having", "q_window_running",
    "q_curation_pack", "q_text_lm_score", "q_sessionize",
    // executor-side connector readers (REST and Mongo go over the socket
    // from the executor JVMs; csv/json exercise the file reader factory)
    "q_src_rest", "q_src_join_hetero", "q_src_csv_pushdown",
    "q_src_mongo_find", "q_src_cql_key", "q_src_bq_wire", "q_src_ds_query",
    "q_src_bt_range", "q_src_es_query", "q_src_kube",
    // r11: the PIT deep-page scan crosses REAL JVM boundaries here — the
    // point-in-time is opened on the DRIVER and its id ships inside the
    // serialized partitions to executor JVMs, which page it over TCP;
    // Mongo rides OP_COMPRESSED from the executor side
    "q_src_es_deep_page", "q18_large_orders",
    // r12: the streaming anomaly runs its RocksDB/HDFS-backed state store
    // ON THE EXECUTORS — keyed state partitions live in executor JVMs and
    // checkpoint under the driver's dir; keywords exercises the broadcast
    // df join + WindowGroupLimit exchange across real JVM boundaries
    "q_stream_anomaly", "q_text_keywords",
    // r13: the SegmentQL filterql statement compiles on the driver and
    // ships inside serialized partitions to executor-side HTTP readers;
    // phash near-dup runs its band self-join across real exchanges, with
    // the decode (ImageIO/stub + md5 + phash) inside executor JVMs;
    // fix_text exercises a round-13 native expression under codegen on
    // executors
    "q_src_rest_filterql", "q_media_phash_neardup", "q_text_fix_encoding",
    // r14: the wire-pushdown growth spurt across REAL JVM boundaries —
    // runtime $in semi-join reduction (the dim's keys broadcast then
    // flow back into executor-side Mongo readers), $lookup join and
    // aggregate pipelines, composite after_key paging from executors,
    // CQL GROUP BY over token-range fan-out, the Datastore aggregation
    // query, skip-paged reads, and the audio/video perceptual near-dups
    "q_src_join_dynfilter", "q_src_join_lookup", "q_src_mongo_agg",
    "q_src_es_agg_multi", "q_src_cql_agg", "q_src_ds_agg",
    "q_src_mongo_skip", "q_audio_fp_neardup", "q_video_phash_neardup",
    "q_text_hybrid_rrf", "q_ann_ivf_incremental",
    // r15: the ordered-window matrix across real JVM boundaries — BQ
    // joined statements paged from executor readers, Mongo outer
    // $lookup, runtime reducers on CQL/BT, the Datastore fully-delegated
    // window, the CQL single-partition ORDER BY, the BigTable reversed
    // scan, and the ES early-terminated ordered composite
    "q_src_join_bq", "q_src_join_bq_topn", "q_src_join_lookup_left",
    "q_src_cql_dynfilter", "q_src_bt_dynfilter", "q_src_bq_dynfilter",
    "q_src_ds_window", "q_src_cql_topn", "q_src_bt_topn",
    "q_src_es_topn", "q_src_es_agg_topn",
    // scale family
    "q_dedup_minhash_lsh", "q_dedup_clusters", "q_dedup_incremental",
    "q_kmeans", "q_curation_domain_cap", "q_text_bpe_encode",
    "q_embed_covariance", "q_dedup_semantic", "q_dedup_blocks",
    "q_embed_pca", "q_text_cms", "q_curation_shards", "q_curation_dsir",
    "q_curation_quality_band", "q_dedup_minhash_eval", "q_graph_pagerank",
    "q_dedup_spans")).distinct

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")
    val master = sys.env.getOrElse("SPARK_GRAFT_SMOKE_MASTER", "local-cluster[2,16,4096]")
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.executor.extraClassPath",
        // executors are separate JVMs: they need the graft classes from
        // wherever THIS class actually loaded (works for a classes dir
        // or a fat jar; no build layout hardcoded)
        Option(ClusterSmoke.getClass.getProtectionDomain.getCodeSource)
          .map(cs => new java.io.File(cs.getLocation.toURI).getAbsolutePath)
          .getOrElse(new java.io.File(sys.props("user.dir"),
            "target/scala-2.13/classes").getAbsolutePath))
      .config("spark.sql.session.timeZone", "UTC")
      // DSv2 same-server join pushdown (Mongo $lookup, BQ statement render)
      // is harness-level session config, not per-query mutation — set once
      // here so query builders never leak plan-changing conf into the
      // shared session (ADVICE r14)
      .config("spark.sql.optimizer.datasourceV2JoinPushdown", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var errors = List.empty[(String, String)]
    val times = ops.map { name =>
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val n = df.queryExecution.toRdd.count()
        if (n == 0) errors ::= (name -> "returned 0 rows")
        spark.catalog.clearCache()
        name -> (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        errors ::= (name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
        name -> -1.0
      }
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val line = s"""{"metric":"cluster_smoke","master":${jstr(master)},""" +
      s""""sf":${jstr(sfDir)},"executors":2,""" +
      s""""queries":{${times.map { case (k, v) => jstr(k) + ":" + v }.mkString(",")}},""" +
      s""""errors":{${errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString(",")}},""" +
      s""""n_failed":${errors.size}}"""
    println(line)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.props("user.dir"), "target", "CLUSTER_SMOKE.json"),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
    // explicit exit: standalone-worker/loopback helper threads must not
    // keep the forked smoke JVM alive after the sweep
    sys.exit(if (errors.nonEmpty) 1 else 0)
  }
}
