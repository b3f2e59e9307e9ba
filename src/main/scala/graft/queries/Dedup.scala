package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GQuery, Tables}
import graft.functions.HashFunctions

/** Deduplication operators over the `documents` table — the LLM-training-
  * data-pipeline surface (beyond-reference; BASELINE north star).
  *
  * All hashing is the cross-engine arithmetic defined in
  * graft.functions.TextHash, so even the sketch-based operators carry full
  * DuckDB value oracles. The oracle SQL lives in OracleFragments.
  *
  * Scale design (100 TB):
  *   - signatures are computed per-row in one codegen'd pass (no shuffle);
  *   - LSH banding turns the O(N²) pair space into an equi-join on
  *     (band, band_hash) — shuffle keyed by bucket, the standard scalable
  *     near-dup layout;
  *   - skew guard: buckets larger than CAP docs are dropped before the pair
  *     join (a degenerate bucket — e.g. empty documents — would otherwise
  *     produce O(n²) pairs). The hot-bucket list is tiny, so the anti-join
  *     broadcasts. The cap is part of the operator's semantics and is
  *     mirrored in the oracle;
  *   - exact n-gram Jaccard uses an inverted-index join with a document-
  *     frequency cutoff so hyper-common shingles never quadratically blow
  *     up the join (also mirrored in the oracle);
  *   - cluster resolution is iterated hash-to-min label propagation
  *     (O(log diameter) rounds, each a shuffle-join), not a driver-side
  *     graph walk; per-round lineage is cut with localCheckpoint.
  */
object Dedup {

  private val K = 64       // minhash permutations
  private val B = 16       // LSH bands
  private val R = 4        // rows per band (K = B * R)
  private val CAP = 32     // hot-bucket cap (skew guard)
  private val MAX_DF = 100 // n-gram document-frequency cutoff

  /** doc_id + minhash signature, one codegen'd projection. */
  private def signatures(s: SparkSession, docs: DataFrame): DataFrame = {
    HashFunctions.ensure(s)
    docs.select(col("doc_id"), HashFunctions.min_hash_sig(col("text"), K, 3).as("sig"))
  }

  /** (doc_id, band, bh) — B buckets per doc, hot buckets dropped (skew
    * guard): bucket sizes via partial-agg groupBy, oversized keys removed
    * with a broadcast anti-join. */
  private def bandBuckets(sigs: DataFrame): DataFrame = {
    val bandCols = (0 until B).map(b => HashFunctions.band_hash(col("sig"), b * R, R))
    val raw = sigs.select(col("doc_id"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bh")
    val hot = raw.groupBy("band", "bh").count().filter(col("count") > CAP)
      .select("band", "bh")
    raw.join(broadcast(hot), Seq("band", "bh"), "left_anti")
      .select("doc_id", "band", "bh")
  }

  /** LSH candidate pairs with exact signature-agreement estimate. */
  private def lshPairs(s: SparkSession, d: String): DataFrame = {
    val sigs = signatures(s, Tables.load(s, d, "documents"))
    val buckets = bandBuckets(sigs)
    val a = buckets.toDF("doc_a", "band_a", "bh_a")
    val b = buckets.toDF("doc_b", "band_b", "bh_b")
    val cand = a.join(b,
        col("band_a") === col("band_b") && col("bh_a") === col("bh_b") &&
          col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val sa = sigs.toDF("doc_a", "sig_a")
    val sb = sigs.toDF("doc_b", "sig_b")
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("est_j",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          m => m)) / lit(K.toDouble))
      .filter(col("est_j") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("est_j"))
  }

  /** Connected components over a pair list via hash-to-min label
    * propagation: each round every node takes the min label in its
    * neighborhood; converges in O(log diameter) rounds. The per-round
    * count() is a scalar convergence check, not a data collect. */
  private[queries] def connectedComponents(
      nodes: DataFrame, pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(true)
    var lbl = nodes.select(col("doc_id"), col("doc_id").as("cluster_id"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = edges.join(lbl.withColumnRenamed("doc_id", "src"), "src")
        .groupBy(col("dst").as("doc_id"))
        .agg(min("cluster_id").as("nbr_min"))
      val next = lbl.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"))
        .localCheckpoint(true)
      converged = next.join(lbl.withColumnRenamed("cluster_id", "prev"), "doc_id")
        .filter(col("cluster_id") =!= col("prev")).isEmpty
      lbl = next
      i += 1
    }
    lbl
  }

  val queries: Seq[GQuery] = Seq(

    GQuery(
      "q_dedup_exact",
      """SELECT md5(text) AS text_md5, count(*) AS n_docs,
        |       min(doc_id) AS keep_doc
        |FROM documents GROUP BY md5(text)
        |ORDER BY text_md5""".stripMargin) { (s, d) =>
      Tables.load(s, d, "documents")
        .groupBy(md5(col("text")).as("text_md5"))
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_doc"))
        .orderBy("text_md5")
    },

    GQuery(
      "q_dedup_minhash_lsh",
      OracleFragments.minhashLshPairs(CAP)) { (s, d) =>
      lshPairs(s, d).orderBy("doc_a", "doc_b")
    },

    GQuery(
      "q_dedup_clusters",
      OracleFragments.minhashLshClusters(CAP)) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      connectedComponents(docs, lshPairs(s, d)).orderBy("doc_id")
    },

    GQuery(
      "q_simhash_values",
      OracleFragments.simhashValues) { (s, d) =>
      HashFunctions.ensure(s)
      Tables.load(s, d, "documents")
        .select(col("doc_id"), HashFunctions.sim_hash64(col("text")).as("simhash"))
        .orderBy("doc_id")
    },

    GQuery(
      "q_dedup_simhash",
      OracleFragments.simhashPairs(CAP)) { (s, d) =>
      HashFunctions.ensure(s)
      val sims = Tables.load(s, d, "documents")
        .select(col("doc_id"), HashFunctions.sim_hash64(col("text")).as("simhash"))
      // 4 bands of 15 bits: pairs within hamming 3 must agree on >= 1 band
      val chunks = sims.select(col("doc_id"), col("simhash"),
          posexplode(array((0 until 4).map(c =>
            shiftright(col("simhash"), c * 15).bitwiseAND(lit(32767L))): _*)))
        .withColumnRenamed("pos", "chunk")
        .withColumnRenamed("col", "cv")
      val hot = chunks.groupBy("chunk", "cv").count().filter(col("count") > CAP)
        .select("chunk", "cv")
      val ok = chunks.join(broadcast(hot), Seq("chunk", "cv"), "left_anti")
        .select("doc_id", "simhash", "chunk", "cv")
      val a = ok.toDF("doc_a", "sim_a", "chunk_a", "cv_a")
      val b = ok.toDF("doc_b", "sim_b", "chunk_b", "cv_b")
      a.join(b, col("chunk_a") === col("chunk_b") &&
          col("cv_a") === col("cv_b") && col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    },

    GQuery(
      "q_dedup_ngram_jaccard",
      OracleFragments.ngramJaccardPairs(MAX_DF)) { (s, d) =>
      HashFunctions.ensure(s)
      val docs = Tables.load(s, d, "documents")
      // distinct 3-gram shingle hashes per doc (compact long join keys)
      val sets = docs.select(col("doc_id"),
        array_distinct(HashFunctions.shingle_hashes(col("text"), 3)).as("hh"))
      val inv = sets.select(col("doc_id"), explode(col("hh")).as("h"))
      // document-frequency cutoff: hyper-common shingles are dropped from
      // the index (and from set sizes) before the pair join
      val rare = inv.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") <= MAX_DF).select("h")
      val inv2 = inv.join(rare, "h")
      val sizes = inv2.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val ai = inv2.toDF("h", "doc_a")
      val bi = inv2.toDF("h2", "doc_b")
      val inter = ai.join(bi, col("h") === col("h2") && col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
      inter
        .join(sizes.toDF("doc_a", "sz_a"), "doc_a")
        .join(sizes.toDF("doc_b", "sz_b"), "doc_b")
        .withColumn("jaccard",
          col("n_inter") / (col("sz_a") + col("sz_b") - col("n_inter")))
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .orderBy("doc_a", "doc_b")
    }
  )
}
