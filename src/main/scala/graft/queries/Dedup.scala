package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{GQuery, Tables}
import graft.functions.HashFunctions._

/** Deduplication operators over the `documents` table — the LLM-training-
  * data-pipeline surface (beyond-reference; BASELINE north star).
  *
  * All hashing is the cross-engine arithmetic defined in
  * graft.functions.TextHash, so even the sketch-based operators carry full
  * DuckDB value oracles. Shared SQL fragments for the oracles live in
  * OracleFragments.
  *
  * Scale design (100 TB):
  *   - signatures are computed per-row in one codegen'd pass (no shuffle);
  *   - LSH banding turns the O(N²) pair space into an equi-join on
  *     (band, band_hash) — shuffle keyed by bucket, the standard scalable
  *     near-dup layout; skewed buckets are bounded because a bucket only
  *     forms pairs within itself (cap/salt if a bucket explodes);
  *   - exact n-gram Jaccard uses an inverted index join with a document-
  *     frequency cutoff so hyper-common shingles never quadratically blow
  *     up the join (the cutoff is part of the operator's semantics and is
  *     mirrored in the oracle).
  */
object Dedup {

  private val K = 64  // minhash permutations
  private val B = 16  // LSH bands
  private val R = 4   // rows per band (K = B * R)

  /** doc_id + minhash signature, one codegen'd projection. */
  private def signatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), min_hash_sig(col("text"), K, 3).as("sig"))

  /** (doc_id, band, band_hash) — K/R buckets per doc. */
  private def bandBuckets(sigs: DataFrame): DataFrame = {
    val bandCols = (0 until B).map(b => band_hash(col("sig"), b * R, R))
    sigs.select(col("doc_id"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bh")
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
      OracleFragments.minhashLshPairs) { (s, d) =>
      val sigs = signatures(Tables.load(s, d, "documents"))
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
            b => b)) / lit(K.toDouble))
        .filter(col("est_j") >= 0.5)
        .select(col("doc_a"), col("doc_b"), round(col("est_j"), 4).as("est_j"))
        .orderBy("doc_a", "doc_b")
    },

    GQuery(
      "q_simhash_values",
      OracleFragments.simhashValues) { (s, d) =>
      Tables.load(s, d, "documents")
        .select(col("doc_id"), sim_hash64(col("text")).as("simhash"))
        .orderBy("doc_id")
    },

    GQuery(
      "q_dedup_simhash",
      OracleFragments.simhashPairs) { (s, d) =>
      val sims = Tables.load(s, d, "documents")
        .select(col("doc_id"), sim_hash64(col("text")).as("simhash"))
      // 4 bands of 15 bits: pairs within hamming 3 must agree on >= 1 band
      val chunks = sims.select(col("doc_id"), col("simhash"),
          posexplode(array((0 until 4).map(c =>
            shiftright(col("simhash"), c * 15).bitwiseAND(lit(32767L))): _*)))
        .withColumnRenamed("pos", "chunk")
        .withColumnRenamed("col", "cv")
      val a = chunks.toDF("doc_a", "sim_a", "chunk_a", "cv_a")
      val b = chunks.toDF("doc_b", "sim_b", "chunk_b", "cv_b")
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
      OracleFragments.ngramJaccardPairs) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      // distinct 3-gram shingle hashes per doc (compact long join keys)
      val sets = signaturesNgrams(docs)
      val inv = sets.select(col("doc_id"), explode(col("hh")).as("h"))
      // document-frequency cutoff: hyper-common shingles are dropped from
      // the index (and from set sizes) before the pair join
      val rare = inv.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 100).select("h")
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
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    }
  )

  /** distinct 3-gram shingle poly-hashes per doc. */
  private def signaturesNgrams(docs: DataFrame): DataFrame = {
    import graft.functions.HashFunctions.poly_hash
    // shingle strings via the same TextHash tokenization, then hash:
    // implemented as a single expression chain — tokenize/shingle in SQL
    // higher-order functions would re-implement TextHash subtly differently,
    // so reuse the expression (min_hash_sig path) semantics via ShingleHashes
    docs.select(col("doc_id"),
      array_distinct(graft.functions.HashFunctions.shingle_hashes(col("text"), 3))
        .as("hh"))
  }
}
