package graft.queries

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  *   - signatures are computed per-row in one codegen'd pass (no shuffle)
  *     and persisted — the corpus-wide projection runs once, not once per
  *     downstream consumer;
  *   - LSH banding turns the O(N²) pair space into an equi-join on
  *     (band, band_hash) — shuffle keyed by bucket, the standard scalable
  *     near-dup layout;
  *   - skew guard: buckets larger than CAP docs emit a *sorted consecutive
  *     chain* of pairs (O(n) pairs, connectivity preserved) instead of all
  *     O(n²) pairs. Dropping hot buckets outright would silently lose
  *     exactly the duplicate families dedup exists for (boilerplate >CAP
  *     copies); chaining keeps every family connected while bounding the
  *     join blow-up. The rule is part of the operator's semantics and is
  *     mirrored in the oracle;
  *   - exact n-gram Jaccard uses an inverted-index join with a document-
  *     frequency cutoff so hyper-common shingles never quadratically blow
  *     up the join (also mirrored in the oracle);
  *   - cluster resolution is an RDD loop of min-label propagation with
  *     path-halving (label-of-label), co-partitioned by a fixed
  *     HashPartitioner so the per-round joins never reshuffle; persist()
  *     (lineage-backed, fault-tolerant — unlike localCheckpoint) caches
  *     each round and unpersists the superseded one.
  */
object Dedup {

  private val K = graft.functions.TextHash.SigK // minhash permutations
  private val B = 16       // LSH bands
  private val R = 4        // rows per band
  // banding must consume the WHOLE signature: a SigK drift with stale
  // B·R would silently ignore part of every signature (weakened recall,
  // no error anywhere) — fail at class-load instead
  require(K == B * R, s"LSH banding K=$K != B*R=${B * R}")
  private[queries] val CAP = 32     // hot-bucket cap (skew guard -> chain pairs)
  private val MAX_DF = 100 // n-gram document-frequency cutoff
  private val BlockW = 8L  // sub-document dedup block width (tokens)
  private val SpanW = 6L   // sliding duplicated-span window width (tokens)

  /** doc_id + minhash signature, one codegen'd projection. */
  private def signatures(s: SparkSession, docs: DataFrame): DataFrame = {
    HashFunctions.ensure(s)
    docs.select(col("doc_id"), HashFunctions.min_hash_sig(col("text"), K, 3).as("sig"))
  }

  /** Candidate pairs from bucketed co-occurrence with the hot-bucket chain
    * rule: cold buckets (≤ cap) emit all pairs; hot buckets emit the
    * consecutive chain of their doc_id-sorted members. `rows` must have
    * columns (doc_id, k1, k2) where (k1, k2) is the bucket key. */
  private[graft] def cappedBucketPairs(rows: DataFrame, cap: Int): DataFrame = {
    // NOT persisted (r16 A/B): both union arms consume the sized bucket
    // table, but they share the (k1, k2) window's shuffle via Spark's
    // ReusedExchange — an explicit persist replaced that nearly-free
    // reuse with a cache materialization and measured 1.10–1.27×
    // REGRESSIONS on q_dedup_minhash_lsh / q_dedup_simhash; reverted.
    val sized = rows.withColumn("bn",
      count(lit(1)).over(Window.partitionBy("k1", "k2")))
    val cold = sized.filter(col("bn") <= cap)
    val a = cold.select(col("k1"), col("k2"), col("doc_id").as("doc_a"))
    val b = cold.select(col("k1").as("k1b"), col("k2").as("k2b"),
      col("doc_id").as("doc_b"))
    val coldPairs = a.join(b,
        col("k1") === col("k1b") && col("k2") === col("k2b") &&
          col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    val chainPairs = sized.filter(col("bn") > cap)
      .withColumn("doc_b", lead("doc_id", 1).over(
        Window.partitionBy("k1", "k2").orderBy("doc_id")))
      .filter(col("doc_b").isNotNull)
      .select(col("doc_id").as("doc_a"), col("doc_b"))
    coldPairs.union(chainPairs).distinct()
  }

  /** (doc_id, band, bh) exploded LSH buckets. */
  private def bandBuckets(sigs: DataFrame): DataFrame = {
    val bandCols = (0 until B).map(b => HashFunctions.band_hash(col("sig"), b * R, R))
    sigs.select(col("doc_id"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bh")
  }

  /** LSH candidate pairs with exact signature-agreement estimate, over an
    * arbitrary documents frame (exposed for the >CAP-family spec). */
  private[graft] def lshPairsFor(s: SparkSession, docs: DataFrame): DataFrame = {
    val sigs = signatures(s, docs).persist(StorageLevel.MEMORY_AND_DISK)
    val buckets = bandBuckets(sigs)
      .select(col("doc_id"), col("band").as("k1"), col("bh").as("k2"))
    val cand = cappedBucketPairs(buckets, CAP)
    val sa = sigs.toDF("doc_a", "sig_a")
    val sb = sigs.toDF("doc_b", "sig_b")
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("est_j",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          m => m)) / lit(K.toDouble))
      .filter(col("est_j") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("est_j"))
  }

  private[queries] def lshPairs(s: SparkSession, d: String): DataFrame =
    lshPairsFor(s, Tables.load(s, d, "documents"))

  /** Confusion rollup of a predicted pair set against a ground-truth pair
    * set (both with doc_a/doc_b columns): TP/FP/FN and precision/recall
    * in integer basis points, one row. Exposed for the planted-divergence
    * spec — the live gate's two sets coincide on this corpus, so the
    * arithmetic is pinned separately on sets that genuinely differ. */
  private[graft] def pairSetEval(predPairs: DataFrame, truthPairs: DataFrame): DataFrame = {
    val pred = predPairs.select(col("doc_a"), col("doc_b"), lit(1).as("p"))
    val truth = truthPairs.select(col("doc_a"), col("doc_b"), lit(1).as("t"))
    pred.join(truth, Seq("doc_a", "doc_b"), "full")
      .agg(count(col("p")).as("n_pred"), count(col("t")).as("n_truth"),
        count(when(col("p").isNotNull && col("t").isNotNull, lit(1))).as("tp"))
      .select(col("n_pred"), col("n_truth"), col("tp"),
        (col("n_pred") - col("tp")).as("fp"),
        (col("n_truth") - col("tp")).as("fn"),
        round(lit(10000.0) * col("tp") / nullif(col("n_pred"), lit(0)))
          .cast("long").as("precision_bp"),
        round(lit(10000.0) * col("tp") / nullif(col("n_truth"), lit(0)))
          .cast("long").as("recall_bp"))
  }

  /** Exact n-gram Jaccard pairs (jaccard >= 0.5) via an inverted-index
    * join with the MAX_DF document-frequency cutoff — shared by the
    * q_dedup_ngram_jaccard gate and the sketch-vs-exact eval. */
  private[graft] def exactJaccardPairs(s: SparkSession, d: String): DataFrame = {
    HashFunctions.ensure(s)
    val docs = Tables.load(s, d, "documents")
    // distinct 3-gram shingle hashes per doc (compact long join keys)
    val sets = docs.select(col("doc_id"),
      array_distinct(HashFunctions.shingle_hashes(col("text"), 3)).as("hh"))
    val inv = sets.select(col("doc_id"), explode(col("hh")).as("h"))
    // document-frequency cutoff: hyper-common shingles are dropped from
    // the index (and from set sizes) before the pair join. Computed as a
    // WINDOW count over h (r17, guide §2.3/2.4): the former groupBy(h)
    // agg + semi-join shape shuffled the exploded index twice (once into
    // the agg, once into the join) and needed `inv` persisted for its two
    // consumers; the window pays ONE hash(h) shuffle + sort, filters in
    // place, and leaves the shingle pass single-consumer (no inv cache).
    val inv2 = inv
      .withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("df") <= MAX_DF)
      .select(col("h"), col("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = inv2.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // SELF-JOIN kept deliberately (r16 A/B): the two join inputs are the
    // same cached frame, so the sort-merge join's both-side exchanges
    // collapse into ONE via ReusedExchange — a groupBy(h)+collect_list+
    // pair-explode rewrite (which wins for the broadcast-joined overlap
    // matrices, where no exchange reuse can fire) measured 1.23× SLOWER
    // here: it traded the reused shuffle for an ObjectHashAggregate.
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
  }

  /** Exact n-gram Jaccard pairs (jaccard >= 0.5) via PREFIX FILTERING
    * (the AllPairs / PPJoin candidate-generation family) — the same
    * contract as [[exactJaccardPairs]] (identical output, shared oracle)
    * computed with the index layout a 100 TB corpus actually needs.
    *
    * The inverted-index join above pairs every pair of docs sharing ANY
    * surviving shingle; prefix filtering pairs only docs sharing one of
    * their RAREST few shingles:
    *   - canonical token order: global document frequency ascending
    *     (ties by hash) — identical for every doc, so set overlap is
    *     order-aligned;
    *   - a doc of |set|=sz only indexes its first
    *     p = sz - ceil(tau*sz) + 1 tokens (p = sz/2+1 at tau=0.5): two
    *     sets with J >= tau MUST collide inside their prefixes
    *     (pigeonhole on the required overlap), so recall is exact;
    *   - length filter in the join condition (tau <= |a|/|b| <= 1/tau)
    *     and PPJoin's positional filter (tokens remaining after the
    *     colliding position must cover the required overlap
    *     ceil(tau/(1+tau)*(sz_a+sz_b))) prune before the distinct;
    *   - only surviving candidates are verified against the full sets.
    *
    * Scale (100 TB): the index shrinks ~2x, but the decisive property is
    * WHICH tokens index — rarest-first prefixes put candidate generation
    * on the smallest buckets, so the hyper-common-shingle blow-up the
    * MAX_DF cutoff guards against structurally cannot occur in the
    * candidate join (a token common enough to be hot is in nobody's
    * prefix). The DF table is a map-side-combined aggregate; the
    * verification join touches candidate pairs only, never the corpus
    * pair space. DedupSpec proves frame equality with the inverted-index
    * arm; the gate shares its oracle. */
  private[graft] def prefixFilterPairs(s: SparkSession, d: String): DataFrame = {
    HashFunctions.ensure(s)
    val docs = Tables.load(s, d, "documents")
    val inv = docs.select(col("doc_id"),
        explode(array_distinct(HashFunctions.shingle_hashes(col("text"), 3))).as("h"))
    // per-doc token list in canonical (df asc, h asc) order + filtered
    // size. The document frequency rides a WINDOW count over h (r17,
    // guide §2.3/2.4) instead of a groupBy(h) agg + join back: one
    // hash(h) shuffle instead of two over the exploded index, and the
    // shingle pass becomes single-consumer (no inv persist).
    val docToks = inv
      .withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("df") <= MAX_DF)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("ts"))
      .select(col("doc_id"),
        transform(col("ts"), t => t.getField("h")).as("arr"),
        size(col("ts")).cast("long").as("sz"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // prefix index: first sz - ceil(tau*sz) + 1 tokens, 0-based positions
    val pre = docToks.select(col("doc_id"), col("sz"),
      posexplode(slice(col("arr"), lit(1),
        (col("sz") - ceil(col("sz") * lit(0.5)) + lit(1)).cast("int"))))
    // SELF-JOIN kept deliberately (r17 A/B, the ngram_jaccard story again):
    // a hybrid groupBy(h)+sorted-collect_list+pair-comprehension rewrite
    // (≤K groups explode ordered pairs, >K fall back to this join) measured
    // 1.75s → 4.94s (2.8× SLOWER) in alternating filtered A/B — the
    // ObjectHashAggregate + per-pair struct allocation costs far more than
    // the SMJ whose both-side exchanges ReusedExchange already collapses.
    // Note the per-group state of THIS join is already bounded by
    // construction: a prefix token's group size ≤ its document frequency
    // ≤ MAX_DF (the cutoff runs before the prefix index is built).
    val pa = pre.toDF("doc_a", "sz_a", "pos_a", "h")
    val pb = pre.toDF("doc_b", "sz_b", "pos_b", "h2")
    val reqOverlap = ceil((col("sz_a") + col("sz_b")) * lit(0.5 / 1.5))
    val cand = pa.join(pb,
        col("h") === col("h2") && col("doc_a") < col("doc_b") &&
          // length filter: tau*|a| <= |b| and tau*|b| <= |a| (tau = 0.5)
          col("sz_a") * 2 >= col("sz_b") && col("sz_b") * 2 >= col("sz_a") &&
          // positional filter: tokens at/after the colliding position
          // (order-aligned on both sides) must reach the required overlap
          least(col("sz_a") - col("pos_a"), col("sz_b") - col("pos_b")) >= reqOverlap)
      .select(col("doc_a"), col("doc_b")).distinct()
    // exact verification on candidates only
    val va = docToks.toDF("doc_a", "arr_a", "sza")
    val vb = docToks.toDF("doc_b", "arr_b", "szb")
    cand.join(va, "doc_a").join(vb, "doc_b")
      .withColumn("n_inter",
        size(array_intersect(col("arr_a"), col("arr_b"))).cast("long"))
      .withColumn("jaccard",
        col("n_inter") / (col("sza") + col("szb") - col("n_inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Connected components over a pair list: iterated min-label propagation
    * with path-halving (each round also adopts the label of the current
    * label), which converges in O(log diameter) rounds — plain
    * neighborhood-min alone is O(diameter).
    *
    * Implemented as an RDD loop co-partitioned by a fixed HashPartitioner:
    * every per-round join is narrow (no reshuffle), each round's labels are
    * persisted and the superseded round unpersisted, and persist() is
    * lineage-backed so executor loss recomputes instead of failing the job.
    * Throws if maxIter rounds do not converge — a silent exit would return
    * wrong clusters. */
  private[graft] def connectedComponents(
      nodes: DataFrame, pairs: DataFrame, maxIter: Int = 20,
      localThreshold: Long = 1L << 20): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    // Size the loop's partitioning to the candidate-pair count, not the
    // cluster default: each round launches ~6 stages, so 32 partitions of
    // a few hundred pairs is pure task-scheduling overhead, while at
    // 100 TB the same formula scales the loop out with the pair volume.
    // The count also materializes the persisted pair frame once, so the
    // LSH computation feeding it never re-runs inside the loop.
    val pairsP = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    val nPairs = pairsP.count()
    // Hybrid localization (the AQE idea applied to the CC loop): a pair
    // list under the threshold (~16 MB at 1M pairs) is exact union-find
    // on the driver — one job instead of ~6 stages × rounds. The
    // distributed loop below is the scale path; the skew-guarded pair
    // lists are O(corpus) so at 100 TB the threshold routes there.
    if (nPairs <= localThreshold) {
      val edges = pairsP
        .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
        .as[(Long, Long)].collect()
      pairsP.unpersist(blocking = false)
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(if (ra < rb) rb else ra) = math.min(ra, rb)
      }
      // root = min member by construction (always link larger under smaller)
      val labels = edges.iterator.flatMap(e => Iterator(e._1, e._2))
        .toSeq.distinct.map(d => (d, find(d)))
      val connected = spark.createDataFrame(labels).toDF("doc_id", "cluster_id")
      return nodes.select(col("doc_id").cast("long").as("doc_id"))
        .join(broadcast(connected), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    }
    val nPart = math.max(2, math.min(spark.sparkContext.defaultParallelism,
      (nPairs / 50000L).toInt + 1))
    val part = new HashPartitioner(nPart)

    val edges: RDD[(Long, Long)] = pairsP
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .as[(Long, Long)].rdd
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Iterate only over the pair-connected subgraph: singletons (the vast
    // majority of a corpus — they have no near-duplicate) can never change
    // label, so they are joined back as their own cluster at the end
    // instead of riding every round. Seed label = min(self, neighbors),
    // which is round one for free.
    var lbl: RDD[(Long, Long)] = edges
      .reduceByKey(part, math.min(_: Long, _: Long))
      .mapPartitions(_.map { case (k, v) => (k, math.min(k, v)) },
        preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)

    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // min label over the neighborhood (map-side combine via reduceByKey)
      val nbrMin = edges.join(lbl)
        .map { case (_, (dst, c)) => (dst, c) }
        .reduceByKey(part, math.min(_: Long, _: Long))
      // carry the old label alongside the stepped one so convergence is
      // detected by an accumulator during materialization — no extra
      // compare-join + job per round
      val halved = lbl.leftOuterJoin(nbrMin, part)
        .mapValues { case (c, o) => (c, math.min(c, o.getOrElse(c))) }
      val stepped = halved.mapValues(_._2)
      // path halving: follow the label pointer one hop (label of label)
      val viaParent = stepped.map { case (d, c) => (c, d) }
        .join(stepped, part)
        .map { case (_, (d, cc)) => (d, cc) }
        .reduceByKey(part, math.min(_: Long, _: Long))
      val changedAcc = spark.sparkContext.longAccumulator("cc_changed")
      val next = halved.leftOuterJoin(viaParent, part)
        .mapValues { case ((old, c), o) =>
          val f = math.min(c, o.getOrElse(c))
          if (f != old) changedAcc.add(1L)
          f
        }
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize the round (and the accumulator) once
      converged = changedAcc.value == 0L
      lbl.unpersist(blocking = false)
      lbl = next
      i += 1
    }
    if (!converged) {
      edges.unpersist(blocking = false)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "raise maxIter; returning partial labels would be silently wrong")
    }
    edges.unpersist(blocking = false)
    val connected = lbl.toDF("doc_id", "cluster_id")
    nodes.select(col("doc_id").cast("long").as("doc_id"))
      .join(connected, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }

  val queries: Seq[GQuery] = Seq(

    // URL canonicalization + keep-best dedup — the FIRST dedup stage of a
    // web-crawl pipeline (upstream of any content hashing): messy crawl
    // URLs (scheme case, www., trailing slash, tracking params in any
    // order, fragments) are parsed and normalized to a canonical key, and
    // per key the highest-n_chars document survives (ties -> lowest
    // doc_id). The fixture builds each doc's messy URL deterministically
    // from (source, doc_id) so the ORACLE can derive the canonical form
    // INDEPENDENTLY from the parts — the Spark side must recover it by
    // actually parsing the assembled string (parse_url HOST/PATH/QUERY,
    // all codegen'd builtins).
    //
    // Scale: one parse/normalize projection (no shuffle) + one shuffle on
    // the canonical key; the keep-best argmax is a per-key window — the
    // same single-exchange layout as exact dedup. No pair enumeration.
    GQuery(
      "q_dedup_url",
      """WITH u AS (
        |  SELECT doc_id, n_chars,
        |         source || '.example.com/docs/' || (doc_id % 60) ||
        |         CASE WHEN doc_id % 4 = 0 THEN ''
        |              ELSE '?id=' || (doc_id % 60) END AS canonical_url
        |  FROM documents)
        |SELECT canonical_url, kept_doc, kept_chars, n_dups FROM (
        |  SELECT canonical_url, doc_id AS kept_doc, n_chars AS kept_chars,
        |         CAST(count(*) OVER (PARTITION BY canonical_url) AS BIGINT) AS n_dups,
        |         row_number() OVER (PARTITION BY canonical_url
        |                            ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM u) WHERE rn = 1
        |ORDER BY canonical_url""".stripMargin) { (s, d) =>
      val pid = (col("doc_id") % 60).cast("string")
      // the messy crawl URL: scheme/www/slash/fragment variants and
      // tracking params keyed off doc_id residues — every parse arm of
      // the canonicalizer is exercised across the corpus
      val messy = concat(
        element_at(typedLit(Seq("http", "https", "HTTPS")),
          (col("doc_id") % 3).cast("int") + 1),
        lit("://"),
        when(col("doc_id") % 2 === 0, "www.").otherwise(""),
        col("source"), lit(".Example.COM/docs/"), pid,
        when(col("doc_id") % 5 === 0, "/").otherwise(""),
        element_at(typedLit(Seq("", "?id=", "?utm_source=feed&id=",
          "?id=PID&utm_campaign=x&ref=tw")),
          (col("doc_id") % 4).cast("int") + 1),
        when(col("doc_id") % 4 === 1 || col("doc_id") % 4 === 2, pid).otherwise(""),
        when(col("doc_id") % 7 === 0, "#section-2").otherwise(""))
      // (the PID placeholder in arm 3 is substituted below — element_at
      // over a const array keeps the arm table readable)
      val url = regexp_replace(messy, lit("PID"), pid)
      // the canonicalizer under test: lowercase host, strip www., strip
      // the trailing slash, drop tracking params, sort what remains
      val host = regexp_replace(lower(parse_url(url, lit("HOST"))), "^www\\.", "")
      val path = regexp_replace(parse_url(url, lit("PATH")), "/$", "")
      val kept = array_join(array_sort(filter(
        split(coalesce(parse_url(url, lit("QUERY")), lit("")), "&"),
        p => p =!= "" && !p.startsWith("utm_") && !p.startsWith("ref=") &&
          !p.startsWith("fbclid") && !p.startsWith("gclid"))), "&")
      val canon = concat(host, path,
        when(kept === "", "").otherwise(concat(lit("?"), kept)))
      val w = Window.partitionBy("canonical_url")
      Tables.load(s, d, "documents")
        .select(col("doc_id"), col("n_chars"), canon.as("canonical_url"))
        .withColumn("n_dups", count(lit(1)).over(w))
        .withColumn("rn", row_number().over(
          w.orderBy(col("n_chars").desc, col("doc_id"))))
        .where(col("rn") === 1)
        .select(col("canonical_url"), col("doc_id").as("kept_doc"),
          col("n_chars").as("kept_chars"), col("n_dups"))
        .orderBy("canonical_url")
    },

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

    // Incremental ingestion dedup: a "daily batch" (doc_id ≡ 0 mod 5) is
    // checked against the existing corpus WITHOUT enumerating any old×old
    // pair — the operation a 100 TB corpus runs per ingest instead of
    // re-deduping the world. Per new doc:
    //   exact_dup  — md5 already present in the corpus;
    //   near_dup   — signature agreement ≥ 0.5 with an old doc found by
    //                probing the old side's LSH bucket index (cold buckets
    //                only, ≤ CAP old members);
    //   hot_bucket — landed in a bucket whose old population exceeds CAP:
    //                an already-well-represented boilerplate family,
    //                routed without pair enumeration;
    //   ingest     — none of the above.
    // In production the old-side bucket index and signatures are the
    // persisted artifacts of previous ingests; here they are derived in
    // the same plan from the corpus split.
    GQuery(
      "q_dedup_incremental",
      s"""WITH
         |${OracleFragments.minhashPerDoc},
         |br AS (
         |  SELECT doc_id, b,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT), sig[b*4+1:b*4+4]),
         |           (a,v) -> (a*31+v) % ${OracleFragments.P}) AS bh
         |  FROM sig CROSS JOIN (SELECT unnest(range(0, 16)) AS b) bb),
         |obr AS (SELECT * FROM br WHERE doc_id % 5 <> 0),
         |nbr AS (SELECT * FROM br WHERE doc_id % 5 = 0),
         |osz AS (SELECT b, bh, count(*) AS n FROM obr GROUP BY b, bh),
         |hot AS (
         |  SELECT DISTINCT n.doc_id FROM nbr n
         |  JOIN osz z ON n.b = z.b AND n.bh = z.bh AND z.n > $CAP),
         |cand AS (
         |  SELECT DISTINCT n.doc_id AS nid, o.doc_id AS oid FROM nbr n
         |  JOIN osz z ON n.b = z.b AND n.bh = z.bh AND z.n <= $CAP
         |  JOIN obr o ON o.b = n.b AND o.bh = n.bh),
         |near AS (
         |  SELECT DISTINCT c.nid AS doc_id FROM cand c
         |  JOIN sig sa ON sa.doc_id = c.nid
         |  JOIN sig sb ON sb.doc_id = c.oid
         |  WHERE len(list_filter(range(1, ${K + 1}), i -> sa.sig[i] = sb.sig[i])) / $K.0 >= 0.5),
         |ex AS (
         |  SELECT DISTINCT n.doc_id FROM documents n
         |  JOIN documents o ON md5(n.text) = md5(o.text) AND o.doc_id % 5 <> 0
         |  WHERE n.doc_id % 5 = 0)
         |SELECT d.doc_id,
         |       CAST(e.doc_id IS NOT NULL AS BIGINT) AS exact_dup,
         |       CAST(nr.doc_id IS NOT NULL AS BIGINT) AS near_dup,
         |       CAST(ht.doc_id IS NOT NULL AS BIGINT) AS hot_bucket,
         |       CAST(e.doc_id IS NULL AND nr.doc_id IS NULL
         |            AND ht.doc_id IS NULL AS BIGINT) AS ingest
         |FROM documents d
         |LEFT JOIN ex e ON e.doc_id = d.doc_id
         |LEFT JOIN near nr ON nr.doc_id = d.doc_id
         |LEFT JOIN hot ht ON ht.doc_id = d.doc_id
         |WHERE d.doc_id % 5 = 0
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      val isNew = col("doc_id") % 5 === 0
      val sigs = signatures(s, docs).persist(StorageLevel.MEMORY_AND_DISK)
      val bb = bandBuckets(sigs)
      val obr = bb.filter(col("doc_id") % 5 =!= 0)
      val nbr = bb.filter(col("doc_id") % 5 === 0)
      // the old side's bucket index: per-bucket population (the persisted
      // ingest artifact at scale)
      val osz = obr.groupBy("band", "bh").agg(count(lit(1)).as("n"))
      val hot = nbr.join(osz.filter(col("n") > CAP), Seq("band", "bh"))
        .select("doc_id").distinct()
      val cand = nbr.join(osz.filter(col("n") <= CAP), Seq("band", "bh"))
        .select(col("band"), col("bh"), col("doc_id").as("nid"))
        .join(obr.toDF("oid", "band", "bh"), Seq("band", "bh"))
        .select("nid", "oid").distinct()
      val near = cand
        .join(sigs.toDF("nid", "sig_a"), "nid")
        .join(sigs.toDF("oid", "sig_b"), "oid")
        .filter(size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), m => m)) / lit(K.toDouble) >= 0.5)
        .select(col("nid").as("doc_id")).distinct()
      val ex = docs.filter(isNew).select(col("doc_id"), md5(col("text")).as("h"))
        .join(docs.filter(!isNew).select(md5(col("text")).as("h")).distinct(), Seq("h"))
        .select("doc_id").distinct()
      docs.filter(isNew).select("doc_id")
        .join(ex.withColumn("e", lit(1L)), Seq("doc_id"), "left")
        .join(near.withColumn("nr", lit(1L)), Seq("doc_id"), "left")
        .join(hot.withColumn("ht", lit(1L)), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("e"), lit(0L)).as("exact_dup"),
          coalesce(col("nr"), lit(0L)).as("near_dup"),
          coalesce(col("ht"), lit(0L)).as("hot_bucket"),
          (col("e").isNull && col("nr").isNull && col("ht").isNull)
            .cast("long").as("ingest"))
        .orderBy("doc_id")
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
        .persist(StorageLevel.MEMORY_AND_DISK)
      // 4 bands of 15 bits: pairs within hamming 3 must agree on >= 1 band
      val chunks = sims.select(col("doc_id"), col("simhash"),
          posexplode(array((0 until 4).map(c =>
            shiftright(col("simhash"), c * 15).bitwiseAND(lit(32767L))): _*)))
        .withColumnRenamed("pos", "k1")
        .withColumnRenamed("col", "k2")
        .select("doc_id", "k1", "k2")
      val cand = cappedBucketPairs(chunks, CAP)
      val sa = sims.toDF("doc_a", "sim_a")
      val sb = sims.toDF("doc_b", "sim_b")
      cand.join(sa, "doc_a").join(sb, "doc_b")
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
        .filter(col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    },

    GQuery(
      "q_dedup_ngram_jaccard",
      OracleFragments.ngramJaccardPairs(MAX_DF)) { (s, d) =>
      exactJaccardPairs(s, d).orderBy("doc_a", "doc_b")
    },

    // Prefix-filtered exact similarity self-join (AllPairs/PPJoin): the
    // same exact-Jaccard contract as q_dedup_ngram_jaccard — same oracle —
    // via rarest-first prefix indexing + length/positional filters, the
    // candidate-generation layout that stays bounded at 100 TB. See
    // prefixFilterPairs for the algorithm and the exact-recall argument.
    GQuery(
      "q_dedup_prefix_filter",
      OracleFragments.ngramJaccardPairs(MAX_DF)) { (s, d) =>
      prefixFilterPairs(s, d).orderBy("doc_a", "doc_b")
    },

    // Blocked fuzzy matching (entity resolution) over an attribute's
    // distinct-value domain: near-identical part names (edit distance
    // ≤ 3) are candidate merges — the canonicalization pass a catalog /
    // metadata pipeline runs before joining on a dirty key. Blocking on
    // the first token bounds the pair space; Levenshtein runs per
    // candidate pair only, never per row pair.
    //   Scale (100 TB): the value DOMAIN (map-side-combined distinct+
    // count) is orders of magnitude smaller than the table; the blocked
    // self-join is an equi-join on the block key within that domain, and
    // the domain side auto-broadcasts. Rows never pair with rows.
    GQuery("q_dedup_fuzzy_names",
      """WITH v AS (SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n
        |           FROM part GROUP BY 1),
        |t AS (SELECT name, n, string_split(name, ' ')[1] AS blk FROM v)
        |SELECT a.name AS name_a, b.name AS name_b,
        |       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
        |       a.n AS n_a, b.n AS n_b
        |FROM t a JOIN t b ON a.blk = b.blk AND a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 3
        |ORDER BY name_a, name_b""".stripMargin) { (s, d) =>
      val t = Tables.load(s, d, "part")
        .groupBy(col("p_name").as("name")).agg(count(lit(1)).as("n"))
        .select(col("name"), col("n"), split(col("name"), " ").getItem(0).as("blk"))
      val a = t.toDF("name_a", "n_a", "blk")
      val b = t.toDF("name_b", "n_b", "blk_b")
      a.join(b, col("blk") === col("blk_b") && col("name_a") < col("name_b"))
        .filter(levenshtein(col("name_a"), col("name_b")) <= 3)
        .select(col("name_a"), col("name_b"),
          levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"),
          col("n_a"), col("n_b"))
        .orderBy("name_a", "name_b")
    },

    // Sketch-vs-exact differential eval: precision/recall of the MinHash-
    // LSH pipeline's pairs (est_j >= 0.5) against the exact n-gram
    // Jaccard pairs as ground truth — the eval a curation stack runs
    // before trusting a sketch configuration (B, R, CAP) on 100 TB it
    // can never exact-check. One full-outer join of the two bounded pair
    // sets (both are output-sized, never corpus-sized) and one global
    // rollup; precision/recall in integer basis points.
    GQuery(
      "q_dedup_minhash_eval",
      OracleFragments.minhashEval(CAP, MAX_DF)) { (s, d) =>
      pairSetEval(lshPairs(s, d), exactJaccardPairs(s, d))
    },

    // Sub-document block dedup (CCNet/RefinedWeb-style paragraph dedup,
    // adapted to the corpus's flat token streams): each document is cut
    // into non-overlapping BlockW-token blocks (trailing partial block
    // dropped), and a block is "shared" when its exact content occurs in
    // >= 2 DISTINCT documents — boilerplate the doc-level dedups above
    // cannot see because the surrounding text differs. Output: per-doc
    // block counts and the integer shared-percentage a curation filter
    // would threshold on.
    //
    // Scale (100 TB): one codegen'd tokenize+slice projection, then two
    // hash shuffles on the block key — the distinct-doc count per block
    // (partial agg combines map-side) and the per-doc rollup. The block
    // index is persisted so the corpus-wide projection runs once for both
    // consumers. Keys here are md5 strings to share the oracle's hash; a
    // production deployment would swap in a 64-bit hash for shuffle width.
    GQuery(
      "q_dedup_blocks",
      s"""WITH
         |tok AS (
         |  SELECT doc_id,
         |         list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS toks
         |  FROM documents),
         |c AS (SELECT doc_id, toks,
         |             CAST(len(toks) AS BIGINT) // $BlockW AS nb FROM tok),
         |b AS (
         |  SELECT c.doc_id,
         |         md5(array_to_string(
         |           c.toks[CAST(u.bi*$BlockW+1 AS BIGINT):CAST(u.bi*$BlockW+$BlockW AS BIGINT)],
         |           ' ')) AS h
         |  FROM c, LATERAL (SELECT unnest(range(0, c.nb)) AS bi) u),
         |bdf AS (SELECT h, count(DISTINCT doc_id) AS nd FROM b GROUP BY h)
         |SELECT b.doc_id,
         |       CAST(count(*) AS BIGINT) AS n_blocks,
         |       CAST(sum(CASE WHEN bdf.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_blocks,
         |       CAST(sum(CASE WHEN bdf.nd >= 2 THEN 1 ELSE 0 END) * 100 // count(*) AS BIGINT) AS shared_pct
         |FROM b JOIN bdf USING (h)
         |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin) { (s, d) =>
      val blocks = Tables.load(s, d, "documents")
        .select(col("doc_id"),
          filter(split(lower(col("text")), "\\s+"), t => t =!= "").as("toks"))
        .withColumn("nb", expr(s"CAST(size(toks) AS BIGINT) DIV $BlockW"))
        .withColumn("bi",
          explode(when(col("nb") > 0, expr("sequence(0L, nb - 1)"))
            .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)"))))
        .select(col("doc_id"),
          md5(concat_ws(" ",
            expr(s"slice(toks, CAST(bi*$BlockW+1 AS INT), $BlockW)"))
            .cast("binary")).as("h"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val bdf = blocks.groupBy("h").agg(countDistinct("doc_id").as("nd"))
      blocks.join(bdf, "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_blocks"),
          sum((col("nd") >= 2).cast("long")).as("n_shared_blocks"))
        .select(col("doc_id"), col("n_blocks"), col("n_shared_blocks"),
          expr("n_shared_blocks * 100 DIV n_blocks").as("shared_pct"))
        .orderBy("doc_id")
    },

    // Duplicated-span detection (exact substring dedup — the public
    // "Deduplicating Training Data Makes Language Models Better" recipe,
    // Lee et al. 2022, adapted to the corpus's token streams): every
    // SLIDING SpanW-token window is hashed, a window is duplicated when
    // its exact content occurs in >= 2 distinct documents, and per doc
    // the duplicated positions merge into MAXIMAL spans (overlapping or
    // exactly adjacent windows coalesce). Unlike q_dedup_blocks' aligned
    // non-overlapping blocks, sliding windows catch a duplicated passage
    // at ANY token offset, and the merge yields the exact [start, end)
    // interval a span-pruning pass would cut. Output: per-doc span count,
    // duplicated-token total, longest span, and the integer permille a
    // curation filter would threshold on (all docs, zeros included).
    //
    // Scale (100 TB): no pair enumeration anywhere — one codegen'd
    // tokenize+slide projection (one row per token position, linear), one
    // hash shuffle for the distinct-doc gram count (partially aggregated
    // map-side), one 1:1 equi-join of occurrences against the duplicated-
    // hash set, then windows partitioned per doc (state bounded by doc
    // length, never corpus size). A gram shared by a million documents
    // costs one count row and a 1:1 flag per occurrence — never a join
    // blow-up, which is why this layout scales where pairwise dedup dies.
    GQuery(
      "q_dedup_spans",
      s"""WITH
         |tok AS (
         |  SELECT doc_id,
         |         list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS toks
         |  FROM documents),
         |c AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM tok),
         |g AS (
         |  SELECT c.doc_id, u.i,
         |         md5(array_to_string(
         |           c.toks[CAST(u.i+1 AS BIGINT):CAST(u.i+$SpanW AS BIGINT)], ' ')) AS h
         |  FROM c, LATERAL (SELECT unnest(range(0, greatest(c.n - $SpanW + 1, 0))) AS i) u),
         |dup AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
         |hit AS (SELECT g.doc_id, g.i FROM g JOIN dup USING (h)),
         |m AS (
         |  SELECT doc_id, i,
         |         CASE WHEN i > coalesce(
         |             lag(i) OVER (PARTITION BY doc_id ORDER BY i),
         |             -$SpanW - 1) + $SpanW THEN 1 ELSE 0 END AS nr
         |  FROM hit),
         |r AS (SELECT doc_id, i,
         |             sum(nr) OVER (PARTITION BY doc_id ORDER BY i) AS run
         |      FROM m),
         |sp AS (SELECT doc_id, run, min(i) AS s, max(i) + $SpanW AS e
         |       FROM r GROUP BY doc_id, run),
         |pd AS (SELECT doc_id,
         |              CAST(count(*) AS BIGINT) AS n_spans,
         |              CAST(sum(e - s) AS BIGINT) AS dup_tokens,
         |              CAST(max(e - s) AS BIGINT) AS max_span
         |       FROM sp GROUP BY doc_id)
         |SELECT c.doc_id, c.n AS n_tokens,
         |       CAST(coalesce(pd.n_spans, 0) AS BIGINT) AS n_spans,
         |       CAST(coalesce(pd.dup_tokens, 0) AS BIGINT) AS dup_tokens,
         |       CAST(coalesce(pd.max_span, 0) AS BIGINT) AS max_span,
         |       CAST(coalesce(pd.dup_tokens, 0) * 1000 // greatest(c.n, 1) AS BIGINT) AS dup_pml
         |FROM c LEFT JOIN pd USING (doc_id)
         |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
      val docs = spanDocs(s, d)
      val grams = spanGrams(docs)
      val dup = grams.groupBy("h")
        .agg(countDistinct("doc_id").as("nd"))
        .where(col("nd") >= 2).select("h")
      val spans = mergeSpans(grams.join(dup, "h").select("doc_id", "i"))
      val perDoc = spans.groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(col("e") - col("s")).as("dup_tokens"),
          max(col("e") - col("s")).as("max_span"))
      docs.select("doc_id", "n")
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n").as("n_tokens"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
          coalesce(col("max_span"), lit(0L)).as("max_span"),
          expr("coalesce(dup_tokens, 0L) * 1000 DIV greatest(n, 1L)")
            .as("dup_pml"))
        .orderBy("doc_id")
    },

    // Span-PRUNED corpus rebuild — the transformation the detection
    // query above feeds (Lee et al. 2022 keep-one-occurrence rule, made
    // deterministic): an occurrence (doc, i) of a SpanW-gram is a prune
    // window iff the same gram also occurs in a LOWER doc_id (so exactly
    // one document — the minimum — keeps each duplicated passage, and
    // within-doc repetition is untouched). Prune windows merge into
    // maximal spans per doc, and each document is REBUILT with the
    // spanned tokens cut, entirely inside a per-row higher-order-function
    // projection. Output: per-doc kept/cut counts (independently
    // computed, so the oracle match proves kept + cut = n) and the md5 of
    // the rebuilt text.
    //
    // Scale (100 TB): the rebuild never shuffles a single token — the
    // only exchanges are the gram-hash min-doc aggregate and the tiny
    // (doc, span) list aggregate; the token-level cut happens in one
    // codegen'd filter-with-index lambda over the already-loaded row.
    // One-pass semantics (pruning is vs the ORIGINAL corpus, not
    // re-evaluated after cuts), stated here and mirrored in the oracle.
    GQuery(
      "q_dedup_span_prune",
      s"""WITH
         |tok AS (
         |  SELECT doc_id,
         |         list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS toks
         |  FROM documents),
         |c AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM tok),
         |g AS (
         |  SELECT c.doc_id, u.i,
         |         md5(array_to_string(
         |           c.toks[CAST(u.i+1 AS BIGINT):CAST(u.i+$SpanW AS BIGINT)], ' ')) AS h
         |  FROM c, LATERAL (SELECT unnest(range(0, greatest(c.n - $SpanW + 1, 0))) AS i) u),
         |gmin AS (SELECT h, min(doc_id) AS mind FROM g GROUP BY h),
         |pw AS (SELECT g.doc_id, g.i FROM g JOIN gmin USING (h)
         |       WHERE g.doc_id > gmin.mind),
         |m AS (
         |  SELECT doc_id, i,
         |         CASE WHEN i > coalesce(
         |             lag(i) OVER (PARTITION BY doc_id ORDER BY i),
         |             -$SpanW - 1) + $SpanW THEN 1 ELSE 0 END AS nr
         |  FROM pw),
         |r AS (SELECT doc_id, i,
         |             sum(nr) OVER (PARTITION BY doc_id ORDER BY i) AS run
         |      FROM m),
         |sp AS (SELECT doc_id, run, min(i) AS s, max(i) + $SpanW AS e
         |       FROM r GROUP BY doc_id, run),
         |ss AS (SELECT doc_id,
         |              list(struct_pack(s := s, e := e) ORDER BY s) AS sps,
         |              CAST(sum(e - s) AS BIGINT) AS cut
         |       FROM sp GROUP BY doc_id),
         |fin AS (
         |  SELECT c.doc_id, c.n,
         |         coalesce(ss.cut, 0) AS cut,
         |         CASE WHEN ss.sps IS NULL THEN c.toks
         |              ELSE list_transform(
         |                list_filter(list_zip(c.toks, range(0, c.n)),
         |                  z -> len(list_filter(ss.sps,
         |                    sp -> z[2] >= sp.s AND z[2] < sp.e)) = 0),
         |                z -> z[1]) END AS kept
         |  FROM c LEFT JOIN ss USING (doc_id))
         |SELECT doc_id, n AS n_tokens,
         |       CAST(cut AS BIGINT) AS cut_tokens,
         |       CAST(len(kept) AS BIGINT) AS kept_tokens,
         |       md5(coalesce(array_to_string(kept, ' '), '')) AS kept_md5
         |FROM fin ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = spanDocs(s, d)
      val grams = spanGrams(docs)
      val gmin = grams.groupBy("h").agg(min("doc_id").as("mind"))
      val pruneWins = grams.join(gmin, "h")
        .where(col("doc_id") > col("mind")).select("doc_id", "i")
      val sps = mergeSpans(pruneWins)
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("sps"),
          sum(col("e") - col("s")).as("cut"))
      docs.join(sps, Seq("doc_id"), "left")
        .withColumn("kept",
          when(col("sps").isNull, col("toks"))
            .otherwise(expr(
              "filter(toks, (t, p) -> size(filter(sps, sp -> p >= sp.s AND p < sp.e)) = 0)")))
        .select(col("doc_id"), col("n").as("n_tokens"),
          coalesce(col("cut"), lit(0L)).as("cut_tokens"),
          expr("CAST(size(kept) AS BIGINT)").as("kept_tokens"),
          md5(concat_ws(" ", col("kept")).cast("binary")).as("kept_md5"))
        .orderBy("doc_id")
    }
  )

  /** Tokenized documents (doc_id, toks, n) for the span-dedup family —
    * persisted: both the gram projection and the final per-doc join
    * consume it. */
  private def spanDocs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")
      .select(col("doc_id"),
        filter(split(lower(col("text")), "\\s+"), t => t =!= "").as("toks"))
      .withColumn("n", expr("CAST(size(toks) AS BIGINT)"))
      .persist(StorageLevel.MEMORY_AND_DISK)

  /** Sliding SpanW-token window stream (doc_id, i, h) — one row per token
    * position, hashed with the oracle-shared md5-of-joined-tokens so the
    * DuckDB twin sees identical keys. Persisted: consumed by both the
    * gram-frequency aggregate and the occurrence join. */
  private def spanGrams(docs: DataFrame): DataFrame =
    docs
      .withColumn("i",
        explode(when(col("n") >= SpanW, expr(s"sequence(0L, n - $SpanW)"))
          .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)"))))
      .select(col("doc_id"), col("i"),
        // the CAST to INT bounds per-document length at 2^31-1 tokens —
        // an accepted invariant (slice/array positions are INT-indexed
        // throughout Spark; a single document beyond 2 G tokens would
        // already overflow array construction upstream). Documents at
        // 100 TB scale means MANY documents, not 2 G-token ones.
        md5(concat_ws(" ",
          expr(s"slice(toks, CAST(i+1 AS INT), $SpanW)"))
          .cast("binary")).as("h"))
      .persist(StorageLevel.MEMORY_AND_DISK)

  /** Merge window occurrences (doc_id, i) into maximal [s, e) spans:
    * overlapping or exactly adjacent SpanW-wide intervals coalesce. The
    * classic sorted-interval sweep as two windows partitioned per doc —
    * state bounded by document length, never corpus size. */
  private def mergeSpans(hits: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("i")
    hits
      .withColumn("nr",
        (col("i") >
          coalesce(lag("i", 1).over(w), lit(-SpanW - 1L)) + SpanW)
          .cast("long"))
      .withColumn("run", sum("nr").over(w))
      .groupBy("doc_id", "run")
      .agg(min("i").as("s"), (max("i") + SpanW).as("e"))
  }
}
