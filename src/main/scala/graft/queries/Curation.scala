package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GQuery, Tables}
import graft.functions.HashFunctions

/** Corpus-curation operators for a training-data pipeline (beyond-reference;
  * the LLM-pipeline surface alongside Dedup/TextAnalysis/Pipeline):
  *
  *   - pattern-scrub redaction (PII-shaped regexes + term blocklist),
  *   - benchmark decontamination (shingle overlap against an eval set),
  *   - intra-document repetition filtering (Gopher-style dup/top-token
  *     ratios),
  *   - deterministic hash-based stratified sampling,
  *   - token-budget corpus mixing (greedy per-language take in hash order).
  *
  * Determinism: every operator is a closed-form integer/regex function of
  * the row (plus, for decontamination, an equi-join on exact shingle
  * hashes), so each carries a full DuckDB value oracle. Ratios follow the
  * TextAnalysis integer-space rounding rule; keep/drop thresholds are
  * evaluated as integer inequalities so no double rounding can flip a
  * decision.
  *
  * Scale design (100 TB):
  *   - redact / repetition / sample are embarrassingly parallel one-pass
  *     projections — no shuffle, all inside whole-stage codegen (builtin
  *     regex + higher-order array functions; the top-token count is a
  *     sorted-run fold, O(len·log len) per row, instead of an
  *     explode→groupBy shuffle);
  *   - decontamination broadcasts the eval-set shingle index (eval sets
  *     are small by construction) so the corpus never shuffles;
  *   - mixing/packing need a per-language prefix sum: the grouped
  *     two-pass shape ([[graft.operators.GroupedPrefixSum]]) so a
  *     dominant language never lands on a single window task.
  */
object Curation {

  /** Knuth multiplicative hash over doc_id, mod the shared TextHash prime —
    * the deterministic sampling coin. doc_id is reduced mod P BEFORE the
    * multiply, so the product stays < P·(KNUTH mod P) ≈ 6.5e17 < 2^63 for
    * EVERY non-negative BIGINT doc_id — the same residue as the naive
    * (doc_id · KNUTH) mod P (modular identity), but with no silent 64-bit
    * wrap in Spark / BIGINT overflow error in DuckDB at large ids. */
  private[graft] val KNUTH = 2654435761L
  private[graft] val P = 1000000007L
  private[graft] val KNUTHP = KNUTH % P

  private def coin(c: Column): Column = (c % lit(P)) * lit(KNUTHP) % lit(P) % lit(100)
  private def coinSql(c: String): String = s"((($c % $P) * $KNUTHP) % $P) % 100"

  /** Full-range coin (no % 100): the deterministic per-document ordering
    * key for hash-order selection (ties broken by doc_id). */
  private def coinFull(c: Column): Column = (c % lit(P)) * lit(KNUTHP) % lit(P)
  private def coinFullSql(c: String): String = s"((($c % $P) * $KNUTHP) % $P)"

  /** Doc-level leak-free split assignment: the 90/5/5 coin is thrown on
    * the duplicate-group REPRESENTATIVE (min doc_id per exact-content
    * group), so every member of a group receives the same split by
    * construction. The representative comes from a min-over-window on
    * the group key — ONE corpus shuffle on k, no agg-then-join second
    * pass. Exposed for the CurationSpec property test. */
  private[graft] def groupSplit(df: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
    df.withColumn("k", md5(col("text")))
      .withColumn("rep", min("doc_id").over(w))
      .withColumn("split",
        when(coin(col("rep")) < 90, "train")
          .when(coin(col("rep")) < 95, "valid")
          .otherwise("test"))
  }

  /** Chunking geometry: ChunkW-token windows every ChunkS tokens. */
  private val ChunkW = 64L
  private val ChunkS = 48L
  private val DomainCap = 10

  /** Bottom-K size of the per-source KMV shingle sketch
    * (q_curation_overlap_sketch): sources × K rows of metadata replace the
    * full-corpus distinct-shingle shuffle of the exact matrix. */
  private val SketchK = 4096

  /** Per-language sampling rates (percent) / token budgets for mixing. */
  private val Rates: Seq[(String, Int)] =
    Seq("de" -> 30, "en" -> 50, "es" -> 20, "fr" -> 10, "zh" -> 25)
  private val Budget = 8000L
  private val SeqLen = 512L
  private val NShards = 8L // training-shard fan-out (q_curation_shards)
  private val PadB = 32L   // docs per padded batch (q_curation_padwaste)

  /** Redaction patterns — shared RE2/Java-regex subset (char classes,
    * bounded repeats, alternation, ASCII word boundaries) so Spark and the
    * oracle compile the same automaton. Email/IPv4 prove the PII shapes;
    * the term blocklist has real hits in this corpus. */
  private[graft] val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private[graft] val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  private[graft] val BlockRe = "\\b(customer|vector)\\b"
  private[graft] val Mask = "[MASKED]"

  private def tokens(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => t =!= "")

  /** Longest equal-element run in the sorted array = the max token
    * frequency, via one fold with (prev, run, best) struct state. */
  private def longestRun(toks: Column): Column =
    aggregate(array_sort(toks),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  /** Shared-hash pair counts for the overlap matrices: per hash, the
    * (distinct) source set is collected into one sorted array and every
    * ordered pair (a < b) explodes from it — counting per pair then equals
    * "number of distinct hashes both sources contain", exactly what the
    * old hs⨝hs self-join on h counted, in ONE corpus shuffle instead of
    * two join shuffles plus their sorts (r16, guide §2.4). Per-group state
    * is bounded by the source-domain size. `dedup = false` skips the
    * in-aggregate set dedup when the input is already (source, h)
    * distinct. */
  private def sourcePairCounts(sh: DataFrame, dedup: Boolean): DataFrame =
    sh.groupBy(col("h"))
      .agg((if (dedup) sort_array(collect_set(col("source")))
            else sort_array(collect_list(col("source")))).as("ss"))
      .filter(size(col("ss")) >= 2)
      .select(explode(expr(
        """flatten(transform(ss, (sa, i) ->
          |  transform(slice(ss, i + 2, size(ss)),
          |    sb -> struct(sa AS source_a, sb AS source_b))))"""
          .stripMargin)).as("p"))
      .select(col("p.source_a"), col("p.source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared"))

  /** The redaction engine as a reusable column transform: count hits per
    * pattern family and rewrite the text with every family masked. */
  private[graft] def redact(text: Column): (Column, Column, Column, Column) = {
    val t = lower(text)
    val scrubbed = regexp_replace(
      regexp_replace(regexp_replace(t, EmailRe, Mask), Ipv4Re, Mask),
      BlockRe, Mask)
    (regexp_count(t, lit(EmailRe)).cast("long"),
      regexp_count(t, lit(Ipv4Re)).cast("long"),
      regexp_count(t, lit(BlockRe)).cast("long"),
      scrubbed)
  }

  val queries: Seq[GQuery] = Seq(

    // Deterministic epoch shuffle: the global-shuffle step every training
    // run needs — a seeded, reproducible permutation of the corpus into
    // ordered shards. shard = first hex digit of md5("epoch<seed>:" ||
    // doc_id) (16 shards here), position = the doc's rank within its
    // shard by (hash, doc_id). Re-running with the same seed reproduces
    // the exact order on any cluster size; bumping the seed is a fresh
    // epoch permutation with zero state carried over.
    //
    // Scale: shard assignment is a pure codegen'd projection (no
    // shuffle); the within-shard rank is a window PARTITIONED BY shard —
    // 16 parallel sorts here, and at 100 TB you take 4 hex digits (65 536
    // shards) so every partition stays executor-sized. No global
    // single-task window anywhere.
    GQuery(
      "q_curation_epoch_shuffle",
      """WITH h AS (
        |  SELECT doc_id, md5('epoch7:' || doc_id) AS hash
        |  FROM documents)
        |SELECT doc_id, substr(hash, 1, 1) AS shard,
        |       CAST(row_number() OVER (PARTITION BY substr(hash, 1, 1)
        |                               ORDER BY hash, doc_id) AS BIGINT) AS pos
        |FROM h ORDER BY shard, pos""".stripMargin) { (s, d) =>
      val hash = md5(concat(lit("epoch7:"), col("doc_id").cast("string"))
        .cast("binary"))
      docs(s, d)
        .select(col("doc_id"), hash.as("hash"))
        .withColumn("shard", substring(col("hash"), 1, 1))
        .withColumn("pos", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("shard").orderBy(col("hash"), col("doc_id")))
          .cast("long"))
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    },

    // Pattern-scrub redaction: per-family hit counts + the scrubbed text's
    // length and hash (value-checking the rewrite itself, not just counts).
    GQuery(
      "q_curation_redact",
      s"""SELECT doc_id,
         |       CAST(len(regexp_extract_all(lower(text), '$EmailRe')) AS BIGINT) AS n_email,
         |       CAST(len(regexp_extract_all(lower(text), '$Ipv4Re')) AS BIGINT) AS n_ipv4,
         |       CAST(len(regexp_extract_all(lower(text), '$BlockRe')) AS BIGINT) AS n_blocked,
         |       CAST(length(regexp_replace(regexp_replace(regexp_replace(lower(text),
         |         '$EmailRe', '$Mask', 'g'), '$Ipv4Re', '$Mask', 'g'),
         |         '$BlockRe', '$Mask', 'g')) AS BIGINT) AS len_redacted,
         |       md5(regexp_replace(regexp_replace(regexp_replace(lower(text),
         |         '$EmailRe', '$Mask', 'g'), '$Ipv4Re', '$Mask', 'g'),
         |         '$BlockRe', '$Mask', 'g')) AS redacted_md5
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val (ne, ni, nb, scrubbed) = redact(col("text"))
      docs(s, d)
        .select(col("doc_id"), ne.as("n_email"), ni.as("n_ipv4"),
          nb.as("n_blocked"),
          length(scrubbed).cast("long").as("len_redacted"),
          md5(scrubbed).as("redacted_md5"))
        .orderBy("doc_id")
    },

    // Benchmark decontamination: distinct 3-gram shingle hashes of the
    // held-out eval slice (doc_id ≡ 0 mod 97 — standing in for an external
    // benchmark table) form a broadcast index; every remaining corpus doc
    // reports how many of its distinct shingles hit that index, and is
    // flagged contaminated at >= 10 shared shingles.
    GQuery(
      "q_curation_decontam",
      s"""WITH
         |${OracleFragments.tok},
         |${OracleFragments.shingle3},
         |shr AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |hh AS (
         |  SELECT doc_id,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(s)+1), i -> CAST(unicode(s[i]) AS BIGINT))),
         |           (a,cp) -> (a*31+cp) % ${OracleFragments.P}) AS h
         |  FROM shr),
         |hd AS (SELECT DISTINCT doc_id, h FROM hh),
         |ev AS (SELECT DISTINCT h FROM hd WHERE doc_id % 97 = 0),
         |ns AS (
         |  SELECT d.doc_id, count(e.h) AS n_shared
         |  FROM hd d LEFT JOIN ev e USING (h)
         |  WHERE d.doc_id % 97 <> 0
         |  GROUP BY d.doc_id)
         |SELECT doc_id, CAST(n_shared AS BIGINT) AS n_shared,
         |       CAST(n_shared >= 10 AS BIGINT) AS contaminated
         |FROM ns ORDER BY doc_id""".stripMargin) { (s, d) =>
      HashFunctions.ensure(s)
      // explode_outer (not explode): the non-outer generate makes Catalyst
      // infer a pre-Generate `size(..)>0` filter that re-evaluates the
      // shingle-hash expression twice more per row — 3× the hash stage's
      // CPU at scale. outer generation skips that inference, and a doc
      // with no shingles degrades to one null-keyed row that misses the
      // broadcast join — exactly a zero count.
      val sets = docs(s, d).select(col("doc_id"),
        array_distinct(HashFunctions.shingle_hashes(col("text"), 3)).as("hh"))
      val ev = sets.filter(col("doc_id") % 97 === 0)
        .select(explode_outer(col("hh")).as("h"))
        .filter(col("h").isNotNull).distinct()
      sets.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), explode_outer(col("hh")).as("h"))
        .join(broadcast(ev.withColumn("hit", lit(1L))), Seq("h"), "left")
        .groupBy("doc_id")
        .agg(count(col("hit")).as("n_shared"))
        .select(col("doc_id"), col("n_shared"),
          (col("n_shared") >= 10).cast("long").as("contaminated"))
        .orderBy("doc_id")
    },

    // Bloom-prefiltered decontamination — the 100 TB shape of the exact
    // query above. The eval-set shingle index is aggregated into a bloom
    // (native TypedImperativeAggregate: per-partition word-array buffers,
    // OR-merge, map-side combined — one 128 KB buffer per partition
    // shuffles, never the hashes), then every corpus gram row is probed
    // through the codegen'd bloom_contains BEFORE any join: only
    // candidate rows (true hits + <1% false positives at 10 bits/elem,
    // k=7) reach the exact broadcast confirm join, so the join input
    // shrinks by the true-negative rate while the RESULT stays value-
    // exact — same oracle as q_curation_decontam. At a real 100 TB run
    // the broadcast eval set in the confirm join is replaced by a
    // shuffle join, and the bloom is what keeps that shuffle small.
    GQuery(
      "q_curation_bloom_decontam",
      s"""WITH
         |${OracleFragments.tok},
         |${OracleFragments.shingle3},
         |shr AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |hh AS (
         |  SELECT doc_id,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(s)+1), i -> CAST(unicode(s[i]) AS BIGINT))),
         |           (a,cp) -> (a*31+cp) % ${OracleFragments.P}) AS h
         |  FROM shr),
         |hd AS (SELECT DISTINCT doc_id, h FROM hh),
         |ev AS (SELECT DISTINCT h FROM hd WHERE doc_id % 97 = 0),
         |ns AS (
         |  SELECT d.doc_id, count(e.h) AS n_shared
         |  FROM hd d LEFT JOIN ev e USING (h)
         |  WHERE d.doc_id % 97 <> 0
         |  GROUP BY d.doc_id)
         |SELECT doc_id, CAST(n_shared AS BIGINT) AS n_shared,
         |       CAST(n_shared >= 10 AS BIGINT) AS contaminated
         |FROM ns ORDER BY doc_id""".stripMargin) { (s, d) =>
      HashFunctions.ensure(s)
      val sets = docs(s, d).select(col("doc_id"),
        array_distinct(HashFunctions.shingle_hashes(col("text"), 3)).as("hh"))
      val ev = sets.filter(col("doc_id") % 97 === 0)
        .select(explode_outer(col("hh")).as("h"))
        .filter(col("h").isNotNull).distinct()
      // bounded metadata collect: the serialized filter is 128 KB of bits
      // regardless of eval-set cardinality (numBits is the knob, not n)
      val bloom = ev.agg(
        HashFunctions.bloom_build(col("h"), 1L << 20, 7).as("b"))
        .collect()(0).getAs[Array[Byte]](0)
      val corpus = sets.filter(col("doc_id") % 97 =!= 0)
      val candidates = corpus
        .select(col("doc_id"), explode_outer(col("hh")).as("h"))
        .filter(col("h").isNotNull &&
          HashFunctions.bloom_contains(lit(bloom), col("h")))
      val confirmed = candidates
        .join(broadcast(ev), Seq("h"), "inner") // exact: kills bloom FPs
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      corpus.select("doc_id")
        .join(confirmed, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          (coalesce(col("n_shared"), lit(0L)) >= 10).cast("long").as("contaminated"))
        .orderBy("doc_id")
    },

    // Intra-document repetition filter (Gopher-style): duplicate-token
    // ratio and top-token frequency fraction, with the keep decision
    // evaluated in integer space:
    //   keep ⇔ (nt-nd)·100 <= 85·nt  AND  mc·10 <= nt
    GQuery(
      "q_curation_repetition",
      s"""WITH
         |${OracleFragments.tok},
         |tc AS (
         |  SELECT doc_id, t, count(*) AS c
         |  FROM (SELECT doc_id, unnest(toks) AS t FROM tok)
         |  GROUP BY doc_id, t),
         |st AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |         CAST(count(*) AS BIGINT) AS n_distinct,
         |         CAST(max(c) AS BIGINT) AS top_count
         |  FROM tc GROUP BY doc_id)
         |SELECT doc_id, n_tokens, n_distinct, top_count,
         |       CAST(round((n_tokens - n_distinct) * 1000000.0 / n_tokens) AS BIGINT) / 1000000.0 AS dup_ratio,
         |       CAST(round(top_count * 1000000.0 / n_tokens) AS BIGINT) / 1000000.0 AS top_frac,
         |       CAST((n_tokens - n_distinct) * 100 <= 85 * n_tokens
         |            AND top_count * 10 <= n_tokens AS BIGINT) AS keep
         |FROM st ORDER BY doc_id""".stripMargin) { (s, d) =>
      val M = lit(1000000.0)
      docs(s, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        // top token frequency without a shuffle: the longest equal-run in
        // the sorted token array via a single fold — O(len·log len) per
        // row (the distinct×occurrence scan is O(len·distinct), which
        // degrades to O(len²) on vocabulary-rich text)
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
        .withColumn("top_count", longestRun(col("toks")))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("top_count"),
          (round((col("n_tokens") - col("n_distinct")) * M / col("n_tokens"))
            .cast("long") / M).as("dup_ratio"),
          (round(col("top_count") * M / col("n_tokens")).cast("long") / M)
            .as("top_frac"),
          ((col("n_tokens") - col("n_distinct")) * 100 <= col("n_tokens") * 85 &&
            col("top_count") * 10 <= col("n_tokens")).cast("long").as("keep"))
        .orderBy("doc_id")
    },

    // Deterministic hash-based stratified sampling: the Knuth-hash coin
    // over doc_id against a per-language rate table. Reproducible across
    // runs and engines — the property a corpus-mixing pipeline needs.
    GQuery(
      "q_curation_sample", {
        val rateCase = Rates.map { case (l, r) => s"WHEN '$l' THEN $r" }
          .mkString("CASE lang ", " ", " ELSE 0 END")
        s"""SELECT lang,
           |       CAST(count(*) AS BIGINT) AS n_total,
           |       CAST(sum(CAST(${coinSql("doc_id")} < ($rateCase) AS BIGINT)) AS BIGINT) AS n_kept,
           |       CAST(min(CASE WHEN ${coinSql("doc_id")} < ($rateCase) THEN doc_id END) AS BIGINT) AS first_kept
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
      }) { (s, d) =>
      val rate = Rates.foldLeft(lit(0)) { case (acc, (l, r)) =>
        when(col("lang") === l, lit(r)).otherwise(acc)
      }
      docs(s, d)
        .withColumn("kept", (coin(col("doc_id")) < rate).cast("long"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
          sum(col("kept")).as("n_kept"),
          min(when(col("kept") === 1L, col("doc_id"))).as("first_kept"))
        .orderBy("lang")
    },

    // Weighted (probability-proportional-to-size) sampling by SYSTEMATIC
    // selection: lay documents on an integer line of cumulative n_chars,
    // drop an anchor every `total div 100` chars, and keep each document
    // whose span covers an anchor — so selection probability is exactly
    // proportional to length, huge documents can be picked multiple
    // times (n_picks), and the whole scheme is EXACT INTEGER arithmetic
    // (the classic -ln(u)/w exponential-key reservoir needs pow/log,
    // whose libm ulps differ across engines — unacceptable for a
    // value-exact gate, and for reproducible pipeline reruns).
    //   Scale: ONE distributed prefix-sum pass (grouped two-pass, no
    // single-partition window), a scalar total broadcast back, and a
    // projection — no per-doc state, no sort beyond the prefix sum's.
    GQuery(
      "q_curation_pps",
      """WITH c AS (
        |  SELECT doc_id, n_chars,
        |         sum(n_chars) OVER (ORDER BY doc_id
        |           ROWS UNBOUNDED PRECEDING) AS cum,
        |         (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents) AS total
        |  FROM documents)
        |SELECT doc_id, CAST(n_chars AS BIGINT) AS w, CAST(cum AS BIGINT) AS cum,
        |       CAST(cum // (total // 100) - (cum - n_chars) // (total // 100)
        |            AS BIGINT) AS n_picks
        |FROM c
        |WHERE cum // (total // 100) > (cum - n_chars) // (total // 100)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val base = docs(s, d).select(col("doc_id"), col("n_chars"))
      val cum = graft.operators.GroupedPrefixSum.runningSum(
        base, Seq.empty, Seq(col("doc_id")), col("n_chars"), "cum")
      val total = base.agg(sum("n_chars").cast("long").as("total"))
      cum.crossJoin(broadcast(total))
        .withColumn("step", expr("total div 100"))
        .withColumn("n_picks",
          expr("cum div step - (cum - n_chars) div step"))
        .filter(col("n_picks") > 0)
        .select(col("doc_id"), col("n_chars").cast("long").as("w"),
          col("cum").cast("long").as("cum"), col("n_picks").cast("long").as("n_picks"))
        .orderBy("doc_id")
    },

    // Leak-free train/valid/test split (90/5/5): the split coin is thrown
    // on the DUPLICATE-GROUP representative, not the document — so a
    // group of identical documents can never straddle splits (the classic
    // eval-leakage bug when near-identical docs land in both train and
    // test). Group key here is the exact-content hash; a production run
    // swaps in the near-dup cluster_id from q_dedup_clusters — one
    // column substitution, same plan shape.
    //   Scale: ONE corpus shuffle on the group key — the representative
    // is a min-over-window on k (no agg-then-join second pass); the coin
    // is the shared Knuth hash — overflow-safe for every BIGINT rep.
    // Output is 3 summary rows.
    GQuery(
      "q_curation_split",
      s"""WITH g AS (
         |  SELECT md5(text) AS k, min(doc_id) AS rep
         |  FROM documents GROUP BY 1),
         |dd AS (
         |  SELECT d.doc_id, d.n_chars, g.k,
         |         CASE WHEN ${coinSql("g.rep")} < 90 THEN 'train'
         |              WHEN ${coinSql("g.rep")} < 95 THEN 'valid'
         |              ELSE 'test' END AS split
         |  FROM documents d JOIN g ON md5(d.text) = g.k)
         |SELECT split,
         |       CAST(count(*) AS BIGINT) AS docs,
         |       CAST(count(DISTINCT k) AS BIGINT) AS groups,
         |       CAST(sum(n_chars) AS BIGINT) AS chars
         |FROM dd GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
      groupSplit(docs(s, d))
        .groupBy("split")
        .agg(count(lit(1)).as("docs"),
          countDistinct(col("k")).as("groups"),
          sum("n_chars").cast("long").as("chars"))
        .orderBy("split")
    },

    // Token-budget corpus mixing: per language, take documents in
    // deterministic hash order while the running token total stays within
    // the budget. The prefix sum uses the grouped two-pass shape
    // (operators.GroupedPrefixSum) — a `Window.partitionBy(lang)` would
    // put each language on one task, and the dominant language serializes
    // the stage at 100 TB.
    GQuery(
      "q_curation_mix",
      s"""WITH
         |${OracleFragments.tok},
         |nt AS (
         |  SELECT d.doc_id, d.lang, CAST(len(t.toks) AS BIGINT) AS n_tokens,
         |         ${coinSql("d.doc_id")} AS h
         |  FROM documents d JOIN tok t USING (doc_id)),
         |cum AS (
         |  SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY lang
         |           ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
         |  FROM nt)
         |SELECT lang,
         |       CAST(count(*) AS BIGINT) AS docs_taken,
         |       CAST(sum(n_tokens) AS BIGINT) AS tokens_taken,
         |       CAST(max(doc_id) AS BIGINT) AS last_doc
         |FROM cum WHERE running <= $Budget
         |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val nt = docs(s, d)
        .select(col("doc_id"), col("lang"),
          size(tokens(col("text"))).cast("long").as("n_tokens"),
          coin(col("doc_id")).as("h"))
      graft.operators.GroupedPrefixSum
        .runningSum(nt, Seq("lang"), Seq(col("h"), col("doc_id")),
          col("n_tokens"), "running")
        .filter(col("running") <= Budget)
        .groupBy("lang")
        .agg(count(lit(1)).as("docs_taken"),
          sum("n_tokens").as("tokens_taken"),
          max("doc_id").as("last_doc"))
        .orderBy("lang")
    },

    // Temperature-weighted mixture sampling (α = 0.5): per-source token
    // budgets ∝ tokens^α — the standard upsampling recipe that keeps
    // small domains/languages represented (multilingual-pretraining
    // mixing), then the deterministic hash-order take per source.
    //   Exactness: weight_d = floor(sqrt(tokens_d)) — sqrt is the ONE
    // libm call IEEE-754 requires correctly rounded, so floor∘sqrt of a
    // BIGINT is bit-portable across engines (unlike ln, which needs the
    // millinats rounding trick elsewhere). Budgets are pure integer
    // arithmetic from exact totals; the take reuses the grouped prefix
    // sum. Everything ships as BIGINT.
    //   Scale: one corpus pass for per-doc token counts; per-source
    // totals are a low-cardinality agg broadcast back; the take is the
    // same two-pass prefix sum as q_curation_mix (no dominant-source
    // window task).
    GQuery(
      "q_curation_mix_temperature",
      s"""WITH
         |${OracleFragments.tok},
         |nt AS (
         |  SELECT d.doc_id, d.source, CAST(len(t.toks) AS BIGINT) AS n_tokens,
         |         ${coinSql("d.doc_id")} AS h
         |  FROM documents d JOIN tok t USING (doc_id)),
         |tot AS (
         |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
         |         CAST(floor(sqrt(CAST(sum(n_tokens) AS DOUBLE))) AS BIGINT) AS w
         |  FROM nt GROUP BY source),
         |wsum AS (SELECT CAST(sum(w) AS BIGINT) AS ws FROM tot),
         |bud AS (
         |  SELECT t.source, t.tokens_total, t.w,
         |         CAST(floor(CAST($Budget * t.w AS DOUBLE)
         |                    / CAST(s.ws AS DOUBLE)) AS BIGINT) AS budget_d
         |  FROM tot t CROSS JOIN wsum s),
         |cum AS (
         |  SELECT nt.*, b.tokens_total, b.w, b.budget_d,
         |         CAST(sum(n_tokens) OVER (PARTITION BY nt.source
         |           ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
         |  FROM nt JOIN bud b ON nt.source = b.source)
         |SELECT source,
         |       CAST(max(tokens_total) AS BIGINT) AS tokens_total,
         |       CAST(max(w) AS BIGINT) AS weight,
         |       CAST(max(budget_d) AS BIGINT) AS budget_d,
         |       CAST(count(*) AS BIGINT) AS docs_taken,
         |       CAST(sum(n_tokens) AS BIGINT) AS tokens_taken
         |FROM cum WHERE running <= budget_d
         |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      import org.apache.spark.storage.StorageLevel
      val spark = s
      import spark.implicits._
      val nt = docs(s, d)
        .select(col("doc_id"), col("source"),
          size(tokens(col("text"))).cast("long").as("n_tokens"),
          coin(col("doc_id")).as("h"))
        .persist(StorageLevel.MEMORY_AND_DISK) // ONE corpus pass: totals + the take read the cache; released by the harness clearCache
      // per-source totals are low-cardinality driver metadata: collect
      // once, derive weights/budgets in the driver, broadcast back
      val tot = nt.groupBy("source")
        .agg(sum("n_tokens").as("tokens_total"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val weights = tot.map { case (src, tk) =>
        (src, tk, math.floor(math.sqrt(tk.toDouble)).toLong)
      }
      val ws = weights.map(_._3).sum
      // floor of one IEEE division of exact (<2^53) integers — identical
      // in both engines; a bare BIGINT cast would round in DuckDB but
      // truncate in Spark
      val bud = weights.toSeq.map { case (src, tk, w) =>
        (src, tk, w, math.floor((Budget * w).toDouble / ws.toDouble).toLong)
      }.toDF("source", "tokens_total", "w", "budget_d")
      graft.operators.GroupedPrefixSum
        .runningSum(nt, Seq("source"), Seq(col("h"), col("doc_id")),
          col("n_tokens"), "running")
        .join(broadcast(bud), "source")
        .filter(col("running") <= col("budget_d"))
        .groupBy("source")
        .agg(max("tokens_total").as("tokens_total"),
          max("w").as("weight"),
          max("budget_d").as("budget_d"),
          count(lit(1)).as("docs_taken"),
          sum("n_tokens").as("tokens_taken"))
        .orderBy("source")
    },

    // Provenance accounting: the per-source dashboard a curation run
    // reports — volume, token mass, blocklist pressure, and the
    // quality-keep rate per (source, lang) slice, all integer-space.
    // One projection + a low-cardinality rollup; no other shuffle.
    GQuery(
      "q_curation_sources", {
        val en = Pipeline.En.map(w => s"'$w'").mkString("[", ", ", "]")
        s"""WITH st AS (
           |  SELECT source, lang,
           |         CAST(len(toks) AS BIGINT) AS nt,
           |         CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS sl,
           |         CAST(len(list_filter(toks, x -> list_contains($en, x))) AS BIGINT) AS ns,
           |         CAST(len(regexp_extract_all(lower(text), '$BlockRe')) AS BIGINT) AS nb
           |  FROM (SELECT source, lang, text,
           |          list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS toks
           |        FROM documents) d)
           |SELECT source, lang,
           |       CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(nt) AS BIGINT) AS total_tokens,
           |       CAST(sum(nb) AS BIGINT) AS blocked_terms,
           |       CAST(sum(CAST(2*nt*least(nt, 50) + 60*ns + 5*least(sl, 8*nt) >= 120*nt
           |                AS BIGINT)) AS BIGINT) AS n_quality_kept
           |FROM st GROUP BY source, lang ORDER BY source, lang""".stripMargin
      }) { (s, d) =>
      val en = typedLit(Pipeline.En)
      val toks = tokens(col("text"))
      docs(s, d)
        .select(col("source"), col("lang"), toks.as("toks"),
          regexp_count(lower(col("text")), lit(BlockRe)).cast("long").as("nb"))
        .withColumn("nt", size(col("toks")).cast("long"))
        .withColumn("sl",
          aggregate(transform(col("toks"), t => length(t)), lit(0),
            (acc, x) => acc + x).cast("long"))
        .withColumn("ns",
          size(filter(col("toks"), t => array_contains(en, t))).cast("long"))
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("nt").as("total_tokens"),
          sum("nb").as("blocked_terms"),
          sum((lit(2) * col("nt") * least(col("nt"), lit(50L)) +
            lit(60) * col("ns") + lit(5) * least(col("sl"), lit(8) * col("nt")) >=
            lit(120) * col("nt")).cast("long")).as("n_quality_kept"))
        .orderBy("source", "lang")
    },

    // Sequence packing (concatenate-then-chunk): documents are laid out
    // per language in deterministic hash order and chunked into S-token
    // training sequences; a doc straddles a boundary when its [start,end)
    // token span crosses a multiple of S. Pure integer arithmetic over
    // the same per-language prefix sum as q_curation_mix — one window
    // pass, then a rollup: packs emitted, boundary-straddling docs, and
    // the tail waste a packer would pad.
    GQuery(
      "q_curation_pack",
      s"""WITH
         |${OracleFragments.tok},
         |nt AS (
         |  SELECT d.doc_id, d.lang, CAST(len(t.toks) AS BIGINT) AS n_tokens,
         |         ${coinSql("d.doc_id")} AS h
         |  FROM documents d JOIN tok t USING (doc_id)),
         |cum AS (
         |  SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY lang
         |           ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fin
         |  FROM nt)
         |SELECT lang,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |       CAST((max(fin) + $SeqLen - 1) // $SeqLen AS BIGINT) AS n_packs,
         |       CAST(sum(CASE WHEN n_tokens > 0
         |                 AND (fin - n_tokens) // $SeqLen <> (fin - 1) // $SeqLen
         |                 THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers,
         |       CAST((max(fin) + $SeqLen - 1) // $SeqLen * $SeqLen - max(fin)
         |            AS BIGINT) AS tail_waste
         |FROM cum GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val nt = docs(s, d)
        .select(col("doc_id"), col("lang"),
          size(tokens(col("text"))).cast("long").as("n_tokens"),
          coin(col("doc_id")).as("h"))
      graft.operators.GroupedPrefixSum
        .runningSum(nt, Seq("lang"), Seq(col("h"), col("doc_id")),
          col("n_tokens"), "fin")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("total_tokens"),
          expr(s"(max(fin) + $SeqLen - 1) DIV $SeqLen").as("n_packs"),
          sum(when(col("n_tokens") > 0 &&
            expr(s"(fin - n_tokens) DIV $SeqLen") =!= expr(s"(fin - 1) DIV $SeqLen"),
            1L).otherwise(0L)).as("n_straddlers"),
          expr(s"(max(fin) + $SeqLen - 1) DIV $SeqLen * $SeqLen - max(fin)")
            .as("tail_waste"))
        .orderBy("lang")
    },

    // End-to-end privacy/curation pipeline as ONE Spark plan: encoding
    // hygiene (stage 0 — the corpus is suffixed with non-ASCII and the
    // even half MANGLED in-query, the q_text_fix_encoding fixture;
    // fix_text repairs + NFC-normalizes before any signal runs, and the
    // oracle reads only the CLEAN suffixed corpus, so a skipped repair
    // breaks the hash compare) → redact → repetition filter (on the
    // redacted text) → decontamination against the eval slice (shingles
    // of the redacted text) → per-language accounting of the surviving
    // corpus. Composes the operators above with all keep decisions in
    // integer space.
    //
    // Scale: hygiene is one more codegen'd projection fused into the
    // same persisted redaction pass — zero added shuffles; the only
    // shuffles remain the per-doc shared-shingle count and the rollup.
    GQuery(
      "q_pipeline_privacy",
      s"""WITH
         |red AS (
         |  SELECT doc_id, lang,
         |         lower(regexp_replace(regexp_replace(regexp_replace(
         |           lower(nfc_normalize(text || ' café résumé')),
         |           '$EmailRe', '$Mask', 'g'), '$Ipv4Re', '$Mask', 'g'),
         |           '$BlockRe', '$Mask', 'g')) AS t,
         |         CAST(len(regexp_extract_all(lower(nfc_normalize(text || ' café résumé')), '$BlockRe'))
         |           AS BIGINT) AS n_blocked
         |  FROM documents),
         |tokr AS (
         |  SELECT doc_id, lang, n_blocked,
         |         list_filter(regexp_split_to_array(t, '\\s+'), x -> x <> '') AS toks
         |  FROM red),
         |tc AS (
         |  SELECT doc_id, tk, count(*) AS c
         |  FROM (SELECT doc_id, unnest(toks) AS tk FROM tokr)
         |  GROUP BY doc_id, tk),
         |st AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS nt,
         |         CAST(count(*) AS BIGINT) AS nd, CAST(max(c) AS BIGINT) AS mc
         |  FROM tc GROUP BY doc_id),
         |shr AS (
         |  SELECT doc_id,
         |         unnest(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |                     ELSE list_transform(range(1, len(toks) - 1),
         |                                         i -> array_to_string(toks[i:i+2], ' '))
         |                END) AS sg
         |  FROM tokr),
         |hh AS (
         |  SELECT doc_id,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(sg)+1), i -> CAST(unicode(sg[i]) AS BIGINT))),
         |           (a,cp) -> (a*31+cp) % ${OracleFragments.P}) AS h
         |  FROM shr),
         |hd AS (SELECT DISTINCT doc_id, h FROM hh),
         |ev AS (SELECT DISTINCT h FROM hd WHERE doc_id % 97 = 0),
         |ns AS (
         |  SELECT d.doc_id, count(e.h) AS n_shared
         |  FROM hd d LEFT JOIN ev e USING (h)
         |  WHERE d.doc_id % 97 <> 0
         |  GROUP BY d.doc_id),
         |kept AS (
         |  SELECT r.doc_id, r.lang, r.n_blocked, s.nt
         |  FROM tokr r JOIN st s USING (doc_id) JOIN ns USING (doc_id)
         |  WHERE (s.nt - s.nd) * 100 <= 85 * s.nt AND s.mc * 10 <= s.nt
         |    AND ns.n_shared < 10)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_blocked) AS BIGINT) AS masked_terms,
         |       CAST(sum(nt) AS BIGINT) AS total_tokens
         |FROM kept GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      HashFunctions.ensure(s)
      // stage 0 — encoding hygiene ahead of the scrub (see header)
      val suffixed = concat(col("text"), lit(" café résumé"))
      val mangledIn = decode(encode(suffixed, "UTF-8"), "ISO-8859-1")
      val fixedText = HashFunctions.fix_text(
        when(col("doc_id") % 2 === 0, mangledIn).otherwise(suffixed))
        .getField("fixed")
      val (_, _, nb, scrubbed) = redact(fixedText)
      val red = docs(s, d)
        .select(col("doc_id"), col("lang"), scrubbed.as("t"),
          nb.as("n_blocked"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val toks = tokens(col("t"))
      val feats = red
        .withColumn("toks", toks)
        .withColumn("nt", size(col("toks")).cast("long"))
        .withColumn("nd", size(array_distinct(col("toks"))).cast("long"))
        .withColumn("mc", longestRun(col("toks")))
        .drop("toks", "t")
      val sets = red.select(col("doc_id"),
        array_distinct(HashFunctions.shingle_hashes(col("t"), 3)).as("hh"))
      val ev = sets.filter(col("doc_id") % 97 === 0)
        .select(explode_outer(col("hh")).as("h"))
        .filter(col("h").isNotNull).distinct()
      val ns = sets.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), explode_outer(col("hh")).as("h"))
        .join(broadcast(ev.withColumn("hit", lit(1L))), Seq("h"), "left")
        .groupBy("doc_id")
        .agg(count(col("hit")).as("n_shared"))
      feats.join(ns, "doc_id")
        .filter((col("nt") - col("nd")) * 100 <= col("nt") * 85 &&
          col("mc") * 10 <= col("nt") && col("n_shared") < 10)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_blocked").as("masked_terms"),
          sum("nt").as("total_tokens"))
        .orderBy("lang")
    },

    // RAG/context-window chunking: each document's token stream is cut
    // into windows of ChunkW tokens with stride ChunkS (ChunkW-ChunkS
    // overlap), the standard retrieval/packing prep. Value-exact oracle:
    // chunk counts, sizes and the md5 of every chunk's joined text.
    //
    // Scale: one narrow pass — tokenize, compute the chunk count in
    // integer space, explode the start indices, slice; no shuffle except
    // the presentation sort. An empty document yields no chunks.
    GQuery(
      "q_chunk_overlap",
      s"""WITH
         |${OracleFragments.tok},
         |c AS (
         |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
         |         CASE WHEN len(toks) = 0 THEN 0
         |              ELSE (greatest(CAST(len(toks) AS BIGINT) - $ChunkW, 0)
         |                    + ${ChunkS - 1}) // $ChunkS + 1 END AS nc
         |  FROM tok),
         |e AS (
         |  SELECT c.doc_id, u.ci,
         |         c.toks[CAST(u.ci*$ChunkS+1 AS BIGINT):CAST(u.ci*$ChunkS+$ChunkW AS BIGINT)] AS chunk
         |  FROM c, LATERAL (SELECT unnest(range(0, c.nc)) AS ci) u)
         |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_id,
         |       CAST(len(chunk) AS BIGINT) AS n_tokens,
         |       md5(array_to_string(chunk, ' ')) AS chunk_md5
         |FROM e ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
      docs(s, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .withColumn("nc", expr(
          s"CASE WHEN size(toks) = 0 THEN 0L ELSE " +
            s"(greatest(CAST(size(toks) AS BIGINT) - $ChunkW, 0L) + ${ChunkS - 1}) " +
            s"DIV $ChunkS + 1 END"))
        .withColumn("ci",
          explode(when(col("nc") > 0, expr("sequence(0L, nc - 1)"))
            .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)"))))
        .withColumn("chunk",
          expr(s"slice(toks, CAST(ci*$ChunkS+1 AS INT), $ChunkW)"))
        .select(col("doc_id"), col("ci").cast("long").as("chunk_id"),
          size(col("chunk")).cast("long").as("n_tokens"),
          md5(concat_ws(" ", col("chunk")).cast("binary")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_id")
    },

    // Cross-source contamination matrix: for every pair of sources, how
    // many distinct 3-gram shingles they share — the "which crawls
    // duplicate each other" diagnostic that decides dedup priorities and
    // mixing weights. Scale: the per-source distinct shingle set is the
    // corpus pass (one shuffle on hash); the self-join groups by hash,
    // and a hash is held by at most |sources| rows, so the join fan-out
    // is bounded by sources² per hash — never corpus².
    GQuery(
      "q_curation_overlap_matrix",
      s"""WITH
         |tok AS (
         |  SELECT source,
         |         list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS toks
         |  FROM documents),
         |sh AS (
         |  SELECT source,
         |         CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |              ELSE list_transform(range(1, len(toks) - 1),
         |                                  i -> array_to_string(toks[i:i+2], ' '))
         |         END AS shingles
         |  FROM tok),
         |shr AS (SELECT source, unnest(shingles) AS s FROM sh),
         |hh AS (
         |  SELECT DISTINCT source,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(s)+1), i -> CAST(unicode(s[i]) AS BIGINT))),
         |           (a,cp) -> (a*31+cp) % ${OracleFragments.P}) AS h
         |  FROM shr)
         |SELECT a.source AS source_a, b.source AS source_b,
         |       CAST(count(*) AS BIGINT) AS n_shared
         |FROM hh a JOIN hh b ON a.h = b.h AND a.source < b.source
         |GROUP BY 1, 2
         |HAVING count(*) >= 5
         |ORDER BY source_a, source_b""".stripMargin) { (s, d) =>
      HashFunctions.ensure(s)
      // GROUP-PAIRS instead of a self-join (r16, guide §2.4): the old
      // shape shuffled the distinct (source, h) frame TWICE into a
      // sort-merge self-join on h; one groupBy(h) with a map-side-combined
      // collect_set builds each hash's source set in a single corpus
      // shuffle, and the ordered pairs explode from the sorted set —
      // bounded by the source-domain size (the matrix is sources² by
      // construction), so the per-group state is metadata at any scale.
      // Identical output: a pair (a < b) is emitted once per shared hash
      // either way.
      sourcePairCounts(
        docs(s, d).select(col("source"),
          explode(HashFunctions.shingle_hashes(col("text"), 3)).as("h")),
        dedup = true)
        .filter(col("n_shared") >= 5)
        .orderBy("source_a", "source_b")
    },

    // SKETCHED contamination matrix — the variant a 100 TB corpus runs.
    // The exact matrix's per-source DISTINCT shingle set is a full-corpus
    // shuffle; the sketch replaces it with a bottom-K KMV (theta) sketch
    // per source: K smallest distinct shingle hashes (GroupedTopN — never
    // a single-task group), theta_s = K-th minimum (or "everything" when
    // the source has < K shingles). A pair's intersection estimate is
    //   |sketchA ∩ sketchB below theta| * P / theta,  theta = min(θa, θb)
    // — standard theta-sketch set intersection. Per-source sketches are
    // METADATA-sized (K rows each): the pairwise pass touches sources·K
    // rows, not the corpus. Oracle pattern = q_cardinality: both engines
    // emit the exact shared counts plus booleans asserting the estimate
    // landed inside the declared tolerance; DuckDB asserts TRUE.
    GQuery(
      "q_curation_overlap_sketch",
      s"""WITH
         |tok AS (
         |  SELECT source,
         |         list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS toks
         |  FROM documents),
         |sh AS (
         |  SELECT source,
         |         CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |              ELSE list_transform(range(1, len(toks) - 1),
         |                                  i -> array_to_string(toks[i:i+2], ' '))
         |         END AS shingles
         |  FROM tok),
         |shr AS (SELECT source, unnest(shingles) AS s FROM sh),
         |hh AS (
         |  SELECT DISTINCT source,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(s)+1), i -> CAST(unicode(s[i]) AS BIGINT))),
         |           (a,cp) -> (a*31+cp) % ${OracleFragments.P}) AS h
         |  FROM shr)
         |SELECT a.source AS source_a, b.source AS source_b,
         |       CAST(count(*) AS BIGINT) AS n_shared,
         |       TRUE AS sketch_ok
         |FROM hh a JOIN hh b ON a.h = b.h AND a.source < b.source
         |GROUP BY 1, 2
         |HAVING count(*) >= 5
         |ORDER BY source_a, source_b""".stripMargin) { (s, d) =>
      HashFunctions.ensure(s)
      // the distinct (source, shingle-hash) frame feeds the exact arm
      // twice and the sketch arm twice: persist once, release after the
      // (tiny) result materializes — the GroupedPrefixSum cache contract
      val hs = docs(s, d)
        .select(col("source"),
          explode(HashFunctions.shingle_hashes(col("text"), 3)).as("h"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // exact matrix (the reference answer both engines value-compare) —
      // group-pairs off the persisted distinct frame (r16): one shuffle
      // by h + the bounded pair explode, not a two-shuffle self-join (see
      // sourcePairCounts; input already distinct, so no in-agg dedup)
      val exact = sourcePairCounts(hs, dedup = false)
        .filter(col("n_shared") >= 5)
      // bottom-K KMV sketch per source + its theta
      val sk = graft.operators.GroupedTopN
        .topN(hs, Seq("source"), Seq(col("h")), SketchK)
      val thetas = sk.groupBy(col("source"))
        .agg(count(lit(1)).as("k"), max(col("h")).as("kth"))
        .select(col("source"),
          when(col("k") < SketchK, lit(P)).otherwise(col("kth")).as("theta"))
      val est = sk.toDF("source_a", "ha")
        .join(sk.toDF("source_b", "hb"),
          col("ha") === col("hb") && col("source_a") < col("source_b"))
        .join(thetas.toDF("source_a2", "theta_a"), col("source_a") === col("source_a2"))
        .join(thetas.toDF("source_b2", "theta_b"), col("source_b") === col("source_b2"))
        .withColumn("theta", least(col("theta_a"), col("theta_b")))
        .filter(col("ha") < col("theta"))
        .groupBy("source_a", "source_b", "theta")
        .agg(count(lit(1)).as("shared_in_sketch"))
        .select(col("source_a").as("sa"), col("source_b").as("sb"),
          round(col("shared_in_sketch") * lit(P.toDouble) / col("theta"))
            .cast("long").as("estimate"))
      val out = exact.join(est,
          col("source_a") === col("sa") && col("source_b") === col("sb"), "left")
        .select(col("source_a"), col("source_b"), col("n_shared"),
          // declared tolerance: 25% relative or ±16 absolute, whichever is
          // looser (theta-sketch RSE ~ 1/sqrt(shared-in-sketch); small
          // cells are bounded by the absolute arm) — worst measured cell
          // uses 24% of the bound at sf0.1, <considerably less at sf0.01
          (abs(coalesce(col("estimate"), lit(0L)) - col("n_shared")) <=
            greatest(col("n_shared") * 0.25, lit(16.0))).as("sketch_ok"))
        .orderBy("source_a", "source_b")
      val materialized = out.localCheckpoint(true) // sources² rows
      hs.unpersist(false)
      materialized
    },

    // Per-domain cap (crawl-domination guard): keep at most DomainCap
    // documents per source, chosen in deterministic hash order — the
    // two-phase GroupedTopN so the dominant domain never lands on one
    // task (see operators.GroupedTopN). Oracle states the same cap as a
    // plain per-group row_number.
    GQuery(
      "q_curation_domain_cap",
      s"""WITH r AS (
         |  SELECT doc_id, source,
         |         row_number() OVER (PARTITION BY source
         |           ORDER BY ${coinFullSql("doc_id")}, doc_id) AS rn
         |  FROM documents)
         |SELECT doc_id, source FROM r WHERE rn <= $DomainCap
         |ORDER BY source, doc_id""".stripMargin) { (s, d) =>
      graft.operators.GroupedTopN
        .topN(docs(s, d), Seq("source"),
          Seq(coinFull(col("doc_id")), col("doc_id")), DomainCap)
        .select("doc_id", "source")
        .orderBy("source", "doc_id")
    },

    // Token-balanced training-shard assignment: the shard-writer prep
    // pass. Documents are ranked globally by descending token count
    // (ties on doc_id) and dealt round-robin across NShards shards —
    // longest-processing-time scheduling, which bounds any shard's token
    // total within max_doc_tokens of the mean, without the sequential
    // greedy packer a driver loop would need. Output is the per-shard
    // manifest a writer job would consume.
    //
    // Scale (100 TB): the global rank is the two-pass
    // [[graft.operators.GroupedPrefixSum]] shape (range-partition by the
    // sort key, per-partition subtotals, driver prefix over partition
    // counts) — no single-task window; the ranked frame carries only
    // (doc_id, n_tokens) metadata, never the text.
    GQuery(
      "q_curation_shards",
      s"""WITH
         |${OracleFragments.tok},
         |nt AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM tok),
         |r AS (
         |  SELECT doc_id, n_tokens,
         |         row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rnk
         |  FROM nt)
         |SELECT CAST((rnk - 1) % $NShards AS BIGINT) AS shard_id,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |       CAST(max(n_tokens) AS BIGINT) AS max_tokens,
         |       CAST(min(n_tokens) AS BIGINT) AS min_tokens
         |FROM r GROUP BY 1 ORDER BY shard_id""".stripMargin) { (s, d) =>
      val nt = docs(s, d)
        .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tokens"))
      graft.operators.GroupedPrefixSum
        .runningSum(nt, Seq.empty, Seq(col("n_tokens").desc, col("doc_id")),
          lit(1L), "rnk")
        .groupBy(((col("rnk") - 1) % NShards).as("shard_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("total_tokens"),
          max("n_tokens").as("max_tokens"),
          min("n_tokens").as("min_tokens"))
        .orderBy("shard_id")
    },

    // Pad-waste accounting for batch construction — the sort-by-length
    // batching recipe: padding B sequences to the batch max wastes
    // cnt·max − Σlen tokens per batch, and length-sorted batch assembly
    // collapses that waste vs arrival order. Both layouts are built over
    // the SAME doc set (batch = (rank−1) DIV B under each order) and the
    // gate emits their exact batch counts, real/pad token totals, and the
    // integer pad permille a training-efficiency dashboard would plot —
    // the measurement run before committing a batching policy.
    //
    // Scale (100 TB): only (doc_id, n_tokens) metadata ever moves — the
    // text never leaves the scan; each layout's rank is the two-pass
    // grouped prefix sum (no single-task global window), and the batch
    // rollup is one hash aggregate on the batch id.
    GQuery(
      "q_curation_padwaste",
      s"""WITH
         |${OracleFragments.tok},
         |nt AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM tok),
         |arr AS (
         |  SELECT n_tokens,
         |         (row_number() OVER (ORDER BY doc_id) - 1) // $PadB AS b
         |  FROM nt),
         |srt AS (
         |  SELECT n_tokens,
         |         (row_number() OVER (ORDER BY n_tokens, doc_id) - 1) // $PadB AS b
         |  FROM nt),
         |ab AS (SELECT b, count(*) AS cnt, max(n_tokens) AS mx,
         |              sum(n_tokens) AS tot FROM arr GROUP BY b),
         |sb AS (SELECT b, count(*) AS cnt, max(n_tokens) AS mx,
         |              sum(n_tokens) AS tot FROM srt GROUP BY b),
         |lay AS (
         |  SELECT 'arrival' AS layout, CAST(count(*) AS BIGINT) AS n_batches,
         |         CAST(sum(tot) AS BIGINT) AS real_tokens,
         |         CAST(sum(cnt * mx - tot) AS BIGINT) AS pad_tokens
         |  FROM ab
         |  UNION ALL
         |  SELECT 'sorted', CAST(count(*) AS BIGINT),
         |         CAST(sum(tot) AS BIGINT), CAST(sum(cnt * mx - tot) AS BIGINT)
         |  FROM sb)
         |SELECT layout, n_batches, real_tokens, pad_tokens,
         |       CAST(pad_tokens * 1000 // (real_tokens + pad_tokens) AS BIGINT)
         |         AS pad_pml
         |FROM lay ORDER BY layout""".stripMargin) { (s, d) =>
      import org.apache.spark.storage.StorageLevel
      val nt = docs(s, d)
        .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tokens"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      def layout(name: String, order: Seq[Column]): DataFrame =
        graft.operators.GroupedPrefixSum
          .runningSum(nt, Seq.empty, order, lit(1L), "rnk")
          .groupBy(expr(s"(rnk - 1) DIV $PadB").as("b"))
          .agg(count(lit(1)).as("cnt"), max("n_tokens").as("mx"),
            sum("n_tokens").as("tot"))
          .agg(count(lit(1)).as("n_batches"),
            sum("tot").as("real_tokens"),
            sum(col("cnt") * col("mx") - col("tot")).as("pad_tokens"))
          .select(lit(name).as("layout"), col("n_batches"),
            col("real_tokens"), col("pad_tokens"),
            expr("pad_tokens * 1000 DIV (real_tokens + pad_tokens)")
              .as("pad_pml"))
      layout("arrival", Seq(col("doc_id")))
        .unionAll(layout("sorted", Seq(col("n_tokens"), col("doc_id"))))
        .orderBy("layout")
    }
  )
}
