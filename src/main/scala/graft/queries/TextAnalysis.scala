package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GQuery, Tables}
import graft.functions.HashFunctions

/** Text-analysis operators over the `documents` table (beyond-reference;
  * the LLM-pipeline corpus-statistics surface): language identification,
  * quality scoring, token counting, and winnowing fingerprints.
  *
  * Every operator is a deterministic closed-form function of the text, so
  * each carries a full DuckDB value oracle that re-implements the same
  * arithmetic (same tokenization as graft.functions.TextHash; ratios are
  * single IEEE divisions of identical integer operands; composite scores
  * are fixed-order double arithmetic rounded to 6 decimals).
  *
  * Scale design (100 TB): all four are embarrassingly parallel one-pass
  * projections — no shuffle anywhere except the final presentation sort.
  * Everything stays inside whole-stage codegen (builtin functions +
  * higher-order array functions; the fingerprint hash is the codegen'd
  * shingle_hashes expression).
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles for the n-gram/stopword
    * language-ID heuristic. Deliberately small: the heuristic IS the
    * operator; the oracle mirrors the same profiles. */
  private val Profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "los", "de", "que", "y", "en", "un"),
    "fr" -> Seq("le", "la", "les", "des", "et", "est", "un", "dans"))

  private val W = 4 // winnowing window (shingle hashes per window)

  /** Minimum document frequency for a term to be keyword-eligible: the
    * vocabulary prune that bounds the broadcast side of the TF-IDF join
    * (declared BEFORE `queries` — the oracle SQL interpolates it eagerly). */
  private val KeywordMinDf = 2

  private def tokens(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => t =!= "")

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  private def profileSql(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  /** BPE merge steps trained by the q_text_bpe gate. */
  private val BpeSteps = 8

  /** DSIR target domain (q_curation_dsir): the sources whose bigram
    * distribution defines "high quality" for importance weighting. */
  private val DsirTargetSources = Seq("src1", "src2", "src3", "src4")
  private def DsirTargetSql: String =
    DsirTargetSources.map(s => s"'$s'").mkString(", ")

  /** Add-one bigram LM oracle CTEs ending in `sc(doc_id, k, m)` — per-doc
    * bigram counts with integer-millinat log-probs. Shared by the
    * q_text_lm_score gate and the quality-band percentile filter. */
  private val lmScoreCtes: String =
    s"""t AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |           w -> regexp_matches(w, '^[a-z]+$$') AND length(w) <= 20) AS wl
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, p[1] AS w1, p[2] AS w2
       |  FROM (SELECT doc_id,
       |          unnest(list_transform(range(1, len(wl)), i -> [wl[i], wl[i+1]])) AS p
       |        FROM t WHERE len(wl) >= 2)),
       |k AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS k
       |      FROM bg GROUP BY 1, 2, 3),
       |cbg AS (SELECT w1, w2, CAST(sum(k) AS BIGINT) AS cbg FROM k GROUP BY 1, 2),
       |cl  AS (SELECT w1, CAST(sum(k) AS BIGINT) AS cl FROM k GROUP BY 1),
       |v   AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
       |        FROM (SELECT unnest(wl) AS w FROM t)),
       |sc AS (
       |  SELECT k.doc_id, k.k,
       |         CAST(round(1000 * ln(CAST(cbg.cbg + 1 AS DOUBLE)
       |                              / CAST(cl.cl + v.v AS DOUBLE))) AS BIGINT) AS m
       |  FROM k
       |  JOIN cbg ON k.w1 = cbg.w1 AND k.w2 = cbg.w2
       |  JOIN cl ON k.w1 = cl.w1
       |  CROSS JOIN v)""".stripMargin

  /** Per-doc add-one bigram LM scores (doc_id, bigrams, score_millinats) —
    * the Spark twin of [[lmScoreCtes]]; unordered. */
  private def lmScores(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val wl = filter(tokens(col("text")),
      w => w.rlike("^[a-z]+$") && length(w) <= 20)
    // tokenized corpus persisted (r16): the vocabulary scalar and the
    // bigram table both consume `t` — unpersisted, the regex tokenize ran
    // twice over the corpus (the bm25ScoreMicro discipline, guide §2.4:
    // don't recompute what two consumers share)
    val t = docs(s, d).select(col("doc_id"), wl.as("wl"))
      .persist(StorageLevel.MEMORY_AND_DISK) // released by the harness clearCache
    val k = t.filter(size(col("wl")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(wl) - 1), i -> struct(wl[i-1] AS w1, wl[i] AS w2))"))
        .as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("k"))
      .persist(StorageLevel.MEMORY_AND_DISK) // model derives from k; released by the harness clearCache
    val cbg = k.groupBy("w1", "w2").agg(sum("k").as("cbg"))
    val cl = k.groupBy("w1").agg(sum("k").as("cl"))
    // V is one scalar of driver metadata (the vocabulary size)
    val vocabN = t.select(explode(col("wl")).as("w"))
      .agg(countDistinct(col("w"))).first().getLong(0)
    // model in BIGRAM space (r16, guide §2.3): m is a function of
    // (w1, w2) alone, so the cbg⨝cl join runs over the distinct-bigram
    // table and the doc-level k stream pays ONE (w1, w2) join instead of
    // two (the old shape joined the doc-level stream by (w1, w2) and then
    // re-shuffled that whole stream again by w1). m per bigram is the
    // identical expression over identical inputs — scores unchanged.
    val model = cbg.join(cl, Seq("w1"))
      .select(col("w1"), col("w2"),
        round(lit(1000d) * log((col("cbg") + lit(1)).cast("double")
          / (col("cl") + lit(vocabN)).cast("double"))).cast("long").as("m"))
    k.join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(sum("k").cast("long").as("bigrams"),
        sum(col("m") * col("k")).cast("long").as("score_millinats"))
  }

  /** Count-min sketch geometry (q_text_cms): CmsR hash rows × CmsW cells. */
  private val CmsR = 4
  private val CmsW = 64

  /** Fixed query-term set for the BM25 gate. */
  private[queries] val Bm25Terms = Seq("spark", "hash", "merge", "window")
  private[queries] val Bm25TermsSql = Bm25Terms.map(t => s"'$t'").mkString(", ")

  /** Shared BM25 scorer over the fixed [[Bm25Terms]] query (k1=1.2-ish
    * micro-integer contract of q_text_bm25): (doc_id, terms, score_micro)
    * for every document containing ≥1 query term. Reused by the hybrid
    * RRF gate (Similarity.q_text_hybrid_rrf) so both rankings share one
    * plan recipe: corpus tokenized once, term-filtered token stream
    * aggregated with map-side combine, df broadcast onto the tf rows. */
  private[queries] def bm25ScoreMicro(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val t = docs(s, d).select(col("doc_id"), tokens(col("text")).as("toks"))
      .persist(StorageLevel.MEMORY_AND_DISK) // stats collect + main pipeline; released by the harness clearCache
    // N and total-token count: two scalars of driver metadata
    val stats = t.agg(count(lit(1)), sum(size(col("toks")))).first()
    val (n, tt) = (stats.getLong(0), stats.getLong(1))
    val b = t
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("tok"))
      .filter(col("tok").isin(Bm25Terms: _*))
      .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).as("tf"))
    val df = b.groupBy("tok").agg(countDistinct(col("doc_id")).as("df"))
    val idf = log(lit(1.0) + ((lit(n) - col("df")).cast("double") + lit(0.5))
      / (col("df").cast("double") + lit(0.5)))
    val denom = col("tf") + lit(0.3) +
      lit(0.9) * ((col("dl") * lit(n)).cast("double") / lit(tt.toDouble))
    b.join(broadcast(df), "tok")
      .select(col("doc_id"),
        round(lit(1000000d) * idf * (col("tf") * lit(2.2)) / denom)
          .cast("long").as("c"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("terms"), sum("c").cast("long").as("score_micro"))
  }

  /** The multi-query batch for q_text_bm25_multi: (query_id, term). */
  private val Bm25Queries: Seq[(Long, String)] = Seq(
    1L -> "spark", 1L -> "shuffle", 1L -> "partition",
    2L -> "hash", 2L -> "join", 2L -> "merge",
    3L -> "window", 3L -> "sort", 3L -> "table", 3L -> "scan")
  private val Bm25QueriesSql =
    Bm25Queries.map { case (q, t) => s"(CAST($q AS BIGINT), '$t')" }.mkString(", ")

  /** The unrolled DuckDB oracle for q_text_bpe: the same weighted vocab,
    * the same pair counting and the same greedy merge application,
    * repeated [[BpeSteps]] times as explicit CTE stages (the q_kmeans
    * unrolled-oracle pattern). Words are space-joined symbol strings so a
    * merge is one `replace(' l r ', ' lr ')` — both engines' replace
    * scans left-to-right over non-overlapping occurrences, so the greedy
    * merge semantics coincide exactly. */
  private def bpeTrainCtes: String = {
    val stages = (1 to BpeSteps).map { k =>
      s"""p$k AS (
         |  SELECT u.pair[1] AS lhs, u.pair[2] AS rhs, CAST(sum(u.cnt) AS BIGINT) AS n
         |  FROM (
         |    SELECT cnt, unnest(list_transform(range(1, len(a)), i -> [a[i], a[i+1]])) AS pair
         |    FROM (SELECT cnt, list_filter(string_split(s, ' '), x -> x <> '') AS a
         |          FROM v${k - 1})
         |    WHERE len(a) >= 2
         |  ) u(cnt, pair)
         |  GROUP BY 1, 2),
         |b$k AS (SELECT lhs, rhs, n FROM p$k ORDER BY n DESC, lhs, rhs LIMIT 1),
         |v$k AS (
         |  SELECT replace(v.s, ' ' || b.lhs || ' ' || b.rhs || ' ',
         |                 ' ' || b.lhs || b.rhs || ' ') AS s, v.cnt
         |  FROM v${k - 1} v, b$k b)""".stripMargin
    }.mkString(",\n")
    s"""tok AS (
       |  SELECT list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS toks
       |  FROM documents),
       |w AS (
       |  SELECT token FROM (SELECT unnest(toks) AS token FROM tok)
       |  WHERE regexp_matches(token, '^[a-z]+$$') AND length(token) <= 20),
       |v0 AS (
       |  SELECT ' ' || array_to_string(
       |           list_transform(range(1, length(token) + 1), i -> token[i]), ' ')
       |         || ' ' AS s,
       |         CAST(count(*) AS BIGINT) AS cnt
       |  FROM w GROUP BY 1),
       |$stages""".stripMargin
  }

  private def bpeOracleSql: String = {
    val out = (1 to BpeSteps).map { k =>
      s"SELECT CAST($k AS BIGINT) AS step, lhs, rhs, lhs || rhs AS merged, n AS pair_count FROM b$k"
    }.mkString("\nUNION ALL ")
    // '#' margin: the interpolated CTEs are already |-stripped and contain
    // legitimate leading `||` / `' | '` text a second |-strip would eat
    s"""WITH $bpeTrainCtes
       #SELECT step, lhs, rhs, merged, pair_count FROM (
       #$out
       #) ORDER BY step""".stripMargin('#')
  }

  /** Oracle for q_text_bpe_encode: retrains the same merges (the b1..bN
    * CTEs above), then applies them to every document. Each doc becomes
    * ONE spaced symbol string with words separated by a ` | ` boundary
    * marker — '|' is outside [a-z], so a merge pattern ` l r ` can never
    * match across a word boundary, exactly like the Spark projection. */
  private def bpeEncodeOracleSql: String = {
    val apply = (1 to BpeSteps).map { k =>
      s"""d$k AS (
         |  SELECT d.doc_id, d.words, d.chars,
         |         replace(d.s, ' ' || b.lhs || ' ' || b.rhs || ' ',
         |                 ' ' || b.lhs || b.rhs || ' ') AS s
         |  FROM d${k - 1} d, b$k b)""".stripMargin
    }.mkString(",\n")
    // '#' margin for the same reason as [[bpeOracleSql]]
    s"""WITH $bpeTrainCtes,
       #d0 AS (
       #  SELECT doc_id,
       #         CAST(len(wl) AS BIGINT) AS words,
       #         CAST(length(array_to_string(wl, '')) AS BIGINT) AS chars,
       #         ' ' || array_to_string(
       #           list_transform(wl, t -> array_to_string(
       #             list_transform(range(1, length(t) + 1), i -> t[i]), ' ')),
       #           ' | ') || ' ' AS s
       #  FROM (SELECT doc_id,
       #          list_filter(regexp_split_to_array(lower(text), '\\s+'),
       #            t -> regexp_matches(t, '^[a-z]+$$') AND length(t) <= 20) AS wl
       #        FROM documents)),
       #$apply
       #SELECT doc_id, words, chars,
       #  CAST(len(list_filter(string_split(trim(s), ' '),
       #    x -> x <> '|' AND x <> '')) AS BIGINT) AS bpe_tokens
       #FROM d$BpeSteps ORDER BY doc_id""".stripMargin('#')
  }

  /** Shared BPE trainer: one corpus pass builds the weighted vocab, then
    * [[BpeSteps]] greedy merge rounds over the vocab table only (pair
    * explode → partial-combined argmax; ONE collected row per round, the
    * k-means-centroid pattern). Returns the merge rules in order.
    *
    * Deliberately NOT memoized (r16): an earlier revision cached the
    * trained rules in a module-level map keyed on the data directory, so
    * within one bench JVM only the first repetition of q_text_bpe /
    * q_text_bpe_encode actually trained — the reported median reflected
    * rule reuse, not the query's cost from the parquet inputs. Every
    * invocation now retrains; the rules stay driver metadata either way. */
  private def trainBpe(s: SparkSession, d: String): Seq[(Long, String, String, String, Long)] = {
    import org.apache.spark.storage.StorageLevel
    val vocab = docs(s, d)
      .select(explode(tokens(col("text"))).as("word"))
      .filter(col("word").rlike("^[a-z]+$") && length(col("word")) <= 20)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(col("cnt"),
        concat(lit(" "),
          concat_ws(" ", filter(split(col("word"), ""), x => x =!= "")),
          lit(" ")).as("s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var cur = vocab
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    for (step <- 1 to BpeSteps) {
      val best = cur
        .select(col("cnt"), split(trim(col("s")), " ").as("a"))
        .filter(size(col("a")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(a) - 1), i -> struct(a[i-1] AS lhs, a[i] AS rhs))"))
          .as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("lhs"), col("rhs"))
        .limit(1).collect()(0) // ONE row: this round's merge rule
      val (l, r, n) = (best.getString(0), best.getString(1), best.getLong(2))
      merges += ((step.toLong, l, r, l + r, n))
      // symbols are [a-z]+ by construction: safe as SQL string literals
      cur = cur.withColumn("s",
        expr(s"replace(s, ' $l $r ', ' $l$r ')"))
    }
    vocab.unpersist(false)
    merges.result()
  }

  val queries: Seq[GQuery] = Seq(

    // Gopher-style RULE-BASED quality filter: where q_text_quality emits a
    // composite score, this emits the per-rule boolean verdicts — the
    // explainable-filtering shape real curation pipelines keep (every
    // dropped doc records WHICH rule rejected it, so thresholds can be
    // audited and tuned per corpus). Rules (the Gopher repetition/length
    // family, integer-exact so both engines agree bit-for-bit):
    //   words:    20 <= n_tokens <= 100000
    //   wordlen:  mean token length in [3, 10]  (3n <= sum_len <= 10n)
    //   stop:     >= 2 stopword occurrences (the EN profile)
    //   distinct: distinct-token ratio >= 0.3  (10*n_distinct >= 3*n)
    // Scale: one codegen'd projection, no shuffle but the presentation
    // sort — the same one-pass layout as the other text operators.
    GQuery(
      "q_text_gopher_rules",
      s"""WITH
         |${OracleFragments.tok},
         |st AS (
         |  SELECT doc_id,
         |         CAST(len(toks) AS BIGINT) AS n_tokens,
         |         CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS sum_len,
         |         CAST(len(list_filter(toks,
         |           x -> list_contains(${profileSql(Profiles(1)._2)}, x))) AS BIGINT) AS n_stop,
         |         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
         |  FROM tok)
         |SELECT doc_id, n_tokens, sum_len, n_stop, n_distinct,
         |       n_tokens BETWEEN 20 AND 100000 AS flag_words,
         |       3*n_tokens <= sum_len AND sum_len <= 10*n_tokens AS flag_wordlen,
         |       n_stop >= 2 AS flag_stop,
         |       10*n_distinct >= 3*n_tokens AS flag_distinct,
         |       (n_tokens BETWEEN 20 AND 100000)
         |         AND 3*n_tokens <= sum_len AND sum_len <= 10*n_tokens
         |         AND n_stop >= 2 AND 10*n_distinct >= 3*n_tokens AS passes
         |FROM st ORDER BY doc_id""".stripMargin) { (s, d) =>
      val en = typedLit(Profiles(1)._2)
      docs(s, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          aggregate(transform(col("toks"), t => length(t)), lit(0),
            (acc, x) => acc + x).cast("long").as("sum_len"),
          size(filter(col("toks"), t => array_contains(en, t)))
            .cast("long").as("n_stop"),
          size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
        .withColumn("flag_words",
          col("n_tokens") >= 20 && col("n_tokens") <= 100000L)
        .withColumn("flag_wordlen",
          lit(3) * col("n_tokens") <= col("sum_len") &&
            col("sum_len") <= lit(10) * col("n_tokens"))
        .withColumn("flag_stop", col("n_stop") >= 2)
        .withColumn("flag_distinct",
          lit(10) * col("n_distinct") >= lit(3) * col("n_tokens"))
        .withColumn("passes",
          col("flag_words") && col("flag_wordlen") &&
            col("flag_stop") && col("flag_distinct"))
        .orderBy("doc_id")
    },

    // HTML MAIN-CONTENT extraction (the boilerplate-removal step UPSTREAM
    // of every text-quality signal; the trafilatura/jusText shape as
    // deterministic rules): strip <head>/<script>/<style>, split the body
    // into block elements, DROP blocks that are too short (< 10 chars —
    // ads/chrome) or link-dense (anchor text > half the block — nav/
    // footer), strip remaining tags, decode entities, and join what
    // survives. The fixture assembles each doc's page deterministically
    // from (text, doc_id, source) — inline <b>/<a> markup inside the main
    // paragraph, an &amp; entity on doc_id%3==0, boilerplate nav/ad/
    // footer — so the ORACLE derives the expected extraction
    // INDEPENDENTLY from the parts and the Spark side must recover it by
    // actually parsing the assembled HTML.
    //
    // Scale: one codegen'd projection (regexp + higher-order array
    // functions), no shuffle except the presentation sort.
    GQuery(
      "q_text_extract_html",
      """SELECT doc_id,
        |       text ||
        |       CASE WHEN doc_id % 3 = 0 THEN ' & more' ELSE '' END ||
        |       ' Summary for doc ' || doc_id || ' from ' || source ||
        |       ' count ' || n_chars || ' chars.' AS content
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val id = col("doc_id").cast("string")
      val words = split(col("text"), " ")
      val w1 = element_at(words, 1)
      val w2 = element_at(words, 2)
      val restAfter1 = col("text").substr(length(w1) + lit(2), length(col("text")))
      val restAfter2 = col("text").substr(
        length(w1) + length(w2) + lit(3), length(col("text")))
      // main paragraph: first word bolded; on doc_id%5==0 the second word
      // carries an inline anchor (link density stays LOW — the block must
      // survive the density rule); doc_id%3==0 appends an &amp; entity.
      // The anchor arm needs a second word to exist: a single-word doc
      // would make w2 null and null-propagate through the whole page, so
      // it falls back to the plain branch (whose restAfter1 is "" there).
      val mainP = concat(lit("<p><b>"), w1, lit("</b> "),
        when(col("doc_id") % 5 === 0 && size(words) >= 2,
          concat(lit("<a href=\"#\">"), w2, lit("</a> "), restAfter2))
          .otherwise(restAfter1),
        when(col("doc_id") % 3 === 0, " &amp; more").otherwise(""),
        lit("</p>"))
      val html = concat(
        lit("<html><head><title>Doc "), id,
        lit("</title><style>.x{color:red}</style><script>var x=1;</script></head><body>"),
        lit("<nav><a href=\"/\">Home</a> <a href=\"/d/"), id,
        lit("\">Doc page</a></nav>"),
        lit("<div>Ad "), (col("doc_id") % 10).cast("string"), lit("</div>"),
        mainP,
        lit("<p>Summary for doc "), id, lit(" from "), col("source"),
        lit(" count "), col("n_chars").cast("string"), lit(" chars.</p>"),
        lit("<footer><a href=\"/tos\">Terms of service</a> "),
        lit("<a href=\"/p\">Privacy policy</a> (c) 2024</footer></body></html>"))
      // ---- the extractor under test ----
      val noHead = regexp_replace(html, "(?s)<head>.*?</head>", " ")
      val clean = regexp_replace(noHead, "(?s)<(script|style)[^>]*>.*?</\\1>", " ")
      val blocks = regexp_extract_all(clean,
        lit("(?s)<(p|div|nav|footer|li|h[1-6])[^>]*>(.*?)</\\1>"), lit(2))
      def stripText(b: Column): Column =
        trim(regexp_replace(regexp_replace(b, lit("<[^>]*>"), lit(" ")),
          lit("\\s+"), lit(" ")))
      def anchorLen(b: Column): Column = length(regexp_replace(
        array_join(regexp_extract_all(b, lit("(?s)<a[^>]*>(.*?)</a>"), lit(1)), ""),
        lit("<[^>]*>"), lit("")))
      val kept = filter(blocks, b =>
        length(stripText(b)) >= 10 && anchorLen(b) * 2 <= length(stripText(b)))
      val joined = array_join(transform(kept, b => stripText(b)), " ")
      val decoded = regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(regexp_replace(joined,
          lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
          lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")),
        lit("&amp;"), lit("&"))
      docs(s, d)
        .select(col("doc_id"), trim(decoded).as("content"))
        .orderBy("doc_id")
    },

    // PII REDACTION (the C4/CCNet-family scrub stage every training
    // pipeline runs before publishing text): detect emails, phone
    // numbers, and IPv4 addresses by pattern and replace each with a
    // typed sentinel, reporting per-type counts. The corpus text is pure
    // [a-z ] (verified), so the fixture INJECTS PII deterministically
    // from doc_id (email on %2, phone on %3, IP on %5 — docs carry 0-3
    // hits in every combination) and the ORACLE composes the redacted
    // form and counts independently from the arms; the Spark side must
    // find and replace the actual patterns.
    //
    // Scale: one codegen'd projection (regexp_replace/regexp_count), no
    // shuffle.
    GQuery(
      "q_text_pii_redact",
      """SELECT doc_id,
        |  text ||
        |  CASE WHEN doc_id % 2 = 0 THEN ' contact <EMAIL>' ELSE '' END ||
        |  CASE WHEN doc_id % 3 = 0 THEN ' call <PHONE>' ELSE '' END ||
        |  CASE WHEN doc_id % 5 = 0 THEN ' host <IP>' ELSE '' END AS content,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_emails,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_phones,
        |  CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_ips
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val id = col("doc_id")
      val ids = id.cast("string")
      val withPii = concat(col("text"),
        when(id % 2 === 0, concat(lit(" contact user"), ids,
          lit("@mail"), (id % 5).cast("string"), lit(".example.com")))
          .otherwise(""),
        when(id % 3 === 0, concat(lit(" call +1-555-"),
          (id % 900 + 100).cast("string"), lit("-"),
          (id % 9000 + 1000).cast("string"))).otherwise(""),
        when(id % 5 === 0, concat(lit(" host 192.168."),
          (id % 256).cast("string"), lit("."),
          (id % 254 + 1).cast("string"))).otherwise(""))
      val emailRx = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRx = "\\+\\d{1,2}-\\d{3}-\\d{3}-\\d{4}"
      val ipRx = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
      docs(s, d).select(col("doc_id"), withPii.as("pii"))
        .select(col("doc_id"),
          regexp_replace(regexp_replace(regexp_replace(col("pii"),
            lit(emailRx), lit("<EMAIL>")),
            lit(phoneRx), lit("<PHONE>")),
            lit(ipRx), lit("<IP>")).as("content"),
          regexp_count(col("pii"), lit(emailRx)).cast("long").as("n_emails"),
          regexp_count(col("pii"), lit(phoneRx)).cast("long").as("n_phones"),
          // count IPs on the email-redacted text like the replace chain
          // does (an email's host must never double-count as an address)
          regexp_count(regexp_replace(col("pii"), lit(emailRx), lit("<EMAIL>")),
            lit(ipRx)).cast("long").as("n_ips"))
        .orderBy("doc_id")
    },

    // REPETITION signals (the two Gopher n-gram repetition rules the
    // boolean rule-set above does not cover): the character coverage of
    // the single most repeated 2-gram (templated text repeats one
    // phrase) and the characters inside 3-grams occurring more than once
    // (loops/boilerplate repeat longer spans). Both are integer-exact:
    // cover = occurrences x gram length over the SAME whitespace tokens
    // as every other text op, and the Gopher-threshold flags compare by
    // integer cross-multiplication (top-2-gram <= 20% of token chars,
    // duplicated-3-gram chars <= 18%).
    //
    // Scale: one codegen'd projection — gram_covers is a native Catalyst
    // expression doing one O(grams) hash-map pass per row
    // (TextHash.gramCoversU). Two interpreted formulations lost to it in
    // the 10x stress arm: the O(distinct x g) higher-order rescan (21x
    // wall growth) and a sorted-run fold (18x) — higher-order array
    // functions are CodegenFallback, so per-row compute of this shape
    // belongs in a native expression, the deflate_len precedent. No
    // shuffle.
    GQuery(
      "q_text_repetition",
      s"""WITH ${OracleFragments.tok},
         |g AS (
         |  SELECT doc_id, toks,
         |         CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
         |           AS BIGINT) AS tok_chars,
         |         list_transform(range(1, len(toks)),
         |           i -> toks[i] || ' ' || toks[i+1]) AS bg,
         |         list_transform(range(1, len(toks) - 1),
         |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS tg
         |  FROM tok),
         |c AS (
         |  SELECT doc_id, tok_chars,
         |         CAST(coalesce(list_max(list_transform(list_distinct(bg),
         |           x -> len(list_filter(bg, y -> y = x)) * length(x))), 0)
         |           AS BIGINT) AS top2_cover,
         |         CAST(coalesce(list_sum(list_transform(list_distinct(tg),
         |           x -> CASE WHEN len(list_filter(tg, y -> y = x)) > 1
         |                THEN len(list_filter(tg, y -> y = x)) * length(x)
         |                ELSE 0 END)), 0) AS BIGINT) AS dup3_chars
         |  FROM g)
         |SELECT doc_id, tok_chars, top2_cover, dup3_chars,
         |       top2_cover * 5 <= tok_chars AS flag_top2,
         |       dup3_chars * 50 <= tok_chars * 9 AS flag_dup3
         |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      val gc = HashFunctions.gram_covers(col("text"))
      docs(s, d)
        .select(col("doc_id"), gc.as("gc"))
        .select(col("doc_id"), col("gc.tok_chars").as("tok_chars"),
          col("gc.top2_cover").as("top2_cover"),
          col("gc.dup3_chars").as("dup3_chars"))
        .withColumn("flag_top2", col("top2_cover") * 5 <= col("tok_chars"))
        .withColumn("flag_dup3", col("dup3_chars") * 50 <= col("tok_chars") * 9)
        .orderBy("doc_id")
    },

    // Compressibility quality signal (the Gopher/RefinedWeb-family
    // "compression ratio" filter): zlib-deflate each document and keep
    // the ratio — templated/repeated text compresses far below natural
    // prose, so a low ratio flags boilerplate the n-gram rules miss.
    // deflate_len is a native codegen'd expression (per-thread reused
    // deflater, no UDF boxing); like q_cardinality, the zlib-dependent
    // values verify as tolerance BOOLEANS the oracle pins to TRUE, with
    // bounds that hold at ANY document size:
    //   ratio_ok: zlib's worst case is input + ~5 bytes per 64 KiB
    //     stored block + framing, so the slack scales with the input;
    //   repetition_responsive: text||text back-references the first copy
    //     ONLY within deflate's 32 KiB window, so the doubling check
    //     applies to docs that fit the window (larger docs pass
    //     vacuously — the signal still works, the margin just shrinks
    //     to framing bytes, too thin to assert on).
    // Scale: one codegen'd projection, no shuffle.
    GQuery(
      "q_text_compress_ratio",
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_m,
        |       TRUE AS ratio_ok, TRUE AS repetition_responsive
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      HashFunctions.ensure(s)
      val dl = HashFunctions.deflate_len(col("text"))
      val dl2 = HashFunctions.deflate_len(concat(col("text"), col("text")))
      val bytes = octet_length(col("text")).cast("long")
      docs(s, d)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars_m"),
          (dl > 0 && dl <= bytes + lit(64) + bytes / 1024).as("ratio_ok"),
          (bytes > 16384 || dl2 < dl * 2).as("repetition_responsive"))
        .orderBy("doc_id")
    },

    // Unigram token-distribution entropy — the vocabulary-diversity
    // quality signal (low entropy = a few tokens dominate = templated/
    // spammy text; complements the zlib ratio, which sees ORDER as well
    // as distribution). Determinism across engines follows the
    // q_text_lm_score recipe: each distinct token's ln(n/k) is rounded
    // to integer MILLINATS first, the per-doc sum Σ k·m is then exact
    // integer arithmetic, and the per-token mean rounds in integer
    // space. Scale: one exchange on (doc_id, token) for the counts, a
    // second metadata-sized one on doc_id for the roll-up.
    GQuery(
      "q_text_token_entropy",
      s"""WITH
         |${OracleFragments.tok},
         |tc AS (
         |  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS k
         |  FROM (SELECT doc_id, unnest(toks) AS t FROM tok) GROUP BY 1, 2),
         |tn AS (
         |  SELECT doc_id, t, k, CAST(sum(k) OVER (PARTITION BY doc_id) AS BIGINT) AS n
         |  FROM tc),
         |tm AS (
         |  SELECT doc_id, n, k,
         |         CAST(round(1000 * ln(CAST(n AS DOUBLE) / CAST(k AS DOUBLE)))
         |              AS BIGINT) AS m
         |  FROM tn)
         |SELECT doc_id,
         |       CAST(max(n) AS BIGINT) AS n_tokens,
         |       CAST(count(*) AS BIGINT) AS n_distinct_toks,
         |       CAST(sum(k * m) AS BIGINT) AS h_millinat_sum,
         |       CAST(round(CAST(sum(k * m) AS DOUBLE) * 1000 / max(n)) AS BIGINT)
         |         AS h_per_tok_micro
         |FROM tm GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val counts = docs(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
        .groupBy("doc_id", "t").agg(count(lit(1)).cast("long").as("k"))
      val withN = counts.withColumn("n",
        sum(col("k")).over(Window.partitionBy("doc_id")).cast("long"))
      withN
        .withColumn("m",
          round(lit(1000d) * log(col("n").cast("double") / col("k").cast("double")))
            .cast("long"))
        .groupBy("doc_id")
        .agg(max(col("n")).cast("long").as("n_tokens"),
          count(lit(1)).cast("long").as("n_distinct_toks"),
          sum(col("k") * col("m")).cast("long").as("h_millinat_sum"),
          round(sum(col("k") * col("m")).cast("double") * lit(1000) / max(col("n")))
            .cast("long").as("h_per_tok_micro"))
        .orderBy("doc_id")
    },

    // BPE tokenizer training (byte-pair encoding merges): the canonical
    // subword-vocabulary trainer, run as a real distributed pipeline.
    //   - ONE corpus pass builds the weighted word vocabulary (clean
    //     [a-z]+ tokens, occurrence counts) — after that, every Lloyd's-
    //     style iteration runs over the VOCAB table (bounded by distinct
    //     words, metadata-scale next to the corpus), never the corpus.
    //   - Each of the 8 merge rounds: adjacent symbol pairs exploded with
    //     word weights → one partial-combined aggregation → the single
    //     argmax row collected (one row per round, the k-means-centroid
    //     pattern) → the merge applied as a codegen'd string replace.
    //   - Words are ' '-joined symbol strings: `replace(' l r ', ' lr ')`
    //     IS the greedy left-to-right non-overlapping BPE merge, and both
    //     engines' replace builtins share that exact semantics, which is
    //     what makes the 8-stage unrolled DuckDB oracle value-exact.
    //   100 TB: the corpus pass is the only full-data scan; vocab fits
    //   any single executor's shuffle comfortably (language vocabularies
    //   are millions of words, not billions) but stays distributed here —
    //   no driver materialization beyond one argmax row per round.
    GQuery("q_text_bpe", bpeOracleSql) { (s, d) =>
      import s.implicits._
      trainBpe(s, d).toDF("step", "lhs", "rhs", "merged", "pair_count")
        .orderBy("step")
    },

    // BPE encode (apply the trained merges to the corpus): per-document
    // subword token counts — the pipeline stage that prices a corpus in
    // tokens (mix budgeting, packing, per-doc compression diagnostics).
    //   The trained merges are driver-side metadata (BpeSteps rows), so
    // encoding is ONE embarrassingly-parallel codegen'd projection over
    // the corpus: each doc becomes a spaced symbol string (words joined
    // with a ' | ' boundary marker so merges never cross words), the
    // merge rules fold into a chain of `replace` calls, and the token
    // count is a split-and-filter. No join, no shuffle — at 100 TB the
    // replace chain costs CPU inside whole-stage codegen instead of
    // shuffling a corpus-scale exploded token stream through a vocab
    // join. All-integer outputs; value-exact against the d0..dN unrolled
    // oracle (same retrained merges, same boundary-marker semantics).
    GQuery("q_text_bpe_encode", bpeEncodeOracleSql) { (s, d) =>
      val merges = trainBpe(s, d)
      val clean = filter(tokens(col("text")),
        w => w.rlike("^[a-z]+$") && length(w) <= 20)
      val spaced = transform(clean,
        w => concat_ws(" ", filter(split(w, ""), c => c =!= "")))
      val s0 = concat(lit(" "), array_join(spaced, " | "), lit(" "))
      val encoded = merges.foldLeft(s0) { case (acc, (_, l, r, _, _)) =>
        // symbols are [a-z]+ by construction: the literal is safe
        call_function("replace", acc, lit(s" $l $r "), lit(s" $l$r "))
      }
      docs(s, d)
        .select(col("doc_id"),
          size(clean).cast("long").as("words"),
          length(array_join(clean, "")).cast("long").as("chars"),
          size(filter(split(trim(encoded), " "),
            x => x =!= "|" && x =!= "")).cast("long").as("bpe_tokens"))
        .orderBy("doc_id")
    },

    // BM25 retrieval scoring (Okapi, k1=1.2 b=0.75): the standard lexical
    // relevance ranker — the retrieval half of retrieval-based curation
    // (query-driven corpus slicing, decontamination probes, eval-set
    // mining). Scores every document against a fixed query-term set and
    // returns the top 20.
    //   Determinism: all model inputs are exact integers (tf, dl, df, N,
    // total tokens); each (doc, term) contribution is ONE fixed IEEE
    // expression tree over them — identical operator order in both
    // engines, the only libm call is ln — rounded to integer MICRO units
    // before the per-doc integer sum (the q_text_lm_score discipline).
    //   Scale (100 TB): doc length rides along the token explode (no
    // doc-level join); the explode is filtered to the query terms BEFORE
    // any shuffle (vocab-bounded survivors); per-term df is a 4-row
    // broadcast; the final top-k is a TakeOrdered, never a global sort.
    GQuery("q_text_bm25",
      s"""WITH t AS (
         |  SELECT doc_id,
         |         list_filter(regexp_split_to_array(lower(text), '\\s+'),
         |           x -> x <> '') AS toks
         |  FROM documents),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(len(toks)) AS BIGINT) AS tt FROM t),
         |b AS (
         |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, tok,
         |         CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, toks, unnest(toks) AS tok FROM t)
         |  WHERE tok IN ($Bm25TermsSql)
         |  GROUP BY 1, 2, 3),
         |d AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |      FROM b GROUP BY 1),
         |sc AS (
         |  SELECT b.doc_id,
         |         CAST(round(1000000 * ln(1.0 + (CAST(s.n - d.df AS DOUBLE) + 0.5)
         |                                      / (CAST(d.df AS DOUBLE) + 0.5))
         |              * (b.tf * 2.2)
         |              / (b.tf + 0.3 + 0.9 * (CAST(b.dl * s.n AS DOUBLE)
         |                                     / CAST(s.tt AS DOUBLE)))) AS BIGINT) AS c
         |  FROM b JOIN d ON b.tok = d.tok CROSS JOIN s)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS terms,
         |       CAST(sum(c) AS BIGINT) AS score_micro
         |FROM sc GROUP BY doc_id
         |ORDER BY score_micro DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
      bm25ScoreMicro(s, d)
        .orderBy(col("score_micro").desc, col("doc_id"))
        .limit(20)
    },

    // Multi-query BM25 (batch search serving): a QUERY TABLE — not one
    // term set — scored against the whole corpus in a single plan, top-5
    // docs per query. The shape a curation stack runs for eval-set
    // mining or retrieval audits: q queries × corpus in one pass.
    //   Same integer-micro contract as q_text_bm25. Per-query top-k is
    // the grouped-top-N shape: rank inside each query partition, never a
    // global sort; df/idf stay per-TERM (computed once, shared by every
    // query that uses the term). The query table broadcasts onto the
    // term-filtered token stream — the corpus shuffles once, on
    // (query_id, doc) aggregation, with map-side combine.
    GQuery("q_text_bm25_multi",
      s"""WITH qt(query_id, term) AS (VALUES $Bm25QueriesSql),
         |t AS (
         |  SELECT doc_id,
         |         list_filter(regexp_split_to_array(lower(text), '\\s+'),
         |           x -> x <> '') AS toks
         |  FROM documents),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(len(toks)) AS BIGINT) AS tt FROM t),
         |b AS (
         |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, tok,
         |         CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, toks, unnest(toks) AS tok FROM t)
         |  WHERE tok IN (SELECT term FROM qt)
         |  GROUP BY 1, 2, 3),
         |d AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |      FROM b GROUP BY 1),
         |sc AS (
         |  SELECT qt.query_id, b.doc_id,
         |         CAST(round(1000000 * ln(1.0 + (CAST(s.n - d.df AS DOUBLE) + 0.5)
         |                                      / (CAST(d.df AS DOUBLE) + 0.5))
         |              * (b.tf * 2.2)
         |              / (b.tf + 0.3 + 0.9 * (CAST(b.dl * s.n AS DOUBLE)
         |                                     / CAST(s.tt AS DOUBLE)))) AS BIGINT) AS c
         |  FROM b JOIN d ON b.tok = d.tok
         |  JOIN qt ON qt.term = b.tok CROSS JOIN s),
         |agg AS (
         |  SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS terms,
         |         CAST(sum(c) AS BIGINT) AS score_micro
         |  FROM sc GROUP BY 1, 2)
         |SELECT query_id, rnk, doc_id, terms, score_micro FROM (
         |  SELECT query_id, doc_id, terms, score_micro,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |           ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rnk
         |  FROM agg) WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.storage.StorageLevel
      import s.implicits._
      val qt = Bm25Queries.toDF("query_id", "term")
      val terms = Bm25Queries.map(_._2).distinct
      val t = docs(s, d).select(col("doc_id"), tokens(col("text")).as("toks"))
        .persist(StorageLevel.MEMORY_AND_DISK) // stats collect + main pipeline; released by the harness clearCache
      val stats = t.agg(count(lit(1)), sum(size(col("toks")))).first()
      val (n, tt) = (stats.getLong(0), stats.getLong(1))
      val b = t
        .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
          explode(col("toks")).as("tok"))
        .filter(col("tok").isin(terms: _*))
        .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).as("tf"))
      val df = b.groupBy("tok").agg(countDistinct(col("doc_id")).as("df"))
      val idf = log(lit(1.0) + ((lit(n) - col("df")).cast("double") + lit(0.5))
        / (col("df").cast("double") + lit(0.5)))
      val denom = col("tf") + lit(0.3) +
        lit(0.9) * ((col("dl") * lit(n)).cast("double") / lit(tt.toDouble))
      val sc = b.join(broadcast(df), "tok")
        .join(broadcast(qt), col("tok") === col("term"))
        .select(col("query_id"), col("doc_id"),
          round(lit(1000000d) * idf * (col("tf") * lit(2.2)) / denom)
            .cast("long").as("c"))
        .groupBy("query_id", "doc_id")
        .agg(count(lit(1)).as("terms"), sum("c").cast("long").as("score_micro"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("score_micro").desc, col("doc_id"))
      sc.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .select(col("query_id"), col("rnk"), col("doc_id"),
          col("terms"), col("score_micro"))
        .orderBy("query_id", "rnk")
    },

    // Bigram-LM quality scoring (the CCNet/perplexity-filter shape): an
    // add-one-smoothed bigram language model trained on the corpus scores
    // every document; low (more-negative) average log-prob = unusual text
    // — the standard statistical quality signal for corpus filtering.
    //   Determinism across engines: per-bigram log-probs are rounded to
    // integer MILLINATS first (`round(1000·ln p)` — one double division
    // of identical integers, one ln, both bit-stable at that resolution),
    // then integer-summed per doc. The doc score ships as two BIGINT
    // columns (sum + count), never a float average, so the compare is
    // hash-exact (the ratio-rounding rule from the verify contract).
    //   Scale (100 TB): the per-doc bigram table is map-side pre-
    // aggregated (doc_id,w1,w2 → k) before any shuffle; the model tables
    // (bigram counts, left-context counts) derive from IT, not from a
    // second corpus pass, and are vocab²-bounded; V is one scalar. The
    // two model joins shuffle the deduped bigram stream — the honest cost
    // of EXACT scoring; a production deployment would prune the model to
    // top-M bigrams and broadcast it, which this plan degrades to by
    // swapping the join for a broadcast lookup.
    GQuery("q_text_lm_score",
      s"""WITH $lmScoreCtes
         |SELECT doc_id,
         |       CAST(sum(k) AS BIGINT) AS bigrams,
         |       CAST(sum(m * k) AS BIGINT) AS score_millinats
         |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      lmScores(s, d).orderBy("doc_id")
    },

    // Winsorized quality band (exact P10–P90 selection): keep the docs
    // whose LM score lies between the EXACT 10th and 90th percentiles —
    // the two-sided trim a curation stack applies before mixing (drop
    // gibberish AND boilerplate-degenerate ends). Percentiles are exact
    // and integer-valued: threshold = smallest score whose cumulative
    // count reaches ceil(q·n).
    //   Scale (100 TB): the cumulative distribution runs over the
    // DISTINCT-score table via the two-pass grouped prefix sum (range-
    // partitioned, per-partition subtotals prefix-summed on the driver as
    // metadata) — no single-task global window anywhere; the band filter
    // itself is one shuffle-free projection of the scored corpus.
    GQuery("q_curation_quality_band",
      s"""WITH $lmScoreCtes,
         |d AS (SELECT doc_id, CAST(sum(m * k) AS BIGINT) AS score_millinats
         |      FROM sc GROUP BY doc_id),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
         |cum AS (SELECT score_millinats, sum(count(*))
         |          OVER (ORDER BY score_millinats) AS cum
         |        FROM d GROUP BY score_millinats),
         |lo AS (SELECT min(score_millinats) AS lo FROM cum CROSS JOIN n
         |       WHERE cum >= (n + 9) // 10),
         |hi AS (SELECT min(score_millinats) AS hi FROM cum CROSS JOIN n
         |       WHERE cum >= (9 * n + 9) // 10)
         |SELECT doc_id, score_millinats
         |FROM d CROSS JOIN lo CROSS JOIN hi
         |WHERE score_millinats >= lo AND score_millinats <= hi
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.storage.StorageLevel
      // doc-sized (doc_id, score) table: the CDF pass, the n scalar and
      // the final band filter all read it — persist once or the bigram
      // scoring join recomputes three times
      val scored = lmScores(s, d).select("doc_id", "score_millinats")
        .persist(StorageLevel.MEMORY_AND_DISK) // released by the harness clearCache
      val cnt = scored.groupBy("score_millinats").agg(count(lit(1)).as("c"))
      val cum = graft.operators.GroupedPrefixSum.runningSum(
        cnt, Seq.empty, Seq(col("score_millinats")), col("c"), "cum")
      // n and the two thresholds are driver metadata (three scalars).
      // r16: both thresholds probe in ONE job — two conditional mins over
      // the same (checkpointed, score-distinct-sized) CDF instead of two
      // separate filtered-agg jobs with identical scans.
      val n = cnt.agg(sum("c")).first().getLong(0)
      val (loT, hiT) = ((n + 9) / 10, (9 * n + 9) / 10)
      val thr = cum.agg(
        min(when(col("cum") >= loT, col("score_millinats"))).as("lo"),
        min(when(col("cum") >= hiT, col("score_millinats"))).as("hi")).first()
      val lo = thr.getLong(0)
      val hi = thr.getLong(1)
      scored.filter(col("score_millinats") >= lo && col("score_millinats") <= hi)
        .orderBy("doc_id")
    },

    // DSIR-shaped importance weighting (public recipe: Xie et al. 2023,
    // "Data Selection via Importance Resampling"): score every document
    // by how much more likely its bigrams are under a TARGET model
    // (trained on the curated sources) than under the RAW corpus model —
    // the standard way a web-scale crawl is filtered toward a
    // high-quality domain. Both models are the q_text_lm_score add-one
    // bigram estimator; the importance weight is Σ k·(m_target − m_raw)
    // in integer millinats, each log rounded identically in both engines
    // BEFORE the exact integer sum. Deterministic top-50 selection by
    // (weight DESC, doc_id) — the rank-selection variant of DSIR's
    // Gumbel resampling.
    //   Scale (100 TB): ONE per-doc bigram pass (persisted) feeds both
    // models AND the scoring join; model tables are vocab²-bounded and
    // map-side combined; the two vocab sizes are one driver scalar pass;
    // the top-50 is a TakeOrdered, never a global sort.
    GQuery("q_curation_dsir",
      s"""WITH t AS (
         |  SELECT doc_id,
         |         CAST(source IN ($DsirTargetSql) AS BIGINT) AS tgt,
         |         list_filter(regexp_split_to_array(lower(text), '\\s+'),
         |           w -> regexp_matches(w, '^[a-z]+$$') AND length(w) <= 20) AS wl
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id, tgt, p[1] AS w1, p[2] AS w2
         |  FROM (SELECT doc_id, tgt,
         |          unnest(list_transform(range(1, len(wl)), i -> [wl[i], wl[i+1]])) AS p
         |        FROM t WHERE len(wl) >= 2)),
         |k AS (SELECT doc_id, tgt, w1, w2, CAST(count(*) AS BIGINT) AS k
         |      FROM bg GROUP BY 1, 2, 3, 4),
         |cbr AS (SELECT w1, w2, CAST(sum(k) AS BIGINT) AS cbg_r FROM k GROUP BY 1, 2),
         |clr AS (SELECT w1, CAST(sum(k) AS BIGINT) AS cl_r FROM k GROUP BY 1),
         |cbt AS (SELECT w1, w2, CAST(sum(k) AS BIGINT) AS cbg_t
         |        FROM k WHERE tgt = 1 GROUP BY 1, 2),
         |clt AS (SELECT w1, CAST(sum(k) AS BIGINT) AS cl_t
         |        FROM k WHERE tgt = 1 GROUP BY 1),
         |v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS vr,
         |             CAST(count(DISTINCT CASE WHEN tgt = 1 THEN w END) AS BIGINT) AS vt
         |      FROM (SELECT tgt, unnest(wl) AS w FROM t)),
         |sc AS (
         |  SELECT k.doc_id, k.tgt, k.k,
         |         CAST(round(1000 * ln(CAST(COALESCE(cbt.cbg_t, 0) + 1 AS DOUBLE)
         |                              / CAST(COALESCE(clt.cl_t, 0) + v.vt AS DOUBLE))) AS BIGINT)
         |       - CAST(round(1000 * ln(CAST(cbr.cbg_r + 1 AS DOUBLE)
         |                              / CAST(clr.cl_r + v.vr AS DOUBLE))) AS BIGINT) AS m
         |  FROM k
         |  JOIN cbr ON k.w1 = cbr.w1 AND k.w2 = cbr.w2
         |  JOIN clr ON k.w1 = clr.w1
         |  LEFT JOIN cbt ON k.w1 = cbt.w1 AND k.w2 = cbt.w2
         |  LEFT JOIN clt ON k.w1 = clt.w1
         |  CROSS JOIN v)
         |SELECT doc_id, tgt AS in_target,
         |       CAST(sum(k) AS BIGINT) AS bigrams,
         |       CAST(sum(m * k) AS BIGINT) AS w_millinats
         |FROM sc GROUP BY doc_id, tgt
         |ORDER BY w_millinats DESC, doc_id LIMIT 50""".stripMargin) { (s, d) =>
      import org.apache.spark.storage.StorageLevel
      val wl = filter(tokens(col("text")),
        w => w.rlike("^[a-z]+$") && length(w) <= 20)
      // tokenized corpus persisted (r16): the vocab-pair scalar pass and
      // the bigram table both consume `t` — see lmScores
      val t = docs(s, d).select(col("doc_id"),
        col("source").isin(DsirTargetSources: _*).cast("long").as("tgt"),
        wl.as("wl"))
        .persist(StorageLevel.MEMORY_AND_DISK) // released by the harness clearCache
      val k = t.filter(size(col("wl")) >= 2)
        .select(col("doc_id"), col("tgt"), explode(expr(
          "transform(sequence(1, size(wl) - 1), i -> struct(wl[i-1] AS w1, wl[i] AS w2))"))
          .as("p"))
        .select(col("doc_id"), col("tgt"), col("p.w1").as("w1"), col("p.w2").as("w2"))
        .groupBy("doc_id", "tgt", "w1", "w2").agg(count(lit(1)).as("k"))
        .persist(StorageLevel.MEMORY_AND_DISK) // both models + scoring derive from k; released by the harness clearCache
      val cbr = k.groupBy("w1", "w2").agg(sum("k").as("cbg_r"))
      val clr = k.groupBy("w1").agg(sum("k").as("cl_r"))
      val cbt = k.filter(col("tgt") === 1)
        .groupBy("w1", "w2").agg(sum("k").as("cbg_t"))
      val clt = k.filter(col("tgt") === 1)
        .groupBy("w1").agg(sum("k").as("cl_t"))
      // the two vocabulary sizes: one driver scalar pass
      val vrow = t.select(col("tgt"), explode(col("wl")).as("w"))
        .agg(countDistinct(col("w")),
          countDistinct(when(col("tgt") === 1, col("w")))).first()
      val (vr, vt) = (vrow.getLong(0), vrow.getLong(1))
      val mT = round(lit(1000d) * log((coalesce(col("cbg_t"), lit(0L)) + lit(1)).cast("double")
        / (coalesce(col("cl_t"), lit(0L)) + lit(vt)).cast("double"))).cast("long")
      val mR = round(lit(1000d) * log((col("cbg_r") + lit(1)).cast("double")
        / (col("cl_r") + lit(vr)).cast("double"))).cast("long")
      // model delta in BIGRAM space (r16, guide §2.3): the four model
      // joins run over the distinct-bigram table (cbr anchors — it covers
      // every bigram k contains, so the final inner join is lossless);
      // the doc-level k stream then pays ONE (w1, w2) join instead of
      // four shuffles (two of them re-keying the whole doc-level stream
      // by w1). m per bigram is the identical expression — weights
      // unchanged.
      val model = cbr.join(clr, Seq("w1"))
        .join(cbt, Seq("w1", "w2"), "left").join(clt, Seq("w1"), "left")
        .select(col("w1"), col("w2"), (mT - mR).as("m"))
      k.join(model, Seq("w1", "w2"))
        .select(col("doc_id"), col("tgt"), col("k"), col("m"))
        .groupBy("doc_id", "tgt")
        .agg(sum("k").cast("long").as("bigrams"),
          sum(col("m") * col("k")).cast("long").as("w_millinats"))
        .select(col("doc_id"), col("tgt").as("in_target"),
          col("bigrams"), col("w_millinats"))
        .orderBy(col("w_millinats").desc, col("doc_id"))
        .limit(50)
    },

    // Corpus vocabulary statistics: top tokens by document frequency with
    // global term frequency — the tokenizer-training / stopword-discovery
    // prep pass. All-integer outputs, deterministic tie-break on token.
    //   Scale: explode → distinct(token, doc) → count is the standard
    // vocab pass; partial aggregation combines map-side on token, the
    // top-k is a TakeOrdered over the K·partitions survivors, never a
    // global sort of the vocabulary.
    GQuery(
      "q_text_vocab",
      """WITH tok AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |t AS (SELECT doc_id, unnest(toks) AS token FROM tok)
        |SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
        |       CAST(count(*) AS BIGINT) AS term_freq
        |FROM t GROUP BY token
        |ORDER BY doc_freq DESC, term_freq DESC, token LIMIT 25""".stripMargin) { (s, d) =>
      docs(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
        .groupBy("token")
        .agg(countDistinct(col("doc_id")).as("doc_freq"),
          count(lit(1)).as("term_freq"))
        .orderBy(col("doc_freq").desc, col("term_freq").desc, col("token"))
        .limit(25)
    },

    // Bigram collocation mining by PMI-style lift — the phrase-discovery
    // pass a tokenizer/vocab pipeline runs before merging multi-word
    // units. lift(x,y) = P(x,y) / (P(x·)·P(·y)) over the bigram table:
    //   lift = (c_xy · B) / (c_xl · c_yr)
    // with c_xl/c_yr the bigram marginals and B the bigram total.
    //   Determinism: both engines compute the SAME two exact integer
    // products (< 2^53 at gate scale) and ONE IEEE division — bit-equal
    // without rounding. (At 100 TB the products overflow; production
    // would compare in log space — the plan shape is identical.)
    //   Scale: bigram counts combine map-side on (x,y); the marginals are
    // vocab-sized second aggregates OF THE COUNTS (never re-reading the
    // corpus); the min-count filter prunes the heavy tail BEFORE the two
    // marginal joins, so the join inputs are the c_xy≥5 survivors, not
    // the full bigram table; B broadcasts as one row; top-k is a
    // TakeOrdered, not a global sort.
    GQuery(
      "q_text_pmi",
      """WITH tok AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |bgl AS (
        |  SELECT list_transform(range(1, len(toks)), i -> [toks[i], toks[i+1]]) AS bgs
        |  FROM tok WHERE len(toks) >= 2),
        |bgr AS (SELECT unnest(bgs) AS bg FROM bgl),
        |cxy AS (SELECT bg[1] AS x, bg[2] AS y, CAST(count(*) AS BIGINT) AS c_xy
        |        FROM bgr GROUP BY 1, 2),
        |cx AS (SELECT x, CAST(sum(c_xy) AS BIGINT) AS c_xl FROM cxy GROUP BY x),
        |cy AS (SELECT y, CAST(sum(c_xy) AS BIGINT) AS c_yr FROM cxy GROUP BY y),
        |tot AS (SELECT CAST(sum(c_xy) AS BIGINT) AS b FROM cxy)
        |SELECT x, y, c_xy, c_xl, c_yr,
        |       CAST(c_xy * b AS DOUBLE) / CAST(c_xl * c_yr AS DOUBLE) AS lift
        |FROM cxy JOIN cx USING (x) JOIN cy USING (y) CROSS JOIN tot
        |WHERE c_xy >= 5
        |ORDER BY lift DESC, x, y LIMIT 30""".stripMargin) { (s, d) =>
      val bg = docs(s, d)
        .select(tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2) // sequence(0, -1) would descend
        .select(explode(expr(
          "transform(sequence(0, size(toks) - 2), " +
            "i -> struct(toks[i] AS x, toks[i + 1] AS y))")).as("b"))
        .select(col("b.x").as("x"), col("b.y").as("y"))
      val cxy = bg.groupBy("x", "y").agg(count(lit(1)).as("c_xy")).persist()
      val cx = cxy.groupBy("x").agg(sum("c_xy").as("c_xl"))
      val cy = cxy.groupBy("y").agg(sum("c_xy").as("c_yr"))
      val tot = cxy.agg(sum("c_xy").as("b"))
      cxy.filter(col("c_xy") >= 5)
        .join(cx, "x").join(cy, "y")
        .crossJoin(broadcast(tot))
        .select(col("x"), col("y"), col("c_xy"), col("c_xl"), col("c_yr"),
          ((col("c_xy") * col("b")).cast("double") /
            (col("c_xl") * col("c_yr")).cast("double")).as("lift"))
        .orderBy(col("lift").desc, col("x"), col("y"))
        .limit(30)
    },

    // Corpus quality statistics + a composite quality score: length,
    // token counts, mean token length, stopword ratio, a bounded-length
    // reward — the standard pre-training quality-filter features.
    // Determinism: every displayed ratio here is integer/integer, so the
    // rounding happens in INTEGER space — round(num·10^6 / den) with an
    // exact-double numerator — instead of round(double, 6), whose decimal
    // tie digit can straddle one ulp between engines (observed at sf0.1:
    // a quality score landing exactly on a .xxxxxx5 boundary). The
    // composite score is put over the common denominator 200·n_tokens:
    //   quality = min(nt,50)/100 + 3·n_stop/(10·nt) + min(sum_len,8·nt)/(40·nt)
    //           = (2·nt·min(nt,50) + 60·n_stop + 5·min(sum_len,8·nt)) / (200·nt)
    // Numerators stay < 2^53, so num·10^6 is exact and both engines round
    // the identical double to the identical integer.
    GQuery(
      "q_text_quality",
      s"""WITH
         |${OracleFragments.tok},
         |st AS (
         |  SELECT d.doc_id,
         |         length(d.text) AS n_chars_m,
         |         CAST(len(t.toks) AS BIGINT) AS n_tokens,
         |         CAST(list_sum(list_transform(t.toks, x -> length(x))) AS BIGINT) AS sum_len,
         |         CAST(len(list_filter(t.toks,
         |           x -> list_contains(${profileSql(Profiles(1)._2)}, x))) AS BIGINT) AS n_stop
         |  FROM documents d JOIN tok t USING (doc_id))
         |SELECT doc_id, n_chars_m, n_tokens,
         |       CAST(round(sum_len * 1000000.0 / n_tokens) AS BIGINT) / 1000000.0 AS mean_tok_len,
         |       CAST(round(n_stop * 1000000.0 / n_tokens) AS BIGINT) / 1000000.0 AS stop_ratio,
         |       CAST(round((2*n_tokens*least(n_tokens, 50) + 60*n_stop +
         |                   5*least(sum_len, 8*n_tokens)) * 1000000.0
         |                  / (200*n_tokens)) AS BIGINT) / 1000000.0 AS quality
         |FROM st ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = tokens(col("text"))
      val en = typedLit(Profiles(1)._2)
      val M = lit(1000000.0)
      docs(s, d)
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars_m"),
          toks.as("toks"))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("sum_len",
          aggregate(transform(col("toks"), t => length(t)), lit(0),
            (acc, x) => acc + x).cast("long"))
        .withColumn("n_stop",
          size(filter(col("toks"), t => array_contains(en, t))).cast("long"))
        .select(col("doc_id"), col("n_chars_m"), col("n_tokens"),
          (round(col("sum_len") * M / col("n_tokens")).cast("long") / M)
            .as("mean_tok_len"),
          (round(col("n_stop") * M / col("n_tokens")).cast("long") / M)
            .as("stop_ratio"),
          (round((lit(2) * col("n_tokens") * least(col("n_tokens"), lit(50L)) +
            lit(60) * col("n_stop") +
            lit(5) * least(col("sum_len"), lit(8) * col("n_tokens"))) * M /
            (lit(200) * col("n_tokens"))).cast("long") / M).as("quality"))
        .orderBy("doc_id")
    },

    // Language-ID heuristic: stopword-profile hit counts per language,
    // argmax with alphabetical tiebreak. (The fixture's `lang` column is a
    // label, not ground truth for this vocabulary; the operator contract
    // is the deterministic heuristic itself, mirrored in the oracle.)
    GQuery(
      "q_text_langid", {
        val scores = Profiles.map { case (l, ws) =>
          s"CAST(len(list_filter(toks, x -> list_contains(${profileSql(ws)}, x))) AS BIGINT) AS s_$l"
        }.mkString(",\n         |       ")
        s"""WITH
           |${OracleFragments.tok},
           |sc AS (
           |  SELECT doc_id,
           |       $scores
           |  FROM tok)
           |SELECT doc_id, s_de, s_en, s_es, s_fr,
           |       CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
           |            WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
           |            WHEN s_es >= s_fr THEN 'es'
           |            ELSE 'fr' END AS lang_pred
           |FROM sc ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      var df = docs(s, d).select(col("doc_id"), tokens(col("text")).as("toks"))
      Profiles.foreach { case (l, ws) =>
        df = df.withColumn(s"s_$l",
          size(filter(col("toks"), t => array_contains(typedLit(ws), t))).cast("long"))
      }
      df.select(col("doc_id"), col("s_de"), col("s_en"), col("s_es"), col("s_fr"),
          when(col("s_de") >= col("s_en") && col("s_de") >= col("s_es") &&
            col("s_de") >= col("s_fr"), "de")
            .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
            .when(col("s_es") >= col("s_fr"), "es")
            .otherwise("fr").as("lang_pred"))
        .orderBy("doc_id")
    },

    // Token counting: whitespace tokens plus a BPE-ish regex segmentation
    // (letter runs | digit runs | single punctuation marks).
    GQuery(
      "q_text_tokens",
      s"""WITH
         |${OracleFragments.tok}
         |SELECT d.doc_id,
         |       CAST(len(t.toks) AS BIGINT) AS ws_tokens,
         |       CAST(len(regexp_extract_all(lower(d.text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens,
         |       CAST(round(length(d.text) * 10000.0 / len(t.toks)) AS BIGINT) / 10000.0 AS chars_per_tok
         |FROM documents d JOIN tok t USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      docs(s, d)
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("ws_tokens"),
          regexp_count(lower(col("text")),
            lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long").as("bpe_tokens"),
          // integer-space rounding (see q_text_quality): int/int ratio,
          // tie digits must not straddle an ulp between engines
          (round(length(col("text")) * lit(10000.0) /
            size(tokens(col("text")))).cast("long") / lit(10000.0))
            .as("chars_per_tok"))
        .orderBy("doc_id")
    },

    // Winnowing document fingerprints (rolling-hash family): the minimum
    // shingle hash in each sliding window of W consecutive 3-gram hashes;
    // summary = distinct-fingerprint count + min/max fingerprint.
    GQuery(
      "q_text_fingerprint",
      s"""WITH
         |${OracleFragments.tok},
         |${OracleFragments.shingle3},
         |shp AS (SELECT doc_id, generate_subscripts(shingles, 1) AS pos,
         |               unnest(shingles) AS s FROM sh),
         |hhp AS (
         |  SELECT doc_id, pos,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(s)+1), i -> CAST(unicode(s[i]) AS BIGINT))),
         |           (a,cp) -> (a*31+cp) % ${OracleFragments.P}) AS h
         |  FROM shp),
         |hl AS (SELECT doc_id, list(h ORDER BY pos) AS hh FROM hhp GROUP BY doc_id),
         |fp AS (
         |  SELECT doc_id,
         |         CASE WHEN len(hh) <= $W THEN [list_min(hh)]
         |              ELSE list_transform(range(1, len(hh) - $W + 2),
         |                                  i -> list_min(hh[i:i+$W-1]))
         |         END AS wins
         |  FROM hl)
         |SELECT doc_id,
         |       CAST(len(list_distinct(wins)) AS BIGINT) AS n_fp,
         |       list_min(wins) AS fp_min, list_max(wins) AS fp_max
         |FROM fp ORDER BY doc_id""".stripMargin) { (s, d) =>
      HashFunctions.ensure(s)
      docs(s, d)
        .select(col("doc_id"),
          HashFunctions.shingle_hashes(col("text"), 3).as("hh"))
        .withColumn("wins",
          when(size(col("hh")) <= W, array(array_min(col("hh"))))
            .otherwise(transform(sequence(lit(1), size(col("hh")) - (W - 1)),
              i => array_min(slice(col("hh"), i, lit(W))))))
        .select(col("doc_id"),
          size(array_distinct(col("wins"))).cast("long").as("n_fp"),
          array_min(col("wins")).as("fp_min"),
          array_max(col("wins")).as("fp_max"))
        .orderBy("doc_id")
    },

    // Per-language corpus signatures via the MinHashUnion typed Aggregator
    // (the UDAF surface): element-wise min of per-doc signatures merges
    // map-side like a built-in agg, and the group signature estimates each
    // language slice's shingle-set Jaccard against the English slice as
    // signature agreement / 64 (a dyadic float — bit-exact cross-engine).
    GQuery(
      "q_group_signature",
      s"""WITH
         |${OracleFragments.minhashPerDoc},
         |lmin AS (
         |  SELECT d.lang, m.p, min(m.v) AS v
         |  FROM mh m JOIN documents d USING (doc_id)
         |  GROUP BY d.lang, m.p),
         |gl AS (SELECT lang, list(v ORDER BY p) AS gs FROM lmin GROUP BY lang),
         |en AS (SELECT gs AS es FROM gl WHERE lang = 'en')
         |SELECT lang,
         |       CAST(list_sum(gs) AS BIGINT) AS sig_sum,
         |       list_min(gs) AS sig_min, list_max(gs) AS sig_max,
         |       len(list_filter(range(1, ${graft.functions.TextHash.SigK + 1}), i -> gs[i] = es[i])) / ${graft.functions.TextHash.SigK}.0 AS est_j_en
         |FROM gl CROSS JOIN en ORDER BY lang""".stripMargin) { (s, d) =>
      HashFunctions.ensure(s)
      val mu = udaf(graft.functions.MinHashUnion)
      val sigs = docs(s, d)
        .select(col("lang"),
          HashFunctions.min_hash_sig(col("text"), graft.functions.TextHash.SigK, 3).as("sig"))
        .groupBy("lang").agg(mu(col("sig")).as("gs"))
      val en = sigs.filter(col("lang") === "en").select(col("gs").as("es"))
      sigs.crossJoin(broadcast(en))
        .select(col("lang"),
          aggregate(col("gs"), lit(0L), (a, x) => a + x).as("sig_sum"),
          array_min(col("gs")).as("sig_min"),
          array_max(col("gs")).as("sig_max"),
          (size(filter(zip_with(col("gs"), col("es"), (a, b) => a === b),
            x => x)) / lit(graft.functions.TextHash.SigK.toDouble)).as("est_j_en"))
        .orderBy("lang")
    },

    // Count-min-sketch term frequencies: the mergeable heavy-hitter
    // counter a 100 TB corpus uses where q_text_vocab's exact explode→
    // agg would shuffle the full token stream. CmsR×CmsW counter cells
    // (metadata: each cell is the SUM of counts hashing into it, so
    // partial aggregation combines map-side and sketches merge by
    // addition); estimate(token) = min over rows of its cell — the
    // classic CMS upper bound, always ≥ the exact count. The gate scores
    // the sketch against exact counts for the top-20 tokens: the exact
    // arm is the eval harness (candidate sets at scale come from a
    // sampled pass); both arms and the cell hashes (minhash permutation
    // family over poly_hash) are deterministic, so the comparison is
    // value-exact, overestimate and all.
    GQuery(
      "q_text_cms",
      s"""WITH tokd AS (
         |  SELECT list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS toks
         |  FROM documents),
         |tr AS (SELECT unnest(toks) AS tok FROM tokd),
         |th AS MATERIALIZED (
         |  SELECT tok,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(tok)+1), i -> CAST(unicode(tok[i]) AS BIGINT))),
         |           (a,cp) -> (a*31+cp) % ${OracleFragments.P}) AS t
         |  FROM tr),
         |cells AS (
         |  SELECT r, ((1 + r*2654435761) % ${OracleFragments.P} * t + 7*r + 3)
         |           % ${OracleFragments.P} % $CmsW AS cell
         |  FROM th CROSS JOIN (SELECT unnest(range(0, $CmsR)) AS r) rr),
         |counters AS (SELECT r, cell, CAST(count(*) AS BIGINT) AS n
         |             FROM cells GROUP BY 1, 2),
         |exact AS (SELECT tok, t, CAST(count(*) AS BIGINT) AS exact_n
         |          FROM th GROUP BY 1, 2),
         |top AS (SELECT * FROM exact ORDER BY exact_n DESC, tok LIMIT 20),
         |tc AS (
         |  SELECT top.tok, top.exact_n, rr.r,
         |         ((1 + rr.r*2654435761) % ${OracleFragments.P} * top.t + 7*rr.r + 3)
         |           % ${OracleFragments.P} % $CmsW AS cell
         |  FROM top CROSS JOIN (SELECT unnest(range(0, $CmsR)) AS r) rr)
         |SELECT tc.tok AS token, tc.exact_n, CAST(min(c.n) AS BIGINT) AS est_n
         |FROM tc JOIN counters c USING (r, cell)
         |GROUP BY tc.tok, tc.exact_n
         |ORDER BY exact_n DESC, token""".stripMargin) { (s, d) =>
      HashFunctions.ensure(s)
      import org.apache.spark.storage.StorageLevel
      val P = OracleFragments.P.toLong
      def cell(r: Int, t: Column): Column =
        (lit((1L + r * 2654435761L) % P) * t + lit(7L * r + 3)) % P % CmsW
      val th = docs(s, d)
        .select(explode(tokens(col("text"))).as("tok"))
        .select(col("tok"), HashFunctions.poly_hash(col("tok")).as("t"))
        .persist(StorageLevel.MEMORY_AND_DISK) // counters pass + exact arm
      val counters = th
        .select(posexplode(array((0 until CmsR).map(r => cell(r, col("t"))): _*))
          .as(Seq("r", "cell")))
        .groupBy("r", "cell").agg(count(lit(1)).as("n"))
      val top = th.groupBy("tok", "t").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("tok")).limit(20)
      top
        .select(col("tok"), col("exact_n"),
          posexplode(array((0 until CmsR).map(r => cell(r, col("t"))): _*))
            .as(Seq("r", "cell")))
        .join(broadcast(counters), Seq("r", "cell"))
        .groupBy("tok", "exact_n")
        .agg(min("n").as("est_n"))
        .select(col("tok").as("token"), col("exact_n"), col("est_n"))
        .orderBy(col("exact_n").desc, col("token"))
    },

    // Hashed-feature linear classifier inference (the fastText/FineWeb-Edu
    // quality-model scoring stage: every curation pipeline runs a cheap
    // linear model over hashed bag-of-words features to score documents
    // before the expensive stages). Feature id = md5-prefix bucket of the
    // token (the hashing trick — fixed 4096-dim feature space regardless
    // of vocabulary); the weight vector is a deterministic function of
    // the bucket so the oracle reconstructs it without a model file (a
    // real deployment broadcasts the trained weight array — same plan
    // shape, the weights just arrive via broadcast instead of a closed
    // form). Score = integer sum of per-token weights; label = score > 0.
    //
    // Scale: a pure one-pass codegen'd projection — per-row array
    // transform + fold, ZERO shuffle. The model never leaves the
    // executors; at 100 TB this is scan-bound.
    GQuery(
      "q_text_classifier",
      s"""WITH ${OracleFragments.tok}
         |SELECT doc_id,
         |       CAST(len(toks) AS BIGINT) AS n_tokens,
         |       CAST(coalesce(list_sum(list_transform(toks,
         |         t -> ((('0x' || substr(md5(t), 1, 6))::BIGINT % 4096)
         |               * 2654435761) % 2048 - 1024)), 0) AS BIGINT) AS score,
         |       coalesce(list_sum(list_transform(toks,
         |         t -> ((('0x' || substr(md5(t), 1, 6))::BIGINT % 4096)
         |               * 2654435761) % 2048 - 1024)), 0) > 0 AS label
         |FROM tok ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = tokens(col("text"))
      def weight(t: Column): Column =
        (conv(substring(md5(t.cast("binary")), 1, 6), 16, 10).cast("long")
          % 4096 * 2654435761L) % 2048 - 1024
      docs(s, d)
        .select(col("doc_id"), toks.as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          aggregate(transform(col("toks"), weight(_)), lit(0L),
            (a, x) => a + x).as("score"))
        .withColumn("label", col("score") > 0)
        .orderBy("doc_id")
    },

    // Encoding hygiene (the fix step ahead of every text signal —
    // dedup shingles, language ID and tokenization all disagree across
    // encoding variants of the SAME text): strict double-decode mojibake
    // repair + Unicode NFC normalization as ONE native codegen'd pass
    // (fix_text). The fixture MANGLES half the corpus in-query (UTF-8
    // bytes re-read as Latin-1 — the classic "cafÃ©" shape) and appends
    // a decomposed e+combining-acute, so the oracle derives the expected
    // output INDEPENDENTLY: the repaired text must equal the original
    // (which DuckDB can construct) and both engines' NFC must agree.
    // The odd rows carry the combining mark (> 0xFF), proving the
    // repair heuristic does NOT fire on clean non-Latin-1 text.
    //
    // Scale: one codegen'd projection, no shuffle except the
    // presentation sort.
    GQuery(
      "q_text_fix_encoding",
      s"""SELECT doc_id,
         |       nfc_normalize(text || ' café über e' || chr(769)) AS fixed,
         |       doc_id % 2 = 0 AS was_mojibake
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val original = concat(col("text"), lit(" café über é"))
      val mangled = decode(encode(original, "UTF-8"), "ISO-8859-1")
      val f = HashFunctions.fix_text(
        when(col("doc_id") % 2 === 0, mangled).otherwise(original))
      docs(s, d)
        .select(col("doc_id"), f.as("f"))
        .select(col("doc_id"), col("f.fixed").as("fixed"),
          col("f.was_mojibake").as("was_mojibake"))
        .orderBy("doc_id")
    },

    // Per-document TF-IDF keyword extraction (top-3 terms per doc): the
    // corpus-statistics stage behind tagging/routing/clustering-by-topic.
    // idf is integer-millinat (round(1000*ln(N/df)) of identical integer
    // operands on both engines); score = tf * idf_millinats stays pure
    // integer; ties break on the term itself so top-3 is deterministic.
    // Keywords require corpus support: terms seen in fewer than MinDf
    // documents are excluded — standard TF-IDF vocabulary pruning (hapax
    // legomena are overwhelmingly typos/serials/hashes, and their inflated
    // idf would otherwise crown every typo a keyword).
    //
    // Scale: term frequency is a NATIVE one-pass expression (term_freqs —
    // one hash map per row inside codegen, not the O(distinct×tokens)
    // interpreted HOF shape); the only wide exchanges are (a) the
    // document-frequency aggregate — vocabulary-sized with map-side
    // combine — and (b) the per-doc top-k window keyed by doc_id, which
    // is skew-free. The min-df prune is IN THE PLAN before the df table
    // joins back: what feeds the build side is the multi-document
    // vocabulary (Heaps'-law sublinear, overwhelmingly smaller than the
    // raw distinct-token table whose long tail is single-document
    // noise), not the unbounded hapax tail. The join strategy is
    // deliberately UNHINTED: AQE broadcasts when the measured pruned
    // vocabulary is small (every tested scale) and degrades to a
    // shuffled join instead of OOMing at the extreme design point
    // (~10^13 tokens, where even a df>=2 vocabulary can reach 10^8
    // terms) — an explicit broadcast() would disable that size check.
    GQuery(
      "q_text_keywords",
      s"""WITH ${OracleFragments.tok},
         |tf AS (
         |  SELECT doc_id, t.term, t.tf
         |  FROM tok, LATERAL (
         |    SELECT unnest(list_transform(list_distinct(toks),
         |             x -> {'term': x,
         |                   'tf': CAST(len(list_filter(toks, y -> y = x)) AS BIGINT)}),
         |           recursive := true)) AS t),
         |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf
         |       GROUP BY 1 HAVING count(*) >= ${KeywordMinDf}),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         |sc AS (
         |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         |         tf.tf * CAST(round(1000 * ln(CAST(n.n AS DOUBLE)
         |                                      / CAST(df.df AS DOUBLE))) AS BIGINT)
         |           AS score_millinats
         |  FROM tf JOIN df USING (term) CROSS JOIN n),
         |rk AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
         |              ORDER BY score_millinats DESC, term) AS BIGINT) AS rk
         |  FROM sc)
         |SELECT doc_id, rk, term, tf, df, score_millinats
         |FROM rk WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val tf = docs(s, d)
        .select(col("doc_id"),
          explode(HashFunctions.term_freqs(col("text"))).as("t"))
        .select(col("doc_id"), col("t.term").as("term"), col("t.tf").as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        .filter(col("df") >= KeywordMinDf) // min-df prune BEFORE the broadcast
      // N rides the plan as a broadcast one-row cross join (the oracle's
      // CROSS JOIN n shape) — no eager driver-side count job per build
      val nDocs = docs(s, d).agg(count(lit(1)).cast("double").as("n_docs"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score_millinats").desc, col("term"))
      tf.join(dfreq, Seq("term")) // unhinted: AQE governs (see header)
        .crossJoin(broadcast(nDocs))
        .withColumn("score_millinats", col("tf") *
          round(lit(1000d) * log(col("n_docs") / col("df").cast("double")))
            .cast("long"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select("doc_id", "rk", "term", "tf", "df", "score_millinats")
        .orderBy("doc_id", "rk")
    }
  )
}
