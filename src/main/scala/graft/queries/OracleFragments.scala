package graft.queries

/** DuckDB oracle SQL for the sketch-based dedup operators.
  *
  * Every fragment re-implements the exact TextHash arithmetic
  * (graft.functions.TextHash) in DuckDB SQL — polyHash as a
  * list_reduce fold over unicode code points, minhash permutations as
  * modular affine maps, simhash as per-bit majority votes — so the sketches
  * get full value-level oracles, not rows-only checks.
  *
  * Layout notes:
  *   - DuckDB lambdas cannot capture an outer lambda's variable, so every
  *     per-token / per-shingle hash is computed after an `unnest` (the hash
  *     lambda then only references columns, which is supported).
  *   - All float outputs are dyadic (k/64) or single IEEE divisions of the
  *     same integer operands both engines compute, so values match bit-wise
  *     without rounding.
  *   - The LSH hot-bucket cap (count <= CAP) is part of the operator's
  *     semantics and appears identically here and in Dedup.scala.
  */
object OracleFragments {

  val P = "1000000007"
  private val K = graft.functions.TextHash.SigK

  /** tokenize: lower, split on \s+, drop empties (TextHash.tokenize) —
    * over an arbitrary text expression, so pipeline gates can tokenize
    * hygiene-stage output (e.g. the NFC-suffixed corpus) instead of the
    * raw column. */
  private[queries] def tokOf(textExpr: String): String =
    s"""tok AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(lower($textExpr), '\\s+'), t -> t <> '') AS toks
       |  FROM documents
       |)""".stripMargin

  private[queries] val tok = tokOf("text")

  /** 3-word shingles joined by ' '; whole token list when < 3 tokens
    * (TextHash.shingles, n = 3). */
  private[queries] val shingle3 =
    """sh AS (
      |  SELECT doc_id,
      |         CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      |              ELSE list_transform(range(1, len(toks) - 1),
      |                                  i -> array_to_string(toks[i:i+2], ' '))
      |         END AS shingles
      |  FROM tok
      |)""".stripMargin

  /** polyHash of every 3-shingle: fold a = (a*31 + codepoint) mod P. */
  private val shingleHashes =
    s"""shr AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
       |hh AS (
       |  SELECT doc_id,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT),
       |           list_transform(range(1, length(s)+1), i -> CAST(unicode(s[i]) AS BIGINT))),
       |           (a,cp) -> (a*31+cp) % $P) AS h
       |  FROM shr
       |)""".stripMargin

  /** 64-permutation minhash signature (TextHash.minHashSig):
    * sig[p] = min over shingle hashes h of ((1+p*2654435761)%P * h + 7p+3) % P. */
  private val minhashSig =
    s"""mh AS (
       |  SELECT doc_id, p,
       |         min(((1 + p*2654435761) % $P * h + 7*p + 3) % $P) AS v
       |  FROM hh CROSS JOIN (SELECT unnest(range(0, $K)) AS p) pp
       |  GROUP BY doc_id, p
       |),
       |sig AS (SELECT doc_id, list(v ORDER BY p) AS sig FROM mh GROUP BY doc_id)""".stripMargin

  /** LSH banding: 16 bands of 4 rows, band hash = fold (a*31+v) mod P
    * (TextHash.bandHash); skew guard: cold buckets (<= CAP docs) emit all
    * pairs, hot buckets emit the consecutive chain of their sorted members
    * — O(n) pairs, family connectivity preserved (Dedup.cappedBucketPairs). */
  private def bands(cap: Int) =
    s"""bandsraw AS (
       |  SELECT doc_id, b,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT), sig[b*4+1:b*4+4]),
       |           (a,v) -> (a*31+v) % $P) AS bh
       |  FROM sig CROSS JOIN (SELECT unnest(range(0, 16)) AS b) bb
       |),
       |bsz AS (SELECT b, bh, count(*) AS n FROM bandsraw GROUP BY b, bh),
       |coldb AS (SELECT r.doc_id, r.b, r.bh FROM bandsraw r JOIN bsz USING (b, bh) WHERE bsz.n <= $cap),
       |hotb AS (SELECT r.doc_id, r.b, r.bh FROM bandsraw r JOIN bsz USING (b, bh) WHERE bsz.n > $cap)""".stripMargin

  /** Candidate pairs from shared LSH buckets + exact signature-agreement
    * estimate est_j = |{i : sig_a[i] = sig_b[i]}| / 64. */
  private val lshPairsBody =
    s"""chain AS (
      |  SELECT doc_a, doc_b FROM (
      |    SELECT doc_id AS doc_a,
      |           lead(doc_id) OVER (PARTITION BY b, bh ORDER BY doc_id) AS doc_b
      |    FROM hotb) ch WHERE doc_b IS NOT NULL
      |),
      |cand AS (
      |  SELECT DISTINCT doc_a, doc_b FROM (
      |    SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b
      |    FROM coldb a JOIN coldb b2
      |      ON a.b = b2.b AND a.bh = b2.bh AND a.doc_id < b2.doc_id
      |    UNION ALL SELECT doc_a, doc_b FROM chain) u
      |),
      |est AS (
      |  SELECT c.doc_a, c.doc_b,
      |         len(list_filter(range(1, ${K + 1}), i -> sa.sig[i] = sb.sig[i])) / $K.0 AS est_j
      |  FROM cand c
      |  JOIN sig sa ON sa.doc_id = c.doc_a
      |  JOIN sig sb ON sb.doc_id = c.doc_b
      |)""".stripMargin

  /** CTE chain ending in `mh(doc_id, p, v)` (per-doc minhash values by
    * permutation index) and `sig(doc_id, sig)` — for group-level
    * signature aggregation oracles. */
  private[queries] def minhashPerDoc: String =
    Seq(tok, shingle3, shingleHashes, minhashSig).mkString(",\n")

  private def lshCtes(cap: Int, textExpr: String = "text"): String =
    Seq(tokOf(textExpr), shingle3, shingleHashes, minhashSig, bands(cap),
      lshPairsBody).mkString(",\n")

  def minhashLshPairs(cap: Int): String =
    s"""WITH
       |${lshCtes(cap)}
       |SELECT doc_a, doc_b, est_j FROM est WHERE est_j >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  /** CTE chain ending in `clusters(doc_id, cluster_id)` over the LSH pair
    * graph (est_j >= 0.5): cluster_id = min doc_id reachable; singletons
    * map to themselves. Recursive closure — fine at oracle scale; the
    * Spark side uses iterated hash-to-min label propagation. Callers must
    * open with WITH RECURSIVE. Shared by the cluster gate and the
    * curation pipeline. */
  def minhashClusterCtes(cap: Int, textExpr: String = "text"): String =
    s"""${lshCtes(cap, textExpr)},
       |pairs AS (SELECT doc_a, doc_b FROM est WHERE est_j >= 0.5),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(doc, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT reach.doc, e.dst FROM reach JOIN edges e ON e.src = reach.r
       |),
       |clusters AS (SELECT doc AS doc_id, min(r) AS cluster_id FROM reach GROUP BY doc)""".stripMargin

  def minhashLshClusters(cap: Int): String =
    s"""WITH RECURSIVE
       |${minhashClusterCtes(cap)}
       |SELECT doc_id, cluster_id FROM clusters
       |ORDER BY doc_id""".stripMargin

  /** Per-token simhash inputs: h1 = polyHash mult 31, h2 = mult 37. */
  private val tokenHashes =
    s"""tw AS (SELECT doc_id, len(toks) AS n, unnest(toks) AS w FROM tok),
       |hw AS (
       |  SELECT doc_id, n,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, length(w)+1), i -> CAST(unicode(w[i]) AS BIGINT))),
       |      (a,cp) -> (a*31+cp) % $P) AS h1,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, length(w)+1), i -> CAST(unicode(w[i]) AS BIGINT))),
       |      (a,cp) -> (a*37+cp) % $P) AS h2
       |  FROM tw
       |)""".stripMargin

  /** 60-bit simhash: bit j set iff 2 * count(tokens with bit j set) > n
    * (TextHash.simHash64); token-less docs get simhash 0. */
  private val simhashValue =
    """bitc AS (
      |  SELECT doc_id, n, jj.j AS j,
      |         sum(CASE WHEN jj.j < 30 THEN (h1 >> jj.j) & 1
      |                  ELSE (h2 >> (jj.j - 30)) & 1 END) AS cnt
      |  FROM hw CROSS JOIN (SELECT unnest(range(0, 60)) AS j) jj
      |  GROUP BY doc_id, n, jj.j
      |),
      |simv AS (
      |  SELECT doc_id,
      |         CAST(sum(CASE WHEN 2*cnt > n THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
      |  FROM bitc GROUP BY doc_id
      |),
      |sim AS (
      |  SELECT t.doc_id, COALESCE(s.simhash, CAST(0 AS BIGINT)) AS simhash
      |  FROM tok t LEFT JOIN simv s USING (doc_id)
      |)""".stripMargin

  val simhashValues: String =
    s"""WITH
       |$tok,
       |$tokenHashes,
       |$simhashValue
       |SELECT doc_id, simhash FROM sim ORDER BY doc_id""".stripMargin

  /** SimHash near-dup pairs: 4 bands of 15 bits (hamming <= 3 pigeonholes
    * into >= 1 agreeing band), hot buckets chained (not dropped), exact
    * hamming via bit_count. */
  def simhashPairs(cap: Int): String =
    s"""WITH
       |$tok,
       |$tokenHashes,
       |$simhashValue,
       |chunks AS (
       |  SELECT doc_id, simhash, cc.c AS chunk, (simhash >> (cc.c*15)) & 32767 AS cv
       |  FROM sim CROSS JOIN (SELECT unnest(range(0, 4)) AS c) cc
       |),
       |csz AS (SELECT chunk, cv, count(*) AS n FROM chunks GROUP BY chunk, cv),
       |coldc AS (SELECT ch.doc_id, ch.chunk, ch.cv FROM chunks ch JOIN csz USING (chunk, cv) WHERE csz.n <= $cap),
       |hotc AS (SELECT ch.doc_id, ch.chunk, ch.cv FROM chunks ch JOIN csz USING (chunk, cv) WHERE csz.n > $cap),
       |chainc AS (
       |  SELECT doc_a, doc_b FROM (
       |    SELECT doc_id AS doc_a,
       |           lead(doc_id) OVER (PARTITION BY chunk, cv ORDER BY doc_id) AS doc_b
       |    FROM hotc) ch WHERE doc_b IS NOT NULL
       |),
       |cand AS (
       |  SELECT DISTINCT doc_a, doc_b FROM (
       |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |    FROM coldc a JOIN coldc b
       |      ON a.chunk = b.chunk AND a.cv = b.cv AND a.doc_id < b.doc_id
       |    UNION ALL SELECT doc_a, doc_b FROM chainc) u
       |),
       |pairs AS (
       |  SELECT c.doc_a, c.doc_b,
       |         CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INTEGER) AS hamming
       |  FROM cand c
       |  JOIN sim sa ON sa.doc_id = c.doc_a
       |  JOIN sim sb ON sb.doc_id = c.doc_b
       |)
       |SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3
       |ORDER BY doc_a, doc_b""".stripMargin

  /** CTE chain ending in `jpairs(doc_a, doc_b, jaccard)` — the exact
    * n-gram Jaccard pairs (df <= maxDf, jaccard >= 0.5). CTE names are
    * disjoint from the LSH chain so the two compose in one WITH. */
  private def jaccardCtes(maxDf: Int): String =
    s"""inv AS (SELECT DISTINCT doc_id, h FROM hh),
       |rare AS (SELECT h FROM inv GROUP BY h HAVING count(*) <= $maxDf),
       |inv2 AS (SELECT i.doc_id, i.h FROM inv i JOIN rare USING (h)),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM inv2 GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
       |  FROM inv2 a JOIN inv2 b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |),
       |jpairs AS (
       |  SELECT i.doc_a, i.doc_b,
       |         CAST(i.n_inter AS DOUBLE) / (sa.sz + sb.sz - i.n_inter) AS jaccard
       |  FROM inter i
       |  JOIN sizes sa ON sa.doc_id = i.doc_a
       |  JOIN sizes sb ON sb.doc_id = i.doc_b
       |  WHERE CAST(i.n_inter AS DOUBLE) / (sa.sz + sb.sz - i.n_inter) >= 0.5
       |)""".stripMargin

  /** Exact n-gram Jaccard with document-frequency cutoff (df <= maxDf):
    * inverted-index self-join on rare shingle hashes. */
  def ngramJaccardPairs(maxDf: Int): String =
    s"""WITH
       |$tok,
       |$shingle3,
       |$shingleHashes,
       |${jaccardCtes(maxDf)}
       |SELECT doc_a, doc_b, jaccard FROM jpairs
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Sketch-vs-exact differential eval: the LSH candidate pairs
    * (est_j >= 0.5) scored against the exact Jaccard pairs as ground
    * truth — TP/FP/FN plus precision/recall in integer basis points
    * (round(10000·x) in the shared double→round→BIGINT form). One row. */
  def minhashEval(cap: Int, maxDf: Int): String =
    s"""WITH
       |${lshCtes(cap)},
       |${jaccardCtes(maxDf)},
       |pred AS (SELECT doc_a, doc_b FROM est WHERE est_j >= 0.5),
       |truth AS (SELECT doc_a, doc_b FROM jpairs),
       |m AS (
       |  SELECT CAST(count(p.doc_a) AS BIGINT) AS n_pred,
       |         CAST(count(t.doc_a) AS BIGINT) AS n_truth,
       |         CAST(count(CASE WHEN p.doc_a IS NOT NULL
       |                          AND t.doc_a IS NOT NULL THEN 1 END) AS BIGINT) AS tp
       |  FROM pred p FULL JOIN truth t
       |    ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b)
       |SELECT n_pred, n_truth, tp,
       |       n_pred - tp AS fp, n_truth - tp AS fn,
       |       CAST(round(10000.0 * tp / nullif(n_pred, 0)) AS BIGINT) AS precision_bp,
       |       CAST(round(10000.0 * tp / nullif(n_truth, 0)) AS BIGINT) AS recall_bp
       |FROM m""".stripMargin
}
