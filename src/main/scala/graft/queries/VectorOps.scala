package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GQuery, Tables}
import graft.functions.VecFunctions.vec_dot_long

/** Embedding storage/compression operators over the `embeddings` table
  * (beyond-reference; the LLM-pipeline vector-store surface): symmetric
  * per-vector int8 scalar quantization — the standard way a 100 TB
  * embedding store drops 4× in size before ANN serving.
  *
  * Cross-engine determinism: every float enters as the same FLOAT value
  * and is widened to DOUBLE exactly in both engines; the quantizer is
  * `floor(x/scale + 0.5)` (one IEEE division, one addition, floor — all
  * bit-exact given identical inputs, no round-half-tie ambiguity), and
  * the reconstruction error is reported in fixed point
  * (`floor(|x − q·scale|·10⁹)` summed as exact integers), so no
  * double-rounding can differ between engines. The per-vector scale is a
  * single IEEE division of a bit-exact max — displayed raw — clamped to
  * 1e-30 (identically in both engines) so an all-zero embedding quantizes
  * to all-zero instead of 0/0 = NaN, where the engines diverge (Spark
  * CAST(NaN AS BIGINT) → NULL, DuckDB → error).
  *
  * Scale design (100 TB): embarrassingly parallel one-pass projection —
  * no shuffle except the presentation sort; all higher-order array
  * functions, fully codegen'd; output is 64 int8-range longs + 2 doubles
  * per vector (the 4× compression the operator exists for).
  */
object VectorOps {

  private val E9 = 1000000000.0

  private val Dim = 64

  /** Upper-triangle pair enumeration: 0-based linear position over
    * i = 1..dim, j = i..dim — EXACTLY the order [[PairProductsSql]]'s
    * flattened array emits, so a collected (pos → sum) row decodes to its
    * (i, j) cell on the driver without shipping i/j through the shuffle.
    * Pinned against the SQL flattening order by VectorMomentSpec. */
  private[graft] def pairIndex(dim: Int): IndexedSeq[(Int, Int)] =
    (1 to dim).flatMap(i => (i to dim).map(j => (i, j)))

  /** Flattened upper-triangle products of the quantized vector `q` —
    * ARRAY<BIGINT> of size D(D+1)/2 in [[pairIndex]] order. r16: the
    * earlier shape exploded an array of (i, j, p) STRUCTS, allocating
    * three fields per element (~6× the bytes) purely to carry indices
    * that are a function of the position; positions are exploded instead
    * and decoded via [[pairIndex]] (driver) or a broadcast lookup
    * (distributed). The embeddings contract is fixed D = 64 (all scale
    * factors; the driver-side moment arrays already assumed it). */
  private[graft] val PairProductsSql: String =
    "flatten(transform(sequence(1, size(q)), i -> " +
      "transform(sequence(i, size(q)), j -> q[i-1] * q[j-1])))"
  private val PcaIters = 12
  private val PcaQ = 1000L      // fixed-point quantizer for the PCA pass
  private val PcaScale = 1000000L // per-step magnitude rescale target

  /** The driver-side PcaIters-step fixed-point power iteration (1-indexed
    * D×D scatter matrix in, 1-indexed component vector out) — the exact
    * arithmetic the unrolled DuckDB oracle states in SQL: rescale both the
    * matrix and each iterate by floor division to |·|≤~PcaScale, iterate
    * from the all-PcaQ vector. Exposed for the known-eigenvector unit
    * test (PlanSpec gates the distributed shape; this pins the math). */
  private[graft] def powerIterate(craw: Array[Array[Long]], dim: Int): Array[Long] = {
    def rescaleDiv(maxAbs: Long): Long = math.max(maxAbs / PcaScale, 1L)
    val dc = rescaleDiv(craw.flatten.map(math.abs).max)
    val cn = craw.map(_.map(Math.floorDiv(_, dc)))
    var v = Array.tabulate(dim + 1)(i => if (i == 0) 0L else PcaQ)
    for (_ <- 1 to PcaIters) {
      val w = Array.tabulate(dim + 1) { i =>
        if (i == 0) 0L
        else (1 to dim).foldLeft(0L)((acc, j) => acc + cn(i)(j) * v(j))
      }
      val dv = rescaleDiv(w.map(math.abs).max)
      v = w.map(Math.floorDiv(_, dv))
    }
    v
  }

  // ---- linear probe (q_embed_probe) ---------------------------------
  // Ridge GD hyper-parameters, all integer. GnCap rescales the Gram
  // matrix to |entries| ≲ 2·GnCap, so its spectral radius is ≤
  // D·2·GnCap = 1.28e8; with the ridge R added, DStep > (λmax+R)/2
  // guarantees stable gradient descent, and contraction (1 − R/DStep)^T
  // ≈ 0.013 at T=16 — the iterate is effectively the ridge solution,
  // but the CONTRACT is simply "ProbeIters fixed-point steps".
  private val ProbeTarget = 3L            // one-vs-rest target label
  private val ProbeIters = 16
  private val ProbeBCap = 100000000000000L // 1e14: |b| rescale target
  private val ProbeRidge = 64000000L
  private val ProbeStep = 270000000L

  /** Driver-side probe trainer: w ← w + floorDiv(b − G·w − R·w, DStep),
    * T steps from zero, on the rescaled integer moments. 1-indexed like
    * powerIterate; exposed for the closed-form-solution unit test. */
  private[graft] def probeIterate(
      gram: Array[Array[Long]], b: Array[Long], dim: Int): Array[Long] = {
    val dg = math.max(gram.flatten.map(math.abs).max / PcaScale, 1L)
    val gn = gram.map(_.map(Math.floorDiv(_, dg)))
    val mb = math.max(b.map(math.abs).max, 1L)
    val mul = math.max(ProbeBCap / mb, 1L)
    val div = math.max(mb / ProbeBCap, 1L)
    val bn = b.map(v => Math.floorDiv(v * mul, div))
    var w = Array.fill(dim + 1)(0L)
    for (_ <- 1 to ProbeIters) {
      val u = Array.tabulate(dim + 1) { i =>
        if (i == 0) 0L
        else (1 to dim).foldLeft(0L)((acc, j) => acc + gn(i)(j) * w(j))
      }
      w = Array.tabulate(dim + 1) { i =>
        if (i == 0) 0L
        else w(i) + Math.floorDiv(bn(i) - u(i) - ProbeRidge * w(i), ProbeStep)
      }
    }
    w
  }

  /** Unrolled DuckDB oracle for q_embed_probe: Gram + b moments at PcaQ,
    * the same integer rescales as probeIterate, ProbeIters unrolled GD
    * steps (every iteration CTE MATERIALIZED — DuckDB inlines CTEs, and
    * each step references its predecessor more than once), then the
    * corpus scored and rolled into a signed confusion matrix. */
  private def probeOracle: String = {
    val fd = (a: String, b: Long) => s"(($a) - ((($a) % $b + $b) % $b)) // $b"
    val iters = (1 to ProbeIters).map { t =>
      val prev = if (t == 1) "w0" else s"w${t - 1}"
      s"""u$t AS MATERIALIZED (
         |  SELECT gn.i, CAST(sum(gn.c * $prev.x) AS BIGINT) AS u
         |  FROM gn JOIN $prev ON gn.j = $prev.i GROUP BY gn.i),
         |w$t AS MATERIALIZED (
         |  SELECT p.i, p.x + ${fd(s"bn.s - u$t.u - $ProbeRidge * p.x", ProbeStep)} AS x
         |  FROM $prev p JOIN u$t ON p.i = u$t.i JOIN bn ON p.i = bn.i)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS MATERIALIZED (
       |  SELECT vec_id, CAST(label AS BIGINT) AS label,
       |         CASE WHEN label = $ProbeTarget THEN $PcaQ ELSE -$PcaQ END AS yv,
       |         list_transform(embedding,
       |           x -> CAST(floor(CAST(x AS DOUBLE) * $PcaQ + 0.5) AS BIGINT)) AS q
       |  FROM embeddings),
       |p AS (
       |  SELECT v[1] AS i, v[2] AS j, v[3] AS p
       |  FROM (SELECT unnest(flatten(list_transform(range(1, len(q) + 1),
       |          i -> list_transform(range(i, len(q) + 1),
       |                 j -> [i, j, q[i] * q[j]])))) AS v
       |        FROM q)),
       |g0 AS (SELECT i, j, CAST(sum(p) AS BIGINT) AS s FROM p GROUP BY 1, 2),
       |gfull AS (SELECT i, j, s FROM g0
       |          UNION ALL SELECT j AS i, i AS j, s FROM g0 WHERE i <> j),
       |bv AS (
       |  SELECT v[1] AS i, CAST(sum(v[2]) AS BIGINT) AS s
       |  FROM (SELECT unnest(list_transform(range(1, len(q) + 1),
       |          i -> [i, q[i] * yv])) AS v
       |        FROM q)
       |  GROUP BY 1),
       |dg AS (SELECT greatest(max(abs(s)) // $PcaScale, 1) AS d FROM gfull),
       |gn AS MATERIALIZED (
       |  SELECT i, j, (s - ((s % d + d) % d)) // d AS c
       |  FROM gfull CROSS JOIN dg),
       |sb AS (SELECT greatest($ProbeBCap // greatest(max(abs(s)), 1), 1) AS mul,
       |              greatest(max(abs(s)) // $ProbeBCap, 1) AS dv
       |       FROM bv),
       |bn AS MATERIALIZED (
       |  SELECT i, (s * mul - (((s * mul) % dv + dv) % dv)) // dv AS s
       |  FROM bv CROSS JOIN sb),
       |w0 AS (SELECT unnest(range(1, ${Dim + 1})) AS i, CAST(0 AS BIGINT) AS x),
       |$iters,
       |qe AS (
       |  SELECT vec_id, label, u.j, q[u.j] AS qv
       |  FROM q, LATERAL (SELECT unnest(range(1, ${Dim + 1})) AS j) u),
       |sc AS (
       |  SELECT qe.vec_id, any_value(qe.label) AS label,
       |         CAST(sum(qe.qv * wf.x) AS BIGINT) AS score
       |  FROM qe JOIN w$ProbeIters wf ON qe.j = wf.i
       |  GROUP BY qe.vec_id)
       |SELECT CAST(label = $ProbeTarget AS BIGINT) AS actual_pos,
       |       CAST(score > 0 AS BIGINT) AS pred_pos,
       |       CAST(count(*) AS BIGINT) AS n,
       |       CAST(sum(score) AS BIGINT) AS score_sum
       |FROM sc GROUP BY 1, 2 ORDER BY actual_pos, pred_pos""".stripMargin
  }

  /** Unrolled DuckDB oracle for q_embed_pca: the same integer moments as
    * q_embed_covariance (at quantizer PcaQ), the scatter matrix
    * n·S_ij − S_i·S_j mirrored to full D×D, then PcaIters chained
    * mat-vec CTEs. Every divide is the explicit floor division
    * (a − pmod(a,b)) / b on an exactly-divisible numerator, so Spark's
    * driver-side Math.floorDiv and DuckDB agree bit-for-bit. */
  private def pcaOracle: String = {
    val iters = (1 to PcaIters).map { t =>
      val prev = if (t == 1) "v0" else s"v${t - 1}"
      s"""w$t AS MATERIALIZED (
         |  SELECT cn.i, CAST(sum(cn.c * $prev.x) AS BIGINT) AS w
         |  FROM cn JOIN $prev ON cn.j = $prev.i GROUP BY cn.i),
         |d$t AS (SELECT greatest(max(abs(w)) // $PcaScale, 1) AS d FROM w$t),
         |v$t AS MATERIALIZED (SELECT i, (w - ((w % d + d) % d)) // d AS x
         |        FROM w$t CROSS JOIN d$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS MATERIALIZED (
       |  SELECT vec_id, list_transform(embedding,
       |           x -> CAST(floor(CAST(x AS DOUBLE) * $PcaQ + 0.5) AS BIGINT)) AS q
       |  FROM embeddings),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
       |p AS (
       |  SELECT v[1] AS i, v[2] AS j, v[3] AS p
       |  FROM (SELECT unnest(flatten(list_transform(range(1, len(q) + 1),
       |          i -> list_transform(range(i, len(q) + 1),
       |                 j -> [i, j, q[i] * q[j]])))) AS v
       |        FROM q)),
       |g AS (SELECT i, j, CAST(sum(p) AS BIGINT) AS s FROM p GROUP BY 1, 2),
       |m AS (
       |  SELECT v[1] AS i, CAST(sum(v[2]) AS BIGINT) AS s
       |  FROM (SELECT unnest(list_transform(range(1, len(q) + 1),
       |          i -> [i, q[i]])) AS v
       |        FROM q)
       |  GROUP BY 1),
       |craw0 AS (
       |  SELECT g.i, g.j, nn.n * g.s - mi.s * mj.s AS c
       |  FROM g CROSS JOIN nn
       |  JOIN m mi ON g.i = mi.i JOIN m mj ON g.j = mj.i),
       |craw AS (SELECT i, j, c FROM craw0
       |         UNION ALL SELECT j AS i, i AS j, c FROM craw0 WHERE i <> j),
       |dc AS (SELECT greatest(max(abs(c)) // $PcaScale, 1) AS d FROM craw),
       |cn AS MATERIALIZED (SELECT i, j, (c - ((c % d + d) % d)) // d AS c
       |       FROM craw CROSS JOIN dc),
       |v0 AS (SELECT unnest(range(1, ${Dim + 1})) AS i, CAST($PcaQ AS BIGINT) AS x),
       |$iters,
       |qe AS (
       |  SELECT vec_id, u.j, q[u.j] AS qv
       |  FROM q, LATERAL (SELECT unnest(range(1, ${Dim + 1})) AS j) u)
       |SELECT qe.vec_id, CAST(sum(qe.qv * vf.x) AS BIGINT) AS proj
       |FROM qe JOIN v$PcaIters vf ON qe.j = vf.i
       |GROUP BY qe.vec_id ORDER BY vec_id""".stripMargin
  }

  val queries: Seq[GQuery] = Seq(

    GQuery(
      "q_embed_quantize",
      s"""WITH
         |e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |m AS (
         |  SELECT vec_id, v,
         |         greatest(list_max(list_transform(v, x -> abs(x))) / 127.0, 1e-30) AS scale
         |  FROM e),
         |q AS (
         |  SELECT vec_id, v, scale,
         |         list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS qv
         |  FROM m)
         |SELECT vec_id, scale,
         |       CAST(list_sum(qv) AS BIGINT) AS sum_q,
         |       CAST(list_min(qv) AS BIGINT) AS min_q,
         |       CAST(list_max(qv) AS BIGINT) AS max_q,
         |       CAST(list_sum(list_transform(range(1, len(v) + 1),
         |         i -> CAST(floor(abs(v[i] - qv[i] * scale) * $E9) AS BIGINT)))
         |         AS BIGINT) AS l1_err_e9
         |FROM q ORDER BY vec_id""".stripMargin) { (s, d) =>
      Tables.load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("scale",
          greatest(
            array_max(transform(col("v"), x => abs(x))) / lit(127.0),
            lit(1e-30)))
        .withColumn("qv",
          transform(col("v"), x => floor(x / col("scale") + lit(0.5))))
        .select(col("vec_id"), col("scale"),
          aggregate(col("qv"), lit(0L), (a, x) => a + x).as("sum_q"),
          array_min(col("qv")).as("min_q"),
          array_max(col("qv")).as("max_q"),
          aggregate(
            zip_with(col("v"), col("qv"),
              (x, q) => floor(abs(x - q * col("scale")) * lit(E9))),
            lit(0L), (a, x) => a + x).as("l1_err_e9"))
        .orderBy("vec_id")
    },

    // Distributed covariance/Gram matrix over the embedding corpus — the
    // PCA / whitening / anisotropy-diagnostic prep pass. Every element is
    // fixed-point quantized (floor(x·10⁶ + 0.5), exact given identical
    // FLOAT→DOUBLE widening, no tie ambiguity), so all moment sums are
    // exact BIGINT arithmetic and the compare is hash-exact. The output
    // ships raw integer moments (n, Σqᵢqⱼ, Σqᵢ, Σqⱼ) per upper-triangle
    // cell; covariance = (S_ij − S_i·S_j/n)/(n−1) is exactly derivable.
    //   Scale (100 TB): the pair explode is D(D+1)/2 per row BUT partial
    // aggregation combines map-side, so the shuffle carries only
    // D²·partitions rows (the k-means metadata-shuffle pattern) — the
    // corpus itself never shuffles; marginals broadcast-join (D rows).
    //   Overflow headroom: |x| < 0.6 ⇒ q < 6·10⁵, Σqᵢqⱼ < 3.6·10¹¹·n —
    // safe past 10⁷ rows at this scale factor; a 10⁹-row deployment drops
    // the quantizer to 10⁴ (or sums per-partition into DECIMAL(38,0)).
    GQuery(
      "q_embed_covariance",
      """WITH q AS (
        |  SELECT list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS q
        |  FROM embeddings),
        |p AS (
        |  SELECT v[1] AS i, v[2] AS j, v[3] AS p
        |  FROM (SELECT unnest(flatten(list_transform(range(1, len(q) + 1),
        |          i -> list_transform(range(i, len(q) + 1),
        |                 j -> [i, j, q[i] * q[j]])))) AS v
        |        FROM q)),
        |g AS (
        |  SELECT i, j, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(p) AS BIGINT) AS sum_qq
        |  FROM p GROUP BY 1, 2),
        |m AS (
        |  SELECT v[1] AS i, CAST(sum(v[2]) AS BIGINT) AS s
        |  FROM (SELECT unnest(list_transform(range(1, len(q) + 1),
        |          i -> [i, q[i]])) AS v
        |        FROM q)
        |  GROUP BY 1)
        |SELECT g.i, g.j, g.n, g.sum_qq, mi.s AS sum_qi, mj.s AS sum_qj
        |FROM g JOIN m mi ON g.i = mi.i JOIN m mj ON g.j = mj.i
        |ORDER BY g.i, g.j""".stripMargin) { (s, d) =>
      import org.apache.spark.storage.StorageLevel
      val q = Tables.load(s, d, "embeddings")
        .select(transform(col("embedding").cast("array<double>"),
          x => floor(x * lit(1000000d) + lit(0.5)).cast("long")).as("q"))
        .persist(StorageLevel.MEMORY_AND_DISK) // two moment passes; released by the harness clearCache
      // struct-free moment pass (r16, see PairProductsSql): positions
      // aggregate (partial+final, map-side combined exactly as before)
      // and the (i, j) labels re-attach from a D(D+1)/2-row broadcast
      val ij = s.createDataFrame(
        pairIndex(Dim).zipWithIndex
          .map { case ((i, j), k) => (k, i.toLong, j.toLong) })
        .toDF("pos", "i", "j")
      val g = q
        .select(posexplode(expr(PairProductsSql)).as(Seq("pos", "p")))
        .groupBy(col("pos"))
        .agg(count(lit(1)).as("n"), sum(col("p")).as("sum_qq"))
        .join(broadcast(ij), "pos")
      val m = q
        .select(posexplode(col("q")).as(Seq("pos", "v")))
        .groupBy((col("pos") + 1).cast("long").as("i"))
        .agg(sum("v").as("s"))
      g.as("g").join(broadcast(m).as("mi"), col("g.i") === col("mi.i"))
        .join(broadcast(m).as("mj"), col("g.j") === col("mj.i"))
        .select(col("g.i").as("i"), col("g.j").as("j"), col("n"), col("sum_qq"),
          col("mi.s").as("sum_qi"), col("mj.s").as("sum_qj"))
        .orderBy("i", "j")
    },

    // Distributed PCA: first principal direction by power iteration over
    // the exact integer scatter matrix, then the corpus projected onto it
    // — the dimensionality-reduction / whitening / embedding-diagnostic
    // pass. Entirely fixed-point: elements quantize at PcaQ, the scatter
    // matrix is n·S_ij − S_i·S_j (exact BIGINT, ∝ covariance·n²·PcaQ²),
    // and each power-iteration step rescales by an exact floor division
    // so every engine-side number is an integer — the PcaIters-step
    // iterate is bit-identical in Spark, the driver loop, and DuckDB.
    // No convergence tolerance enters the contract: the operator IS
    // "PcaIters power-iteration steps from the all-ones vector".
    //
    // Scale (100 TB): the corpus contributes ONE pass for the moments —
    // the D(D+1)/2 pair explode combines map-side, so the shuffle carries
    // D²·partitions rows (the k-means metadata pattern) — and ONE
    // codegen'd projection pass at the end with the component broadcast
    // as a literal; the power iteration itself runs on a D×D matrix on
    // the driver (metadata-sized, like the k-means centroid step). The
    // corpus never shuffles. Overflow headroom mirrors q_embed_covariance:
    // quantizer PcaQ=10³ keeps n·S_ij < 2⁶³ past 10⁷ rows; a 10⁹-row
    // deployment drops to 10² or sums into DECIMAL(38,0).
    GQuery("q_embed_pca", pcaOracle) { (s, d) =>
      import org.apache.spark.storage.StorageLevel
      val q = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding").cast("array<double>"),
          x => floor(x * lit(PcaQ.toDouble) + lit(0.5)).cast("long")).as("q"))
        .persist(StorageLevel.MEMORY_AND_DISK) // moments pass + projection pass
      // ONE moments job (r16): the pair products, the marginals AND a
      // count marker ride one flattened array — positions [0, P) are the
      // upper-triangle products, [P, P+D) the elements themselves, and
      // P+D a constant 1 whose sum is n. Replaces three separate jobs
      // (count + pair collect + marginal collect) over the same cached
      // frame; all sums stay exact BIGINT metadata (D(D+1)/2 + D + 1 rows).
      val P = Dim * (Dim + 1) / 2
      val momentRows = q
        .select(posexplode(expr(
          s"concat($PairProductsSql, q, array(CAST(1 AS BIGINT)))"))
          .as(Seq("pos", "v")))
        .groupBy(col("pos")).agg(sum("v").as("s"))
        .collect() // D(D+1)/2 + D + 1 rows of metadata — the k-means-sums pattern
      val idx = pairIndex(Dim)
      val sij = Array.ofDim[Long](Dim + 1, Dim + 1)
      val si = Array.ofDim[Long](Dim + 1)
      var n = 0L
      momentRows.foreach { r =>
        val (pos, sSum) = (r.getInt(0), r.getLong(1))
        if (pos < P) {
          val (i, j) = idx(pos)
          sij(i)(j) = sSum; sij(j)(i) = sSum
        } else if (pos < P + Dim) si(pos - P + 1) = sSum
        else n = sSum
      }
      val craw = Array.tabulate(Dim + 1, Dim + 1) { (i, j) =>
        if (i == 0 || j == 0) 0L else n * sij(i)(j) - si(i) * si(j)
      }
      val v = powerIterate(craw, Dim)
      val vLit = typedLit((1 to Dim).map(v): IndexedSeq[Long])
      q.select(col("vec_id"),
          vec_dot_long(col("q"), vLit).as("proj"))
        .orderBy("vec_id")
    },

    // Linear-probe classifier on embeddings — the data-filtering workflow
    // (quality/domain classifiers in LLM pipelines are linear probes over
    // embeddings): one-vs-rest ridge regression on ±1 targets, trained by
    // ProbeIters fixed-point GD steps over the NORMAL-EQUATION moments
    // (Gram matrix + class-weighted sums), then the corpus scored and
    // rolled into a confusion matrix. Like q_embed_pca, the corpus
    // contributes ONE moments pass (D²·partitions metadata shuffle) and
    // one broadcast scoring pass; training itself is D×D driver metadata.
    // All arithmetic is exact integers with floor-division rescales, so
    // the trained weights — and every cell of the confusion matrix — are
    // bit-identical in Spark and the unrolled DuckDB oracle.
    GQuery("q_embed_probe", probeOracle) { (s, d) =>
      import org.apache.spark.storage.StorageLevel
      val q = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"),
          when(col("label") === ProbeTarget, lit(PcaQ)).otherwise(lit(-PcaQ))
            .as("yv"),
          transform(col("embedding").cast("array<double>"),
            x => floor(x * lit(PcaQ.toDouble) + lit(0.5)).cast("long")).as("q"))
        .persist(StorageLevel.MEMORY_AND_DISK) // moments pass + scoring pass
      // ONE moments job (r16, the q_embed_pca shape): Gram products at
      // positions [0, P), the class-weighted sums q[i]·yv at [P, P+D)
      val P = Dim * (Dim + 1) / 2
      val momentRows = q
        .select(posexplode(expr(
          s"concat($PairProductsSql, transform(q, x -> x * yv))"))
          .as(Seq("pos", "v")))
        .groupBy(col("pos")).agg(sum("v").as("s"))
        .collect()
      val idx = pairIndex(Dim)
      val gram = Array.ofDim[Long](Dim + 1, Dim + 1)
      val b = Array.ofDim[Long](Dim + 1)
      momentRows.foreach { r =>
        val (pos, sSum) = (r.getInt(0), r.getLong(1))
        if (pos < P) {
          val (i, j) = idx(pos)
          gram(i)(j) = sSum; gram(j)(i) = sSum
        } else b(pos - P + 1) = sSum
      }
      val w = probeIterate(gram, b, Dim)
      val wLit = typedLit((1 to Dim).map(w): IndexedSeq[Long])
      q.select(col("label"),
          vec_dot_long(col("q"), wLit).as("score"))
        .groupBy((col("label") === ProbeTarget).cast("long").as("actual_pos"),
          (col("score") > 0).cast("long").as("pred_pos"))
        .agg(count(lit(1)).as("n"), sum("score").as("score_sum"))
        .orderBy("actual_pos", "pred_pos")
    }
  )
}
