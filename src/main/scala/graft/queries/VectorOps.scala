package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GQuery, Tables}

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
      val g = q
        .select(explode(expr(
          """flatten(transform(sequence(1, size(q)), i ->
            |  transform(sequence(i, size(q)), j ->
            |    struct(CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
            |           q[i-1] * q[j-1] AS p))))""".stripMargin)).as("e"))
        .groupBy(col("e.i").as("i"), col("e.j").as("j"))
        .agg(count(lit(1)).as("n"), sum(col("e.p")).as("sum_qq"))
      val m = q
        .select(posexplode(col("q")).as(Seq("pos", "v")))
        .groupBy((col("pos") + 1).cast("long").as("i"))
        .agg(sum("v").as("s"))
      g.as("g").join(broadcast(m).as("mi"), col("g.i") === col("mi.i"))
        .join(broadcast(m).as("mj"), col("g.j") === col("mj.i"))
        .select(col("g.i").as("i"), col("g.j").as("j"), col("n"), col("sum_qq"),
          col("mi.s").as("sum_qi"), col("mj.s").as("sum_qj"))
        .orderBy("i", "j")
    }
  )
}
