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
    }
  )
}
