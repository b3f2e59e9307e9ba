package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.{GQuery, Tables}

/** Distributed k-means (Lloyd's) over the embeddings table
  * (beyond-reference; the LLM-pipeline clustering surface — the trainer
  * that produces IVF cells like `Similarity.scala`'s, corpus topic
  * buckets, or dedup pre-partitions).
  *
  * Cross-engine determinism (the hard part of oracling an iterative
  * float algorithm):
  *   - inputs enter as fixed-point BIGINT (`floor(x · 2^20)`), so every
  *     per-cluster component sum is EXACT integer arithmetic —
  *     independent of row order, partitioning, and engine;
  *   - a centroid component is one IEEE division of those exact
  *     integers (bit-exact in both engines);
  *   - a squared distance is a left fold in fixed component order
  *     starting from 0.0 (Spark `aggregate` ≡ DuckDB `list_reduce` with
  *     a prepended 0.0) — the same additions in the same order;
  *   - argmin ties break to the lowest cluster id in both engines.
  *   So a fixed number of Lloyd's rounds is value-exact, and the oracle
  *   simply unrolls them as CTEs.
  *
  * Scale design (100 TB): centroids are K×D driver metadata (like the
  * IVF index) — each round broadcasts them, computes assignments in one
  * codegen'd projection (no shuffle), and updates via
  * posexplode→groupBy(cl, dim) partial aggregation: map-side combine
  * reduces each task to K·D partial sums, so the shuffle is K·D·partitions
  * rows of metadata regardless of corpus size. The fixture's persist is
  * released before returning (the fixed-point projection is
  * deterministic, so the final pass recomputes it safely).
  */
object Clustering {

  private val Scale = 1048576.0 // 2^20 fixed-point
  private val Dim = 64
  private val KC = 4
  // rounds are unrolled in the oracle SQL — keep in sync with it
  private val Rounds = 2

  private type Centroids = Array[(Long, Array[Double])]

  /** argmin-assignment under the broadcast centroids: one projection. */
  private def assign(e: DataFrame, cents: Centroids): DataFrame = {
    val centLit = typedlit(cents.sortBy(_._1).map(_._2.toSeq).toSeq)
    e.withColumn("dists",
      transform(centLit, c =>
        aggregate(
          zip_with(col("x"), c,
            (xv, mv) => (xv.cast("double") - mv) * (xv.cast("double") - mv)),
          lit(0.0), (a, v) => a + v)))
      .withColumn("cl",
        (expr("array_position(dists, array_min(dists))") - 1).cast("long"))
      .drop("dists")
  }

  /** Exact per-cluster component sums → K×D metadata rows → new means.
    * A cluster that lost every member keeps its previous centroid (the
    * standard empty-cluster rule; the oracle's COALESCE mirrors it). */
  private def update(assigned: DataFrame, prev: Centroids): Centroids = {
    val rows = assigned
      .select(col("cl"), posexplode(col("x")))
      .groupBy("cl", "pos")
      .agg(sum("col").as("s"), count(lit(1)).as("n"))
      .collect() // K·D rows — driver metadata, like the IVF centroids
    val byCl = rows.groupBy(_.getLong(0))
    prev.map { case (cl, pm) =>
      byCl.get(cl) match {
        case Some(rs) =>
          val m = new Array[Double](Dim)
          rs.foreach(r => m(r.getInt(1)) = r.getLong(2).toDouble / r.getLong(3).toDouble)
          (cl, m)
        case None => (cl, pm)
      }
    }
  }

  /** The fixed-point embedding frame Lloyd's rounds iterate over. */
  private def fixedPoint(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          v => floor(v * lit(Scale)).cast("long")).as("x"))

  /** Train `k` centroids for `rounds` Lloyd's rounds from the k lowest
    * vec_ids; means are returned in fixed-point units. */
  private def train(e: DataFrame, k: Int, rounds: Int): Centroids = {
    var cents: Centroids = e.orderBy("vec_id").limit(k).collect()
      .zipWithIndex.map { case (r, i) =>
        (i.toLong, r.getSeq[Long](1).map(_.toDouble).toArray)
      }
    for (_ <- 1 to rounds) cents = update(assign(e, cents), cents)
    cents
  }

  /** k-means-trained centroids in ORIGINAL embedding units (each mean
    * component divided by the fixed-point scale — one IEEE division both
    * engines perform on identical doubles). The metadata a trained IVF
    * index is built from. */
  private[queries] def trainedCentroidVectors(
      s: SparkSession, d: String, k: Int, rounds: Int): Seq[(Long, Seq[Double])] = {
    val e = fixedPoint(s, d).persist(StorageLevel.MEMORY_AND_DISK)
    val cents = train(e, k, rounds)
    e.unpersist(blocking = false)
    cents.sortBy(_._1).map { case (cl, m) => (cl, m.map(_ / Scale).toSeq) }.toSeq
  }

  /** The gate: `Rounds` Lloyd's rounds from the K lowest vec_ids, then a
    * final assignment reported per cluster with a centroid checksum. */
  private[graft] def kmeansGate(s: SparkSession, d: String): DataFrame = {
    val e = fixedPoint(s, d).persist(StorageLevel.MEMORY_AND_DISK)
    val cents = train(e, KC, Rounds)
    val fpRows = cents.toSeq.map { case (cl, m) =>
      (cl, m.map(v => math.floor(v).toLong).sum)
    }
    val spark = s
    import spark.implicits._
    val fp = fpRows.toDF("cl", "centroid_fp")
    val result = assign(e, cents)
      .groupBy("cl")
      .agg(count(lit(1)).as("n_members"), sum("vec_id").as("sum_vec_id"))
      .join(broadcast(fp), "cl")
      .select(col("cl"), col("n_members"), col("sum_vec_id"), col("centroid_fp"))
      .orderBy("cl")
    // the fixed-point projection is deterministic — the returned plan may
    // recompute it from parquet; no cache leaks past this call
    e.unpersist(blocking = false)
    result
  }

  /** One Lloyd's round in DuckDB over the fixed-point CTE `src`:
    * assignment (row_number argmin with the same tie rule) + exact
    * component sums → means; `f$i` carries the previous centroid for a
    * cluster that emptied (mirrors `update`). */
  private[queries] def roundSql(i: Int, prevC: String, src: String = "e"): String =
    s"""d$i AS (
       |  SELECT e.vec_id, e.x, c.cl,
       |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list_transform(range(1, ${Dim + 1}),
       |             j -> (CAST(e.x[j] AS DOUBLE) - c.m[j])
       |                  * (CAST(e.x[j] AS DOUBLE) - c.m[j]))),
       |           (a, v) -> a + v) AS dist
       |  FROM $src e CROSS JOIN $prevC c),
       |a$i AS (
       |  SELECT vec_id, x, cl FROM (
       |    SELECT vec_id, x, cl,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
       |    FROM d$i) WHERE rn = 1),
       |s$i AS (
       |  SELECT cl, u.j, CAST(sum(x[u.j]) AS BIGINT) AS s, count(*) AS n
       |  FROM a$i, LATERAL (SELECT unnest(range(1, ${Dim + 1})) AS j) u
       |  GROUP BY cl, u.j),
       |cn$i AS (
       |  SELECT cl, list(CAST(s AS DOUBLE) / n ORDER BY j) AS m
       |  FROM s$i GROUP BY cl),
       |c$i AS (
       |  SELECT p.cl, COALESCE(n.m, p.m) AS m
       |  FROM $prevC p LEFT JOIN cn$i n USING (cl))""".stripMargin

  val queries: Seq[GQuery] = Seq(
    GQuery(
      "q_kmeans",
      s"""WITH
         |e AS (
         |  SELECT vec_id,
         |         list_transform(embedding,
         |           v -> CAST(floor(CAST(v AS DOUBLE) * $Scale) AS BIGINT)) AS x
         |  FROM embeddings),
         |c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cl,
         |         list_transform(x, v -> CAST(v AS DOUBLE)) AS m
         |  FROM (SELECT * FROM e ORDER BY vec_id LIMIT $KC)),
         |${roundSql(1, "c0")},
         |${roundSql(2, "c1")},
         |dF AS (
         |  SELECT e.vec_id, c.cl,
         |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |           list_transform(range(1, ${Dim + 1}),
         |             j -> (CAST(e.x[j] AS DOUBLE) - c.m[j])
         |                  * (CAST(e.x[j] AS DOUBLE) - c.m[j]))),
         |           (a, v) -> a + v) AS dist
         |  FROM e CROSS JOIN c2 c),
         |aF AS (
         |  SELECT vec_id, cl FROM (
         |    SELECT vec_id, cl,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
         |    FROM dF) WHERE rn = 1),
         |fp AS (
         |  SELECT cl,
         |         CAST(list_reduce(list_transform(m,
         |           v -> CAST(floor(v) AS BIGINT)), (a, v) -> a + v) AS BIGINT)
         |           AS centroid_fp
         |  FROM c2)
         |SELECT a.cl, CAST(count(*) AS BIGINT) AS n_members,
         |       CAST(sum(a.vec_id) AS BIGINT) AS sum_vec_id,
         |       max(f.centroid_fp) AS centroid_fp
         |FROM aF a JOIN fp f USING (cl)
         |GROUP BY a.cl ORDER BY a.cl""".stripMargin)(kmeansGate),

    // IVF retrieval over k-means-TRAINED cells: one Lloyd's round trains
    // 16 centroids (fixed-point exact, so both engines derive the
    // identical index — empty cells keep their seed), means convert to
    // embedding units by one division per component, and the standard IVF
    // pipeline (Similarity.ivfRankedWith) retrieves against them. The
    // composition proof that the clustering operator actually trains the
    // ANN index, end to end and value-exact.
    GQuery(
      "q_ann_ivf_trained",
      s"""WITH
         |ex AS (
         |  SELECT vec_id,
         |         list_transform(embedding,
         |           v -> CAST(floor(CAST(v AS DOUBLE) * $Scale) AS BIGINT)) AS x
         |  FROM embeddings),
         |c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cl,
         |         list_transform(x, v -> CAST(v AS DOUBLE)) AS m
         |  FROM (SELECT * FROM ex ORDER BY vec_id LIMIT 16)),
         |${roundSql(1, "c0", "ex")},
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (
         |  SELECT cl AS cid, list_transform(m, v -> v / $Scale) AS cv FROM c1),
         |${Similarity.ivfRetrievalCtes()}
         |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, cand_id, round(sim, 4) AS sim
         |FROM ranked WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
      val cents = trainedCentroidVectors(s, d, k = 16, rounds = 1)
      Similarity.ivfRankedWith(s, d, cents)
        .filter(col("rnk") <= 5)
        .select(col("query_id"), col("rnk").cast("long").as("rnk"),
          col("cand_id"), round(col("sim"), 4).as("sim"))
        .orderBy("query_id", "rnk")
    }
  )
}
