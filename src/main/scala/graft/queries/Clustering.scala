package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.{GQuery, Tables}
import graft.functions.VecFunctions.{vec_argmin_sq, vec_dot_long, vec_sqdist_long}

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

  /** Two-level (coarse→fine) argmin assignment — the SemDeDup-at-scale
    * recipe (hierarchical k-means / IVF-on-IVF). The k fine centroids
    * are grouped into g = ⌈√k⌉ contiguous-id groups of ⌈k/g⌉ cells; a
    * coarse centroid is the elementwise mean of its group's fine
    * centroids (seeds are integer-valued, so the group sum is exact and
    * the mean is ONE IEEE division — engine-order-free). Each vector
    * argmins over the g coarse centroids, then over ONLY the winning
    * group's fine cells: O(n·√k) distance folds instead of O(n·k), so
    * when the SemDeDup rule scales k ∝ corpus, assignment FLOPs grow
    * ∝ n·√k — sub-quadratic — instead of ∝ n·k ≈ n². Deterministic
    * (ordered folds, first-min ties ≡ lowest id) and mirrored verbatim
    * in the q_dedup_semantic oracle SQL, so the correctness gate tests
    * THIS path, not an exact-assignment stand-in. */
  private def assignTwoLevel(e: DataFrame, cents: Centroids): DataFrame = {
    val sorted = cents.sortBy(_._1).map(_._2)
    val k = sorted.length
    val g = math.ceil(math.sqrt(k.toDouble)).toInt
    val size = (k + g - 1) / g
    val groups: Array[Array[Array[Double]]] = sorted.grouped(size).toArray
    val coarse: Array[Array[Double]] = groups.map { grp =>
      Array.tabulate(grp(0).length)(j => grp.map(_(j)).sum / grp.length)
    }
    val coarseLit = typedlit(coarse.map(_.toSeq).toSeq)
    val groupsLit = typedlit(groups.map(_.map(_.toSeq).toSeq).toSeq)
    // native codegen'd argmin (see VecMath.argminSq for the bit-exactness
    // argument) — an interpreted HOF chain here lands in the join's
    // pushed isnotnull(cl) predicates AND both shuffle projections, each
    // copy thousands of boxed eval calls per row (measured 10-60× the
    // whole query's cost at stress scale)
    e.withColumn("gid", vec_argmin_sq(col("x"), coarseLit))
      .withColumn("cl",
        (col("gid").cast("long") * size +
          vec_argmin_sq(col("x"), element_at(groupsLit, col("gid") + 1))
            .cast("long")))
      .drop("gid")
  }

  /** argmin-assignment under the broadcast centroids: one projection. */
  private def assign(e: DataFrame, cents: Centroids): DataFrame = {
    val centLit = typedlit(cents.sortBy(_._1).map(_._2.toSeq).toSeq)
    e.withColumn("cl", vec_argmin_sq(col("x"), centLit).cast("long"))
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
      s: SparkSession, d: String, k: Int, rounds: Int,
      pred: Column = lit(true)): Seq[(Long, Seq[Double])] = {
    // `pred` restricts the TRAINING corpus (the incremental-maintenance
    // gate trains its stale index on the pre-batch slice only); seeds
    // stay "the k lowest vec_ids" of whatever survives the predicate
    val e = fixedPoint(s, d).filter(pred).persist(StorageLevel.MEMORY_AND_DISK)
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

  // ---- product quantization (PQ) -----------------------------------------

  private val M = 8     // subspaces
  private val Dsub = 8  // dims per subspace (M * Dsub = Dim)
  private val KsPQ = 4  // codes per sub-codebook
  require(M * Dsub == Dim, s"PQ layout $M*$Dsub != $Dim")

  /** codebooks indexed [m][k][j] (subspace, code, component). */
  private type Codebooks = Array[Array[Array[Double]]]

  /** Per-subspace argmin code assignment under broadcast codebooks: ONE
    * codegen'd projection computing all M codes per vector (each an
    * argmin over KsPQ codewords of the exact-order squared-L2 fold). */
  private def pqAssign(e: DataFrame, cb: Codebooks): DataFrame = {
    val cbLit = typedlit(cb.map(_.map(_.toSeq).toSeq).toSeq)
    e.withColumn("codes",
      transform(sequence(lit(0), lit(M - 1)), m => {
        val sv = slice(col("x"), m * lit(Dsub) + lit(1), lit(Dsub))
        val ds = transform(element_at(cbLit, m + lit(1)), cw =>
          aggregate(
            zip_with(sv, cw,
              (xv, cv) => (xv.cast("double") - cv) * (xv.cast("double") - cv)),
            lit(0.0), (a, v) => a + v))
        (array_position(ds, array_min(ds)) - 1).cast("int")
      }))
  }

  /** One joint Lloyd's round over all M subspaces: exact integer component
    * sums per (m, code, j) — M·KsPQ·Dsub metadata rows — then one IEEE
    * division per component. A code that lost every member keeps its
    * previous codeword. */
  private def pqUpdate(asg: DataFrame, prev: Codebooks): Codebooks = {
    val rows = asg
      .select(col("x"), posexplode(col("codes")))
      .withColumnRenamed("pos", "m").withColumnRenamed("col", "k")
      .select(col("m"), col("k"),
        posexplode(slice(col("x"), col("m") * lit(Dsub) + lit(1), lit(Dsub))))
      .withColumnRenamed("pos", "j")
      .groupBy("m", "k", "j").agg(sum("col").as("s"), count(lit(1)).as("n"))
      .collect()
    val byMK = rows.groupBy(r => (r.getInt(0), r.getInt(1)))
    Array.tabulate(M, KsPQ, Dsub) { (m, k, j) =>
      byMK.get((m, k)) match {
        case Some(rs) =>
          val r = rs.find(_.getInt(2) == j).get
          r.getLong(3).toDouble / r.getLong(4).toDouble
        case None => prev(m)(k)(j)
      }
    }
  }

  /** The full PQ pipeline as oracle CTEs: fixed-point corpus `e`, seed
    * codebooks, one joint Lloyd's round, encode (`a1`), per-query LUTs and
    * the ADC-scored (query_id, cand_id, adist) stream `ad`. Shared by the
    * ADC gate and the recall eval. */
  private val pqOracleCtes: String = {
    def dCte(name: String, cbName: String) =
      s"""$name AS (
         |  SELECT e.vec_id, c.m, c.k,
         |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |           list_transform(range(1, ${Dsub + 1}),
         |             j -> (CAST(e.x[c.m * $Dsub + j] AS DOUBLE) - c.cw[j])
         |                  * (CAST(e.x[c.m * $Dsub + j] AS DOUBLE) - c.cw[j]))),
         |           (a, v) -> a + v) AS dist
         |  FROM e CROSS JOIN $cbName c)""".stripMargin
    def aCte(name: String, dName: String) =
      s"""$name AS (
         |  SELECT vec_id, m, k FROM (
         |    SELECT vec_id, m, k,
         |           row_number() OVER (PARTITION BY vec_id, m
         |             ORDER BY dist, k) AS rn
         |    FROM $dName) WHERE rn = 1)""".stripMargin
    s"""e AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           v -> CAST(floor(CAST(v AS DOUBLE) * $Scale) AS BIGINT)) AS x
       |  FROM embeddings),
       |seeds AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS k, x
       |  FROM (SELECT * FROM e ORDER BY vec_id LIMIT $KsPQ)),
       |cb0 AS (
       |  SELECT u.m, s.k,
       |         list_transform(range(1, ${Dsub + 1}),
       |           j -> CAST(s.x[u.m * $Dsub + j] AS DOUBLE)) AS cw
       |  FROM seeds s, LATERAL (SELECT unnest(range(0, $M)) AS m) u),
       |${dCte("d0", "cb0")},
       |${aCte("a0", "d0")},
       |s0 AS (
       |  SELECT a.m, a.k, u.j,
       |         CAST(sum(e.x[a.m * $Dsub + u.j]) AS BIGINT) AS s, count(*) AS n
       |  FROM a0 a JOIN e USING (vec_id),
       |       LATERAL (SELECT unnest(range(1, ${Dsub + 1})) AS j) u
       |  GROUP BY a.m, a.k, u.j),
       |cn AS (
       |  SELECT m, k, list(CAST(s AS DOUBLE) / n ORDER BY j) AS cw
       |  FROM s0 GROUP BY m, k),
       |cb1 AS (
       |  SELECT c.m, c.k, COALESCE(n.cw, c.cw) AS cw
       |  FROM cb0 c LEFT JOIN cn n USING (m, k)),
       |${dCte("d1", "cb1")},
       |${aCte("a1", "d1")},
       |q AS (SELECT vec_id AS query_id, x AS qx FROM e WHERE vec_id < 3),
       |lut AS (
       |  SELECT q.query_id, c.m, c.k,
       |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list_transform(range(1, ${Dsub + 1}),
       |             j -> (CAST(q.qx[c.m * $Dsub + j] AS DOUBLE) - c.cw[j])
       |                  * (CAST(q.qx[c.m * $Dsub + j] AS DOUBLE) - c.cw[j]))),
       |           (a, v) -> a + v) AS dv
       |  FROM q CROSS JOIN cb1 c),
       |ad AS (
       |  SELECT l.query_id, a.vec_id AS cand_id,
       |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list(l.dv ORDER BY l.m)), (x, y) -> x + y) AS adist
       |  FROM a1 a JOIN lut l
       |    ON l.m = a.m AND l.k = a.k AND a.vec_id <> l.query_id
       |  GROUP BY l.query_id, a.vec_id)""".stripMargin
  }

  /** Spark twin of [[pqOracleCtes]]: trains, encodes, and ADC-scores every
    * query in one corpus pass → (query_id, cand_id, adist). */
  private def pqScored(s: SparkSession, d: String): DataFrame = {
    val e = fixedPoint(s, d).persist(StorageLevel.MEMORY_AND_DISK)
    // seed codebooks: the KsPQ lowest vec_ids' subvectors
    val seedRows = e.orderBy("vec_id").limit(KsPQ).collect()
    val cb0: Codebooks = Array.tabulate(M, KsPQ, Dsub) { (m, k, j) =>
      seedRows(k).getSeq[Long](1)(m * Dsub + j).toDouble
    }
    // one joint Lloyd's round, then encode the corpus
    val cb1 = pqUpdate(pqAssign(e, cb0), cb0)
    val enc = pqAssign(e, cb1).select(col("vec_id"), col("codes"))
    // ADC lookup tables for all queries, computed driver-side with the
    // identical left fold (0.0 start, component order) as the oracle
    val qRows = e.filter(col("vec_id") < 3).collect().sortBy(_.getLong(0))
    val luts: Seq[Seq[Seq[Double]]] = qRows.toSeq.map { r =>
      val qx = r.getSeq[Long](1)
      Seq.tabulate(M, KsPQ) { (m, k) =>
        var acc = 0.0
        var j = 0
        while (j < Dsub) {
          val df = qx(m * Dsub + j).toDouble - cb1(m)(k)(j)
          acc += df * df
          j += 1
        }
        acc
      }
    }
    val lutLit = typedlit(luts)
    val qidLit = typedlit(qRows.toSeq.map(_.getLong(0)))
    // one corpus pass scores every query: per row, fan out NQ (qi, adist)
    val scored = enc
      .select(col("vec_id").as("cand_id"), posexplode(
        transform(sequence(lit(0), lit(qRows.length - 1)), qi =>
          aggregate(sequence(lit(0), lit(M - 1)), lit(0.0), (acc, m) =>
            acc + element_at(
              element_at(element_at(lutLit, qi + lit(1)), m + lit(1)),
              element_at(col("codes"), m + lit(1)) + lit(1))))))
      .withColumnRenamed("pos", "qi").withColumnRenamed("col", "adist")
      .select(element_at(qidLit, col("qi") + lit(1)).as("query_id"),
        col("cand_id"), col("adist"))
      .filter(col("query_id") =!= col("cand_id"))
    e.unpersist(blocking = false)
    scored
  }

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
    },

    // INCREMENTAL IVF index maintenance: real pipelines do not retrain
    // the coarse quantizer per ingest batch — new vectors are ASSIGNED
    // to the already-trained cells (a broadcast-centroid projection, the
    // corpus never reshuffles) and a drift metric decides when a retrain
    // is due. The gate stages exactly that: the STALE index trains on
    // the pre-batch corpus (vec_id % 10 <> 9 — 90%), the new batch
    // (every 10th vector) is folded in by assignment only, and retrieval
    // over the incremental index is compared against a FULL RETRAIN
    // (k-means over everything, the q_ann_ivf_trained index) via
    // recall@5 per query — the q_ann_ivf_recall recipe with the
    // retrained index as the reference. Everything is deterministic
    // (fixed-point Lloyd round, argmax tie-breaks, identical folds), so
    // the drift metric is value-exact, not a tolerance.
    //
    // Scale: both trainings are the established two-pass fixed-point
    // k-means (centroids are driver metadata); BOTH retrievals are
    // broadcast-literal cell assignments + probe joins — adding the new
    // batch costs one narrow projection over it, no index rebuild, no
    // extra exchange. The drift metric reads 2×(3 queries × 5 rows).
    GQuery(
      "q_ann_ivf_incremental",
      s"""WITH
         |ex AS (
         |  SELECT vec_id,
         |         list_transform(embedding,
         |           v -> CAST(floor(CAST(v AS DOUBLE) * $Scale) AS BIGINT)) AS x
         |  FROM embeddings),
         |exo AS (SELECT * FROM ex WHERE vec_id % 10 <> 9),
         |c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cl,
         |         list_transform(x, v -> CAST(v AS DOUBLE)) AS m
         |  FROM (SELECT * FROM exo ORDER BY vec_id LIMIT 16)),
         |${roundSql(1, "c0", "exo")},
         |c0r AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cl,
         |         list_transform(x, v -> CAST(v AS DOUBLE)) AS m
         |  FROM (SELECT * FROM ex ORDER BY vec_id LIMIT 16)),
         |${roundSql(2, "c0r", "ex")},
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (
         |  SELECT cl AS cid, list_transform(m, v -> v / $Scale) AS cv FROM c1),
         |${Similarity.ivfRetrievalCtes()},
         |cent_r AS (
         |  SELECT cl AS cid, list_transform(m, v -> v / $Scale) AS cv FROM c2),
         |${Similarity.ivfRetrievalCtes(sfx = "_r", centCte = "cent_r")},
         |iv AS (SELECT query_id, cand_id FROM ranked WHERE rnk <= 5),
         |bf AS (SELECT query_id, cand_id FROM ranked_r WHERE rnk <= 5)
         |SELECT b.query_id,
         |       CAST(count(i.cand_id) AS BIGINT) AS n_hit,
         |       count(i.cand_id) / 5.0 AS recall_vs_retrain
         |FROM bf b LEFT JOIN iv i USING (query_id, cand_id)
         |GROUP BY b.query_id ORDER BY query_id""".stripMargin) { (s, d) =>
      // stale index: trained before the batch arrived
      val stale = trainedCentroidVectors(s, d, k = 16, rounds = 1,
        pred = col("vec_id") % 10 =!= 9)
      // full retrain: the reference the drift metric compares against
      val retrained = trainedCentroidVectors(s, d, k = 16, rounds = 1)
      // incremental index = stale centroids + assignment over the FULL
      // corpus (old + new batch): ivfRankedWith's cell assignment IS the
      // broadcast-centroid projection, so folding the batch in costs one
      // narrow pass and zero retraining
      val inc = Similarity.ivfRankedWith(s, d, stale)
        .filter(col("rnk") <= 5)
        .select(col("query_id"), col("cand_id")).withColumn("hit", lit(1L))
      val ref = Similarity.ivfRankedWith(s, d, retrained)
        .filter(col("rnk") <= 5)
        .select("query_id", "cand_id")
      ref.join(broadcast(inc), Seq("query_id", "cand_id"), "left")
        .groupBy("query_id")
        .agg(count(col("hit")).as("n_hit"))
        .select(col("query_id"), col("n_hit"),
          (col("n_hit") / lit(5.0)).as("recall_vs_retrain"))
        .orderBy("query_id")
    },

    // SemDeDup-shaped semantic dedup primitive: partition the corpus into
    // centroid cells, then mine each cell's most-similar pairs with an
    // EXACT pairwise pass — pairwise work is bounded per cell, never
    // corpus². Production removal rule (documented, threshold-gated):
    // drop every vec with a lower-id neighbor above the cosine cutoff;
    // this corpus plants no embedding near-dups (max pairwise cos ≈ .51),
    // so the gate reports each cell's top-3 closest pairs instead — the
    // identical machinery with a rank instead of a threshold, and a
    // never-empty value-exact oracle.
    //   Determinism: vectors quantize to integer thousandths; dot and
    // norms are exact BIGINT folds (order-free); the score is ONE IEEE
    // division of exact integers (dot·|dot| / na·nb, sign-preserving,
    // overflow-safe: |q|≤580 ⇒ dot·|dot| < 5·10¹⁴) rounded to integer e9
    // BEFORE ranking, so the rank order is integer-deterministic with a
    // (va, vb) tiebreak.
    //   Scale (100 TB): assignment is TWO broadcast-centroid projections
    // (coarse ⌈√k⌉ cells, then the winning group's ⌈k/√k⌉ fine cells —
    // O(n·√k) work, so scaling k with the corpus keeps assignment
    // sub-quadratic; flat argmin over all k would be n·k ≈ n²); the
    // self-join shuffles on cl only; K grows with the corpus so cell
    // cardinality — and the per-cell pair count — stays bounded (the
    // SemDeDup recipe); top-3/cell is a per-partition window, no global
    // sort. The oracle mirrors the two-level path verbatim (g=4 groups
    // of 4 at the gate's k=16), so the gate tests the scale path itself.
    GQuery(
      "q_dedup_semantic",
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
         |cgrp AS (
         |  SELECT cl // 4 AS g, r.j AS j, sum(m[r.j]) / 4 AS mv
         |  FROM c0 CROSS JOIN
         |    (SELECT CAST(range AS INT) AS j FROM range(1, ${Dim + 1})) r
         |  GROUP BY 1, 2),
         |cg AS (SELECT g, list(mv ORDER BY j) AS gm FROM cgrp GROUP BY g),
         |dG AS (
         |  SELECT e.vec_id, c.g,
         |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |           list_transform(range(1, ${Dim + 1}),
         |             j -> (CAST(e.x[j] AS DOUBLE) - c.gm[j])
         |                  * (CAST(e.x[j] AS DOUBLE) - c.gm[j]))),
         |           (a, v) -> a + v) AS dist
         |  FROM ex e CROSS JOIN cg c),
         |aG AS (
         |  SELECT vec_id, g FROM (
         |    SELECT vec_id, g,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, g) AS rn
         |    FROM dG) WHERE rn = 1),
         |dF AS (
         |  SELECT e.vec_id, c.cl,
         |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |           list_transform(range(1, ${Dim + 1}),
         |             j -> (CAST(e.x[j] AS DOUBLE) - c.m[j])
         |                  * (CAST(e.x[j] AS DOUBLE) - c.m[j]))),
         |           (a, v) -> a + v) AS dist
         |  FROM ex e JOIN aG ag ON ag.vec_id = e.vec_id
         |  JOIN c0 c ON c.cl // 4 = ag.g),
         |aF AS (
         |  SELECT vec_id, cl FROM (
         |    SELECT vec_id, cl,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
         |    FROM dF) WHERE rn = 1),
         |qn AS (
         |  SELECT vec_id, q,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(q, v -> v * v)), (a, v) -> a + v) AS nn
         |  FROM (SELECT vec_id,
         |          list_transform(embedding,
         |            v -> CAST(floor(CAST(v AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q
         |        FROM embeddings)),
         |pr AS (
         |  SELECT aa.cl, a.vec_id AS va, b.vec_id AS vb,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, ${Dim + 1}),
         |             i -> a.q[i] * b.q[i])), (x, y) -> x + y) AS dot,
         |         a.nn AS na, b.nn AS nb
         |  FROM aF aa
         |  JOIN aF ab ON aa.cl = ab.cl AND aa.vec_id < ab.vec_id
         |  JOIN qn a ON a.vec_id = aa.vec_id
         |  JOIN qn b ON b.vec_id = ab.vec_id),
         |sc AS (
         |  SELECT cl, va, vb,
         |         CAST(round(1000000000 * (CAST(dot * abs(dot) AS DOUBLE)
         |                                  / CAST(na * nb AS DOUBLE))) AS BIGINT)
         |           AS score_e9
         |  FROM pr)
         |SELECT cl, va, vb, score_e9 FROM (
         |  SELECT cl, va, vb, score_e9,
         |         row_number() OVER (PARTITION BY cl
         |           ORDER BY score_e9 DESC, va, vb) AS rn
         |  FROM sc) WHERE rn <= 3
         |ORDER BY cl, score_e9 DESC, va, vb""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // cell count: 16 in the gate (oracle-matched); the stress arm
      // raises it in proportion to corpus size — the SemDeDup recipe that
      // keeps per-cell pairwise work constant (quadratic otherwise)
      val kCells = s.conf.getOption("spark.graft.semdedup.k")
        .map(_.toInt).getOrElse(16)
      val base = Tables.load(s, d, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding").cast("array<double>"),
            v => floor(v * lit(Scale)).cast("long")).as("x"),
          transform(col("embedding").cast("array<double>"),
            v => floor(v * lit(1000d) + lit(0.5)).cast("long")).as("q"))
        .withColumn("nn", vec_dot_long(col("q"), col("q")))
        .persist(StorageLevel.MEMORY_AND_DISK) // seed collect + both join sides; released by the harness clearCache
      val seeds: Centroids = base.orderBy("vec_id").limit(kCells).collect()
        .zipWithIndex.map { case (r, i) =>
          (i.toLong, r.getSeq[Long](1).map(_.toDouble).toArray)
        }
      val asg = assignTwoLevel(base, seeds)
        .select(col("vec_id"), col("cl"), col("q"), col("nn"))
      val pairs = asg.as("a")
        .join(asg.as("b"),
          col("a.cl") === col("b.cl") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.cl").as("cl"),
          col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
          vec_dot_long(col("a.q"), col("b.q")).as("dot"),
          col("a.nn").as("na"), col("b.nn").as("nb"))
        .withColumn("score_e9",
          round(lit(1000000000d) * ((col("dot") * abs(col("dot"))).cast("double")
            / (col("na") * col("nb")).cast("double"))).cast("long"))
      val w = Window.partitionBy("cl")
        .orderBy(col("score_e9").desc, col("va"), col("vb"))
      pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("cl"), col("va"), col("vb"), col("score_e9"))
        .orderBy(col("cl"), col("score_e9").desc, col("va"), col("vb"))
    },

    // Product quantization (PQ) + asymmetric-distance (ADC) ANN search —
    // the memory-scale path of billion-vector retrieval: each vector
    // compresses to M=8 one-byte codes (64 floats → 8 bytes), queries
    // score candidates from an M×KsPQ lookup table without ever touching
    // the original vectors.
    //   Pipeline (all value-exact, same fixed-point discipline as
    // q_kmeans): sub-codebooks seeded from the KsPQ lowest vec_ids'
    // subvectors, ONE joint Lloyd's round across all M subspaces (exact
    // integer sums → one IEEE division per component), corpus encoded in
    // one codegen'd projection, then per-query ADC: LUT[m][k] is the
    // exact-order squared-L2 fold between the query's m-th subvector and
    // codeword (m,k) — driver metadata — and a candidate's distance is
    // the m-ascending fold of its codes' LUT entries, bit-identical to
    // the oracle's ORDER BY m list_reduce.
    //   Scale (100 TB): training shuffles M·KsPQ·Dsub metadata rows
    // (map-side combined) regardless of corpus size; encode is
    // shuffle-free; ALL queries score in one corpus pass (LUTs broadcast
    // as one literal, per-row posexplode fan-out), and only the
    // (query × corpus)-thin (cand, adist) stream shuffles for the
    // per-query top-5 window. The uncompressed corpus is never joined.
    GQuery(
      "q_ann_pq_adc",
      s"""WITH
         |$pqOracleCtes
         |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, cand_id,
         |       CAST(round(adist) AS BIGINT) AS adist_r
         |FROM (SELECT query_id, cand_id, adist,
         |             row_number() OVER (PARTITION BY query_id
         |               ORDER BY adist, cand_id) AS rnk
         |      FROM ad)
         |WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("query_id").orderBy(col("adist"), col("cand_id"))
      pqScored(s, d).withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("query_id"), col("rnk").cast("long").as("rnk"),
          col("cand_id"), round(col("adist")).cast("long").as("adist_r"))
        .orderBy("query_id", "rnk")
    },

    // PQ recall@5 against EXACT brute-force nearest neighbors — the eval
    // that tunes a PQ configuration (M, KsPQ trade memory for recall)
    // before it serves a billion-vector index. The exact arm ranks by
    // squared L2 in the fixed-point integer space (components ≤ 2^20 ⇒
    // a 64-dim squared distance ≤ 2^46: exact BIGINT arithmetic, no
    // float ordering anywhere), so recall is value-exact, not a
    // tolerance check. Scale: queries broadcast against the corpus for
    // the exact arm (the eval-harness shape, run on a sampled query set
    // in production); the PQ arm shares the one-pass ADC stream.
    GQuery(
      "q_ann_pq_recall",
      s"""WITH
         |$pqOracleCtes,
         |bde AS (
         |  SELECT q.query_id, c.vec_id AS cand_id,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, ${Dim + 1}),
         |             j -> (c.x[j] - q.qx[j]) * (c.x[j] - q.qx[j]))),
         |           (a, v) -> a + v) AS d2
         |  FROM q JOIN e c ON c.vec_id <> q.query_id),
         |bfr AS (
         |  SELECT query_id, cand_id,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY d2, cand_id) AS rnk
         |  FROM bde),
         |pq AS (
         |  SELECT query_id, cand_id FROM (
         |    SELECT query_id, cand_id,
         |           row_number() OVER (PARTITION BY query_id
         |             ORDER BY adist, cand_id) AS rnk
         |    FROM ad) WHERE rnk <= 5),
         |bf AS (SELECT query_id, cand_id FROM bfr WHERE rnk <= 5)
         |SELECT b.query_id,
         |       CAST(count(p.cand_id) AS BIGINT) AS n_hit,
         |       count(p.cand_id) / 5.0 AS recall_at_k
         |FROM bf b LEFT JOIN pq p USING (query_id, cand_id)
         |GROUP BY b.query_id ORDER BY query_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("query_id").orderBy(col("adist"), col("cand_id"))
      val pq = pqScored(s, d).withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("query_id"), col("cand_id")).withColumn("hit", lit(1L))
      val e = fixedPoint(s, d)
      val q = e.filter(col("vec_id") < 3).toDF("query_id", "qx")
      val bf = e.toDF("cand_id", "cx")
        .join(broadcast(q), col("cand_id") =!= col("query_id"))
        .select(col("query_id"), col("cand_id"),
          vec_sqdist_long(col("cx"), col("qx")).as("d2"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("query_id").orderBy(col("d2"), col("cand_id"))))
        .filter(col("rnk") <= 5)
        .select("query_id", "cand_id")
      bf.join(broadcast(pq), Seq("query_id", "cand_id"), "left")
        .groupBy("query_id")
        .agg(count(col("hit")).as("n_hit"))
        .select(col("query_id"), col("n_hit"),
          (col("n_hit") / lit(5.0)).as("recall_at_k"))
        .orderBy("query_id")
    }
  )
}
