package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{GQuery, Tables}
import graft.multimodal.Multimodal

/** Query surface for the multimodal plumbing (graft.multimodal): binary
  * payload → batched stub decode → typed metadata + features. The stub's
  * arithmetic is the cross-engine TextHash fold, so the oracle recomputes
  * identical values from the same source column (all features are dyadic
  * rationals — exact IEEE doubles on both engines, no rounding needed).
  */
object MediaQueries {

  val queries: Seq[GQuery] = Seq(
    GQuery(
      "q_multimodal_decode",
      s"""WITH hdoc AS (
         |  SELECT doc_id,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(text)+1),
         |                          i -> CAST(unicode(text[i]) AS BIGINT))),
         |           (a,cp) -> (a*31+cp) % ${OracleFragments.P}) AS h
         |  FROM documents)
         |SELECT doc_id AS media_id, 'image' AS kind,
         |       CAST(h % 640 + 16 AS INTEGER) AS width,
         |       CAST(h // 640 % 480 + 16 AS INTEGER) AS height,
         |       CAST(1 AS INTEGER) AS n_frames,
         |       ((h >> 0) & 255) / 256.0 AS f0,
         |       ((h >> 8) & 255) / 256.0 AS f1,
         |       ((h >> 16) & 255) / 256.0 AS f2,
         |       ((h >> 24) & 255) / 256.0 AS f3
         |FROM hdoc ORDER BY media_id""".stripMargin) { (s, d) =>
      val media = Multimodal.fromDocuments(Tables.load(s, d, "documents"))
      Multimodal.decode(media).toDF()
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          col("n_frames"),
          col("features").getItem(0).as("f0"),
          col("features").getItem(1).as("f1"),
          col("features").getItem(2).as("f2"),
          col("features").getItem(3).as("f3"))
        .orderBy("media_id")
    },

    // Full media pipeline: video decode → resize(224×224) → deterministic
    // frame sampling (4 evenly-spaced indices, deduped), exploded to one
    // row per sampled frame. The oracle recomputes n_frames from the same
    // hash and states the sampling arithmetic (i·n/4, floor division).
    GQuery(
      "q_multimodal_frames",
      s"""WITH hdoc AS (
         |  SELECT doc_id,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(text)+1),
         |                          i -> CAST(unicode(text[i]) AS BIGINT))),
         |           (a,cp) -> (a*31+cp) % ${OracleFragments.P}) AS h
         |  FROM documents WHERE doc_id < 200)
         |SELECT DISTINCT doc_id AS media_id,
         |       CAST(224 AS INTEGER) AS width,
         |       CAST(224 AS INTEGER) AS height,
         |       CAST(i * (h % 24 + 1) // 4 AS BIGINT) AS frame_idx
         |FROM hdoc CROSS JOIN range(4) r(i)
         |ORDER BY media_id, frame_idx""".stripMargin) { (s, d) =>
      val media = Multimodal.fromDocuments(
        Tables.load(s, d, "documents").filter(col("doc_id") < 200), kind = "video")
      val resized = Multimodal.resize(Multimodal.decode(media), 224, 224)
      Multimodal.frameSample(resized, 4)
        .join(resized.toDF().select(col("media_id"), col("width"), col("height")), "media_id")
        .select(col("media_id"), col("width"), col("height"),
          explode(col("frame_indices")).as("frame_idx"))
        .orderBy("media_id", "frame_idx")
    }
  )
}
