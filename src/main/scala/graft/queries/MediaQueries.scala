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
    },

    // Media dedup (the image-corpus stage of SemDeDup): exact duplicates
    // by payload fingerprint (md5 over the binary), near-duplicates by
    // quantized feature bucket — floor(f_j·16) nibbles composed into one
    // key, so visually-identical assets (identical stub features) land in
    // one bucket and the keeper is the min media_id. The oracle recomputes
    // both from the generating text: md5(text) IS the payload md5
    // (payload = UTF-8 bytes), and the quantized nibbles are bit-slices
    // of the same hash fold the decode stub exposes as features.
    //
    // Scale: decode is one narrow batched pass; the dedup is ONE exchange
    // on the bucket key (map-side combined). The media_id join of the
    // fingerprint and feature projections exists because the tested
    // decode API drops payloads; a production pipeline folds md5 into the
    // decode mapPartitions pass and the join disappears.
    GQuery(
      "q_multimodal_dedup",
      s"""WITH hdoc AS (
         |  SELECT doc_id, md5(text) AS pmd5,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(text)+1),
         |                          i -> CAST(unicode(text[i]) AS BIGINT))),
         |           (a,cp) -> (a*31+cp) % ${OracleFragments.P}) AS h
         |  FROM documents)
         |SELECT ((h >> 4) & 15) + 16 * ((h >> 12) & 15)
         |         + 256 * ((h >> 20) & 15) + 4096 * ((h >> 28) & 15) AS bucket,
         |       CAST(count(*) AS BIGINT) AS n_media,
         |       min(doc_id) AS keep_media,
         |       CAST(count(DISTINCT pmd5) AS BIGINT) AS n_payloads
         |FROM hdoc GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
      val media = Multimodal.fromDocuments(Tables.load(s, d, "documents"))
      val prints = media.toDF()
        .select(col("media_id"), md5(col("payload")).as("pmd5"))
      val bucket = (floor(col("features").getItem(0) * 16) +
        floor(col("features").getItem(1) * 16) * 16 +
        floor(col("features").getItem(2) * 16) * 256 +
        floor(col("features").getItem(3) * 16) * 4096).cast("long")
      Multimodal.decode(media).toDF()
        .select(col("media_id"), bucket.as("bucket"))
        .join(prints, "media_id")
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_media"),
          min("media_id").as("keep_media"),
          countDistinct(col("pmd5")).as("n_payloads"))
        .orderBy("bucket")
    }
  )
}
