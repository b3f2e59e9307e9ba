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

  /** Max members of one (band_no, band) bucket admitted to near-dup
    * candidate generation: a bucket past this is a degenerate cluster
    * (constant images, a collapsed band) whose exact duplicates the md5
    * arm already catches — joining it would be quadratic in its size.
    * Declared BEFORE `queries` (the oracle SQL interpolates it eagerly). */
  val BandBucketCap = 64

  val queries: Seq[GQuery] = Seq(
    GQuery(
      "q_multimodal_decode",
      s"""WITH hdoc AS (
         |  SELECT doc_id,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(text)+1),
         |                          i -> CAST(unicode(text[i]) AS BIGINT))),
         |           (a,cp) -> (a*31+cp) % ${OracleFragments.P}) AS h
         |  FROM documents WHERE text <> '')
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
         |  FROM documents WHERE doc_id < 200 AND text <> '')
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
    // Scale: decode is one narrow batched pass that carries BOTH dedup
    // keys out with it (pmd5 + phash are computed while the payload bytes
    // are in hand), so the whole dedup is ONE exchange on the bucket key
    // (map-side combined) — no second payload scan, no media_id join.
    GQuery(
      "q_multimodal_dedup",
      s"""WITH hdoc AS (
         |  SELECT doc_id, md5(text) AS pmd5,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(text)+1),
         |                          i -> CAST(unicode(text[i]) AS BIGINT))),
         |           (a,cp) -> (a*31+cp) % ${OracleFragments.P}) AS h
         |  FROM documents WHERE text <> '')
         |SELECT ((h >> 4) & 15) + 16 * ((h >> 12) & 15)
         |         + 256 * ((h >> 20) & 15) + 4096 * ((h >> 28) & 15) AS bucket,
         |       CAST(count(*) AS BIGINT) AS n_media,
         |       min(doc_id) AS keep_media,
         |       CAST(count(DISTINCT pmd5) AS BIGINT) AS n_payloads
         |FROM hdoc GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
      val media = Multimodal.fromDocuments(Tables.load(s, d, "documents"))
      val bucket = (floor(col("features").getItem(0) * 16) +
        floor(col("features").getItem(1) * 16) * 16 +
        floor(col("features").getItem(2) * 16) * 256 +
        floor(col("features").getItem(3) * 16) * 4096).cast("long")
      Multimodal.decode(media).toDF()
        .select(col("media_id"), bucket.as("bucket"), col("pmd5"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_media"),
          min("media_id").as("keep_media"),
          countDistinct(col("pmd5")).as("n_payloads"))
        .orderBy("bucket")
    },

    // Perceptual-hash near-duplicate detection (the image twin of MinHash
    // LSH): each media row carries the 63-bit pHash the decode pass
    // computed (the REAL DCT pHash for decodable images — grayscale 32×32
    // → 2-D DCT → median-thresholded 8×8 low-frequency block, exercised
    // bit-for-bit in MultimodalSpec on actual PNG/BMP pixels; the
    // deterministic stub for these text payloads, which is what keeps the
    // gate value-oracled). Candidate pairs come from 16-bit BAND buckets:
    // by pigeonhole, hashes within Hamming distance 3 MUST agree on one
    // of the four bands; farther pairs surface with the usual LSH recall
    // probability — the standard banding trade. The EXACT Hamming
    // distance then verifies every candidate, and the ACCEPT threshold
    // is the same d ≤ 3 the banding guarantees: accepting farther pairs
    // would ship a recall hole (a d=9 pair may share NO band) AND an
    // emission volume that grows with band-bucket DENSITY — at 10× the
    // corpus each 16-bit bucket holds ~10× the members, so loose-
    // threshold "near" pairs among band-colliders grow super-linearly
    // (the round-14 stress sweep measured exactly that before this
    // bound was aligned with the guarantee). The gate PLANTS twins:
    // every 50th media gets a copy with ONE deterministically-chosen bit
    // flipped (distance 1 — inside the guarantee), and the operator must
    // recover exactly those pairs (plus any true near-collisions).
    //
    // Scale: no pair enumeration — the only exchanges are the band-bucket
    // self-join (equi-join on (band_no, band)) and the output sort;
    // verify is a per-pair bit_count, and the DISTINCT collapses pairs
    // that agree on several bands before it runs. Degenerate buckets are
    // CAPPED IN THE PLAN (the q_dedup_blocks discipline): a bucket
    // holding more than BandBucketCap members — a constant-image
    // mega-cluster, or a band the hash family happens to collapse — is
    // excluded from candidate generation (its true exact duplicates are
    // the md5 arm's job), so no single bucket can go quadratic. The cap
    // count rides a window over the SAME (band_no, band) key as the
    // self-join — one exchange serves both. Band width stays the other
    // corpus-size knob (wider bands shrink random collisions ~n²/2^w).
    GQuery(
      "q_media_phash_neardup",
      s"""WITH hdoc AS (
         |  SELECT doc_id,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(text)+1),
         |                          i -> CAST(unicode(text[i]) AS BIGINT))),
         |           (a,cp) -> (a*31+cp) % ${OracleFragments.P}) AS h
         |  FROM documents WHERE text <> ''),
         |ph AS (
         |  SELECT media_id,
         |         (q1 & 65535) | ((q2 & 65535) << 16)
         |           | ((q3 & 65535) << 32) | ((q4 & 32767) << 48) AS phash
         |  FROM (SELECT media_id, q1, q2, q3,
         |               ((q3+1)*(q3+1) % ${OracleFragments.P})*(q3+1) % ${OracleFragments.P} AS q4
         |    FROM (SELECT media_id, q1, q2,
         |                 ((q2+1)*(q2+1) % ${OracleFragments.P})*(q2+1) % ${OracleFragments.P} AS q3
         |      FROM (SELECT media_id, q1,
         |                   ((q1+1)*(q1+1) % ${OracleFragments.P})*(q1+1) % ${OracleFragments.P} AS q2
         |        FROM (SELECT doc_id AS media_id,
         |                     (h*h % ${OracleFragments.P})*h % ${OracleFragments.P} AS q1 FROM hdoc))))),
         |all_media AS (
         |  SELECT media_id, phash FROM ph
         |  UNION ALL
         |  SELECT media_id + 1000000000,
         |         xor(phash, CAST(1 AS BIGINT) << CAST(phash % 63 AS INTEGER))
         |  FROM ph WHERE media_id % 50 = 0),
         |bands0 AS (
         |  SELECT media_id, phash, r.j,
         |         (phash >> CAST(16 * r.j AS INTEGER)) & 65535 AS band
         |  FROM all_media CROSS JOIN range(4) r(j)),
         |bands AS (
         |  SELECT media_id, phash, j, band
         |  FROM (SELECT *, count(*) OVER (PARTITION BY j, band) AS bsz
         |        FROM bands0)
         |  WHERE bsz <= ${MediaQueries.BandBucketCap}),
         |cand AS (
         |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
         |         a.phash AS pa, b.phash AS pb
         |  FROM bands a JOIN bands b
         |    ON a.j = b.j AND a.band = b.band AND a.media_id < b.media_id),
         |-- REAL-decode arm: every 40th doc also ships two REAL PNGs —
         |-- a seed-keyed 32x32 raster and its pixel-replicated 64x64
         |-- re-encode, whose box-filter resample is IDENTICAL, so the
         |-- real DCT pHash pair is provably Hamming 0 (equal seeds ==
         |-- equal texts pair across docs too)
         |rr AS (
         |  SELECT h, doc_id + 3000000000 AS rid FROM hdoc WHERE doc_id % 40 = 0
         |  UNION ALL
         |  SELECT h, doc_id + 4000000000 FROM hdoc WHERE doc_id % 40 = 0)
         |SELECT id_a, id_b, hamming FROM (
         |  SELECT id_a, id_b, CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
         |  FROM cand WHERE bit_count(xor(pa, pb)) <= 3
         |  UNION ALL
         |  SELECT a.rid, b.rid, CAST(0 AS BIGINT)
         |  FROM rr a JOIN rr b ON a.h = b.h AND a.rid < b.rid)
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      import s.implicits._
      import graft.functions.TextHash
      import graft.multimodal.Multimodal.MediaRow
      // Every 40th doc ADDS a real-decode pair: a deterministic PNG and
      // its pixel-replicated 2x re-encode. Their REAL DCT pHashes are
      // bit-for-bit equal (synthFrame's replication contract), so the
      // pair must surface at Hamming 0 through the same band pipeline —
      // the full decode→hash→band→verify path runs on REAL payloads
      // while the corpus bulk keeps the stub's cross-engine oracle.
      val docs0 = Tables.load(s, d, "documents")
        .filter(col("text") =!= "")
        .select(col("doc_id"), col("text")).as[(Long, String)]
      val media = docs0.mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val base = MediaRow(id, "image", "image/png",
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          if (id % 40 == 0) {
            val h = TextHash.polyHash(text)
            Iterator(base,
              MediaRow(id + 3000000000L, "image", "image/png",
                Multimodal.synthPng(h, 32)),
              MediaRow(id + 4000000000L, "image", "image/png",
                Multimodal.synthPng(h, 64)))
          } else Iterator.single(base)
        }
      }
      // decode ONCE: the twins arm and both band-join sides all read
      // this cached (media_id, phash) projection — at corpus scale the
      // pixel decode is the dominant cost and must never replan per
      // branch (released by the harness clearCache, like the other
      // multi-branch gates)
      val dec = Multimodal.decode(media).toDF()
        .select(col("media_id"), col("phash"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // bit-flip twins plant on the BASE corpus only (the real-decode
      // ids are ≡0 mod 50 too — 3e9 % 50 = 0 — and twinning them would
      // collide with the +4e9 id space)
      val twins = dec.filter(col("media_id") % 50 === 0 &&
          col("media_id") < 1000000000L)
        .select((col("media_id") + 1000000000L).as("media_id"),
          expr("phash ^ shiftleft(CAST(1 AS BIGINT), CAST(phash % 63 AS INT))")
            .as("phash"))
      val all = dec.unionAll(twins)
      val bands = all
        .select(col("media_id"), col("phash"),
          explode(sequence(lit(0), lit(3))).as("j"))
        .withColumn("band",
          expr("shiftright(phash, CAST(16 * j AS INT)) & 65535"))
        // degenerate-bucket cap BEFORE candidate generation: the window
        // partitions on the self-join's own key, so its exchange is the
        // join's exchange — no extra shuffle for the guard
        .withColumn("bsz", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("j", "band")))
        .filter(col("bsz") <= MediaQueries.BandBucketCap)
        .drop("bsz")
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.j") === col("b.j") && col("a.band") === col("b.band") &&
            col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
          col("a.phash").as("pa"), col("b.phash").as("pb"))
        .distinct()
      cand
        .withColumn("hamming",
          bit_count(col("pa").bitwiseXOR(col("pb"))).cast("long"))
        .filter(col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    },

    // Video near-duplicate detection over SAMPLED-FRAME perceptual
    // hashes: each clip contributes k=4 evenly-sampled frame hashes
    // (Multimodal.decodeFrames — the REAL per-frame DCT pHash for
    // animated GIFs, the slot-mixed deterministic stub for these text
    // payloads, which keeps the gate value-oracled; the real path is
    // exercised frame-for-frame in MultimodalSpec on actual animated
    // GIF bytes incl. a re-encode at another size and a truncated tail).
    // Candidates come from 16-bit band buckets keyed by (slot, band_no,
    // band): a pair is a candidate when ANY aligned sampled frame
    // agrees on any band — per frame the usual pigeonhole guarantee
    // (frame distance ≤3 must share a band). Verification is EXACT: the
    // two slot-aligned hash sequences join on slot and the Hamming SUM
    // over common slots decides (≤10 across ≥2 aligned frames). Planted
    // twins: every 50th clip gets a "re-encode" twin (one bit of slot
    // 0's hash flipped — codec noise on one frame), every 75th a
    // "truncated" twin carrying only the first 3 of 4 slots (a cut-off
    // tail: the surviving sampled slots coincide); both must surface,
    // plus the re-encode×truncated pair where both exist (every 150th).
    //
    // Scale: no pair enumeration — candidate generation is an equi-join
    // on (slot, band_no, band) with the degenerate-bucket cap sharing
    // that same exchange; verify joins hash SEQUENCES (k rows per clip,
    // metadata-sized) for candidate pairs only. Frame count per clip is
    // bounded by k regardless of clip length — 100 TB of video stays
    // k×8 bytes of hash state per clip.
    GQuery(
      "q_video_phash_neardup",
      s"""WITH hdoc AS (
         |  SELECT doc_id,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(text)+1),
         |                          i -> CAST(unicode(text[i]) AS BIGINT))),
         |           (a,cp) -> (a*31+cp) % ${OracleFragments.P}) AS h
         |  FROM documents WHERE text <> ''),
         |fr AS (
         |  SELECT media_id, slot,
         |         (q1 & 65535) | ((q2 & 65535) << 16)
         |           | ((q3 & 65535) << 32) | ((q4 & 32767) << 48) AS fhash
         |  FROM (SELECT media_id, slot, q1, q2, q3,
         |               ((q3+1)*(q3+1) % ${OracleFragments.P})*(q3+1) % ${OracleFragments.P} AS q4
         |    FROM (SELECT media_id, slot, q1, q2,
         |                 ((q2+1)*(q2+1) % ${OracleFragments.P})*(q2+1) % ${OracleFragments.P} AS q3
         |      FROM (SELECT media_id, slot, q1,
         |                   ((q1+1)*(q1+1) % ${OracleFragments.P})*(q1+1) % ${OracleFragments.P} AS q2
         |        FROM (SELECT media_id, slot, (hh*hh % ${OracleFragments.P})*hh % ${OracleFragments.P} AS q1
         |          FROM (SELECT doc_id AS media_id, CAST(r.i AS INTEGER) AS slot,
         |                       (h*31 + r.i) % ${OracleFragments.P} AS hh
         |                FROM hdoc CROSS JOIN range(4) r(i)) t))))),
         |all_f AS (
         |  SELECT media_id, slot, fhash FROM fr
         |  UNION ALL
         |  SELECT media_id + 1000000000, slot,
         |         CASE WHEN slot = 0
         |           THEN xor(fhash, CAST(1 AS BIGINT)
         |                             << CAST(fhash % 63 AS INTEGER))
         |           ELSE fhash END
         |  FROM fr WHERE media_id % 50 = 0
         |  UNION ALL
         |  SELECT media_id + 2000000000, slot, fhash
         |  FROM fr WHERE media_id % 75 = 0 AND slot < 3),
         |bands0 AS (
         |  SELECT media_id, slot, fhash, r.j,
         |         (fhash >> CAST(16 * r.j AS INTEGER)) & 65535 AS band
         |  FROM all_f CROSS JOIN range(4) r(j)),
         |bands AS (
         |  SELECT media_id, slot, j, band
         |  FROM (SELECT *, count(*) OVER (PARTITION BY slot, j, band) AS bsz
         |        FROM bands0)
         |  WHERE bsz <= ${MediaQueries.BandBucketCap}),
         |cand AS (
         |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.slot = b.slot AND a.j = b.j AND a.band = b.band
         |       AND a.media_id < b.media_id),
         |pairs AS (
         |  SELECT c.id_a, c.id_b,
         |         CAST(count(*) AS BIGINT) AS n_common,
         |         CAST(sum(bit_count(xor(fa.fhash, fb.fhash))) AS BIGINT)
         |           AS ham_sum
         |  FROM cand c
         |  JOIN all_f fa ON fa.media_id = c.id_a
         |  JOIN all_f fb ON fb.media_id = c.id_b AND fb.slot = fa.slot
         |  GROUP BY 1, 2),
         |-- REAL-decode arm: every 60th doc also ships two REAL animated
         |-- GIFs (8 seed-keyed frames; the second is the pixel-replicated
         |-- 64x64 re-encode) whose per-slot REAL DCT hashes are equal —
         |-- the pair is provably (n_common 4, ham_sum 0)
         |rrv AS (
         |  SELECT h, doc_id + 3000000000 AS rid FROM hdoc WHERE doc_id % 60 = 0
         |  UNION ALL
         |  SELECT h, doc_id + 4000000000 FROM hdoc WHERE doc_id % 60 = 0)
         |SELECT id_a, id_b, n_common, ham_sum FROM (
         |  SELECT id_a, id_b, n_common, ham_sum
         |  FROM pairs WHERE ham_sum <= 10 AND n_common >= 2
         |  UNION ALL
         |  SELECT a.rid, b.rid, CAST(4 AS BIGINT), CAST(0 AS BIGINT)
         |  FROM rrv a JOIN rrv b ON a.h = b.h AND a.rid < b.rid)
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      import s.implicits._
      import graft.functions.TextHash
      import graft.multimodal.Multimodal.MediaRow
      // Every 60th doc ADDS a real-decode pair: an 8-frame animated GIF
      // and its pixel-replicated 2x re-encode, whose sampled-frame REAL
      // DCT hashes agree slot-for-slot (ham_sum exactly 0 over 4 common
      // slots) — the real multi-frame decode→hash→band→verify path runs
      // inside the driver gate while the corpus bulk keeps the stub's
      // cross-engine oracle.
      val docs0 = Tables.load(s, d, "documents")
        .filter(col("text") =!= "")
        .select(col("doc_id"), col("text")).as[(Long, String)]
      val media = docs0.mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val base = MediaRow(id, "video", "video/mp4",
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          if (id % 60 == 0) {
            val h = TextHash.polyHash(text)
            Iterator(base,
              MediaRow(id + 3000000000L, "video", "image/gif",
                Multimodal.synthGif(h, 8, 32)),
              MediaRow(id + 4000000000L, "video", "image/gif",
                Multimodal.synthGif(h, 8, 64)))
          } else Iterator.single(base)
        }
      }
      // one narrow frame-hash pass; every later branch (twin planting,
      // both band-join sides, both verify sides) reads this cached
      // k-rows-per-clip projection — at corpus scale the frame decode
      // dominates and must never replan
      val frames = Multimodal.decodeFrames(media, 4)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // twin plants ride the BASE corpus only: 3e9 ≡ 0 mod both 50 and
      // 75, so unguarded plants on the real-decode ids would collide
      // with the +4e9 id space
      val twinsRe = frames.filter(col("media_id") % 50 === 0 &&
          col("media_id") < 1000000000L)
        .select((col("media_id") + 1000000000L).as("media_id"), col("slot"),
          when(col("slot") === 0,
            expr("fhash ^ shiftleft(CAST(1 AS BIGINT), CAST(fhash % 63 AS INT))"))
            .otherwise(col("fhash")).as("fhash"))
      val twinsTr = frames.filter(col("media_id") % 75 === 0 &&
          col("media_id") < 1000000000L && col("slot") < 3)
        .select((col("media_id") + 2000000000L).as("media_id"),
          col("slot"), col("fhash"))
      val all = frames.unionAll(twinsRe).unionAll(twinsTr)
      val bands = all
        .select(col("media_id"), col("slot"), col("fhash"),
          explode(sequence(lit(0), lit(3))).as("j"))
        .withColumn("band",
          expr("shiftright(fhash, CAST(16 * j AS INT)) & 65535"))
        // degenerate-bucket cap on the self-join's own key — the
        // window's exchange IS the join's exchange
        .withColumn("bsz", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("slot", "j", "band")))
        .filter(col("bsz") <= MediaQueries.BandBucketCap)
        .drop("bsz", "fhash")
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.slot") === col("b.slot") && col("a.j") === col("b.j") &&
            col("a.band") === col("b.band") &&
            col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
        .distinct()
      val fa = all.select(col("media_id").as("id_a"), col("slot"),
        col("fhash").as("fa"))
      val fb = all.select(col("media_id").as("id_b"), col("slot"),
        col("fhash").as("fb"))
      cand.join(fa, Seq("id_a")).join(fb, Seq("id_b", "slot"))
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("n_common"),
          sum(bit_count(col("fa").bitwiseXOR(col("fb"))).cast("long"))
            .as("ham_sum"))
        .filter(col("ham_sum") <= 10 && col("n_common") >= 2)
        .select("id_a", "id_b", "n_common", "ham_sum")
        .orderBy("id_a", "id_b")
    },

    // Audio perceptual near-duplicate detection over the REAL spectral
    // fingerprint: each document synthesizes a REAL RIFF/WAVE PCM16
    // payload (orthogonal DFT-bin sines) whose gain-invariant
    // Haitsma-Kalker-style fingerprint — per-segment Goertzel band
    // energies, bits from the sign of the time×frequency energy delta,
    // computed IN the decode pass — encodes the cross-engine hash
    // pattern EXACTLY (Multimodal.synthWav builds ±1-level energy
    // staircases whose sign margins sit orders of magnitude above PCM
    // rounding noise; MultimodalSpec proves the roundtrip bit-for-bit).
    // Every 50th document plants a twin that is BOTH gain-shifted
    // (0.55×) and re-encoded (12 kHz / 768-sample segments vs 8 kHz /
    // 512): its payload md5 differs and every amplitude statistic
    // scales with the gain — the two keys the old exact-dedup arm used
    // — but the fingerprint is IDENTICAL, because a gain change scales
    // every band energy by g² (sign-preserving) and the bands live at
    // cycles-per-segment, not Hz (resample-invariant). The oracle
    // recomputes the planted pattern in exact integer space, so the
    // whole real-decode path (WAV container parse → PCM16 extraction →
    // Goertzel → sign bits) is VALUE-ORACLED end to end: one flipped
    // bit anywhere breaks the hash compare. Unlike the image gate,
    // whose driver path rides the stub hash, this gate exercises the
    // real spectral kernel on every row.
    //
    // Scale: identical shape to q_media_phash_neardup — synth+decode is
    // one narrow batched pass carrying the fingerprint out with it; the
    // only exchanges are the (band_no, band) self-join (which the
    // degenerate-bucket cap's window shares) and the output sort; exact
    // bit_count verifies every candidate; no pair enumeration anywhere.
    GQuery(
      "q_audio_fp_neardup",
      s"""WITH hdoc AS (
         |  SELECT doc_id,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(text)+1),
         |                          i -> CAST(unicode(text[i]) AS BIGINT))),
         |           (a,cp) -> (a*31+cp) % ${OracleFragments.P}) AS h
         |  FROM documents WHERE text <> ''),
         |fp AS (
         |  SELECT media_id,
         |         (q1 & 65535) | ((q2 & 65535) << 16)
         |           | ((q3 & 65535) << 32) | ((q4 & 32767) << 48) AS phash
         |  FROM (SELECT media_id, q1, q2, q3,
         |               ((q3+1)*(q3+1) % ${OracleFragments.P})*(q3+1) % ${OracleFragments.P} AS q4
         |    FROM (SELECT media_id, q1, q2,
         |                 ((q2+1)*(q2+1) % ${OracleFragments.P})*(q2+1) % ${OracleFragments.P} AS q3
         |      FROM (SELECT media_id, q1,
         |                   ((q1+1)*(q1+1) % ${OracleFragments.P})*(q1+1) % ${OracleFragments.P} AS q2
         |        FROM (SELECT doc_id AS media_id,
         |                     (h*h % ${OracleFragments.P})*h % ${OracleFragments.P} AS q1 FROM hdoc))))),
         |all_media AS (
         |  SELECT media_id, phash FROM fp
         |  UNION ALL
         |  -- the planted twin is gain-shifted AND resampled, which the
         |  -- gain/rate-invariant fingerprint maps to the SAME value
         |  SELECT media_id + 1000000000, phash
         |  FROM fp WHERE media_id % 50 = 0),
         |bands0 AS (
         |  SELECT media_id, phash, r.j,
         |         (phash >> CAST(16 * r.j AS INTEGER)) & 65535 AS band
         |  FROM all_media CROSS JOIN range(4) r(j)),
         |bands AS (
         |  SELECT media_id, phash, j, band
         |  FROM (SELECT *, count(*) OVER (PARTITION BY j, band) AS bsz
         |        FROM bands0)
         |  WHERE bsz <= ${MediaQueries.BandBucketCap}),
         |cand AS (
         |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
         |         a.phash AS pa, b.phash AS pb
         |  FROM bands a JOIN bands b
         |    ON a.j = b.j AND a.band = b.band AND a.media_id < b.media_id)
         |SELECT id_a, id_b, CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(pa, pb)) <= 3
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      import s.implicits._
      import graft.functions.TextHash
      import graft.multimodal.Multimodal.MediaRow
      val docs0 = Tables.load(s, d, "documents")
        .filter(col("text") =!= "")
        .select(col("doc_id"), col("text")).as[(Long, String)]
      val media = docs0.mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val pattern = Multimodal.stubPHash(TextHash.polyHash(text))
          val base = MediaRow(id, "audio", "audio/wav",
            Multimodal.synthWav(pattern, 512, 250.0, 8000))
          if (id % 50 == 0)
            Iterator(base, MediaRow(id + 1000000000L, "audio", "audio/wav",
              // gain 0.55× AND 12 kHz / 768-sample re-encode: md5 and
              // amplitude stats both miss it, the fingerprint does not
              Multimodal.synthWav(pattern, 768, 137.0, 12000)))
          else Iterator.single(base)
        }
      }
      // decode ONCE (real WAV parse + Goertzel fingerprint); both band
      // self-join sides read this cached projection
      val dec = Multimodal.decode(media).toDF()
        .select(col("media_id"), col("phash"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bands = dec
        .select(col("media_id"), col("phash"),
          explode(sequence(lit(0), lit(3))).as("j"))
        .withColumn("band",
          expr("shiftright(phash, CAST(16 * j AS INT)) & 65535"))
        // degenerate-bucket cap IN THE PLAN, sharing the self-join's
        // own (j, band) exchange — the q_media_phash_neardup discipline
        .withColumn("bsz", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("j", "band")))
        .filter(col("bsz") <= MediaQueries.BandBucketCap)
        .drop("bsz")
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.j") === col("b.j") && col("a.band") === col("b.band") &&
            col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
          col("a.phash").as("pa"), col("b.phash").as("pb"))
        .distinct()
      cand
        .withColumn("hamming",
          bit_count(col("pa").bitwiseXOR(col("pb"))).cast("long"))
        .filter(col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    }
  )
}
