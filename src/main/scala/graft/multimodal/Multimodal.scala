package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in batches inside
  * `mapPartitions` (the Scala analogue of `mapInPandas`: per-partition
  * batch iteration with a fixed batch size, so a real decoder amortizes
  * model/codec setup across a batch instead of paying it per row).
  *
  * Image payloads decode FOR REAL through the JDK's ImageIO
  * (PNG/BMP/GIF/JPEG — [[imageDecode]]): true dimensions from the
  * container, per-channel pixel means as features. Payloads with no image
  * signature (and audio/video, for which this container has no codecs)
  * take a clearly-marked DETERMINISTIC STUB whose arithmetic is the
  * cross-engine TextHash fold, so DuckDB reproduces it exactly and the
  * driver gate stays a value-level oracle. Everything around the decode is
  * the real engineering surface either way: schema (typed case classes +
  * Encoders), partition preservation (narrow mapPartitions, no shuffle),
  * batch shape, null-payload handling.
  *
  * Scale design (100 TB of media): decode/feature-extract are one-pass
  * narrow transforms — parallelism is inherited from the scan; batches
  * bound peak memory per task (BatchSize payloads, not a partition's
  * worth); a real deployment swaps `stubDecode`/`stubFeatures` for codec
  * calls without touching any plumbing.
  */
object Multimodal {

  /** One media row: opaque payload + envelope metadata. */
  final case class MediaRow(
      media_id: Long, kind: String, mime: String, payload: Array[Byte])

  /** Decoded metadata + a small feature vector + the two dedup keys a
    * production pipeline computes IN the decode pass (so no later join
    * has to re-read payloads): `pmd5` — hex md5 of the raw payload bytes
    * (exact dedup); `phash` — 63-bit perceptual hash (near dedup): the
    * real DCT pHash for decodable images, the deterministic stub
    * otherwise. Bit 63 is always 0 so the value is non-negative as a
    * signed BIGINT on every engine (band arithmetic needs no unsigned
    * shifts). */
  final case class DecodedMedia(
      media_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, features: Array[Double], pmd5: String, phash: Long)

  /** Batch size for per-partition processing (the `mapInPandas` batch
    * analogue: a real decoder would decode these BatchSize payloads as one
    * vectorized call). */
  val BatchSize = 64

  val FeatureDim = 4

  /** STUB — deterministic fake decode. A real implementation parses the
    * image/audio container here (payload headers → dimensions/frames).
    * The fake derives everything from the TextHash fold of the payload
    * bytes so the DuckDB oracle can recompute identical values. */
  def stubDecode(m: MediaRow): DecodedMedia = {
    val h = TextHash.polyHash(new String(m.payload, java.nio.charset.StandardCharsets.UTF_8))
    val width = (h % 640 + 16).toInt
    val height = (h / 640 % 480 + 16).toInt
    val nFrames = if (m.kind == "image") 1 else (h % 24 + 1).toInt
    DecodedMedia(m.media_id, m.kind, width, height, nFrames, stubFeatures(h),
      "", stubPHash(h))
  }

  /** STUB — deterministic fake feature extractor: byte-slices of the hash
    * as dyadic rationals (exact in IEEE double on every engine). */
  def stubFeatures(h: Long): Array[Double] =
    Array.tabulate(FeatureDim)(j => ((h >> (8 * j)) & 255).toDouble / 256.0)

  /** STUB — deterministic fake perceptual hash for payloads with no real
    * pixel decode: four INDEPENDENT 16-bit slices (distinct multipliers
    * mod the fold prime), so band-LSH over the stub spreads like a real
    * hash instead of collapsing into the low bits. Top slice keeps 15
    * bits — bit 63 stays 0 (same sign contract as [[pHash64]]). Every
    * operand is integer and < 2^34, so a SQL oracle reproduces it
    * exactly. */
  def stubPHash(h: Long): Long = {
    // INDEPENDENT bands via chained cubing mod P. Two hard-won lessons
    // from the r14 stress sweep are baked in:
    //   1. the bands must not be LINEAR in h — structured hash families
    //      (the stress corpus's replica texts poly-hash to arithmetic
    //      progressions mod P) flow straight through linear maps into
    //      near-identical 16-bit bands. Cubing kills that (x³ is a
    //      BIJECTION mod P: gcd(3, P−1)=1 — squaring is 2-to-1 and
    //      manufactures h vs P−h pattern collisions);
    //   2. the bands must not be linearly related to EACH OTHER — the
    //      old (3q,5q,7q,9q) family let one lucky difference
    //      dq ∈ 65536·Z collide ALL FOUR bands at once (~1.4k phantom
    //      near-dup pairs at 10× corpus). Each band now truncates its
    //      own cube-chain state, so a full-pattern collision needs four
    //      independent 16-bit coincidences (~2⁻⁶³ per pair).
    // h < P ≈ 2^30, so x·x < 2^60 and (x·x % P)·x < 2^60 stay exact in
    // a Long (and in the oracle's BIGINT — the SQL mirrors chain the
    // same cubes).
    def cube(x: Long): Long = x * x % TextHash.P * x % TextHash.P
    val q1 = cube(h)
    val q2 = cube(q1 + 1)
    val q3 = cube(q2 + 1)
    val q4 = cube(q3 + 1)
    (q1 & 0xffffL) | ((q2 & 0xffffL) << 16) |
      ((q3 & 0xffffL) << 32) | ((q4 & 0x7fffL) << 48)
  }

  private val PHashN = 32 // resample edge for the DCT input

  /** cos((2x+1)·u·π/64) for x in [0,32), u in [0,8) — the only DCT
    * factors the 8×8 low-frequency block ever reads. */
  private lazy val DctCos: Array[Array[Double]] =
    Array.tabulate(8, PHashN)((u, x) =>
      math.cos((2 * x + 1) * u * math.Pi / (2.0 * PHashN)))

  /** REAL perceptual hash (the classic DCT pHash): grayscale box-filter
    * resample to 32×32 (deterministic integer luminance sums — no AWT
    * scaler, whose filtering is platform-dependent), 2-D DCT-II, keep the
    * 8×8 low-frequency block, threshold each of the 63 AC coefficients on
    * their median. Bit k (k in [0,63)) is AC coefficient k in row-major
    * (u,v) order skipping DC; bit 63 is always 0 (non-negative BIGINT).
    * Near-identical images (re-encode, mild brightness/noise) agree on
    * most bits — Hamming distance is the near-dup metric, band-LSH over
    * 16-bit slices is the scale path (no pair enumeration). */
  def pHash64(img: java.awt.image.BufferedImage): Long = {
    val N = PHashN
    val w = img.getWidth
    val h = img.getHeight
    // box-filter resample of integer luminance into N×N cells
    val sums = Array.ofDim[Long](N, N)
    val counts = Array.ofDim[Long](N, N)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      val ty = (y.toLong * N / h).toInt
      var x = 0
      while (x < w) {
        val p = row(x)
        val lum = (299 * ((p >> 16) & 255) + 587 * ((p >> 8) & 255) +
          114 * (p & 255)) / 1000
        val tx = (x.toLong * N / w).toInt
        sums(ty)(tx) += lum
        counts(ty)(tx) += 1
        x += 1
      }
      y += 1
    }
    val g = Array.ofDim[Double](N, N)
    var i = 0
    while (i < N) {
      var j = 0
      while (j < N) {
        g(i)(j) = if (counts(i)(j) == 0) 0.0
          else sums(i)(j).toDouble / counts(i)(j)
        j += 1
      }
      i += 1
    }
    // 8×8 low-frequency block of the 2-D DCT-II (normalization constants
    // drop out — only the SIGN vs the median matters)
    val ac = new Array[Double](63)
    var u = 0
    var k = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        if (u != 0 || v != 0) {
          var s = 0.0
          var x = 0
          while (x < N) {
            var yy = 0
            var rowSum = 0.0
            while (yy < N) {
              rowSum += g(x)(yy) * DctCos(v)(yy)
              yy += 1
            }
            s += rowSum * DctCos(u)(x)
            x += 1
          }
          ac(k) = s
          k += 1
        }
        v += 1
      }
      u += 1
    }
    val median = {
      val sorted = ac.clone(); java.util.Arrays.sort(sorted); sorted(31)
    }
    var bits = 0L
    k = 0
    while (k < 63) {
      if (ac(k) > median) bits |= 1L << k
      k += 1
    }
    bits
  }

  /** True iff the payload starts with a container signature the JDK's
    * ImageIO ships readers for (PNG/BMP/GIF/JPEG) — the cheap sniff that
    * keeps non-image payloads off the ImageIO reader-registry path. */
  def looksLikeImage(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        (b(0) == 'B' && b(1) == 'M') ||
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||
        (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte))

  /** A declared-dimension ceiling (64 Mpixel): a hostile header claiming
    * a gigapixel raster must fall back to the stub BEFORE ImageIO
    * allocates it (decompression-bomb guard), not OOM the task. */
  val MaxPixels: Long = 64L * 1024 * 1024

  /** REAL decode via the JDK's ImageIO (PNG/BMP/GIF/JPEG readers ship in
    * the JDK — no external codecs needed): container headers give the
    * true dimensions; the feature vector is the per-channel pixel mean
    * (A,R,G,B) in [0,1], computed from exact integer sums over the ARGB
    * raster so the values are deterministic across runs and partitions.
    * Dimensions are read from the header FIRST and checked against
    * [[MaxPixels]] before any raster is allocated; a payload ImageIO
    * cannot parse (or that fails the cap) falls back to the deterministic
    * stub, so non-image media keep their cross-engine value oracle. */
  def imageDecode(m: MediaRow): DecodedMedia = {
    val img =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(m.payload))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); null }
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            // header-only dimension read — no raster allocated yet
            val (w, h) = (r.getWidth(0), r.getHeight(0))
            if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) null
            else r.read(0)
          } finally { r.dispose(); iis.close() }
        }
      } catch { case _: Exception => null }
    if (img == null) stubDecode(m)
    else {
      val w = img.getWidth
      val h = img.getHeight
      var sa = 0L; var sr = 0L; var sg = 0L; var sb = 0L
      val row = new Array[Int](w) // one bulk scanline read per row —
      var y = 0                   // not the per-pixel getRGB slow path
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w) // ARGB, color-model-normalized
        var x = 0
        while (x < w) {
          val p = row(x)
          sa += (p >>> 24) & 255; sr += (p >> 16) & 255
          sg += (p >> 8) & 255; sb += p & 255
          x += 1
        }
        y += 1
      }
      val n = 255.0 * (w.toLong * h)
      DecodedMedia(m.media_id, m.kind, w, h, 1,
        Array(sa / n, sr / n, sg / n, sb / n), "", pHash64(img))
    }
  }

  // ---- gain-invariant audio fingerprint ---------------------------------

  /** Time segments of the spectral fingerprint: the clip splits into
    * AudioSegments equal windows; consecutive-window energy deltas give
    * AudioSegments−1 bit rows. */
  val AudioSegments = 9

  /** Analysis bands as DFT-bin cycle counts PER SEGMENT WINDOW (not Hz):
    * frequencies scale with the window, so a re-encode at a different
    * sample rate — same content, different sample count — lands on the
    * same bins and fingerprints identically. Distinct integer bins are
    * exactly orthogonal over the window, so band energies don't bleed.
    * AudioBands.length−1 band deltas × (AudioSegments−1) segment deltas
    * = 64 cells; the last is dropped to keep bit 63 clear (the same
    * non-negative-BIGINT contract as [[pHash64]]). */
  val AudioBands: Array[Int] = Array(3, 5, 7, 9, 11, 13, 15, 17, 19)

  /** Shortest per-segment window the fingerprint accepts: bins up to 19
    * cycles need headroom below Nyquist (L/2), and shorter windows have
    * too little energy for stable sign decisions. Clips shorter than
    * AudioSegments·AudioMinSeg samples keep the stub hash. */
  val AudioMinSeg = 64

  /** REAL gain-invariant audio fingerprint (the classic spectral-band
    * sign fingerprint — per-window energies in fixed bands, bits from
    * the sign of the time×frequency energy delta, the Haitsma–Kalker
    * shape): the mono PCM clip splits into [[AudioSegments]] windows of
    * L = n/AudioSegments samples; E(m,b) is the Goertzel power at bin
    * [[AudioBands]](b) over window m; bit (m−1)·8+b (m≥1, b<8) is
    *
    *   E(m,b) − E(m,b+1) − E(m−1,b) + E(m−1,b+1) > 0.
    *
    * A gain change scales EVERY energy by g², so each delta scales by
    * g² > 0 and every bit is preserved EXACTLY — unlike the payload md5
    * (different bytes) and amplitude statistics (scale with g), both of
    * which a volume change defeats. Hamming distance over the 63 bits is
    * the near-dup metric; band-LSH over 16-bit slices is the scale path
    * (identical to the image pHash recipe — no pair enumeration).
    * Returns −1 for clips shorter than the analysis floor (caller keeps
    * the stub hash). */
  def audioFp64(x: Array[Int]): Long = {
    val s = AudioSegments
    val l = x.length / s
    if (l < AudioMinSeg) return -1L
    val nb = AudioBands.length
    val e = Array.ofDim[Double](s, nb)
    var m = 0
    while (m < s) {
      var b = 0
      while (b < nb) {
        val c = 2.0 * math.cos(2.0 * math.Pi * AudioBands(b) / l)
        var s1 = 0.0
        var s2 = 0.0
        var t = 0
        val off = m * l
        while (t < l) {
          val s0 = x(off + t) + c * s1 - s2
          s2 = s1
          s1 = s0
          t += 1
        }
        e(m)(b) = s1 * s1 + s2 * s2 - c * s1 * s2 // Goertzel power at the bin
        b += 1
      }
      m += 1
    }
    var bits = 0L
    var k = 0
    m = 1
    while (m < s) {
      var b = 0
      while (b < nb - 1 && k < 63) {
        val dd = (e(m)(b) - e(m)(b + 1)) - (e(m - 1)(b) - e(m - 1)(b + 1))
        if (dd > 0) bits |= 1L << k
        k += 1
        b += 1
      }
      m += 1
    }
    bits
  }

  /** Wrap mono PCM16 samples as a minimal RIFF/WAVE byte payload (the
    * 44-byte canonical header + little-endian samples) — real container
    * bytes [[audioDecode]] parses through javax.sound. */
  def wavBytes(pcm: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = pcm.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.put("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(16).putShort(1).putShort(1).putInt(sampleRate)
    bb.putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(dataLen)
    var i = 0
    while (i < pcm.length) { bb.putShort(pcm(i)); i += 1 }
    bb.array()
  }

  /** Synthesize a REAL PCM16 WAV whose [[audioFp64]] fingerprint is
    * EXACTLY `pattern` — the audio twin of planting a known pHash. Each
    * segment m carries every band b as a sine at bin [[AudioBands]](b)
    * with energy level E(m,b) built so each fingerprint delta is ±1
    * level by construction: F(m,b) walks ±1 per target bit
    * (F(0,·) = 0), E(m,b) = 70 + Σ_{j≥b} F(m,j) ∈ [6,134] > 0, and
    * amplitude(m,b) = amp·√E(m,b). Distinct integer bins are exactly
    * orthogonal over the window, so the decoded Goertzel powers are
    * amp²·L²/4·E(m,b)·(gain)² plus PCM rounding noise orders of
    * magnitude below one level — every sign decision is unambiguous at
    * ANY gain or segment length, which is precisely what lets the
    * driver gate plant gain-shifted AND resampled twins whose
    * fingerprints collide exactly while their md5 and amplitude
    * statistics differ. Peak amplitude ≤ 9·amp·√134 must stay under
    * 2^15 (amp ≤ ~280). */
  // sin(2π·k_b·t/L) depends only on (L, b, t) — one table per segment
  // length serves every synthesized clip (the per-doc cost drops to
  // multiply-adds; the map stays 1–2 entries in practice)
  private val SinTables =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Double]]]()
  private def sinTable(segLen: Int): Array[Array[Double]] =
    SinTables.computeIfAbsent(segLen, l =>
      Array.tabulate(AudioBands.length, l.intValue())((b, t) =>
        math.sin(2.0 * math.Pi * AudioBands(b) * t / l.intValue())))

  def synthWav(pattern: Long, segLen: Int, amp: Double, sampleRate: Int): Array[Byte] = {
    val s = AudioSegments
    val nb = AudioBands.length
    val f = Array.ofDim[Int](s, nb - 1)
    var k = 0
    var m = 1
    while (m < s) {
      var b = 0
      while (b < nb - 1) {
        val step = if (k < 63 && ((pattern >> k) & 1L) == 1L) 1 else -1
        f(m)(b) = f(m - 1)(b) + step
        k += 1
        b += 1
      }
      m += 1
    }
    val e = Array.ofDim[Int](s, nb)
    m = 0
    while (m < s) {
      e(m)(nb - 1) = 70
      var b = nb - 2
      while (b >= 0) { e(m)(b) = e(m)(b + 1) + f(m)(b); b -= 1 }
      m += 1
    }
    val pcm = new Array[Short](s * segLen)
    val sines = sinTable(segLen)
    m = 0
    while (m < s) {
      val a = Array.tabulate(nb)(b => amp * math.sqrt(e(m)(b).toDouble))
      var t = 0
      while (t < segLen) {
        var v = 0.0
        var b = 0
        while (b < nb) {
          v += a(b) * sines(b)(t)
          b += 1
        }
        val r = math.rint(v)
        pcm(m * segLen + t) =
          math.max(-32768.0, math.min(32767.0, r)).toShort
        t += 1
      }
      m += 1
    }
    wavBytes(pcm, sampleRate)
  }

  // ---- deterministic synthetic images / clips ----------------------------

  /** splitmix-style per-cell value in [0,256) — deterministic across
    * JVMs and partitions. */
  private def cellGray(seed: Long, i: Int, j: Int, frame: Int): Int = {
    var z = seed + i * 0x9E3779B97F4A7C15L + j * 0xBF58476D1CE4E5B9L +
      frame * 0x2545F4914F6CDD1DL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    ((z ^ (z >>> 31)) >>> 24).toInt & 255
  }

  /** Deterministic grayscale frame: a seed-keyed 32×32 base grid
    * rendered at any `side` by PIXEL REPLICATION (x → ⌊x·32/side⌋ — the
    * same floor map [[pHash64]]'s box filter uses), so EVERY rendered
    * size resamples back to the identical 32×32 luminance grid and the
    * DCT hash is bit-for-bit EQUAL across sizes. That makes a re-encode
    * at another resolution a near-dup twin with a PROVABLE hash
    * relation (Hamming 0) — the handle that lets the driver gates run
    * the real decode→hash path while staying value-oracled. */
  def synthFrame(seed: Long, side: Int, frame: Int = 0): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      side, side, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < side) {
      val j = (y.toLong * 32 / side).toInt
      var x = 0
      while (x < side) {
        raster.setSample(x, y, 0, cellGray(seed, (x.toLong * 32 / side).toInt, j, frame))
        x += 1
      }
      y += 1
    }
    img
  }

  /** One-frame PNG (lossless — the exactness [[synthFrame]] promises
    * survives the container). */
  def synthPng(seed: Long, side: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(synthFrame(seed, side), "png", bos)
    bos.toByteArray
  }

  /** Animated GIF of `frames` [[synthFrame]]s (GIF is the one multi-frame
    * container the JDK reads; a 256-gray palette encodes TYPE_BYTE_GRAY
    * exactly). */
  def synthGif(seed: Long, frames: Int, side: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    (0 until frames).foreach(f =>
      w.writeToSequence(
        new javax.imageio.IIOImage(synthFrame(seed, side, f), null, null), null))
    w.endWriteSequence(); w.dispose(); ios.close()
    bos.toByteArray
  }

  /** True iff the payload is a RIFF/WAVE container — the audio format the
    * JDK's javax.sound.sampled decodes without external codecs. */
  def looksLikeWav(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** REAL audio decode via the JDK's javax.sound.sampled (WAV/PCM — no
    * external codecs): header gives sample rate, channels and frame
    * count; features are exact-integer amplitude statistics of the PCM16
    * samples — [mean |amplitude|, RMS, min, max], each normalized by
    * 2^15 (sums stay < 2^63 under the [[MaxPixels]]-style byte cap).
    * Envelope mapping: width = sample rate, height = channels,
    * n_frames = sample frames. Non-PCM16 or unparseable audio falls back
    * to the deterministic stub, keeping the value oracle. */
  def audioDecode(m: MediaRow): DecodedMedia = {
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.payload))
      val fmt = ais.getFormat
      val frames = ais.getFrameLength
      val bytes = frames * fmt.getFrameSize
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
        fmt.getSampleSizeInBits != 16 || frames <= 0 || bytes > MaxPixels)
        stubDecode(m)
      else {
        val data = ais.readAllBytes()
        val n = data.length / 2
        // header said `frames` but the payload is truncated/empty: the
        // stats below would be NaN/garbage with no exception to catch —
        // quarantine to the stub like any other undecodable payload
        if (n == 0 || data.length.toLong < bytes) return stubDecode(m)
        var sumAbs = 0L; var sumSq = 0L
        var mn = Long.MaxValue; var mx = Long.MinValue
        var i = 0
        while (i + 1 < data.length) {
          // PCM16 sample in the container's declared byte order
          val lo = data(i) & 0xff; val hi = data(i + 1)
          val s: Long =
            if (fmt.isBigEndian) ((data(i) << 8) | (data(i + 1) & 0xff)).toLong
            else ((hi << 8) | lo).toLong
          sumAbs += math.abs(s); sumSq += s * s
          if (s < mn) mn = s
          if (s > mx) mx = s
          i += 2
        }
        // gain-invariant spectral fingerprint over channel 0, computed
        // IN the decode pass (the bytes are in hand — no second payload
        // scan downstream, the same discipline as the image pHash);
        // clips under the analysis floor keep the stub hash
        val frameSize = fmt.getFrameSize
        val nFrames = data.length / frameSize
        val fp =
          if (nFrames / AudioSegments >= AudioMinSeg) {
            val ch0 = new Array[Int](nFrames)
            var j = 0
            while (j < nFrames) {
              val o = j * frameSize
              ch0(j) =
                if (fmt.isBigEndian) (data(o) << 8) | (data(o + 1) & 0xff)
                else (data(o + 1) << 8) | (data(o) & 0xff)
              j += 1
            }
            audioFp64(ch0)
          } else -1L
        val norm = 32768.0
        DecodedMedia(m.media_id, m.kind,
          fmt.getSampleRate.toInt, fmt.getChannels, frames.toInt,
          Array(sumAbs.toDouble / n / norm,
            math.sqrt(sumSq.toDouble / n) / norm,
            mn / norm, mx / norm),
          "",
          if (fp >= 0L) fp
          else stubPHash(TextHash.polyHash(new String(m.payload,
            java.nio.charset.StandardCharsets.UTF_8))))
      }
    } catch { case _: Exception => stubDecode(m) }
  }

  /** True iff the payload is a GIF container — the one multi-frame
    * format the JDK's ImageIO decodes frame-by-frame without external
    * codecs (animated GIF: `getNumImages` > 1). */
  def looksLikeGif(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 &&
      b(0) == 'G' && b(1) == 'I' && b(2) == 'F'

  /** Deterministic per-slot stub frame hashes for payloads with no real
    * multi-frame decode: slot i re-mixes the payload fold before the
    * [[stubPHash]] slices, so the k sampled frames of one clip spread
    * like independent hashes (SQL-exact: `(h*31 + i) % P` then the
    * documented slice arithmetic). */
  def stubFramePHashes(h: Long, k: Int): Array[Long] =
    Array.tabulate(k)(i => stubPHash((h * 31 + i) % TextHash.P))

  /** Per-sampled-frame perceptual hashes for multi-frame media: k evenly
    * spaced frames (the [[frameSample]] arithmetic — slot i reads frame
    * i·n/k) each hashed with the REAL DCT [[pHash64]] when the payload
    * is a GIF the JDK can decode frame-by-frame; any other payload (or a
    * decode failure / dimension-cap hit) takes the per-slot stub, so the
    * synthetic-corpus gates keep their cross-engine value oracle. The
    * slot-aligned hash sequence is the video near-dup key: a re-encode
    * perturbs single frames a few bits, a truncation shifts which frames
    * the slots sample — both stay near under a per-slot Hamming sum,
    * while different content is far on every slot. */
  def framePHashes(m: MediaRow, k: Int): Array[Long] = {
    if (looksLikeGif(m.payload)) {
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(m.payload))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); null }
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val n = r.getNumImages(true)
            val w = r.getWidth(0).toLong
            val h = r.getHeight(0).toLong
            if (n <= 0 || w <= 0 || h <= 0 || w * h > MaxPixels) null
            else {
              // evenly spaced sample indices, deduped (short clips
              // repeat indices; hashing each frame once is enough)
              val idx = (0 until k).map(i => (i.toLong * n / k).toInt).distinct
              val hs = idx.map(i => pHash64(r.read(i)))
              // re-expand to k slots so sequences stay slot-aligned
              Array.tabulate(k)(i =>
                hs(idx.indexOf((i.toLong * n / k).toInt)))
            }
          } finally { r.dispose(); iis.close() }
        }
      } catch { case _: Exception => null }
    } else null
  } match {
    case null =>
      stubFramePHashes(TextHash.polyHash(new String(m.payload,
        java.nio.charset.StandardCharsets.UTF_8)), k)
    case real => real
  }

  /** Batched per-frame hash extraction: one narrow pass emitting
    * (media_id, slot, fhash) — k rows per clip, partitioning inherited
    * from the scan, decode amortized per batch like [[decode]]. */
  def decodeFrames(media: Dataset[MediaRow], k: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator
          .filter(m => m.payload != null && m.payload.nonEmpty)
          .flatMap { m =>
            framePHashes(m, k).iterator.zipWithIndex.map {
              case (fh, slot) => (m.media_id, slot, fh)
            }
          }
      }
    }.toDF("media_id", "slot", "fhash")
  }

  /** True iff the payload is an ISO-BMFF container (MP4/MOV/M4A): a
    * top-level `ftyp` box leads the file. */
  def looksLikeMp4(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  /** True iff the payload is a RIFF/AVI container. */
  def looksLikeAvi(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 255L) << 24) | ((b(o + 1) & 255L) << 16) |
      ((b(o + 2) & 255L) << 8) | (b(o + 3) & 255L)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def le32(b: Array[Byte], o: Int): Long =
    ((b(o + 3) & 255L) << 24) | ((b(o + 2) & 255L) << 16) |
      ((b(o + 1) & 255L) << 8) | (b(o) & 255L)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk ISO-BMFF boxes in payload[from, to): calls f(type, payloadFrom,
    * payloadTo) per box. Size-sanity guarded (a hostile size that escapes
    * the window or loops stops the walk — same fail-to-stub discipline as
    * the image decompression-bomb cap). */
  private def walkBoxes(b: Array[Byte], from: Int, to: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var o = from
    while (o + 8 <= to) {
      var size = be32(b, o)
      var hdr = 8
      if (size == 1 && o + 16 <= to) { size = be64(b, o + 8); hdr = 16 }
      else if (size == 0) size = (to - o).toLong // box extends to end
      if (size < hdr || size > to - o) return // corrupt/hostile size
      f(fourcc(b, o + 4), o + hdr, o + size.toInt)
      o += size.toInt
    }
  }

  /** REAL video container metadata — pure JDK byte arithmetic, no codec:
    *
    *   - MP4 (ISO BMFF): `moov/mvhd` gives timescale+duration; each
    *     `trak` gives `tkhd` width/height (16.16 fixed point), its
    *     `mdia/hdlr` handler type, and its `stbl/stts` total sample
    *     count. The VIDEO trak's sample count is the frame count (an
    *     audio trak has far more samples — routing on `hdlr` type
    *     matters, reference: the mime-typed media envelope).
    *   - AVI (RIFF): `hdrl/avih` carries dwTotalFrames + dwWidth/dwHeight
    *     directly (little-endian).
    *
    * Pixel data stays undecodable here (no JDK video codec) — features
    * remain the deterministic stub; only the ENVELOPE becomes real. An
    * unparseable container falls back to the stub entirely, keeping the
    * synthetic-payload oracle. */
  def videoDecode(m: MediaRow): DecodedMedia = {
    try {
      val b = m.payload
      var width = 0; var height = 0; var frames = 0L
      if (looksLikeMp4(b)) {
        walkBoxes(b, 0, b.length) {
          case ("moov", mf, mt) =>
            walkBoxes(b, mf, mt) {
              case ("trak", tf, tt) =>
                var w = 0; var h = 0; var isVideo = false; var samples = 0L
                walkBoxes(b, tf, tt) {
                  case ("tkhd", o, e) =>
                    val off = o + (if (b(o) == 1) 88 else 76) // v1 vs v0
                    if (off + 8 <= e) {
                      w = (be32(b, off) >> 16).toInt // 16.16 fixed point
                      h = (be32(b, off + 4) >> 16).toInt
                    }
                  case ("mdia", df, dt) =>
                    walkBoxes(b, df, dt) {
                      case ("hdlr", o, e) if o + 12 <= e =>
                        isVideo = fourcc(b, o + 8) == "vide"
                      case ("minf", nf, nt) =>
                        walkBoxes(b, nf, nt) {
                          case ("stbl", sf, st) =>
                            walkBoxes(b, sf, st) {
                              case ("stts", o, e) if o + 8 <= e =>
                                val entries = be32(b, o + 4).toInt
                                var i = 0
                                var total = 0L
                                while (i < entries && o + 8 + i * 8 + 4 <= e) {
                                  total += be32(b, o + 8 + i * 8)
                                  i += 1
                                }
                                samples = total
                              case _ =>
                            }
                          case _ =>
                        }
                      case _ =>
                    }
                  case _ =>
                }
                if (isVideo) { width = w; height = h; frames = samples }
              case _ =>
            }
          case _ =>
        }
      } else if (looksLikeAvi(b)) {
        // RIFF chunks: [fourcc][le size][payload]; LIST chunks nest with a
        // 4-byte list type leading the payload
        def walkRiff(from: Int, to: Int)(f: (String, Int, Int) => Unit): Unit = {
          var o = from
          while (o + 8 <= to) {
            val id = fourcc(b, o)
            val size = le32(b, o + 4)
            if (size < 0 || size > to - o - 8) return
            f(id, o + 8, o + 8 + size.toInt)
            o += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
          }
        }
        walkRiff(12, b.length) {
          case ("LIST", lf, lt) if lt - lf >= 4 && fourcc(b, lf) == "hdrl" =>
            walkRiff(lf + 4, lt) {
              case ("avih", o, e) if o + 40 <= e =>
                frames = le32(b, o + 16) // dwTotalFrames
                width = le32(b, o + 32).toInt
                height = le32(b, o + 36).toInt
              case _ =>
            }
          case _ =>
        }
      }
      if (frames <= 0 || frames > Int.MaxValue || width < 0 || height < 0)
        stubDecode(m)
      else {
        val h = TextHash.polyHash(
          new String(m.payload, java.nio.charset.StandardCharsets.UTF_8))
        DecodedMedia(m.media_id, m.kind, width, height, frames.toInt,
          stubFeatures(h), "", stubPHash(h))
      }
    } catch { case _: Exception => stubDecode(m) }
  }

  /** Wrap a documents frame as a media table: the text payload stands in
    * for image/video bytes (same opaque-binary plumbing, deterministic). */
  def fromDocuments(docs: DataFrame, kind: String = "image"): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      lit(kind).as("kind"),
      lit(if (kind == "image") "image/png" else "video/mp4").as("mime"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Batched decode: one narrow pass, `BatchSize` payloads per decode
    * call, partitioning preserved. Null/empty payloads yield no row
    * (decode failures drop, as a real pipeline would quarantine them). */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // one digest per task, reset per payload — md5 is folded INTO the
      // decode pass (the payload bytes are already in hand), so exact
      // dedup downstream needs no second payload scan and no join
      val md = java.security.MessageDigest.getInstance("MD5")
      def md5Hex(b: Array[Byte]): String = {
        md.reset()
        val d = md.digest(b)
        val sb = new java.lang.StringBuilder(32)
        var i = 0
        while (i < d.length) {
          sb.append(Character.forDigit((d(i) >> 4) & 15, 16))
          sb.append(Character.forDigit(d(i) & 15, 16))
          i += 1
        }
        sb.toString
      }
      it.grouped(BatchSize).flatMap { batch =>
        // IMAGE rows with a real image signature go through ImageIO (true
        // pixel decode); audio/video (no codecs here) and unparseable
        // payloads keep the oracle-backed stub — routing on kind matters:
        // a video row whose bytes happen to parse as an image must still
        // report its stub frame count, not n_frames=1
        batch.iterator
          .filter(m => m.payload != null && m.payload.nonEmpty)
          .map { m =>
            val d =
              if (m.kind == "image" && looksLikeImage(m.payload)) imageDecode(m)
              else if (m.kind == "audio" && looksLikeWav(m.payload)) audioDecode(m)
              else if (m.kind == "video" &&
                (looksLikeMp4(m.payload) || looksLikeAvi(m.payload))) videoDecode(m)
              else stubDecode(m)
            d.copy(pmd5 = md5Hex(m.payload))
          }
      }
    }
  }

  /** Resize: metadata transform, payload passthrough (a real impl
    * re-encodes pixels here). */
  def resize(decoded: Dataset[DecodedMedia], w: Int, h: Int): Dataset[DecodedMedia] = {
    import decoded.sparkSession.implicits._
    decoded.map(d => d.copy(width = w, height = h))
  }

  /** Deterministic frame sampling: k evenly-spaced frame indices. */
  def frameSample(decoded: Dataset[DecodedMedia], k: Int): DataFrame = {
    import decoded.sparkSession.implicits._
    decoded.map { d =>
      val idx = (0 until k).map(i => i.toLong * d.n_frames / k).distinct.toArray
      (d.media_id, idx)
    }.toDF("media_id", "frame_indices")
  }
}
