package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic, cross-engine-reproducible text hashing for the dedup /
  * fingerprinting operators.
  *
  * Everything here is defined in plain modular arithmetic over Unicode code
  * points so the DuckDB oracle can compute the *identical* value in SQL
  * (list_reduce + unicode()), giving the sketch-based operators (minhash,
  * simhash) full value-level oracles instead of rows-only checks:
  *
  *   polyHash(s)  = fold(a = 0; a = (a*31 + codepoint) mod P)        P = 1e9+7
  *   perm_i(h)    = (A_i * h + B_i) mod P,
  *                  A_i = (1 + i*2654435761) mod P, B_i = 7i + 3
  *   minhash sig  = [ min over shingles of perm_i(polyHash(shingle)) ]_i<k
  *   shingles     = n-word grams of lower(s).split(\s+), joined by ' '
  *                  (whole token list joined if fewer than n tokens)
  *   simhash64    = 60-bit: bits 0..29 from polyHash(mult 31),
  *                  bits 30..59 from polyHash37(mult 37); bit j set iff
  *                  2 * count(tokens with bit j) > n_tokens
  *
  * All intermediates stay below 2^63 (A_i < P ≤ 1e9+6, h < P, so
  * A_i*h < ~1e18) — no silent overflow on either engine.
  *
  * Hot path notes: static methods over UTF8String/String, tight loops, no
  * per-row allocation beyond the signature array. Called from codegen'd
  * expressions (see HashExpressions.scala), so rows never leave Tungsten.
  */
object TextHash {

  val P: Long = 1000000007L

  /** Canonical minhash signature length. Every producer (Dedup's LSH
    * signatures, TextAnalysis's q_group_signature) and consumer
    * (MinHashUnion's merge buffer) derives from this one constant so a
    * length drift cannot silently truncate or MaxValue-pad a signature. */
  val SigK: Int = 64

  def polyHash(s: String): Long = polyHashMult(s, 31L)

  def polyHashMult(s: String, mult: Long): Long = {
    var a = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      a = (a * mult + cp) % P
      i += Character.charCount(cp)
    }
    a
  }

  @inline def permA(i: Int): Long = (1L + i.toLong * 2654435761L) % P
  @inline def permB(i: Int): Long = 7L * i + 3L

  def tokenize(s: String): Array[String] =
    s.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)

  /** n-word shingles joined by single spaces; the whole token list as one
    * shingle when there are fewer than n tokens. */
  def shingles(tokens: Array[String], n: Int): Array[String] = {
    if (tokens.length < n) Array(tokens.mkString(" "))
    else Array.tabulate(tokens.length - n + 1) { i =>
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      sb.toString
    }
  }

  /** k-permutation minhash signature over n-word shingles. */
  def minHashSig(text: String, k: Int, n: Int): Array[Long] = {
    val sh = shingles(tokenize(text), n)
    val hs = new Array[Long](sh.length)
    var i = 0
    while (i < sh.length) { hs(i) = polyHash(sh(i)); i += 1 }
    val sig = Array.fill(k)(Long.MaxValue)
    var p = 0
    while (p < k) {
      val a = permA(p)
      val b = permB(p)
      var m = Long.MaxValue
      var j = 0
      while (j < hs.length) {
        val v = (a * hs(j) + b) % P
        if (v < m) m = v
        j += 1
      }
      sig(p) = m
      p += 1
    }
    sig
  }

  /** 60-bit simhash over word unigrams (bit j from the two poly hashes). */
  def simHash64(text: String): Long = {
    val toks = tokenize(text)
    val counts = new Array[Int](60)
    var t = 0
    while (t < toks.length) {
      val h1 = polyHashMult(toks(t), 31L)
      val h2 = polyHashMult(toks(t), 37L)
      var j = 0
      while (j < 30) {
        if (((h1 >> j) & 1L) == 1L) counts(j) += 1
        if (((h2 >> j) & 1L) == 1L) counts(30 + j) += 1
        j += 1
      }
      t += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (2 * counts(j) > toks.length) sig |= (1L << j)
      j += 1
    }
    sig
  }

  // ---- UTF8String entry points used by codegen ---------------------------

  def polyHashU(s: UTF8String): Long = polyHash(s.toString)

  /** Per-thread reused zlib deflater (level 6, zlib framing): a Deflater
    * holds native state and allocating one per row would dominate the
    * hot path — reset() recycles it for the next row. */
  private val deflaters = ThreadLocal.withInitial[java.util.zip.Deflater](
    () => new java.util.zip.Deflater(6))

  /** Deflated byte length of the UTF-8 text — the compressibility
    * quality signal (highly compressible ⇒ repetitive/templated text;
    * the Gopher/RefinedWeb-family "compression ratio" filter). Only the
    * LENGTH is kept; the compressed bytes are thrown away as they
    * stream out of the native deflater. */
  def deflateLen(bytes: Array[Byte]): Long = {
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0L
    val buf = new Array[Byte](4096)
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  def deflateLenU(s: UTF8String): Long = deflateLen(s.getBytes)

  def minHashSigU(s: UTF8String, k: Int, n: Int): ArrayData =
    new GenericArrayData(minHashSig(s.toString, k, n))

  def shingleHashesU(s: UTF8String, n: Int): ArrayData = {
    val sh = shingles(tokenize(s.toString), n)
    val hs = new Array[Long](sh.length)
    var i = 0
    while (i < sh.length) { hs(i) = polyHash(sh(i)); i += 1 }
    new GenericArrayData(hs)
  }

  def simHash64U(s: UTF8String): Long = simHash64(s.toString)

  /** Band hash for LSH banding: polyHash-style fold over r signature
    * values — (acc*31 + v) mod P. */
  def bandHash(sig: Array[Long], start: Int, r: Int): Long = {
    var a = 0L
    var i = start
    while (i < start + r) {
      a = (a * 31L + sig(i)) % P
      i += 1
    }
    a
  }

  def bandHashU(sig: ArrayData, start: Int, r: Int): Long = {
    var a = 0L
    var i = start
    while (i < start + r) {
      a = (a * 31L + sig.getLong(i)) % P
      i += 1
    }
    a
  }

  @inline private def cpLen(s: String): Long =
    s.codePointCount(0, s.length).toLong

  /** One-pass n-gram repetition covers (the Gopher rules' expensive
    * half): over tokenize(text), returns
    * (tok_chars, top2_cover, dup3_chars) where top2_cover is the char
    * coverage (occurrences × gram length incl. joining spaces) of the
    * single most repeated 2-gram and dup3_chars is the char mass of
    * 3-grams occurring more than once. Hash-map run counting — O(grams)
    * per row with two per-call maps; the higher-order-function
    * formulation this replaces was interpreter-bound (CodegenFallback)
    * and ~40× slower per row. Lengths are code points, matching SQL
    * length() on both engines. */
  def gramCoversU(
      s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = tokenize(s.toString)
    var tokChars = 0L
    var i = 0
    while (i < toks.length) { tokChars += cpLen(toks(i)); i += 1 }
    // bigrams: cover = count × length is monotone in count per gram, so
    // the running max over increments equals the max over final counts
    val big = new java.util.HashMap[String, Integer]()
    var top2 = 0L
    i = 0
    while (i + 1 < toks.length) {
      val g = toks(i) + " " + toks(i + 1)
      val c = big.merge(g, Integer.valueOf(1),
        (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
      val cover = c.longValue * cpLen(g)
      if (cover > top2) top2 = cover
      i += 1
    }
    // trigrams: a count reaching 2 contributes both occurrences; each
    // further occurrence adds one gram length
    val tri = new java.util.HashMap[String, Integer]()
    var dup3 = 0L
    i = 0
    while (i + 2 < toks.length) {
      val g = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
      val c = tri.merge(g, Integer.valueOf(1),
        (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
      val L = cpLen(g)
      if (c.intValue == 2) dup3 += 2 * L
      else if (c.intValue > 2) dup3 += L
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](tokChars, top2, dup3))
  }

  /** One-pass per-document term frequencies: over tokenize(text), returns
    * an array of (term, tf) structs — one entry per DISTINCT token, tf =
    * its occurrence count. Hash-map counting, O(tokens) per row; replaces
    * the `transform(array_distinct(toks), x -> size(filter(toks, y -> y
    * = x)))` formulation, which is both interpreter-bound
    * (CodegenFallback higher-order functions) and O(distinct × tokens) —
    * the same per-row-compute lesson as [[gramCoversU]]. Emission order
    * is first-occurrence order; callers that need determinism sort
    * downstream (the TF-IDF gate orders by score and term). */
  def termFreqsU(s: UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = tokenize(s.toString)
    val counts = new java.util.LinkedHashMap[String, java.lang.Long]()
    var i = 0
    while (i < toks.length) {
      val prev = counts.get(toks(i))
      counts.put(toks(i), if (prev == null) 1L else prev.longValue + 1L)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
