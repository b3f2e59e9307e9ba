package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Text-encoding repair for web-scale corpora: the mojibake fix +
  * Unicode NFC normalization every large crawl pipeline runs before any
  * text signal (language ID, dedup shingles, tokenization all disagree
  * across encoding variants of the SAME text).
  *
  * Mojibake here is the classic double-decode: UTF-8 bytes read as
  * Latin-1 ("café" → "cafÃ©"). The repair narrows the chars back to
  * bytes and re-decodes as STRICT UTF-8 — accepting only when every
  * sequence is well-formed (no overlongs, no surrogates, no truncation)
  * AND at least one multibyte sequence exists. Genuine Latin-1 text
  * almost never passes (an é followed by a space is an invalid
  * continuation), which is what makes the blind heuristic safe to run
  * corpus-wide; pure ASCII never matches (no multibyte), so the hot path
  * is a single validation scan.
  */
object TextFix {

  /** Strict UTF-8 re-decode of the string's chars narrowed to bytes;
    * null when the string is not Latin-1-narrowable, any sequence is
    * ill-formed, or no multibyte sequence exists (not mojibake). */
  private def repair(s: String): String = {
    val n = s.length
    val bytes = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c > 0xFF) return null
      bytes(i) = c.toByte
      i += 1
    }
    val sb = new java.lang.StringBuilder(n)
    var multi = false
    i = 0
    while (i < n) {
      val b = bytes(i) & 0xFF
      if (b < 0x80) { sb.append(b.toChar); i += 1 }
      else if (b >= 0xC2 && b <= 0xDF) {
        if (i + 1 >= n) return null
        val b1 = bytes(i + 1) & 0xFF
        if (b1 < 0x80 || b1 > 0xBF) return null
        sb.append((((b & 0x1F) << 6) | (b1 & 0x3F)).toChar)
        multi = true; i += 2
      } else if (b >= 0xE0 && b <= 0xEF) {
        if (i + 2 >= n) return null
        val b1 = bytes(i + 1) & 0xFF; val b2 = bytes(i + 2) & 0xFF
        if (b1 < 0x80 || b1 > 0xBF || b2 < 0x80 || b2 > 0xBF) return null
        val cp = ((b & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
        if (cp < 0x800) return null // overlong
        if (cp >= 0xD800 && cp <= 0xDFFF) return null // surrogate range
        sb.append(cp.toChar)
        multi = true; i += 3
      } else if (b >= 0xF0 && b <= 0xF4) {
        if (i + 3 >= n) return null
        val b1 = bytes(i + 1) & 0xFF; val b2 = bytes(i + 2) & 0xFF
        val b3 = bytes(i + 3) & 0xFF
        if (b1 < 0x80 || b1 > 0xBF || b2 < 0x80 || b2 > 0xBF ||
          b3 < 0x80 || b3 > 0xBF) return null
        val cp = ((b & 0x07) << 18) | ((b1 & 0x3F) << 12) |
          ((b2 & 0x3F) << 6) | (b3 & 0x3F)
        if (cp < 0x10000 || cp > 0x10FFFF) return null // overlong / beyond
        sb.appendCodePoint(cp)
        multi = true; i += 4
      } else return null // 0x80-0xC1 stray continuation / 0xF5-0xFF
    }
    if (!multi) return null
    sb.toString
  }

  /** fix_text kernel: (repaired-or-original text, NFC-normalized;
    * was_mojibake). NFC runs on the FINAL text either way — canonical
    * composition is what downstream equality/shingling needs, and
    * DuckDB's nfc_normalize reproduces it for the value oracle. */
  def fixTextU(u: UTF8String): GenericInternalRow = {
    val s = u.toString
    val rep = repair(s)
    val fixed = java.text.Normalizer.normalize(
      if (rep != null) rep else s, java.text.Normalizer.Form.NFC)
    new GenericInternalRow(
      Array[Any](UTF8String.fromString(fixed), rep != null))
  }
}
