package graft.html

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

/** Charset sniffing for crawl payloads — the encoding-detection rung a
  * Common-Crawl-style extraction front-end needs before any tokenizer
  * touches the bytes (the reference worker receives pre-decoded text
  * from its queue, `ocrworker/tasks.py`; a web-scale batch engine gets
  * raw octets and must sniff).
  *
  * The algorithm is the WHATWG encoding-sniffing ladder, simplified to
  * the rungs that are decidable from bytes alone (no transport layer in
  * a WARC-shaped table):
  *
  *   1. byte-order mark — UTF-8 / UTF-16LE / UTF-16BE;
  *   2. meta prescan over the first [[PrescanWindow]] bytes — the first
  *      `charset=` declaration, ASCII-case-insensitive, quoted or bare
  *      (covers both `<meta charset=…>` and the legacy
  *      `http-equiv="Content-Type"` form);
  *   3. strict whole-payload UTF-8 validation (overlongs, surrogates,
  *      out-of-range and truncated sequences all rejected);
  *   4. windows-1252 fallback — the WHATWG default for unlabeled,
  *      non-UTF-8 content.
  *
  * Scale shape: sniff + decode are pure per-row byte scans — map-side,
  * no state, no shuffle; the payload column never leaves the scan task.
  */
object CharsetSniff {

  /** Bump to invalidate dumps derived from this kernel. */
  val Version = 1

  /** Prescan window per the HTML spec's encoding sniffer (1024 bytes). */
  val PrescanWindow = 1024

  /** Sniff outcome: the decided charset token, the BOM length to strip
    * before decoding, and the raw normalized declaration found by the
    * prescan (null when the BOM decided first or nothing declared). */
  final case class Sniff(charset: String, bomLen: Int, decl: String)

  /** Declared-name → canonical token for the labels this engine decodes.
    * An unrecognized label falls through to UTF-8 validation (rung 3)
    * with the declaration still recorded for audit. */
  private val Known: Map[String, String] = Map(
    "utf-8" -> "utf-8", "utf8" -> "utf-8",
    "windows-1252" -> "windows-1252", "cp1252" -> "windows-1252",
    "x-cp1252" -> "windows-1252",
    "iso-8859-1" -> "iso-8859-1", "latin1" -> "iso-8859-1",
    "l1" -> "iso-8859-1", "iso8859-1" -> "iso-8859-1",
    "utf-16le" -> "utf-16le", "utf-16be" -> "utf-16be")

  def sniff(bytes: Array[Byte]): Sniff = {
    val n = bytes.length
    if (n >= 3 && bytes(0) == 0xEF.toByte && bytes(1) == 0xBB.toByte &&
      bytes(2) == 0xBF.toByte) Sniff("utf-8-bom", 3, null)
    else if (n >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      Sniff("utf-16le", 2, null)
    else if (n >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      Sniff("utf-16be", 2, null)
    else {
      val decl = prescan(bytes)
      val canon = if (decl == null) null else Known.getOrElse(decl, null)
      if (canon != null) Sniff(canon, 0, decl)
      else if (validUtf8(bytes)) Sniff("utf-8", 0, decl)
      else Sniff("windows-1252", 0, decl)
    }
  }

  /** First `charset=` declaration in the prescan window, lowercased and
    * trimmed; null when absent. Values may be double-quoted,
    * single-quoted, or bare (bare ends at whitespace, `;`, `>` or a
    * quote — the terminator set that covers both meta forms). */
  def prescan(bytes: Array[Byte]): String = {
    val end = math.min(bytes.length, PrescanWindow)
    val key = "charset"
    var i = 0
    while (i < end - key.length) {
      var k = 0
      while (k < key.length &&
        lower(bytes(i + k)) == key.charAt(k)) k += 1
      if (k == key.length) {
        var j = i + key.length
        while (j < end && isSpace(bytes(j))) j += 1
        if (j < end && bytes(j) == '=') {
          j += 1
          while (j < end && isSpace(bytes(j))) j += 1
          if (j < end) {
            val q = bytes(j)
            val sb = new java.lang.StringBuilder(16)
            if (q == '"' || q == '\'') {
              j += 1
              while (j < end && bytes(j) != q) { sb.append(lower(bytes(j))); j += 1 }
              if (j < end) return sb.toString.trim // unclosed quote: no decl
            } else {
              while (j < end && !isSpace(bytes(j)) && bytes(j) != ';' &&
                bytes(j) != '>' && bytes(j) != '"' && bytes(j) != '\'') {
                sb.append(lower(bytes(j))); j += 1
              }
              if (sb.length > 0) return sb.toString
            }
          }
        }
        // `charset` without a usable `=value`: keep scanning
      }
      i += 1
    }
    null
  }

  private def lower(b: Byte): Char = {
    val c = (b & 0xFF).toChar
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'

  /** Strict UTF-8 validation: rejects overlong encodings, surrogate
    * code points (ED A0..BF), values above U+10FFFF and truncated
    * sequences — the checks a lenient decoder would silently repair. */
  def validUtf8(bytes: Array[Byte]): Boolean = {
    val n = bytes.length
    var i = 0
    while (i < n) {
      val b0 = bytes(i) & 0xFF
      if (b0 < 0x80) i += 1
      else if (b0 < 0xC2) return false // continuation byte or overlong lead
      else if (b0 < 0xE0) { // 2-byte
        if (i + 1 >= n || (bytes(i + 1) & 0xC0) != 0x80) return false
        i += 2
      } else if (b0 < 0xF0) { // 3-byte
        if (i + 2 >= n) return false
        val b1 = bytes(i + 1) & 0xFF
        val lo = if (b0 == 0xE0) 0xA0 else 0x80 // E0: reject overlong
        val hi = if (b0 == 0xED) 0x9F else 0xBF // ED: reject surrogates
        if (b1 < lo || b1 > hi || (bytes(i + 2) & 0xC0) != 0x80) return false
        i += 3
      } else if (b0 < 0xF5) { // 4-byte
        if (i + 3 >= n) return false
        val b1 = bytes(i + 1) & 0xFF
        val lo = if (b0 == 0xF0) 0x90 else 0x80 // F0: reject overlong
        val hi = if (b0 == 0xF4) 0x8F else 0xBF // F4: cap at U+10FFFF
        if (b1 < lo || b1 > hi || (bytes(i + 1) & 0xC0) != 0x80 ||
          (bytes(i + 2) & 0xC0) != 0x80 || (bytes(i + 3) & 0xC0) != 0x80)
          return false
        i += 4
      } else return false // F5..FF: beyond U+10FFFF
    }
    true
  }

  private def javaCharset(token: String): Charset = token match {
    case "utf-8" | "utf-8-bom" => StandardCharsets.UTF_8
    case "utf-16le" => StandardCharsets.UTF_16LE
    case "utf-16be" => StandardCharsets.UTF_16BE
    case "windows-1252" => Charset.forName("windows-1252")
    case "iso-8859-1" => StandardCharsets.ISO_8859_1
    case _ => StandardCharsets.UTF_8
  }

  /** Decode `bytes` per a sniff verdict: strips the BOM, never throws
    * (malformed input and unmappables decode to U+FFFD — a crawl row
    * must produce A string, not an executor exception). */
  def decode(bytes: Array[Byte], s: Sniff): String = {
    val dec = javaCharset(s.charset).newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes, s.bomLen,
      bytes.length - s.bomLen)).toString
  }

  // ---- deterministic variant synthesis (test/bench corpus only) ------

  /** The injected declarations for the transcoded variants (windows-1252
    * throughout: the generated corpus carries em-dash/ellipsis literals,
    * which 1252 encodes and ISO-8859-1 cannot). Splice point is directly
    * after the first `<head>`, which both Spark SQL `replace` and the
    * DuckDB oracle mirror exactly. */
  val MetaV4 = "<meta charset=\"windows-1252\">"
  val MetaV5 =
    "<meta http-equiv=\"Content-Type\" content=\"text/html; charset=windows-1252\">"

  /** The string a variant actually encodes: the page's UTF-8 decode,
    * with the variant's declaration spliced in for the transcoded arms. */
  def variantSource(utf8Html: Array[Byte], variant: Int): String = {
    val txt = new String(utf8Html, StandardCharsets.UTF_8)
    variant match {
      case 4 => splice(txt, MetaV4)
      case 5 => splice(txt, MetaV5)
      case _ => txt
    }
  }

  private def splice(txt: String, meta: String): String = {
    val at = txt.indexOf("<head>")
    if (at < 0) meta + txt
    else txt.substring(0, at + 6) + meta + txt.substring(at + 6)
  }

  /** Deterministic re-encoding of a UTF-8 html payload into charset
    * variant `variant` (page-index mod 6): 0 as-is, 1 +UTF-8 BOM,
    * 2 UTF-16LE+BOM, 3 UTF-16BE+BOM, 4/5 windows-1252 with the two
    * declaration styles. Unmappable characters encode as '?'
    * deterministically — the roundtrip gate then reads false on BOTH
    * verification paths rather than diverging. */
  def encodeVariant(utf8Html: Array[Byte], variant: Int): Array[Byte] = {
    variant match {
      case 0 => utf8Html
      case 1 =>
        val out = new Array[Byte](utf8Html.length + 3)
        out(0) = 0xEF.toByte; out(1) = 0xBB.toByte; out(2) = 0xBF.toByte
        System.arraycopy(utf8Html, 0, out, 3, utf8Html.length)
        out
      case 2 => bom(0xFF, 0xFE) ++
        variantSource(utf8Html, 2).getBytes(StandardCharsets.UTF_16LE)
      case 3 => bom(0xFE, 0xFF) ++
        variantSource(utf8Html, 3).getBytes(StandardCharsets.UTF_16BE)
      case _ =>
        val enc = Charset.forName("windows-1252").newEncoder()
          .onMalformedInput(CodingErrorAction.REPLACE)
          .onUnmappableCharacter(CodingErrorAction.REPLACE)
        val bb = enc.encode(java.nio.CharBuffer.wrap(variantSource(utf8Html, variant)))
        val out = new Array[Byte](bb.remaining())
        bb.get(out)
        out
    }
  }

  private def bom(a: Int, b: Int): Array[Byte] = Array(a.toByte, b.toByte)
}
