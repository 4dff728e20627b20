package graft.pdf

import java.nio.charset.StandardCharsets
import java.util.zip.Inflater
import scala.collection.mutable.ArrayBuffer

/** Minimal from-scratch PDF text extractor.
  *
  * Plays the role of the reference's per-page OCR + ordered stitch
  * (/root/reference/ocrworker/ocr.py:36-67 slices one page,
  * /root/reference/ocrworker/utils.py:30-48 stitches pages back in
  * order). Here the "OCR" is real text extraction from content streams,
  * and the stitch is the ordered join of per-page texts.
  *
  * Supported subset (closed — our generator emits it; anything else is
  * rejected into quarantine, mirroring the mimetype gate at
  * /root/reference/ocrworker/tasks.py:52-55):
  *  - classic xref-table PDFs with `N 0 obj ... endobj` bodies
  *  - /Type /Pages tree with a /Kids array (page order = Kids order,
  *    like the reference's target_page_ids order)
  *  - /Contents as a single ref or array of refs
  *  - content streams: plain or /FlateDecode
  *  - text operators: BT/ET, Tj, TJ, ', ", Td, TD, T*, Tm (others ignored)
  *  - literal strings with escapes + octal, hex strings
  *
  * Never throws: returns Left(reason) on anything outside the subset.
  */
object PdfParser {

  final case class PdfResult(pageTexts: Array[String]) {
    /** Ordered stitch — the A1/A2 aggregation contract: pages joined
      * with a single '\n' in page order. */
    def stitched: String = pageTexts.mkString("\n")
  }

  def extract(bytes: Array[Byte]): Either[String, PdfResult] = {
    try {
      if (bytes.length < 8 || !startsWith(bytes, "%PDF-")) return Left("pdf_bad_header")
      // latin-1 view: 1 byte == 1 char, preserves binary offsets
      val s = new String(bytes, StandardCharsets.ISO_8859_1)
      val objs = scanObjects(s, bytes)
      if (objs.isEmpty) return Left("pdf_no_objects")
      val pagesObj = objs.values.find(o => o.dict.contains("/Type") && dictHasName(o.dict, "/Type", "Pages"))
      val kids: Seq[Int] = pagesObj match {
        case Some(o) => parseRefArray(o.dict, "/Kids")
        case None => return Left("pdf_no_page_tree")
      }
      if (kids.isEmpty) return Left("pdf_empty_kids")
      val texts = kids.map { k =>
        objs.get(k) match {
          case Some(page) =>
            val contentRefs = parseRefOrArray(page.dict, "/Contents")
            val sb = new java.lang.StringBuilder(256)
            contentRefs.foreach { cr =>
              objs.get(cr).foreach { cobj =>
                val text = ContentStreamText.extract(decodeStream(cobj))
                // separator keyed on extracted TEXT, not raw stream bytes:
                // a graphics-only trailing stream must not leave a
                // trailing newline ("pages never see trailing newlines")
                if (text.nonEmpty) {
                  if (sb.length() > 0) sb.append('\n')
                  sb.append(text)
                }
              }
            }
            sb.toString
          case None => ""
        }
      }
      Right(PdfResult(texts.toArray))
    } catch {
      case _: Throwable => Left("pdf_parse_error")
    }
  }

  private final case class PdfObj(num: Int, dict: String, stream: Array[Byte])

  private def startsWith(b: Array[Byte], p: String): Boolean = {
    if (b.length < p.length) return false
    var i = 0
    while (i < p.length) { if (b(i) != p.charAt(i).toByte) return false; i += 1 }
    true
  }

  /** Scan `N G obj ... endobj` bodies; capture the dict text and raw
    * stream bytes (between `stream\n` and `endstream`). */
  private def scanObjects(s: String, bytes: Array[Byte]): Map[Int, PdfObj] = {
    val out = Map.newBuilder[Int, PdfObj]
    val m = objRe.matcher(s)
    while (m.find()) {
      val num = m.group(1).toInt
      val bodyStart = m.end()
      val end = s.indexOf("endobj", bodyStart)
      val bodyEnd = if (end < 0) s.length else end
      val streamKw = s.indexOf("stream", bodyStart)
      if (streamKw >= 0 && streamKw < bodyEnd) {
        val dict = s.substring(bodyStart, streamKw)
        var dataStart = streamKw + "stream".length
        if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
        val endStream = s.indexOf("endstream", dataStart)
        val dataEnd = if (endStream < 0) bodyEnd else endStream
        // strip one trailing EOL before endstream
        var de = dataEnd
        if (de > dataStart && s.charAt(de - 1) == '\n') de -= 1
        if (de > dataStart && s.charAt(de - 1) == '\r') de -= 1
        out += num -> PdfObj(num, dict, java.util.Arrays.copyOfRange(bytes, dataStart, de))
      } else {
        out += num -> PdfObj(num, s.substring(bodyStart, bodyEnd), null)
      }
    }
    out.result()
  }

  private def dictHasName(dict: String, key: String, value: String): Boolean = {
    val i = dict.indexOf(key)
    if (i < 0) return false
    val rest = dict.substring(i + key.length).trim
    rest.startsWith("/" + value)
  }

  private def parseRefArray(dict: String, key: String): Seq[Int] = {
    val i = dict.indexOf(key)
    if (i < 0) return Nil
    val open = dict.indexOf('[', i)
    if (open < 0) return Nil
    val close = dict.indexOf(']', open)
    if (close < 0) return Nil
    parseRefs(dict.substring(open + 1, close))
  }

  private def parseRefOrArray(dict: String, key: String): Seq[Int] = {
    val i = dict.indexOf(key)
    if (i < 0) return Nil
    val rest = dict.substring(i + key.length).trim
    if (rest.startsWith("[")) parseRefArray(dict, key)
    else parseRefs(rest.takeWhile(c => c != '/' && c != '>'))
  }

  private val refRe = java.util.regex.Pattern.compile("""(\d+)\s+\d+\s+R""")
  private val objRe = java.util.regex.Pattern.compile("""(\d+)\s+\d+\s+obj""")
  private def parseRefs(s: String): Seq[Int] = {
    val out = new ArrayBuffer[Int](4)
    val m = refRe.matcher(s)
    while (m.find()) out += m.group(1).toInt
    out.toSeq
  }

  private def decodeStream(o: PdfObj): Array[Byte] = {
    if (o.stream == null) return Array.emptyByteArray
    if (o.dict.contains("/FlateDecode")) inflate(o.stream) else o.stream
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(buf)
      if (n > 0) out.write(buf, 0, n)
      else if (n == 0 && inf.needsDictionary()) return Array.emptyByteArray
    }
    inf.end()
    out.toByteArray
  }
}

/** Lexer/interpreter for the text operators of a PDF content stream.
  * Line contract (byte-identity relevant): Td, TD, T-star, apostrophe
  * and quote ops start a new line; Tj/TJ append to the current line;
  * TJ kerning numbers are ignored;
  * pages never see trailing newlines.
  */
object ContentStreamText {

  def extract(data: Array[Byte]): String = {
    val s = new String(data, StandardCharsets.ISO_8859_1)
    val n = s.length
    val out = new java.lang.StringBuilder(256)
    val line = new java.lang.StringBuilder(128)
    var i = 0
    var lastStr: String = null   // most recent string literal (operand)

    def newline(): Unit = {
      if (line.length() > 0) {
        if (out.length() > 0) out.append('\n')
        out.append(line)
        line.setLength(0)
      }
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '(') {
        val (str, next) = parseLiteralString(s, i)
        // consecutive string operands accumulate: this is how kerning-
        // split TJ arrays like [(Hel) 8 (lo)] TJ concatenate
        lastStr = if (lastStr == null) str else lastStr + str
        i = next
      } else if (c == '<' && i + 1 < n && s.charAt(i + 1) != '<') {
        val (str, next) = parseHexString(s, i)
        lastStr = if (lastStr == null) str else lastStr + str
        i = next
      } else if (c == '<') { i += 2 } // dict start '<<'
      else if (c == '%') { // comment to EOL
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (c == '/' || c == '[' || c == ']' || c == '>' ||
                 Character.isWhitespace(c)) {
        if (c == '/') { i += 1; while (i < n && !delim(s.charAt(i))) i += 1 }
        else i += 1
      } else if ((c >= '0' && c <= '9') || c == '-' || c == '+' || c == '.') {
        i += 1; while (i < n && !delim(s.charAt(i))) i += 1
      } else if (c == '\'') { // ' = T* then show
        newline(); if (lastStr != null) line.append(lastStr)
        lastStr = null; i += 1
      } else if (c == '"') { // " = aw ac string "  — same line semantics as '
        newline(); if (lastStr != null) line.append(lastStr)
        lastStr = null; i += 1
      } else {
        // operator token
        val start = i
        while (i < n && !delim(s.charAt(i))) i += 1
        s.substring(start, i) match {
          case "Tj" | "TJ" => if (lastStr != null) line.append(lastStr)
          case "Td" | "TD" | "T*" | "Tm" => newline()
          case "ET" => newline()
          case _ => // BT, Tf, graphics ops: ignore
        }
        // operands never survive past their operator (PDF stack rules)
        lastStr = null
      }
    }
    newline()
    out.toString
  }

  @inline private def delim(c: Char): Boolean =
    Character.isWhitespace(c) || c == '(' || c == ')' || c == '<' || c == '>' ||
      c == '[' || c == ']' || c == '/' || c == '%'

  /** Literal string with nesting + escapes; TJ arrays concatenate, so
    * within an array every string found before the TJ op is appended —
    * we emulate by appending consecutive strings directly. */
  private def parseLiteralString(s: String, start: Int): (String, Int) = {
    val n = s.length
    val sb = new java.lang.StringBuilder(64)
    var i = start + 1
    var depth = 1
    while (i < n && depth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < n) {
        val e = s.charAt(i + 1)
        e match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '\n' => i += 2 // line continuation
          case d if d >= '0' && d <= '7' =>
            var j = i + 1; var v = 0; var k = 0
            while (j < n && k < 3 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
              v = v * 8 + (s.charAt(j) - '0'); j += 1; k += 1
            }
            sb.append(v.toChar); i = j
          case other => sb.append(other); i += 2
        }
      } else if (c == '(') { depth += 1; sb.append(c); i += 1 }
      else if (c == ')') { depth -= 1; if (depth > 0) sb.append(c); i += 1 }
      else { sb.append(c); i += 1 }
    }
    (sb.toString, i)
  }

  private def parseHexString(s: String, start: Int): (String, Int) = {
    val n = s.length
    var i = start + 1
    val hex = new java.lang.StringBuilder(32)
    while (i < n && s.charAt(i) != '>') {
      val c = s.charAt(i)
      // forgiving: keep only hex digits (spec allows interspersed
      // whitespace; junk bytes must not abort extraction)
      if ((c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F'))
        hex.append(c)
      i += 1
    }
    if (hex.length() % 2 == 1) hex.append('0')
    val sb = new java.lang.StringBuilder(hex.length() / 2)
    var j = 0
    while (j + 2 <= hex.length()) {
      sb.append(Integer.parseInt(hex.substring(j, j + 2), 16).toChar)
      j += 2
    }
    (sb.toString, math.min(i + 1, n))
  }
}
