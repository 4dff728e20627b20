package graft.gen

import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import graft.core.Page

/** Deterministic synthesizer of Common-Crawl-style pages (the input
  * table pinned by BASELINE.json input_hint; no external data).
  *
  * Every row is a pure function of (seed, index) via splitmix64, so
  * generation is order-independent and distributes over Spark
  * partitions with zero coordination — the property that lets the same
  * generator produce sf-small unit fixtures and multi-GB bench tables.
  *
  * Payload mix mirrors FIXTURES.md §1: ~85% HTML (templated docs with
  * boilerplate nav/header/footer, noise, entities, unclosed tags),
  * ~10% PDF (our closed grammar: xref, page tree, BT/ET text ops,
  * plain or Flate streams, 1–5 pages — exercising the page-slice +
  * ordered-stitch semantics of /root/reference/ocrworker/ocr.py:36-48
  * and /root/reference/ocrworker/utils.py:30-48), ~5% junk bytes
  * (quarantine, mirroring /root/reference/ocrworker/tasks.py:52-55).
  *
  * Host distribution is zipfian over 1000 hosts (a few hosts own ~30%
  * of rows) so the salted-repartition path is measurably exercised.
  */
object PageGen {

  final case class GenPage(page: Page, intended: String, kind: String)

  val DefaultSeed = 42L
  val NumHosts = 1000

  // ---- splitmix64 ----------------------------------------------------
  final class Rng(var state: Long) {
    def nextLong(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def nextInt(bound: Int): Int = {
      val r = nextLong() >>> 1
      (r % bound).toInt
    }
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
  }

  // ---- zipfian hosts --------------------------------------------------
  // cumulative over 1/rank^1.1, computed once (deterministic)
  private lazy val hostCdf: Array[Double] = {
    val w = Array.tabulate(NumHosts)(r => 1.0 / math.pow(r + 1, 1.1))
    val total = w.sum
    val cdf = new Array[Double](NumHosts)
    var acc = 0.0
    var i = 0
    while (i < NumHosts) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf
  }

  private def pickHost(rng: Rng): String = {
    val u = rng.nextDouble()
    var lo = 0; var hi = NumHosts - 1
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (hostCdf(mid) < u) lo = mid + 1 else hi = mid
    }
    f"site-$lo%04d.example.org"
  }

  // ---- word banks (include common stopwords so lang-id heuristics work)
  private val banks: Map[String, Array[String]] = Map(
    "eng" -> ("the of and to in a is that for it with as on was at by this have from or one had not but what all were when we there can an your which their said if" +
      " system data value record table index stream batch engine worker page document text block content extract filter join merge sort order group count hash").split(' '),
    "deu" -> ("der die das und zu den von mit sich des auf ist im dem nicht ein eine als auch es an werden aus er hat dass sie nach wird bei einer um am sind noch" +
      " system daten wert tabelle seite dokument text block inhalt gruppe anzahl rechner arbeit nummer zeile spalte menge teil stelle folge reihe").split(' '),
    "fra" -> ("le de un être et à il avoir ne je son que se qui dans en du elle au ce pas pour sur avec ils bien cette des les par mais ou si leur y tout plus" +
      " système donnée valeur table page document texte bloc contenu groupe nombre ligne colonne partie suite ordre compte fusion tri filtre").split(' '),
    "spa" -> ("el la de que y a en un ser se no haber por con su para como estar tener le lo todo pero más hacer o poder decir este ir otro ese si me ya ver" +
      " sistema dato valor tabla página documento texto bloque contenido grupo número línea columna parte orden cuenta unión filtro").split(' ')
  )
  private val langs = Array("eng", "deu", "fra", "spa")

  private def sentence(rng: Rng, bank: Array[String], minW: Int, maxW: Int): String = {
    val nw = minW + rng.nextInt(maxW - minW + 1)
    val sb = new java.lang.StringBuilder(nw * 7)
    var i = 0
    while (i < nw) {
      val w = bank(rng.nextInt(bank.length))
      if (i == 0) { sb.append(Character.toUpperCase(w.charAt(0))).append(w.substring(1)) }
      else { sb.append(' ').append(w) }
      i += 1
    }
    sb.append('.')
    sb.toString
  }

  private def paragraph(rng: Rng, bank: Array[String]): String = {
    val ns = 5 + rng.nextInt(3) // 5-7 sentences x 9-14 words => >40 words
    (0 until ns).map(_ => sentence(rng, bank, 9, 14)).mkString(" ")
  }

  private def shortPhrase(rng: Rng, bank: Array[String], n: Int): String =
    (0 until n).map { i =>
      val w = bank(rng.nextInt(bank.length))
      if (i == 0) Character.toUpperCase(w.charAt(0)) + w.substring(1) else w
    }.mkString(" ")

  /** HTML entities we may inject: (html form, decoded form). */
  private val entityPairs = Array(
    ("&amp;", "&"), ("&mdash;", "—"), ("&hellip;", "…"), ("&copy;", "©"), ("&#8212;", "—"))

  // ---- HTML payload ---------------------------------------------------
  /** Returns (htmlBytes, intendedExtractedText). The intended text is
    * what the density classifier should recover: headings + content
    * paragraphs + long list items joined with '\n'. */
  def genHtml(rng: Rng, lang: String, host: String): (Array[Byte], String) = {
    val bank = banks(lang)
    val title = shortPhrase(rng, bank, 4 + rng.nextInt(3))
    val site = host.split('.').head
    val sb = new java.lang.StringBuilder(4096)
    val intended = new java.lang.StringBuilder(2048)

    def navLinks(n: Int, tag: String): String = {
      val items = (0 until n).map { _ =>
        s"""<li><a href="/${bank(rng.nextInt(bank.length))}">${shortPhrase(rng, bank, 1 + rng.nextInt(2))}</a></li>"""
      }.mkString
      s"<$tag><ul>$items</ul></$tag>"
    }

    sb.append("<!DOCTYPE html>\n<html lang=\"").append(lang).append("\">\n<head>\n")
    sb.append("<meta charset=\"utf-8\">\n<title>").append(title).append("</title>\n")
    sb.append("<style>body{margin:0;font:14px/1.4 sans-serif}.x>a{color:#07c}</style>\n")
    sb.append("<script>var q = 1 < 2 && \"</div>\"; function f(a,b){return a>b?a:b;}</script>\n")
    sb.append("</head>\n<body>\n")
    sb.append(navLinks(6 + rng.nextInt(5), "nav")).append('\n')
    sb.append("<header><h1>").append(site).append("</h1><p><a href=\"/login\">Login</a> <a href=\"/join\">Register</a></p></header>\n")
    sb.append("<!-- layout: generated ").append(rng.nextInt(1000)).append(" -->\n")
    sb.append("<main>\n<article>\n")

    val nSections = 1 + rng.nextInt(4)
    var s = 0
    while (s < nSections) {
      // heading (promoted by the classifier because content follows)
      val h = shortPhrase(rng, bank, 3 + rng.nextInt(3))
      sb.append("<h2>").append(h).append("</h2>\n")
      if (intended.length() > 0) intended.append('\n')
      intended.append(h)
      val nP = 1 + rng.nextInt(3)
      var p = 0
      while (p < nP) {
        var para = paragraph(rng, bank)
        // inject an entity in ~50% of paragraphs
        if (rng.nextInt(2) == 0) {
          val (ent, dec) = entityPairs(rng.nextInt(entityPairs.length))
          val words = para.split(' ')
          val pos = 1 + rng.nextInt(words.length - 1)
          val htmlPara = (words.take(pos) :+ ent).++(words.drop(pos)).mkString(" ")
          val decPara = (words.take(pos) :+ dec).++(words.drop(pos)).mkString(" ")
          val unclosed = rng.nextInt(5) == 0
          sb.append("<p>").append(htmlPara).append(if (unclosed) "\n" else "</p>\n")
          intended.append('\n').append(decPara)
        } else {
          val unclosed = rng.nextInt(5) == 0
          sb.append("<p>").append(para).append(if (unclosed) "\n" else "</p>\n")
          intended.append('\n').append(para)
        }
        p += 1
      }
      // occasional list of long items (neighbor rule keeps them)
      if (rng.nextInt(3) == 0) {
        sb.append("<ul>\n")
        val nI = 2 + rng.nextInt(3)
        var it = 0
        while (it < nI) {
          val item = sentence(rng, bank, 18, 24)
          sb.append("<li>").append(item).append("</li>\n")
          intended.append('\n').append(item)
          it += 1
        }
        sb.append("</ul>\n")
      }
      s += 1
    }
    sb.append("</article>\n</main>\n")
    sb.append("<aside><h3>Related</h3><ul>")
    var a = 0
    val nA = 4 + rng.nextInt(4)
    while (a < nA) {
      sb.append(s"""<li><a href="/${bank(rng.nextInt(bank.length))}">${shortPhrase(rng, bank, 2 + rng.nextInt(3))}</a></li>""")
      a += 1
    }
    sb.append("</ul></aside>\n")
    sb.append("<footer><p>&copy; 2026 ").append(site)
      .append(" — <a href=\"/privacy\">Privacy</a> <a href=\"/terms\">Terms</a></p></footer>\n")
    sb.append("</body>\n</html>\n")
    (sb.toString.getBytes(StandardCharsets.UTF_8), intended.toString)
  }

  // ---- PDF payload ----------------------------------------------------
  /** Minimal well-formed PDF within the parser's closed grammar.
    * Returns (pdfBytes, intendedStitchedText). */
  def genPdf(rng: Rng, compress: Boolean): (Array[Byte], String) = {
    val bank = banks("eng") // PDF branch is latin-1; keep ASCII
    val nPages = 1 + rng.nextInt(5)
    val pageTexts = (0 until nPages).map { _ =>
      val nLines = 3 + rng.nextInt(6)
      (0 until nLines).map(_ => sentence(rng, bank, 6, 12)).mkString("\n")
    }
    val intended = pageTexts.mkString("\n")

    def esc(s: String) = s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    val contentStreams: Seq[Array[Byte]] = pageTexts.map { pt =>
      val sb = new java.lang.StringBuilder(512)
      sb.append("BT\n/F1 12 Tf\n72 720 Td\n")
      val lines = pt.split('\n')
      var i = 0
      while (i < lines.length) {
        if (i > 0) sb.append("0 -14 Td\n")
        // alternate Tj and TJ forms to exercise both
        if (i % 2 == 0) sb.append('(').append(esc(lines(i))).append(") Tj\n")
        else sb.append("[(").append(esc(lines(i))).append(")] TJ\n")
        i += 1
      }
      sb.append("ET\n")
      val raw = sb.toString.getBytes(StandardCharsets.ISO_8859_1)
      if (compress) deflate(raw) else raw
    }

    // object numbering: 1=catalog, 2=pages, 3..=page objs, then contents
    val out = new java.io.ByteArrayOutputStream(4096)
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    val pageObjNums = (0 until nPages).map(i => 3 + i)
    val contentObjNums = (0 until nPages).map(i => 3 + nPages + i)
    def obj(num: Int)(body: => Unit): Unit = {
      offsets += out.size()
      w(s"$num 0 obj\n"); body; w("endobj\n")
    }
    obj(1) { w("<< /Type /Catalog /Pages 2 0 R >>\n") }
    obj(2) { w(s"<< /Type /Pages /Kids [${pageObjNums.map(n => s"$n 0 R").mkString(" ")}] /Count $nPages >>\n") }
    (0 until nPages).foreach { i =>
      obj(pageObjNums(i)) {
        w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents ${contentObjNums(i)} 0 R /Resources << /Font << /F1 << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> >> >> >>\n")
      }
    }
    (0 until nPages).foreach { i =>
      val data = contentStreams(i)
      obj(contentObjNums(i)) {
        val filter = if (compress) " /Filter /FlateDecode" else ""
        w(s"<< /Length ${data.length}$filter >>\nstream\n")
        out.write(data)
        w("\nendstream\n")
      }
    }
    val xrefPos = out.size()
    val nObjs = 2 + 2 * nPages
    w(s"xref\n0 ${nObjs + 1}\n0000000000 65535 f \n")
    offsets.foreach(off => w(f"$off%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${nObjs + 1} /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    (out.toByteArray, intended)
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length)
    val buf = new Array[Byte](8192)
    while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
    d.end()
    out.toByteArray
  }

  // ---- row assembly ---------------------------------------------------
  private val baseTsMillis = 1735689600000L // 2025-01-01T00:00:00Z
  private val windowMillis = 30L * 24 * 3600 * 1000

  /** One deterministic row. */
  def genRow(seed: Long, idx: Long): GenPage = {
    val rng = new Rng(seed ^ (idx * 0x9e3779b97f4a7c15L) ^ 0x51ab5f1c3e7d9b21L)
    val host = pickHost(rng)
    val lang = langs(rng.nextInt(langs.length))
    val url = s"https://$host/page/$idx"
    val ts = new Timestamp(baseTsMillis + ((idx * 104729L) % windowMillis))
    val roll = rng.nextInt(100)
    val (bytes, intended, kind) =
      if (roll < 85) { val (b, t) = genHtml(rng, lang, host); (b, t, "html") }
      else if (roll < 95) { val (b, t) = genPdf(rng, rng.nextInt(2) == 0); (b, t, "pdf") }
      else {
        val n = 50 + rng.nextInt(150)
        val junk = new Array[Byte](n)
        var i = 0
        while (i < n) { junk(i) = (rng.nextInt(200) + 33).toByte; i += 1 }
        junk(0) = 0x7f.toByte // never sniffs as html/pdf
        (junk, "", "junk")
      }
    // degraded raw-text field, as found in CC-style crawls (NOT golden)
    val raw = intended.take(200).replace('\n', ' ')
    GenPage(Page(url, ts, bytes, raw, lang), intended, kind)
  }

  /** Rows for a driver sf dir: sf0.001→1k, sf0.01→10k, sf0.1→100k. */
  def rowsForDir(sfDir: String): Int = {
    val m = java.util.regex.Pattern.compile("sf([0-9.]+)").matcher(sfDir)
    val sf = if (m.find()) m.group(1).toDouble else 0.001
    math.max(200, (sf * 1000000).toInt)
  }
}
