package graft.sources

/** Sitemap ingestion + crawl-coverage audit: the discovery-side rung of
  * the crawl front-end, sibling to [[Robots]] (whose generated
  * robots.txt already advertises `Sitemap: https://<host>/sitemap.xml`).
  * The reference worker consumes a pre-curated queue
  * (/root/reference/ocrworker/tasks.py); any Common-Crawl-style
  * ingestion in front of this engine must reconcile what a site SAYS it
  * has (its sitemap) against what the crawl actually fetched — the gap
  * feeds the frontier, the orphans feed link-graph analysis.
  *
  * Parser semantics (sitemaps.org protocol): a `<urlset>` of `<url>`
  * blocks, each with a required `<loc>` and optional `<lastmod>`
  * (W3C date), `<changefreq>` (tolerated, ignored) and `<priority>`
  * (0.0–1.0, default 0.5). XML comments may appear anywhere between
  * tags; `<loc>` text is entity-escaped (`&amp;` etc) and surrounded by
  * arbitrary whitespace; unknown / namespace-prefixed tags inside a
  * `<url>` block (e.g. `<image:loc>`) are ignored. The parser is a
  * single-pass scanner — no DOM, no regex backtracking — so it runs
  * map-side over a broadcast-sized host table at any corpus scale.
  *
  * The per-host sitemap TEXT used by q94 is a pure function of
  * md5(host) ([[sitemapXml]]), dumped beside the query so the DuckDB
  * oracle re-parses the same bytes relationally (regexp over the dump)
  * — the Scala parser under test never leaks into the oracle, exactly
  * the q48 WARC-roundtrip discipline. */
object Sitemaps {

  /** Bump when generated sitemap bytes or parse semantics change
    * (invalidates the q94 dump cache). */
  val Version = 1

  /** One parsed entry. `priorityMicros` carries the 0.0–1.0 priority in
    * integer micros (bit-exact across engines; 500000 = the protocol
    * default when the tag is absent); `lastmod` is the raw W3C date
    * string, "" when absent. */
  final case class Entry(loc: String, lastmod: String, priorityMicros: Long)

  private def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&") // &amp; LAST (no double-decode)

  /** Parse a sitemap document into its entries. Tolerates comments,
    * whitespace, unknown tags, and namespace-prefixed decoys; a `<url>`
    * block without a `<loc>` yields no entry (protocol: loc required). */
  def parse(xml: String): Seq[Entry] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
    var i = 0
    val n = xml.length
    // scan text content of the next `<tag>`..`</tag>` from `from`,
    // bounded by `limit`; returns (text, -1) when the tag is absent
    def tagText(tag: String, from: Int, limit: Int): String = {
      val open = "<" + tag + ">"
      val p = xml.indexOf(open, from)
      if (p < 0 || p >= limit) return null
      // reject a namespace-prefixed decoy like <image:loc>: the char
      // before '<tag>' being ':' can't happen (indexOf matched '<'),
      // so a literal match here IS the bare tag
      val close = xml.indexOf("</" + tag + ">", p)
      if (close < 0 || close >= limit) return null
      xml.substring(p + open.length, close).trim
    }
    while (i < n) {
      val u = xml.indexOf("<url>", i)
      if (u < 0) { i = n }
      else {
        val end = xml.indexOf("</url>", u)
        val limit = if (end < 0) n else end
        val loc = tagText("loc", u, limit)
        if (loc != null && loc.nonEmpty) {
          val lastmod = Option(tagText("lastmod", u, limit)).getOrElse("")
          // r5 ADVICE #2: a malformed <priority> ('high', '0.5.1')
          // falls back to the protocol default instead of throwing
          // NumberFormatException out of the tolerant parser
          val prio = Option(tagText("priority", u, limit)) match {
            case Some(p) if p.nonEmpty =>
              p.toDoubleOption.map(d => math.round(d * 1e6)).getOrElse(500000L)
            case _ => 500000L
          }
          out += Entry(unescape(loc), lastmod, prio)
        }
        i = limit + 1
      }
    }
    out.toSeq
  }

  /** md5 hex digit `k` (0-based) of a string, 0–15 — the same closed
    * form DuckDB reaches with CAST(('0x' || substr(md5(s),k+1,1)) AS
    * INT), so generation parameters stay oracle-derivable. */
  def md5Digit(s: String, k: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val b = d(k / 2) & 0xff
    if (k % 2 == 0) b >> 4 else b & 0xf
  }

  /** Deterministic sitemap.xml per host: `12 + d3` page entries over
    * the arithmetic index set {a + k·s} (a = d1 % 8, s = 1 + d2 % 4 —
    * some of which the crawl fetched, some not), plus `1 + d4 % 3`
    * promo entries the crawl NEVER fetched (pure frontier gap), where
    * d<i> = md5(host) hex digit i. Every document plants the parser
    * hazards: comments, a namespace decoy tag, an entity-escaped loc,
    * whitespace-padded loc text, an entry with no lastmod/priority. */
  def sitemapXml(host: String): String = {
    val a = md5Digit(host, 0) % 8
    val s = 1 + md5Digit(host, 1) % 4
    val nPage = 12 + md5Digit(host, 2)
    val nPromo = 1 + md5Digit(host, 3) % 3
    val sb = new StringBuilder(2048)
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<!-- generated for ").append(host).append(" -->\n")
    sb.append("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
    var k = 0
    while (k < nPage) {
      val idx = a + k.toLong * s
      sb.append("  <url>\n")
      if (k % 3 == 0) sb.append("    <!-- entry ").append(k).append(" -->\n")
      // whitespace-padded loc text on every 2nd entry
      if (k % 2 == 0) sb.append("    <loc>https://").append(host).append("/page/").append(idx).append("</loc>\n")
      else sb.append("    <loc>\n      https://").append(host).append("/page/").append(idx).append("\n    </loc>\n")
      // lastmod: 2025-01-01 + (idx*7 mod 365) days, W3C date form;
      // absent on every 5th entry (parser must tolerate)
      if (k % 5 != 0) {
        val day = java.time.LocalDate.of(2025, 1, 1).plusDays((idx * 7) % 365)
        sb.append("    <lastmod>").append(day).append("</lastmod>\n")
      }
      // namespace decoy the parser must NOT read as loc
      if (k % 4 == 0) sb.append("    <image:loc>https://cdn.example.net/img/").append(idx).append(".png</image:loc>\n")
      sb.append("    <changefreq>").append(Seq("daily", "weekly", "monthly")(k % 3)).append("</changefreq>\n")
      // priority: 0.1 * (1 + k%9); absent on every 7th entry (default 0.5)
      if (k % 7 != 0) sb.append("    <priority>0.").append(1 + k % 9).append("</priority>\n")
      sb.append("  </url>\n")
      k += 1
    }
    var j = 0
    while (j < nPromo) {
      sb.append("  <url><loc>https://").append(host).append("/promo/").append(j)
        .append("?src=map&amp;v=2</loc></url>\n")
      j += 1
    }
    sb.append("</urlset>\n")
    sb.toString
  }
}
