package graft.html

/** WAT-style head-metadata records — the per-page metadata sidecar a
  * Common-Crawl-shaped pipeline publishes next to text (WAT records
  * carry Title, the html lang attribute, and per-tag-family counts;
  * the reference worker's analog is the per-document metadata dict it
  * queues alongside OCR output, `ocrworker/tasks.py`). q98's map-side
  * kernel; the corpus-level value check is the q98 DuckDB oracle, which
  * re-derives every field from the raw page bytes with regexes.
  *
  * Scan semantics (chosen so the oracle's regex mirror is exact on any
  * corpus where markup keywords never appear inside text, comments or
  * attribute values — true of the generated corpus, argued per-field in
  * the q98 oracle comment):
  *  - `title`: text of the FIRST `<title>...</title>` pair,
  *    whitespace-collapsed and trimmed ('' when absent);
  *  - `lang_attr`: the double-quoted `lang` attribute of the first
  *    `<html ...>` tag ('' when absent — e.g. mirror pages);
  *  - `has_doctype`: payload begins with `<!doctype` (ASCII-case-
  *    insensitive, leading whitespace tolerated);
  *  - `n_script` / `n_style` / `n_meta`: count of `<script` / `<style`
  *    / `<meta` tag opens (the next byte must close or continue the
  *    tag, so `<metadata>` never counts as `<meta>`).
  *
  * Scale shape: one forward scan per row, no allocation beyond the
  * title slice — map-side on the page scan, nothing shuffles.
  */
object HeadMeta {

  /** Bump to invalidate dumps derived from this kernel. */
  val Version = 1

  final case class Meta(title: String, langAttr: String, hasDoctype: Boolean,
                        nScript: Int, nStyle: Int, nMeta: Int)

  def scan(html: String): Meta = {
    val n = html.length

    var i = 0
    while (i < n && Character.isWhitespace(html.charAt(i))) i += 1
    val hasDoctype = regionMatchesLower(html, i, "<!doctype")

    // first <html ...> tag's lang="..." (double-quoted form)
    var langAttr = ""
    val htmlAt = tagOpenIndex(html, 0, "html")
    if (htmlAt >= 0) {
      val end = html.indexOf('>', htmlAt)
      if (end > htmlAt) {
        val tag = html.substring(htmlAt, end)
        val la = tag.indexOf(" lang=\"")
        if (la >= 0) {
          val vStart = la + 7
          val vEnd = tag.indexOf('"', vStart)
          if (vEnd > vStart) langAttr = tag.substring(vStart, vEnd)
          else if (vEnd == vStart) langAttr = ""
        }
      }
    }

    // first <title>...</title>, whitespace-collapsed + trimmed
    var title = ""
    val tAt = tagOpenIndex(html, 0, "title")
    if (tAt >= 0) {
      val open = html.indexOf('>', tAt)
      if (open >= 0) {
        val close = indexOfLower(html, open + 1, "</title")
        if (close >= 0) title = collapseWs(html.substring(open + 1, close))
      }
    }

    Meta(title, langAttr, hasDoctype,
      countTagOpens(html, "script"),
      countTagOpens(html, "style"),
      countTagOpens(html, "meta"))
  }

  /** Index of the first `<name` whose next char terminates the tag name
    * (whitespace, '>' or '/'), ASCII-case-insensitive; -1 when absent. */
  private def tagOpenIndex(html: String, from: Int, name: String): Int = {
    var i = from
    val n = html.length
    while (i >= 0 && i < n) {
      i = html.indexOf('<', i)
      if (i < 0) return -1
      if (regionMatchesLower(html, i + 1, name)) {
        val after = i + 1 + name.length
        if (after >= n) return -1
        val c = html.charAt(after)
        if (c == '>' || c == '/' || Character.isWhitespace(c)) return i
      }
      i += 1
    }
    -1
  }

  private def countTagOpens(html: String, name: String): Int = {
    var count = 0
    var i = tagOpenIndex(html, 0, name)
    while (i >= 0) {
      count += 1
      i = tagOpenIndex(html, i + 1, name)
    }
    count
  }

  private def indexOfLower(html: String, from: Int, needle: String): Int = {
    var i = from
    val n = html.length
    while (i <= n - needle.length) {
      if (regionMatchesLower(html, i, needle)) return i
      i += 1
    }
    -1
  }

  private def regionMatchesLower(s: String, at: Int, lowerNeedle: String): Boolean = {
    if (at < 0 || at + lowerNeedle.length > s.length) return false
    var k = 0
    while (k < lowerNeedle.length) {
      val c = s.charAt(at + k)
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      if (lc != lowerNeedle.charAt(k)) return false
      k += 1
    }
    true
  }

  private def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
