package graft.nlp

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Structured model-response parsing (SURVEY §2.8 F12) — the
  * re-expression of the reference's line-oriented `KEY: value` response
  * parsers: classification TYPE/CATEGORY/CONFIDENCE with raw-label
  * mapping and single-bare-line fallback
  * (/root/reference/ocrworker/classification/detector.py:201-235),
  * metadata fields with the NOT_FOUND sentinel (:262-283), and the
  * tolerant never-throw posture of the segmentation parser
  * (/root/reference/ocrworker/segmentation/segmenter.py:285-313).
  *
  * Spark-first: every field is a pure Column expression (codegen'd —
  * no UDF), and the SAME rule tables emit the DuckDB oracle SQL so the
  * two can never drift. Parsing semantics, matching the reference:
  *  - a field's value is everything after the FIRST ':' on a line
  *    whose (stripped) prefix is `KEY:`, trimmed; missing line → null
  *  - TYPE/CATEGORY raw values are lowercased and mapped through the
  *    known-label tables; unmapped → "unknown"
  *  - if TYPE is missing and the whole response is a single line, that
  *    line is the raw type (the bare-answer fallback)
  *  - CONFIDENCE must be high/medium/low, anything else → "medium"
  *  - metadata: NOT_FOUND (case-insensitive) lines never assign, so the
  *    last non-sentinel duplicate wins; no surviving line → null
  *  - garbage anywhere never throws: unparseable responses yield
  *    doc_type/category "unknown" + null fields
  */
object ResponseParser {

  /** raw label → canonical type (detector.py:101-124 semantics). */
  val typeMapping: Seq[(String, String)] = Seq(
    "invoice" -> "invoice",
    "receipt" -> "receipt",
    "contract" -> "contract",
    "letter" -> "letter",
    "business_letter" -> "correspondence",
    "personal_letter" -> "correspondence",
    "memo" -> "correspondence",
    "form" -> "form",
    "application_form" -> "form",
    "report" -> "report",
    "bank_statement" -> "bank_statement",
    "tax_form" -> "tax_form",
    "insurance_claim" -> "insurance_claim",
    "purchase_order" -> "purchase_order",
    "medical_record" -> "medical_record",
    "legal_filing" -> "legal_filing",
    "court_filing" -> "legal_filing",
    "passport" -> "id_document",
    "drivers_license" -> "id_document",
    "national_id" -> "id_document",
    "email" -> "correspondence",
    "email_printout" -> "correspondence")

  val categoryMapping: Seq[(String, String)] = Seq(
    "financial" -> "financial",
    "legal" -> "legal",
    "medical" -> "medical",
    "correspondence" -> "correspondence",
    "administrative" -> "administrative",
    "technical" -> "technical",
    "personal" -> "personal",
    "government" -> "government")

  /** metadata line keys → output column names (detector.py:266-273). */
  val fieldMap: Seq[(String, String)] = Seq(
    "DATE" -> "document_date",
    "NUMBER" -> "document_number",
    "SENDER" -> "sender",
    "RECIPIENT" -> "recipient",
    "AMOUNT" -> "amount",
    "CURRENCY" -> "currency")

  // [^\r\n]* instead of (.*)$ — Java's (?m)$ matches before \r\n while
  // RE2's (DuckDB) matches only before \n, so a $-anchored capture would
  // drift between the two on CRLF responses; the negated class stops at
  // either terminator identically in both engines.
  private def lineRegex(key: String): String = s"(?m)^\\s*$key:([^\\r\\n]*)"

  /** Raw value of the `KEY:` line ('' when absent or the response is
    * null — reference default). LAST matching line wins, like the
    * reference's overwrite-in-a-loop parsers (a model that corrects
    * itself later in the response gets its correction honored);
    * try_element_at(-1) because ANSI element_at throws on empty. */
  def lineValue(resp: Column, key: String): Column =
    coalesce(
      trim(try_element_at(regexp_extract_all(resp, lit(lineRegex(key)), lit(1)), lit(-1))),
      lit(""))

  /** doc_type column: TYPE line → bare-single-line fallback → mapping. */
  def docType(resp: Column): Column = {
    val fromLine = lower(lineValue(resp, "TYPE"))
    val raw = when(fromLine === "" && !trim(resp).contains("\n"), lower(trim(resp)))
      .otherwise(fromLine)
    typeMapping.foldRight(lit("unknown")) { case ((k, v), elseC) =>
      when(raw === k, v).otherwise(elseC)
    }
  }

  def category(resp: Column): Column = {
    val raw = lower(lineValue(resp, "CATEGORY"))
    categoryMapping.foldRight(lit("unknown")) { case ((k, v), elseC) =>
      when(raw === k, v).otherwise(elseC)
    }
  }

  def confidence(resp: Column): Column = {
    val raw = lower(lineValue(resp, "CONFIDENCE"))
    when(raw.isin("high", "medium", "low"), raw).otherwise("medium")
  }

  /** A metadata field, with the reference's exact assignment semantics
    * (_parse_metadata, detector.py:262-283: assignment is SKIPPED for a
    * NOT_FOUND value, so an earlier real value survives a later
    * NOT_FOUND duplicate; an empty value IS assigned): the last
    * matching line whose value isn't the NOT_FOUND sentinel wins —
    * present-but-empty yields '', no surviving line yields null. */
  def metadataField(resp: Column, key: String): Column = {
    val vals = regexp_extract_all(resp, lit(lineRegex(key)), lit(1))
    val kept = filter(vals, v => upper(trim(v)) =!= "NOT_FOUND")
    trim(try_element_at(kept, lit(-1)))
  }

  // ---- quality-assessment parse (detector.py:317-373) ------------------

  /** quality label → score (detector.py:340-349); unknown → 2. */
  val qualityScores: Seq[(String, Int)] = Seq(
    "good" -> 3, "fair" -> 2, "poor" -> 1,
    "complete" -> 3, "partial" -> 2, "unclear" -> 1,
    "slight_skew" -> 2, "significant_skew" -> 1)

  /** Lowercased quality dimension value; 'unknown' when absent. */
  def qualityDim(resp: Column, key: String): Column = {
    val raw = lower(lineValue(resp, key))
    when(raw === "", "unknown").otherwise(raw)
  }

  private def scoreOf(dim: Column): Column =
    qualityScores.foldRight(lit(2)) { case ((k, v), elseC) =>
      when(dim === k, v).otherwise(elseC)
    }

  /** overall_quality from the four dimension lines: mean of the mapped
    * scores, good ≥ 2.5 > fair ≥ 1.5 > poor (detector.py:351-364). */
  def overallQuality(resp: Column): Column = {
    val avg = (scoreOf(qualityDim(resp, "READABILITY")) +
      scoreOf(qualityDim(resp, "ALIGNMENT")) +
      scoreOf(qualityDim(resp, "COMPLETENESS")) +
      scoreOf(qualityDim(resp, "CONTRAST"))).cast("double") / 4.0
    when(avg >= 2.5, "good").otherwise(when(avg >= 1.5, "fair").otherwise("poor"))
  }

  /** ISSUES line → array of trimmed issues; NONE (case-insensitive) or a
    * missing/null line → empty array. A PRESENT-but-empty 'ISSUES:'
    * yields [""], exactly like the reference (''.split(',') == ['']
    * on the non-NONE branch, detector.py:334-338). */
  def issues(resp: Column): Column = {
    val present = coalesce(resp.rlike("(?m)^\\s*ISSUES:"), lit(false))
    val v = lineValue(resp, "ISSUES")
    when(!present || upper(v) === "NONE", array())
      .otherwise(transform(split(v, ","), x => trim(x)))
  }

  // ---- multi-document detection parse (segmenter.py:285-313) -----------

  /** MULTIPLE_DOCUMENTS: YES → true; anything else INCLUDING a null
    * response → false (the reference uppercases the whole response
    * before matching and defaults is_multiple=False). */
  def isMultiple(resp: Column): Column =
    coalesce(lineValue(upper(resp), "MULTIPLE_DOCUMENTS") === "YES", lit(false))

  /** COUNT line as int; unparseable/missing → 1 (reference default;
    * try_cast because ANSI mode makes plain cast throw on garbage). */
  def docCount(resp: Column): Column =
    coalesce(lineValue(upper(resp), "COUNT").try_cast("int"), lit(1))

  // ---- DuckDB oracle mirrors (same tables, same regexes) ---------------

  // last-match + null-total, mirroring lineValue
  private def sqlLine(respExpr: String, key: String): String =
    s"trim(coalesce(list_extract(regexp_extract_all($respExpr, " +
      s"'(?m)^\\s*$key:([^\\r\\n]*)', 1), -1), ''))"

  def sqlDocType(respExpr: String): String = {
    val fromLine = s"lower(${sqlLine(respExpr, "TYPE")})"
    val raw = s"(CASE WHEN $fromLine = '' AND strpos(trim($respExpr), chr(10)) = 0" +
      s" THEN lower(trim($respExpr)) ELSE $fromLine END)"
    typeMapping.reverse.foldLeft("'unknown'") { case (elseC, (k, v)) =>
      s"(CASE WHEN $raw = '$k' THEN '$v' ELSE $elseC END)"
    }
  }

  def sqlCategory(respExpr: String): String = {
    val raw = s"lower(${sqlLine(respExpr, "CATEGORY")})"
    categoryMapping.reverse.foldLeft("'unknown'") { case (elseC, (k, v)) =>
      s"(CASE WHEN $raw = '$k' THEN '$v' ELSE $elseC END)"
    }
  }

  def sqlConfidence(respExpr: String): String = {
    val raw = s"lower(${sqlLine(respExpr, "CONFIDENCE")})"
    s"(CASE WHEN $raw IN ('high','medium','low') THEN $raw ELSE 'medium' END)"
  }

  // mirrors metadataField: last non-NOT_FOUND match; '' kept, none → NULL
  def sqlMetadataField(respExpr: String, key: String): String =
    s"trim(list_extract(list_filter(regexp_extract_all($respExpr, " +
      s"'(?m)^\\s*$key:([^\\r\\n]*)', 1), x -> upper(trim(x)) <> 'NOT_FOUND'), -1))"

  def sqlQualityDim(respExpr: String, key: String): String = {
    val raw = s"lower(${sqlLine(respExpr, key)})"
    s"(CASE WHEN $raw = '' THEN 'unknown' ELSE $raw END)"
  }

  private def sqlScoreOf(dimExpr: String): String =
    qualityScores.reverse.foldLeft("2") { case (elseC, (k, v)) =>
      s"(CASE WHEN $dimExpr = '$k' THEN $v ELSE $elseC END)"
    }

  def sqlOverallQuality(respExpr: String): String = {
    val sum = Seq("READABILITY", "ALIGNMENT", "COMPLETENESS", "CONTRAST")
      .map(k => sqlScoreOf(sqlQualityDim(respExpr, k))).mkString(" + ")
    val avg = s"(CAST($sum AS DOUBLE) / 4.0)"
    s"(CASE WHEN $avg >= 2.5 THEN 'good' WHEN $avg >= 1.5 THEN 'fair' ELSE 'poor' END)"
  }

  /** issues as (csv, count) scalar mirrors — lists don't hash-compare
    * portably across engines, so queries surface these two scalars. */
  def sqlIssuesCsv(respExpr: String): String = {
    val present = s"coalesce(regexp_matches($respExpr, '(?m)^\\s*ISSUES:'), false)"
    val v = sqlLine(respExpr, "ISSUES")
    s"(CASE WHEN NOT $present OR upper($v) = 'NONE' THEN ''" +
      s" ELSE array_to_string(list_transform(string_split($v, ','), x -> trim(x)), '|') END)"
  }

  def sqlNIssues(respExpr: String): String = {
    val present = s"coalesce(regexp_matches($respExpr, '(?m)^\\s*ISSUES:'), false)"
    val v = sqlLine(respExpr, "ISSUES")
    s"(CASE WHEN NOT $present OR upper($v) = 'NONE' THEN 0" +
      s" ELSE CAST(len(string_split($v, ',')) AS INTEGER) END)"
  }

  def sqlIsMultiple(respExpr: String): String =
    s"(${sqlLine(s"upper($respExpr)", "MULTIPLE_DOCUMENTS")} = 'YES')"

  def sqlDocCount(respExpr: String): String =
    s"coalesce(TRY_CAST(${sqlLine(s"upper($respExpr)", "COUNT")} AS INTEGER), 1)"
}
