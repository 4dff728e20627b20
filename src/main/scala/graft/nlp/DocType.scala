package graft.nlp

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Keyword/feature document-type classification — the re-expression of
  * the reference's classification surface
  * (/root/reference/ocrworker/classification/detector.py:14-44
  * DocumentType/DocumentCategory enums, :47-51 ConfidenceLevel,
  * :101-135 raw-label mappings). The reference asks a VLM for
  * TYPE/CATEGORY/CONFIDENCE per page image; no VLM ships in this
  * sandbox, so the classifier is the deterministic keyword/feature
  * analog over extracted text — and it is deliberately expressible as
  * pure SQL so the SAME rule table emits both the Spark Column and the
  * DuckDB oracle SQL (the two can never drift).
  *
  * Priority-ordered first-match-wins over keyword families; confidence
  * = high when >= 2 distinct keywords of the winning type are present,
  * medium when exactly 1, low for unknown (the reference's
  * high/medium/low levels).
  */
object DocType {

  /** (doc_type, category, keywords), priority-ordered. */
  val table: Seq[(String, String, Seq[String])] = Seq(
    ("invoice", "financial", Seq("invoice", "bill to", "remit", "total due")),
    ("purchase_order", "financial", Seq("purchase order", "po number", "po-")),
    ("receipt", "financial", Seq("receipt", "paid in full", "payment received")),
    ("bank_statement", "financial", Seq("bank statement", "account balance", "closing balance")),
    ("tax_form", "government", Seq("withholding", "irs", "tax id", "taxpayer")),
    ("insurance_claim", "legal", Seq("insurance", "policy number", "claim")),
    ("contract", "legal", Seq("agreement", "undersigned", "terms and conditions", "hereby")),
    ("form", "administrative", Seq("please complete", "required field", "signature", "checkbox")),
    ("correspondence", "correspondence", Seq("dear ", "sincerely", "regards", "yours truly")),
    ("report", "technical", Seq("report", "summary", "quarterly", "analysis")),
    ("order_confirmation", "financial", Seq("order", "is due", "discount")),
    ("reference_note", "administrative", Seq("reference", "ref-", "rate")))

  /** Per-type keyword hit count over lower(text). */
  private def hits(lower: Column, kws: Seq[String]): Column =
    kws.map(k => when(lower.contains(k), 1).otherwise(0)).reduce(_ + _)

  /** (doc_type, category, confidence_level) columns. */
  def columns(text: Column): (Column, Column, Column) = {
    val lower = lower_(text)
    val hitCols = table.map { case (_, _, kws) => hits(lower, kws) }
    val docType = table.zip(hitCols).foldRight(lit("unknown")) {
      case (((t, _, _), h), elseC) => when(h > 0, t).otherwise(elseC)
    }
    val category = table.zip(hitCols).foldRight(lit("unknown")) {
      case (((_, c, _), h), elseC) => when(h > 0, c).otherwise(elseC)
    }
    val conf = table.zip(hitCols).foldRight(lit("low")) {
      case ((_, h), elseC) => when(h >= 2, "high").otherwise(when(h === 1, "medium").otherwise(elseC))
    }
    (docType, category, conf)
  }

  private def lower_(c: Column): Column = lower(c)

  // ---- the identical classifier as DuckDB SQL expressions -------------

  private def sqlHits(kws: Seq[String]): String =
    kws.map(k => s"(CASE WHEN contains(lower($TextCol), '${k.replace("'", "''")}') THEN 1 ELSE 0 END)")
      .mkString(" + ")

  val TextCol = "text" // placeholder substituted by callers

  /** CASE expression strings (doc_type, category, confidence) over a
    * column literally named by `textCol`. */
  def sqlColumns(textCol: String): (String, String, String) = {
    def h(kws: Seq[String]) = sqlHits(kws).replace(s"lower($TextCol)", s"lower($textCol)")
    val t = table.foldRight("'unknown'") { case ((ty, _, kws), e) =>
      s"CASE WHEN (${h(kws)}) > 0 THEN '$ty' ELSE $e END"
    }
    val c = table.foldRight("'unknown'") { case ((_, cat, kws), e) =>
      s"CASE WHEN (${h(kws)}) > 0 THEN '$cat' ELSE $e END"
    }
    val cf = table.foldRight("'low'") { case ((_, _, kws), e) =>
      s"CASE WHEN (${h(kws)}) >= 2 THEN 'high' WHEN (${h(kws)}) = 1 THEN 'medium' ELSE $e END"
    }
    (t, c, cf)
  }
}
