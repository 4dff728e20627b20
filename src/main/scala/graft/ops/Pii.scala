package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction over document text — the scrubbing pass a
  * training-data pipeline runs before release (the public method used
  * by C4/Dolma-style corpora: regex families for emails, phone
  * numbers, IP addresses, and SSN-shaped ids, masked with typed
  * placeholder tokens). No reference analog — corpus-level curation,
  * not per-document OCR.
  *
  * Scale shape: pure map-side Catalyst regex (`regexp_extract_all` /
  * `regexp_replace`, codegen'd, no UDF) — zero shuffle, trivially
  * 100 TB-safe. Patterns are deliberately RE2-compatible (no
  * lookaround/backrefs) so the DuckDB oracle can run the IDENTICAL
  * pattern strings: the per-category counts and the md5 of the fully
  * redacted text are both independently recomputed by the oracle.
  *
  * Redaction applies the families in [[patterns]] order; masks contain
  * no digits or '@', so an earlier mask can never create a later
  * match and the composition order is well-defined in both engines.
  */
object Pii {

  /** (name, regex, mask) — regex source shared verbatim with the SQL
    * oracle (shared-rule-table pattern). */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b", "<PHONE>"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"))

  /** Per-category match count on the ORIGINAL text (counting before
    * masking keeps each count independent of family order). */
  def countsFor(text: Column): Seq[(String, Column)] =
    patterns.map { case (name, re, _) =>
      name -> size(regexp_extract_all(text, lit(re), lit(0)))
    }

  /** Text with every family masked, applied in [[patterns]] order. */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (c, (_, re, mask)) =>
      regexp_replace(c, lit(re), lit(mask))
    }

  /** Flat per-doc PII summary: counts per family + redacted-text
    * digest/length (the digest lets the oracle value-check the full
    * redaction output without dumping megabytes of text). */
  def summarize(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val counts = countsFor(t).map { case (n, c) => c.as(s"n_${n}s") }
    val red = redact(t)
    df.select(
      (col(idCol) +: counts) :+
        md5(red.cast("binary")).as("redacted_md5") :+
        length(red).as("redacted_len"): _*)
  }

  /** DuckDB mirror of [[summarize]], rendered from the SAME pattern
    * table — counts, masking order, digest and length all recomputed
    * independently. `docsRel` must expose (url, t). */
  def summarySql(docsRel: String): String = {
    val counts = patterns.map { case (name, re, _) =>
      s"CAST(length(regexp_extract_all(t, '$re')) AS INT) AS n_${name}s"
    }.mkString(",\n  ")
    val red = patterns.foldLeft("t") { case (e, (_, re, mask)) =>
      s"regexp_replace($e, '$re', '$mask', 'g')"
    }
    s"""SELECT url,
       |  $counts,
       |  md5($red) AS redacted_md5,
       |  CAST(length($red) AS INT) AS redacted_len
       |FROM $docsRel""".stripMargin
  }
}
