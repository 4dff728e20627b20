package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.nlp.ResponseParser

/** F12 — structured model-response parsing gates: reference semantics
  * (detector.py:201-235 classification, :262-283 metadata) on planted
  * responses, including every fallback branch. */
class ResponseParserSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def parse(resp: String): (String, String, String, Option[String]) = {
    import spark.implicits._
    val df = Seq(resp).toDF("response")
    val r = df.select(
      ResponseParser.docType(col("response")),
      ResponseParser.category(col("response")),
      ResponseParser.confidence(col("response")),
      ResponseParser.metadataField(col("response"), "DATE")).first()
    (r.getString(0), r.getString(1), r.getString(2), Option(r.getString(3)))
  }

  test("clean KEY: lines parse to mapped type/category/confidence + fields") {
    val (t, c, conf, date) = parse(
      "TYPE: invoice\nCATEGORY: financial\nCONFIDENCE: high\nDATE: 2024-03-15")
    assert((t, c, conf, date) == (("invoice", "financial", "high", Some("2024-03-15"))))
  }

  test("raw labels map through the alias tables (court_filing -> legal_filing)") {
    val (t, _, _, _) = parse("TYPE: court_filing\nCATEGORY: legal")
    assert(t == "legal_filing")
  }

  test("unknown labels and non-level confidence fall back (unknown / medium)") {
    val (t, c, conf, _) = parse("TYPE: hologram\nCATEGORY: bureaucracy\nCONFIDENCE: definitely")
    assert((t, c, conf) == (("unknown", "unknown", "medium")))
  }

  test("bare single-line answer is taken as the raw type") {
    val (t, _, conf, _) = parse("  Receipt  ")
    assert(t == "receipt" && conf == "medium")
  }

  test("single-line fallback does NOT fire on multi-line responses") {
    val (t, _, _, _) = parse("invoice\nsome trailing explanation")
    assert(t == "unknown")
  }

  test("NOT_FOUND sentinel and missing lines both yield null fields") {
    val (_, _, _, d1) = parse("TYPE: letter\nDATE: NOT_FOUND")
    val (_, _, _, d2) = parse("TYPE: letter")
    assert(d1.isEmpty && d2.isEmpty)
  }

  test("value keeps everything after the FIRST colon (times survive)") {
    import spark.implicits._
    val df = Seq("DATE: 2024-01-02 10:30:00").toDF("response")
    val v = df.select(ResponseParser.metadataField(col("response"), "DATE")).first().getString(0)
    assert(v == "2024-01-02 10:30:00")
  }

  test("indented lines parse (reference strips before prefix match); prose never throws") {
    val (t, _, _, _) = parse("   TYPE: memo\nCATEGORY: personal")
    assert(t == "correspondence")
    val (t2, c2, conf2, d) = parse("The scan is too blurry; it might be some kind of form.")
    assert((t2, c2, conf2, d) == (("unknown", "unknown", "medium", None)))
  }

  test("CRLF responses parse identically to LF (no \\r leaks into values)") {
    val (t, c, conf, date) = parse(
      "TYPE: invoice\r\nCATEGORY: financial\r\nCONFIDENCE: high\r\nDATE: 2024-03-15\r\n")
    assert((t, c, conf, date) == (("invoice", "financial", "high", Some("2024-03-15"))))
  }

  test("quality assessment: score mapping, unknown default, overall thresholds") {
    import spark.implicits._
    def overall(resp: String): String =
      Seq(resp).toDF("r").select(ResponseParser.overallQuality(col("r"))).first().getString(0)
    // all good -> 3.0 -> good
    assert(overall("READABILITY: good\nALIGNMENT: good\nCOMPLETENESS: complete\nCONTRAST: good") == "good")
    // all poor/unclear -> 1.0 -> poor
    assert(overall("READABILITY: poor\nALIGNMENT: significant_skew\nCOMPLETENESS: unclear\nCONTRAST: poor") == "poor")
    // missing lines score the unknown default 2 -> 2.0 -> fair
    assert(overall("READABILITY: good\nCONTRAST: poor") == "fair")
    // issues: NONE and missing both empty; list split + trimmed
    def iss(resp: String): Seq[String] =
      Seq(resp).toDF("r").select(ResponseParser.issues(col("r"))).first().getSeq[String](0)
    assert(iss("ISSUES: NONE").isEmpty && iss("READABILITY: good").isEmpty)
    assert(iss("ISSUES: stain, torn corner ,blur") == Seq("stain", "torn corner", "blur"))
  }

  test("multi-document detection: YES gate, count default on unparseable") {
    import spark.implicits._
    def parseMulti(resp: String): (Boolean, Int) = {
      val r = Seq(resp).toDF("r")
        .select(ResponseParser.isMultiple(col("r")), ResponseParser.docCount(col("r"))).first()
      (r.getBoolean(0), r.getInt(1))
    }
    assert(parseMulti("MULTIPLE_DOCUMENTS: yes\nCOUNT: 3") == ((true, 3)))
    assert(parseMulti("MULTIPLE_DOCUMENTS: NO\nCOUNT: not sure") == ((false, 1)))
    assert(parseMulti("free-form refusal") == ((false, 1)))
  }

  test("q45 runs end-to-end with all four synthesized shapes present") {
    val df = graft.queries.GraftQueries.queries("q45_response_parse")(spark, "/root/testdata/sf0.001")
    val byType = df.groupBy("doc_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.keySet == Set("invoice", "tax_form", "receipt", "unknown"))
    // variants are doc_id % 4 — counts within 1 of each other
    assert(byType.values.max - byType.values.min <= 1)
  }
}
