package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Characteristics-based engine selection — the re-expression of the
  * reference's EngineSelector
  * (/root/reference/ocrworker/pipeline/selector.py): selection
  * strategies (:11-18), the language→engine map (:21-35), the document-
  * type→engine map (:37-47), the per-engine characteristics table
  * (:50-75), and the strategy dispatch in select_engine (:89-130 with
  * the per-strategy helpers at :132-221).
  *
  * The engine roster maps onto this pipeline's classifiers:
  *  - "density"          — strict text-density classifier: fast, highest
  *                         boilerplate precision (the TESSERACT slot:
  *                         fast / high printed accuracy).
  *  - "density_relaxed"  — recall-oriented classifier: keeps sparse
  *                         blocks a strict density score drops (the
  *                         stronger-but-looser PADDLEOCR/QWEN slot).
  *  - "pdf_layout"       — the PDF branch (payload-kind dispatch, not a
  *                         choice).
  *
  * Selection is a pure function of document characteristics (language,
  * payload kind, payload size → quality hint, optional doc-type hint),
  * so it runs map-side with zero shuffle at any scale, and the routing
  * rule table emits BOTH the Spark Columns and the DuckDB SQL mirror
  * (the DocType.sqlColumns pattern) so q49 is value-checked end-to-end.
  */
object EngineSelector {

  // strategy names (selector.py:11-18)
  val BestAvailable = "best_available"
  val Fastest = "fastest"
  val MostAccurate = "most_accurate"
  val LanguageOptimized = "language_optimized"
  val DocTypeOptimized = "document_type_optimized"
  val CostOptimized = "cost_optimized"

  /** Engine characteristics (the selector.py:50-75 table, re-keyed for
    * this pipeline's engines; memory is per-task scratch ceiling). */
  final case class Characteristics(
      speed: String, precision: String, recall: String, memoryMb: Int)

  val characteristics: Map[String, Characteristics] = Map(
    "density" -> Characteristics("fast", "high", "medium", 4),
    "density_relaxed" -> Characteristics("fast", "medium", "high", 4),
    "pdf_layout" -> Characteristics("medium", "high", "high", 16))

  /** Language → engine (selector.py:21-35, same tesseract-style keys):
    * scripts without spaces or with complex shaping get the recall
    * engine (word-count density scoring under-fires on them); Latin
    * languages get the strict engine. */
  val languageEngineMap: Map[String, String] = Map(
    "chi_sim" -> "density_relaxed", "chi_tra" -> "density_relaxed",
    "jpn" -> "density_relaxed", "kor" -> "density_relaxed",
    "ara" -> "density_relaxed", "hin" -> "density_relaxed",
    "tha" -> "density_relaxed", "vie" -> "density_relaxed",
    "eng" -> "density", "deu" -> "density",
    "fra" -> "density", "spa" -> "density")

  /** Document type → engine (selector.py:37-47 analog: sparse/override
    * types go to the recall engine, standard text to the strict one). */
  val docTypeEngineMap: Map[String, String] = Map(
    "form" -> "density_relaxed",        // sparse label:value lines
    "link_directory" -> "density_relaxed", // high link density everywhere
    "sparse_text" -> "density_relaxed",
    "mixed_content" -> "density_relaxed",
    "standard_text" -> "density",
    "article" -> "density")

  /** Payload-size floor under which a page is hinted "poor" quality:
    * a sub-800-byte page carries too few blocks for density statistics
    * to be reliable, the analog of a low-DPI scan. */
  val PoorQualityBytes = 800

  /** Engine priority ladders (selector.py:133-139 best, :149-155
    * fastest, :209-214 cost). For this roster the strict density engine
    * is both the fastest AND the cheapest; "best" prefers it too
    * because main-content precision is the product metric (unlike the
    * reference, whose best engine is its slowest — the ladder is a
    * property of the engine table, not of the dispatch). */
  private val bestPriority = Seq("density", "density_relaxed")
  private val fastestPriority = Seq("density", "density_relaxed")
  private val costPriority = Seq("density", "density_relaxed")

  /** The reference's strategy dispatch (select_engine, selector.py:
    * 89-130). `available` models engine availability (is_available);
    * every branch falls through exactly like the original. Returns
    * (engine, reason). */
  def selectEngine(strategy: String,
                   lang: String = "eng",
                   documentType: String = null,
                   qualityHint: String = null,
                   available: Set[String] = Set("density", "density_relaxed")): (String, String) = {

    def firstAvailable(prio: Seq[String], reason: String): (String, String) =
      prio.find(available.contains).map(e => (e, reason))
        .getOrElse(("density", s"$reason:fallback"))

    strategy match {
      case Fastest => firstAvailable(fastestPriority, "strategy:fastest")
      case CostOptimized => firstAvailable(costPriority, "strategy:cost")
      case MostAccurate =>
        // selector.py:162-180
        if ((qualityHint == "poor" || documentType == "handwritten" ||
             documentType == "mixed_content") && available("density_relaxed"))
          ("density_relaxed", if (qualityHint == "poor") "quality:poor" else s"doctype:$documentType")
        else if (languageEngineMap.get(lang).contains("density_relaxed") &&
                 available("density_relaxed"))
          ("density_relaxed", s"lang:$lang")
        else firstAvailable(bestPriority, "strategy:accurate")
      case LanguageOptimized =>
        // selector.py:182-189
        languageEngineMap.get(lang).filter(available.contains)
          .map(e => (e, s"lang:$lang"))
          .getOrElse(firstAvailable(bestPriority, "lang:unmapped"))
      case DocTypeOptimized =>
        // selector.py:191-206
        Option(documentType).flatMap(docTypeEngineMap.get).filter(available.contains)
          .map(e => (e, s"doctype:$documentType"))
          .getOrElse {
            if (qualityHint == "poor" && available("density_relaxed"))
              ("density_relaxed", "quality:poor")
            else firstAvailable(bestPriority, "doctype:unmapped")
          }
      case _ => firstAvailable(bestPriority, "strategy:best")
    }
  }

  // ---- the q49 routing rule as Columns + SQL mirror ---------------------
  //
  // Per-document routing from payload features only (the most_accurate
  // strategy with the quality hint derived from payload size):
  //   kind=pdf     → pdf_layout       reason kind:pdf
  //   kind=unknown → none (quarantine) reason kind:unknown
  //   size < PoorQualityBytes → density_relaxed, reason quality:poor
  //   lang → recall engine            reason lang:<l>
  //   else → density                  reason default
  // One rule table drives both engines so Spark and DuckDB cannot drift.

  private val complexLangs: Seq[String] =
    languageEngineMap.collect { case (l, "density_relaxed") => l }.toSeq.sorted

  def routeEngineCol(kind: Column, size: Column, lang: Column): Column =
    when(kind === "pdf", "pdf_layout")
      .when(kind === "unknown", "none")
      .when(size < PoorQualityBytes, "density_relaxed")
      .when(lang.isin(complexLangs: _*), "density_relaxed")
      .otherwise("density")

  def routeReasonCol(kind: Column, size: Column, lang: Column): Column =
    when(kind === "pdf", "kind:pdf")
      .when(kind === "unknown", "kind:unknown")
      .when(size < PoorQualityBytes, "quality:poor")
      .when(lang.isin(complexLangs: _*), concat(lit("lang:"), lang))
      .otherwise("default")

  def sqlRouteEngine(kind: String, size: String, lang: String): String = {
    val langs = complexLangs.map(l => s"'$l'").mkString(", ")
    s"""(CASE WHEN $kind = 'pdf' THEN 'pdf_layout'
       |  WHEN $kind = 'unknown' THEN 'none'
       |  WHEN $size < $PoorQualityBytes THEN 'density_relaxed'
       |  WHEN $lang IN ($langs) THEN 'density_relaxed'
       |  ELSE 'density' END)""".stripMargin
  }

  def sqlRouteReason(kind: String, size: String, lang: String): String = {
    val langs = complexLangs.map(l => s"'$l'").mkString(", ")
    s"""(CASE WHEN $kind = 'pdf' THEN 'kind:pdf'
       |  WHEN $kind = 'unknown' THEN 'kind:unknown'
       |  WHEN $size < $PoorQualityBytes THEN 'quality:poor'
       |  WHEN $lang IN ($langs) THEN 'lang:' || $lang
       |  ELSE 'default' END)""".stripMargin
  }
}
