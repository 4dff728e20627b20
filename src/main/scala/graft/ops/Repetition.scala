package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-document repetition statistics (Rae et al. 2021 "Scaling
  * Language Models: … Gopher", Table A1, and the C4 heuristics of
  * Raffel et al. 2020): the classic pre-training corpus filters that
  * drop machine-generated / boilerplate-heavy documents.
  *
  * All four signals are exact integer ratios computed in ONE pass per
  * document (map-side, no shuffle — at 100 TB this is a projection on
  * the corpus scan), defined so a SQL engine can re-derive them
  * verbatim (the q54 DuckDB oracle does):
  *
  *  - `dup_line_frac`       excess line occurrences / total lines,
  *                          lines = text split on '\n', empty removed
  *  - `dup_line_char_frac`  chars in excess line occurrences / total
  *                          line chars
  *  - `top_bigram_frac`     char mass of the most frequent token
  *                          2-gram (count × gram chars, space
  *                          excluded) / total token chars; ties break
  *                          to the lexicographically smallest gram
  *  - `dup_trigram_frac`    excess token-3-gram occurrences / total
  *                          3-grams
  *
  * `keep` applies the published thresholds (0.30 / 0.20 / 0.20 from
  * Gopher A1; 0.30 for the trigram excess stand-in). Degenerate
  * denominators (no lines / tokens / grams) yield 0.0, never NaN.
  *
  * Tokenization matches the rest of the text family (q13/q14): split
  * on `\s+`, empty tokens removed.
  */
object Repetition {

  /** Version token keying the materialized per-doc feature dump (bump
    * when any fraction definition or threshold changes). */
  val Version: String = "rep-1"

  val DupLineMax = 0.30
  val DupLineCharMax = 0.20
  val TopBigramMax = 0.20
  val DupTrigramMax = 0.30

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** The `keep` field is derived by [[Stats.gated]] — the gate exists
    * exactly once, and the UDF struct carries it to the DataFrame
    * surface unchanged. */
  final case class Stats(dup_line_frac: Double, dup_line_char_frac: Double,
                         top_bigram_frac: Double, dup_trigram_frac: Double,
                         keep: Boolean)
  object Stats {
    def gated(dupLineFrac: Double, dupLineCharFrac: Double,
              topBigramFrac: Double, dupTrigramFrac: Double): Stats =
      Stats(dupLineFrac, dupLineCharFrac, topBigramFrac, dupTrigramFrac,
        dupLineFrac <= DupLineMax && dupLineCharFrac <= DupLineCharMax &&
          topBigramFrac <= TopBigramMax && dupTrigramFrac <= DupTrigramMax)
  }

  def stats(text: String): Stats = {
    if (text == null || text.isEmpty) return Stats.gated(0.0, 0.0, 0.0, 0.0)

    // ---- line repetition -------------------------------------------
    val lineCounts = new java.util.HashMap[String, Int]()
    var nLines = 0L
    var lineChars = 0L
    var from = 0
    val len = text.length
    while (from <= len) {
      val nl = text.indexOf('\n', from)
      val end = if (nl < 0) len else nl
      if (end > from) {
        val line = text.substring(from, end)
        lineCounts.merge(line, 1, Integer.sum)
        nLines += 1
        lineChars += line.length
      }
      from = end + 1
    }
    var excessLines = 0L
    var excessLineChars = 0L
    val lit = lineCounts.entrySet().iterator()
    while (lit.hasNext) {
      val e = lit.next()
      if (e.getValue > 1) {
        excessLines += e.getValue - 1
        excessLineChars += (e.getValue - 1).toLong * e.getKey.length
      }
    }
    val dupLineFrac = if (nLines == 0) 0.0 else excessLines.toDouble / nLines
    val dupLineCharFrac = if (lineChars == 0) 0.0 else excessLineChars.toDouble / lineChars

    // ---- token n-gram repetition -----------------------------------
    val toks = ws.split(text).filter(_.nonEmpty)
    var tokChars = 0L
    var i = 0
    while (i < toks.length) { tokChars += toks(i).length; i += 1 }

    var topBigramFrac = 0.0
    if (toks.length >= 2 && tokChars > 0) {
      val bi = new java.util.HashMap[String, Int]()
      i = 0
      while (i < toks.length - 1) {
        bi.merge(toks(i) + " " + toks(i + 1), 1, Integer.sum)
        i += 1
      }
      var bestGram: String = null
      var bestCount = 0
      val bit = bi.entrySet().iterator()
      while (bit.hasNext) {
        val e = bit.next()
        if (e.getValue > bestCount ||
            (e.getValue == bestCount && e.getKey.compareTo(bestGram) < 0)) {
          bestGram = e.getKey; bestCount = e.getValue
        }
      }
      topBigramFrac = bestCount.toLong * (bestGram.length - 1) / tokChars.toDouble
    }

    var dupTrigramFrac = 0.0
    if (toks.length >= 3) {
      val tri = new java.util.HashMap[String, Int]()
      i = 0
      while (i < toks.length - 2) {
        tri.merge(toks(i) + " " + toks(i + 1) + " " + toks(i + 2), 1, Integer.sum)
        i += 1
      }
      var total = 0L
      var excess = 0L
      val tit = tri.entrySet().iterator()
      while (tit.hasNext) {
        val e = tit.next()
        total += e.getValue
        excess += e.getValue - 1
      }
      dupTrigramFrac = excess.toDouble / total
    }

    Stats.gated(dupLineFrac, dupLineCharFrac, topBigramFrac, dupTrigramFrac)
  }

  /** Attach the four repetition fractions (rounded to 6 — same
    * convention as the quality family) and the keep gate. */
  def withStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val fn = udf((t: String) => stats(t))
    df.withColumn("__rep", fn(col(textCol)))
      .withColumn("dup_line_frac", round(col("__rep.dup_line_frac"), 6))
      .withColumn("dup_line_char_frac", round(col("__rep.dup_line_char_frac"), 6))
      .withColumn("top_bigram_frac", round(col("__rep.top_bigram_frac"), 6))
      .withColumn("dup_trigram_frac", round(col("__rep.dup_trigram_frac"), 6))
      .withColumn("keep", col("__rep.keep"))
      .drop("__rep")
  }
}
