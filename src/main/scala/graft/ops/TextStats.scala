package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * All are per-row (map-side, no shuffle); the heavy ones are plain
  * Scala inside mapPartitions (precompiled tables per partition — the
  * analog of the reference's cached engine instances,
  * /root/reference/ocrworker/engines/factory.py:9-13); the light ones
  * are pure SQL expressions that stay in whole-stage codegen.
  */
object TextStats {

  /** Version token for dumps that bake in TextStats outputs (the
    * curation feature dump stores qualityScore values) — bump when any
    * scoring formula changes. */
  val Version: String = "textstats-1"

  // ---- language identification (stopword + script heuristic) ----------

  /** Tiny per-language stopword tables (function words only — public
    * linguistic knowledge). Mirrors the per-language handling the
    * reference threads through OCR (lang codes at
    * /root/reference/ocrworker/ocr.py:13-24). */
  val stopwords: Map[String, Set[String]] = Map(
    "eng" -> Set("the", "of", "and", "to", "in", "is", "that", "for", "it", "with", "as", "on", "was", "at", "by", "this", "have", "from", "or", "not", "but", "what", "all", "were", "when", "we", "there", "can", "an", "your", "which", "their", "said", "if", "a"),
    "deu" -> Set("der", "die", "das", "und", "zu", "den", "von", "mit", "sich", "des", "auf", "ist", "im", "dem", "nicht", "ein", "eine", "als", "auch", "es", "an", "werden", "aus", "er", "hat", "dass", "sie", "nach", "wird", "bei", "einer", "um", "am", "sind", "noch"),
    "fra" -> Set("le", "de", "un", "être", "et", "à", "il", "avoir", "ne", "je", "son", "que", "se", "qui", "dans", "en", "du", "elle", "au", "ce", "pas", "pour", "sur", "avec", "ils", "bien", "cette", "des", "les", "par", "mais", "ou", "si", "leur", "tout", "plus"),
    "spa" -> Set("el", "la", "de", "que", "y", "a", "en", "un", "ser", "se", "no", "haber", "por", "con", "su", "para", "como", "estar", "tener", "le", "lo", "todo", "pero", "más", "hacer", "o", "poder", "decir", "este", "ir", "otro", "ese", "si", "me", "ya", "ver")
  )

  /** Predict language from stopword hit-rates; CJK script check first.
    * Returns ISO 639-3-ish codes matching the generator's set, or
    * "und" (undetermined) when no evidence. */
  def predictLang(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk = 0
    var total = 0
    var i = 0
    val n = math.min(text.length, 4000)
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) {
        total += 1
        val block = Character.UnicodeBlock.of(c)
        if (block == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
            block == Character.UnicodeBlock.HIRAGANA ||
            block == Character.UnicodeBlock.KATAKANA) cjk += 1
      }
      i += 1
    }
    if (total > 0 && cjk.toDouble / total > 0.25) return "zho"
    val words = text.toLowerCase(java.util.Locale.ROOT).split("[^\\p{L}]+").iterator.filter(_.nonEmpty).take(400)
    val counts = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var nWords = 0
    words.foreach { w =>
      nWords += 1
      stopwords.foreach { case (lang, set) => if (set.contains(w)) counts(lang) += 1 }
    }
    if (nWords == 0) return "und"
    val (best, hits) = if (counts.isEmpty) ("und", 0) else counts.maxBy { case (l, c) => (c, l) }
    if (hits.toDouble / nWords < 0.03) "und" else best
  }

  def withPredictedLang(df: DataFrame, textCol: String = "text",
                        outCol: String = "predicted_lang"): DataFrame = {
    val spark = df.sparkSession
    val fn = udf((t: String) => predictLang(t))
    df.withColumn(outCol, fn(col(textCol)))
  }

  /** DuckDB mirror of [[predictLang]], generated from the SAME
    * [[stopwords]] table (the EntityOracle pattern: one rule source
    * emits both engines, so the lists cannot drift). `sourceRel` must
    * provide (url, lang, t). Semantics mirrored step by step: CJK
    * letter-ratio over the first 4000 chars (the exact UnicodeBlock
    * ranges), else stopword hit-rates over the first 400 `[^\p{L}]+`-
    * split lowercased words, argmax with the kernel's (count, lang)
    * tie-break via a sorted struct list, 0.03 evidence floor. Safe
    * because the corpus is BMP-only (Java UTF-16 units = code points)
    * and ASCII/Latin-1 cased (per-char toLowerCase = lower()). */
  def langIdOracleSql(sourceRel: String): String = {
    val langs = stopwords.keys.toSeq.sorted
    def lit(ws: Set[String]) =
      ws.toSeq.sorted.map(w => "'" + w.replace("'", "''") + "'").mkString("[", ",", "]")
    val hitCols = langs.map(l =>
      s"len(list_filter(wl, w -> list_contains(${lit(stopwords(l))}, w))) AS c_$l").mkString(",\n    ")
    val structs = langs.map(l => s"struct_pack(c := c_$l, l := '$l')").mkString(",\n      ")
    s"""WITH base AS (
       |  SELECT url, lang, t AS text FROM $sourceRel
       |), feat AS (
       |  -- n_cjk counts CJK chars AMONG LETTERS ONLY (strip non-letters
       |  -- first, then keep the block ranges): the kernel classifies via
       |  -- isLetter before the UnicodeBlock check, so block punctuation
       |  -- (katakana middle dot U+30FB, sound marks, U+30A0) must not
       |  -- count toward either side of the ratio
       |  SELECT url, lang,
       |    length(regexp_replace(substring(text, 1, 4000), '[^\\p{L}]', '', 'g')) AS n_letters,
       |    length(regexp_replace(regexp_replace(substring(text, 1, 4000), '[^\\p{L}]', '', 'g'),
       |                          '[^\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{309F}\\x{30A0}-\\x{30FF}]', '', 'g')) AS n_cjk,
       |    list_filter(string_split_regex(lower(text), '[^\\p{L}]+'), x -> x <> '')[1:400] AS wl
       |  FROM base
       |), hits AS (
       |  SELECT url, lang, n_letters, n_cjk, len(wl) AS nw,
       |    $hitCols
       |  FROM feat
       |), best AS (
       |  SELECT url, lang, n_letters, n_cjk, nw,
       |    list_sort([
       |      $structs])[-1] AS b
       |  FROM hits
       |), pred AS (
       |  SELECT url, lang,
       |    CASE WHEN n_letters > 0 AND CAST(n_cjk AS DOUBLE)/n_letters > 0.25 THEN 'zho'
       |         WHEN nw = 0 THEN 'und'
       |         WHEN CAST(b.c AS DOUBLE)/nw < 0.03 THEN 'und'
       |         ELSE b.l END AS predicted_lang
       |  FROM best)
       |SELECT url, lang, predicted_lang, (lang = predicted_lang) AS correct
       |FROM pred""".stripMargin
  }

  /** THE text-family tokenizer (lowercase, split `\s+`, drop empties) —
    * the one Spark rendering of the rule every token-level oracle
    * mirrors as `list_filter(string_split_regex(lower(t), '\s+'),
    * x -> x <> '')`. q8/q69/q70/q72/SpanDedup/LmScore all build on it;
    * a drift between any Spark site and its SQL mirror breaks the
    * hash compare, so the rule lives in exactly one place per engine. */
  def lowerToks(text: Column): Column =
    graft.functions.LowerToksWs(text)

  /** The pre-r6b expression form of [[lowerToks]] — kept as the
    * differential reference the native tokenizer is pinned against
    * (TextKernelSpec). */
  def lowerToksExprForm(text: Column): Column =
    filter(split(lower(text), "\\s+"), x => x =!= "")

  /** Per-document top-tf term candidates, computed ENTIRELY map-side
    * over a token-array attribute named `toks` (r6 optimization, guide
    * §2.3/§2.4): run-length-encode the sorted token array into
    * (term, tf) pairs, then keep every pair whose tf is ≥ the 5th
    * largest tf value in the doc (counting duplicates) — exactly the
    * rows with rank() ≤ k under ORDER BY tf DESC, which is a provable
    * SUPERSET of the final top-k under ANY tie-break refinement
    * (a final top-k row has < k rows strictly greater on tf). q69's
    * old plan shuffled the full corpus-token tf table twice (checkpoint
    * + tf⋈df sort-merge + a corpus-wide ranking window); with this
    * kernel only ~k rows per doc ever reach an exchange.
    *
    * Expression-shape hazards handled (the [[Winnowing.selsExpr]]
    * lessons): every intermediate array is LET-BOUND via
    * `transform(array(x), v -> body)[0]` so alias inlining can't
    * re-evaluate it per element; the empty-token case is guarded
    * before `sequence` (which would run DESCENDING from 0 to -1); all
    * element accesses are index-guarded for ANSI mode. */
  /** Exact per-document word counts as ONE map-side array expression
    * over a token-array attribute named `toks`: run-length-encode the
    * sorted token array into (term, tf) structs — bit-identical to
    * `groupBy(doc, term).count()` but with zero shuffle (the whole doc
    * lives in its row). The shared RLE core of [[topTfCandidatesExpr]]
    * (q69) and the q105/q107 per-doc word-count rewires. */
  def rlePairsExpr: String =
    """transform(array(array_sort(toks)), st ->
      |  CASE WHEN size(st) = 0 THEN
      |    cast(array() as array<struct<term: string, tf: bigint>>)
      |  ELSE
      |    transform(array(filter(sequence(0, size(st) - 1),
      |        i -> IF(i = 0, true, st[i] != st[i - 1]))), idxs ->
      |      transform(sequence(0, size(idxs) - 1), j ->
      |        named_struct('term', st[idxs[j]],
      |          'tf', cast(IF(j = size(idxs) - 1, size(st),
      |                        idxs[j + 1]) - idxs[j] as bigint)))
      |    )[0]
      |  END
      |)[0]""".stripMargin.replaceAll("\\s+", " ").trim

  def topTfCandidatesExpr(k: Int): String = {
    // pairs = the RLE runs; thr = k-th largest tf (1 when fewer than
    // k distinct terms)
    s"""transform(array($rlePairsExpr), pairs ->
       |  transform(array(IF(size(pairs) <= $k, 1L,
       |      -array_sort(transform(pairs, q -> -q.tf))[${k - 1}])), thr ->
       |    filter(pairs, p -> p.tf >= thr))[0]
       |)[0]""".stripMargin.replaceAll("\\s+", " ").trim
  }

  // ---- quality scoring (pure SQL expressions — codegen'd) -------------

  /** Shallow quality features, Gopher/C4-style: length, token stats,
    * symbol ratios. Pure column expressions (exactly mirrorable in the
    * DuckDB oracle). */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val len = length(text)
    val tokens = filter(split(text, "\\s+"), t => t =!= "")
    val nTokens = size(tokens)
    val digits = length(regexp_replace(text, "[^0-9]", ""))
    val punct = length(regexp_replace(text, "[^.,;:!?]", ""))
    val upper = length(regexp_replace(text, "[^A-Z]", ""))
    Seq(
      "n_chars" -> len,
      "n_tokens" -> nTokens,
      "mean_token_len" -> round((len - (nTokens - 1)).cast("double") / nTokens, 4),
      "digit_ratio" -> round(digits.cast("double") / len, 6),
      "punct_ratio" -> round(punct.cast("double") / len, 6),
      "upper_ratio" -> round(upper.cast("double") / len, 6)
    )
  }

  /** Composite quality score in [0,1]: penalize very short docs, digit
    * soup, punctuation soup. Deterministic, SQL-expressible. */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val digits = length(regexp_replace(text, "[^0-9]", "")).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    val lenScore = least(len / lit(500.0), lit(1.0))
    val digitPenalty = greatest(lit(0.0), lit(1.0) - digits / len * 5)
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punct / len * 5)
    round(lenScore * digitPenalty * punctPenalty, 6)
  }

  // ---- token counting ---------------------------------------------------

  /** Whitespace token count (SQL-expressible). */
  def wsTokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => t =!= ""))

  /** BPE-ish subword count: GPT-2-style pre-tokenizer regex (public:
    * contractions | letter-runs | digit-runs | symbol-runs), each run
    * contributing ceil(len/4) subwords — a deterministic stand-in for a
    * real BPE vocab (none ships in this sandbox). */
  private val bpePattern = java.util.regex.Pattern.compile(
    "'(?:s|t|re|ve|m|ll|d)|\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]+")

  def bpeishCount(text: String): Int = {
    if (text == null || text.isEmpty) return 0
    val m = bpePattern.matcher(text)
    var n = 0
    while (m.find()) {
      val len = m.end() - m.start()
      n += (len + 3) / 4
    }
    n
  }

  def withTokenCounts(df: DataFrame, textCol: String = "text"): DataFrame = {
    val bpeUdf = udf((t: String) => bpeishCount(t))
    df.withColumn("ws_tokens", wsTokenCount(col(textCol)))
      .withColumn("bpeish_tokens", bpeUdf(col(textCol)))
  }

  // ---- fingerprinting ---------------------------------------------------

  /** Rolling (Rabin-Karp) 64-bit fingerprint over the normalized text:
    * lowercase, whitespace collapsed — robust to formatting noise,
    * order-sensitive (unlike bag-of-shingles). Hex string output. */
  def fingerprint(text: String): String = {
    if (text == null) return "0" * 16
    var h = 0xcbf29ce484222325L
    var prevSpace = false
    var i = 0
    while (i < text.length) {
      val c0 = text.charAt(i)
      val isSpace = Character.isWhitespace(c0)
      if (isSpace) prevSpace = true
      else {
        if (prevSpace && h != 0xcbf29ce484222325L) { h ^= ' '; h *= 0x100000001b3L }
        prevSpace = false
        val c = Character.toLowerCase(c0)
        h ^= c
        h *= 0x100000001b3L
      }
      i += 1
    }
    f"$h%016x"
  }

  def withFingerprint(df: DataFrame, textCol: String = "text"): DataFrame = {
    val fn = udf((t: String) => fingerprint(t))
    df.withColumn("fingerprint", fn(col(textCol)))
  }
}
