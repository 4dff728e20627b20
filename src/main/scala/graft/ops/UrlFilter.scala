package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level curation filtering — the first rung of the public web-corpus
  * recipes (RefinedWeb §3.1 / Penedo et al. 2023 filter by a domain
  * blocklist plus a word-based URL score before touching any content;
  * C4 drops raw-IP hosts and bad-word urls). Two independent signals:
  *
  *  1. **Domain blocklist** (UT1-style): a host is blocked when it IS a
  *     listed domain or is a SUBDOMAIN of one. The host's candidate
  *     suffixes (`a.b.c` → `a.b.c`, `b.c`) are matched against the list:
  *     [[verdicts]] inlines a SMALL list as a literal array
  *     (`arrays_overlap` — pure codegen'd scalar, zero shuffle, exactly
  *     SQL-mirrorable); [[dropBlocklisted]] is the UT1-scale shape
  *     (millions of domains): explode suffixes → broadcast equi-join →
  *     the corpus never shuffles, only the HIT keys do.
  *
  *  2. **URL word/structure score** (integer, so the oracle mirrors it
  *     exactly): +3 per strict word, +1 per soft word as substrings of
  *     the lowercased url (substring semantics — "alphabet" matching
  *     "bet" is a known property of the published filters, which is why
  *     soft words carry low weight), +3 for a raw-IPv4 host, +2 for a
  *     digit-stuffed host (≥ 8 digits), +1 for an over-long url
  *     (> 160 chars). Blocked at score ≥ [[ScoreThreshold]].
  *
  * Everything in [[verdicts]] is a codegen'd column over `lower(url)` —
  * no UDF — and exactly mirrored by q80's DuckDB SQL.
  */
object UrlFilter {

  val ScoreThreshold = 3

  /** Strict URL words (weight 3) — stand-ins for the adult/fraud
    * families of the published lists. */
  val StrictWords: Seq[String] = Seq("casino", "xxx", "viagra", "escort")

  /** Soft URL words (weight 1). */
  val SoftWords: Seq[String] = Seq("poker", "torrent", "warez", "webcam")

  /** Demo blocklist over the synthetic host universe: the zipfian head
    * hosts plus one never-generated domain (exercises the no-match
    * path). A deployment swaps in the UT1 lists (~4.6M domains) via
    * [[dropBlocklisted]] — the join shape is what matters. */
  val DemoBlocklist: Seq[String] =
    Seq("site-0000.example.org", "site-0001.example.org",
      "site-0002.example.org", "tracker.example.net")

  /** Lowercased host of `url`, port dropped. */
  def host(url: Column): Column =
    substring_index(lower(substring_index(substring_index(url, "/", 3), "://", -1)), ":", 1)

  private val ipv4 = "^[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}$"

  /** The integer word/structure score of `url` (see object doc). */
  def score(url: Column): Column = {
    val lu = lower(url)
    val h = host(url)
    val words =
      StrictWords.map(w => when(lu.contains(w), 3).otherwise(0)) ++
        SoftWords.map(w => when(lu.contains(w), 1).otherwise(0))
    val structure = Seq(
      when(h.rlike(ipv4), 3).otherwise(0),
      when(length(regexp_replace(h, "[^0-9]", "")) >= 8, 2).otherwise(0),
      when(length(url) > 160, 1).otherwise(0))
    (words ++ structure).reduce(_ + _)
  }

  /** All suffix domains of `host` that could appear in a blocklist:
    * the host itself and every parent domain with ≥ 2 labels. */
  def candidateSuffixes(hostCol: Column): Column = {
    val parts = split(hostCol, "\\.")
    transform(sequence(lit(0), size(parts) - 2),
      i => array_join(slice(parts, i + 1, size(parts) - i), "."))
  }

  /** Adds `host`, `score`, `blocklisted`, `blocked`, `reason` to `df` —
    * the verdict/audit surface (q80). The literal-array membership test
    * keeps the whole operator one map-side codegen'd projection; use it
    * for lists up to a few thousand entries. */
  def verdicts(df: DataFrame, urlCol: String,
               blocklist: Seq[String] = DemoBlocklist): DataFrame = {
    val bl = typedlit(blocklist)
    df.withColumn("host", host(col(urlCol)))
      .withColumn("score", score(col(urlCol)))
      .withColumn("blocklisted", arrays_overlap(candidateSuffixes(col("host")), bl))
      .withColumn("blocked", col("blocklisted") || col("score") >= ScoreThreshold)
      .withColumn("reason",
        when(col("blocklisted"), "blocklist")
          .when(col("score") >= ScoreThreshold, "score")
          .otherwise("ok"))
  }

  /** UT1-scale blocklist drop: `blocklistDf` (one `domain` column,
    * millions of rows, still broadcast-able at ~100 MB) semi-joins the
    * EXPLODED suffix keys to find hit urls, and the corpus anti-joins
    * the hits. The corpus itself never shuffles: both joins are
    * broadcast hash joins (the second broadcasts the hit keys, bounded
    * by the blocked population, which a curation run expects to be a
    * small fraction of the corpus). */
  def dropBlocklisted(df: DataFrame, urlCol: String, blocklistDf: DataFrame): DataFrame = {
    val hits = df.select(col(urlCol))
      .withColumn("sfx", explode(candidateSuffixes(host(col(urlCol)))))
      .join(broadcast(blocklistDf.withColumnRenamed(
        blocklistDf.columns.head, "sfx")), Seq("sfx"))
      .select(col(urlCol)).distinct()
    df.join(broadcast(hits), Seq(urlCol), "left_anti")
  }
}
