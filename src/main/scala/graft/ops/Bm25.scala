package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 retrieval over the extraction corpus — the ranking function
  * behind retrieval-based curation (kNN-LM style data selection, eval
  * decontamination by retrieval, and "find training docs like this
  * query" audits). Robertson/Spärck Jones BM25 with k1 = 1.2, b = 0.75,
  * computed entirely in exact integer micros so the DuckDB oracle can
  * re-derive every score bit-for-bit (the [[Dsir]]/[[LmScore]]
  * fixed-point precedent).
  *
  * Documented deviation (same spirit as DSIR's linearized importance
  * weight): the IDF term drops the logarithm — idf_micros =
  * (1e6·(2(N−df)+1)) div (2·df+1), the RSJ ratio with the ±0.5
  * smoothing cleared to integers. Log is transcendental (not
  * bit-mirrorable across engines); the rational form preserves the
  * rare-term-dominates ordering per term. The tf-saturation half is the
  * textbook formula, exact: tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with
  * dl/avgdl cross-multiplied to (dl·N) div total_len in milli units.
  *
  * 100 TB shape: query terms BROADCAST (a query workload is KBs); the
  * only corpus-sized work is one map-side tokenize whose non-query
  * tokens die inside the token array (a codegen'd literal-set filter
  * before the explode, so they never materialize as rows) — the tf
  * aggregate shuffles only matching (query, term, doc) triples. Corpus stats (N, Σdl) are a 1-row broadcast scalar; df is
  * an aggregate of the tiny tf table; top-k per query is a window over
  * ≤ #queries·matched-docs rows. The corpus text never shuffles.
  *
  * Overflow bound: contrib = idf_micros·sat_micros div 1e6 with
  * idf_micros ≤ 2e6·N and sat_micros ≤ 2.2e6 — exact in a signed Long
  * up to N ≈ 2e6 docs per retrieval scope; larger corpora shard the
  * retrieval scope (the standard sharded-search layout) or widen to
  * DECIMAL(38,0).
  */
object Bm25 {

  /** k1 = 1.2 and b = 0.75 (the BM25 defaults), in milli fixed-point. */
  val K1Milli = 1200L
  val BMilli = 750L

  /** Fixed-point scale of scores. */
  val Micros = 1000000L

  /** Results kept per query. */
  val TopK = 10

  /** The benchmark query workload (terms from the corpus's observed
    * vocabulary; ids are stable oracle keys). */
  val Queries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("data", "stream", "engine"),
    2 -> Seq("document", "extract"),
    3 -> Seq("hash", "join", "merge"))

  /** Top-[[TopK]] docs per query by integer-micros BM25:
    * (query_id, rk, doc_id, score_micros, n_terms_hit). `docs` must
    * provide (idCol: long, textCol: string). */
  def retrieve(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Int, Seq[String])] = Queries,
               topK: Int = TopK): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val qterms = queries.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "term")

    // the ONE corpus-sized pass (r6: it used to run twice — once for
    // the corpus stats, once for the tf explode — because both consumed
    // the lazy tokenize plan): per doc, tokenize, take the length, and
    // keep only the query-matching tokens (a codegen'd literal-set
    // filter INSIDE the array, so non-query tokens never materialize
    // as rows). The surviving (doc_id, dl, matched-tokens) table is
    // ~#docs rows of a few matched terms each — checkpointing it is
    // cheap, and stats + tf then both read it without re-tokenizing.
    val allTerms = queries.flatMap(_._2).distinct
    val slim = docs.select(col(idCol).cast("long").as("doc_id"),
      TextStats.lowerToks(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        filter(col("toks"), t => t.isInCollection(allTerms)).as("mtoks"))
      .localCheckpoint(true)

    // 1-row corpus stats, broadcast (the Balance percentile pattern)
    val stats = slim.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_len"))

    val tf = slim
      .select(col("doc_id"), col("dl"), explode(col("mtoks")).as("term"))
      .join(broadcast(qterms), "term")
      .groupBy(col("query_id"), col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

    // df over the tiny tf table (tf is unique per (query, term, doc))
    val dfreq = tf.groupBy(col("query_id"), col("term"))
      .agg(count(lit(1)).as("df"))

    val contrib = tf
      .join(broadcast(dfreq), Seq("query_id", "term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_micros",
        expr(s"(${Micros}L * (2 * (n_docs - df) + 1)) DIV (2 * df + 1)"))
      .withColumn("norm_milli",
        expr(s"1000L - $BMilli + ($BMilli * dl * n_docs) DIV total_len"))
      .withColumn("sat_micros",
        expr(s"((${1000 + K1Milli}L) * tf * ${Micros}L) DIV " +
          s"(tf * 1000L + ($K1Milli * norm_milli) DIV 1000L)"))
      .withColumn("c", expr(s"(idf_micros * sat_micros) DIV ${Micros}L"))

    val scored = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("score_micros"),
        count(lit(1)).as("n_terms_hit"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micros").desc, col("doc_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("rk"), col("doc_id"),
        col("score_micros"), col("n_terms_hit"))
  }

  /** The DuckDB mirror: same integer arithmetic end to end. `docsRel`
    * must provide (doc_id, text). */
  def retrieveSql(docsRel: String,
                  queries: Seq[(Int, Seq[String])] = Queries,
                  topK: Int = TopK): String = {
    val vals = queries.flatMap { case (qid, ts) =>
      ts.map(t => s"($qid, '${t.replace("'", "''")}')")
    }.mkString(", ")
    s"""WITH q(query_id, term) AS (VALUES $vals),
       |tl AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
       |  FROM $docsRel),
       |perdoc AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM tl),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |                 CAST(sum(dl) AS BIGINT) AS total_len FROM perdoc),
       |toks AS (SELECT doc_id, dl, unnest(toks) AS term FROM perdoc),
       |tf AS (
       |  SELECT q.query_id, q.term, t.doc_id,
       |    CAST(count(*) AS BIGINT) AS tf, max(t.dl) AS dl
       |  FROM toks t JOIN q ON t.term = q.term
       |  GROUP BY 1, 2, 3),
       |dfreq AS (SELECT query_id, term, CAST(count(*) AS BIGINT) AS df
       |          FROM tf GROUP BY 1, 2),
       |contrib AS (
       |  SELECT tf.query_id, tf.doc_id,
       |    ((($Micros * (2 * (s.n_docs - d.df) + 1)) // (2 * d.df + 1))
       |     * ((${1000 + K1Milli} * tf.tf * $Micros)
       |        // (tf.tf * 1000 + ($K1Milli * (1000 - $BMilli
       |             + ($BMilli * tf.dl * s.n_docs) // s.total_len)) // 1000)))
       |    // $Micros AS c
       |  FROM tf JOIN dfreq d USING (query_id, term) CROSS JOIN stats s),
       |scored AS (
       |  SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_micros,
       |    CAST(count(*) AS BIGINT) AS n_terms_hit
       |  FROM contrib GROUP BY 1, 2),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY score_micros DESC, doc_id ASC) AS INTEGER) AS rk
       |  FROM scored)
       |SELECT query_id, rk, doc_id, score_micros, n_terms_hit
       |FROM ranked WHERE rk <= $topK""".stripMargin
  }
}
