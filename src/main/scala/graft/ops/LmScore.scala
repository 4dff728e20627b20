package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-self-trained bigram language-model scoring — the standard
  * statistical-quality signal of web-corpus pipelines (CCNet / Wenzek
  * et al. 2020 score documents against a KenLM n-gram model; Gopher and
  * RefinedWeb gate on the same idea): a document whose token
  * transitions are IMPROBABLE under the corpus's own bigram statistics
  * is gibberish, boilerplate soup, or wrong-language residue. Training
  * the model ON the corpus itself keeps the operator self-contained —
  * no external model file.
  *
  * Scale shape — the two halves have DIFFERENT shapes, like a real LM
  * pipeline:
  *
  *  - TRAIN: one map-side-combinable groupBy builds the bigram count
  *    table (the only corpus-sized exchange), a vocabulary-sized
  *    groupBy folds it to LHS margins, and counts below `minCount`
  *    are PRUNED — KenLM-style pruning is what makes n-gram models
  *    fit in memory at any corpus size, and it is what makes the next
  *    step honest.
  *  - SCORE: the pruned model + margins BROADCAST (exactly as the
  *    KenLM binary ships to every worker node); each doc's bigrams
  *    stream map-side through two broadcast-hash lookups, and the only
  *    exchange is the skinny per-doc aggregate. The scoring corpus
  *    never shuffles — at 100 TB that is the whole ballgame.
  *
  * All arithmetic is INTEGER fixed-point (micros), the house rule for
  * oracle-exact scores (same as q70's exact-integer PMI): per bigram
  * occurrence, the add-one-smoothed conditional probability
  *
  *   p_micros(a→b) = (c'(a,b) + 1) · 1_000_000 div (c(a,·) + V)
  *
  * where c'(a,b) is the PRUNED corpus bigram count (0 when pruned or
  * unseen — add-one smoothing is what gives pruned mass a floor),
  * c(a,·) = Σ_b c(a,b) the unpruned LHS margin, and V the number of
  * distinct LHS contexts (the Laplace event-space constant; using the
  * margin table's cardinality keeps the train pass to exactly one
  * corpus-sized exchange). Integer div is order-independent and
  * bit-identical in every engine, so the DuckDB oracle re-trains and
  * re-scores exactly; a float cross-entropy would hash-diverge on
  * libm's ln. Downstream ranking is monotone in the score either way.
  */
object LmScore {

  private def toks(textCol: String) = TextStats.lowerToks(col(textCol))

  /** Exploded bigram occurrences: (idCol, a, b) — map-side only. */
  def bigramOccurrences(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), toks(textCol).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] as a, toks[i+1] as b))")).as("p"))
      .select(col(idCol), col("p.a").as("a"), col("p.b").as("b"))

  /** Per-doc LM score: (idCol, n_bigrams, sum_p_micros, avg_p_micros).
    * High avg = fluent under the corpus model; low = surprising. Docs
    * with < 2 tokens are absent (no bigrams, both engines agree).
    * `precomputedBi` skips the training pass when the (a, b, n_ab)
    * count table is already materialized (the shared token-family
    * dump) — the standard train-once / score-many split.
    *
    * r6 (guide §1.2 step 1 + §2.4): the SCORE pass used to explode
    * every bigram occurrence (37.6M struct rows at sf0.1) through TWO
    * broadcast hash joins and a per-doc aggregation exchange. The
    * pruned model + margins are vocabulary-sized (72k + 236k rows at
    * sf0.1) and were already collected to the driver by the two
    * BroadcastExchanges — so collect them explicitly, fold them into
    * ONE composite broadcast table ([[graft.functions.LmModel]]:
    * context → (margin, pruned-RHS slice)), and score each document
    * map-side inside a single native expression
    * ([[graft.functions.LmDocScore]]). The scoring plan is now a pure
    * scan-project with ZERO exchanges and one hash probe per
    * occurrence; arithmetic is unchanged exact integer, so outputs are
    * bit-identical (OpsSpec differential + the untouched DuckDB
    * oracle). */
  def score(df: DataFrame, idCol: String, textCol: String,
            minCount: Int = 5,
            precomputedBi: Option[DataFrame] = None): DataFrame = {
    val spark = df.sparkSession
    // TRAIN: the one corpus-sized exchange, then vocabulary-sized tables
    val bi = precomputedBi.getOrElse(
      bigramOccurrences(df, idCol, textCol)
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab")))
    // ONE model-sized collect (the KenLM-binary analog; the previous
    // plan's BroadcastExchanges pulled the same rows through the
    // driver): margins fold driver-side from the bigram table itself —
    // a second aggregate job + second collect bought nothing
    val biRows = bi.select(col("a"), col("b"), col("n_ab")).collect()
    val marginMap = new java.util.LinkedHashMap[String, Array[Long]]()
    biRows.foreach { r =>
      val a = r.getString(0)
      var cell = marginMap.get(a)
      if (cell == null) { cell = Array(0L, 0L); marginMap.put(a, cell) }
      val n = r.getLong(2)
      cell(0) += n                          // n_a margin
      if (n >= minCount) cell(1) += 1L      // pruned-slice size
    }
    val nCtx = marginMap.size
    val aKeys = new Array[String](nCtx)
    val nA = new Array[Long](nCtx)
    val bOff = new Array[Int](nCtx + 1)
    val idx = new java.util.HashMap[String, Integer](nCtx * 2)
    var i = 0
    val mit = marginMap.entrySet().iterator()
    while (mit.hasNext) {
      val e = mit.next()
      aKeys(i) = e.getKey
      nA(i) = e.getValue()(0)
      bOff(i + 1) = bOff(i) + e.getValue()(1).toInt
      idx.put(aKeys(i), Integer.valueOf(i))
      i += 1
    }
    val cursor = java.util.Arrays.copyOf(bOff, nCtx)
    val nPruned = bOff(nCtx)
    val bKeys = new Array[String](nPruned)
    val nAb = new Array[Long](nPruned)
    biRows.foreach { r =>
      if (r.getLong(2) >= minCount) {
        val j = idx.get(r.getString(0)).intValue
        val c = cursor(j)
        bKeys(c) = r.getString(1)
        nAb(c) = r.getLong(2)
        cursor(j) = c + 1
      }
    }
    val bc = spark.sparkContext.broadcast(
      new graft.functions.LmModel(aKeys, nA, bOff, bKeys, nAb, nCtx.toLong))
    // SCORE: zero-exchange map-side walk, one probe per occurrence.
    // The explode is load-bearing: GenerateExec is the CollapseProject
    // barrier that keeps the document scored ONCE (see LmDocScore's
    // Scaladoc), and the empty array reproduces the inner-join drop.
    df.select(col(idCol),
        explode(graft.functions.LmDocScore(toks(textCol), bc)).as("s"))
      .select(col(idCol),
        col("s.n_bigrams").as("n_bigrams"),
        col("s.sum_p_micros").as("sum_p_micros"),
        col("s.avg_p_micros").as("avg_p_micros"))
  }

  /** DuckDB mirror of [[score]]: same tokenizer, same bigram
    * enumeration, same pruning threshold, same integer div (`//`).
    * `docsRel` must expose (doc_id, t). */
  def scoreSql(docsRel: String, minCount: Int = 5): String =
    s"""WITH tl AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(t), '\\s+'), x -> x <> '') AS toks
       |  FROM $docsRel),
       |occ AS (
       |  SELECT doc_id, p.a AS a, p.b AS b
       |  FROM (
       |    SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
       |      i -> struct_pack(a := toks[i], b := toks[i + 1]))) AS p
       |    FROM tl WHERE len(toks) >= 2)),
       |bi AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab FROM occ GROUP BY 1, 2),
       |margin AS (SELECT a, CAST(sum(n_ab) AS BIGINT) AS n_a FROM bi GROUP BY 1),
       |pruned AS (SELECT a, b, n_ab FROM bi WHERE n_ab >= $minCount),
       |vocab AS (SELECT CAST(count(*) AS BIGINT) AS v FROM margin),
       |scored AS (
       |  SELECT occ.doc_id,
       |    ((coalesce(pruned.n_ab, 0) + 1) * 1000000) // (margin.n_a + vocab.v) AS p_micros
       |  FROM occ
       |  LEFT JOIN pruned USING (a, b)
       |  JOIN margin USING (a)
       |  CROSS JOIN vocab)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_bigrams,
       |  CAST(sum(p_micros) AS BIGINT) AS sum_p_micros,
       |  CAST(sum(p_micros) // count(*) AS BIGINT) AS avg_p_micros
       |FROM scored GROUP BY doc_id""".stripMargin

  /** CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3): per
    * language, rank documents by LM score and cut the corpus into
    * fluency tertiles — "head" is the most-fluent third (lowest
    * perplexity = highest avg bigram probability here), the slice
    * CCNet ships to LM training first.
    *
    * Thresholds are EXACT order statistics, not interpolated
    * percentiles: t1 = the k1-th largest score (k1 = ceil(n/3)),
    * t2 = the k2-th largest (k2 = ceil(2n/3)); a doc is head when
    * score ≥ t1, middle when t2 ≤ score < t1, else tail. Ties at a
    * threshold go to the better bucket on BOTH engines (pure integer
    * compares — an interpolated float percentile would hash-diverge at
    * the boundary).
    *
    * Scale shape (100 TB): avg_p_micros lives in [0, 1_000_000], so the
    * per-(lang, score) histogram this builds is BOUNDED at ~1e6 rows
    * per language no matter the corpus size — exact corpus-wide
    * thresholds with no global sort and no sampling compromise
    * (CCNet itself samples; the bounded-domain trick makes exactness
    * free). One map-side-combinable groupBy builds the histogram, one
    * window cumsum over the bounded table ranks it, the per-language
    * threshold row BROADCASTS back, and the corpus streams map-side
    * through the bucket compare. The only corpus-sized exchange is the
    * final (lang, bucket) roll-up — skinny and combinable.
    *
    * @param perDoc (lang, score, weight) — one row per document; score
    *               an integer micros fluency (higher = more fluent),
    *               weight summed per bucket (e.g. n_bigrams → token
    *               mass per tertile, the number CCNet reports)
    */
  def tertileBuckets(perDoc: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = perDoc.groupBy(col("lang"), col("score")).agg(count(lit(1)).as("c"))
    val desc = Window.partitionBy(col("lang")).orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col("lang"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // cum = #docs with score >= this row's score (scores distinct per lang)
    val thr = hist
      .withColumn("cum", sum(col("c")).over(desc))
      .withColumn("n", sum(col("c")).over(all))
      .withColumn("k1", expr("(n + 2) div 3"))
      .withColumn("k2", expr("(2 * n + 2) div 3"))
      .groupBy(col("lang"))
      .agg(
        max(when(col("cum") >= col("k1"), col("score"))).as("t1_micros"),
        max(when(col("cum") >= col("k2"), col("score"))).as("t2_micros"))
    perDoc
      .join(broadcast(thr), Seq("lang"))
      .withColumn("bucket",
        when(col("score") >= col("t1_micros"), lit("head"))
          .when(col("score") >= col("t2_micros"), lit("middle"))
          .otherwise(lit("tail")))
      .groupBy(col("lang"), col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("weight")).as("weight_sum"),
        min(col("score")).as("min_score"),
        max(col("score")).as("max_score"),
        max(col("t1_micros")).as("t1_micros"),
        max(col("t2_micros")).as("t2_micros"))
  }
}
