package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BPE tokenizer training (Sennrich et al. 2016, ACL — "Neural Machine
  * Translation of Rare Words with Subword Units"): learn the top-R
  * byte-pair merges from the corpus. The published algorithm trains on
  * the DISTINCT-WORD frequency table, not the corpus: each round counts
  * adjacent symbol pairs weighted by word frequency, merges the argmax
  * pair everywhere, repeats. The merge list IS the tokenizer model.
  *
  * Documented deviation (the [[Dsir]]/[[Bm25]] mirrorability precedent):
  * within a run of identical overlapping pairs (only possible when
  * left == right, e.g. "aaaa" merging (a,a)), greedy left-to-right BPE
  * merges alternate positions; that scan is inherently sequential, so
  * both the count and the merge here take only the FIRST position of
  * each chain (mark(i) = pairmatch(i) ∧ ¬pairmatch(i−1) — a pure
  * window expression, bit-identical in Spark and DuckDB; later rounds
  * pick up the remainder). Outside left==right chains this IS the
  * textbook algorithm. Scope: lowercase ASCII-alpha words (dodges
  * cross-engine unicode char-split edge cases), vocab capped at the
  * top-[[VocabCap]] words by (freq DESC, word ASC) — the standard
  * practice of training on the head vocabulary, deterministic ties.
  *
  * 100 TB shape: ONE corpus-sized exchange (the word count — map-side
  * combinable, output ≤ distinct-word cardinality) followed by R
  * training rounds over the capped vocab in LONG FORM (word, freq, pos,
  * tok) — model-sized work, never corpus-sized, the IVF-centroid
  * pattern. Each round: two window passes + one ≤|pairs| aggregate;
  * the argmax pair is a 1-row driver collect (the model, bytes). The
  * corpus text never shuffles; applying the learned merges corpus-wide
  * would be a map-side encode pass against the broadcast merge table.
  */
object Bpe {

  /** Merge rounds learned (the model size R). */
  val Rounds = 8

  /** Head-vocabulary cap for training (freq DESC, word ASC ties). */
  val VocabCap = 4000

  /** The one corpus-sized exchange: (word, freq) for the training-scope
    * words, capped to the deterministic head vocabulary. */
  def wordCounts(docs: DataFrame, textCol: String,
                 cap: Int = VocabCap): DataFrame =
    docs.select(explode(TextStats.lowerToks(col(textCol))).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word").asc)
      .limit(cap)

  /** Learned merges: (round, lhs, rhs, pair_count). Trains [[Rounds]]
    * rounds (early-stops when no adjacent pair remains). */
  def trainMerges(docs: DataFrame, textCol: String,
                  rounds: Int = Rounds, cap: Int = VocabCap): DataFrame = {
    val spark = docs.sparkSession
    val w = Window.partitionBy(col("word")).orderBy(col("pos"))

    // long form: (word, freq, pos, tok) — vocab-sized from here on
    var lf = wordCounts(docs, textCol, cap)
      .select(col("word"), col("freq"),
        posexplode(filter(split(col("word"), ""), t => t =!= "")))
      .select(col("word"), col("freq"), col("pos").cast("long").as("pos"),
        col("col").as("tok"))
      .localCheckpoint(true)

    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val paired = lf
        .withColumn("nxt", lead(col("tok"), 1).over(w))
        .withColumn("prv", lag(col("tok"), 1).over(w))
      // chain-skip count: position i counts unless pair(i-1) == pair(i)
      // (⟺ prv==tok ∧ tok==nxt — see the deviation note above)
      val best = paired
        .filter(col("nxt").isNotNull &&
          !coalesce(col("prv") === col("tok") && col("tok") === col("nxt"),
            lit(false)))
        .groupBy(col("tok").as("l"), col("nxt").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect() // 1-row model collect per round (bytes)
      if (best.isEmpty) exhausted = true
      else {
        val (bl, br, cnt) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += ((r, bl, br, cnt))
        // merge (bl, br) everywhere: mark first-of-chain matches, fold
        // the right symbol into the left, drop the consumed row,
        // renumber — pure window expressions, mirrored 1:1 in SQL
        lf = paired
          .withColumn("pm", coalesce(
            col("tok") === lit(bl) && col("nxt") === lit(br), lit(false)))
          .withColumn("mark",
            col("pm") && !coalesce(lag(col("pm"), 1).over(w), lit(false)))
          .withColumn("dropped",
            coalesce(lag(col("mark"), 1).over(w), lit(false)))
          .filter(!col("dropped"))
          .select(col("word"), col("freq"),
            row_number().over(w).cast("long").as("pos"),
            when(col("mark"), concat(col("tok"), col("nxt")))
              .otherwise(col("tok")).as("tok"))
          .localCheckpoint(true)
      }
      r += 1
    }

    val schema = StructType(Seq(
      StructField("round", IntegerType, nullable = false),
      StructField("lhs", StringType), StructField("rhs", StringType),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.toList.map(m => Row(m._1, m._2, m._3, m._4)), 1), schema)
  }

  /** The DuckDB mirror: word count + per-round unrolled CTE windows,
    * same chain-skip rule, same (cnt DESC, l, r) argmax. `docsRel` must
    * provide (text). */
  def trainSql(docsRel: String, rounds: Int = Rounds,
               cap: Int = VocabCap): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT word, freq, pos, tok,
         |    lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt,
         |    lag(tok)  OVER (PARTITION BY word ORDER BY pos) AS prv
         |  FROM lf${r - 1}),
         |b$r AS (
         |  SELECT tok AS l, nxt AS r, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM p$r
         |  WHERE nxt IS NOT NULL
         |    AND NOT coalesce(prv = tok AND tok = nxt, FALSE)
         |  GROUP BY 1, 2
         |  ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
         |m$r AS (
         |  SELECT word, freq, pos, tok, nxt,
         |    coalesce(tok = (SELECT l FROM b$r)
         |         AND nxt = (SELECT r FROM b$r), FALSE) AS pm
         |  FROM p$r),
         |mm$r AS (
         |  SELECT *, pm AND NOT coalesce(
         |      lag(pm) OVER (PARTITION BY word ORDER BY pos), FALSE) AS mark
         |  FROM m$r),
         |d$r AS (
         |  SELECT *, coalesce(
         |      lag(mark) OVER (PARTITION BY word ORDER BY pos), FALSE) AS dropped
         |  FROM mm$r),
         |lf$r AS (
         |  SELECT word, freq,
         |    CAST(row_number() OVER (PARTITION BY word ORDER BY pos) AS BIGINT) AS pos,
         |    CASE WHEN mark THEN tok || nxt ELSE tok END AS tok
         |  FROM d$r WHERE NOT dropped)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to rounds).map { r =>
      s"SELECT $r AS round, l AS lhs, r AS rhs, cnt AS pair_count FROM b$r"
    }.mkString("\nUNION ALL ")
    s"""WITH w0 AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(list_filter(
       |          string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS word
       |        FROM $docsRel)
       |  WHERE regexp_full_match(word, '[a-z]+')
       |  GROUP BY 1 ORDER BY freq DESC, word ASC LIMIT $cap),
       |lf0 AS (
       |  SELECT word, freq,
       |    CAST(unnest(range(1, len(cs) + 1)) AS BIGINT) AS pos,
       |    unnest(cs) AS tok
       |  FROM (SELECT word, freq, string_split_regex(word, '') AS cs FROM w0)),
       |$roundCtes
       |$unions""".stripMargin
  }
}
