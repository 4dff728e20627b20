package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index construction: block-sharded, delta-encoded posting
  * lists over the extraction corpus — the index-build rung a web-scale
  * pipeline runs after extraction (retrieval audits, decontam probes,
  * anchor/BM25 serving all read postings, not raw text).
  *
  * 100 TB shape:
  *   - postings are sharded by (term, block) where block = doc_id div
  *     blockDocs — the Lucene-segment analog. A stopword with df in the
  *     billions never concentrates in one row or one task: every row
  *     holds at most `blockDocs` ids, so collect_list is bounded by
  *     construction and the skewed-term failure mode of a naive
  *     `groupBy(term)` build cannot occur.
  *   - ONE exchange: per-doc term dedup happens map-side
  *     (array_distinct before the explode), so the (term, block)
  *     aggregate is the only shuffle; partial aggregation folds each
  *     mapper's block-local lists before anything moves.
  *   - gaps not ids: within a block, sorted doc_ids delta-encode (head
  *     absolute, then gaps) — the varint-friendly form an index shard
  *     would serialize. The gaps_md5 digest rides beside the structural
  *     fields so the oracle value-checks the ENCODING, not just counts.
  *
  * All arithmetic is integer (Long ids, Long gaps) and the digest is
  * md5 over the comma-joined decimal string — bit-identical in Spark
  * and DuckDB, so the q88 hash compare is rounding-free.
  */
object Postings {

  /** Bump when shard semantics change — keys the postings dump. */
  val Version = "po1"

  /** The raw (term, block, ids) shard table — ids sorted ascending
    * within the block. This is the materialized index; [[encode]] is
    * its serialized view and [[matchAll]] serves queries from it. */
  def shards(docs: DataFrame, idCol: String, textCol: String,
             blockDocs: Int = 1024): DataFrame = {
    require(blockDocs > 0, "blockDocs must be positive")
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(array_distinct(TextStats.lowerToks(col(textCol)))).as("term"))
      .groupBy(col("term"), expr(s"doc_id div $blockDocs").as("block"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
  }

  /** The delta-encoded shard view: (term, block, n_docs, head_id,
    * last_id, gaps_md5). */
  def encode(shardTable: DataFrame): DataFrame =
    shardTable.select(col("term"), col("block"),
      size(col("ids")).cast("long").as("n_docs"),
      element_at(col("ids"), 1).as("head_id"),
      element_at(col("ids"), -1).as("last_id"),
      md5(array_join(
        expr("transform(ids, (x, i) -> CAST(IF(i = 0, x, x - ids[i-1]) AS STRING))"),
        ",").cast("binary")).as("gaps_md5"))

  /** Build the encoded (term, block) posting-shard table in one pass. */
  def build(docs: DataFrame, idCol: String, textCol: String,
            blockDocs: Int = 1024): DataFrame =
    encode(shards(docs, idCol, textCol, blockDocs))

  /** Conjunctive (boolean AND) retrieval served from a MATERIALIZED
    * shard table: doc_ids containing every query term. The term filter
    * is a literal IN over the shard scan — against a parquet postings
    * dump it pushes down (`PushedFilters: [In(term, ...)]`,
    * PlanSpec-gated), so the read is proportional to the query's
    * posting shards, not the index; the corpus text is never touched.
    * A filtered shard holds each doc at most once per term, so the
    * AND is `count(*) = |terms|` per doc after the explode — one
    * bounded exchange over the probed shards only. */
  def matchAll(shardTable: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    shardTable
      .filter(col("term").isin(terms.distinct: _*))
      .select(col("term"), explode(col("ids")).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"))
      .filter(col("n_terms") === terms.distinct.size)
      .select(col("doc_id"))
  }

  /** POSITIONAL postings: (term, doc_id, positions) with 0-based token
    * offsets sorted ascending — the index form phrase and proximity
    * queries serve from (Lucene's positions stream). Row width is
    * bounded by a term's frequency within ONE document (not its corpus
    * df), so a billion-df stopword still fans out over its documents —
    * the (term, doc) grain is what keeps the build's one exchange
    * skew-safe without the block trick the boolean shards need. */
  def positional(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(TextStats.lowerToks(col(textCol))))
      .withColumnRenamed("col", "term")
      .groupBy(col("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))

  /** Exact phrase retrieval served from a MATERIALIZED positional
    * table: documents containing `terms` at consecutive positions,
    * with the occurrence count per doc. The term filter is a literal
    * IN over the scan (pushes down against a parquet dump), so reads
    * touch only the query terms' rows; each subsequent term joins on
    * doc_id against the first term's exploded occurrences and keeps
    * those where positions[i] contains p + i — k-1 equi-joins over
    * term-bounded tables, never the corpus. */
  def matchPhrase(positionalTable: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.size >= 2, "a phrase needs at least two terms")
    val cand = positionalTable.filter(col("term").isin(terms.distinct: _*))
    var occ = cand.filter(col("term") === terms.head)
      .select(col("doc_id"), explode(col("positions")).as("p"))
    terms.zipWithIndex.drop(1).foreach { case (t, i) =>
      occ = occ
        .join(cand.filter(col("term") === t)
          .select(col("doc_id"), col("positions").as(s"pos_$i")), "doc_id")
        .filter(array_contains(col(s"pos_$i"), col("p") + i))
        .drop(s"pos_$i")
    }
    occ.groupBy(col("doc_id")).agg(count(lit(1)).as("n_occurrences"))
  }
}
