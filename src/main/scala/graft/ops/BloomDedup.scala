package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter incremental dedup — the CONSTANT-MEMORY scale path for
  * "is this batch doc already in the 10^12-row corpus?".
  *
  * The reference's worker answers that question one document at a time
  * with a per-document existence check before doing work
  * (/root/reference/ocrworker/tasks.py:176, the skip-if-present
  * download guard); our
  * join-based analog (q63, [[Dedup.incrementalCandidates]]) shuffles
  * batch∪corpus band rows. At 10^12 corpus rows even the band join's
  * bounded fan-out pays a corpus-wide scan+shuffle per batch; the Bloom
  * pre-filter replaces that with one corpus pass that folds into a
  * fixed-size bitset (map-side partial per partition, OR-merge — the
  * treeAggregate shape Spark's own `DataFrameStatFunctions.bloomFilter`
  * uses) which is then broadcast, so a batch is filtered with ZERO
  * shuffle and only definite-maybes proceed to exact verification.
  *
  * Everything here is deterministic and engine-portable by
  * construction: the key is md5 (bit-identical builtin in Spark AND
  * DuckDB) of the q37-normalized text, and the K bit positions are
  * NON-OVERLAPPING 20-bit slices of the 128-bit digest (md5's slices
  * are independent uniform bits, so slicing is the
  * Kirsch–Mitzenstadt construction with the i-th hash read straight
  * off the digest — no second hash family needed, no UDF: md5 +
  * substring + conv are all codegen'd builtins). 6 slices × 20 bits =
  * 120 ≤ 128 digest bits, each position already < MBits so no modulo.
  *
  * Sizing at scale: false-positive rate ≈ (1 − e^{−Kn/m})^K; holding
  * n/m ≈ 0.057 (the test ratio) gives FP ≈ 3e-8. For n = 10^9 corpus
  * keys at the same ratio m = 2^34 bits = 2 GiB — past comfortable
  * broadcast, which is exactly when you shard the filter by
  * `pos / shardBits` into an executor-partitioned bitmap and route
  * batch probes by the same key (the relational form below IS that
  * routing, with the bitset materialized as a distinct-position
  * table). Both forms are implemented and proven equivalent in
  * BloomDedupSpec.
  */
object BloomDedup {

  /** Bits in the filter (2^20). Positions are 5-hex-char (20-bit)
    * digest slices, so every position is already in [0, MBits). */
  val MBits: Int = 1 << 20

  /** Number of digest slices (hash functions). 6×5 hex chars = 30 of
    * md5's 32 hex chars. */
  val K: Int = 6

  /** q37's normalization: lowercase, whitespace collapsed. */
  def keyCol(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** The i-th bit position: 20-bit slice i of the md5 hex digest.
    * conv(hex,16,10) returns a decimal string; the value is < 2^20 so
    * the int cast is exact. */
  def posCol(key: Column, i: Int): Column =
    conv(substring(key, 1 + i * 5, 5), 16, 10).cast("int")

  /** (id, pos) rows — K per doc (duplicate positions per doc possible
    * when two slices coincide; membership logic below is set-based so
    * duplicates are harmless, matching bitset semantics). */
  def positions(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val key = keyCol(col(textCol))
    docs.select(col(idCol).as("id"),
        explode(array((0 until K).map(posCol(key, _)): _*)).as("pos"))
  }

  // ---- bitset form (the broadcast artifact) ----------------------------

  /** Typed OR-merge aggregator: each partition folds its positions into
    * a local bitset (map-side partial), partials merge by OR — one
    * corpus pass, fixed 128 KiB buffer at MBits = 2^20. */
  class BitsetAgg extends Aggregator[Int, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](MBits / 64)
    def reduce(b: Array[Long], pos: Int): Array[Long] = {
      b(pos >>> 6) |= 1L << (pos & 63); b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Build the corpus bitset (collected to the driver for broadcast —
    * 128 KiB at MBits = 2^20). */
  def buildBitset(corpus: DataFrame, idCol: String, textCol: String): Array[Long] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    positions(corpus, idCol, textCol).select(col("pos").as[Int])
      .select(new BitsetAgg().toColumn).head()
  }

  @inline def testBit(bits: Array[Long], pos: Int): Boolean =
    (bits(pos >>> 6) & (1L << (pos & 63))) != 0L

  /** Bitset-side membership: true iff ALL K positions are set. */
  def maybeInBitset(bits: Array[Long], positionsOfDoc: Seq[Int]): Boolean =
    positionsOfDoc.forall(testBit(bits, _))

  // ---- relational form (the oracle-checkable query surface) ------------

  /** Per batch doc: `bloom_maybe` (all K digest-slice positions present
    * in the corpus position set — the Bloom verdict, relationally) and
    * `is_dup_exact` (key-level ground truth). The corpus position side
    * collapses to ≤ min(K·|corpus|, MBits) distinct int rows —
    * broadcast-able at any corpus size, so the only wide exchange is
    * the batch's own groupBy(id) — and the exact-membership probe is
    * CONFINED to the bloom-maybe rows: Bloom has no false negatives
    * (is_dup_exact ⇒ bloom_maybe by construction), so definite-news
    * skip the key join entirely and get is_dup_exact = false for free.
    * That prune is the whole point at 10^12 corpus rows, where
    * corpus_keys no longer broadcasts and the exact probe becomes a
    * shuffle join whose probe side Bloom shrinks to the (rare) maybes.
    *
    * Scope boundary: the key is the EXACT normalized text, so this
    * gates exact membership only — it must never pre-filter the
    * MinHash near-dup rung ([[Dedup.incrementalCandidates]]): a doc
    * with no exact match can still have near-duplicates. */
  def maybeDup(corpus: DataFrame, batch: DataFrame,
               idCol: String, textCol: String): DataFrame = {
    val corpusPos = positions(corpus, idCol, textCol).select("pos").distinct()
    val corpusKeys = corpus.select(keyCol(col(textCol)).as("k")).distinct()
    val batchKeyed = batch.select(col(idCol).as("id"), keyCol(col(textCol)).as("k"))
    val verdict = positions(batch, idCol, textCol)
      .join(broadcast(corpusPos.withColumn("hit", lit(1))), Seq("pos"), "left")
      .groupBy("id")
      .agg((countDistinct(col("pos")) ===
        countDistinct(when(col("hit").isNotNull, col("pos")))).as("bloom_maybe"))
      .join(batchKeyed, Seq("id"))
    val maybes = verdict.filter(col("bloom_maybe"))
      .join(broadcast(corpusKeys.withColumn("dup", lit(1))), Seq("k"), "left")
      .select(col("id"), col("bloom_maybe"), col("dup").isNotNull.as("is_dup_exact"))
    val news = verdict.filter(!col("bloom_maybe"))
      .select(col("id"), col("bloom_maybe"), lit(false).as("is_dup_exact"))
    maybes.unionByName(news)
  }
}
