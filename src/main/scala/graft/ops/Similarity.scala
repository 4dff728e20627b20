package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (ARRAY<FLOAT>).
  *
  * Two paths, per the training-pipeline contract:
  *  - brute-force cosine top-k — the exactness baseline. Queries are
  *    broadcast (small side), so the join is a BroadcastNestedLoopJoin
  *    over a *single* scan of the corpus; the dot product stays inside
  *    codegen (`zip_with` + `aggregate`, no UDF).
  *  - SRP-LSH bucketed top-k — the 10^12-scale path: sign-random-
  *    projection code per vector (map-side), equi-join on bucket code
  *    (with multi-probe on the query side for recall), cosine only
  *    within buckets. Corpus codes would be precomputed/stored at scale.
  */
object Similarity {

  /** Cosine similarity between two ARRAY<FLOAT/DOUBLE> columns: a
    * native codegen'd Catalyst expression (graft.functions
    * .CosineSimilarity). Double accumulation, sequential left-to-right —
    * bitwise-identical to a single-threaded oracle and to DuckDB's
    * list_cosine_similarity on DOUBLE[]. ~50x faster than the
    * interpreted `aggregate`/`zip_with` higher-order-function form it
    * replaced. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  /** Brute-force top-k: for each query vector, the k nearest corpus
    * vectors by cosine. `queries` must be small (broadcast). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec")))
      .select("query_id", "neighbor_id", "cosine")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  // ---- SRP-LSH ---------------------------------------------------------

  /** Default code width. Rule of thumb: bits ≈ log2(corpus) - 3 so a
    * bucket holds ~8 vectors; at 10^12 rows that's ~37 bits (use more
    * bands/tables there); at unit-test scale 8 bits. */
  val SrpBits = 12

  /** Deterministic random hyperplanes (seeded per table), bits x dim. */
  def hyperplanes(dim: Int, bits: Int = SrpBits, table: Int = 0): Array[Array[Double]] = {
    val rng = new graft.gen.PageGen.Rng(0x5eedL + table * 0x9e3779b97f4a7c15L)
    Array.fill(bits)(Array.fill(dim)(rng.nextDouble() * 2 - 1))
  }

  /** Codes within hamming distance <= radius of `code` (multi-probe). */
  def probeCodes(code: Int, bits: Int, radius: Int): Iterator[Int] = {
    val own = Iterator.single(code)
    val h1 = if (radius >= 1) (0 until bits).iterator.map(b => code ^ (1 << b)) else Iterator.empty
    val h2 = if (radius >= 2)
      (0 until bits).iterator.flatMap(a => (a + 1 until bits).iterator.map(b => code ^ (1 << a) ^ (1 << b)))
    else Iterator.empty
    own ++ h1 ++ h2
  }

  def srpCode(vec: Array[Float], planes: Array[Array[Double]]): Int = {
    var code = 0
    var p = 0
    while (p < planes.length) {
      var dot = 0.0
      val pl = planes(p)
      var i = 0
      val n = math.min(vec.length, pl.length)
      while (i < n) { dot += vec(i) * pl(i); i += 1 }
      if (dot >= 0) code |= (1 << p)
      p += 1
    }
    code
  }

  /** Bucketed ANN with L independent hash tables (the classic LSH
    * recall lever) + hamming-radius multi-probe on the query side.
    * Corpus is coded once per table (at 10^12 scale: precomputed and
    * stored as `(table, code)`-bucketed files so a query only scans
    * its probed buckets); join key is (table, code). */
  def srpTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              bits: Int = SrpBits, probeRadius: Int = 1, tables: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val planes = Array.tabulate(tables)(t => hyperplanes(dim, bits, t))
    val bp = spark.sparkContext.broadcast(planes)

    val codedCorpus = corpus
      .select(col(idCol).cast("string").as("neighbor_id"), col(vecCol).as("c_vec"))
      .as[(String, Array[Float])]
      .mapPartitions { it =>
        val pls = bp.value
        it.flatMap { case (id, v) =>
          pls.indices.iterator.map(t => (id, v, t, srpCode(v, pls(t))))
        }
      }
      .toDF("neighbor_id", "c_vec", "table", "code")

    val codedQueries = queries
      .select(col(idCol).cast("string").as("query_id"), col(vecCol).as("q_vec"))
      .as[(String, Array[Float])]
      .mapPartitions { it =>
        val pls = bp.value
        it.flatMap { case (id, v) =>
          pls.indices.iterator.flatMap { t =>
            probeCodes(srpCode(v, pls(t)), bits, probeRadius).map(pc => (id, v, t, pc))
          }
        }
      }
      .toDF("query_id", "q_vec", "table", "code")

    val scored = codedCorpus.join(broadcast(codedQueries), Seq("table", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec")))
      .select("query_id", "neighbor_id", "cosine")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs (the 5th dedup mode): SRP
    * blocking, exact cosine verify, threshold filter. */
  def cosineNearDups(corpus: DataFrame, threshold: Double,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     bits: Int = SrpBits, probeRadius: Int = 1, tables: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val planes = Array.tabulate(tables)(t => hyperplanes(dim, bits, t))
    val bp = spark.sparkContext.broadcast(planes)
    val coded = corpus
      .select(col(idCol).cast("string").as("id"), col(vecCol).as("vec"))
      .as[(String, Array[Float])]
      .mapPartitions { it =>
        val pls = bp.value
        it.flatMap { case (id, v) =>
          pls.indices.iterator.flatMap { t =>
            val c = srpCode(v, pls(t))
            // one side stays in its home bucket; the probing side fans out
            Iterator.single((id, v, t, c, true)) ++
              probeCodes(c, bits, probeRadius).drop(1).map(pc => (id, v, t, pc, false))
          }
        }
      }
      .toDF("id", "vec", "table", "code", "home")
    val a = coded.filter(col("home"))
      .select(col("table"), col("code"), col("id").as("a_id"), col("vec").as("a_vec"))
    val b = coded.select(col("table"), col("code"), col("id").as("b_id"), col("vec").as("b_vec"))
    a.join(b, Seq("table", "code"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .select(col("a_id"), col("b_id"), cosine(col("a_vec"), col("b_vec")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
