package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Broadcast bigram LM, the executor-side half of [[graft.ops.LmScore]]:
  * one outer lookup per bigram occurrence resolves BOTH the pruned
  * count and the LHS margin (a KenLM binary shipped to every worker,
  * in miniature). Stored as parallel arrays so the broadcast
  * serializes compactly; the UTF8String-keyed hash table is built
  * lazily ONCE per JVM/deserialization (not per task).
  *
  * Layout: entry i of `aKeys`/`nA` is LHS context i; its pruned RHS
  * slice is `bKeys`/`nAb` in [bOff(i), bOff(i+1)) (empty for contexts
  * with no surviving bigram). `v` is the Laplace event-space constant
  * (the margin table's cardinality = aKeys.length, carried explicitly
  * for clarity). */
final class LmModel(
    val aKeys: Array[String], val nA: Array[Long],
    val bOff: Array[Int], val bKeys: Array[String], val nAb: Array[Long],
    val v: Long) extends Serializable {

  final class Entry(val nA: Long, val bs: java.util.HashMap[UTF8String, java.lang.Long])

  @transient lazy val built: java.util.HashMap[UTF8String, Entry] = {
    val m = new java.util.HashMap[UTF8String, Entry](aKeys.length * 2)
    var i = 0
    while (i < aKeys.length) {
      val lo = bOff(i); val hi = bOff(i + 1)
      val inner =
        if (lo == hi) null
        else {
          val bm = new java.util.HashMap[UTF8String, java.lang.Long]((hi - lo) * 2)
          var j = lo
          while (j < hi) {
            bm.put(UTF8String.fromString(bKeys(j)), java.lang.Long.valueOf(nAb(j)))
            j += 1
          }
          bm
        }
      m.put(UTF8String.fromString(aKeys(i)), new Entry(nA(i), inner))
      i += 1
    }
    m
  }
}

/** Per-document LM scoring as ONE native expression:
  * `array<string>` tokens → 0-or-1-element
  * `array<struct<n_bigrams, sum_p_micros, avg_p_micros>>` under the
  * broadcast [[LmModel]] — semantically identical to exploding every
  * bigram occurrence, inner-joining the margin table on `a`,
  * left-joining the pruned count table on `(a, b)` and summing
  *
  *   p_micros = ((coalesce(n_ab, 0) + 1) * 1000000) div (n_a + v)
  *
  * per document, but with ZERO exchanges and zero per-occurrence
  * allocation: the corpus-sized explode (37.6M struct rows at sf0.1),
  * both broadcast hash joins and the final per-doc aggregation
  * collapse into one array walk with one hash probe per occurrence
  * (the broadcast relations those joins built held the same bytes on
  * the driver already — this moves the lookups out of the join
  * operators, not more data onto the driver). Exact integer
  * arithmetic (including the avg's floor division — operands are
  * non-negative), so the result is bit-identical to the join form
  * (differential-tested in OpsSpec) and the DuckDB oracle is
  * untouched.
  *
  * The array-shaped result is deliberate, twice over: a document with
  * NO surviving occurrence (its every LHS context missing from the
  * margin table — the inner-join drop) returns an EMPTY array, so
  * `explode` reproduces "no output row" with no null-filter; and the
  * consumer must go through `explode`, whose GenerateExec is a
  * CollapseProject BARRIER — referencing the three struct fields in a
  * plain projection would inline this expression into every reference
  * and score each document 4-5x (the guide's §4.4 duplicated-UDF trap;
  * measured 38 s vs 1.4 s at sf0.1). CodegenFallback by design, like
  * [[SpanDigests]]: one eval call does a whole document's work. */
case class LmDocScore(child: Expression, model: Broadcast[LmModel])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("sum_p_micros", LongType, nullable = false),
    StructField("avg_p_micros", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lmDocScore expects array<string>, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return null
    val n = arr.numElements()
    if (n < 2) return LmDocScore.Empty
    val m = model.value.built
    val v = model.value.v
    var cnt = 0L
    var sum = 0L
    var prev: UTF8String = if (arr.isNullAt(0)) null else arr.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (prev != null) {
        val e = m.get(prev)
        if (e != null) {
          var nab = 0L
          if (e.bs != null && cur != null) {
            val x = e.bs.get(cur)
            if (x != null) nab = x.longValue
          }
          sum += ((nab + 1L) * 1000000L) / (e.nA + v)
          cnt += 1L
        }
      }
      prev = cur
      i += 1
    }
    if (cnt == 0L) LmDocScore.Empty
    else new GenericArrayData(Array[Any](
      new GenericInternalRow(Array[Any](cnt, sum, sum / cnt))))
  }

  override protected def withNewChildInternal(newChild: Expression): LmDocScore =
    copy(child = newChild)
}

object LmDocScore {
  private[functions] val Empty = new GenericArrayData(Array.empty[Any])
  import org.apache.spark.sql.graftshim.ColumnBridge
  def apply(toks: Column, model: Broadcast[LmModel]): Column =
    ColumnBridge.column(LmDocScore(ColumnBridge.expression(toks), model))
}
