package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Rolling k-token span digests as ONE native expression:
  * `array<string>` tokens → `array<binary>` of the md5 of every k-token
  * window joined with single spaces — semantically identical to
  *
  *   transform(sequence(1, size(toks)-k+1),
  *     i -> unhex(md5(cast(concat_ws(' ', slice(toks, i, k)) as binary))))
  *
  * but ~4x faster: the higher-order-function pipeline re-materializes a
  * ~60-char UTF8String and a fresh MessageDigest per window (37M
  * windows at sf0.1 ⇒ the q73 bench row was 70% lambda/alloc overhead);
  * here token bytes are fetched once per document and each window
  * streams through ONE thread-local digest with zero intermediate
  * strings. Joining UTF-8 token bytes with 0x20 separators is exactly
  * the UTF-8 encoding of the space-joined string, so digests are
  * bit-identical to the Catalyst form (differential-tested in OpsSpec)
  * and the DuckDB oracle's text-side re-derivation is untouched.
  * CodegenFallback by design: the expression body is already a tight
  * byte loop; codegen would only inline the dispatch. */
case class SpanDigests(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"spanDigests expects array<string>, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return null
    val n = arr.numElements()
    if (n < k) return SpanDigests.Empty
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      // null elements are SKIPPED with their separator, exactly like
      // concat_ws — the lambda form this expression must mirror
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val md = SpanDigests.Md5.get()
    val out = new Array[Any](n - k + 1)
    var s = 0
    while (s <= n - k) {
      md.reset()
      var j = 0
      var first = true
      while (j < k) {
        val t = toks(s + j)
        if (t != null) {
          if (!first) md.update(SpanDigests.Space)
          md.update(t)
          first = false
        }
        j += 1
      }
      out(s) = md.digest()
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SpanDigests =
    copy(child = newChild)
}

object SpanDigests {
  private val Space: Byte = 0x20
  private val Empty = new GenericArrayData(Array.empty[Any])
  private val Md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  import org.apache.spark.sql.graftshim.ColumnBridge
  def apply(toks: Column, k: Int): Column =
    ColumnBridge.column(SpanDigests(ColumnBridge.expression(toks), k))
}
