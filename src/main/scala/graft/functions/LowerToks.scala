package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The text-family tokenizer `filter(split(lower(text), '\\s+'),
  * x -> x <> '')` as ONE native expression — semantically identical,
  * byte for byte:
  *
  *   - lowercasing calls the SAME `UTF8String.toLowerCase` the
  *     Catalyst `Lower` expression calls, so case mapping cannot
  *     drift;
  *   - Java's `\s` (no UNICODE_CHARACTER_CLASS) is exactly the six
  *     ASCII bytes [ \t\n\x0B\f\r], none of which can appear inside a
  *     UTF-8 multi-byte sequence, so splitting on those BYTES yields
  *     precisely the maximal runs of non-`\s` characters — which is
  *     what split-then-drop-empties produces (leading/adjacent/
  *     trailing separators only ever contribute empty strings, and
  *     the filter removes them).
  *
  * What it removes, per document: the UTF8String→String→
  * Pattern.split→String[]→UTF8String[] round-trip inside the regex
  * `StringSplit`, the intermediate empties, and the per-element
  * INTERPRETED lambda of the higher-order `filter` (ArrayFilter is
  * CodegenFallback — every token paid a closure dispatch). Tokens
  * here are zero-copy slices over one lowered byte array. The
  * tokenizer feeds every text-family operator (LM scoring, BM25,
  * span dedup, winnowing build, BPE counts, keyterms, QA), so this
  * is the shared scan-side floor (guide §1.2 step 2 applied to the
  * hottest per-task kernel). Differential-pinned against the
  * expression form in TextKernelSpec; CodegenFallback by design
  * (one eval does a whole document). */
case class LowerToksWs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  // containsNull matches the split+filter form (StringSplit declares
  // ArrayType(StringType) with the default nullable elements), so
  // downstream schemas — including oracle-compared outputs that carry
  // exploded tokens — are unchanged
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lowerToksWs expects string, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val s = child.eval(input).asInstanceOf[UTF8String]
    if (s == null) return null
    val lower = s.toLowerCase
    val bytes = lower.getBytes
    val n = bytes.length
    // count tokens first so the output array allocates exactly once
    var count = 0
    var i = 0
    var inTok = false
    while (i < n) {
      val ws = LowerToksWs.isWs(bytes(i))
      if (!ws && !inTok) { count += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    if (count == 0) return LowerToksWs.Empty
    val out = new Array[Any](count)
    var k = 0
    i = 0
    while (i < n) {
      if (!LowerToksWs.isWs(bytes(i))) {
        val start = i
        while (i < n && !LowerToksWs.isWs(bytes(i))) i += 1
        out(k) = UTF8String.fromBytes(bytes, start, i - start)
        k += 1
      } else i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): LowerToksWs =
    copy(child = newChild)
}

object LowerToksWs {
  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Java regex `\s` without UNICODE_CHARACTER_CLASS: exactly these
    * six ASCII bytes. */
  @inline private[functions] def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  import org.apache.spark.sql.graftshim.ColumnBridge
  def apply(text: Column): Column =
    ColumnBridge.column(LowerToksWs(ColumnBridge.expression(text)))
}
