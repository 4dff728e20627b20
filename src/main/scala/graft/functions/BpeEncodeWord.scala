package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Apply a trained BPE merge list to ONE word, as a native expression:
  * `string` → `array<string>` of the word's final subword tokens —
  * semantically identical to [[graft.ops.Bpe]]'s per-round window
  * pipeline (char long-form, then per merge: pm/mark/dropped with the
  * first-of-chain rule), but evaluated per word in one call instead of
  * R window rounds over the corpus-wide long form (each round cost an
  * exchange + sort of every (word, pos, tok) row; the merge list is R
  * driver-side rows, so the application is a pure function of the word
  * — guide §1.2 step 1: the iteration belongs inside the row, not in
  * the job graph). Scope is the house `[a-z]+` word universe; the
  * merge rule is replicated exactly:
  *
  *   pm(i)   = tok(i)==l && tok(i+1)==r        (false at the last pos)
  *   mark(i) = pm(i) && !pm(i-1)
  *   drop(i) = mark(i-1); surviving marked positions concat tok·nxt
  *
  * Differential-pinned against the window form in OpsSpec/TextKernelSpec
  * and value-checked end-to-end by the q85/q86/q105/q107 oracles,
  * which re-derive training AND application in unrolled SQL. */
case class BpeEncodeWord(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpeEncodeWord expects string, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val w = child.eval(input).asInstanceOf[UTF8String]
    if (w == null) return null
    val out = BpeEncodeWord.encode(w.toString, merges)
    new GenericArrayData(out.map(t => UTF8String.fromString(t): Any).toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeWord =
    copy(child = newChild)
}

object BpeEncodeWord {

  /** The sequential reference form of the merge application (shared by
    * the expression above and [[graft.ops.Bpe]]'s driver-side
    * trainer): split to chars, apply each merge in order with the
    * first-of-chain rule. */
  def encode(word: String, merges: Seq[(String, String)]): Array[String] = {
    // split(word, "") drops no chars and yields one UTF-16 unit per
    // element for the BMP inputs in scope; filter("") mirrors the old
    // longForm's empty-drop
    var toks: Array[String] = word.split("").filter(_.nonEmpty)
    merges.foreach { case (l, r) =>
      if (toks.length >= 2) toks = mergeOnce(toks, l, r)
    }
    toks
  }

  /** One merge round over a token array — pm/mark/drop exactly as the
    * window pipeline computes them. */
  def mergeOnce(toks: Array[String], l: String, r: String): Array[String] = {
    val n = toks.length
    val out = new scala.collection.mutable.ArrayBuffer[String](n)
    var prevPm = false
    var i = 0
    while (i < n) {
      val pm = i + 1 < n && toks(i) == l && toks(i + 1) == r
      val mark = pm && !prevPm
      if (mark) {
        out += toks(i) + toks(i + 1)
        // the merged-away partner (position i+1) is dropped; its pm
        // state still feeds the NEXT position's chain rule, exactly
        // like the window's lag(pm) over the pre-merge positions
        val pmNext = i + 2 < n && toks(i + 1) == l && toks(i + 2) == r
        prevPm = pmNext
        i += 2
      } else {
        out += toks(i)
        prevPm = pm
        i += 1
      }
    }
    out.toArray
  }

  import org.apache.spark.sql.graftshim.ColumnBridge
  def apply(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeWord(ColumnBridge.expression(word), merges))
}
