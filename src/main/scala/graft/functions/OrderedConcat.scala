package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator for ordered within-group concatenation — the UDAF
  * form of the page-stitch contract (A1/A2: append parts in target
  * order, /root/reference/ocrworker/utils.py:30-48). The built-in
  * `array_join(transform(array_sort(collect_list(struct(...)))))`
  * expression is the default; this Aggregator exists for byte-level
  * control of ordering/separators and as the merge-correct partial-agg
  * form (reduce/merge keep buffers unsorted — cheap map-side — and
  * finish sorts once, so shuffle order never leaks into the output).
  */
class OrderedConcat(sep: String)
    extends Aggregator[(Int, String), List[(Int, String)], String] {

  override def zero: List[(Int, String)] = Nil

  override def reduce(b: List[(Int, String)], a: (Int, String)): List[(Int, String)] = a :: b

  override def merge(b1: List[(Int, String)], b2: List[(Int, String)]): List[(Int, String)] =
    b1 ::: b2

  override def finish(b: List[(Int, String)]): String = {
    val sorted = b.sortBy(x => (x._1, x._2))
    val sb = new java.lang.StringBuilder(64)
    var first = true
    sorted.foreach { case (_, s) =>
      if (!first) sb.append(sep)
      sb.append(s)
      first = false
    }
    sb.toString
  }

  override def bufferEncoder: Encoder[List[(Int, String)]] =
    ExpressionEncoder[List[(Int, String)]]()

  override def outputEncoder: Encoder[String] = Encoders.STRING
}
