package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL access to the extraction engine via SparkSessionExtensions
  * (SURVEY.md §4.3's stretch goal): registers
  *
  *   extract_main_text(html BINARY|STRING) -> STRING
  *   cosine_similarity(ARRAY<FLOAT|DOUBLE>, ARRAY<FLOAT|DOUBLE>) -> DOUBLE
  *
  * so `spark.sql("SELECT extract_main_text(html) FROM pages")` works —
  * the SQL-string analog of the reference CLI entry point
  * (/root/reference/ocrworker/cli/ocr.py:12-33).
  *
  * Enable with:
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("extract_main_text"),
      new ExpressionInfo(classOf[ExtractMainText].getName, "extract_main_text"),
      (args: Seq[Expression]) => ExtractMainText(args.head)))
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
  }
}

/** Scalar expression running the full HTML/PDF main-content extraction
  * (payload sniff included). CodegenFallback: the body is a large Scala
  * function, not worth inlining into generated Java — the per-row cost
  * dwarfs the interpreter dispatch. */
case class ExtractMainText(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"extract_main_text needs BINARY or STRING, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v match {
      case b: Array[Byte] => b
      case s: UTF8String => s.getBytes
      case other => other.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }
    val page = graft.core.Page("", new java.sql.Timestamp(0), bytes, "", "")
    UTF8String.fromString(graft.core.Extract(page).extracted_text)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
