package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join — for every left row, the most recent right row
  * of the same key with right-time ≤ left-time (the "which crawl
  * snapshot / price / config was in force when this happened" join).
  * Spark has no native ASOF operator; the naive encodings are a range
  * theta-join (O(n·m) nested loop) or a per-left-row window over the
  * joined product — both scale-killers. This is the single-shuffle
  * form: union both sides tagged, ONE window sort per key, carry the
  * latest right payload forward with `last(ignoreNulls)`, keep the
  * left rows. At 10^12 rows the cost is exactly one hash exchange +
  * per-partition sort — the same bound as any groupBy.
  *
  * Right-side ties on (key, time) are resolved BEFORE the union by
  * max(payload struct) — i.e. the greatest first-payload-column wins
  * (document the tie-break by ordering `payload` accordingly); this is
  * what makes the result deterministic and lets the DuckDB oracle
  * mirror it with arg_max + ASOF LEFT JOIN.
  */
object AsOf {

  def joinBackward(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String,
                   payload: Seq[String]): DataFrame = {
    val payloadType = StructType(payload.map(n => right.schema(n)))
    val leftRowType = StructType(left.schema.fields)

    val r = right
      .groupBy(col(rightKey).as("__asof_k"),
        col(rightTime).cast("timestamp").as("__asof_t"))
      .agg(max(struct(payload.map(col): _*)).as("__asof_p"))
      .select(col("__asof_k"), col("__asof_t"), col("__asof_p"),
        lit(false).as("__asof_left"),
        lit(null).cast(leftRowType).as("__asof_row"))

    val l = left.select(col(leftKey).as("__asof_k"),
      col(leftTime).cast("timestamp").as("__asof_t"),
      lit(null).cast(payloadType).as("__asof_p"),
      lit(true).as("__asof_left"),
      struct(left.columns.map(col): _*).as("__asof_row"))

    // right rows sort before left rows at equal time (false < true), so
    // a right row AT the left row's timestamp is visible to it (≤, not <)
    val w = Window.partitionBy("__asof_k")
      .orderBy(col("__asof_t").asc, col("__asof_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l)
      .withColumn("__asof_c", last("__asof_p", ignoreNulls = true).over(w))
      .filter(col("__asof_left"))
      .select(col("__asof_row.*") +: payload.map(n => col("__asof_c").getField(n).as(n)): _*)
  }
}
