package graft.nlp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spark surface of the entity matcher — the analog of the reference's
  * second mapPartitions stage over extraction output (form/metadata
  * pipeline, /root/reference/ocrworker/form_tasks.py:176-228): same
  * scan, extra columns. Rules live in [[EntityMatcher]] (compiled once
  * per JVM; the executor-singleton analog of the reference's cached
  * engines, /root/reference/ocrworker/engines/factory.py:9-13).
  */
object EntityStage {

  private val matchUdf = udf((t: String) => EntityMatcher.matchEntities(t))
  private val fieldsUdf = udf((t: String) => EntityMatcher.assignFields(EntityMatcher.matchEntities(t)))

  /** entities: ARRAY<STRUCT<text,label,start,end,confidence,normalized,rule>> */
  def withEntities(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("entities", matchUdf(col(textCol)))

  /** First-match-wins field map per document (A7 semantics). */
  def withFields(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fields", fieldsUdf(col(textCol)))

  /** Flat entity table (G4: one row per entity). */
  def explodeEntities(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withEntities(df, textCol)
      .select(col(idCol), explode(col("entities")).as("e"))
      .select(col(idCol), col("e.text").as("text"), col("e.label").as("label"),
        col("e.start").as("start"), col("e.end").as("end"),
        col("e.confidence").as("confidence"), col("e.normalized").as("normalized"),
        col("e.rule").as("rule"))
}
