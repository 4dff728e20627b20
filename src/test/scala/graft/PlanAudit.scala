package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.job.GraftSession.local("8")
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("q1_pricing_summary", "q4_nation_rollup", "q5_anti_join", "q2_latest_order",
        "q17_cosine_pairs", "q73_span_dedup", "q74_lm_score", "q75_ann_pq", "q76_page_raster")) {
      println(s"########## $q")
      println(SparkEntry.queries(q)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).take(3000))
    }
    spark.stop()
  }
}
