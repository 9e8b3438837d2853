package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the scale-critical queries
  * so pushdown / broadcast / codegen regressions are visible at a glance.
  * Usage: sbt "runMain graft.PlanAudit [sfDir] [query...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq(
        "scan_parquet_prune", "scan_parquet_pred", "join_broadcast",
        "join_sortmerge", "join_asof", "agg_pricing_summary",
        "llm_dedup_near", "llm_simsearch_topk", "stream_tumbling")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n======== $n ========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
