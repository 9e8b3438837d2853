package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual queries (N reps each, min reported) so a
  * rewrite can be measured without running the whole Bench suite.
  * Usage: sbt "runMain graft.DevBench <sfDir> <reps> <query...>"
  */
object DevBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val names = if (args.length > 2) args.drop(2).toSeq else Seq("llm_dedup_near")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // absorb JVM/codegen warmup so per-query numbers are comparable
    SparkEntry.queries("agg_global")(spark, sfDir).count()
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val cnt = SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9 -> cnt
      }
      println(f"DEVBENCH $n%-24s min=${times.map(_._1).min}%.3f s  all=${times.map(t => f"${t._1}%.3f").mkString(",")}  rows=${times.head._2}")
    }
    spark.stop()
  }
}
