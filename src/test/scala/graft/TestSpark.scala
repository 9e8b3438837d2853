package graft

import org.apache.spark.sql.SparkSession

/** One shared session for every suite (the Test JVM is forked once).
  * Mirrors the driver's Verify config: UTC, small shuffle-partition count.
  */
object TestSpark {
  val Sf0001 = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
