package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.Tables

/** SURVEY §2.1 capability notes, exercised: partitioned writes with
  * partition pruning on read-back, schema merge across evolving files,
  * and compression codecs. These are the lake-maintenance surfaces a
  * 100 TB deployment leans on (hive-style partition dirs ARE the coarse
  * index; codec choice is a storage/scan tradeoff).
  */
class SinkCapabilitySuite extends AnyFunSuite {

  private lazy val s = TestSpark.spark

  test("partitionBy write creates hive-style dirs and read-back prunes partitions") {
    val dir = Files.createTempDirectory("graft_sink_part_").toString
    val orders = Tables.orders(s, TestSpark.Sf0001)
    orders.write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(dir)

    val statuses = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(statuses.forall(_.startsWith("o_orderstatus=")))

    val back = s.read.parquet(dir)
    assert(back.count() == orders.count())
    // partition pruning: a status filter must actually scan only that
    // partition's files (input_file_name reflects the executed scan;
    // DataFrame.inputFiles would list every partition pre-pruning)
    val fFiles = back.filter(col("o_orderstatus") === "F")
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(fFiles.nonEmpty && fFiles.forall(_.contains("o_orderstatus=F")))
  }

  test("mergeSchema unions evolving file schemas") {
    val dir = Files.createTempDirectory("graft_sink_merge_").toString
    import s.implicits._
    Seq((1L, "x")).toDF("id", "b").write.parquet(s"$dir/v1")
    Seq((2L, 3.5)).toDF("id", "c").write.parquet(s"$dir/v2")
    val merged = s.read.option("mergeSchema", "true")
      .parquet(s"$dir/v1", s"$dir/v2")
    assert(merged.columns.sorted.toSeq == Seq("b", "c", "id"))
    assert(merged.count() == 2)
  }

  test("compression codecs round-trip identically (snappy, zstd, gzip)") {
    val dir = Files.createTempDirectory("graft_sink_codec_").toString
    val src = Tables.nation(s, TestSpark.Sf0001)
    val expected = src.orderBy("n_nationkey").collect().toSeq
    Seq("snappy", "zstd", "gzip").foreach { codec =>
      src.write.mode("overwrite")
        .option("compression", codec).parquet(s"$dir/$codec")
      val back = s.read.parquet(s"$dir/$codec").orderBy("n_nationkey").collect().toSeq
      assert(back == expected, s"codec $codec")
      val ext = if (codec == "gzip") "gz" else codec
      val files = new java.io.File(s"$dir/$codec").listFiles()
        .map(_.getName).filter(_.endsWith(".parquet"))
      assert(files.forall(_.contains(s".$ext.")), s"codec $codec file naming")
    }
  }
}
