package graft

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational

/** Compensating gate for the no-oracle `scan_binaryfile` op (the
  * driver's DuckDB session sees fixture views, not the directory, so no
  * portable SQL can re-read the raw files): every emitted length and
  * md5 is recomputed here from java.nio bytes — a stronger check than
  * the oracle hash compare, since it verifies the FULL content byte
  * stream, not a projection of it.
  */
class BinaryIngestSuite extends AnyFunSuite {

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  test("scan_binaryfile manifests match filesystem bytes exactly") {
    val s = TestSpark.spark
    val rows = Relational.scanBinaryfile.build(s, TestSpark.Sf0001).collect()

    val expected = Files.list(Paths.get(TestSpark.Sf0001)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .sortBy(_.getFileName.toString)
    assert(rows.map(_.getString(0)).toSeq ==
      expected.map(_.getFileName.toString).toSeq)

    expected.zip(rows).foreach { case (p, r) =>
      val bytes = Files.readAllBytes(p)
      assert(r.getLong(1) == bytes.length.toLong, s"length of $p")
      val hex = bytes.map("%02X".format(_)).mkString
      assert(r.getString(2) == hex.take(32), s"head_hex of $p")
      assert(r.getString(3) == hex.takeRight(32), s"tail_hex of $p")
      assert(r.getString(4) == md5Hex(bytes), s"md5 of $p")
    }
  }

  test("binary content column stays distributed (per-file input splits)") {
    val s = TestSpark.spark
    val df = s.read.format("binaryFile").option("pathGlobFilter", "*.parquet")
      .load(TestSpark.Sf0001)
    // one fixture dir = 10 files; the scan must expose at least one
    // partition and never more partitions than files
    val parts = df.rdd.getNumPartitions
    assert(parts >= 1 && parts <= 10, s"got $parts partitions")
  }
}
