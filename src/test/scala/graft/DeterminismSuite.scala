package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Registry

/** Tier C (SURVEY §5.2): every declared query must produce IDENTICAL rows
  * at 1 and 4 shuffle partitions — the cheap local proxy for the driver's
  * byte-level hash-match. Any partition-order sensitivity (unsorted
  * collect_list, double-sum ordering, nondeterministic winner in a tie)
  * shows up here before it zeroes a CORRECTNESS row.
  */
class DeterminismSuite extends AnyFunSuite {

  Registry.all.foreach { op =>
    test(s"${op.name} is partition-count invariant") {
      val s = TestSpark.spark
      s.conf.set("spark.sql.shuffle.partitions", "1")
      val r1 = op.build(s, TestSpark.Sf0001).collect().toSeq
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val r4 = op.build(s, TestSpark.Sf0001).collect().toSeq
      // (empty results are legitimate at sf0.001 for highly selective
      // filters; non-emptiness at the graded sf0.01 is the oracle's job)
      assert(r1 == r4, s"${op.name} differs between 1 and 4 partitions")
    }
  }
}
