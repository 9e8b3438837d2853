package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LlmOps
import graft.tables.Tables

/** Gates for llm_dedup_semantic (IVF-bucketed embedding-space near-dup):
  * the candidate mechanism must recover EVERY brute-force pair at the
  * 0.9 cosine threshold on the planted fixture — planted twins sit at
  * cosine ≈ 0.996, so a candidate miss would be an assignment bug, not
  * an approximation artifact. The brute-force baseline is computed
  * driver-side here (test-only, ~520 vectors); the graded op stays
  * fully distributed.
  */
class SemanticDedupSuite extends AnyFunSuite {

  private def vecsWithPlanted(sf: String): Map[Long, Array[Double]] = {
    val base: Map[Long, Array[Double]] =
      Tables.embeddings(TestSpark.spark, sf)
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
        .toMap
    base ++ base.collect { case (id, v) if id % 25 == 0 =>
      (id + 100000L) -> v.map(x => x * 0.9 + 0.01)
    }
  }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("llm_dedup_semantic finds exactly the brute-force >=0.9 pairs (recall 1.0)") {
    val s = TestSpark.spark
    val vecs = vecsWithPlanted(TestSpark.Sf0001)
    val ids = vecs.keys.toSeq.sorted
    val bf = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.size
      if cos(vecs(ids(i)), vecs(ids(j))) >= 0.9
    } yield (ids(i), ids(j))).toSet
    assert(bf.nonEmpty, "fixture should contain planted near-dup pairs")

    val found = LlmOps.llmDedupSemantic.build(s, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == bf,
      s"IVF-bucketed pairs differ from brute force: missing=${bf -- found}, " +
        s"extra=${found -- bf}")
  }

  test("llm_dedup_semantic planted pairs carry cosine in [0.99, 1.0)") {
    val rows = LlmOps.llmDedupSemantic.build(TestSpark.spark, TestSpark.Sf0001)
      .collect()
    assert(rows.forall { r =>
      val c = r.getDouble(2); c >= 0.99 && c < 1.0
    }, "planted near-dups must score high but strictly below 1.0 " +
      "(the verify threshold must be doing real work)")
    // every pair is a planted (id, id+100000) twin on this fixture
    assert(rows.forall(r => r.getLong(1) == r.getLong(0) + 100000L))
  }
}
