package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LlmOps
import graft.tables.Tables

/** SURVEY §2.10 gate for the approximate path: LSH candidate neighbors
  * must cover ≥ 0.8 of the brute-force euclidean top-5 per probe. The
  * brute-force baseline is computed driver-side here (500 vectors —
  * test-only; the graded brute-force op stays fully distributed).
  */
class AnnRecallSuite extends AnyFunSuite {

  test("llm_simsearch_lsh recall >= 0.8 vs brute-force euclidean top-5") {
    val s = TestSpark.spark
    val vecs: Map[Long, Array[Double]] =
      Tables.embeddings(s, TestSpark.Sf0001)
        .collect()
        .map(r => r.getLong(0) ->
          r.getSeq[Float](1).map(_.toDouble).toArray)
        .toMap
    val probes = vecs.keys.filter(_ % 50 == 0).toSeq.sorted
    def dist(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val bf5: Map[Long, Set[Long]] = probes.map { p =>
      p -> vecs.collect { case (id, v) if id != p => (id, dist(vecs(p), v)) }
        .toSeq.sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
    }.toMap

    val lsh: Map[Long, Set[Long]] =
      LlmOps.llmSimsearchLsh.build(s, TestSpark.Sf0001)
        .collect()
        .groupBy(_.getLong(0))
        .map { case (p, rows) => p -> rows.map(_.getLong(1)).toSet }

    val recalls = probes.map { p =>
      val hit = bf5(p).intersect(lsh.getOrElse(p, Set.empty)).size
      hit.toDouble / bf5(p).size
    }
    val recall = recalls.sum / recalls.size
    info(f"mean recall@5 = $recall%.3f over ${probes.size} probes")
    assert(recall >= 0.8, f"LSH recall $recall%.3f below 0.8 gate")
  }

  test("llm_simsearch_ivf recall >= 0.8 vs brute-force euclidean top-5") {
    val s = TestSpark.spark
    val vecs: Map[Long, Array[Double]] =
      Tables.embeddings(s, TestSpark.Sf0001)
        .collect()
        .map(r => r.getLong(0) ->
          r.getSeq[Float](1).map(_.toDouble).toArray)
        .toMap
    val probes = vecs.keys.filter(_ % 50 == 0).toSeq.sorted
    def dist(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val bf5: Map[Long, Set[Long]] = probes.map { p =>
      p -> vecs.collect { case (id, v) if id != p => (id, dist(vecs(p), v)) }
        .toSeq.sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
    }.toMap

    val ivf: Map[Long, Set[Long]] =
      LlmOps.llmSimsearchIvf.build(s, TestSpark.Sf0001)
        .collect()
        .groupBy(_.getLong(0))
        .map { case (p, rows) => p -> rows.map(_.getLong(1)).toSet }

    val recalls = probes.map { p =>
      val hit = bf5(p).intersect(ivf.getOrElse(p, Set.empty)).size
      hit.toDouble / bf5(p).size
    }
    val recall = recalls.sum / recalls.size
    info(f"mean recall@5 = $recall%.3f over ${probes.size} probes (k=32, nprobe=14, 1 Lloyd step)")
    assert(recall >= 0.8, f"IVF recall $recall%.3f below 0.8 gate")
  }

  test("llm_simsearch_pq recall >= 0.8 vs brute-force euclidean top-5") {
    val s = TestSpark.spark
    val vecs: Map[Long, Array[Double]] =
      Tables.embeddings(s, TestSpark.Sf0001)
        .collect()
        .map(r => r.getLong(0) ->
          r.getSeq[Float](1).map(_.toDouble).toArray)
        .toMap
    val probes = vecs.keys.filter(_ % 50 == 0).toSeq.sorted
    def dist(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val bf5: Map[Long, Set[Long]] = probes.map { p =>
      p -> vecs.collect { case (id, v) if id != p => (id, dist(vecs(p), v)) }
        .toSeq.sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
    }.toMap

    val pq: Map[Long, Set[Long]] =
      LlmOps.llmSimsearchPq.build(s, TestSpark.Sf0001)
        .collect()
        .groupBy(_.getLong(0))
        .map { case (p, rows) => p -> rows.map(_.getLong(1)).toSet }

    val recalls = probes.map { p =>
      val hit = bf5(p).intersect(pq.getOrElse(p, Set.empty)).size
      hit.toDouble / bf5(p).size
    }
    val recall = recalls.sum / recalls.size
    info(f"mean recall@5 = $recall%.3f over ${probes.size} probes (m=16, ks=32, ADC top-50 + exact re-rank)")
    assert(recall >= 0.8, f"PQ recall $recall%.3f below 0.8 gate")
  }

  test("llm_simsearch_ivfpq recall >= 0.8 vs brute-force euclidean top-5") {
    val s = TestSpark.spark
    val vecs: Map[Long, Array[Double]] =
      Tables.embeddings(s, TestSpark.Sf0001)
        .collect()
        .map(r => r.getLong(0) ->
          r.getSeq[Float](1).map(_.toDouble).toArray)
        .toMap
    val probes = vecs.keys.filter(_ % 50 == 0).toSeq.sorted
    def dist(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val bf5: Map[Long, Set[Long]] = probes.map { p =>
      p -> vecs.collect { case (id, v) if id != p => (id, dist(vecs(p), v)) }
        .toSeq.sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
    }.toMap

    val got: Map[Long, Set[Long]] =
      LlmOps.llmSimsearchIvfpq.build(s, TestSpark.Sf0001)
        .collect()
        .groupBy(_.getLong(0))
        .map { case (p, rows) => p -> rows.map(_.getLong(1)).toSet }

    val recalls = probes.map { p =>
      val hit = bf5(p).intersect(got.getOrElse(p, Set.empty)).size
      hit.toDouble / bf5(p).size
    }
    val recall = recalls.sum / recalls.size
    info(f"mean recall@5 = $recall%.3f over ${probes.size} probes " +
      "(k=32, nprobe=18 routing; m=16/ks=32 ADC + exact re-rank)")
    assert(recall >= 0.8, f"IVF-PQ recall $recall%.3f below 0.8 gate")
  }

  test("llm_simsearch_lsh_det recall >= 0.8 vs brute-force cosine top-5") {
    // cosine baseline (not euclidean): the det op's own re-rank metric —
    // sign-hyperplane LSH approximates angular similarity
    val s = TestSpark.spark
    val vecs: Map[Long, Array[Double]] =
      Tables.embeddings(s, TestSpark.Sf0001)
        .collect()
        .map(r => r.getLong(0) ->
          r.getSeq[Float](1).map(_.toDouble).toArray)
        .toMap
    val probes = vecs.keys.filter(_ % 50 == 0).toSeq.sorted
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / math.sqrt(na * nb)
    }
    val bf5: Map[Long, Set[Long]] = probes.map { p =>
      p -> vecs.collect { case (id, v) if id != p => (id, cos(vecs(p), v)) }
        .toSeq.sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSet
    }.toMap

    val det: Map[Long, Set[Long]] =
      LlmOps.llmSimsearchLshDet.build(s, TestSpark.Sf0001)
        .collect()
        .groupBy(_.getLong(0))
        .map { case (p, rows) => p -> rows.map(_.getLong(1)).toSet }

    val recalls = probes.map { p =>
      val hit = bf5(p).intersect(det.getOrElse(p, Set.empty)).size
      hit.toDouble / bf5(p).size
    }
    val recall = recalls.sum / recalls.size
    info(f"mean recall@5 = $recall%.3f over ${probes.size} probes (64 planes, 16 bands of 4 bits)")
    assert(recall >= 0.8, f"det-LSH recall $recall%.3f below 0.8 gate")
  }
}
