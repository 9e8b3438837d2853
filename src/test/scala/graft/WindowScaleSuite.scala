package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EventTime, Windows}

/** The scale-safe two-pass window formulations must be BIT-identical to
  * their single-window spec forms — same rows, same doubles, down to the
  * last ulp (they share the spec form's DuckDB oracle, so any drift
  * would also fail the driver's hash compare).
  */
class WindowScaleSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def rows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString)

  test("events_bot_score_scale ≡ events_bot_score (bit-identical)") {
    val spec = rows(EventTime.eventsBotScore.build(spark, sf))
    val scale = rows(EventTime.eventsBotScoreScale.build(spark, sf))
    assert(scale.size == spec.size)
    scale.zip(spec).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"row $i differs")
    }
  }

  test("win_range_frame_scale ≡ win_range_frame (bit-identical)") {
    val spec = rows(Windows.winRangeFrame.build(spark, sf))
    val scale = rows(Windows.winRangeFrameScale.build(spark, sf))
    assert(scale.size == spec.size)
    scale.zip(spec).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"row $i differs")
    }
  }

  test("win_ntile_pct_scale ≡ win_ntile_pct (bit-identical)") {
    val spec = rows(Windows.winNtilePct.build(spark, sf))
    val scale = rows(Windows.winNtilePctScale.build(spark, sf))
    assert(scale.size == spec.size)
    scale.zip(spec).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"row $i differs")
    }
  }

  test("win_pareto_scale ≡ win_pareto (bit-identical)") {
    val spec = rows(Windows.winPareto.build(spark, sf))
    val scale = rows(Windows.winParetoScale.build(spark, sf))
    assert(scale.size == spec.size)
    scale.zip(spec).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"row $i differs")
    }
  }

  test("llm_mix_sources_scale ≡ llm_mix_sources (bit-identical)") {
    val spec = rows(graft.ops.LlmOps.llmMixSources.build(spark, sf))
    val scale = rows(graft.ops.LlmOps.llmMixSourcesScale.build(spark, sf))
    assert(scale.size == spec.size)
    scale.zip(spec).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"row $i differs")
    }
  }

  test("win_weighted_median_scale ≡ win_weighted_median (bit-identical)") {
    val spec = rows(Windows.winWeightedMedian.build(spark, sf))
    val scale = rows(Windows.winWeightedMedianScale.build(spark, sf))
    assert(scale.size == spec.size)
    scale.zip(spec).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"row $i differs")
    }
  }

  test("win_rfm_segment_scale ≡ win_rfm_segment (bit-identical)") {
    val spec = rows(Windows.winRfmSegment.build(spark, sf))
    val scale = rows(Windows.winRfmSegmentScale.build(spark, sf))
    assert(scale.size == spec.size)
    scale.zip(spec).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"row $i differs")
    }
  }

  test("two-pass forms hold under single-partition execution (partition invariance)") {
    val one = Windows.winNtilePctScale.build(spark, sf).coalesce(1)
    assert(rows(one) == rows(Windows.winNtilePct.build(spark, sf)))
    val rfmOne = Windows.winRfmSegmentScale.build(spark, sf).coalesce(1)
    assert(rows(rfmOne) == rows(Windows.winRfmSegment.build(spark, sf)))
    val wmOne = Windows.winWeightedMedianScale.build(spark, sf).coalesce(1)
    assert(rows(wmOne) == rows(Windows.winWeightedMedian.build(spark, sf)))
  }
}
