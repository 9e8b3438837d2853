package graft.ops

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.tables.Tables
import Op._

/** §2.11 — the custom-aggregate (UDAF) surface, demonstrated with an
  * exact weighted average registered through `functions.udaf`.
  *
  * The buffer holds EXACT decimal partial sums (Σ x·w, Σ w), so merge is
  * associative/commutative and the result is independent of partitioning
  * and merge order — the property the driver's hash-match (and any 100 TB
  * shuffle) demands. Doubles enter the buffer through the same
  * shortest-representation + HALF_UP decimal(12,2) conversion as Op.dec2,
  * so the DuckDB oracle's CAST chain lands on identical values; the final
  * division is a single IEEE double op on both engines.
  */
object WeightedAvgAgg
    extends Aggregator[(Double, Double), (JBigDecimal, JBigDecimal), Double] {

  private def d2(x: Double): JBigDecimal =
    JBigDecimal.valueOf(x).setScale(2, java.math.RoundingMode.HALF_UP)

  override def zero: (JBigDecimal, JBigDecimal) =
    (JBigDecimal.ZERO, JBigDecimal.ZERO)

  override def reduce(
      b: (JBigDecimal, JBigDecimal),
      in: (Double, Double)): (JBigDecimal, JBigDecimal) = {
    val (x, w) = in
    (b._1.add(d2(x).multiply(d2(w))), b._2.add(d2(w)))
  }

  override def merge(
      a: (JBigDecimal, JBigDecimal),
      b: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
    (a._1.add(b._1), a._2.add(b._2))

  override def finish(b: (JBigDecimal, JBigDecimal)): Double =
    if (b._2.signum() == 0) 0.0
    else b._1.doubleValue() / b._2.doubleValue()

  override def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object Udafs {

  /** Quantity-weighted average extended price per return flag — the UDAF
    * runs as a standard two-phase hash aggregate (partial buffers
    * map-side, decimal merge on the shuffle), exactly like a built-in.
    */
  val udafWeightedAvg: Op = Op(
    "udaf_weighted_avg",
    (s, dir) => {
      val wavg = udaf(WeightedAvgAgg)
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          round(wavg(col("l_extendedprice"), col("l_quantity")), 6).as("wavg_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
        ROUND(
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
          / CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 6) AS wavg_price,
        COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """.stripMargin.trim))

  val ops: Seq[Op] = Seq(udafWeightedAvg)
}
