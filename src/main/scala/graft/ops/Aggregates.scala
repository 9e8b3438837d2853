package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.tables.Tables
import Op._

/** §2.4 aggregations. Every op is a stock `groupBy().agg()` —
  * HashAggregateExec with map-side partial aggregation, so the shuffle
  * carries one row per (partition, group), not per input row. At 100 TB
  * the cardinality of every group set here is tiny (flags, statuses,
  * custkeys), so the final exchange is negligible; the scan dominates and
  * benefits from parquet column pruning (only referenced columns are read).
  */
object Aggregates {

  /** Flagship: TPC-H Q1-shaped pricing summary over lineitem.
    * Exact decimal chain per Op.dec2 rules; surfaced as doubles.
    */
  val aggPricingSummary: Op = Op(
    "agg_pricing_summary",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val price = dec2(col("l_extendedprice"))
      val disc1 = (lit(1) - rate2(col("l_discount"))).cast(DecimalType(4, 2))
      val tax1 = (lit(1) + rate2(col("l_tax"))).cast(DecimalType(4, 2))
      val discPrice = (price * disc1).cast(DecimalType(18, 4))
      val charge = (discPrice * tax1).cast(DecimalType(18, 6))
      li.filter(col("l_shipdate") <= lit("2000-12-01"))
        .select(
          col("l_returnflag"), col("l_linestatus"),
          dec2(col("l_quantity")).as("qty"),
          price.as("price"),
          discPrice.as("disc_price"),
          charge.as("charge"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sumMoney(col("qty")).as("sum_qty"),
          sumMoney(col("price")).as("sum_base_price"),
          sumMoney(col("disc_price")).as("sum_disc_price"),
          sumMoney(col("charge")).as("sum_charge"),
          (sumMoney(col("qty")) / count(lit(1))).as("avg_qty"),
          (sumMoney(col("price")) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4)) * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """.stripMargin.trim))

  val ops: Seq[Op] = Seq(aggPricingSummary)
}
