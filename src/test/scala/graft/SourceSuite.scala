package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom DSv2 source (graft.sources.SeqSource): content parity
  * with an equivalent spark.range computation, partition planning,
  * column pruning, and pushdown-driven partition PRUNING (a pushed id
  * range must shrink what gets scheduled, not just filter rows).
  */
class SourceSuite extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def seq(rows: Int, parts: Int) =
    s.read.format("graft.sources.SeqSource")
      .option("rows", rows.toString).option("parts", parts.toString).load()

  test("content matches the generator contract") {
    val got = seq(100, 4).orderBy("id").collect()
    assert(got.length == 100)
    val expected = s.range(100).select(col("id"), (col("id") * 0.5).as("val"),
      concat(lit("t"), col("id") % 10).as("tag")).orderBy("id").collect()
    assert(got.toSeq == expected.toSeq)
  }

  test("plans exactly `parts` input partitions") {
    assert(seq(1000, 7).rdd.getNumPartitions == 7)
  }

  test("column pruning reaches the reader") {
    val df = seq(100, 2).select("tag")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("cols=tag"), s"reader not pruned: $scan")
    assert(df.distinct().count() == 10)
  }

  test("pushed id range prunes PARTITIONS, not just rows") {
    // 1000 rows in 10 partitions of 100; id < 250 must survive in
    // 3 partitions (and produce exactly 250 rows)
    val df = seq(1000, 10).filter(col("id") < 250)
    assert(df.count() == 250)
    assert(df.rdd.getNumPartitions == 3,
      s"expected 3 surviving partitions, got ${df.rdd.getNumPartitions}")
    // conjunctive range: 300 <= id < 420 -> 120 rows
    val band = seq(1000, 10).filter(col("id") >= 300 && col("id") < 420)
    assert(band.count() == 120)
    assert(band.agg(min("id"), max("id")).collect()(0).toSeq == Seq(300L, 419L))
  }

  test("Long.MaxValue boundary filters stay residual and answer correctly") {
    // v + 1 on these bounds would overflow; they must NOT be accepted
    // into the pushed range (a pushed filter is never re-checked)
    assert(seq(100, 4).filter(col("id") <= Long.MaxValue).count() == 100)
    assert(seq(100, 4).filter(col("id") > Long.MaxValue).count() == 0)
  }

  test("invalid parts option fails fast with a clear message") {
    val e = intercept[Exception](seq(100, 0).count())
    assert(e.getMessage.contains("parts"), e.getMessage)
  }

  test("ungrouped count/min/max push down COMPLETELY: one row from range arithmetic, no Aggregate node") {
    val df = seq(1000, 8)
      .filter(col("id") >= 100 && col("id") < 900)
      .agg(count(col("id")).as("n"), min(col("id")).as("lo"), max(col("id")).as("hi"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_seq agg"),
      s"aggregation not pushed into the source:\n$plan")
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"complete pushdown should elide Spark's Aggregate:\n$plan")
    assert(df.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      == Seq((800L, 100L, 899L)))
  }

  test("untranslatable aggregates are declined and planned normally") {
    val onVal = seq(100, 2).agg(sum(col("val")))
    assert(onVal.queryExecution.executedPlan.toString.contains("HashAggregate"),
      "SUM(val) is not range-answerable and must be declined")
    assert(onVal.collect()(0).getDouble(0) == (0 until 100).map(_ * 0.5).sum)
    val byVal = seq(100, 2).groupBy("val").agg(count(lit(1)))
    assert(!byVal.queryExecution.executedPlan.toString.contains("PushedAggregation") ||
      !byVal.queryExecution.optimizedPlan.toString.toLowerCase.contains("pushed"),
      "grouping by val is not translatable and must be declined")
    assert(byVal.count() == 100)
  }

  test("GROUP BY tag pushes down PARTIALLY: per-partition group stats, Spark merges") {
    val grouped = seq(100, 4).groupBy("tag")
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"), max(col("id")).as("mx"))
    val plan = grouped.queryExecution.executedPlan.toString
    // partial path: the scan answers per-partition groups AND Spark
    // keeps a final Aggregate to merge them (unlike the complete path,
    // which elides it)
    assert(plan.contains("grouped-agg"),
      s"scan did not receive the pushed grouped aggregation:\n$plan")
    assert(plan.contains("HashAggregate"),
      "partial pushdown must keep Spark's merging aggregate")
    val got = grouped.orderBy("tag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = (0 until 10).map(t =>
      ("t" + t, 10L, t.toLong, (90 + t).toLong))
    assert(got.toSeq == want, s"merged group stats wrong: ${got.mkString(",")}")
    // composes with filter pushdown: the narrowed range re-derives the
    // group stats from the surviving ids only
    val narrowed = seq(100, 4).filter(col("id") >= 25 && col("id") < 45)
      .groupBy("tag").agg(count(lit(1)).as("n"), min(col("id")).as("mn"))
      .orderBy("tag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val wantN = (0 until 10).map { t =>
      val ids = (25 until 45).filter(_ % 10 == t)
      ("t" + t, ids.length.toLong, ids.min.toLong)
    }
    assert(narrowed.toSeq == wantN)
  }

  // ---- KvStoreSource: the writable half of the connector surface ----

  private def kvWrite(df: org.apache.spark.sql.DataFrame, table: String,
      mode: String): Unit =
    df.write.format("graft.sources.KvStoreSource")
      .option("table", table).mode(mode).save()

  private def kvRead(table: String) =
    s.read.format("graft.sources.KvStoreSource").option("table", table).load()

  private def kvDf(rows: (Long, String)*) = {
    import s.implicits._
    rows.toDF("k", "v").repartition(3) // multiple tasks → multiple commit messages
  }

  test("kv sink roundtrip: written rows read back exactly, append unions, overwrite truncates") {
    graft.sources.KvStoreSource.drop("t_rt")
    kvWrite(kvDf(1L -> "a", 2L -> "b", 3L -> "c"), "t_rt", "append")
    assert(kvRead("t_rt").orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    kvWrite(kvDf(4L -> "d"), "t_rt", "append")
    assert(kvRead("t_rt").count() == 4)
    kvWrite(kvDf(9L -> "z"), "t_rt", "overwrite")
    assert(kvRead("t_rt").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq(9L -> "z"))
    graft.sources.KvStoreSource.drop("t_rt")
  }

  test("kv sink two-phase commit is atomic: a failed task publishes NOTHING") {
    import s.implicits._
    graft.sources.KvStoreSource.drop("t_atomic")
    kvWrite(kvDf(1L -> "keep"), "t_atomic", "append")
    // a write whose third partition throws mid-task: the job fails, the
    // driver never calls commit, and the store must still hold ONLY the
    // previous version — no partial publish from the tasks that finished
    val poison = s.range(0, 30).select(col("id").as("k"),
      expr("if(id = 29, raise_error('task failure injected'), concat('v', id))").as("v"))
    intercept[Exception] { kvWrite(poison, "t_atomic", "append") }
    assert(kvRead("t_atomic").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq(1L -> "keep"), "a failed job leaked partial task output into the store")
    graft.sources.KvStoreSource.drop("t_atomic")
  }

  test("kv sink rejects a mismatched write schema fast") {
    import s.implicits._
    graft.sources.KvStoreSource.drop("t_schema")
    val bad = Seq((1L, "a", 0.5)).toDF("k", "v", "extra")
    intercept[Exception] {
      bad.write.format("graft.sources.KvStoreSource")
        .option("table", "t_schema").mode("append").save()
    }
    assert(graft.sources.KvStoreSource.committed("t_schema").isEmpty)
  }

  test("kv sink dtype handling: safe upcast reconciles, incompatible fails fast") {
    import s.implicits._
    // round-9 advice asked for a planning-time dtype check. Two layers
    // now exist: Spark's own TableOutputResolver reconciles the query
    // schema against table.schema() BEFORE the write builder — an INT k
    // upcasts to BIGINT and writes correctly, an un-castable dtype
    // fails analysis with no task run — and newWriteBuilder's require
    // re-validates (LongType, StringType) for direct DSv2 callers that
    // bypass DataFrameWriter resolution.
    graft.sources.KvStoreSource.drop("t_dtype")
    Seq((1, "a"), (2, "b")).toDF("k", "v")
      .write.format("graft.sources.KvStoreSource")
      .option("table", "t_dtype").mode("append").save()
    assert(graft.sources.KvStoreSource.committed("t_dtype") ==
      Seq(1L -> "a", 2L -> "b"))
    intercept[Exception] {
      Seq(("x", "a")).toDF("k", "v")
        .write.format("graft.sources.KvStoreSource")
        .option("table", "t_dtype").mode("append").save()
    }
    assert(graft.sources.KvStoreSource.committed("t_dtype") ==
      Seq(1L -> "a", 2L -> "b"), "a rejected write must not change the table")
    graft.sources.KvStoreSource.drop("t_dtype")
  }

  test("aggregate pushdown on an empty pushed range: count 0, null extrema") {
    val df = seq(1000, 4).filter(col("id") >= 500 && col("id") < 500)
      .agg(count(col("id")), min(col("id")), max(col("id")))
    val r = df.collect()(0)
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
  }
}
