package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventTime
import graft.tables.Tables

/** §2.9 Structured Streaming capability suite (no-oracle, SURVEY §5.2-B):
  * the micro-batch replay of the same parquet must converge to the batch
  * queries' ground truth ("batch-streaming equivalence"), and a watermark
  * must actually drop late rows in append mode.
  */
class StreamingSuite extends AnyFunSuite {

  private lazy val s = TestSpark.spark

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  test("streaming tumbling counts converge to the batch stream_tumbling result") {
    // Re-materialize events with µs timestamps (streaming source can't read
    // the fixture's ns parquet directly, same as batch), then replay it.
    val dir = Files.createTempDirectory("graft_stream_src_").toString
    Tables.events(s, TestSpark.Sf0001).write.mode("overwrite").parquet(dir)

    val stream = s.readStream.schema(eventSchema).parquet(dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"))

    val q = stream.writeStream
      .format("memory").queryName("tumbling_stream")
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = s.table("tumbling_stream")
      .orderBy("win_start", "event_type")
      .collect().toSeq
    val batch = EventTime.streamTumbling.build(s, TestSpark.Sf0001)
      .select("win_start", "event_type", "n")
      .collect().toSeq
    assert(streamed == batch)
  }

  /** Stage one logical batch as a single parquet FILE at the source root
    * so maxFilesPerTrigger=1 maps it to exactly one micro-batch.
    */
  private def stageFile(srcDir: String, sub: String,
      rows: Seq[(Long, String, Long, String, Double, String)]): Unit = {
    import s.implicits._
    val stage = Files.createTempDirectory("graft_stage_").toString
    rows.toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("tss").cast(TimestampType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    Files.move(part.toPath, java.nio.file.Paths.get(srcDir, s"$sub.parquet"))
  }

  test("watermark drops late rows in append mode") {
    val srcDir = Files.createTempDirectory("graft_stream_late_").toString
    def mkFile(sub: String, rows: Seq[(Long, String, Long, String, Double, String)]): Unit =
      stageFile(srcDir, sub, rows)

    // batch 1: events in hours 01,02,03 → watermark after it = 03:00 − 2h = 01:00
    mkFile("f1", Seq(
      (1L, "2024-01-01 01:10:00", 1L, "view", 1.0, "{}"),
      (2L, "2024-01-01 02:10:00", 1L, "view", 1.0, "{}"),
      (3L, "2024-01-01 03:00:00", 1L, "view", 1.0, "{}")))

    val stream = s.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("n"))

    val q = stream.writeStream
      .format("memory").queryName("late_stream")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      // batch 2: one row at 00:30 — BELOW the 01:00 watermark → dropped;
      // one row at 06:30 — advances the watermark to 04:30, strictly past
      // the hour-01/02/03 window ends, finalizing (and emitting) them.
      mkFile("f2", Seq(
        (4L, "2024-01-01 00:30:00", 1L, "view", 1.0, "{}"),
        (5L, "2024-01-01 06:30:00", 1L, "view", 1.0, "{}")))
      q.processAllAvailable()
    } finally q.stop()

    val emitted = s.table("late_stream")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // finalized windows carry exactly the on-time rows
    assert(emitted.get("2024-01-01 01:00:00").contains(1L))
    assert(emitted.get("2024-01-01 02:00:00").contains(1L))
    assert(emitted.get("2024-01-01 03:00:00").contains(1L))
    // the late 00:30 row was dropped: its window never appears
    assert(!emitted.contains("2024-01-01 00:00:00"))
  }

  test("streaming session windows converge to the batch stream_session result") {
    // Replay the fixture, then a far-future sentinel event (user -1) in a
    // second micro-batch: the watermark passes every real session's end,
    // so append mode emits exactly the finalized sessions.
    val srcDir = Files.createTempDirectory("graft_stream_sess_").toString
    val stage = Files.createTempDirectory("graft_sess_f1_").toString
    Tables.events(s, TestSpark.Sf0001).coalesce(1)
      .write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    Files.move(part.toPath, java.nio.file.Paths.get(srcDir, "f1.parquet"))

    val stream = s.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"),
        max(col("ts")).as("last_ts"))
      .select(
        col("user_id"),
        date_format(date_trunc("second", col("sw.start")), "yyyy-MM-dd HH:mm:ss").as("sess_start"),
        date_format(date_trunc("second", col("last_ts")), "yyyy-MM-dd HH:mm:ss").as("sess_last"),
        col("n_events"), col("sum_value"))

    val q = stream.writeStream
      .format("memory").queryName("session_stream")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      stageFile(srcDir, "f2",
        Seq((999999L, "2030-01-01 00:00:00", -1L, "view", 0.0, "{}")))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = s.table("session_stream")
      .filter(col("user_id") =!= -1L)
      .orderBy("user_id", "sess_start")
      .collect().toSeq
    val batch = EventTime.streamSession.build(s, TestSpark.Sf0001)
      .collect().toSeq
    assert(streamed == batch)
  }

  test("streaming dropDuplicates forwards each event_id exactly once across batches") {
    val srcDir = Files.createTempDirectory("graft_stream_dedup_").toString
    stageFile(srcDir, "f1", Seq(
      (1L, "2024-01-01 01:00:00", 1L, "view", 1.0, "{}"),
      (2L, "2024-01-01 01:05:00", 1L, "view", 1.0, "{}")))

    val stream = s.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .dropDuplicates("event_id")
      .select("event_id", "user_id", "event_type")

    val q = stream.writeStream
      .format("memory").queryName("dedup_stream")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      // replay of id 1 (cross-batch duplicate) plus a genuinely new id 3
      stageFile(srcDir, "f2", Seq(
        (1L, "2024-01-01 01:00:00", 1L, "view", 1.0, "{}"),
        (3L, "2024-01-01 01:10:00", 2L, "click", 1.0, "{}")))
      q.processAllAvailable()
    } finally q.stop()

    val ids = s.table("dedup_stream").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }
}
