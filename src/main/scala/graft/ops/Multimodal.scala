package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.tables.Tables

/** Multimodal columns (north star): image/audio/video as opaque BINARY
  * payloads with typed metadata, processed by partition-batched
  * feature extraction.
  *
  * This container ships no codec libraries, so the decode step is a
  * clearly-marked STUB (`decodeStub`) over a deterministic fake payload
  * synthesized from `documents.text` — but every piece of Spark plumbing
  * a real deployment needs is real and tested: the binary+metadata
  * schema, the mapPartitions batch shape (one iterator per partition, so
  * a codec can amortize per-batch init exactly like mapInPandas batches),
  * the fixed-width feature output schema, and partition-invariant
  * determinism. Swapping `decodeStub` for a JNI/codec call changes no
  * plan shape.
  *
  * Scale notes: payloads never shuffle — features are extracted in the
  * scan stage (narrow mapPartitions), and only the small typed feature
  * rows flow downstream. That is THE multimodal rule at 100 TB: reduce
  * blobs to features before anything wide.
  */
object Multimodal {

  /** media table: opaque payload + typed metadata, derived
    * deterministically from the documents fixture (no binary fixture
    * exists; text bytes stand in for an encoded blob).
    */
  def media(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      (col("n_chars") % 640).cast(IntegerType).as("width"),
      (col("n_chars") % 480).cast(IntegerType).as("height"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decode: a real implementation would hand `payload` to a codec
    * (JPEG decode, PCM frames, key-frame sample). The stub derives
    * deterministic pseudo-features from the raw bytes so the pipeline is
    * end-to-end testable; its signature (bytes → fixed-width features)
    * is the contract a codec drop-in must keep.
    */
  private[ops] def decodeStub(payload: Array[Byte]): (Int, Double, Array[Long]) = {
    val hist = new Array[Long](4)
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      hist(b / 64) += 1
      sum += b
      i += 1
    }
    val mean = if (payload.length == 0) 0.0 else sum.toDouble / payload.length
    (payload.length, mean, hist)
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", IntegerType),
    StructField("mean_byte", DoubleType),
    StructField("hist", StringType)))

  /** Partition-batched feature extraction over the opaque payloads. */
  val llmMultimodalFeatures: Op = Op(
    "llm_multimodal_features",
    (s, dir) => {
      val enc = RowEncoder.encoderFor(featureSchema)
      media(s, dir)
        .mapPartitions { batch =>
          // per-partition init happens HERE once (codec handles, buffers)
          batch.map { r =>
            val (n, mean, hist) = decodeStub(r.getAs[Array[Byte]]("payload"))
            Row(
              r.getAs[Long]("media_id"), r.getAs[String]("kind"),
              r.getAs[Int]("width"), r.getAs[Int]("height"),
              n, math.rint(mean * 1e6) / 1e6, hist.mkString(","))
          }
        }(enc)
        .orderBy("media_id")
    },
    None) // binary pipeline: no SQL oracle; UnitSuite pins hand-computed features

  val ops: Seq[Op] = Seq(llmMultimodalFeatures)
}
