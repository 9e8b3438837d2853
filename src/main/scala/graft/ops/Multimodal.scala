package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.tables.Tables

/** Multimodal columns (north star): image/audio/video as opaque BINARY
  * payloads with typed metadata, processed by partition-batched
  * feature extraction.
  *
  * `kind = 'image'` rows carry REAL PNG payloads (synthesized
  * deterministically with the JDK's own javax.imageio — no external
  * codec library) and the feature extractor REALLY decodes them:
  * decoded dimensions and channel statistics come from the pixels, not
  * the metadata. `kind = 'audio'` rows likewise carry REAL 16-bit PCM
  * WAV payloads (JDK javax.sound.sampled — still zero external deps)
  * and the extractor parses the container and decodes the samples:
  * sample rate, frame count, and amplitude statistics come from the
  * PCM stream. Only `kind = 'video'` keeps the clearly-marked
  * `decodeStub` (no JDK video codec exists), so the three paths
  * together document the contract: same batch shape, same fixed-width
  * feature schema, a codec drop-in changes no plan shape.
  *
  * Scale notes: payloads never shuffle — features are extracted in the
  * scan stage (narrow mapPartitions), and only the small typed feature
  * rows flow downstream. That is THE multimodal rule at 100 TB: reduce
  * blobs to features before anything wide.
  */
object Multimodal {

  /** Deterministic tiny PNG: pixel channels are affine functions of
    * (seed, x, y) mod 256, encoded with the JDK PNG writer. Stands in
    * for a real ingested image; being a REAL PNG is the point — the
    * decode path downstream cannot cheat.
    */
  private[graft] def encodePng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((seed * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((seed * 17 + x * 3 + y * 11) % 256).toInt
        val b = ((seed * 23 + x * 5 + y * 19) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode (JDK javax.imageio): dimensions and RGB channel
    * statistics from the decoded pixels. Returns
    * (imgW, imgH, meanChannel, hist4) where hist4 buckets channel
    * values by 64.
    */
  private[graft] def decodeImage(payload: Array[Byte]): (Int, Int, Double, Array[Long]) = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    val (w, h) = (img.getWidth, img.getHeight)
    val hist = new Array[Long](4)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        var c = 0
        while (c < 3) {
          val v = (rgb >> (8 * c)) & 0xff
          hist(v / 64) += 1
          sum += v
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val n = 3L * w * h
    (w, h, if (n == 0) 0.0 else sum.toDouble / n, hist)
  }

  /** Deterministic tiny WAV: 16-bit signed little-endian mono PCM whose
    * samples are an affine function of (seed, i) mod 2^16, wrapped in a
    * real RIFF/WAVE container by the JDK writer. Like encodePng, being
    * a REAL WAV is the point — the decode path cannot cheat.
    */
  private[graft] def encodeWav(nSamples: Int, sampleRate: Float, seed: Long): Array[Byte] = {
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (((seed * 31 + i.toLong * 7919) % 65536) - 32768).toInt
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode (JDK javax.sound.sampled): parses the WAV
    * container, then amplitude statistics from the decoded 16-bit PCM
    * samples. Returns (sampleRate, nSamples, meanSample, hist4) where
    * hist4 buckets the signed sample range by 16384.
    */
  private[graft] def decodeWav(payload: Array[Byte]): (Int, Int, Double, Array[Long]) = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    val sr = ais.getFormat.getSampleRate.toInt
    val bytes = ais.readAllBytes()
    ais.close()
    val n = bytes.length / 2
    val hist = new Array[Long](4)
    var sum = 0L
    var i = 0
    while (i < n) {
      val v = (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)
      hist((v + 32768) / 16384) += 1
      sum += v
      i += 1
    }
    (sr, n, if (n == 0) 0.0 else sum.toDouble / n, hist)
  }

  /** STUB decode for the codec-less kind (video): derives
    * deterministic pseudo-features from the raw bytes so the pipeline is
    * end-to-end testable; its signature (bytes → fixed-width features)
    * is the contract a PCM/video codec drop-in must keep.
    */
  private[graft] def decodeStub(payload: Array[Byte]): (Int, Double, Array[Long]) = {
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

  private val mediaSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("payload", BinaryType)))

  /** media table: opaque payload + typed metadata, derived
    * deterministically from the documents fixture. Image rows carry a
    * real PNG whose dimensions are (media_id % 6 + 2) × (media_id % 4
    * + 2); audio rows a real WAV of (media_id % 200 + 50) samples at
    * 8 kHz; video rows carry the document's text bytes standing in for
    * an encoded blob. Synthesis runs in the same narrow mapPartitions
    * shape the extractor uses (ImageIO/AudioSystem are JVM-local, no
    * shuffle).
    */
  def media(s: SparkSession, dir: String): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    Tables.documents(s, dir).select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        (col("n_chars") % 640).cast(IntegerType).as("width"),
        (col("n_chars") % 480).cast(IntegerType).as("height"),
        encode(col("text"), "UTF-8").as("textbytes"))
      // r22: an explicit-count spread before the codec chain (the
      // scan-starvation treatment) was tried here and REVERTED — the
      // fixture payloads are tiny (≤8×6-pixel PNGs / ≤250-sample WAVs),
      // so the added exchange cost more than the serial codec work it
      // parallelized (keyframes 0.51 → 0.75 s, resample 0.75 → 1.09 s
      // warm). At real image sizes the spread wins (llm_multimodal_dedup
      // keeps its explicit repartition for exactly that reason).
      .mapPartitions { batch =>
        batch.map { r =>
          val id = r.getAs[Long]("media_id")
          val kind = r.getAs[String]("kind")
          val payload = kind match {
            case "image" => encodePng((id % 6 + 2).toInt, (id % 4 + 2).toInt, id)
            case "audio" => encodeWav((id % 200 + 50).toInt, 8000f, id)
            case _ => r.getAs[Array[Byte]]("textbytes")
          }
          Row(id, kind, r.getAs[Int]("width"), r.getAs[Int]("height"), payload)
        }
      }(enc)
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("img_w", IntegerType),
    StructField("img_h", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", IntegerType),
    StructField("n_bytes", IntegerType),
    StructField("mean_byte", DoubleType),
    StructField("hist", StringType)))

  /** Partition-batched feature extraction over the opaque payloads:
    * images are pixel-decoded (img_w/img_h/mean/hist from the REAL
    * PNG decode), audio is sample-decoded (sample_rate/n_samples/mean/
    * hist from the REAL WAV decode; mean_byte is the mean signed PCM
    * sample there), video goes through the stub (decode columns null).
    */
  val llmMultimodalFeatures: Op = Op(
    "llm_multimodal_features",
    (s, dir) => {
      val enc = RowEncoder.encoderFor(featureSchema)
      media(s, dir)
        .mapPartitions { batch =>
          // per-partition init happens HERE once (codec handles, buffers)
          batch.map { r =>
            // positional getters: rows from the upstream mapPartitions
            // carry no name schema (mediaSchema order: id, kind, w, h, payload)
            val kind = r.getString(1)
            val payload = r.getAs[Array[Byte]](4)
            val base = Seq[Any](r.getLong(0), kind, r.getInt(2), r.getInt(3))
            val feats = kind match {
              case "image" =>
                val (iw, ih, mean, hist) = decodeImage(payload)
                Seq[Any](iw, ih, null, null, payload.length,
                  math.rint(mean * 1e6) / 1e6, hist.mkString(","))
              case "audio" =>
                val (sr, n, mean, hist) = decodeWav(payload)
                Seq[Any](null, null, sr, n, payload.length,
                  math.rint(mean * 1e6) / 1e6, hist.mkString(","))
              case _ =>
                val (n, mean, hist) = decodeStub(payload)
                Seq[Any](null, null, null, null, n,
                  math.rint(mean * 1e6) / 1e6, hist.mkString(","))
            }
            Row.fromSeq(base ++ feats)
          }
        }(enc)
        .orderBy("media_id")
    },
    None) // binary pipeline: no SQL oracle; UnitSuite pins hand-built PNG/WAV features

  /** 2× box-downsample of a decoded image: each output pixel is the
    * integer mean of its 2×2 block per channel (floor division —
    * deterministic; odd trailing row/col dropped). Returns
    * (outW, outH, meanChannelOfOutput). The north-star "resize" step,
    * on REAL decoded pixels.
    */
  private[graft] def downsample2x(payload: Array[Byte]): (Int, Int, Double) = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    val ow = math.max(img.getWidth / 2, 1)
    val oh = math.max(img.getHeight / 2, 1)
    var sum = 0L
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        var c = 0
        while (c < 3) {
          var acc = 0
          var k = 0
          while (k < 4) {
            val sx = math.min(2 * x + (k & 1), img.getWidth - 1)
            val sy = math.min(2 * y + (k >> 1), img.getHeight - 1)
            acc += (img.getRGB(sx, sy) >> (8 * c)) & 0xff
            k += 1
          }
          sum += acc / 4
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val n = 3L * ow * oh
    (ow, oh, if (n == 0) 0.0 else sum.toDouble / n)
  }

  /** Frame-sampling of decoded PCM: keep every `stride`-th sample.
    * Returns (nKept, meanKeptSample). The north-star "frame-sample"
    * step, on REAL decoded samples.
    */
  private[graft] def frameSample(payload: Array[Byte], stride: Int): (Int, Double) = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    val bytes = ais.readAllBytes()
    ais.close()
    val n = bytes.length / 2
    var i = 0
    var kept = 0
    var sum = 0L
    while (i < n) {
      val v = (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)
      sum += v
      kept += 1
      i += stride
    }
    (kept, if (kept == 0) 0.0 else sum.toDouble / kept)
  }

  private val resampleSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("out_w", IntegerType),
    StructField("out_h", IntegerType),
    StructField("n_kept", IntegerType),
    StructField("out_mean", DoubleType)))

  /** The north-star resize / frame-sample pipeline as a graded (rows-only)
    * query: images 2×-box-downsample on their decoded pixels, audio keeps
    * every 4th decoded PCM sample, video passes through the stub (byte
    * stride). Same scale contract as the extractor: payloads reduce in
    * the scan stage, only fixed-width rows flow on. No SQL oracle
    * (binary pipeline); UnitSuite pins hand-computed downsample /
    * frame-sample values for both real codecs.
    */
  val llmMultimodalResample: Op = Op(
    "llm_multimodal_resample",
    (s, dir) => {
      val enc = RowEncoder.encoderFor(resampleSchema)
      media(s, dir)
        .mapPartitions { batch =>
          batch.map { r =>
            val kind = r.getString(1)
            val payload = r.getAs[Array[Byte]](4)
            val feats = kind match {
              case "image" =>
                val (ow, oh, m) = downsample2x(payload)
                Seq[Any](ow, oh, null, math.rint(m * 1e6) / 1e6)
              case "audio" =>
                val (kept, m) = frameSample(payload, 4)
                Seq[Any](null, null, kept, math.rint(m * 1e6) / 1e6)
              case _ =>
                // stub: stride the raw bytes (no JDK video codec)
                var i = 0; var kept = 0; var sum = 0L
                while (i < payload.length) {
                  sum += (payload(i) & 0xff); kept += 1; i += 4
                }
                Seq[Any](null, null, kept,
                  if (kept == 0) 0.0 else math.rint(sum.toDouble / kept * 1e6) / 1e6)
            }
            Row.fromSeq(Seq[Any](r.getLong(0), kind) ++ feats)
          }
        }(enc)
        .orderBy("media_id")
    },
    None) // binary pipeline: no SQL oracle; UnitSuite pins the kernels

  /** 64-bit finalizer mix (splitmix64's) — per-image INDEPENDENT pixel
    * patterns for the dedup fixture below (encodePng's shared affine
    * gradient makes every same-size image a near-dup of every other,
    * useless for grading a detector). */
  private[graft] def mix64(a: Long): Long = {
    var x = a
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  /** Real PNG whose pixels come from a mixed hash of (seed, x, y) —
    * statistically independent across seeds — plus a CLAMPED brightness
    * shift (the near-dup perturbation: +shift saturating at 255 keeps
    * almost every local gradient's sign). */
  private[graft] def encodePngMixed(w: Int, h: Int, seed: Long, shift: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val m = mix64(seed * 1000003L + x.toLong * 8191L + y.toLong * 127L)
        def ch(k: Int): Int =
          math.min(((m >>> (8 * k)) & 0xff).toInt + shift, 255)
        img.setRGB(x, y, (ch(0) << 16) | (ch(1) << 8) | ch(2))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Difference hash (dHash) over the REAL decoded pixels: nearest-
    * neighbor resize to 9×8 grayscale, one bit per horizontal
    * gradient sign — the classic perceptual image fingerprint
    * (robust to brightness shifts, which move both neighbors equally).
    */
  private[graft] def dHash(payload: Array[Byte]): Long = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    val g = Array.ofDim[Int](8, 9)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        val rgb = img.getRGB(x * img.getWidth / 9, y * img.getHeight / 8)
        g(y)(x) = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        x += 1
      }
      y += 1
    }
    var hsh = 0L
    var bit = 0
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y)(x + 1) > g(y)(x)) hsh |= (1L << bit)
        bit += 1; x += 1
      }
      y += 1
    }
    hsh
  }

  private val hashSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("dhash", LongType)))

  /** PERCEPTUAL image dedup — the multimodal member of the dedup
    * family (MinHash/SimHash/embedding cover text; a training corpus
    * dedups images by perceptual fingerprint): every image reduces to
    * a 64-bit dHash IN THE SCAN STAGE (real PNG decode → 9×8 resize →
    * gradient signs — the only thing that ever shuffles is the 8-byte
    * hash), candidates form by 4×16-bit LSH band equality (never
    * all-pairs), and survivors verify on full hamming distance ≤ 10
    * via codegen'd `bit_count(xor)`. The fixture PLANTS near-dup twins
    * in-plan (every %30 image gains an id+1M copy at +24 clamped
    * brightness — dHash moves only where a neighbor saturates, so
    * twins sit a few bits apart while independent mixed-hash images
    * sit near the binomial mean of 32): the llm_dedup_semantic
    * honesty treatment — a detector graded only on zero matches
    * proves nothing. No SQL oracle (binary decode pipeline);
    * UnitSuite pins the planted-recall and separation properties.
    *
    * Scale shape: blob → 8-byte fingerprint before any wide op (THE
    * multimodal rule), band join is bucket-local, verify rides the
    * candidate set; at 100 TB this is exactly how image corpora dedup
    * — fingerprints in the scan, pair work bounded by bucket sizes.
    */
  val llmMultimodalDedup: Op = Op(
    "llm_multimodal_dedup",
    (s, dir) => {
      val enc = RowEncoder.encoderFor(hashSchema)
      val base = Tables.documents(s, dir).filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("media_id"), lit(0).as("shift"))
      val planted = base.filter(col("media_id") % 30 === 0)
        .select((col("media_id") + 1000000L).as("media_id"), lit(24).as("shift"))
      val hashes = base.unionByName(planted)
        // explicit-count spread BEFORE the codec work: the single-file
        // documents scan is one partition, and an un-spread encode+
        // decode chain would serialize ~2k codec calls on one core
        // (the scan-starvation gotcha; explicit N survives AQE)
        .repartition(16)
        .mapPartitions { it =>
          it.map { r =>
            val id = r.getLong(0)
            val seed = if (r.getInt(1) == 0) id else id - 1000000L
            Row(id, dHash(encodePngMixed(16, 16, seed, r.getInt(1))))
          }
        }(enc)
        .localCheckpoint(true) // 3 consumers: band explode + both verify sides
      val bands = hashes.select(col("media_id"), col("dhash"),
          explode(expr("sequence(0, 3)")).as("band"))
        .select(col("media_id"), col("band"),
          expr("(dhash >> (band * 16)) & 65535").as("key"))
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id").as("a_id"), col("b.media_id").as("b_id"))
        .distinct()
      cand
        .join(hashes.select(col("media_id").as("a_id"), col("dhash").as("ha")), "a_id")
        .join(hashes.select(col("media_id").as("b_id"), col("dhash").as("hb")), "b_id")
        .select(col("a_id"), col("b_id"),
          expr("bit_count(ha ^ hb)").cast(LongType).as("hamming"))
        .filter(col("hamming") <= 10)
        .orderBy("a_id", "b_id")
    },
    None) // binary decode pipeline: no SQL oracle; UnitSuite pins recall/separation

  /** Deterministic mixed-hash WAV for the audio-dedup fixture:
    * statistically independent 16-bit PCM per seed (the encodePngMixed
    * analogue — the shared-affine encodeWav would make every stream a
    * near-dup of every other), with the TWIN treatment applied at
    * encode time: +6 dB gain (×2, clamped to the 16-bit range — the
    * image op's +24 brightness analogue) followed by 8-bit
    * requantization, the lossy-transcode noise a re-encoded copy
    * carries. Real RIFF/WAVE container via the JDK writer, so the
    * fingerprint path downstream cannot skip the decode.
    */
  private[graft] def encodeWavMixed(
      nSamples: Int, seed: Long, transcode: Boolean): Array[Byte] = {
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val base = ((mix64(seed * 9176L * 1000003L + i.toLong * 8191L)
        & 0xffffL) - 32768L).toInt
      val v =
        if (!transcode) base
        else {
          // symmetric clamp: with the int16-native [-32768, 32767] a
          // negative sample can clamp to |32768| while a larger-magnitude
          // positive clamps to |32767|, breaking the |v|-monotonicity the
          // gain-invariance theorem needs by 1 LSB at full scale
          val g = math.max(-32767, math.min(2 * base, 32767))
          Math.floorDiv(g, 256) * 256
        }
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Audio perceptual fingerprint over the REAL decoded PCM — the
    * dHash analogue for sound: 65 fixed windows of 16 samples, each
    * reduced to a ROBUST per-window amplitude statistic (the
    * 4th-smallest |sample|, a lower-quartile order statistic), one bit
    * per adjacent-window gradient sign. Order statistics COMMUTE with
    * any monotone amplitude map — and gain-then-SYMMETRIC-clamp
    * (encodeWavMixed clamps to [-32767, 32767], not the asymmetric
    * int16 range, exactly so this holds unconditionally at full
    * scale) is monotone in |v| — so a louder copy keeps every
    * gradient sign exactly; only
    * genuine waveform noise (the twin's 8-bit requantization) moves
    * bits. Prototyped in numpy before the Scala landed: twins sit
    * 0–3 bits apart, independent mixed-hash streams ≥ 15 (binomial
    * mean 32); UnitSuite pins the Scala values. A raw energy-SUM
    * gradient fails here — the clamp compresses high-amplitude
    * windows nonuniformly (measured twin distance up to 21, inside
    * the independent range), which is exactly why the robust
    * statistic is the right fingerprint primitive.
    */
  private[graft] def audioFp(payload: Array[Byte]): Long = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    val bytes = ais.readAllBytes()
    ais.close()
    val n = bytes.length / 2
    val nwin = 65
    val wlen = 16
    require(n >= nwin * wlen, s"audio too short for fingerprint: $n samples")
    val q = new Array[Int](nwin)
    val buf = new Array[Int](wlen)
    var w = 0
    while (w < nwin) {
      var k = 0
      while (k < wlen) {
        val i = w * wlen + k
        val v = (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)
        buf(k) = math.abs(v)
        k += 1
      }
      java.util.Arrays.sort(buf)
      q(w) = buf(3)
      w += 1
    }
    var h = 0L
    var b = 0
    while (b < 64) {
      if (q(b + 1) > q(b)) h |= (1L << b)
      b += 1
    }
    h
  }

  private val audioHashSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("afp", LongType)))

  /** PERCEPTUAL audio dedup — the third modality of the dedup family
    * (text has nine mechanisms, images llm_multimodal_dedup; this op
    * dedups SOUND): every stream reduces to a 64-bit quartile-gradient
    * fingerprint IN THE SCAN STAGE (real WAV decode → 65 windows →
    * order-statistic gradient signs — only the 8-byte hash ever
    * shuffles), candidates form by 4×16-bit LSH band equality (never
    * all-pairs), survivors verify on full hamming ≤ 6 via codegen'd
    * `bit_count(xor)`. The fixture PLANTS transcoded twins in-plan
    * (every %30≡1 audio stream gains an id+1M copy at +6 dB clamped
    * gain + 8-bit requantization): gain alone cannot move a bit — the
    * order-statistic windows are gain-invariant by construction — so
    * the 0–3 bits the twins DO move are pure requantization noise,
    * and the ≤6 gate does real verification work against independents
    * at ≥15. No SQL oracle (binary decode pipeline); UnitSuite pins
    * recall 1.0 / zero extras / >10-bit separation, the image-dedup
    * precedent.
    *
    * Scale shape: blob → 8-byte fingerprint before any wide op (THE
    * multimodal rule), band join is bucket-local, verify rides the
    * candidate set — the same 100 TB contract as the image op.
    */
  val llmMultimodalDedupAudio: Op = Op(
    "llm_multimodal_dedup_audio",
    (s, dir) => {
      val enc = RowEncoder.encoderFor(audioHashSchema)
      val base = Tables.documents(s, dir).filter(col("doc_id") % 3 === 1)
        .select(col("doc_id").as("media_id"), lit(false).as("transcode"))
      val planted = base.filter(col("media_id") % 30 === 1)
        .select((col("media_id") + 1000000L).as("media_id"),
          lit(true).as("transcode"))
      val hashes = base.unionByName(planted)
        // explicit-count spread BEFORE the codec work (the image op's
        // scan-starvation treatment: one-file scans are one partition)
        .repartition(16)
        .mapPartitions { it =>
          it.map { r =>
            val id = r.getLong(0)
            val transcode = r.getBoolean(1)
            val seed = if (transcode) id - 1000000L else id
            Row(id, audioFp(encodeWavMixed(1040, seed, transcode)))
          }
        }(enc)
        .localCheckpoint(true) // 3 consumers: band explode + both verify sides
      val bands = hashes.select(col("media_id"), col("afp"),
          explode(expr("sequence(0, 3)")).as("band"))
        .select(col("media_id"), col("band"),
          expr("(afp >> (band * 16)) & 65535").as("key"))
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id").as("a_id"), col("b.media_id").as("b_id"))
        .distinct()
      cand
        .join(hashes.select(col("media_id").as("a_id"), col("afp").as("ha")), "a_id")
        .join(hashes.select(col("media_id").as("b_id"), col("afp").as("hb")), "b_id")
        .select(col("a_id"), col("b_id"),
          expr("bit_count(ha ^ hb)").cast(LongType).as("hamming"))
        .filter(col("hamming") <= 6)
        .orderBy("a_id", "b_id")
    },
    None) // binary decode pipeline: no SQL oracle; UnitSuite pins recall/separation

  /** Frame sampling + shot-boundary keyframe selection over the
    * video-kind payloads — the TEMPORAL leg of the multimodal family
    * (features = per-blob stats, dedup = cross-blob identity; this is
    * WITHIN-blob structure): the payload is cut into fixed 32-byte
    * frames (the stub codec's frame raster), each frame reduced to an
    * integer signature (unsigned byte sum — the stub stand-in for a
    * per-frame perceptual hash), and a frame is a KEYFRAME iff it opens
    * the clip or its signature jumps more than 200 from the previous
    * frame (the classic intensity-delta shot-boundary rule). Emits
    * per clip: frame/keyframe counts, the first five keyframe indices,
    * and the floor-snapped mean |Δsignature| (floor(x·1e4)/1e4 — floor
    * of identical doubles is identical; `round(double, n)` half-way
    * handling is NOT engine-portable, the textrank lesson). UNIQUELY in
    * this family the op is FULLY ORACLE-GRADED: video payloads are the
    * document's UTF-8 bytes, and the fixture corpus is pure ASCII, so
    * DuckDB reproduces every byte as `unicode(substr(text, i, 1))` —
    * the one modality whose stub decode a SQL engine can mirror
    * exactly.
    *
    * Scale shape: the multimodal rule verbatim — blobs reduce to
    * integer frame signatures inside the scan-stage mapPartitions
    * (payloads never shuffle), and only the 6-column typed rows flow
    * to the presentational sort.
    */
  private[graft] def videoKeyframes(
      payload: Array[Byte], stride: Int, thresh: Int)
      : (Int, Int, String, Long) = {
    val sigs = payload.grouped(stride)
      .map(fr => fr.map(_ & 0xff).sum.toLong).toArray
    var sumAbs = 0L
    val kf = scala.collection.mutable.ArrayBuffer(0)
    var i = 1
    while (i < sigs.length) {
      val d = math.abs(sigs(i) - sigs(i - 1))
      sumAbs += d
      if (d > thresh) kf += i
      i += 1
    }
    (sigs.length, kf.length, kf.take(5).mkString(","), sumAbs)
  }

  private val keyframeSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_frames", IntegerType),
    StructField("n_keyframes", IntegerType),
    StructField("kf_head", StringType),
    StructField("sum_abs_delta", LongType)))

  val llmMultimodalKeyframes: Op = Op(
    "llm_multimodal_keyframes",
    (s, dir) => {
      val enc = RowEncoder.encoderFor(keyframeSchema)
      media(s, dir)
        .filter(col("kind") === "video")
        .mapPartitions { batch =>
          batch.map { r =>
            val (nf, nk, head, sa) =
              videoKeyframes(r.getAs[Array[Byte]](4), 32, 200)
            Row(r.getLong(0), nf, nk, head, sa)
          }
        }(enc)
        .select(col("media_id"), col("n_frames").cast(LongType),
          col("n_keyframes").cast(LongType), col("kf_head"),
          col("sum_abs_delta"),
          when(col("n_frames") > 1,
            floor(col("sum_abs_delta") * lit(10000) /
              (col("n_frames") - 1)).cast(DoubleType) / 10000.0)
            .otherwise(0.0).as("mean_abs_delta"))
        .orderBy("media_id")
    },
    Some("""
      WITH v AS (
        SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 2
      ), fr AS (
        SELECT media_id, CAST((st - 1) // 32 AS INT) AS idx,
          substr(text, st, 32) AS f
        FROM v, LATERAL (SELECT unnest(generate_series(1, len(text), 32)) AS st)
      ), sg AS (
        SELECT media_id, idx,
          CAST(list_aggregate(list_transform(generate_series(1, len(f)),
            j -> unicode(substr(f, j, 1))), 'sum') AS BIGINT) AS sig
        FROM fr
      ), dl AS (
        SELECT media_id, idx,
          abs(sig - lag(sig) OVER (PARTITION BY media_id ORDER BY idx))
            AS ad
        FROM sg
      ), fl AS (
        SELECT media_id, idx, ad,
          CASE WHEN idx = 0 OR ad > 200 THEN 1 ELSE 0 END AS kf
        FROM dl
      )
      SELECT media_id,
        COUNT(*) AS n_frames,
        CAST(SUM(kf) AS BIGINT) AS n_keyframes,
        array_to_string(list_slice(
          list(idx ORDER BY idx) FILTER (WHERE kf = 1), 1, 5), ',')
          AS kf_head,
        CAST(coalesce(SUM(ad), 0) AS BIGINT) AS sum_abs_delta,
        CASE WHEN COUNT(*) > 1 THEN
          CAST(floor(CAST(coalesce(SUM(ad), 0) AS BIGINT) * 10000
            / (COUNT(*) - 1)) AS DOUBLE) / 10000.0
        ELSE 0.0 END AS mean_abs_delta
      FROM fl GROUP BY media_id ORDER BY media_id
    """.stripMargin.trim))

  val ops: Seq[Op] = Seq(llmMultimodalFeatures, llmMultimodalResample,
    llmMultimodalDedup, llmMultimodalDedupAudio, llmMultimodalKeyframes)
}
