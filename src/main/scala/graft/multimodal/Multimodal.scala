package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing for a training-data pipeline: media
 * (image/audio/video) as opaque BINARY columns + typed metadata, with
 * decode / feature-extract / resize / frame-sample implemented as
 * partition-local batch transforms (`mapPartitions`) over the binary
 * payloads — the Scala analog of PySpark's `mapInPandas` batch UDF
 * shape. The Spark-side plumbing (schema, partitioning, batch
 * signature) is real and tested. Codec status: IMAGE decode is real
 * ([[Multimodal.ImageIoCodec]], the JDK's `javax.imageio`), AUDIO
 * decode is real (same codec object, the JDK's `javax.sound.sampled`
 * — WAV/PCM/µ-law/a-law), and VIDEO frame sampling is real for the
 * containers a bare JVM can demux ([[VideoDemux]]: Y4M raw YUV and
 * MJPEG-in-AVI, whose frames are complete JPEGs) — all zero added
 * dependencies. Compressed video codecs (H.264 etc.) remain out of
 * scope behind the same `MediaCodec` seam: the JDK ships no entropy
 * decoder, so those payloads degrade to zero frames and a real
 * decoder drops in without touching the plan shape.
 */
object Multimodal {

  /** Media table schema: id + kind + raw bytes + sidecar metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Decoded-image feature schema appended by `decodeImages`. */
  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Decoded-audio feature schema appended by `decodeAudio`. */
  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("audio_channels", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("audio_features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /**
   * The codec boundary. A production build implements these with a real
   * image/audio library; here they are deterministic fakes derived from
   * the payload bytes so tests are hermetic and stable. Each method
   * processes ONE record; batching/parallelism live in the operators
   * below, not here.
   */
  trait MediaCodec extends Serializable {
    def decodeImage(bytes: Array[Byte]): (Int, Int, Int, Array[Float])
    /** (sampleRate, channels, pcmFrames, 16-dim features). */
    def decodeAudio(bytes: Array[Byte]): (Int, Int, Long, Array[Float])
    def sampleFrames(bytes: Array[Byte], everyNth: Int): Seq[Array[Byte]]
  }

  /** STUB codec: shape + features derived deterministically from bytes.
    * Replace with a real decoder (??? boundary) for production use. */
  object FakeCodec extends MediaCodec {
    private def mix(h0: Long): Long = {
      var z = h0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def decodeImage(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      var h = 1469598103934665603L
      var i = 0
      while (i < bytes.length) { h = mix(h ^ bytes(i)); i += 1 }
      val w = 64 + math.floorMod(h, 448).toInt           // 64..511
      val ht = 64 + math.floorMod(h >>> 16, 448).toInt
      val features = Array.tabulate(16) { j =>
        (math.floorMod(mix(h + j), 2000L) / 1000.0f) - 1.0f
      }
      (w, ht, 3, features)
    }
    def decodeAudio(bytes: Array[Byte]): (Int, Int, Long, Array[Float]) = {
      var h = 1469598103934665603L
      var i = 0
      while (i < bytes.length) { h = mix(h ^ bytes(i)); i += 1 }
      val rate = 8000 + math.floorMod(h, 40000L).toInt
      val channels = 1 + math.floorMod(h >>> 8, 2L).toInt
      val features = Array.tabulate(16) { j =>
        (math.floorMod(mix(h + 31L * j), 2000L) / 1000.0f) - 1.0f
      }
      (rate, channels, bytes.length.toLong, features)
    }
    def sampleFrames(bytes: Array[Byte], everyNth: Int): Seq[Array[Byte]] =
      bytes.grouped(math.max(1, bytes.length / math.max(1, everyNth)))
        .take(everyNth).toSeq
  }

  /**
   * Real image decoder over the JDK's `javax.imageio` (PNG/JPEG/GIF/
   * BMP) — no added dependencies. Returns the true (width, height,
   * numComponents) and a 16-dim feature vector: mean luminance of a
   * 4×4 spatial grid scaled to [-1, 1] — deterministic and
   * resolution-independent (the brute-force analog of the pooled CNN
   * features a production pipeline would emit here).
   *
   * Audio decode is REAL too, over the JDK's `javax.sound.sampled`
   * (WAV containers; PCM signed/unsigned/float plus µ-law/a-law via
   * the JDK's format converters): payloads decode to 16-bit PCM and
   * emit (sampleRate, channels, pcmFrames) plus a 16-dim feature
   * vector — per-segment RMS energy over 16 equal temporal segments of
   * the channel-mixed signal, scaled to [-1, 1] (the temporal analog
   * of the image grid's pooled luminance).
   *
   * Undecodable payloads degrade to (0, 0, 0, empty) rather than
   * throwing: on a 100-TB scan one corrupt record must not kill the
   * task; callers filter `channels > 0` for the clean subset. Video
   * frame sampling stays at the [[FakeCodec]] stub (no JDK demuxer).
   */
  /** `ImageIO`'s default stream cache is a TEMP FILE per read/write
    * (`FileCacheImageInput/OutputStream`): at data scale that is one
    * disk round-trip per image and a syscall storm under concurrent
    * tasks (round 17 measured the 32-task q108 codec stage burning
    * 87 CPU-seconds vs 4 single-task — temp-file churn, not decode).
    * Payloads here are in-memory byte arrays; cache them in memory.
    * Evaluated once per JVM (executor or driver) on first codec use. */
  private lazy val imageIoMemCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  object ImageIoCodec extends MediaCodec {
    def decodeImage(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) =
      try {
        imageIoMemCache
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) (0, 0, 0, Array.empty[Float])
        else {
          val w = img.getWidth
          val h = img.getHeight
          val features = new Array[Float](16)
          var gy = 0
          while (gy < 4) {
            var gx = 0
            while (gx < 4) {
              // block [x0,x1)x[y0,y1); on tiny images an empty block
              // falls back to its anchor pixel
              val x0 = gx * w / 4; val x1 = math.max(x0 + 1, (gx + 1) * w / 4)
              val y0 = gy * h / 4; val y1 = math.max(y0 + 1, (gy + 1) * h / 4)
              var sum = 0L
              var n = 0
              var y = y0
              while (y < y1 && y < h) {
                var x = x0
                while (x < x1 && x < w) {
                  val rgb = img.getRGB(math.min(x, w - 1), math.min(y, h - 1))
                  val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
                  sum += (299 * r + 587 * g + 114 * b) / 1000
                  n += 1
                  x += 1
                }
                y += 1
              }
              val mean = if (n == 0) 0.0 else sum.toDouble / n
              features(gy * 4 + gx) = (mean / 255.0 * 2.0 - 1.0).toFloat
              gx += 1
            }
            gy += 1
          }
          (w, h, img.getColorModel.getNumComponents, features)
        }
      } catch { case _: Exception => (0, 0, 0, Array.empty[Float]) }

    def decodeAudio(bytes: Array[Byte]): (Int, Int, Long, Array[Float]) =
      try {
        import javax.sound.sampled.{AudioFormat, AudioSystem}
        val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        val fmt = in.getFormat
        val channels = fmt.getChannels
        // normalize every encoding to 16-bit signed little-endian PCM;
        // the JDK converter handles u-law/a-law/8-bit/big-endian forms
        val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, channels, 2 * channels, fmt.getSampleRate, false)
        val pcm = AudioSystem.getAudioInputStream(pcmFmt, in)
        val data = pcm.readAllBytes()
        val bytesPerFrame = 2 * channels
        val nFrames = data.length / bytesPerFrame
        val features = new Array[Float](16)
        var seg = 0
        while (seg < 16) {
          // Long arithmetic: seg * nFrames overflows Int past ~143M PCM
          // frames (~4.8 h mono at 8 kHz), which would corrupt indices
          val f0 = (seg.toLong * nFrames / 16).toInt
          val f1 = math.max(f0 + 1, ((seg + 1).toLong * nFrames / 16).toInt)
          var sumSq = 0.0
          var n = 0
          var f = f0
          while (f < f1 && f < nFrames) {
            var c = 0
            var acc = 0.0
            while (c < channels) {
              val idx = f * bytesPerFrame + 2 * c
              val sample = (((data(idx + 1) << 8) | (data(idx) & 0xff)).toShort) / 32768.0
              acc += sample
              c += 1
            }
            val s = acc / channels
            sumSq += s * s
            n += 1
            f += 1
          }
          val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
          features(seg) = (rms * 2.0 - 1.0).toFloat
          seg += 1
        }
        (fmt.getSampleRate.toInt, channels, nFrames.toLong, features)
      } catch { case _: Exception => (0, 0, 0L, Array.empty[Float]) }

    /** REAL video frame sampling for the containers a bare JVM can
      * demux: Y4M (raw YUV) and MJPEG-in-AVI, whose sampled frames are
      * complete JPEGs that feed straight back into [[decodeImages]].
      * Compressed codecs (H.264 etc.) yield no frames — the JDK ships
      * no entropy decoder; see [[VideoDemux]]. */
    def sampleFrames(bytes: Array[Byte], everyNth: Int): Seq[Array[Byte]] =
      VideoDemux.sampleFrames(bytes, everyNth)
  }

  /**
   * Decode an image-bytes column into (width, height, channels,
   * features) via partition-local batches. One task decodes one
   * partition's records sequentially — at scale, parallelism = number
   * of partitions, and payload bytes never cross the driver.
   */
  def decodeImages(media: DataFrame, codec: MediaCodec = FakeCodec): DataFrame = {
    val outSchema = StructType(media.schema.fields ++ imageFeatureSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        val (w, h, c, f) =
          if (bytes == null) (0, 0, 0, Array.empty[Float])
          else codec.decodeImage(bytes)
        Row.fromSeq(r.toSeq ++ Seq(w, h, c, f))
      }
    }(enc)
  }

  /**
   * Decode an audio-bytes column into (sample_rate, audio_channels,
   * n_frames, audio_features) — same partition-local batch shape as
   * [[decodeImages]]: one task decodes one partition sequentially,
   * payload bytes never cross the driver.
   */
  def decodeAudio(media: DataFrame, codec: MediaCodec = FakeCodec): DataFrame = {
    val outSchema = StructType(media.schema.fields ++ audioFeatureSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        val (sr, ch, nf, feats) =
          if (bytes == null) (0, 0, 0L, Array.empty[Float])
          else codec.decodeAudio(bytes)
        Row.fromSeq(r.toSeq ++ Seq(sr, ch, nf, feats))
      }
    }(enc)
  }

  /** Resize plan: metadata-only transform (target dims recorded; actual
    * pixel work happens at the codec boundary in production). */
  def withResizeTarget(decoded: DataFrame, maxSide: Int): DataFrame =
    decoded
      .withColumn("scale",
        when(greatest(col("width"), col("height")) <= maxSide, lit(1.0))
          .otherwise(lit(maxSide).cast("double") / greatest(col("width"), col("height"))))
      .withColumn("target_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("target_height", floor(col("height") * col("scale")).cast("int"))

  /** Frame sampling for video rows: explode into one row per sampled
    * frame, carrying (media_id, frame_idx, frame_bytes). */
  def sampleVideoFrames(media: DataFrame, everyNth: Int,
      codec: MediaCodec = FakeCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_bytes", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.filter(col("kind") === "video").select("media_id", "bytes")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          if (bytes == null) Iterator.empty
          else codec.sampleFrames(bytes, everyNth).iterator.zipWithIndex
            .map { case (fb, i) => Row(id, i, fb) }
        }
      }(enc)
  }

  /** Build a synthetic media table from any text column (test fixture
    * path: documents.text bytes play the payload role). */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String, kind: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"), lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("bytes"),
      map(lit("origin"), lit("synthetic")).as("meta"))

  /** One solid-gray JPEG, `w`x`h`, gray level `g` (0..255) — encoded
    * with the JDK's real JPEG writer, so demuxed frames exercise the
    * genuine bytes -> javax.imageio path. */
  private[multimodal] def solidJpeg(w: Int, h: Int, g: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (g << 16) | (g << 8) | g
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    imageIoMemCache
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /**
   * Deterministic MJPEG-in-AVI fixture table at DATA scale: one video
   * per input row, generated partition-locally (`2 + id % 7` real
   * JPEG frames, 32x24, gray level `(id*31 + frame*17) % 256`, muxed
   * by [[VideoDemux.writeAviMjpeg]]). This is how the video path gets
   * exercised at bench scale without binary fixtures in the repo: the
   * generation is a deterministic function of the id column, runs
   * where the data lives, and the payload bytes never cross the
   * driver — the same shape a real ingest scan would have.
   */
  def syntheticMjpegVideos(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    // The generator's input is 8 bytes/row but its output is a whole
    // encoded video: spread the id rows BEFORE the codec work so the
    // encode runs at session parallelism even off a one-split scan
    // (guide §8: shuffle the lightweight proxy, compute heavy bytes
    // after). No-op when the scan already has >= cores splits.
    graft.operators.Parallelism.spreadForMapWork(
        df.select(col(idCol).cast("long").as("media_id")), "media_id")
      .mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val nFrames = 2 + (id % 7).toInt
        val frames = (0 until nFrames).map { f =>
          solidJpeg(32, 24, ((id * 31 + f * 17) % 256).toInt)
        }
        Row(id, "video", VideoDemux.writeAviMjpeg(frames),
          Map("origin" -> "synthetic-mjpeg"))
      }
    }(enc)
  }
}
