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
 * signature) is real and tested; the actual codec call is STUBBED with
 * a deterministic fake (media decoding libraries are not available in
 * this environment) and isolated behind `MediaCodec` so a real codec
 * drops in without touching the plan shape.
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

  /**
   * The codec boundary. A production build implements these with a real
   * image/audio library; here they are deterministic fakes derived from
   * the payload bytes so tests are hermetic and stable. Each method
   * processes ONE record; batching/parallelism live in the operators
   * below, not here.
   */
  trait MediaCodec extends Serializable {
    def decodeImage(bytes: Array[Byte]): (Int, Int, Int, Array[Float])
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
    def sampleFrames(bytes: Array[Byte], everyNth: Int): Seq[Array[Byte]] =
      bytes.grouped(math.max(1, bytes.length / math.max(1, everyNth)))
        .take(everyNth).toSeq
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
}
