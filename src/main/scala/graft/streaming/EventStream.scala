package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/**
 * Structured Streaming ingest over events-shaped data (beyond-parity
 * extension, SURVEY.md §2.8): watermarked tumbling/sliding window
 * aggregation and streaming sessionization-ready event parsing. The
 * batch mirror of the windowed aggregate is EventQueries.q41 — the
 * same transform function is shared so batch and streaming cannot
 * drift.
 */
object EventStream {

  /** events-shaped schema for file-stream sources (micros timestamps). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = true),
    StructField("props", StringType, nullable = true)))

  /** Shared transform: watermark + tumbling window counts per type.
    * Works on both batch and streaming DataFrames. */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("value_sum"))
  }

  /** Start a file-source stream over a directory of event parquet/json. */
  def startFileStream(spark: SparkSession, dir: String, queryName: String,
      format: String = "parquet"): StreamingQuery = {
    val stream = spark.readStream.schema(eventSchema).format(format).load(dir)
    tumblingCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
