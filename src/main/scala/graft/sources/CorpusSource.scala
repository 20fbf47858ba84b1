package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Uniform corpus ingestion across the formats a training-data pipeline
 * actually receives: parquet, ORC, JSONL, and CSV — with an enforced schema
 * (no runaway inference jobs over TB-scale text), permissive parsing
 * with a corrupt-record column, and a normalizing projection so every
 * downstream operator sees the same shape regardless of wire format.
 */
object CorpusSource {

  /** documents-shaped schema (FIXTURES.md §B). */
  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  private val schemaWithCorrupt =
    StructType(documentSchema.fields :+ StructField("_corrupt_record", StringType))

  /**
   * Read a documents corpus. `format`: parquet | orc | jsonl | csv.
   * Malformed JSONL/CSV rows are dropped (counted rows carry null
   * doc_id after permissive parse) rather than failing the job — at
   * corpus scale a bad record must never kill the pipeline.
   */
  def readDocuments(spark: SparkSession, path: String, format: String = "parquet"): DataFrame = {
    val raw = format.toLowerCase match {
      case "parquet" => spark.read.schema(documentSchema).parquet(path)
      case "orc" => spark.read.schema(documentSchema).orc(path)
      case "jsonl" | "json" =>
        spark.read.schema(schemaWithCorrupt)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(path)
          .filter(col("_corrupt_record").isNull && col("doc_id").isNotNull)
          .drop("_corrupt_record")
      case "csv" =>
        spark.read.schema(documentSchema)
          .option("header", "true")
          .option("mode", "DROPMALFORMED")
          .csv(path)
          .filter(col("doc_id").isNotNull)
      case other => throw new IllegalArgumentException(s"unsupported format: $other")
    }
    raw.select(documentSchema.fieldNames.toIndexedSeq.map(col): _*)
  }

  /** Write a documents corpus (same formats; jsonl = one object/line). */
  def writeDocuments(df: DataFrame, path: String, format: String = "parquet"): Unit =
    format.toLowerCase match {
      case "parquet" => df.write.mode("overwrite").parquet(path)
      case "orc" => df.write.mode("overwrite").orc(path)
      case "jsonl" | "json" => df.write.mode("overwrite").json(path)
      case "csv" => df.write.mode("overwrite").option("header", "true").csv(path)
      case other => throw new IllegalArgumentException(s"unsupported format: $other")
    }
}
