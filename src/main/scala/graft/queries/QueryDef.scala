package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One verifiable query: a Spark plan plus (when SQL-expressible) the
 * exact DuckDB oracle the driver hash-compares against. Column names and
 * types are aligned on both sides (BIGINT<->long, INT<->int, DOUBLE,
 * STRING, TIMESTAMP); floating aggregates are rounded so cross-engine
 * summation-order noise cannot flip the hash (quantum chosen >> the
 * accumulated error at the verification scale, see SURVEY.md §5).
 */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object Tables {
  /**
   * Table loader, normalizing the fixture generations' timestamp
   * encodings to plain TIMESTAMP (LTZ; every session runs UTC):
   *
   *  - TIMESTAMP(NANOS) fixtures (early rounds): Spark's reader rejects
   *    nanos outright; with `spark.sql.legacy.parquet.nanosAsLong=true`
   *    (set in Verify/Bench/test sessions) `events.ts` surfaces as a
   *    LongType of nanos, truncated here to microseconds — the same
   *    ns->us truncation DuckDB applies, so oracle comparisons stay
   *    exact.
   *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) fixtures (round 6+):
   *    Spark 4 infers TIMESTAMP_NTZ by default, which breaks
   *    `unix_micros`/window functions typed for LTZ and makes
   *    batch-vs-restaged comparisons mix java.sql.Timestamp with
   *    LocalDateTime. Our sessions disable the inference
   *    (`spark.sql.parquet.inferTimestampNTZ.enabled=false`, reading
   *    them as UTC TIMESTAMP like DuckDB's naive reading); the cast
   *    below covers foreign sessions that didn't set it.
   */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    val normalized = df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == org.apache.spark.sql.types.TimestampNTZType)
        d.withColumn(f.name, d.col(f.name).cast("timestamp"))
      else d
    }
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      normalized.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    else normalized
  }
}
