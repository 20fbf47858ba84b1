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
   * Table loader. `events.parquet` carries TIMESTAMP(NANOS), which
   * Spark's parquet reader rejects outright; with
   * `spark.sql.legacy.parquet.nanosAsLong=true` (set in Verify/Bench/
   * test sessions) it surfaces as a LongType of nanos, which we truncate
   * to microsecond timestamps — the same ns->us truncation DuckDB
   * applies, so oracle comparisons stay exact.
   */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    else df
  }
}
