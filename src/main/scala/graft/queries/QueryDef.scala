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
    run: (SparkSession, String) => DataFrame,
    // Dir-aware oracle GENERATOR for queries whose replay SQL embeds
    // trained-but-deterministic state (seeded k-means centroids, seeded
    // LSH hyperplanes) or data-sized parameters (autoBits): once the
    // state is dumped as SQL literals the rest of the query is pure
    // arithmetic DuckDB replays exactly. The generator may return None
    // (→ rows-only check) when a precondition for exact replay fails at
    // this dir — e.g. a sign/argmin margin below the cross-engine noise
    // floor, or a bucket past the width cap (thinning is id-hash-seeded,
    // not SQL-expressible).
    oracleGen: Option[(SparkSession, String) => Option[String]] = None) {

  /** The oracle to dump for `dir`: generated when a generator exists,
    * else the static SQL. */
  def oracleAt(spark: SparkSession, dir: String): Option[String] =
    oracleGen match {
      case Some(g) => g(spark, dir)
      case None => oracle
    }
}

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
