package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Physical data layout for the 100 TB read path. Two levers the query
 * planner exploits for free once the data is written right:
 *
 *  - **Bucketing** (`writeBucketed`): pre-hash-partition a table on
 *    its join/aggregation key into a fixed bucket count. Two tables
 *    bucketed on the same key with the same count join WITHOUT any
 *    exchange — the shuffle that dominates a fact-fact join at scale
 *    is paid once at write time, then amortized over every subsequent
 *    join/aggregate on that key. Sorted buckets additionally let
 *    sort-merge join skip its sort.
 *
 *  - **Range clustering** (`writeClustered`): range-partition +
 *    sort by the hot filter columns before writing parquet, so each
 *    file (and row group) covers a narrow slice of the filter space.
 *    Parquet min/max footer stats then let pushed predicates skip
 *    whole files/row groups — I/O proportional to selectivity, not
 *    table size. (This is the sorted-layout half of Z-ordering; for
 *    one or two correlated columns, lexicographic range-sort gives
 *    the same skipping without interleaved bit tricks.)
 *
 * Both write plain parquet readable by any engine; bucketing metadata
 * lives in the session catalog (Spark's bucketed-table contract).
 */
object Layout {

  /** Write `df` as a bucketed, per-bucket-sorted catalog table. The
    * bucket count is a layout contract: pick once per key domain
    * (co-bucketed tables must match) and size so one bucket of the
    * LARGEST table fits an executor (#buckets >= table_bytes /
    * executor_working_set). */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
      numBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .format("parquet")
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(table)

  /** Shuffle-free equi-join of two co-bucketed tables (callers assert
    * the plan; this is just the read side). */
  def bucketedTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Range-cluster `df` by `cols` into `numFiles` parquet files at
    * `path`: global range partition + in-file sort = tight per-file
    * min/max stats on every prefix of `cols`. */
  def writeClustered(df: DataFrame, path: String, numFiles: Int,
      cols: String*): Unit =
    df.repartitionByRange(numFiles, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
}
