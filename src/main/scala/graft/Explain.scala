package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: dumps the formatted physical plan of each named query
  * (or all) so pushdown (`PushedFilters`), pruned `ReadSchema`,
  * broadcast joins, `TakeOrderedAndProject`, and WholeStageCodegen
  * spans can be inspected. Usage: Explain <sfDir> [queryName...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.allQueries
      .filter(q => only.isEmpty || only.contains(q.name))
      .foreach { q =>
        println(s"\n========== ${q.name} ==========")
        try println(q.run(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
