package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/**
 * Metadata-only table statistics for operator SIZING decisions.
 *
 * [[graft.operators.Similarity.autoBits]] needs the corpus row count to
 * pick LSH bucket bits. Running a `count()` action for that is a full
 * column scan — at 100 TB that is an entire extra wave of tasks spent
 * to compute a number we only consume at log2 precision. Parquet
 * already stores the exact row count in every file footer, so the
 * driver can read it from metadata alone (footers are KBs; no Spark
 * job, no executor involvement — the same source `ANALYZE TABLE`-style
 * catalog stats are built from).
 *
 * `rowCountForSizing` returns the footer count when the plan is a bare
 * parquet scan (optionally under cardinality-preserving Project /
 * SubqueryAlias nodes) and falls back to one `count()` action
 * otherwise (filters, joins, in-memory data). The footer count
 * includes rows whose embedding is null — an upper bound on the
 * non-null corpus. For log2-scale sizing that drift is at most one
 * bucket bit unless the column is majority-null, and over-counting
 * only ever SHRINKS buckets (more bits), which preserves the linear
 * candidate-mass contract; see [[graft.operators.Similarity.lshKnnJoin]].
 */
object TableStats {

  /** Exact row count from parquet footers when the plan allows it
    * (no Spark job), else one `count()` action. */
  def rowCountForSizing(df: DataFrame): Long =
    metadataRowCount(df).getOrElse(df.count())

  /** `Some(totalRows)` iff `df` is a plain parquet relation scan under
    * only cardinality-preserving nodes. Driver-side footer reads only. */
  def metadataRowCount(df: DataFrame): Option[Long] = {
    def relationOf(p: LogicalPlan): Option[HadoopFsRelation] = p match {
      case Project(_, child)       => relationOf(child)
      case SubqueryAlias(_, child) => relationOf(child)
      case l: LogicalRelation =>
        l.relation match {
          case fs: HadoopFsRelation if fs.fileFormat.isInstanceOf[ParquetFileFormat] =>
            Some(fs)
          case _ => None
        }
      case _ => None
    }
    relationOf(df.queryExecution.optimizedPlan).flatMap { fs =>
      val conf = df.sparkSession.sessionState.newHadoopConf()
      val files = fs.location.inputFiles
      if (files.isEmpty) Some(0L)
      else
        try Some(files.iterator.map { f =>
          val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
          try reader.getRecordCount finally reader.close()
        }.sum)
        catch { case scala.util.control.NonFatal(_) => None }
    }
  }
}
