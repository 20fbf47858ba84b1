package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Expression, IsNotNull}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias}
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
 * SubqueryAlias nodes, or under Filter nodes whose every conjunct is
 * `IsNotNull` — the common `filter(embedding IS NOT NULL)` sizing
 * shape) and falls back to one `count()` action otherwise (other
 * filters, joins, in-memory data).
 *
 * The returned count is an UPPER bound on the rows the plan yields,
 * which is the safe direction: over-counting only ever SHRINKS buckets
 * (more bits), preserving the linear candidate-mass contract; see
 * [[graft.operators.Similarity.lshKnnJoin]]. For an IsNotNull filter
 * on a flat top-level primitive column the footer's per-column-chunk
 * null counts tighten the bound to the exact non-null count for free.
 * For nested/repeated columns (e.g. `array<float>` embeddings) the
 * leaf null count also includes element-level and empty-list slots —
 * subtracting it could UNDER-count rows (the unsafe direction), so
 * those columns contribute no subtraction and the bound stays at the
 * footer row count.
 */
object TableStats {

  /** Exact-or-upper-bound row count from parquet footers when the plan
    * allows it (no Spark job), else one `count()` action. */
  def rowCountForSizing(df: DataFrame): Long =
    metadataRowCount(df).getOrElse(df.count())

  /** `Some(rowUpperBound)` iff `df` is a plain parquet relation scan
    * under only cardinality-preserving nodes and all-IsNotNull Filters.
    * Driver-side footer reads only. */
  def metadataRowCount(df: DataFrame): Option[Long] = {
    // IsNotNull conjuncts on direct attributes; anything else => None
    def notNullCols(cond: Expression): Option[Set[String]] = cond match {
      case And(l, r) =>
        for (a <- notNullCols(l); b <- notNullCols(r)) yield a ++ b
      case IsNotNull(a: AttributeReference) => Some(Set(a.name))
      case _ => None
    }
    def relationOf(p: LogicalPlan): Option[(HadoopFsRelation, Set[String])] = p match {
      case Project(_, child)       => relationOf(child)
      case SubqueryAlias(_, child) => relationOf(child)
      case Filter(cond, child) =>
        for {
          cols <- notNullCols(cond)
          (fs, inner) <- relationOf(child)
        } yield (fs, cols ++ inner)
      case l: LogicalRelation =>
        l.relation match {
          case fs: HadoopFsRelation if fs.fileFormat.isInstanceOf[ParquetFileFormat] =>
            Some((fs, Set.empty))
          case _ => None
        }
      case _ => None
    }
    relationOf(df.queryExecution.optimizedPlan).flatMap { case (fs, cols) =>
      val conf = df.sparkSession.sessionState.newHadoopConf()
      val files = fs.location.inputFiles
      if (files.isEmpty) Some(0L)
      else
        try Some(files.iterator.map { f =>
          val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
          try {
            val footer = reader.getFooter
            val rows = reader.getRecordCount
            if (cols.isEmpty) rows
            else {
              // exact record-level null counts exist only for FLAT
              // top-level primitives (path length 1); nested leaves
              // conflate element/empty-list nulls => contribute 0
              import scala.jdk.CollectionConverters._
              val nullsByCol = cols.map { c =>
                var nulls = 0L
                var flatWithStats = false
                footer.getBlocks.asScala.foreach { block =>
                  block.getColumns.asScala.foreach { cc =>
                    val path = cc.getPath.toArray
                    if (path.length == 1 && path(0) == c) {
                      val st = cc.getStatistics
                      if (st != null && st.isNumNullsSet) {
                        nulls += st.getNumNulls
                        flatWithStats = true
                      }
                    }
                  }
                }
                if (flatWithStats) nulls else 0L
              }
              // rows satisfying ALL IsNotNull conjuncts <= rows minus
              // the largest single column's null count
              rows - (if (nullsByCol.isEmpty) 0L else nullsByCol.max)
            }
          } finally reader.close()
        }.sum)
        catch { case scala.util.control.NonFatal(_) => None }
    }
  }
}
