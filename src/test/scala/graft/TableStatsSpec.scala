package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import graft.sources.TableStats

/** Metadata-only sizing counts (VERDICT r7 task 4): autoBits callers
  * must not spend a full-scan count() action to pick bucket bits. */
class TableStatsSpec extends SparkSpec {

  /** Runs `body` and returns (result, number of Spark jobs submitted). */
  private def countingJobs[A](body: => A): (A, Int) = {
    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = body
      // listener bus is async; give it a moment to deliver
      Thread.sleep(500)
      (r, jobs)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("metadata row count matches count() on a bare parquet scan, with zero jobs") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val expected = e.count()
    val (got, jobs) = countingJobs(TableStats.rowCountForSizing(e))
    assert(got === expected)
    assert(jobs === 0, "sizing count must come from parquet footers, not a Spark job")
  }

  test("projection-only plans stay on the metadata path") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id", "embedding")
    val (got, jobs) = countingJobs(TableStats.metadataRowCount(e))
    assert(got.nonEmpty)
    assert(jobs === 0)
  }

  test("filtered plans fall back to an exact count() action") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").filter(col("vec_id") > 10)
    assert(TableStats.metadataRowCount(e).isEmpty)
    assert(TableStats.rowCountForSizing(e) === e.count())
  }

  test("isNotNull-filtered plans stay on the metadata path with zero jobs") {
    // the common sizing call: filter(embedding IS NOT NULL) over a bare
    // scan (VERDICT r8 task 8). embedding is a nested (array) column =>
    // no null-count subtraction, bound = footer row count; the point
    // pinned here is NO JOB, and the bound is a safe upper bound.
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("embedding").isNotNull)
    val (got, jobs) = countingJobs(TableStats.metadataRowCount(e))
    assert(got.nonEmpty)
    assert(jobs === 0, "isNotNull sizing must come from footers, not a job")
    assert(got.get >= e.count(), "footer bound must be an upper bound")
  }

  test("isNotNull on a flat primitive column subtracts exact footer null counts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tstats").toString
    Seq[(java.lang.Long, java.lang.Long)]((1L, 10L), (2L, null),
        (3L, 30L), (4L, null), (5L, 50L))
      .toDF("id", "maybe")
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val t = spark.read.parquet(s"$dir/t.parquet").filter(col("maybe").isNotNull)
    val (got, jobs) = countingJobs(TableStats.metadataRowCount(t))
    assert(jobs === 0)
    assert(got === Some(3L)) // exact: 5 rows - 2 nulls
    assert(TableStats.rowCountForSizing(t) === 3L)
  }

  test("non-isNotNull filter conjuncts still fall back to count()") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("embedding").isNotNull && col("vec_id") > 10)
    assert(TableStats.metadataRowCount(e).isEmpty)
  }

  test("in-memory relations fall back to count()") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    assert(TableStats.metadataRowCount(df).isEmpty)
    assert(TableStats.rowCountForSizing(df) === 3L)
  }
}
