package graft.tools_scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/**
 * Scan-bytes receipt for the Matryoshka stored-prefix claim (VERDICT
 * r16 item 3, Similarity.matryoshkaTopK scaladoc): slicing the full
 * embedding column at read time still reads EVERY embedding byte off
 * parquet — only a STORED prefix column lets column pruning cut the
 * coarse pass's scan I/O to ~coarseDims/dim.
 *
 * Writes the sf embeddings to parquet twice-columned (embedding 64-d
 * + prefix16 = slice(embedding,1,16) stored at write time), then runs
 * the coarse+rerank operator both ways and reports per-leg input
 * bytes (stage inputMetrics) and wall. Also asserts the two forms
 * return IDENTICAL rows (the prefix column is definitionally the
 * slice, so only the plan changes).
 *
 * Usage: tools/run.sh graft.tools_scratch.MatryoshkaProbe [sfDir] [copies]
 *   copies multiplies the corpus (id-offset replicas) so the scan is
 *   big enough for bytes to dominate fixed overheads.
 */
object MatryoshkaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/data/sf1")
    val copies = args.lift(1).flatMap(_.toIntOption).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("matryoshka-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val big = (0 until copies).map(i =>
        base.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          col("embedding")))
      .reduce(_ unionByName _)
    val path = "/tmp/matryoshka_probe_corpus.parquet"
    big.withColumn("prefix16",
        slice(col("embedding"), lit(1), lit(16)).cast("array<float>"))
      .write.mode("overwrite").parquet(path)
    val corpus = spark.read.parquet(path)
    val n = corpus.count()
    val dim = corpus.select(size(col("embedding"))).first().getInt(0)
    println(s"[matryoshka] corpus n=$n dim=$dim prefix=16 at $path")

    val queries = corpus.filter(col("vec_id") < 8)
      .select("vec_id", "embedding").localCheckpoint(true)

    // --- the claim: COARSE-PASS scan bytes ∝ coarseDims/dim ---
    // Local-FS inputMetrics do NOT track parquet column bytes (BytesProbe
    // measured a flat 0.35 MiB for every projection of this 51 MB file),
    // so the receipt is computed from the parquet FOOTERS: per-column
    // compressed chunk sizes — exactly the bytes a scan of that column
    // set must fetch — plus the plan's ReadSchema proving which columns
    // each leg reads.
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val colBytes = scala.collection.mutable.Map.empty[String, Long]
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.getPath.getName.endsWith(".parquet")).foreach { st =>
        val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(st.getPath, conf))
        try {
          rdr.getFooter.getBlocks.forEach { b =>
            b.getColumns.forEach { c =>
              val top = c.getPath.toDotString.split('.').head
              colBytes(top) = colBytes.getOrElse(top, 0L) + c.getTotalSize
            }
          }
        } finally rdr.close()
      }
    val embB = colBytes.getOrElse("embedding", 0L)
    val preB = colBytes.getOrElse("prefix16", 0L)
    val idB = colBytes.getOrElse("vec_id", 0L)
    println(f"[matryoshka] column chunks: vec_id ${idB / 1048576.0}%.1f MiB, embedding ${embB / 1048576.0}%.1f MiB, prefix16 ${preB / 1048576.0}%.1f MiB")

    def poolPlan(prefix: Option[String]) =
      Similarity.matryoshkaPool(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", coarseDims = 16,
        poolSize = 30, prefixCol = prefix)
    def readSchema(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("ReadSchema"))
        .map(_.dropWhile(_ != 'R')).mkString("; ")
    val rsSlice = readSchema(poolPlan(None))
    val rsPrefix = readSchema(poolPlan(Some("prefix16")))
    println(s"[matryoshka] slice leg   $rsSlice")
    println(s"[matryoshka] prefix leg  $rsPrefix")
    require(rsSlice.contains("embedding") && !rsSlice.contains("prefix16"),
      "slice leg should read the embedding column only")
    require(rsPrefix.contains("prefix16") && !rsPrefix.contains("embedding"),
      "prefix leg should read the prefix16 column only")
    val sliceScan = idB + embB
    val prefixScan = idB + preB
    println(f"[matryoshka] coarse-scan bytes: slice-on-read ${sliceScan / 1048576.0}%.1f MiB vs stored-prefix ${prefixScan / 1048576.0}%.1f MiB = ${sliceScan.toDouble / prefixScan}%.1f x (dim/coarseDims = ${dim / 16.0}%.1f)")

    def runPool(label: String, prefix: Option[String]): Seq[String] = {
      val t0 = System.nanoTime()
      val rows = poolPlan(prefix)
        .select("query_id", "neighbor_id")
        .orderBy("query_id", "neighbor_id")
        .collect().map(_.toString).toSeq
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[matryoshka] pool/$label%-24s $dt%6.2f s")
      rows
    }
    val poolSlice = runPool("slice-on-read", None)
    val poolPrefix = runPool("stored prefix16", Some("prefix16"))
    require(poolSlice == poolPrefix,
      "stored-prefix pool diverged from slice-on-read pool")

    // end-to-end parity (the rerank re-fetch reads the full embedding
    // column either way)
    def runFull(label: String, prefix: Option[String]): Seq[String] = {
      val t0 = System.nanoTime()
      val rows = Similarity.matryoshkaTopK(corpus, "vec_id", "embedding",
          queries, "vec_id", "embedding", k = 10, coarseDims = 16,
          poolSize = 30, prefixCol = prefix)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
        .collect().map(_.toString).toSeq
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[matryoshka] full/$label%-24s $dt%6.2f s")
      rows
    }
    val rowsSlice = runFull("slice-on-read", None)
    val rowsPrefix = runFull("stored prefix16", Some("prefix16"))
    require(rowsSlice == rowsPrefix,
      "stored-prefix form diverged from slice-on-read form")
    println(s"[matryoshka] identical ${poolSlice.size} pool rows and ${rowsSlice.size} result rows across both layouts")
    spark.stop()
  }
}
