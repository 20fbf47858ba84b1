package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Measured A/B of the two candidate trainers for the semantic curation
 * stage (q111's dominant sf10 cost): the current exact-assignment
 * distributed Lloyd (`SemDedup.trainModel` → `IvfModel.trainDistributed`)
 * vs sampled local-Lloyd init + distributed mean refinement
 * (`IvfModel.trainSampled`). Runs on the SAME curated+embedded corpus
 * the q111 stage trains on, interleaved min-of-N wall times, plus the
 * two quality gates the round-10 verdict asked for before any rewiring:
 * corpus inertia parity (mean squared distance to assigned centroid)
 * and drop-set agreement of the resulting semDedup keep decisions.
 *
 * Round 11 second use: same harness, B side = `trainMiniBatch`
 * (Sculley WWW'10 aggregated form) — select with the mode arg.
 *
 * Usage: TrainAbProbe <sfDir> [runs=3] [mode=sampled|minibatch]
 * (prints one JSON line)
 */
object TrainAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val mode = if (args.length > 2) args(2) else "minibatch"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.CorpusPipeline
    import graft.pipeline.CorpusPipeline.CurationConfig
    val docs = graft.queries.Tables.table(spark, sfDir, "documents")
    // the exact corpus the q111 semantic stage trains on: curated +
    // lexically deduped + embedded (semantic stage itself off)
    val curated = CorpusPipeline.curate(docs, "doc_id", "text",
      CurationConfig(minQuality = 0.5, nearDupJaccard = 0.6,
        semanticMinCosine = None))
      .select("doc_id", "embedding").localCheckpoint(true)
    val n = curated.count()
    val k = math.max(2, math.min(4096, (n / 64L).toInt))
    println(s"[ab] corpus n=$n k=$k")

    def time(f: => graft.index.IvfModel): (graft.index.IvfModel, Double) = {
      val t0 = System.nanoTime()
      val m = f
      (m, (System.nanoTime() - t0) / 1e9)
    }
    var tA = List.empty[Double]; var tB = List.empty[Double]
    var mA: graft.index.IvfModel = null; var mB: graft.index.IvfModel = null
    for (r <- 1 to runs) {
      val (a, ta) = time(graft.operators.SemDedup.trainModel(curated, "embedding"))
      val (b, tb) = time(mode match {
        case "sampled" => graft.index.IvfModel.trainSampled(curated, "embedding",
          nlist = k, maxIter = 10, refineIters = 2)
        case _ => graft.index.IvfModel.trainMiniBatch(curated, "embedding",
          nlist = k)
      })
      println(f"[ab] run $r: distributed ${ta}%.1f s, $mode ${tb}%.1f s")
      tA ::= ta; tB ::= tb; mA = a; mB = b
    }

    def inertia(m: graft.index.IvfModel): Double = {
      val cents = typedlit(m.centroids.map(_.map(_.toDouble).toSeq).toSeq)
      curated.select(col("embedding").cast("array<double>").as("v"),
          element_at(cents, m.assignColumn(col("embedding")) + 1).as("c"))
        .select(aggregate(zip_with(col("v"), col("c"),
          (a, b) => (a - b) * (a - b)), lit(0.0), _ + _).as("d2"))
        .agg(avg("d2")).collect()(0).getDouble(0)
    }
    val iA = inertia(mA); val iB = inertia(mB)

    def dropSet(m: graft.index.IvfModel): Set[Long] =
      graft.operators.SemDedup.semDedup(curated, "doc_id", "embedding",
          minCosine = 0.8, model = Some(m))
        .filter(!col("keep")).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val dA = dropSet(mA); val dB = dropSet(mB)
    val inter = (dA & dB).size
    val union = (dA | dB).size
    val jac = if (union == 0) 1.0 else inter.toDouble / union
    println(f"""{"n":$n,"k":$k,"runs":$runs,""" +
      f""""t_distributed_min":${tA.min}%.1f,"t_${mode}%s_min":${tB.min}%.1f,""" +
      f""""t_distributed_all":[${tA.reverse.map(t => f"$t%.1f").mkString(",")}],""" +
      f""""t_${mode}%s_all":[${tB.reverse.map(t => f"$t%.1f").mkString(",")}],""" +
      f""""inertia_distributed":$iA%.6f,"inertia_${mode}%s":$iB%.6f,""" +
      f""""drops_distributed":${dA.size},"drops_${mode}%s":${dB.size},""" +
      f""""drop_jaccard":$jac%.4f}""")
    spark.stop()
  }
}
