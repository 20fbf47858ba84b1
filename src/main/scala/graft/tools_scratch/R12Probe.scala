package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Round-12 measurement harness for the two VERDICT r11 asks:
 *
 *  - mode `q114`: isolated min-of-N wall for q114 (skewed incremental
 *    SemDeDup) next to its unskewed sibling q112 on the same process /
 *    same served model, plus an uncapped q114 variant
 *    (maxClusterRows=65536) to attribute cap-path cost, and the train
 *    term timed separately (VERDICT r11 "what's wrong" #1: q114's
 *    clean sf10 wall moved 40.7 → 51.3 s while q112 improved 2.2×).
 *
 *  - mode `q111stages`: stage attribution of the q111 curation
 *    pipeline (VERDICT r11 task 4): gates+exact dedup, lexical
 *    near-dup, embedding materialization, semantic k-means train, and
 *    the semantic cluster/pair/keep stage — cumulative noop-write legs
 *    diffed, with the semantic stage sub-attributed via the package-
 *    private clusterPairCandidates.
 *
 * Usage: R12Probe <mode> <sfDir> [runs=3]   (prints one JSON line)
 */
object R12Probe {
  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime(); val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val dir = args(1)
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      mode match {
        case "q114" => q114Probe(spark, dir, runs)
        case "q111stages" => q111Stages(spark, dir, runs)
      }
    } finally spark.stop()
  }

  private def emb(spark: SparkSession, dir: String): DataFrame =
    graft.queries.Tables.table(spark, dir, "embeddings")

  private def q114Probe(spark: SparkSession, dir: String, runs: Int): Unit = {
    val e = emb(spark, dir)
    val (tTrain, model) = time(graft.operators.SemDedup.trainModel(e, "embedding"))
    val existing = e.filter(col("vec_id") % 5 =!= 0)
    val incoming = e.filter(col("vec_id") % 5 === 0)

    // the q114 batch construction, verbatim from VectorQueries
    val hot = e.filter(col("vec_id").between(1L, 4L))
      .select(((col("vec_id") - 1) % 4).as("hot_idx"), col("embedding").as("hot_emb"))
    val m = col("vec_id") / 5
    val batch = e.filter(col("vec_id") % 5 === 0)
      .withColumn("kind",
        when(m % 5 === 0, lit("organic"))
          .when(m % 2 === 1, lit("spam_exact"))
          .otherwise(lit("spam_near")))
      .withColumn("hot_idx", m % 4)
      .join(broadcast(hot), Seq("hot_idx"), "left")
      .select(col("vec_id"),
        when(col("kind") === "organic", col("embedding"))
          .when(col("kind") === "spam_exact", col("hot_emb"))
          .otherwise(transform(col("hot_emb"), (x, i) =>
            x + lit(1e-3) * (pmod(col("vec_id"), lit(7)) + 1) *
              element_at(col("hot_emb"), pmod(i + 1, size(col("hot_emb"))) + 1)))
          .cast("array<float>").as("embedding"),
        col("label"), col("kind"))

    def q114Body(cap: Int): DataFrame = {
      val surv = graft.operators.SemDedup.semDedupIncremental(
        existing, batch, "vec_id", "embedding", minCosine = 0.95,
        model = Some(model), maxClusterRows = cap)
      batch.groupBy("kind").agg(count(lit(1)).as("n_batch"))
        .join(surv.groupBy("kind").agg(count(lit(1)).as("n_survived")),
          Seq("kind"), "left")
        .na.fill(0L, Seq("n_survived"))
        .orderBy("kind")
    }
    def q112Body(): DataFrame =
      graft.operators.SemDedup.semDedupIncremental(
          existing, incoming, "vec_id", "embedding", minCosine = 0.4,
          model = Some(model))
        .groupBy("label").agg(count(lit(1)).as("n_survivors")).orderBy("label")

    def minOf(f: () => DataFrame): Seq[Double] =
      (1 to runs).map(_ => time(noop(f()))._1)
    // NOTE: no uncapped-q114 leg — round 10 measured that form at
    // ~950 s at sf10 (the cap is the 10x); re-measuring it is waste.
    val t114 = minOf(() => q114Body(256))
    val t112 = minOf(() => q112Body())
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString("[", ",", "]")
    println(f"""{"probe":"q114","sf":"$dir","runs":$runs,""" +
      f""""train_sec":$tTrain%.2f,"q114_capped":${fmt(t114)},""" +
      f""""q112":${fmt(t112)}}""")
  }

  private def q111Stages(spark: SparkSession, dir: String, runs: Int): Unit = {
    import graft.operators.{Dedup, TextAnalysis}
    import graft.functions.{Embedder, HashingEmbedder}
    val docs = graft.queries.Tables.table(spark, dir, "documents")
    val idCol = "doc_id"; val textCol = "text"

    def gatedExact(): DataFrame = {
      val withMetrics = docs
        .withColumn("__m", TextAnalysis.textMetrics(col(textCol)))
        .withColumn("quality_score", col("__m.quality_score"))
        .withColumn("lang_pred", col("__m.lang_pred"))
        .withColumn("n_tokens", col("__m.n_tokens"))
        .drop("__m")
      Dedup.exactDedup(withMetrics.filter(col("quality_score") >= 0.5),
        idCol, textCol)
    }
    def lexical(base: DataFrame): DataFrame = {
      val pairs = Dedup.minHashNearDupPairs(base, idCol, textCol,
        shingleSize = 3, numHashes = 64, bands = 32, minJaccard = 0.6)
      val components = Dedup.connectedComponents(pairs.select("id_a", "id_b"))
      base.join(components.filter(col("id") =!= col("label"))
        .select(col("id").as(idCol)), Seq(idCol), "left_anti")
    }
    val embedFn = Embedder.embedColumn(HashingEmbedder(dimension = 64))

    def minOf(f: () => Unit): Double = (1 to runs).map(_ => time(f())._1).min

    // cumulative legs (each leg re-executes the prefix: attribution by diff)
    val tA = minOf(() => noop(gatedExact()))
    val tB = minOf(() => noop(lexical(gatedExact())))
    // C: materialize the embedded corpus (the mat the semantic stage sees)
    val (tC, mat) = time(
      lexical(gatedExact()).withColumn("embedding", embedFn(col(textCol)))
        .localCheckpoint(true))
    // D: the semantic train term on mat
    val (tD, model) = time(graft.operators.SemDedup.trainModel(mat, "embedding"))
    // E: the semantic flag+drop stage with the model served
    val tE = minOf { () =>
      val flags = graft.operators.SemDedup.semDedup(
        mat, idCol, "embedding", minCosine = 0.8, model = Some(model))
      noop(mat.join(flags.filter(!col("keep")).select(col(idCol)),
        Seq(idCol), "left_anti"))
    }
    // E sub-attribution via the package-private candidate stream:
    // E1 assign+centroid-sim materialization, E2 pair candidates+verify,
    // E3 components+keep-rule join
    val centDf = {
      import spark.implicits._
      model.centroids.zipWithIndex.toSeq
        .map { case (c, i) => (i, c.toSeq) }.toDF("cluster_id", "centroid")
    }
    val (tE1, assigned) = time(
      model.assign(mat.select(col(idCol), col("embedding")), "embedding")
        .join(broadcast(centDf), Seq("cluster_id"))
        .withColumn("centroid_sim",
          graft.functions.GraftFunctions.cosine_sim(col("embedding"), col("centroid")))
        .drop("centroid")
        .localCheckpoint(true))
    val tE2 = minOf { () =>
      val (cands, capped) = graft.operators.SemDedup.clusterPairCandidates(
        assigned, idCol, "embedding", maxClusterRows = 65536, seed = 42L)
      val verified = cands.filter(col("__exact") ||
        graft.functions.GraftFunctions.cosine_sim(col("emb_a"), col("emb_b")) >= 0.8)
      noop((if (capped) verified.dropDuplicates("id_a", "id_b") else verified)
        .select("id_a", "id_b"))
    }
    val tE3 = minOf { () =>
      val (cands, capped) = graft.operators.SemDedup.clusterPairCandidates(
        assigned, idCol, "embedding", maxClusterRows = 65536, seed = 42L)
      val verified = cands.filter(col("__exact") ||
        graft.functions.GraftFunctions.cosine_sim(col("emb_a"), col("emb_b")) >= 0.8)
      val pairs = (if (capped) verified.dropDuplicates("id_a", "id_b") else verified)
        .select("id_a", "id_b")
      val comps = Dedup.connectedComponents(pairs)
      val members = assigned.join(comps, assigned(idCol) === comps("id"))
        .select(col("label"), assigned(idCol).as("__m_id"), col("centroid_sim"))
      val dropIds = members.groupBy("label")
        .agg(min(struct(col("centroid_sim"), col("__m_id"))).as("m"))
        .select(col("label"), col("m").getField("__m_id").as("keep_id"))
        .join(members, Seq("label"))
        .filter(col("__m_id") =!= col("keep_id"))
        .select(col("__m_id").as(idCol))
      noop(mat.join(dropIds, Seq(idCol), "left_anti"))
    }
    println(f"""{"probe":"q111stages","sf":"$dir","runs":$runs,""" +
      f""""gates_exact":$tA%.2f,"plus_lexical":$tB%.2f,""" +
      f""""embed_checkpoint":$tC%.2f,"train":$tD%.2f,""" +
      f""""semantic_stage":$tE%.2f,"assign_cs_ckpt":$tE1%.2f,""" +
      f""""pairs_verify":$tE2%.2f,"cc_keep_join":$tE3%.2f}""")
  }
}
