package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Round-13 measurement harness.
 *
 *  - mode `hamdist`: what Hamming distances do the fixture's TRUE
 *    near-dup pairs (exact cosine >= tau, the q25 ground truth) have
 *    between their sign signatures? Sizes the multi-index Hamming
 *    join's (maxHamming, bands) so its deterministic guarantee
 *    actually covers the near-dup band, and measures the candidate
 *    mass of each band width on real (non-uniform) sign bits.
 *
 * Usage: R13Probe hamdist <sfDir> [tau=0.9]   (prints one JSON line)
 */
object R13Probe {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val dir = args(1)
    val tau = if (args.length > 2) args(2).toDouble else 0.9
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.GraftFunctions.{cosine_sim, hamming_dist, sign_bits}

    mode match {
      case "hamdist" =>
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
          .filter(col("embedding").isNotNull)
          .select(col("vec_id"), col("embedding"),
            sign_bits(col("embedding")).as("sig"))
          .cache()
        val n = e.count()
        val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"),
          col("sig").as("sa"))
        val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"),
          col("sig").as("sb"))
        // brute-force ground truth (fixture scale only)
        val pairs = a.crossJoin(b).filter(col("ia") < col("ib"))
          .withColumn("cos", cosine_sim(col("ea"), col("eb")))
          .filter(col("cos") >= tau)
          .withColumn("ham", hamming_dist(col("sa"), col("sb")))
        val hist = pairs.groupBy("ham").count().orderBy("ham")
          .collect().map(r => s""""${r.getInt(0)}":${r.getLong(1)}""").mkString(",")
        // candidate mass per band width: how many id pairs share an
        // exact band value (the join's collision mass), for 16/8-bit
        // bands over the 64-bit signature
        def bandMass(w: Int): Long = {
          val nb = 64 / w
          val mask = if (w == 64) -1L else (1L << w) - 1L
          val bandCols = (0 until nb).map(i =>
            struct(lit(i).as("b"),
              shiftright(col("sig").getItem(0), i * w).bitwiseAND(lit(mask)).as("v")))
          val exploded = e.select(col("vec_id"), explode(array(bandCols: _*)).as("bv"))
            .select(col("vec_id"), col("bv.b").as("b"), col("bv.v").as("v"))
          exploded.groupBy("b", "v").count()
            .select(sum((col("count") * (col("count") - 1) / 2).cast("long")))
            .collect()(0).getLong(0)
        }
        println(s"""{"mode":"hamdist","n":$n,"tau":$tau,""" +
          s""""pair_ham_hist":{$hist},""" +
          s""""band_mass_w16":${bandMass(16)},"band_mass_w8":${bandMass(8)},""" +
          s""""band_mass_w32":${bandMass(32)}}""")
      case "binrecall" =>
        // recall@10 of the binary tier (Hamming top-C prefilter, exact
        // rerank) vs exact brute force, over the first 20 query ids
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
          .filter(col("embedding").isNotNull).cache()
        e.count()
        val qids = e.select("vec_id").orderBy("vec_id").limit(20)
          .collect().map(_.getLong(0))
        val recalls = for (cands <- Seq(16, 64, 256)) yield {
          val rs = qids.map { qid =>
            val q = e.filter(col("vec_id") === qid).select("embedding")
              .collect()(0).getSeq[Float](0).toArray
            val got = graft.index.BinaryQuant.knn(e, "vec_id", "embedding",
              q, k = 10, candidates = cands)
              .select("vec_id").collect().map(_.getLong(0)).toSet
            val exact = graft.operators.Similarity.knnExact(
              e, "vec_id", "embedding", q, 10)
              .select("vec_id").collect().map(_.getLong(0)).toSet
            got.intersect(exact).size / 10.0
          }
          cands -> rs.sum / rs.length
        }
        val n = e.count()
        println(s"""{"mode":"binrecall","n":$n,""" +
          recalls.map { case (c, r) => s""""recall10_c$c":$r""" }.mkString(",") + "}")
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
