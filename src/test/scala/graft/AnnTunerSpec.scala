package graft

import org.apache.spark.sql.functions._

import graft.index.AnnTuner
import graft.model.GraftConfig

/**
 * Recall-targeted auto-tuning: the pick must be deterministic, meet
 * the target it claims, be the cheapest of the measured configs that
 * do, and refuse honestly when the target is unreachable.
 */
class AnnTunerSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id"), col("embedding"), col("label")).cache()

  test("IVF tuning meets the target at minimal candidate fraction") {
    // 0.75 sits inside the measured frontier on this corpus (RECALL.md:
    // recall ~0.78 at fraction ~0.5); 0.9+ genuinely needs a full probe
    // on these wide-angle synthetic neighbors, which the honest-refusal
    // test below covers from the other side
    val best = AnnTuner.tuneIvf(emb, "vec_id", "embedding", targetRecall = 0.75)
    assert(best.isDefined, "0.75 must be reachable for IVF on this corpus")
    val m = best.get
    info(f"picked (nlist, nprobe) = ${m.config}, recall = ${m.recall}%.2f, " +
      f"fraction = ${m.candidateFraction}%.3f")
    assert(m.recall >= 0.75)
    // a full-probe config (nprobe == nlist) always has recall 1.0 at
    // fraction 1.0 — the tuner must have found something cheaper
    assert(m.candidateFraction < 1.0)

    // deterministic: same inputs, same pick
    val again = AnnTuner.tuneIvf(emb, "vec_id", "embedding", targetRecall = 0.75)
    assert(again.map(_.config) == best.map(_.config))
  }

  test("higher targets cost at least as much") {
    val lo = AnnTuner.tuneIvf(emb, "vec_id", "embedding", targetRecall = 0.5)
    val hi = AnnTuner.tuneIvf(emb, "vec_id", "embedding", targetRecall = 0.95)
    assert(lo.isDefined && hi.isDefined)
    assert(lo.get.candidateFraction <= hi.get.candidateFraction,
      s"cheaper to hit 0.95 (${hi.get.candidateFraction}) than 0.5 " +
        s"(${lo.get.candidateFraction})?")
  }

  test("unreachable target returns None, not the least-bad config") {
    // nprobe capped at 1 of >= 8 cells cannot reach recall 0.999 here
    val r = AnnTuner.tuneIvf(emb, "vec_id", "embedding", targetRecall = 0.999,
      nlists = Seq(16), nprobes = Seq(1))
    assert(r.isEmpty)
  }

  test("n > maxGraphVectors: flat hnsw never offered, coarse composition is") {
    // VERDICT r14 item 5: HnswModel.build collects at most
    // maxGraphVectors rows to the driver — past the cap the tuner must
    // degrade to the q110 HNSW-over-centroids composition instead of
    // recommending a flat graph that silently indexes a subset.
    val saved = GraftConfig.hnswMaxGraphVectors
    GraftConfig.hnswMaxGraphVectors = 10 // far below the fixture corpus
    try {
      val (best, all) = AnnTuner.tuneAcrossTiers(emb, "vec_id", "embedding",
        dim = 64, targetRecall = 0.75)
      assert(!all.exists(_.tier == "hnsw"),
        s"flat hnsw offered past the size cap: $all")
      assert(all.exists(_.tier == "hnsw_coarse"),
        s"coarse composition missing past the size cap: $all")
      assert(best.isDefined && best.get.tier != "hnsw")
    } finally GraftConfig.hnswMaxGraphVectors = saved
  }

  test("cross-tier tuning: hnsw dominates at a high target, choice meets target") {
    val (best, all) = AnnTuner.tuneAcrossTiers(emb, "vec_id", "embedding",
      dim = 64, targetRecall = 0.9)
    assert(best.isDefined, s"0.9 reachable by hnsw on this corpus; measured: $all")
    val c = best.get
    info(s"picked ${c.tier} (${c.config}) recall=${c.recall} fraction=${c.candidateFraction}")
    assert(c.recall >= 0.9)
    // HNSW hits recall 1.0 fetching ~10-20% here while IVF needs a
    // full probe for 0.9 (AnnRecallSpec / RECALL.md) — the graph tier
    // must win this target
    assert(c.tier == "hnsw", s"expected hnsw to dominate: $all")
    // and the winner is the measured minimum-cost qualifier
    val qualifiers = all.filter(_.recall >= 0.9)
    assert(qualifiers.forall(_.candidateFraction >= c.candidateFraction))
  }

  test("binary tuning: monotone radius curve, cheapest qualifier, honest refusal") {
    // measured curve: recall and fraction both grow with radius, so
    // the cheapest radius meeting a modest target exists, and the
    // tuner must refuse targets past what any measured radius reaches
    val dim = emb.filter(col("vec_id") === 0).select("embedding")
      .collect()(0).getSeq[Float](0).length
    val lo = AnnTuner.tuneBinary(emb, "vec_id", "embedding", dim, targetRecall = 0.3)
    assert(lo.isDefined, "0.3 must be reachable on this corpus")
    info(f"picked radius = ${lo.get.config}, recall = ${lo.get.recall}%.2f, " +
      f"fraction = ${lo.get.candidateFraction}%.3f")
    assert(lo.get.recall >= 0.3 && lo.get.candidateFraction < 1.0)
    val hi = AnnTuner.tuneBinary(emb, "vec_id", "embedding", dim, targetRecall = 0.7)
    hi.foreach { h =>
      assert(h.candidateFraction >= lo.get.candidateFraction,
        "a higher target cannot be cheaper")
    }
    // dim/2 is the measured maximum useful radius (random pairs center
    // there); recall 1.0 needs every exact neighbor inside it, which
    // this wide-angle synthetic corpus does not give — must refuse
    val impossible = AnnTuner.tuneBinary(emb, "vec_id", "embedding", dim,
      targetRecall = 1.0)
    impossible.foreach(m => assert(m.recall >= 1.0,
      "if a pick is returned at target 1.0 it must genuinely measure 1.0"))
    // deterministic
    assert(AnnTuner.tuneBinary(emb, "vec_id", "embedding", dim, 0.3)
      .map(_.config) == lo.map(_.config))
  }

  test("LSH tuning handles non-long id columns") {
    import spark.implicits._
    // int ids exercise the cast path that raw getLong would CCE on
    val small = emb.limit(60)
      .select(col("vec_id").cast("int").as("vec_id"), col("embedding"))
    val r = AnnTuner.tuneLsh(small, "vec_id", "embedding", dim = 64,
      targetRecall = 0.0, grid = Seq(GraftConfig.LshPreset(4, 4, 0)))
    assert(r.isDefined) // target 0 always met; the point is no crash
  }

  test("LSH tuning activates the picked preset for the catalog") {
    val saved = GraftConfig.lshActivePreset
    try {
      GraftConfig.lshActivePreset = None
      // 0.4 is comfortably reachable for sign-LSH on this corpus
      // (RECALL.md frontier); the geometric cap near 0.6 is why the
      // default target here is modest
      val best = AnnTuner.tuneAndActivateLsh(emb, "vec_id", "embedding",
        dim = 64, targetRecall = 0.4)
      assert(best.isDefined, "0.4 must be reachable for LSH on this corpus")
      assert(best.get.recall >= 0.4)
      assert(GraftConfig.lshActivePreset.contains(best.get.config))
    } finally GraftConfig.lshActivePreset = saved
  }

  test("tuneAndRegister wires the tuned winner into the AnnTopKProbe rewrite") {
    import graft.functions.GraftFunctions.cosine_sim
    import graft.index.AnnRegistry
    import spark.implicits._

    val choice = AnnTuner.tuneAndRegister("tuned-e2e", emb, "vec_id", "embedding",
      dim = 64, targetRecall = 0.9)
    assert(choice.isDefined, "0.9 must be reachable on this corpus (hnsw does)")
    assert(AnnRegistry.get("tuned-e2e").isDefined, "winner must be registered")

    def topk(q: Array[Float]) =
      emb.withColumn("score", cosine_sim(col("embedding"), typedLit(q)))
        .orderBy(col("score").desc, col("vec_id").asc).limit(10)
        .select("vec_id").as[Long].collect().toSeq
    try {
      val recalls = (0L until 5L).map { vid =>
        val q = emb.filter($"vec_id" === vid).select("embedding")
          .collect()(0).getSeq[Float](0).toArray
        spark.conf.unset("spark.graft.ann.autoProbe")
        val exact = topk(q).toSet
        spark.conf.set("spark.graft.ann.autoProbe", "tuned-e2e")
        val auto = topk(q).toSet
        (exact intersect auto).size.toDouble / exact.size
      }
      // the tuned pick cleared 0.9 on ITS sample; this is an e2e sanity
      // gate through the rewritten plan, not a re-measurement
      val mean = recalls.sum / recalls.length
      assert(mean >= 0.8, s"rewrite under tuned index under-recalls: $mean")
    } finally {
      spark.conf.unset("spark.graft.ann.autoProbe")
      AnnRegistry.unregister("tuned-e2e")
    }
  }

  test("build budget: a build-dominated tier loses to a distributed tier") {
    import graft.index.AnnTuner.TierChoice
    // scale-shaped measurements (RECALL_SF10's real numbers: HNSW built
    // in 417 s on the driver at the 200k cap; IVF trained distributed
    // in ~3 s). HNSW has the cheapest probes, so without a budget it
    // wins; under a 60 s build budget the selection MUST fall through
    // to the distributed tier.
    val picks = Seq(
      TierChoice("hnsw", "ef=50 fetch=50", recall = 1.0,
        candidateFraction = 0.0003, buildSeconds = 417.0),
      TierChoice("ivf", "nlist=1024 nprobe=16", recall = 0.95,
        candidateFraction = 0.02, buildSeconds = 3.2),
      TierChoice("lsh", "tables=8 bits=10", recall = 0.6,
        candidateFraction = 0.01, buildSeconds = 1.1))
    val unbounded = AnnTuner.selectWithinBudget(picks, 0.9, Double.PositiveInfinity)
    assert(unbounded.map(_.tier).contains("hnsw"))
    val budgeted = AnnTuner.selectWithinBudget(picks, 0.9, 60.0)
    assert(budgeted.map(_.tier).contains("ivf"),
      s"build-dominated hnsw must be excluded under budget: $budgeted")
    // no qualifier within budget -> honest None, never the over-budget pick
    assert(AnnTuner.selectWithinBudget(picks, 0.9, 1.0).isEmpty)
  }

  test("cross-tier tuning measures real build seconds and honors the budget knob") {
    val (best, all) = AnnTuner.tuneAcrossTiers(emb, "vec_id", "embedding",
      dim = 64, targetRecall = 0.9, buildBudgetSeconds = Double.PositiveInfinity)
    assert(best.isDefined)
    assert(all.nonEmpty)
    assert(all.forall(_.buildSeconds > 0.0),
      s"every tier's build must be timed: $all")
    // an impossible budget excludes every tier but keeps the
    // measurements inspectable
    val (none, stillAll) = AnnTuner.tuneAcrossTiers(emb, "vec_id", "embedding",
      dim = 64, targetRecall = 0.9, buildBudgetSeconds = 0.0)
    assert(none.isEmpty)
    assert(stillAll.nonEmpty)
  }

  test("tuneAndRegister refuses an unreachable target and registers nothing") {
    import graft.index.AnnRegistry
    val r = AnnTuner.tuneAndRegister("tuned-none", emb.limit(80), "vec_id",
      "embedding", dim = 64, targetRecall = 1.01)
    assert(r.isEmpty)
    assert(AnnRegistry.get("tuned-none").isEmpty, "refusal must not register")
  }

  test("null embeddings: fraction denominator is the indexable count (ADVICE r13)") {
    import spark.implicits._
    // 20 identical indexable rows + 20 null-embedding rows: every tier
    // scans only the not-null universe, so any radius that admits the
    // identical rows has candidate fraction exactly 1.0 of the 20 —
    // dividing by the raw 40-row count would claim 0.5
    val rows = (0L until 20L).map(i => (i, Array.fill(64)(0.5f))) ++
      (20L until 40L).map(i => (i, null.asInstanceOf[Array[Float]]))
    val df = rows.toDF("vec_id", "embedding")
    val m = AnnTuner.tuneBinary(df, "vec_id", "embedding", dim = 64,
      targetRecall = 0.9)
    assert(m.isDefined)
    assert(m.get.recall == 1.0)
    assert(m.get.candidateFraction == 1.0,
      s"denominator must be the 20 indexable rows, not 40: ${m.get}")
  }
}
