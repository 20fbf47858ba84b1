package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.{Dedup, SemDedup}

/**
 * SemDeDup contracts (no SQL oracle possible — seeded k-means — so the
 * q109 rows-only entry is gated here):
 *  - exactly one keeper per duplicate group, singletons always kept
 *  - keep-rule: keeper = argmin (centroid_sim, id) in its group
 *  - differential: duplicate groups match a per-cluster brute-force
 *    pairwise check composed with the same connected-components step
 *  - deterministic across runs
 */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val rnd = new scala.util.Random(7)
  // 40 base vectors in 4 loose groups + exact and near duplicates of a
  // few — ids chosen so keeper identity is exercised on ties.
  private def unit(v: Array[Double]): Seq[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n).toSeq
  }
  // jitter dominates the group axis so distinct base vectors sit FAR
  // below the 0.95 dup threshold (pairwise cos ~ 0.2-0.5) while exact/
  // tiny-perturbation copies stay above it
  private val baseVecs: Seq[(Long, Seq[Double])] = (0 until 40).map { i =>
    val center = Array.tabulate(dim)(d => if (d == i % 4) 1.0 else 0.0)
    val jitter = Array.tabulate(dim)(_ => rnd.nextGaussian() * 0.6)
    (i.toLong, unit(center.zip(jitter).map { case (a, b) => a + b }))
  }
  private val dups: Seq[(Long, Seq[Double])] = Seq(
    (100L, baseVecs(0)._2),                                  // exact dup of 0
    (101L, baseVecs(0)._2),                                  // second exact dup
    (102L, unit(baseVecs(1)._2.toArray.zipWithIndex.map {    // near dup of 1
      case (x, d) => x + (if (d == 7) 0.01 else 0.0) }))
  )
  private lazy val corpus = (baseVecs ++ dups)
    .toDF("vec_id", "embedding")
    .withColumn("embedding", col("embedding").cast("array<float>"))

  private lazy val flags =
    SemDedup.semDedup(corpus, "vec_id", "embedding",
      minCosine = 0.95, nlist = 4).localCheckpoint(true)

  test("semdedup covers every row, keeps singletons, drops group extras") {
    val rows = flags.collect()
    assert(rows.length == 43) // every non-null-embedding row appears once
    val kept = rows.filter(_.getAs[Boolean]("keep")).map(_.getLong(0)).toSet
    // 0/100/101 form one exact-dup group -> exactly one survives;
    // 1/102 a near-dup group -> one survives
    assert(Seq(0L, 100L, 101L).count(kept) == 1)
    assert(Seq(1L, 102L).count(kept) == 1)
  }

  test("keep-rule: keeper is the group member least similar to its centroid") {
    val byId = flags.collect()
      .map(r => r.getLong(0) -> (r.getAs[Double]("centroid_sim"), r.getAs[Boolean]("keep")))
      .toMap
    // exact dups have IDENTICAL centroid_sim -> tie broken by min id = 0
    assert(byId(0L)._2 && !byId(100L)._2 && !byId(101L)._2)
    // near-dup pair: keeper has the smaller (centroid_sim, id)
    val (s1, k1) = byId(1L); val (s102, k102) = byId(102L)
    if (s1 < s102) assert(k1 && !k102)
    else if (s102 < s1) assert(k102 && !k1)
    else assert(k1 && !k102)
  }

  test("differential: drops match per-cluster brute force + connected components") {
    // recompute groups the slow way from the operator's own clustering
    val model = graft.index.IvfModel.train(corpus, "embedding", nlist = 4)
    val assigned = model.assign(corpus, "embedding")
    val a = assigned.select(col("cluster_id"), col("vec_id").as("id_a"),
      col("embedding").as("ea"))
    val b = assigned.select(col("cluster_id"), col("vec_id").as("id_b"),
      col("embedding").as("eb"))
    val pairs = a.join(b, Seq("cluster_id")).filter(col("id_a") < col("id_b"))
      .filter(GraftFunctions.cosine_sim(col("ea"), col("eb")) >= 0.95)
      .select("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
    val groupSizes = comps.groupBy("label").count().collect()
      .map(r => r.getLong(1)).sorted.toSeq
    val dropped = flags.filter(!col("keep")).count()
    // each group of size s drops s-1 members
    assert(dropped == groupSizes.map(_ - 1).sum)
  }

  test("deterministic across runs") {
    val again = SemDedup.semDedup(corpus, "vec_id", "embedding",
        minCosine = 0.95, nlist = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getDouble(2), r.getBoolean(3))).sortBy(_._1).toSeq
    val first = flags
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getDouble(2), r.getBoolean(3))).sortBy(_._1).toSeq
    assert(again == first)
  }

  test("auto nlist sizes from metadata and still satisfies the group contract") {
    val auto = SemDedup.semDedup(corpus, "vec_id", "embedding", minCosine = 0.95)
    val kept = auto.filter(col("keep")).select("vec_id").as[Long].collect().toSet
    assert(Seq(0L, 100L, 101L).count(kept) == 1)
  }

  // ---------------------------------------------- hot-cluster cap
  // Adversarial corpus: ~85% of rows forced into ONE k-means cluster
  // (the duplicate-heavy shape SemDeDup actually runs on). 16 "hot"
  // base directions near a common axis, 50 exact copies each (800
  // rows) + 4 near-dup perturbations, vs 150 scattered distinct rows.
  private val hotRnd = new scala.util.Random(11)
  private val hotBases: IndexedSeq[Seq[Double]] = (0 until 16).map { _ =>
    val v = Array.tabulate(dim)(d =>
      (if (d == 0) 4.0 else 0.0) + hotRnd.nextGaussian() * 0.45)
    unit(v)
  }
  private lazy val hotCorpus = {
    val exactCopies = for {
      b <- 0 until 16; c <- 0 until 50
    } yield ((1000 + b * 50 + c).toLong, hotBases(b))
    val nearDups = (0 until 4).map { b =>
      ((2000 + b).toLong, unit(hotBases(b).toArray.zipWithIndex.map {
        case (x, d) => x + (if (d == 5) 0.006 else 0.0) }))
    }
    val scattered = (0 until 150).map { i =>
      val axis = 1 + i % 3 // e1/e2/e3 regions, far from the hot e0 cone
      val v = Array.tabulate(dim)(d =>
        (if (d == axis * 4) 4.0 else 0.0) + hotRnd.nextGaussian() * 0.45)
      (i.toLong, unit(v))
    }
    (exactCopies ++ nearDups ++ scattered)
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .localCheckpoint(true)
  }
  private lazy val hotModel =
    graft.index.IvfModel.train(hotCorpus, "embedding", nlist = 4, seed = 42L)

  test("cluster cap: capped output is identical to the uncapped form " +
      "on a corpus with ~85% of rows in one cluster") {
    def run(cap: Int) =
      SemDedup.semDedup(hotCorpus, "vec_id", "embedding", minCosine = 0.95,
          model = Some(hotModel), maxClusterRows = cap)
        .collect().map(r => (r.getLong(0), r.getInt(1),
          r.getDouble(2), r.getBoolean(3))).sortBy(_._1).toSeq
    // precondition: the hot cluster is genuinely oversized at cap=100
    val sizes = hotModel.assign(hotCorpus, "embedding")
      .groupBy("cluster_id").count().collect().map(_.getLong(1))
    assert(sizes.max >= 700, s"adversarial shape broke: sizes=${sizes.toSeq}")
    assert(run(cap = 100) == run(cap = Int.MaxValue))
  }

  test("empty-input contracts: no k-means failure on empty corpora/batches") {
    val none = corpus.filter(col("vec_id") < -1)
    // batch form: empty corpus -> empty result with the output schema
    val out = SemDedup.semDedup(none, "vec_id", "embedding")
    assert(out.columns.toSeq == Seq("vec_id", "cluster_id", "centroid_sim", "keep"))
    assert(out.count() == 0)
    // incremental, first-ever batch (empty corpus): collapses to the
    // batch keep-set — in-batch dups still deduplicate
    val batch = Seq((300L, baseVecs(0)._2), (301L, baseVecs(0)._2),
        (302L, baseVecs(5)._2))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val surv = SemDedup.semDedupIncremental(none, batch, "vec_id", "embedding",
        minCosine = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(surv.contains(302L) && Seq(300L, 301L).count(surv) == 1, s"got $surv")
    // incremental, empty batch: empty survivors, no failure
    assert(SemDedup.semDedupIncremental(corpus, none, "vec_id", "embedding",
      nlist = 4).count() == 0)
  }

  // ---------------------------------------------- incremental form
  test("incremental: corpus dups dropped, batch groups keep one, fresh rows survive") {
    val existing = baseVecs.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val freshVec = unit(Array.tabulate(dim)(d => if (d == 9) 1.0 else 0.02))
    val batch = Seq(
      (200L, baseVecs(0)._2),                                // exact dup of existing 0
      (201L, unit(baseVecs(1)._2.toArray.zipWithIndex.map {  // near dup of existing 1
        case (x, d) => x + (if (d == 7) 0.01 else 0.0) })),
      (202L, freshVec),                                      // genuinely new
      (203L, freshVec.map(x => x)),                          // exact dup of 202 (in-batch)
      (204L, unit(Array.tabulate(dim)(d => if (d == 11) 1.0 else -0.02)))
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))

    val surv = SemDedup.semDedupIncremental(existing, batch, "vec_id", "embedding",
      minCosine = 0.95, nlist = 4)
    val ids = surv.select("vec_id").as[Long].collect().toSet
    assert(!ids.contains(200L) && !ids.contains(201L), s"corpus dups must drop: $ids")
    assert(ids.contains(204L))
    assert(Seq(202L, 203L).count(ids) == 1, s"one of the in-batch pair: $ids")

    // model-reuse path: identical outcome with the pre-trained model
    val model = graft.index.IvfModel.train(existing, "embedding", nlist = 4)
    val viaModel = SemDedup.semDedupIncremental(existing, batch, "vec_id",
        "embedding", minCosine = 0.95, model = Some(model))
      .select("vec_id").as[Long].collect().toSet
    assert(viaModel == ids)
  }

  test("incremental cap: capped output identical to uncapped on a hot existing corpus") {
    val batch = Seq(
      (5000L, hotBases(0)),                                  // exact dup of a hot group
      (5001L, unit(Array.tabulate(dim)(d => if (d == 13) 1.0 else 0.03))) // fresh
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    def run(cap: Int) = SemDedup.semDedupIncremental(hotCorpus, batch,
        "vec_id", "embedding", minCosine = 0.95, model = Some(hotModel),
        maxClusterRows = cap)
      .select("vec_id").as[Long].collect().toSet
    val capped = run(100)
    assert(capped == run(Int.MaxValue))
    assert(capped == Set(5001L), s"hot dup must drop, fresh must survive: $capped")
  }

  test("incremental skewed batch: spam mass drops, organic survives, cap parity") {
    // q114's fixture shape at spec scale: the ARRIVING BATCH itself is
    // skewed — 120 exact copies + 40 distinct near-copies of 4 hot
    // bases (all present in the existing corpus) + 10 organic fresh
    // rows. The batch concentrates into the hot clusters, so with a
    // small cap the oversized-cluster incremental path runs with a
    // LARGE bigInc side (the shape the rep-collapse guard exists for).
    val batchRnd = new scala.util.Random(23)
    val spamExact = (0 until 120).map(i => ((6000 + i).toLong, hotBases(i % 4)))
    val spamNear = (0 until 40).map { i =>
      val b = hotBases(i % 4).toArray
      ((6200 + i).toLong, unit(b.indices.map(d =>
        b(d) + 1e-3 * (1 + i / 4) * b((d + 1) % b.length)).toArray))
    }
    // each organic row on its OWN axis, chosen from the axes no other
    // cone occupies (hot: 0; scattered: 4/8/12) — a shared dominant
    // axis would make organic rows legitimate ≥0.95 near-dups of each
    // other or of existing rows and collapse them
    val freeAxes = Seq(1, 2, 3, 5, 6, 7, 9, 10, 11, 13)
    val organic = (0 until 10).map { i =>
      val v = Array.tabulate(dim)(d =>
        (if (d == freeAxes(i)) 4.0 else 0.0) + batchRnd.nextGaussian() * 0.2)
      ((6300 + i).toLong, unit(v))
    }
    val batch = (spamExact ++ spamNear ++ organic)
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .localCheckpoint(true)
    def run(cap: Int) = SemDedup.semDedupIncremental(hotCorpus, batch,
        "vec_id", "embedding", minCosine = 0.95, model = Some(hotModel),
        maxClusterRows = cap)
      .select("vec_id").as[Long].collect().toSet
    val capped = run(100)
    assert(capped == run(Int.MaxValue), "capped path diverged from uncapped")
    // every spam row is a ≥0.95 dup of an existing hot vector -> drops;
    // organic rows are far from everything -> survive
    assert(capped == organic.map(_._1).toSet,
      s"expected exactly the organic ids, got $capped")
  }

  test("cluster cap bounds candidate pair mass (star + LSH, not |c|^2)") {
    val assigned = hotModel.assign(hotCorpus, "embedding")
    val (uncapped, engagedU) = SemDedup.clusterPairCandidates(
      assigned, "vec_id", "embedding", Int.MaxValue, 42L)
    val (capped, engagedC) = SemDedup.clusterPairCandidates(
      assigned, "vec_id", "embedding", 100, 42L)
    assert(!engagedU && engagedC)
    val nUncapped = uncapped.count()
    val nCapped = capped.count()
    // hot cluster alone is >= 700*699/2 ≈ 245k uncapped pairs; capped
    // path is ~800 star edges + LSH pairs over ~20 distinct reps + the
    // scattered small-cluster self-joins — orders of magnitude less
    assert(nUncapped > 250000L, s"uncapped=$nUncapped")
    assert(nCapped < 25000L, s"capped=$nCapped")
  }

  test("bucket star cap: overflowing near-identical bucket goes linear, spam still drops (VERDICT r15)") {
    // 300 DISTINCT near-copies of ONE existing hot base arrive at once:
    // every copy is ~0.9999 cosine to the base, so no LSH bit count can
    // split the bucket — pre-cap this was a 300x300 in-bucket join. The
    // bucket cap (> maxClusterRows reps in one bucket) switches to star
    // candidates around the existing-preferred rep, which catches every
    // copy (all are >= 0.95 of the base by construction).
    val base = hotBases(0).toArray
    val spam = (0 until 300).map { i =>
      ((7000 + i).toLong, unit(base.indices.map(d =>
        base(d) + 1e-4 * (1 + i % 97) * base((d + 1) % base.length)).toArray))
    }
    val freshAxes = Seq(1, 2, 3, 5, 6)
    val organic = (0 until 5).map { i =>
      val v = Array.tabulate(dim)(d => if (d == freshAxes(i)) 1.0 else 0.0)
      ((7400 + i).toLong, unit(v))
    }
    val batch = (spam ++ organic).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .localCheckpoint(true)
    // precondition: every spam row really is a dup of the base
    val nDup = batch.filter(col("vec_id") < 7400)
      .crossJoin(hotCorpus.filter(col("vec_id") === 1000L)
        .select(col("embedding").as("be")))
      .filter(GraftFunctions.cosine_sim(col("embedding"), col("be")) >= 0.95)
      .count()
    assert(nDup == 300L, s"fixture broke: only $nDup/300 spam are dups")
    val surv = SemDedup.semDedupIncremental(hotCorpus, batch,
        "vec_id", "embedding", minCosine = 0.95, model = Some(hotModel),
        maxClusterRows = 100)
      .select("vec_id").as[Long].collect().toSet
    assert(surv == organic.map(_._1).toSet,
      s"every spam copy must drop via the star rep; got $surv")
    // and the cap predicate the q114 verdict column exposes is true
    assert(SemDedup.incrementalCapEngaged(hotCorpus, batch, "embedding",
      hotModel, maxClusterRows = 100))
    assert(!SemDedup.incrementalCapEngaged(hotCorpus, batch, "embedding",
      hotModel, maxClusterRows = Int.MaxValue))
  }

  test("production threshold 0.95: planted near-dup pairs collapse, no false positives") {
    // q113's fixture shape at spec scale: every base vector gets a
    // deterministic perturbed copy at cos ≈ 0.9998 (0.02-scaled element
    // rotation — DISTINCT vector, so the within-cluster near-dup pair
    // path is exercised, not the exact-collapse) and the operator runs
    // at the paper's threshold band.
    val planted = baseVecs.map { case (id, v) =>
      val a = v.toArray
      (id + 1000L, unit(a.indices.map(i => a(i) + 0.02 * a((i + 1) % a.length)).toArray))
    }
    val union = (baseVecs ++ planted).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val out = SemDedup.semDedup(union, "vec_id", "embedding",
        minCosine = 0.95, nlist = 4)
      .select(col("vec_id"), col("keep")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out.size == 80)
    // every planted pair collapses to exactly one survivor — up to the
    // operator's documented within-cluster limitation (a pair k-means
    // splits across a Voronoi boundary is not a candidate), so gate a
    // >= 90% floor; and a caught pair NEVER drops both members
    val collapsed = baseVecs.count { case (id, _) =>
      val pair = Seq(out(id), out(id + 1000L))
      assert(pair.count(identity) >= 1, s"pair $id: both members dropped")
      pair.count(identity) == 1
    }
    assert(collapsed >= 36, s"only $collapsed/40 planted pairs collapsed at 0.95")
    // no false positives: a drop outside a planted pair would mean two
    // distinct base vectors scored >= 0.95 (they sit at cos ~0.2-0.5)
    val droppedIds = out.collect { case (id, false) => id }.toSet
    droppedIds.foreach { id =>
      val base = if (id >= 1000L) id - 1000L else id
      assert(baseVecs.exists(_._1 == base), s"false-positive drop: $id")
    }
  }
}
