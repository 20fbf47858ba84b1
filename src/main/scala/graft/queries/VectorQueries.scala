package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.index.{IvfModel, LshModel}
import graft.operators.{Dedup, Similarity}

/**
 * Vector-search operator coverage on `embeddings.parquet` (64-dim float
 * vectors): exact kNN (Q1 of SURVEY.md §2.10), batch kNN, vector scalar
 * functions (V1-V4), embedding near-dup pairs, and the LSH/IVF
 * approximate paths (rows-only oracles: ANN results are seed-dependent
 * by design; their quality is asserted as recall vs the exact oracle in
 * the ScalaTest suite, SURVEY.md §5.3).
 *
 * DuckDB oracles compute cosine/euclid with the same double-precision
 * sequential loop semantics (`list_dot_product` over DOUBLE[]), and both
 * sides round scores to 6 dp — far above the ~1e-13 cross-engine noise,
 * far below score spacing.
 */
object VectorQueries {
  import Tables.table

  /** IVF models memoized per (sfDir, nlist): an index is trained once
    * and served many times — retraining per query would charge build
    * cost to every probe (the reference trains once and keeps the
    * centroids, indexes.py:280). Training is seeded => the memo does
    * not change any result. */
  private val ivfCache = new scala.collection.concurrent.TrieMap[(String, Int), IvfModel]()
  private def ivfModel(spark: org.apache.spark.sql.SparkSession, dir: String, nlist: Int): IvfModel =
    ivfCache.getOrElseUpdate((dir, nlist),
      IvfModel.train(table(spark, dir, "embeddings"), "embedding", nlist = nlist))

  private val ivfpqCache = new scala.collection.concurrent.TrieMap[String, graft.index.IvfPqModel]()
  private val pqCache = new scala.collection.concurrent.TrieMap[String, graft.index.PqModel]()
  private val hnswCache = new scala.collection.concurrent.TrieMap[String, graft.index.HnswModel]()
  private val shardedHnswCache = new scala.collection.concurrent.TrieMap[String, graft.index.ShardedHnsw]()
  private val opqCache = new scala.collection.concurrent.TrieMap[String, graft.index.OpqModel]()
  private val opqIvfpqCache = new scala.collection.concurrent.TrieMap[String, graft.index.OpqIvfPqModel]()
  private val semDedupCache = new scala.collection.concurrent.TrieMap[String, IvfModel]()
  private def pqModel(spark: org.apache.spark.sql.SparkSession, dir: String): graft.index.PqModel =
    pqCache.getOrElseUpdate(dir,
      graft.index.PqModel.train(table(spark, dir, "embeddings"), "embedding", m = 8, k = 16))

  private val cosSql =
    "list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])) / " +
      "(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) * " +
      "sqrt(list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(q.qe AS DOUBLE[]))))"

  /** q114's skewed arriving batch (80% exact/near copies of 4 hot
    * corpus vectors, 20% organic) — shared between the query and its
    * oracle generator so the constructed corpus is one definition. */
  private[queries] def q114Batch(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val e = table(spark, dir, "embeddings")
    // 4 hot seeds, all in `existing` (ids 1..4 are not %5==0)
    val hot = e.filter(col("vec_id").between(1L, 4L))
      .select(((col("vec_id") - 1) % 4).as("hot_idx"),
        col("embedding").as("hot_emb"))
    val m = col("vec_id") / 5
    e.filter(col("vec_id") % 5 === 0)
      .withColumn("kind",
        when(m % 5 === 0, lit("organic"))
          .when(m % 2 === 1, lit("spam_exact"))
          .otherwise(lit("spam_near")))
      .withColumn("hot_idx", m % 4)
      .join(broadcast(hot), Seq("hot_idx"), "left")
      .select(col("vec_id"),
        when(col("kind") === "organic", col("embedding"))
          .when(col("kind") === "spam_exact", col("hot_emb"))
          // distinct near-copy: ~0.1-0.7% element rotation ⇒
          // cos(hot, copy) ≈ 0.9999+, above the 0.95 threshold
          .otherwise(transform(col("hot_emb"), (x, i) =>
            x + lit(1e-3) * (pmod(col("vec_id"), lit(7)) + 1) *
              element_at(col("hot_emb"),
                pmod(i + 1, size(col("hot_emb"))) + 1)))
          .cast("array<float>").as("embedding"),
        col("label"), col("kind"))
  }

  def defs: Seq[QueryDef] = Seq(

    QueryDef("q20_knn_exact", Some(
      s"""SELECT e.vec_id, e.label, round($cosSql, 6) AS score
         |FROM embeddings e,
         |  (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q
         |ORDER BY $cosSql DESC, e.vec_id
         |LIMIT 10""".stripMargin),
      (spark, dir) => {
        val e = table(spark, dir, "embeddings")
        val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
        e.crossJoin(broadcast(q))
          .withColumn("raw_score", cosine_sim(col("embedding"), col("qe")))
          .orderBy(col("raw_score").desc, col("vec_id"))
          .limit(10)
          .select(col("vec_id"), col("label"), round(col("raw_score"), 6).as("score"))
      }),

    QueryDef("q21_knn_euclidean", Some(
      s"""SELECT e.vec_id, e.label,
         |  round(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])), 6) AS dist
         |FROM embeddings e,
         |  (SELECT embedding AS qe FROM embeddings WHERE vec_id = 7) q
         |WHERE e.vec_id <> 7
         |ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])), e.vec_id
         |LIMIT 10""".stripMargin),
      (spark, dir) => {
        val e = table(spark, dir, "embeddings")
        val q = e.filter(col("vec_id") === 7).select(col("embedding").as("qe"))
        e.filter(col("vec_id") =!= 7).crossJoin(broadcast(q))
          .withColumn("raw_dist", euclidean_dist(col("embedding"), col("qe")))
          .orderBy(col("raw_dist").asc, col("vec_id"))
          .limit(10)
          .select(col("vec_id"), col("label"), round(col("raw_dist"), 6).as("dist"))
      }),

    QueryDef("q22_knn_batch", Some(
      s"""SELECT query_id, neighbor_id, round(raw, 6) AS score, rank FROM (
         |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, $cosSql AS raw,
         |    CAST(row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY $cosSql DESC, e.vec_id) AS INTEGER) AS rank
         |  FROM embeddings e,
         |    (SELECT vec_id, embedding AS qe FROM embeddings WHERE vec_id < 5) q)
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin),
      (spark, dir) => {
        val e = table(spark, dir, "embeddings")
        val q = e.filter(col("vec_id") < 5)
        Similarity.bruteForceTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 5)
          .select(col("query_id"), col("neighbor_id"),
            round(col("score"), 6).as("score"), col("rank"))
          .orderBy("query_id", "rank")
      }),

    QueryDef("q23_vector_stats", Some(
      """WITH e AS (
        |  SELECT label,
        |    CAST(floor(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) * 1000000.0 + 0.5) AS BIGINT) AS nrm_e6
        |  FROM embeddings)
        |SELECT label, count(*) AS n,
        |  CAST(floor(CAST(sum(nrm_e6) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS avg_norm_e6,
        |  min(nrm_e6) AS min_norm_e6,
        |  max(nrm_e6) AS max_norm_e6
        |FROM e GROUP BY label
        |ORDER BY label""".stripMargin),
      (spark, dir) =>
        // per-row e6 norms (bit-identical single-pass dot + sqrt on
        // both engines), then EXACT integer aggregation — the avg is
        // one division of exact integers, not a double sum (round-16)
        table(spark, dir, "embeddings")
          .withColumn("nrm_e6",
            floor(vector_norm(col("embedding")) * lit(1e6) + lit(0.5)))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n"),
            floor(sum(col("nrm_e6")).cast("double") / count(lit(1))
              + lit(0.5)).as("avg_norm_e6"),
            min(col("nrm_e6")).as("min_norm_e6"),
            max(col("nrm_e6")).as("max_norm_e6"))
          .orderBy(col("label"))),

    QueryDef("q24_normalize", Some(
      """SELECT vec_id,
        |  CAST(floor(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) * 1000000.0 + 0.5) AS BIGINT) AS norm_e6,
        |  CAST(floor((CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) = 0
        |    THEN CAST(embedding[1] AS DOUBLE)
        |    ELSE CAST(embedding[1] AS DOUBLE) /
        |      sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
        |  END) * 1000000.0 + 0.5) AS BIGINT) AS first_component_e6
        |FROM embeddings
        |WHERE vec_id < 50
        |ORDER BY vec_id""".stripMargin),
      (spark, dir) =>
        table(spark, dir, "embeddings")
          .filter(col("vec_id") < 50)
          .select(col("vec_id"),
            floor(vector_norm(col("embedding")) * lit(1e6) + lit(0.5))
              .as("norm_e6"),
            floor(element_at(normalize_vec(col("embedding")), 1)
                .cast("double") * lit(1e6) + lit(0.5))
              .as("first_component_e6"))
          .orderBy(col("vec_id"))),

    QueryDef("q25_embedding_neardup", Some(
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
        |    (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
        |     sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
        |    (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
        |     sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin),
      (spark, dir) =>
        Dedup.embeddingNearDupPairs(table(spark, dir, "embeddings"),
            "vec_id", "embedding", minCosine = 0.3, bruteForce = true)
          .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
          .orderBy("id_a", "id_b")),

    // The PRODUCTION form of q25: hyperplane-bucketed candidates with
    // auto-sized bucket bits (~64 ids/bucket/table — linear candidate
    // mass), exact cosine verify. Seed-dependent recall ⇒ rows-only
    // driver check; DedupSpec asserts the bucketed output is a subset
    // of brute-force with high recall at near-dup thresholds. This is
    // the query the sf10 scale probe benches — q25's brute-force
    // oracle form is O(n²) BY DESIGN of the gate and is excluded there.
    QueryDef("q106_embedding_neardup_lsh", None,
      (spark, dir) =>
        Dedup.embeddingNearDupPairs(table(spark, dir, "embeddings"),
            "vec_id", "embedding", minCosine = 0.3, bruteForce = false,
            bitsPerTable = 0)
          .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
          .orderBy("id_a", "id_b"),
      oracleGen = Some((spark, dir) => AnnOracles.safe("q106") {
        val bits = Similarity.autoBits(
          graft.sources.TableStats.rowCountForSizing(table(spark, dir, "embeddings")))
        AnnOracles.q106(spark, dir,
          LshModel(numTables = 8, bitsPerTable = bits, dim = 64), minCosine = 0.3)
      })),

    // kNN JOIN: every embedding queries the whole corpus for its top-5
    // neighbors (excluding itself) through the LSH bucket equi-join —
    // the similarity-GRAPH builder (semantic clustering / mixing needs
    // the full edge list, and no side is broadcastable at 100 TB).
    // Auto-sized bucket bits keep the candidate mass ~linear (same
    // contract as q106). The query aggregates the graph to per
    // (label_a, label_b) edge counts so the dumped result stays
    // driver-small at every scale while the bench still pays the full
    // join. Seed-dependent candidates ⇒ rows-only; AnnRecallSpec
    // asserts the recall floor and the exact-score contract.
    QueryDef("q107_knn_join_lsh", None,
      (spark, dir) => {
        val e = table(spark, dir, "embeddings")
        val bits = Similarity.autoBits(graft.sources.TableStats.rowCountForSizing(e))
        val lsh = LshModel(numTables = 8, bitsPerTable = bits, dim = 64)
        val edges = Similarity.lshKnnJoin(e, "vec_id", "embedding",
          e, "vec_id", "embedding", k = 5, lsh = lsh, excludeSelf = true)
        val labels = e.select(col("vec_id"), col("label"))
        edges
          .join(labels.withColumnRenamed("vec_id", "query_id")
            .withColumnRenamed("label", "label_a"), Seq("query_id"))
          .join(labels.withColumnRenamed("vec_id", "neighbor_id")
            .withColumnRenamed("label", "label_b"), Seq("neighbor_id"))
          .groupBy("label_a", "label_b")
          .agg(count(lit(1)).as("n_edges"), round(avg("score"), 6).as("avg_score"))
          .orderBy("label_a", "label_b")
      },
      oracleGen = Some((spark, dir) => AnnOracles.safe("q107") {
        val bits = Similarity.autoBits(
          graft.sources.TableStats.rowCountForSizing(table(spark, dir, "embeddings")))
        AnnOracles.q107(spark, dir,
          LshModel(numTables = 8, bitsPerTable = bits, dim = 64), k = 5)
      })),

    // Semantic dedup (SemDeDup, Abbas et al. 2023): seeded k-means
    // clusters + within-cluster exact-cosine duplicate groups, keep the
    // member least similar to its centroid. Seed-dependent clustering
    // ⇒ rows-only driver check; SemDedupSpec asserts the structural
    // contracts (one keeper per duplicate group, keep-rule argmin,
    // singleton preservation, determinism, differential vs per-cluster
    // brute force). Output aggregates to per-cluster counts so the
    // dump stays driver-small at every scale while the bench pays the
    // full cluster+join pipeline.
    QueryDef("q109_semdedup", None,
      (spark, dir) => {
        val emb = table(spark, dir, "embeddings")
        val model = semDedupCache.getOrElseUpdate(dir,
          graft.operators.SemDedup.trainModel(emb, "embedding"))
        // 0.4 sits in this corpus's "semantic near-dup" band (the
        // synthetic embeddings top out at pairwise cos ~0.5; the 0.95
        // band of a real encoder corpus is empty here) so the drop
        // path is exercised at data scale, not just in the spec.
        val flags = graft.operators.SemDedup.semDedup(
          emb, "vec_id", "embedding", minCosine = 0.4, model = Some(model))
        flags.groupBy("cluster_id")
          .agg(count(lit(1)).as("n_members"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            round(avg("centroid_sim"), 6).as("avg_centroid_sim"))
          .orderBy("cluster_id")
      },
      // replayable: the trained centroids are seeded driver state (the
      // q27 argument); assignment/pairs/keep-rule are arithmetic both
      // engines evaluate identically, components replay via the q61
      // recursive CTE. The generator withholds on argmin disagreement,
      // hot-cluster cap, boundary margins, and a replay-flop budget.
      oracleGen = Some((spark, dir) => AnnOracles.safe("q109") {
        AnnOracles.q109(spark, dir,
          semDedupCache.getOrElseUpdate(dir,
            graft.operators.SemDedup.trainModel(
              table(spark, dir, "embeddings"), "embedding")),
          minCosine = 0.4)
      })),

    // SemDeDup at the PAPER's threshold band (0.95): the synthetic
    // corpus tops out at pairwise cos ~0.5 (q109/q112 run at 0.4 so the
    // drop path sees data scale), so this query PLANTS the near-dup
    // mass — for every 10th vector, a deterministic perturbed copy at
    // cos ≈ 0.9998 (a 0.02-scaled element rotation: distinct vector, so
    // it exercises the near-dup pair path, NOT the exact-collapse) —
    // and runs the production threshold end to end. Output: keep/drop
    // counts by planted-vs-original, which pins the contract (every
    // planted pair collapses to one survivor; no original-original pair
    // is within 0.95). Replay-oracled via AnnOracles.q113 (the q109
    // machinery over the planted union corpus); SemDedupSpec gates the
    // planted-drop floor and no-false-positive contracts on a fixture.
    QueryDef("q113_semdedup_planted", None,
      (spark, dir) => {
        val e = table(spark, dir, "embeddings")
        // ScaleGen replica copies shift ids by k*100000000, so a FIXED
        // planted offset misclassifies ~all copy-k>=1 originals as
        // "planted" at data/sf1+; derive the offset from the corpus
        // itself (one driver-bounded max probe) so planted ids are
        // disjoint from originals at every scale leg.
        val plantedBase =
          e.agg(max(col("vec_id"))).collect()(0).getLong(0) + 1L
        val planted = e.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + plantedBase).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x + lit(0.02) * element_at(col("embedding"),
                pmod(i + 1, size(col("embedding"))) + 1))
              .cast("array<float>").as("embedding"),
            col("label"))
        val union = e.select("vec_id", "embedding", "label").unionByName(planted)
        val model = semDedupCache.getOrElseUpdate(dir + "#planted",
          graft.operators.SemDedup.trainModel(union, "embedding"))
        val flags = graft.operators.SemDedup.semDedup(
          union, "vec_id", "embedding", minCosine = 0.95, model = Some(model))
        flags.withColumn("planted", col("vec_id") >= plantedBase)
          .groupBy("planted")
          .agg(count(lit(1)).as("n"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
          .orderBy("planted")
      },
      // replayable now that planted ids are explicit (offset derived
      // from max(vec_id)+1): the planted-union construction is
      // deterministic float arithmetic both engines reproduce
      // bit-identically, and the rest is the q109 replay over the
      // union corpus with the union-trained served model.
      oracleGen = Some((spark, dir) => AnnOracles.safe("q113") {
        val e = table(spark, dir, "embeddings")
        val plantedBase =
          e.agg(max(col("vec_id"))).collect()(0).getLong(0) + 1L
        val planted = e.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + plantedBase).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x + lit(0.02) * element_at(col("embedding"),
                pmod(i + 1, size(col("embedding"))) + 1))
              .cast("array<float>").as("embedding"),
            col("label"))
        val union = e.select("vec_id", "embedding", "label").unionByName(planted)
        AnnOracles.q113(spark, dir,
          semDedupCache.getOrElseUpdate(dir + "#planted",
            graft.operators.SemDedup.trainModel(union, "embedding")),
          plantedBase, minCosine = 0.95)
      })),

    // Incremental SemDeDup: a 20% "arriving batch" deduped against the
    // 80% authoritative corpus — the semantic sibling of
    // q76_incremental_neardup. The existing×existing pair mass never
    // forms (batch joins against the cluster-assigned union only),
    // which is what makes semantic re-curation affordable at 100 TB.
    // Reuses q109's served clustering (train once, dedup many).
    // Replay-oracled via AnnOracles.q112 (centroid-literal replay of
    // the whole fold); SemDedupSpec gates corpus-dup drops, in-batch
    // group keep-rule, cap parity, and model-reuse identity.
    QueryDef("q112_incremental_semdedup", None,
      (spark, dir) => {
        val e = table(spark, dir, "embeddings")
        val model = semDedupCache.getOrElseUpdate(dir,
          graft.operators.SemDedup.trainModel(e, "embedding"))
        val surv = graft.operators.SemDedup.semDedupIncremental(
          e.filter(col("vec_id") % 5 =!= 0), e.filter(col("vec_id") % 5 === 0),
          "vec_id", "embedding", minCosine = 0.4, model = Some(model))
        surv.groupBy("label")
          .agg(count(lit(1)).as("n_survivors"))
          .orderBy("label")
      },
      // replayable with the q109 machinery: the fold is deterministic
      // given the served centroid literals; see AnnOracles.q112.
      oracleGen = Some((spark, dir) => AnnOracles.safe("q112") {
        AnnOracles.q112(spark, dir,
          semDedupCache.getOrElseUpdate(dir,
            graft.operators.SemDedup.trainModel(
              table(spark, dir, "embeddings"), "embedding")),
          minCosine = 0.4)
      })),

    // Incremental SemDeDup under a SKEWED arriving batch — the
    // realistic re-crawl shape: 80% of the batch is exact or
    // near-identical copies of 4 "hot" corpus vectors (spam mass that
    // concentrates into 4 clusters), 20% is organic fresh content. The
    // hot clusters' combined occupancy crosses maxClusterRows once the
    // corpus is large enough (data/sf1 up), driving the incremental
    // cap path (exact equi-join + rep-collapsed in-cluster LSH) at
    // data scale; below the cap the same query exercises the uncapped
    // join on the identical skew. Expected contract (gated at spec
    // scale in SemDedupSpec): spam drops as dup-of-existing, organic
    // survives. Seed-dependent clustering ⇒ rows-only.
    QueryDef("q114_incremental_semdedup_skew", None,
      (spark, dir) => {
        val e = table(spark, dir, "embeddings")
        val existing = e.filter(col("vec_id") % 5 =!= 0)
        val batch = q114Batch(spark, dir)
        val model = semDedupCache.getOrElseUpdate(dir,
          graft.operators.SemDedup.trainModel(e, "embedding"))
        // engagement VERDICT in the output (q70/q122 discipline): when
        // true, the run used the guarded star + bucket-capped candidate
        // stage — the oracle generator withholds there by design. Read
        // off the operator's own histogram (zero extra scans).
        val (surv, capped) = graft.operators.SemDedup
          .semDedupIncrementalVerdict(
            existing, batch, "vec_id", "embedding", minCosine = 0.95,
            model = Some(model), maxClusterRows = 256)
        batch.groupBy("kind").agg(count(lit(1)).as("n_batch"))
          .join(surv.groupBy("kind").agg(count(lit(1)).as("n_survived")),
            Seq("kind"), "left")
          .na.fill(0L, Seq("n_survived"))
          .withColumn("cap_engaged", lit(capped))
          .orderBy("kind")
      },
      // replayable at fixture dirs where the cap does NOT engage (the
      // generator verifies the engine's own cap predicate and withholds
      // otherwise — at sf1+ the hot clusters cross maxClusterRows=256
      // by design and the oracle falls back to rows-only): the batch
      // construction is deterministic float arithmetic both engines
      // reproduce, and the uncapped fold is the q112 replay.
      oracleGen = Some((spark, dir) => AnnOracles.safe("q114") {
        AnnOracles.q114(spark, dir,
          semDedupCache.getOrElseUpdate(dir,
            graft.operators.SemDedup.trainModel(
              table(spark, dir, "embeddings"), "embedding")),
          q114Batch(spark, dir), minCosine = 0.95, maxClusterRows = 256)
      })),

    // Streaming-ingest semantic dedup: q112's batch-vs-corpus contract
    // run INSIDE a Structured Streaming foreachBatch — the 20%
    // "arriving" slice lands as three sequential parquet micro-batches
    // on a file stream; each trigger dedups against the accumulated
    // authoritative corpus (base + prior survivors, served train-once
    // model) via CorpusStream.semDedupIngestStream and appends its
    // survivors. Batches are fed write→processAllAvailable so batch
    // boundaries (and hence the keep-set) are deterministic — which is
    // also what makes the replay oracle possible: AnnOracles.q115
    // chains the q112 fold replay over the three pinned batches.
    // StreamingIndexSpec additionally gates keep-decision IDENTITY
    // with the sequential batch fold over the same splits.
    QueryDef("q115_streaming_semdedup", None,
      (spark, dir) => {
        val e = table(spark, dir, "embeddings")
        val model = semDedupCache.getOrElseUpdate(dir,
          graft.operators.SemDedup.trainModel(e, "embedding"))
        val cols = Seq("vec_id", "embedding", "label")
        val base = e.filter(col("vec_id") % 5 =!= 0).select(cols.map(col): _*)
        val arriving = e.filter(col("vec_id") % 5 === 0).select(cols.map(col): _*)
        val staging = java.nio.file.Files
          .createTempDirectory("graft-q115-arrivals").toString
        // accumulated authoritative corpus; lineage truncated per
        // trigger (foreachBatch runs on the driver, so the fold state
        // is a plain var — at scale this is the durable corpus table)
        var corpus = base.localCheckpoint(true)
        val stream = spark.readStream.schema(arriving.schema).parquet(staging)
        val q = graft.streaming.CorpusStream.semDedupIngestStream(
          stream, "vec_id", "embedding", model, minCosine = 0.4,
          readCorpus = () => corpus,
          appendSurvivors = surv =>
            corpus = corpus.unionByName(surv.select(cols.map(col): _*))
              .localCheckpoint(true))
        try (0 until 3).foreach { b =>
          arriving.filter(pmod((col("vec_id") / 5).cast("long"), lit(3)) === b)
            .coalesce(1).write.mode("append").parquet(staging)
          q.processAllAvailable()
        } finally q.stop()
        // survivors = accumulated corpus minus the base it started from
        corpus.join(base.select("vec_id"), Seq("vec_id"), "left_anti")
          .groupBy("label").agg(count(lit(1)).as("n_survivors"))
          .orderBy("label")
      },
      // replayable: the q112 replay chained over the three deterministic
      // micro-batch folds (batch boundaries are pinned by construction —
      // write→processAllAvailable); see AnnOracles.q115.
      oracleGen = Some((spark, dir) => AnnOracles.safe("q115") {
        AnnOracles.q115(spark, dir,
          semDedupCache.getOrElseUpdate(dir,
            graft.operators.SemDedup.trainModel(
              table(spark, dir, "embeddings"), "embedding")),
          minCosine = 0.4)
      })),

    // --- ANN paths: seed-dependent, rows-only driver check; recall vs the
    // exact oracle is asserted in AnnRecallSpec.
    QueryDef("q26_knn_lsh", None,
      (spark, dir) => {
        val e = table(spark, dir, "embeddings")
        val lsh = LshModel(numTables = 8, bitsPerTable = 8, dim = 64)
        val sigs = lsh.build(e, "vec_id", "embedding")
        val query = e.filter(col("vec_id") === 0).select("embedding")
          .collect()(0).getSeq[Float](0).toArray
        val cands = lsh.candidates(sigs, query).withColumnRenamed("id", "vec_id")
        val universe = e.join(cands, Seq("vec_id"), "left_semi")
        Similarity.knnExact(universe, "vec_id", "embedding", query, 10)
          .select(col("vec_id"), col("label"), round(col("score"), 6).as("score"))
      },
      oracleGen = Some((spark, dir) => AnnOracles.safe("q26") {
        AnnOracles.q26(spark, dir, LshModel(numTables = 8, bitsPerTable = 8, dim = 64))
      })),

    QueryDef("q27_knn_ivf", None,
      (spark, dir) => {
        val e = table(spark, dir, "embeddings")
        val model = ivfModel(spark, dir, 16)
        val assigned = model.assign(e, "embedding")
        val query = e.filter(col("vec_id") === 0).select("embedding")
          .collect()(0).getSeq[Float](0).toArray
        val cands = model.candidates(assigned, query, nprobe = 4)
        Similarity.knnExact(cands, "vec_id", "embedding", query, 10)
          .select(col("vec_id"), col("label"), round(col("score"), 6).as("score"))
      },
      oracleGen = Some((spark, dir) => AnnOracles.safe("q27") {
        AnnOracles.ivfSingleQuery(spark, dir, ivfModel(spark, dir, 16), nprobe = 4)
      })),

    // INT8 quantization (storage path; Quantize scaladoc). Output is
    // scalar checksums of the quantized vector (sum/sumsq/min/max/first
    // are exact integer arithmetic — no float-rounding ambiguity), so
    // the whole per-element quantization is hash-compared without
    // putting arrays through the compare.
    QueryDef("q73_quantize_int8", Some(
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |m AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS mx FROM v),
        |q AS (SELECT vec_id, mx,
        |    CASE WHEN mx = 0 THEN list_transform(e, x -> 0)
        |      ELSE list_transform(e, x -> CAST(floor(x * (127.0 / mx) + 0.5) AS INTEGER)) END AS qv
        |  FROM m)
        |SELECT vec_id,
        |  CAST(floor((CASE WHEN mx = 0 THEN 0.0 ELSE 127.0 / mx END) * 1000000.0 + 0.5) AS BIGINT) AS scale_e6,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS q_sumsq,
        |  CAST(list_min(qv) AS INTEGER) AS q_min,
        |  CAST(list_max(qv) AS INTEGER) AS q_max,
        |  qv[1] AS q_first
        |FROM q ORDER BY vec_id""".stripMargin),
      (spark, dir) => {
        import graft.operators.Quantize
        table(spark, dir, "embeddings")
          .select(col("vec_id"),
            Quantize.quantizeInt8(col("embedding")).as("qv"),
            floor(Quantize.int8Scale(col("embedding")) * lit(1e6) + lit(0.5))
              .as("scale_e6"))
          .select(col("vec_id"), col("scale_e6"),
            aggregate(col("qv"), lit(0L), (acc, x) => acc + x).as("q_sum"),
            aggregate(col("qv"), lit(0L), (acc, x) => acc + x * x).as("q_sumsq"),
            array_min(col("qv")).as("q_min"),
            array_max(col("qv")).as("q_max"),
            element_at(col("qv"), 1).as("q_first"))
          .orderBy("vec_id")
      }),

    // PQ two-tier search: ADC top-50 candidate fetch over 8x16 codes
    // (32x-compressed), exact cosine rerank to top-10. Rows-only like
    // the other seeded-ANN paths (codebooks come from seeded k-means);
    // candidate-tier recall is measured in AnnRecallSpec.
    QueryDef("q77_knn_pq", None,
      (spark, dir) => {
        val e = table(spark, dir, "embeddings")
        val pq = pqModel(spark, dir)
        val q = e.filter(col("vec_id") === 0).select("embedding")
          .collect()(0).getSeq[Float](0).toArray
        val encoded = e.select(col("vec_id"), pq.encodeColumn(col("embedding")).as("codes"))
        val cands = pq.candidates(encoded, "codes", q, n = 50,
          idCol = Some("vec_id")).select("vec_id")
        e.join(cands, Seq("vec_id"), "left_semi")
          .withColumn("raw_score", cosine_sim(col("embedding"), typedlit(q.toSeq)))
          .orderBy(col("raw_score").desc, col("vec_id"))
          .limit(10)
          .select(col("vec_id"), col("label"), round(col("raw_score"), 6).as("score"))
      },
      oracleGen = Some((spark, dir) => AnnOracles.safe("q77") {
        AnnOracles.q77(spark, dir, pqModel(spark, dir), n = 50)
      })),

    // IVF-PQ two-tier search: probe 8 of 16 cells, residual-ADC top-50,
    // exact rerank — the composed billion-vector index architecture.
    // Rows-only (seeded k-means); recall measured in AnnRecallSpec.
    QueryDef("q78_knn_ivfpq", None,
      (spark, dir) => {
        val e = table(spark, dir, "embeddings")
        val model = ivfpqCache.getOrElseUpdate(dir,
          graft.index.IvfPqModel.train(e, "embedding", nlist = 16, m = 8, k = 16))
        val q = e.filter(col("vec_id") === 0).select("embedding")
          .collect()(0).getSeq[Float](0).toArray
        val encoded = model.encode(e, "vec_id", "embedding")
        val cands = model.candidates(encoded, q, nprobe = 8, n = 50)
          .select(col("id").as("vec_id"))
        e.join(cands, Seq("vec_id"), "left_semi")
          .withColumn("raw_score", cosine_sim(col("embedding"), typedlit(q.toSeq)))
          .orderBy(col("raw_score").desc, col("vec_id"))
          .limit(10)
          .select(col("vec_id"), col("label"), round(col("raw_score"), 6).as("score"))
      },
      oracleGen = Some((spark, dir) => AnnOracles.safe("q78") {
        val e = table(spark, dir, "embeddings")
        val model = ivfpqCache.getOrElseUpdate(dir,
          graft.index.IvfPqModel.train(e, "embedding", nlist = 16, m = 8, k = 16))
        AnnOracles.q78(spark, dir, model, nprobe = 8, n = 50)
      })),

    // OPQ two-tier search: learned-rotation PQ (Ge 2014) — rotate via
    // the codegen MatVec expression, 8x16 codes, ADC top-50 in rotated
    // space, exact cosine rerank. Replay-oracled (AnnOracles.q88): the
    // seeded Procrustes rotation dumps as SQL literals like the PQ
    // codebooks; withholds on thin code/cutoff margins.
    // Quantization-error monotonicity and recall in AnnRecallSpec.
    QueryDef("q88_knn_opq", None,
      (spark, dir) => {
        val e = table(spark, dir, "embeddings")
        val opq = opqCache.getOrElseUpdate(dir,
          graft.index.OpqModel.train(e, "embedding", m = 8, k = 16, iters = 4))
        val q = e.filter(col("vec_id") === 0).select("embedding")
          .collect()(0).getSeq[Float](0).toArray
        val encoded = e.select(col("vec_id"), opq.encodeColumn(col("embedding")).as("codes"))
        val cands = opq.candidates(encoded, "codes", q, n = 50,
          idCol = Some("vec_id")).select("vec_id")
        e.join(cands, Seq("vec_id"), "left_semi")
          .withColumn("raw_score", cosine_sim(col("embedding"), typedlit(q.toSeq)))
          .orderBy(col("raw_score").desc, col("vec_id"))
          .limit(10)
          .select(col("vec_id"), col("label"), round(col("raw_score"), 6).as("score"))
      },
      oracleGen = Some((spark, dir) => AnnOracles.safe("q88") {
        AnnOracles.q88(spark, dir,
          opqCache.getOrElseUpdate(dir, graft.index.OpqModel.train(
            table(spark, dir, "embeddings"), "embedding", m = 8, k = 16, iters = 4)),
          n = 50)
      })),

    // OPQ+IVF-PQ two-tier search — the full FAISS-style `OPQ,IVF,PQ`
    // stack: probe 8 of 16 cells, learned-rotation residual ADC top-50,
    // exact cosine rerank. Replay-oracled (AnnOracles.q91): rotation +
    // centroids + codebooks dump as SQL literals; withholds on thin
    // probe/assign/code/cutoff margins. The rotated-residual MSE win
    // and candidate recall are measured in AnnRecallSpec.
    QueryDef("q91_knn_opq_ivfpq", None,
      (spark, dir) => {
        val e = table(spark, dir, "embeddings")
        val model = opqIvfpqCache.getOrElseUpdate(dir,
          graft.index.OpqIvfPqModel.train(e, "embedding", nlist = 16, m = 8, k = 16))
        val q = e.filter(col("vec_id") === 0).select("embedding")
          .collect()(0).getSeq[Float](0).toArray
        val encoded = model.encode(e, "vec_id", "embedding")
        val cands = model.candidates(encoded, q, nprobe = 8, n = 50)
          .select(col("id").as("vec_id"))
        e.join(cands, Seq("vec_id"), "left_semi")
          .withColumn("raw_score", cosine_sim(col("embedding"), typedlit(q.toSeq)))
          .orderBy(col("raw_score").desc, col("vec_id"))
          .limit(10)
          .select(col("vec_id"), col("label"), round(col("raw_score"), 6).as("score"))
      },
      oracleGen = Some((spark, dir) => AnnOracles.safe("q91") {
        AnnOracles.q91(spark, dir,
          opqIvfpqCache.getOrElseUpdate(dir, graft.index.OpqIvfPqModel.train(
            table(spark, dir, "embeddings"), "embedding", nlist = 16, m = 8, k = 16)),
          nprobe = 8, n = 50)
      })),

    // HNSW graph-tier search: seeded graph build (broadcast-bounded
    // driver state), 50 graph candidates, exact cosine rerank to top-10.
    // Rows-only like the other seeded-ANN paths; graph recall and the
    // coarse-quantizer composition are measured in AnnRecallSpec.
    QueryDef("q86_knn_hnsw", None,
      (spark, dir) => {
        val e = table(spark, dir, "embeddings")
        val g = hnswCache.getOrElseUpdate(dir,
          graft.index.HnswModel.build(e, "vec_id", "embedding"))
        val q = e.filter(col("vec_id") === 0).select("embedding")
          .collect()(0).getSeq[Float](0).toArray
        val cands = g.search(q, k = 50, ef = 100).map(_._1)
        e.filter(col("vec_id").isin(cands.map(Long.box): _*))
          .withColumn("raw_score", cosine_sim(col("embedding"), typedlit(q.toSeq)))
          .orderBy(col("raw_score").desc, col("vec_id"))
          .limit(10)
          .select(col("vec_id"), col("label"), round(col("raw_score"), 6).as("score"))
      },
      // replayable iff the graph walk's rerank equals the exact top-10
      // in double arithmetic (the generator checks and withholds
      // otherwise) — the SQL replays exact brute-force kNN
      oracleGen = Some((spark, dir) => AnnOracles.safe("q86") {
        AnnOracles.q86(spark, dir, hnswCache.getOrElseUpdate(dir,
          graft.index.HnswModel.build(
            table(spark, dir, "embeddings"), "vec_id", "embedding")))
      })),

    // Distributed (sharded) HNSW bulk kNN join — the graph tier PAST
    // the driver cap (ShardedHnsw scaladoc): seeded k-means router,
    // per-shard graphs built inside executor tasks (no driver collect
    // of vectors), SPANN-style replicas=2 boundary replication, routed
    // cogroup navigation, exact-cosine rerank. Small shards here so the
    // routing genuinely engages at fixture scale; the oracle is the
    // q86-style guard replay (emitted only when the routed walk's
    // top-10 equals exact kNN for every query), so every Verify run
    // re-proves the shard walk. Hash = e6-floor scores (round-16 rule).
    QueryDef("q128_knn_sharded_hnsw", None,
      (spark, dir) => {
        val e = table(spark, dir, "embeddings")
        val idx = shardedHnswCache.getOrElseUpdate(dir, {
          val b = graft.index.ShardedHnsw.build(e, "vec_id", "embedding",
            targetShardRows = 256, efConstruction = 200, replicas = 2)
          b.copy(nodes = b.nodes.localCheckpoint(true))
        })
        idx.knnJoin(e.filter(col("vec_id") < 20), "vec_id", "embedding",
            e, "vec_id", "embedding", k = 10, ef = 100, probeShards = 4)
          .select(col("query_id"), col("neighbor_id"),
            floor(col("score") * lit(1e6) + lit(0.5)).as("score_e6"),
            col("rank"))
          .orderBy("query_id", "rank")
      },
      oracleGen = Some((spark, dir) => AnnOracles.safe("q128") {
        val e = table(spark, dir, "embeddings")
        val idx = shardedHnswCache.getOrElseUpdate(dir, {
          val b = graft.index.ShardedHnsw.build(e, "vec_id", "embedding",
            targetShardRows = 256, efConstruction = 200, replicas = 2)
          b.copy(nodes = b.nodes.localCheckpoint(true))
        })
        AnnOracles.q128(spark, dir, idx, nQueries = 20, k = 10,
          ef = 100, probeShards = 4)
      })),

    // IVF search with probe selection routed through the HNSW graph
    // OVER THE CENTROIDS — the FAISS coarse-quantizer composition and
    // the documented answer to "HNSW at data scale": the graph holds
    // only nlist centroids (driver state), answers top-nprobe cell
    // selection in O(log nlist) hops instead of the linear centroid
    // scan, and the data plane stays the partition-pruned IVF scan. At
    // serving nlist (~sqrt(n), crosses GraftConfig.hnswCoarseMinNlist)
    // IvfModel.probe takes this path automatically; the query pins the
    // composition explicitly so it executes at every fixture scale.
    // Rows-only (seeded k-means + graph); AnnRecallSpec asserts
    // graph-vs-linear probe agreement and the auto-switch threshold.
    QueryDef("q110_knn_ivf_hnsw_coarse", None,
      (spark, dir) => {
        val e = table(spark, dir, "embeddings")
        val model = ivfModel(spark, dir, 16)
        val graph = graft.index.HnswModel.overCentroids(model)
        val assigned = model.assign(e, "embedding")
        val query = e.filter(col("vec_id") === 0).select("embedding")
          .collect()(0).getSeq[Float](0).toArray
        val cells = graph.probeCells(query, nprobe = 4)
        val cands = assigned.filter(col("cluster_id").isin(cells.map(Int.box): _*))
        Similarity.knnExact(cands, "vec_id", "embedding", query, 10)
          .select(col("vec_id"), col("label"), round(col("score"), 6).as("score"))
      },
      // replayable iff the graph-routed probe equals the linear probe it
      // approximates at this dir (the generator checks and withholds
      // otherwise) — the SQL replays the linear form
      oracleGen = Some((spark, dir) => AnnOracles.safe("q110") {
        val model = ivfModel(spark, dir, 16)
        val graph = graft.index.HnswModel.overCentroids(model)
        val query = table(spark, dir, "embeddings")
          .filter(col("vec_id") === 0).select("embedding")
          .collect()(0).getSeq[Float](0).toArray
        AnnOracles.ivfSingleQuery(spark, dir, model, nprobe = 4,
          requireCells = Some(graph.probeCells(query, nprobe = 4).toSet))
      })),

    QueryDef("q28_ivf_batch", None,
      (spark, dir) => {
        val e = table(spark, dir, "embeddings")
        val model = ivfModel(spark, dir, 16)
        val q = e.filter(col("vec_id") < 5)
        Similarity.ivfTopK(e, "vec_id", "embedding", q, "vec_id", "embedding",
            k = 5, model = model, nprobe = 4)
          .select(col("query_id"), col("neighbor_id"),
            round(col("score"), 6).as("score"), col("rank"))
          .orderBy("query_id", "rank")
      },
      oracleGen = Some((spark, dir) => AnnOracles.safe("q28") {
        AnnOracles.q28(spark, dir, ivfModel(spark, dir, 16), nprobe = 4, k = 5)
      })),

    // Binary sign-quantization kNN: 1 bit/dim packed signatures, a
    // codegen'd xor+popcount Hamming top-64 prefilter over the 8-byte
    // sig column (32x less scan I/O than the float32 vectors), exact
    // cosine rerank of the 64 winners via a broadcast join back into
    // the corpus. The prefilter is the one ANN stage with NO float
    // boundary at all — a stored float's sign and an integer distance
    // replay exactly — so the oracle guards only the rerank's k/k+1
    // cutoff (AnnOracles.q116). BinaryQuantSpec pins pack/hamming
    // semantics, recall vs exact, and the whole-stage-codegen plan.
    QueryDef("q116_knn_binary", None,
      (spark, dir) => {
        val e = table(spark, dir, "embeddings")
        val q = e.filter(col("vec_id") === 0).select("embedding")
          .collect()(0).getSeq[Float](0).toArray
        graft.index.BinaryQuant.knn(e, "vec_id", "embedding", q,
            k = 10, candidates = 64)
          .select(col("vec_id"), col("label"),
            round(col("score"), 6).as("score"))
      },
      oracleGen = Some((spark, dir) => AnnOracles.safe("q116") {
        AnnOracles.q116(spark, dir, k = 10, cands = 64)
      })),

    // Multi-index Hamming near-dup join: the binary tier's banded
    // self-join with a DETERMINISTIC recall guarantee — any pair
    // within Hamming maxHamming shares at least one of the
    // maxHamming+1 disjoint signature bands (pigeonhole), where LSH
    // banding only guarantees recall probabilistically. The fixture's
    // organic pairs sit at Hamming 14+ (measured, NOTES r13), so the
    // query plants exact-construction duplicates the q113 way: one
    // copy of every vector with dims 1-2 negated — at most 2 sign
    // flips, replayed bit-exactly in SQL (float negation is exact).
    // The engine's banded join must return exactly the brute-force
    // (ham <= 3 AND cos >= 0.5) pair set the oracle computes.
    QueryDef("q117_hamming_neardup", None,
      (spark, dir) => {
        graft.index.BinaryQuant.hammingNearDupPairs(q117Corpus(spark, dir),
            "vec_id", "embedding", dim = 64, maxHamming = 3, minCosine = 0.5)
          .select(col("ia").as("id_a"), col("ib").as("id_b"), col("ham"),
            round(col("cosine"), 6).as("cosine"))
          .orderBy("id_a", "id_b")
      },
      oracleGen = Some((spark, dir) => AnnOracles.safe("q117") {
        AnnOracles.q117(spark, dir, q117Corpus(spark, dir),
          dim = 64, maxHamming = 3, minCosine = 0.5)
      })),

    // Maximal Marginal Relevance diversified top-k (Similarity.mmrTopK
    // scaladoc): greedy λ·rel − (1−λ)·max-sim-to-selected rerank over
    // each query's 20-candidate relevance pool. The oracle is STATIC
    // unrolled SQL — one CTE per greedy step — because the whole chain
    // is libm-free double arithmetic (dot/(√·√) cosines, double
    // literals for λ and 1−λ, greatest(), id tiebreaks): both engines
    // compute bit-identical doubles, so even the argmax at each step
    // and the e6 floors replay exactly with no generator and no
    // margin withholds. 1−λ is emitted as the exact double literal
    // (0.30000000000000004), not the decimal 0.3.
    QueryDef("q130_mmr_diversified", Some(q130OracleSql),
      (spark, dir) => {
        val e = table(spark, dir, "embeddings")
        val q = e.filter(col("vec_id") < 8)
        Similarity.mmrTopK(e, "vec_id", "embedding", q, "vec_id", "embedding",
            k = 5, poolSize = 20, lambda = 0.7)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            floor(col("rel") * lit(1e6) + lit(0.5)).as("rel_e6"),
            floor(col("mmr") * lit(1e6) + lit(0.5)).as("mmr_e6"))
          .orderBy("query_id", "rank")
      }),

    // Matryoshka prefix-dimension two-stage kNN (Similarity
    // .matryoshkaTopK scaladoc): coarse cosine over the first 16 dims
    // prunes the corpus to a 30-candidate pool, exact full-dim rerank
    // picks the top-10 — the zero-trained-state recall/cost dial.
    // Static SQL oracle, same rationale as q130: every score is the
    // libm-free cosine double chain, ties break by id, so DuckDB
    // replays both stages bit-identically (zero-norm guard mirrors the
    // engine's cosine(0-vec) = 0.0 contract).
    QueryDef("q131_knn_matryoshka", Some(q131OracleSql),
      (spark, dir) => {
        val e = table(spark, dir, "embeddings")
        val q = e.filter(col("vec_id") < 8)
        Similarity.matryoshkaTopK(e, "vec_id", "embedding",
            q, "vec_id", "embedding", k = 10, coarseDims = 16, poolSize = 30)
          .select(col("query_id"), col("neighbor_id"),
            floor(col("cscore") * lit(1e6) + lit(0.5)).as("coarse_e6"),
            floor(col("score") * lit(1e6) + lit(0.5)).as("score_e6"),
            col("rank"))
          .orderBy("query_id", "rank")
      }),

    // ANN-pool → MMR composition (VERDICT r16 item 2): the SAME greedy
    // MMR chain as q130 (k=5, λ=0.7, 8 queries, 20-candidate pool) but
    // the pool comes from the sharded-HNSW tier's exact-rerank join
    // (Similarity.mmrRerank's at-scale entry point) instead of the
    // brute-force scan — the end-to-end shape a 100 TB corpus runs.
    // Guard-replayed: the generator emits q130's static unrolled SQL
    // only after proving the ANN pool equals the brute-force
    // top-poolSize id-for-id with a distEps-guarded rank-20/21
    // boundary (AnnOracles.shardedParityOk, the q128/q86 discipline) —
    // every Verify run re-proves pool parity AND the MMR greedy chain
    // replays bit-identically over it. Hash = e6 floors of libm-free
    // doubles; no allowlist entry.
    QueryDef("q132_mmr_over_ann", None,
      (spark, dir) => {
        val e = table(spark, dir, "embeddings")
        val idx = shardedHnswCache.getOrElseUpdate(dir, {
          val b = graft.index.ShardedHnsw.build(e, "vec_id", "embedding",
            targetShardRows = 256, efConstruction = 200, replicas = 2)
          b.copy(nodes = b.nodes.localCheckpoint(true))
        })
        val pool = idx.knnJoin(e.filter(col("vec_id") < 8), "vec_id",
            "embedding", e, "vec_id", "embedding",
            k = 20, ef = 100, probeShards = 4)
          .select("query_id", "neighbor_id", "score")
        Similarity.mmrRerank(pool, e, "vec_id", "embedding",
            k = 5, lambda = 0.7)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            floor(col("rel") * lit(1e6) + lit(0.5)).as("rel_e6"),
            floor(col("mmr") * lit(1e6) + lit(0.5)).as("mmr_e6"))
          .orderBy("query_id", "rank")
      },
      oracleGen = Some((spark, dir) => AnnOracles.safe("q132") {
        val e = table(spark, dir, "embeddings")
        val idx = shardedHnswCache.getOrElseUpdate(dir, {
          val b = graft.index.ShardedHnsw.build(e, "vec_id", "embedding",
            targetShardRows = 256, efConstruction = 200, replicas = 2)
          b.copy(nodes = b.nodes.localCheckpoint(true))
        })
        if (AnnOracles.shardedParityOk(spark, dir, idx, nQueries = 8,
            k = 20, ef = 100, probeShards = 4)) Some(q130OracleSql)
        else None
      })))

  /** q131's two-stage replay: guarded cosine (zero-norm ⇒ 0.0, the
    * engine contract) over the 16-dim prefix for the pool cut, full
    * dims for the rerank. */
  private def q131OracleSql: String = {
    def gcos(a: String, b: String) =
      s"""CASE WHEN list_dot_product($a, $a) = 0 OR list_dot_product($b, $b) = 0
         | THEN 0.0 ELSE list_dot_product($a, $b) /
         | (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))) END"""
        .stripMargin.replace("\n", "")
    s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
       |  FROM embeddings WHERE vec_id < 8 AND embedding IS NOT NULL),
       |e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS ce
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |coarse AS (SELECT query_id, id, ce, qe,
       |    ${gcos("ce[1:16]", "qe[1:16]")} AS cscore FROM e, q),
       |pool AS (SELECT query_id, id, ce, qe, cscore FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cscore DESC, id) AS prn FROM coarse)
       |  WHERE prn <= 30),
       |rer AS (SELECT query_id, id, cscore,
       |    ${gcos("ce", "qe")} AS score FROM pool)
       |SELECT query_id, id AS neighbor_id,
       |  CAST(floor(cscore * 1000000.0 + 0.5) AS BIGINT) AS coarse_e6,
       |  CAST(floor(score * 1000000.0 + 0.5) AS BIGINT) AS score_e6,
       |  CAST(rank AS INTEGER) AS rank
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, id) AS rank FROM rer)
       |WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin
  }

  /** q130's unrolled MMR replay: pool = per-query top-20 by cosine,
    * then one CTE per greedy step — step i joins the pool to the i−1
    * already-selected rows (one per query each), excludes them by id,
    * takes greatest() of the pairwise cosines, and argmaxes the mmr
    * score with the same (mmr DESC, id) tiebreak the engine's window
    * uses. */
  private def q130OracleSql: String = {
    val k = 5
    val lam = "0.7"
    val oneMinusLam = java.lang.Double.toString(1.0 - 0.7)
    // zero-norm guarded (ADVICE r16): mirrors the engine's
    // cosine(0-vec) = 0.0 contract, same form as q131's gcos
    def cos(a: String, b: String) =
      s"""CASE WHEN list_dot_product($a, $a) = 0 OR list_dot_product($b, $b) = 0
         | THEN 0.0 ELSE list_dot_product($a, $b) /
         | (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))) END"""
        .stripMargin.replace("\n", "")
    val steps = (2 to k).map { i =>
      val joins = (1 until i)
        .map(j => s"JOIN s$j ON s$j.query_id = p.query_id").mkString(" ")
      val excl = (1 until i).map(j => s"p.id <> s$j.id").mkString(" AND ")
      val sims = (1 until i).map(j => cos("p.ce", s"s$j.ce"))
      val ms = if (sims.size == 1) sims.head
               else s"greatest(${sims.mkString(", ")})"
      val mmr = s"$lam * p.rel - $oneMinusLam * ($ms)"
      s"""s$i AS (SELECT query_id, id, ce, rel, mmr FROM (
         |    SELECT p.query_id AS query_id, p.id AS id, p.ce AS ce,
         |      p.rel AS rel, $mmr AS mmr,
         |      row_number() OVER (PARTITION BY p.query_id
         |        ORDER BY $mmr DESC, p.id) AS rn
         |    FROM pool p $joins
         |    WHERE $excl)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val ranks = (1 to k).map(i =>
      s"SELECT query_id, id, rel, mmr, CAST($i AS INTEGER) AS rank FROM s$i")
      .mkString("\n  UNION ALL ")
    s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
       |  FROM embeddings WHERE vec_id < 8 AND embedding IS NOT NULL),
       |e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS ce
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |scored AS (SELECT query_id, id, ce,
       |    ${cos("ce", "qe")} AS rel FROM e, q),
       |pool AS (SELECT query_id, id, ce, rel FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY rel DESC, id) AS prn FROM scored)
       |  WHERE prn <= 20),
       |s1 AS (SELECT query_id, id, ce, rel, $lam * rel AS mmr FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY rel DESC, id) AS rn FROM pool)
       |  WHERE rn = 1),
       |$steps
       |SELECT query_id, rank, id AS neighbor_id,
       |  CAST(floor(rel * 1000000.0 + 0.5) AS BIGINT) AS rel_e6,
       |  CAST(floor(mmr * 1000000.0 + 0.5) AS BIGINT) AS mmr_e6
       |FROM ($ranks)
       |ORDER BY query_id, rank""".stripMargin
  }

  /** q117's planted corpus: every embedding plus a copy (ids offset by
    * max+1, the q113 contract) with dims 1-2 NEGATED — at most two
    * sign flips (zero dims flip nothing), cosine 1 − 2(v1²+v2²)/|v|²
    * (≈0.94 on the 64-dim fixture), both exactly reproducible in SQL:
    * negating a stored float is exact in both engines. */
  private def q117Corpus(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val e = table(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull)
      .select("vec_id", "embedding")
    val off = e.agg(max("vec_id")).collect()(0).getLong(0) + 1
    val planted = e.select((col("vec_id") + off).as("vec_id"),
      concat(
        array((-element_at(col("embedding"), 1)).cast("float"),
          (-element_at(col("embedding"), 2)).cast("float")),
        // tail length derived from the row's own embedding (the oracle's
        // embedding[3:] is likewise open-ended) — no fixture-dim bake-in
        slice(col("embedding"), lit(3),
          greatest(size(col("embedding")) - 2, lit(0)))).as("embedding"))
    e.unionByName(planted)
  }
}
