package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.bounded_topk
import graft.index.{IvfModel, LshModel}
import org.apache.spark.sql.graft.expressions.LshPlanes

/**
 * DuckDB replay-oracle GENERATORS for the seeded ANN queries: the
 * trained state these queries depend on (k-means centroids, LSH
 * hyperplanes) is seeded and deterministic, so once it is dumped as SQL
 * literals the rest of each query — sign-bit signatures, argmin cluster
 * assignment, top-nprobe probing, exact cosine rerank — is pure
 * arithmetic DuckDB replays exactly (the same trick that oracled the
 * MinHash/SimHash/Karp-Rabin family: q35/q36/q37).
 *
 * Floats are printed via `Double.toString(f.toDouble)` (shortest decimal
 * that round-trips to the WIDENED double), so the literal DuckDB parses
 * is bit-identical to the double Spark's arithmetic widens to.
 *
 * Cross-engine float-boundary guard: Spark's hot loops do per-term
 * FLOAT multiplies before the double accumulate, DuckDB's
 * `list_dot_product` is all-double — results can differ by ~1e-7·|terms|,
 * enough to flip a sign bit or an argmin ONLY when the true value sits
 * within that noise of the boundary. Each generator measures its
 * boundary margins on the actual dir (min |plane·v| for sign replays;
 * min top-2 assignment gap and probe-edge gap for argmin replays) and
 * WITHHOLDS the oracle — falling back to the rows-only check — when a
 * margin is inside the guard band. Exact ties (bit-equal values) are
 * safe on both engines (id-ascending tiebreaks) and are excluded from
 * the margin via distinct-value gaps.
 */
private[graft] object AnnOracles {

  /** Sign margin: |plane·v| below this withholds a signature replay.
    * LshPlanes widens every product to double before the sequential
    * double accumulate — the same arithmetic as DuckDB's
    * list_dot_product — so the only residual is summation-order noise
    * (~1e-13 relative); 1e-9 is orders above it. (Measured min |dot| on
    * the sf0.01 fixture: 1.3e-6.) */
  val signEps = 1e-9
  /** Distinct-distance gap floor on the DOUBLE side of an argmin
    * replay: DuckDB and the generator both evaluate the cc−2cv formula
    * in sequential double arithmetic, so their only residual is
    * summation-order noise (~1e-13 relative); 1e-8 is orders above it.
    * The float-vs-double gap (the engine's NearestCentroid loop squares
    * FLOAT differences) is NOT bridged by a margin — it is closed
    * exactly by [[assignAgreementOk]], which compares the engine's
    * actual assignment against the double-formula argmin row for row. */
  val distEps = 1e-8

  def d(f: Float): String = java.lang.Double.toString(f.toDouble)

  /** Generators must never break a Verify dump: any failure (missing
    * table, schema drift) falls back to the rows-only check. */
  def safe(name: String)(f: => Option[String]): Option[String] =
    try f catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[oracle-gen] $name withheld: ${e.getMessage}")
        None
    }

  private def vecLit(v: Array[Float]): String =
    v.map(d).mkString("[", ", ", "]::DOUBLE[]")

  /** `(VALUES (tbl, bit, [..]::DOUBLE[]), ...)` rows for the seeded
    * hyperplane family, flattened (table-major, bit-minor) exactly as
    * [[LshPlanes.planes]] lays them out. */
  private def planesValues(lsh: LshModel): String =
    LshPlanes.planes(lsh.numTables, lsh.bitsPerTable, lsh.dim, lsh.seed)
      .zipWithIndex.map { case (p, i) =>
        s"(${i / lsh.bitsPerTable}, ${i % lsh.bitsPerTable}, ${vecLit(p)})"
      }.mkString(",\n    ")

  private[queries] def centValues(model: IvfModel): String =
    model.centroids.zipWithIndex.map { case (c, i) => s"($i, ${vecLit(c)})" }
      .mkString(",\n    ")

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "embeddings")

  /** Sequential double dot product of two array<double> columns — the
    * DuckDB-side arithmetic, used for margin measurement. */
  private def ddot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Min |plane·v| over every (vector, plane) pair in the dir. */
  private def minSignMargin(spark: SparkSession, dir: String, lsh: LshModel): Double = {
    import spark.implicits._
    val planesDf = LshPlanes.planes(lsh.numTables, lsh.bitsPerTable, lsh.dim, lsh.seed)
      .toSeq.map(p => Tuple1(p.map(_.toDouble).toSeq)).toDF("p")
    emb(spark, dir).filter(col("embedding").isNotNull)
      .select(col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(planesDf))
      .select(abs(ddot(col("p"), col("v"))).as("m"))
      .agg(min("m")).collect()(0).getDouble(0)
  }

  /** The double-formula (cc−2cv) centroid distances of one vector,
    * the arithmetic the replay SQL evaluates. */
  private def doubleDists(model: IvfModel, q: Array[Float]): Array[Double] =
    model.centroids.map { c =>
      var cc = 0.0; var cv = 0.0; var i = 0
      val n = math.min(c.length, q.length)
      while (i < n) { cc += c(i).toDouble * c(i); cv += c(i).toDouble * q(i); i += 1 }
      while (i < c.length) { cc += c(i).toDouble * c(i); i += 1 }
      cc - 2.0 * cv
    }

  /** EXACT agreement check between the engine's assignment (the
    * codegen'd float-difference NearestCentroid loop) and the replay
    * SQL's double-formula argmin, evaluated distributed over the whole
    * dir — plus a distinct-gap floor on the double side against DuckDB
    * summation-order noise. Any disagreeing row withholds the oracle. */
  private def assignAgreementOk(spark: SparkSession, dir: String,
      model: IvfModel): Boolean =
    assignAgreementOk(spark,
      emb(spark, dir).filter(col("embedding").isNotNull), model)

  /** Corpus-parameterized form: `base` carries (vec_id, embedding) with
    * non-null embeddings — lets replays over DERIVED corpora (q113's
    * planted union) run the same agreement check. */
  private def assignAgreementOk(spark: SparkSession, base: DataFrame,
      model: IvfModel): Boolean = {
    import spark.implicits._
    val centDf = model.centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.map(_.toDouble).toSeq) }.toDF("cid", "cen")
    val dists = base
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(centDf))
      .select(col("vec_id"),
        (ddot(col("cen"), col("cen")) - lit(2.0) * ddot(col("cen"), col("v"))).as("dist"),
        col("cid"))
    val dblAssign = dists.groupBy("vec_id")
      .agg(min(struct(col("dist"), col("cid"))).as("m"),
        bounded_topk(col("dist"), 2).as("t")) // distinct values by construction
      .select(col("vec_id"), col("m").getField("cid").as("dbl_cid"),
        when(size(col("t")) === 2,
          element_at(col("t"), 2) - element_at(col("t"), 1))
          .otherwise(lit(Double.MaxValue)).as("gap"))
    val engine = model.assign(base.select(col("vec_id"), col("embedding")), "embedding")
      .select(col("vec_id"), col("cluster_id"))
    val bad = engine.join(dblAssign, Seq("vec_id"))
      .filter(col("cluster_id") =!= col("dbl_cid") || col("gap") < distEps)
      .limit(1).collect()
    bad.isEmpty
  }

  /** Driver-side probe check for one query vector: the engine's probed
    * set (float-loop linear scan) must equal the double-formula
    * top-nprobe the SQL replays, and the nprobe/(nprobe+1) boundary on
    * the double side must be an exact tie (identically tiebroken) or
    * clear the gap floor. */
  private def probeOk(model: IvfModel, q: Array[Float], nprobe: Int): Boolean = {
    val dd = doubleDists(model, q)
    val ordered = dd.zipWithIndex.sortBy { case (d, i) => (d, i) }
    val dblSet = ordered.take(nprobe).map(_._2).toSet
    val engineSet = model.probeLinear(q, nprobe).toSet
    val edgeOk = dd.length <= nprobe || {
      val d4 = ordered(nprobe - 1)._1; val d5 = ordered(nprobe)._1
      d4 == d5 || d5 - d4 >= distEps
    }
    engineSet == dblSet && edgeOk
  }

  private def queryVec(spark: SparkSession, dir: String, id: Long): Array[Float] =
    emb(spark, dir).filter(col("vec_id") === id).select("embedding")
      .collect()(0).getSeq[Float](0).toArray

  private val cosE =
    "list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])) / " +
      "(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) * " +
      "sqrt(list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(q.qe AS DOUBLE[]))))"

  /** Per-table sign-bit signature CTE over `embeddings` (mirrors
    * [[LshPlanes.buckets]]: bit b set iff plane·v >= 0). */
  private def sigsCte(planes: String): String =
    s"""planes(tbl, bit, p) AS (VALUES
       |    $planes),
       |sigs AS (
       |  SELECT e.vec_id, pl.tbl,
       |    CAST(sum(CASE WHEN list_dot_product(pl.p, CAST(e.embedding AS DOUBLE[])) >= 0
       |      THEN (CAST(1 AS BIGINT) << pl.bit) ELSE 0 END) AS BIGINT) AS sig
       |  FROM embeddings e CROSS JOIN planes pl
       |  WHERE e.embedding IS NOT NULL
       |  GROUP BY e.vec_id, pl.tbl)""".stripMargin

  // ---------------------------------------------------------------- q26
  /** LSH single-query kNN: signature replay + shared-bucket candidate
    * semi-join + exact cosine rerank. */
  def q26(spark: SparkSession, dir: String, lsh: LshModel): Option[String] = {
    if (minSignMargin(spark, dir, lsh) < signEps) return None
    Some(
      s"""WITH ${sigsCte(planesValues(lsh))},
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |qsig AS (SELECT tbl, sig FROM sigs WHERE vec_id = 0),
         |cand AS (SELECT DISTINCT s.vec_id FROM sigs s JOIN qsig USING (tbl, sig))
         |SELECT e.vec_id, e.label, round($cosE, 6) AS score
         |FROM embeddings e, cand c, q
         |WHERE e.vec_id = c.vec_id
         |ORDER BY $cosE DESC, e.vec_id
         |LIMIT 10""".stripMargin)
  }

  // ---------------------------------------------------------------- q116
  /** Binary sign-quantization kNN (Hamming prefilter → exact rerank).
    * The prefilter replays with NO margin guard: signature bit i is
    * `embedding[i] >= 0` on the STORED float — no arithmetic, so the
    * sign is exact on both engines (unlike the LSH plane dots, whose
    * [[signEps]] margin exists because a dot product is computed) —
    * and the top-C cutoff is an INTEGER Hamming distance with an
    * id-ascending tiebreak, deterministic by construction. The only
    * cross-engine float boundary is the rerank's k/k+1 cosine cutoff
    * within the candidate set, guarded the q86 way: the engine's
    * float-rerank top-k ids must equal the double-arithmetic top-k the
    * SQL computes, and the cutoff must be an exact tie or clear
    * [[distEps]]. */
  def q116(spark: SparkSession, dir: String, k: Int, cands: Int): Option[String] = {
    import graft.functions.GraftFunctions.{cosine_sim, hamming_dist}
    val qv = queryVec(spark, dir, 0L)
    val e = emb(spark, dir)
    val qSig = graft.index.BinaryQuant.pack(qv).toSeq
    val candIds = graft.index.BinaryQuant.signatures(e, "vec_id", "embedding")
      .withColumn("ham", hamming_dist(col("sig"), typedlit(qSig)))
      .orderBy(col("ham").asc, col("vec_id").asc).limit(cands)
      .select("vec_id").collect().map(_.getLong(0))
    val inCand = col("vec_id").isin(candIds.map(Long.box): _*)
    // the engine's own rerank order (float per-term multiplies)
    val engineIds = e.filter(inCand)
      .withColumn("s", cosine_sim(col("embedding"), typedlit(qv.toSeq)))
      .orderBy(col("s").desc, col("vec_id")).limit(k)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    // the replay SQL's all-double rerank over the same candidates
    val qd = typedlit(qv.map(_.toDouble).toSeq)
    val topK1 = e.filter(inCand)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"),
        (ddot(col("v"), qd) /
          (sqrt(ddot(col("v"), col("v"))) * sqrt(ddot(qd, qd)))).as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(k + 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    if (topK1.take(k).map(_._1).toSeq != engineIds) return None
    if (topK1.length == k + 1) {
      val dk = topK1(k - 1)._2; val dk1 = topK1(k)._2
      if (dk != dk1 && dk - dk1 < distEps) return None
    }
    val dim = qv.length
    Some(
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |dims AS (SELECT CAST(range AS INTEGER) AS i FROM range(0, $dim)),
         |sb AS (SELECT e.vec_id, d.i,
         |    CASE WHEN e.embedding[d.i + 1] >= 0 THEN 1 ELSE 0 END AS b
         |  FROM embeddings e CROSS JOIN dims d
         |  WHERE e.embedding IS NOT NULL),
         |qb AS (SELECT i, b FROM sb WHERE vec_id = 0),
         |ham AS (SELECT sb.vec_id, sum(CASE WHEN sb.b <> qb.b THEN 1 ELSE 0 END) AS h
         |  FROM sb JOIN qb USING (i) GROUP BY sb.vec_id),
         |cand AS (SELECT vec_id FROM ham ORDER BY h, vec_id LIMIT $cands)
         |SELECT e.vec_id, e.label, round($cosE, 6) AS score
         |FROM embeddings e, cand c, q
         |WHERE e.vec_id = c.vec_id
         |ORDER BY $cosE DESC, e.vec_id
         |LIMIT $k""".stripMargin)
  }

  // ---------------------------------------------------------------- q117
  /** Multi-index Hamming near-dup join over the planted corpus. The
    * oracle is deliberately NOT a band replay: it brute-forces every
    * pair's integer Hamming distance (banded to stay cheap — the band
    * prefilter is complete for ham <= maxHamming by pigeonhole, a
    * theorem not a float margin) and so independently verifies the
    * ENGINE's banded join found every qualifying pair — completeness,
    * the property LSH banding can only test probabilistically. Signs
    * (and the planted copies' negated dims) are exact float
    * comparisons; Hamming is an integer; the only guarded boundary is
    * the cosine threshold (both engines fold the same doubles, so the
    * margin defends reassociation drift only, the guard-(e) class). */
  def q117(spark: SparkSession, dir: String, corpus: DataFrame,
      dim: Int, maxHamming: Int, minCosine: Double): Option[String] = {
    val allHam = graft.index.BinaryQuant.hammingNearDupPairs(
      corpus, "vec_id", "embedding", dim, maxHamming, minCosine = -1.0)
    val thin = allHam
      .filter(col("cosine") =!= lit(minCosine) &&
        abs(col("cosine") - lit(minCosine)) < distEps)
      .limit(1).collect().nonEmpty
    if (thin) {
      System.err.println(
        "[oracle-gen] q117 withheld: a candidate cosine inside the tau margin")
      return None
    }
    // the engine's own band plan (16 for dim=64, maxHamming=3) — shared
    // rule, so the replay can never drift from the implementation
    val w = graft.index.BinaryQuant.bandWidth(dim, maxHamming)
    val tau = java.lang.Double.toString(minCosine)
    val cosAB =
      "list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) / " +
        "(sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) * " +
        "sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))"
    Some(
      s"""WITH base AS (SELECT vec_id, embedding FROM embeddings
         |  WHERE embedding IS NOT NULL),
         |off AS (SELECT max(vec_id) + 1 AS o FROM base),
         |corpus AS (
         |  SELECT vec_id, embedding FROM base
         |  UNION ALL
         |  SELECT vec_id + (SELECT o FROM off) AS vec_id,
         |    list_concat([CAST(-embedding[1] AS FLOAT), CAST(-embedding[2] AS FLOAT)],
         |      embedding[3:]) AS embedding
         |  FROM base),
         |dims AS (SELECT CAST(range AS INTEGER) AS i FROM range(0, $dim)),
         |sb AS (SELECT c.vec_id, d.i,
         |    CASE WHEN c.embedding[d.i + 1] >= 0 THEN 1 ELSE 0 END AS bit
         |  FROM corpus c CROSS JOIN dims d),
         |bands AS (SELECT vec_id, CAST(i / $w AS INTEGER) AS b,
         |    CAST(sum(bit * (CAST(1 AS BIGINT) << (i % $w))) AS BIGINT) AS v
         |  FROM sb GROUP BY vec_id, CAST(i / $w AS INTEGER)),
         |cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
         |  FROM bands x JOIN bands y ON x.b = y.b AND x.v = y.v
         |    AND x.vec_id < y.vec_id),
         |hams AS (SELECT c.id_a, c.id_b,
         |    CAST(sum(CASE WHEN p.bit <> q.bit THEN 1 ELSE 0 END) AS INTEGER) AS ham
         |  FROM cand c
         |  JOIN sb p ON p.vec_id = c.id_a
         |  JOIN sb q ON q.vec_id = c.id_b AND q.i = p.i
         |  GROUP BY c.id_a, c.id_b)
         |SELECT h.id_a, h.id_b, h.ham, round($cosAB, 6) AS cosine
         |FROM hams h
         |JOIN corpus a ON a.vec_id = h.id_a
         |JOIN corpus b ON b.vec_id = h.id_b
         |WHERE h.ham <= $maxHamming AND $cosAB >= $tau
         |ORDER BY h.id_a, h.id_b""".stripMargin)
  }

  // ---------------------------------------------------------------- q86
  /** HNSW single-query kNN (50 graph candidates, exact cosine rerank to
    * top-10). The graph walk itself is not SQL-expressible, but — the
    * q110 pattern — the oracle is the walk's own success criterion:
    * withheld unless the engine's candidate-rerank top-10 EQUALS the
    * exact brute-force top-10 in the replay SQL's double arithmetic
    * (id-ordered, with a distinct-gap floor at the 10/11 cutoff), in
    * which case the SQL replays exact kNN. Recall is 1.0 at every
    * fixture dir (AnnRecallSpec pins it), so in practice this oracles
    * the rerank arithmetic, the cutoff tiebreak, and the output shape
    * while the equality guard pins the graph walk against an
    * independent exact computation. */
  def q86(spark: SparkSession, dir: String,
      graph: graft.index.HnswModel): Option[String] = {
    import graft.functions.GraftFunctions.cosine_sim
    val q = queryVec(spark, dir, 0L)
    val e = emb(spark, dir)
    // the engine's own result ids, in output order (float rerank)
    val cands = graph.search(q, k = 50, ef = 100).map(_._1)
    val engineIds = e.filter(col("vec_id").isin(cands.map(Long.box): _*))
      .withColumn("s", cosine_sim(col("embedding"), typedlit(q.toSeq)))
      .orderBy(col("s").desc, col("vec_id")).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    // the replay SQL's double-arithmetic top-11 over the whole corpus
    val qd = typedlit(q.map(_.toDouble).toSeq)
    val top11 = e.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"),
        (ddot(col("v"), qd) /
          (sqrt(ddot(col("v"), col("v"))) * sqrt(ddot(qd, qd)))).as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(11)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    if (top11.take(10).map(_._1).toSeq != engineIds) return None
    if (top11.length == 11) {
      val d10 = top11(9)._2; val d11 = top11(10)._2
      // boundary must be an exact tie (same id-asc break both engines)
      // or clear the summation-order gap floor
      if (d10 != d11 && d10 - d11 < distEps) return None
    }
    Some(
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, e.label, round($cosE, 6) AS score
         |FROM embeddings e, q
         |WHERE e.embedding IS NOT NULL
         |ORDER BY $cosE DESC, e.vec_id
         |LIMIT 10""".stripMargin)
  }

  // ------------------------------------------------- sharded HNSW (q128)
  /** Guard-replay for the sharded-HNSW bulk kNN join: emitted only when
    * EVERY query's sharded-graph top-`k` equals the exact double-
    * arithmetic top-`k` over the corpus (id-for-id) AND each query's
    * rank-k/k+1 boundary is an exact tie or clears [[distEps]] — then
    * the SQL replays plain brute-force per-query kNN, so every Verify
    * run re-proves the routed shard walk end to end (the q86 discipline
    * lifted from one query to the join form). Hashed score is the e6
    * floor of a bit-identical double — no allowlist entry. */
  def q128(spark: SparkSession, dir: String,
      index: graft.index.ShardedHnsw, nQueries: Int, k: Int,
      ef: Int, probeShards: Int): Option[String] = {
    if (!shardedParityOk(spark, dir, index, nQueries, k, ef, probeShards))
      return None
    Some(
      s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id < $nQueries),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |  WHERE embedding IS NOT NULL),
         |scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
         |    list_dot_product(e.v, q.qv) /
         |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS s
         |  FROM e CROSS JOIN q),
         |ranked AS (SELECT query_id, neighbor_id, s,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY s DESC, neighbor_id) AS INTEGER) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id,
         |  CAST(floor(s * 1000000.0 + 0.5) AS BIGINT) AS score_e6, rank
         |FROM ranked WHERE rank <= $k
         |ORDER BY query_id, rank""".stripMargin)
  }

  /** The sharded-HNSW parity+boundary guard, factored out of [[q128]]
    * so the ANN-pool→MMR composition (q132) can guard its POOL with
    * the same proof: every query's routed-walk top-`k` (exact-cosine
    * reranked) equals brute-force top-`k` id-for-id, and the rank
    * k/k+1 boundary is an exact tie or clears [[distEps]]. When this
    * holds at k = poolSize, the MMR chain over the ANN pool is
    * row-for-row the chain over the brute-force pool — q132 reuses
    * q130's static SQL verbatim. */
  private[queries] def shardedParityOk(spark: SparkSession, dir: String,
      index: graft.index.ShardedHnsw, nQueries: Int, k: Int,
      ef: Int, probeShards: Int): Boolean = {
    val e = emb(spark, dir)
    val queries = e.filter(col("vec_id") < nQueries)
    val engine = index.knnJoin(queries, "vec_id", "embedding",
        e, "vec_id", "embedding", k, ef, probeShards)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("s").desc, col("vec_id"))
    val qd = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
    val exact = e.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .crossJoin(qd)
      .select(col("query_id"), col("vec_id"),
        (ddot(col("v"), col("qv")) /
          (sqrt(ddot(col("v"), col("v"))) * sqrt(ddot(col("qv"), col("qv")))))
          .as("s"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k + 1)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    exact.forall { case (qid, rows) =>
      val ids = rows.take(k).map(_._3).toSeq
      engine.get(qid).contains(ids) && (rows.lengthCompare(k) <= 0 || {
        val dk = rows(k - 1)._4; val dk1 = rows(k)._4
        dk == dk1 || dk - dk1 >= distEps
      })
    }
  }

  // ------------------------------------------------- SemDeDup replays
  /** Shared withhold guards for the SemDeDup replay family (q109 /
    * q112 / q113). `base` carries (vec_id, embedding) with non-null
    * embeddings — the corpus the replay SQL's `e` CTE enumerates.
    * Withholds (returns false) when:
    *  (a) replay flops n·k·dim exceed the DuckDB budget (a big-SF
    *      validate leg must not melt the oracle side — the family's
    *      designed rows-only fallback),
    *  (b) any vector has zero norm (engine cosine(0,·)=0 has no SQL
    *      twin in this replay),
    *  (c) the engine's assignment disagrees with the double-formula
    *      argmin on any row, or a top-2 gap is inside distEps
    *      (the shared [[assignAgreementOk]] guard),
    *  (d) any cluster crosses the hot-cluster cap (the capped
    *      exact-collapse + in-cluster-LSH path is not replayed;
    *      this predicate IS the engine's cap predicate, so passing it
    *      also proves the engine took the uncapped path),
    *  (e) any same-cluster pair cosine sits within distEps of the
    *      minCosine boundary (defense in depth — both engines compute
    *      the identical double, so this guards compiler/runtime
    *      arithmetic drift only).
    * Keeper-rank stability (the ADVICE r11 finding) is guarded
    * separately and output-sensitively by [[keeperRankOk]]: q109's
    * per-cluster counts are keeper-identity-insensitive (exactly one
    * krn=1 row per component, whichever member it is), so it skips the
    * check; q112/q113 withhold only when a thin top-2 gap could swap
    * members that DIFFER in the output attribute; q115 uses the strict
    * form because its keepers feed the next fold's corpus. */
  /** Guard results memoized per (corpus key, centroid fingerprint, tau,
    * cap): q109/q112/q115 share one (model, corpus, tau) triple, so one
    * Verify run would otherwise pay the pair-mass + components guard
    * three times. Keyed on [[modelFingerprint]] — centroid CONTENT —
    * so two models with equal centroids hit (same guard inputs ⇒ same
    * verdict) and a retrained different model can never inherit a
    * stale verdict through identity-hash collision or address reuse. */
  private val guardCache =
    new scala.collection.concurrent.TrieMap[(String, Long, Double, Int, Double), Boolean]()

  /** `pairEps` is guard (e)'s margin. Default distEps (1e-8) for the
    * float-embedding corpora. The replayed arithmetic is a sequential
    * double left-fold both engines evaluate identically, so the margin
    * defends only against one side REASSOCIATING the dot sum
    * (SIMD/pairwise): classic bound n·eps·Σ|terms| ≈ 64·1.1e-16·1 ≈
    * 7e-15 for 64-dim unit-ish vectors — callers whose corpora land
    * near-threshold cosines legitimately (the hashing embedder's
    * rational components, q111) pass 1e-12: still 100x the bound,
    * 10000x tighter than the default. */
  private[queries] def semGuardsOkCached(key: String, spark: SparkSession,
      base: DataFrame, model: IvfModel, minCosine: Double,
      maxClusterRows: Int, pairEps: Double = distEps): Boolean =
    guardCache.getOrElseUpdate(
      (key, modelFingerprint(model), minCosine, maxClusterRows, pairEps),
      semGuardsOk(spark, base, model, minCosine, maxClusterRows, pairEps))

  private def semGuardsOk(spark: SparkSession, base: DataFrame,
      model: IvfModel, minCosine: Double, maxClusterRows: Int,
      pairEps: Double = distEps): Boolean = {
    import spark.implicits._
    import graft.functions.GraftFunctions
    // a withheld oracle is designed behavior, but WHICH guard fired
    // must be diagnosable from the Verify log (sf-leg triage)
    def withhold(reason: String): Boolean = {
      System.err.println(s"[oracle-gen] semDedup replay withheld: $reason")
      false
    }
    val k = model.nlist
    val dim = model.centroids.headOption.map(_.length).getOrElse(0)
    val n = base.count()
    if (n.toDouble * k * dim > 4e9)
      return withhold(s"(a) flop budget n=$n k=$k dim=$dim") // (a)
    val vd = col("embedding").cast("array<double>")
    if (base.filter(ddot(vd, vd) === 0.0).limit(1).collect().nonEmpty)
      return withhold("(b) zero-norm vector") // (b)
    if (!assignAgreementOk(spark, base, model))
      return withhold("(c) assignment disagreement or thin top-2 gap") // (c)
    val centDf = model.centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }.toDF("cluster_id", "centroid")
    val assigned = model.assign(base, "embedding")
      .join(broadcast(centDf), Seq("cluster_id"))
      .withColumn("cs",
        GraftFunctions.cosine_sim(col("embedding"), col("centroid")))
      .select(col("cluster_id"), col("vec_id"), col("embedding"), col("cs"))
      .localCheckpoint(true)
    try {
      val maxOcc = assigned.groupBy("cluster_id").count()
        .agg(max("count")).collect()(0).getLong(0)
      if (maxOcc > maxClusterRows)
        return withhold(s"(d) hot cluster $maxOcc > cap $maxClusterRows") // (d)
      val s = assigned.repartition(col("cluster_id"))
      val paired = s
        .select(col("cluster_id"), col("vec_id").as("ia"), col("embedding").as("ea"))
        .join(s.select(col("cluster_id"), col("vec_id").as("ib"),
            col("embedding").as("eb")), Seq("cluster_id"))
        .filter(col("ia") < col("ib"))
        .withColumn("pc", GraftFunctions.cosine_sim(col("ea"), col("eb")))
        .select("ia", "ib", "pc")
        .localCheckpoint(true)
      try {
        // exact hits on the threshold are SAFE, like exact ties in the
        // rank guards: both engines evaluate the identical
        // IEEE-deterministic chain, and `>= tau` includes the hit on
        // both — common with integer-quantized vectors (the hashing
        // embedder), where e.g. dot 4 over norms sqrt(5)·sqrt(5) is
        // cosine 0.8 EXACTLY and the dot sum is reassociation-immune
        val pairBad = paired
          .filter(col("pc") =!= lit(minCosine) &&
            abs(col("pc") - lit(minCosine)) < pairEps)
          .limit(1).collect().nonEmpty
        if (pairBad) return withhold("(e) pair cosine inside tau margin") // (e)
      } finally paired.unpersist(blocking = false)
      true
    } finally assigned.unpersist(blocking = false)
  }

  /** Keeper-rank stability guard (g), output-sensitive: within each
    * duplicate component at `minCosine`, the keep rule takes
    * argmin(centroid_sim, id). Both engines compute centroid_sim with
    * the same sequential double arithmetic, so this — like guard (e) —
    * defends against compiler/runtime reassociation drift only.
    *
    * The incremental replays (q112/q114/q115) take the keeper argmin
    * inside INCOMING-ONLY (or per-fold) components, whose two thinnest
    * members can sit at ANY rank of the enclosing batch component
    * (ADVICE r12) — so the check covers every rank, not just 1–2:
    * members are first collapsed into bit-equal-cs runs (an exact tie
    * resolves by the shared id-ascending break on both engines, so a
    * run is internally safe and carries the SET of its attrs), then
    * any ADJACENT run pair with gap < distEps withholds when a swap
    * could change the query's OUTPUT — the two runs' attr sets are not
    * the same singleton for the count-by-attribute replays (q112:
    * label, q113: planted flag), any thin gap in `strict` mode (q115,
    * whose keepers become corpus rows for later folds). Adjacency
    * suffices: drift is bounded far below distEps, so a rank flip only
    * crosses runs within distEps, and any attr-differing pair within
    * that span forces some adjacent run pair in the span to differ in
    * attr sets. Components are the BATCH components — supersets of any
    * incremental fold's incoming-only components, so every subset
    * argmin the folds take is over runs this check has covered.
    * `baseAttr` carries (vec_id, embedding, attr). Memoized like
    * [[semGuardsOkCached]]. */
  private def keeperRankOk(spark: SparkSession, baseAttr: DataFrame,
      model: IvfModel, minCosine: Double, strict: Boolean): Boolean = {
    import spark.implicits._
    import graft.functions.GraftFunctions
    import org.apache.spark.sql.expressions.Window
    val centDf = model.centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }.toDF("cluster_id", "centroid")
    val assigned = model.assign(baseAttr, "embedding")
      .join(broadcast(centDf), Seq("cluster_id"))
      .withColumn("cs",
        GraftFunctions.cosine_sim(col("embedding"), col("centroid")))
      .select(col("cluster_id"), col("vec_id"), col("embedding"),
        col("cs"), col("attr"))
      .localCheckpoint(true)
    try {
      val sjoin = assigned.repartition(col("cluster_id"))
      val pairs = sjoin
        .select(col("cluster_id"), col("vec_id").as("ia"), col("embedding").as("ea"))
        .join(sjoin.select(col("cluster_id"), col("vec_id").as("ib"),
            col("embedding").as("eb")), Seq("cluster_id"))
        .filter(col("ia") < col("ib"))
        .filter(GraftFunctions.cosine_sim(col("ea"), col("eb")) >= minCosine)
        .select(col("ia").as("id_a"), col("ib").as("id_b"))
      val comps = graft.operators.Dedup.connectedComponents(pairs)
      val members = comps.join(assigned, comps("id") === assigned("vec_id"))
        .select(col("label").as("grp"), col("cs"), col("vec_id"), col("attr"))
      // bit-equal-cs runs; a run keeps the set of attrs it contains
      val runs = members.groupBy(col("grp"), col("cs"))
        .agg(collect_set(col("attr")).as("attrs"))
      val w = Window.partitionBy("grp").orderBy(col("cs"))
      val adj = runs
        .withColumn("prev_cs", lag(col("cs"), 1).over(w))
        .withColumn("prev_attrs", lag(col("attrs"), 1).over(w))
        .filter(col("prev_cs").isNotNull &&
          col("cs") - col("prev_cs") < distEps)
      val gapBad = adj
        .filter(if (strict) lit(true)
          else !(size(col("attrs")) === 1 && size(col("prev_attrs")) === 1 &&
            col("attrs").getItem(0) === col("prev_attrs").getItem(0)))
        .limit(1).collect().nonEmpty
      if (gapBad)
        System.err.println(
          "[oracle-gen] semDedup replay withheld: (g) keeper rank gap " +
            s"inside distEps (strict=$strict)")
      !gapBad
    } finally assigned.unpersist(blocking = false)
  }

  private val keeperCache =
    new scala.collection.concurrent.TrieMap[(String, Long, Double, Boolean), Boolean]()

  private[graft] def keeperRankOkCached(key: String, spark: SparkSession,
      baseAttr: DataFrame, model: IvfModel, minCosine: Double,
      strict: Boolean): Boolean =
    keeperCache.getOrElseUpdate(
      (key, modelFingerprint(model), minCosine, strict),
      keeperRankOk(spark, baseAttr, model, minCosine, strict))

  /** Content fingerprint of a model's centroids (FNV-1a over the raw
    * float bits): the guard caches must key on WHAT the model computes,
    * not which object computes it — `System.identityHashCode` collides
    * in principle (identity hashes are not unique and addresses are
    * reused), so a freshly trained different model could inherit a
    * stale guard verdict (ADVICE r12). Two distinct objects with equal
    * centroids correctly HIT (the guards depend only on centroid
    * values); kB-scale centroids make this a negligible driver cost. */
  private def modelFingerprint(model: IvfModel): Long = {
    var h = -3750763034362895579L // FNV-1a 64-bit offset basis
    var i = 0
    while (i < model.centroids.length) {
      val c = model.centroids(i)
      var j = 0
      while (j < c.length) {
        h ^= java.lang.Float.floatToRawIntBits(c(j)).toLong & 0xffffffffL
        h *= 1099511628211L
        j += 1
      }
      i += 1
    }
    h
  }

  /** The shared batch-SemDeDup replay CTE chain, appended after CTEs
    * that define `cent(cid, cen)` and `e(vec_id, v: DOUBLE[])`:
    * centroid-literal argmin assignment, per-row centroid cosine,
    * within-cluster duplicate pairs at `tau`, min-label connected
    * components (recursive CTE — the q61 pattern), and the keep rank
    * (argmin centroid_sim, then id; krn = 1 or absent means kept). */
  private[queries] def semBatchCtes(tau: String): String =
    s"""assign AS (SELECT vec_id, v, cid FROM (
       |    SELECT e.vec_id, e.v, c.cid, row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |      list_dot_product(c.cen, c.cen) - 2 * list_dot_product(c.cen, e.v),
       |      c.cid) AS rn
       |    FROM e CROSS JOIN cent c) WHERE rn = 1),
       |sims AS (SELECT a.vec_id, a.cid, a.v,
       |    list_dot_product(a.v, c.cen) /
       |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.cen, c.cen))) AS cs
       |  FROM assign a JOIN cent c ON a.cid = c.cid),
       |pairs AS (SELECT a.vec_id AS ia, b.vec_id AS ib
       |  FROM sims a JOIN sims b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE list_dot_product(a.v, b.v) /
       |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= $tau),
       |edges AS (SELECT ia AS ea, ib AS eb FROM pairs
       |  UNION ALL SELECT ib, ia FROM pairs),
       |nodes AS (SELECT DISTINCT ea AS id FROM edges),
       |reach AS (
       |  SELECT id, id AS r FROM nodes
       |  UNION
       |  SELECT g.eb AS id, reach.r FROM reach JOIN edges g ON g.ea = reach.id),
       |comps AS (SELECT id, min(r) AS label FROM reach GROUP BY id),
       |keeprn AS (SELECT m.vec_id, row_number() OVER (PARTITION BY c.label
       |    ORDER BY m.cs, m.vec_id) AS krn
       |  FROM comps c JOIN sims m ON c.id = m.vec_id)""".stripMargin

  // --------------------------------------------------------------- q109
  /** SemDeDup batch flags aggregated per cluster: [[semBatchCtes]] over
    * the raw embeddings corpus. The cluster structure is seeded driver
    * state exactly like q27's: dumped as literals, the rest is
    * arithmetic both engines evaluate identically (cosine_sim
    * accumulates all-double in element order = list_dot_product).
    * Withheld on the shared [[semGuardsOk]] conditions, plus:
    *  (f) any per-cluster avg(centroid_sim) sits within 1e-6 scaled
    *      units of its 6-dp rounding boundary (avg IS cross-engine
    *      summation-order sensitive — the one genuinely order-dependent
    *      term in the output). */
  def q109(spark: SparkSession, dir: String, model: IvfModel,
      minCosine: Double, maxClusterRows: Int = 65536): Option[String] = {
    import spark.implicits._
    import graft.functions.GraftFunctions
    val base = emb(spark, dir).filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
    if (!semGuardsOkCached(dir, spark, base, model, minCosine, maxClusterRows))
      return None // (a)-(e), (g)
    val centDf = model.centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }.toDF("cluster_id", "centroid")
    val avgBad = model.assign(base, "embedding")
      .join(broadcast(centDf), Seq("cluster_id"))
      .withColumn("cs",
        GraftFunctions.cosine_sim(col("embedding"), col("centroid")))
      .groupBy("cluster_id").agg(avg("cs").as("a"))
      .select((abs(col("a")) * 1e6).as("y"))
      .select(abs(col("y") - floor(col("y")) - 0.5).as("db"))
      .filter(col("db") < 1e-6).limit(1).collect().nonEmpty
    if (avgBad) return None // (f)
    val tau = java.lang.Double.toString(minCosine)
    Some(
      s"""WITH RECURSIVE cent(cid, cen) AS (VALUES
         |    ${centValues(model)}),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |  WHERE embedding IS NOT NULL),
         |${semBatchCtes(tau)}
         |SELECT CAST(s.cid AS INTEGER) AS cluster_id,
         |  count(*) AS n_members,
         |  CAST(count(*) FILTER (WHERE k.krn IS NULL OR k.krn = 1) AS BIGINT) AS n_kept,
         |  round(avg(s.cs), 6) AS avg_centroid_sim
         |FROM sims s LEFT JOIN keeprn k ON s.vec_id = k.vec_id
         |GROUP BY s.cid ORDER BY cluster_id""".stripMargin)
  }

  // --------------------------------------------------------------- q112
  /** Incremental SemDeDup survivors by label — the q109 replay applied
    * to the batch-vs-corpus fold ([[graft.operators.SemDedup
    * .semDedupIncremental]] with existing = vec_id % 5 != 0, incoming =
    * vec_id % 5 == 0, served model): centroid-literal assignment,
    * incoming×all same-cluster duplicate edges at `tau`, outright drop
    * of any incoming row duplicating the authoritative corpus,
    * incoming-only components with the keep-rule rank, survivors =
    * incoming minus the drop set. Guards are [[semGuardsOk]]'s — the
    * pair-margin and keep-rank checks run over ALL same-cluster pairs /
    * batch components, supersets of the incremental pair universe, so
    * the withhold is conservative; guard (d) passing proves the engine
    * took the uncapped path this SQL replays (it IS the engine's cap
    * predicate over the combined occupancy). */
  def q112(spark: SparkSession, dir: String, model: IvfModel,
      minCosine: Double, maxClusterRows: Int = 65536): Option[String] = {
    val base = emb(spark, dir).filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
    if (!semGuardsOkCached(dir, spark, base, model, minCosine, maxClusterRows))
      return None
    // keeper flips only change survivors-by-LABEL when the two
    // thinnest members differ in label
    val baseAttr = emb(spark, dir).filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"), col("label").as("attr"))
    if (!keeperRankOkCached(dir + "#label", spark, baseAttr, model,
        minCosine, strict = false))
      return None
    val tau = java.lang.Double.toString(minCosine)
    Some(
      s"""WITH RECURSIVE cent(cid, cen) AS (VALUES
         |    ${centValues(model)}),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |  WHERE embedding IS NOT NULL),
         |assign AS (SELECT vec_id, v, cid, vec_id % 5 = 0 AS is_new FROM (
         |    SELECT e.vec_id, e.v, c.cid, row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      list_dot_product(c.cen, c.cen) - 2 * list_dot_product(c.cen, e.v),
         |      c.cid) AS rn
         |    FROM e CROSS JOIN cent c) WHERE rn = 1),
         |sims AS (SELECT a.vec_id, a.cid, a.v, a.is_new,
         |    list_dot_product(a.v, c.cen) /
         |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.cen, c.cen))) AS cs
         |  FROM assign a JOIN cent c ON a.cid = c.cid),
         |dupedges AS (SELECT i.vec_id AS inc_id, o.vec_id AS other_id, o.is_new AS other_new
         |  FROM sims i JOIN sims o ON i.cid = o.cid AND i.vec_id <> o.vec_id
         |  WHERE i.is_new AND list_dot_product(i.v, o.v) /
         |      (sqrt(list_dot_product(i.v, i.v)) * sqrt(list_dot_product(o.v, o.v))) >= $tau),
         |dup_exist AS (SELECT DISTINCT inc_id FROM dupedges WHERE NOT other_new),
         |incpairs AS (SELECT DISTINCT least(inc_id, other_id) AS ia,
         |    greatest(inc_id, other_id) AS ib
         |  FROM dupedges WHERE other_new),
         |iedges AS (SELECT ia AS ea, ib AS eb FROM incpairs
         |  UNION ALL SELECT ib, ia FROM incpairs),
         |inodes AS (SELECT DISTINCT ea AS id FROM iedges),
         |reach AS (
         |  SELECT id, id AS r FROM inodes
         |  UNION
         |  SELECT g.eb AS id, reach.r FROM reach JOIN iedges g ON g.ea = reach.id),
         |comps AS (SELECT id, min(r) AS grp FROM reach GROUP BY id),
         |keeprn AS (SELECT m.vec_id, row_number() OVER (PARTITION BY c.grp
         |    ORDER BY m.cs, m.vec_id) AS krn
         |  FROM comps c JOIN sims m ON c.id = m.vec_id),
         |drops AS (SELECT inc_id AS vec_id FROM dup_exist
         |  UNION SELECT vec_id FROM keeprn WHERE krn > 1)
         |SELECT i.label, count(*) AS n_survivors
         |FROM embeddings i
         |WHERE i.vec_id % 5 = 0 AND i.vec_id NOT IN (SELECT vec_id FROM drops)
         |GROUP BY i.label
         |ORDER BY i.label""".stripMargin)
  }

  // --------------------------------------------------------------- q114
  /** Skewed-batch incremental SemDeDup: the q112 fold replay over the
    * CONSTRUCTED corpus (existing = raw vec_id % 5 != 0 rows; batch =
    * the deterministic 80%-spam construction, reproduced in SQL — the
    * spam_near perturbation is the same double-arithmetic-then-
    * float-cast both engines round identically, spam_exact copies the
    * hot vectors bit-for-bit). Valid exactly when the engine takes the
    * UNCAPPED path: guard (d) runs the engine's own cap predicate
    * (combined occupancy vs maxClusterRows = 256) over the constructed
    * corpus, so at the dirs where the hot clusters cross the cap by
    * design (sf1 up) the oracle withholds and the standing rows-only
    * fallback applies; below it (the driver's sf0.01 gate) the fold is
    * fully replayed. Keeper guard runs with attr = kind (the output's
    * grouping) over the constructed corpus, existing rows tagged
    * distinctly (conservative). */
  def q114(spark: SparkSession, dir: String, model: IvfModel,
      batch: DataFrame, minCosine: Double,
      maxClusterRows: Int): Option[String] = {
    val existing = emb(spark, dir).filter(col("vec_id") % 5 =!= 0)
      .select(col("vec_id"), col("embedding"))
    val union = existing
      .unionByName(batch.select(col("vec_id"), col("embedding")))
      .filter(col("embedding").isNotNull)
    if (!semGuardsOkCached(dir + "#q114", spark, union, model,
        minCosine, maxClusterRows))
      return None
    val attr = existing
      .select(col("vec_id"), col("embedding"), lit("existing").as("attr"))
      .unionByName(batch.select(col("vec_id"), col("embedding"),
        col("kind").as("attr")))
      .filter(col("embedding").isNotNull)
    if (!keeperRankOkCached(dir + "#q114kind", spark, attr, model,
        minCosine, strict = false))
      return None
    val dim = model.centroids.headOption.map(_.length).getOrElse(0)
    val tau = java.lang.Double.toString(minCosine)
    Some(
      s"""WITH RECURSIVE cent(cid, cen) AS (VALUES
         |    ${centValues(model)}),
         |hot AS (SELECT (vec_id - 1) % 4 AS hot_idx, embedding AS hot_emb
         |  FROM embeddings WHERE vec_id BETWEEN 1 AND 4),
         |bk AS (SELECT vec_id, label, vec_id // 5 AS m FROM embeddings
         |  WHERE vec_id % 5 = 0),
         |batch AS (SELECT bk.vec_id, bk.label,
         |    CASE WHEN bk.m % 5 = 0 THEN 'organic'
         |         WHEN bk.m % 2 = 1 THEN 'spam_exact' ELSE 'spam_near' END AS kind,
         |    CASE WHEN bk.m % 5 = 0 THEN e0.embedding
         |         WHEN bk.m % 2 = 1 THEN h.hot_emb
         |         ELSE CAST(list_transform(range(1, ${dim + 1}), j ->
         |           CAST(CAST(h.hot_emb[j] AS DOUBLE) +
         |             (0.001 * (bk.vec_id % 7 + 1)) * CAST(h.hot_emb[(j % $dim) + 1] AS DOUBLE) AS FLOAT)) AS FLOAT[])
         |    END AS embedding
         |  FROM bk
         |  JOIN embeddings e0 ON e0.vec_id = bk.vec_id
         |  LEFT JOIN hot h ON h.hot_idx = bk.m % 4),
         |corpus AS (
         |  SELECT vec_id, embedding, 0 AS is_new FROM embeddings WHERE vec_id % 5 <> 0
         |  UNION ALL SELECT vec_id, embedding, 1 FROM batch),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, is_new FROM corpus
         |  WHERE embedding IS NOT NULL),
         |assign AS (SELECT vec_id, v, cid, is_new FROM (
         |    SELECT e.vec_id, e.v, e.is_new, c.cid, row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      list_dot_product(c.cen, c.cen) - 2 * list_dot_product(c.cen, e.v),
         |      c.cid) AS rn
         |    FROM e CROSS JOIN cent c) WHERE rn = 1),
         |sims AS (SELECT a.vec_id, a.cid, a.v, a.is_new,
         |    list_dot_product(a.v, c.cen) /
         |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.cen, c.cen))) AS cs
         |  FROM assign a JOIN cent c ON a.cid = c.cid),
         |dupedges AS (SELECT i.vec_id AS inc_id, o.vec_id AS other_id, o.is_new AS other_new
         |  FROM sims i JOIN sims o ON i.cid = o.cid AND i.vec_id <> o.vec_id
         |  WHERE i.is_new = 1 AND list_dot_product(i.v, o.v) /
         |      (sqrt(list_dot_product(i.v, i.v)) * sqrt(list_dot_product(o.v, o.v))) >= $tau),
         |dup_exist AS (SELECT DISTINCT inc_id FROM dupedges WHERE other_new = 0),
         |incpairs AS (SELECT DISTINCT least(inc_id, other_id) AS ia,
         |    greatest(inc_id, other_id) AS ib
         |  FROM dupedges WHERE other_new = 1),
         |iedges AS (SELECT ia AS ea, ib AS eb FROM incpairs
         |  UNION ALL SELECT ib, ia FROM incpairs),
         |inodes AS (SELECT DISTINCT ea AS id FROM iedges),
         |reach AS (
         |  SELECT id, id AS r FROM inodes
         |  UNION
         |  SELECT g.eb AS id, reach.r FROM reach JOIN iedges g ON g.ea = reach.id),
         |comps AS (SELECT id, min(r) AS grp FROM reach GROUP BY id),
         |keeprn AS (SELECT m.vec_id, row_number() OVER (PARTITION BY c.grp
         |    ORDER BY m.cs, m.vec_id) AS krn
         |  FROM comps c JOIN sims m ON c.id = m.vec_id),
         |drops AS (SELECT inc_id AS vec_id FROM dup_exist
         |  UNION SELECT vec_id FROM keeprn WHERE krn > 1),
         |nb AS (SELECT kind, count(*) AS n_batch FROM batch GROUP BY kind),
         |ns AS (SELECT kind, count(*) AS n_survived FROM batch
         |  WHERE vec_id NOT IN (SELECT vec_id FROM drops) GROUP BY kind)
         |SELECT nb.kind, nb.n_batch,
         |  CAST(coalesce(ns.n_survived, 0) AS BIGINT) AS n_survived,
         |  false AS cap_engaged
         |FROM nb LEFT JOIN ns USING (kind)
         |ORDER BY nb.kind""".stripMargin)
  }

  // --------------------------------------------------------------- q115
  /** Streaming SemDeDup ingest — the q112 replay CHAINED over the three
    * deterministic micro-batch folds (batch b = arrivals with
    * (vec_id/5) % 3 = b, each deduped against base ∪ earlier-fold
    * survivors, survivors appended): each fold is one q112 block
    * (inc×member edges at `tau`, dup-of-corpus drops, incoming-only
    * components via its own recursive CTE, keep-rank), with the
    * corpus-membership CTE advancing between folds. Survivors = all
    * arrivals minus the union of per-fold drop sets — identical to the
    * engine's accumulated-corpus-minus-base output (never-dropped
    * arrivals, including any with null embeddings, are appended by the
    * fold). Guards are [[semGuardsOk]]'s over the WHOLE corpus: every
    * fold's pair universe and components are subsets of the full-table
    * ones, and guard (d) over the full table dominates every fold's
    * combined occupancy, so a pass proves each fold took the uncapped
    * path this SQL replays. */
  def q115(spark: SparkSession, dir: String, model: IvfModel,
      minCosine: Double, maxClusterRows: Int = 65536): Option[String] = {
    val base = emb(spark, dir).filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
    if (!semGuardsOkCached(dir, spark, base, model, minCosine, maxClusterRows))
      return None
    // strict: a fold's keeper becomes a corpus row for LATER folds, so
    // any keeper swap can change downstream dup decisions
    val baseAttr = emb(spark, dir).filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"), lit(0).as("attr"))
    if (!keeperRankOkCached(dir + "#strict", spark, baseAttr, model,
        minCosine, strict = true))
      return None
    val tau = java.lang.Double.toString(minCosine)
    def fold(b: Int): String =
      s"""inc$b AS (SELECT * FROM arr WHERE b = $b),
         |mem$b AS (SELECT vec_id, 0 AS other_new FROM corp$b
         |  UNION ALL SELECT vec_id, 1 FROM inc$b),
         |ed$b AS (SELECT i.vec_id AS inc_id, o.vec_id AS other_id, m.other_new
         |  FROM inc$b i
         |  JOIN sims o ON i.cid = o.cid AND i.vec_id <> o.vec_id
         |  JOIN mem$b m ON m.vec_id = o.vec_id
         |  WHERE list_dot_product(i.v, o.v) /
         |      (sqrt(list_dot_product(i.v, i.v)) * sqrt(list_dot_product(o.v, o.v))) >= $tau),
         |dup$b AS (SELECT DISTINCT inc_id FROM ed$b WHERE other_new = 0),
         |incpairs$b AS (SELECT DISTINCT least(inc_id, other_id) AS ia,
         |    greatest(inc_id, other_id) AS ib
         |  FROM ed$b WHERE other_new = 1),
         |iedges$b AS (SELECT ia AS ea, ib AS eb FROM incpairs$b
         |  UNION ALL SELECT ib, ia FROM incpairs$b),
         |inodes$b AS (SELECT DISTINCT ea AS id FROM iedges$b),
         |reach$b AS (
         |  SELECT id, id AS r FROM inodes$b
         |  UNION
         |  SELECT g.eb AS id, reach$b.r FROM reach$b JOIN iedges$b g ON g.ea = reach$b.id),
         |comps$b AS (SELECT id, min(r) AS grp FROM reach$b GROUP BY id),
         |keeprn$b AS (SELECT m.vec_id, row_number() OVER (PARTITION BY c.grp
         |    ORDER BY m.cs, m.vec_id) AS krn
         |  FROM comps$b c JOIN arr m ON c.id = m.vec_id),
         |drops$b AS (SELECT inc_id AS vec_id FROM dup$b
         |  UNION SELECT vec_id FROM keeprn$b WHERE krn > 1),
         |corp${b + 1} AS (SELECT vec_id FROM corp$b
         |  UNION ALL SELECT vec_id FROM inc$b
         |  WHERE vec_id NOT IN (SELECT vec_id FROM drops$b))""".stripMargin
    Some(
      s"""WITH RECURSIVE cent(cid, cen) AS (VALUES
         |    ${centValues(model)}),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |  WHERE embedding IS NOT NULL),
         |assign AS (SELECT vec_id, v, cid FROM (
         |    SELECT e.vec_id, e.v, c.cid, row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      list_dot_product(c.cen, c.cen) - 2 * list_dot_product(c.cen, e.v),
         |      c.cid) AS rn
         |    FROM e CROSS JOIN cent c) WHERE rn = 1),
         |sims AS (SELECT a.vec_id, a.cid, a.v,
         |    list_dot_product(a.v, c.cen) /
         |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.cen, c.cen))) AS cs
         |  FROM assign a JOIN cent c ON a.cid = c.cid),
         |arr AS (SELECT s.*, CAST(s.vec_id / 5 AS BIGINT) % 3 AS b
         |  FROM sims s WHERE s.vec_id % 5 = 0),
         |corp0 AS (SELECT vec_id FROM sims WHERE vec_id % 5 <> 0),
         |${fold(0)},
         |${fold(1)},
         |${fold(2)},
         |alldrops AS (SELECT vec_id FROM drops0
         |  UNION SELECT vec_id FROM drops1
         |  UNION SELECT vec_id FROM drops2)
         |SELECT i.label, count(*) AS n_survivors
         |FROM embeddings i
         |WHERE i.vec_id % 5 = 0 AND i.vec_id NOT IN (SELECT vec_id FROM alldrops)
         |GROUP BY i.label
         |ORDER BY i.label""".stripMargin)
  }

  // --------------------------------------------------------------- q113
  /** Planted-band SemDeDup at the paper threshold — the q109 replay
    * over the PLANTED union corpus: every 10th vector gets a
    * deterministic perturbed copy (id offset by `plantedBase`,
    * embedding rotated by 0.02·next-element and rounded back to FLOAT —
    * the SQL reproduces the same double-arithmetic-then-float-cast, so
    * the corpus is bit-identical on both engines), then the standard
    * assignment/pairs/components/keep chain at `tau` aggregated to
    * keep/drop counts by planted-vs-original. The model is the one the
    * query trained on the union (seeded, served). Guards are
    * [[semGuardsOk]]'s, run over the SAME union corpus. */
  def q113(spark: SparkSession, dir: String, model: IvfModel,
      plantedBase: Long, minCosine: Double,
      maxClusterRows: Int = 65536): Option[String] = {
    val e0 = emb(spark, dir)
    val planted = e0.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + plantedBase).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x + lit(0.02) * element_at(col("embedding"),
            pmod(i + 1, size(col("embedding"))) + 1))
          .cast("array<float>").as("embedding"))
    val union = e0.select(col("vec_id"), col("embedding")).unionByName(planted)
      .filter(col("embedding").isNotNull)
    if (!semGuardsOkCached(dir + "#planted", spark, union, model,
        minCosine, maxClusterRows))
      return None
    // keeper flips only change the planted-vs-original counts when the
    // two thinnest members differ in the planted flag
    val unionAttr = union.withColumn("attr", col("vec_id") >= plantedBase)
    if (!keeperRankOkCached(dir + "#plantedAttr", spark, unionAttr, model,
        minCosine, strict = false))
      return None
    val dim = model.centroids.headOption.map(_.length).getOrElse(0)
    val tau = java.lang.Double.toString(minCosine)
    Some(
      s"""WITH RECURSIVE cent(cid, cen) AS (VALUES
         |    ${centValues(model)}),
         |plant AS (SELECT vec_id + $plantedBase AS vec_id,
         |    CAST(list_transform(range(1, ${dim + 1}), j ->
         |      CAST(CAST(embedding[j] AS DOUBLE) +
         |        0.02 * CAST(embedding[(j % $dim) + 1] AS DOUBLE) AS FLOAT)) AS FLOAT[]) AS embedding
         |  FROM embeddings WHERE vec_id % 10 = 0 AND embedding IS NOT NULL),
         |corpus AS (SELECT vec_id, embedding FROM embeddings
         |  UNION ALL SELECT vec_id, embedding FROM plant),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM corpus
         |  WHERE embedding IS NOT NULL),
         |${semBatchCtes(tau)}
         |SELECT s.vec_id >= $plantedBase AS planted,
         |  count(*) AS n,
         |  CAST(count(*) FILTER (WHERE k.krn IS NULL OR k.krn = 1) AS BIGINT) AS n_kept
         |FROM sims s LEFT JOIN keeprn k ON s.vec_id = k.vec_id
         |GROUP BY 1 ORDER BY planted""".stripMargin)
  }

  // ---------------------------------------------------------- q27 / q110
  /** IVF single-query kNN: centroid-literal argmin assignment, linear
    * top-nprobe probe, exact cosine rerank over probed clusters. For
    * q110 the engine routes the probe through the HNSW-over-centroids
    * graph — callers pass `requireCells` (the graph's probe set) and
    * the oracle is withheld unless it equals the linear probe set this
    * SQL replays. */
  def ivfSingleQuery(spark: SparkSession, dir: String, model: IvfModel,
      nprobe: Int, requireCells: Option[Set[Int]] = None): Option[String] = {
    val q = queryVec(spark, dir, 0L)
    val linear = model.probeLinear(q, nprobe).toSet
    if (requireCells.exists(_ != linear)) return None
    if (!probeOk(model, q, nprobe)) return None
    if (!assignAgreementOk(spark, dir, model)) return None
    Some(
      s"""WITH cent(cid, cen) AS (VALUES
         |    ${centValues(model)}),
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |probe AS (SELECT cid FROM (
         |    SELECT c.cid, row_number() OVER (ORDER BY
         |      list_dot_product(c.cen, c.cen) - 2 * list_dot_product(c.cen, CAST(q.qe AS DOUBLE[])),
         |      c.cid) AS rn
         |    FROM cent c, q) WHERE rn <= $nprobe),
         |assign AS (SELECT vec_id, cluster_id FROM (
         |    SELECT e.vec_id, c.cid AS cluster_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      list_dot_product(c.cen, c.cen) - 2 * list_dot_product(c.cen, CAST(e.embedding AS DOUBLE[])),
         |      c.cid) AS rn
         |    FROM embeddings e CROSS JOIN cent c
         |    WHERE e.embedding IS NOT NULL) WHERE rn = 1)
         |SELECT e.vec_id, e.label, round($cosE, 6) AS score
         |FROM embeddings e, assign a, q
         |WHERE e.vec_id = a.vec_id AND a.cluster_id IN (SELECT cid FROM probe)
         |ORDER BY $cosE DESC, e.vec_id
         |LIMIT 10""".stripMargin)
  }

  // ---------------------------------------------------------------- q28
  /** IVF batch kNN: per-query probe + per-query top-k with the
    * (score desc, id asc) tiebreak, (query_id, neighbor_id, score,
    * rank) shape — the replay of `Similarity.ivfTopK`. */
  def q28(spark: SparkSession, dir: String, model: IvfModel,
      nprobe: Int, k: Int): Option[String] = {
    if (!assignAgreementOk(spark, dir, model)) return None
    val qOk = (0L until 5L).forall(id =>
      probeOk(model, queryVec(spark, dir, id), nprobe))
    if (!qOk) return None
    val cosQ =
      "list_dot_product(CAST(e.embedding AS DOUBLE[]), qs.qe) / " +
        "(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) * " +
        "sqrt(list_dot_product(qs.qe, qs.qe)))"
    Some(
      s"""WITH cent(cid, cen) AS (VALUES
         |    ${centValues(model)}),
         |qs AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
         |  FROM embeddings WHERE vec_id < 5),
         |probe AS (SELECT query_id, cid FROM (
         |    SELECT qs.query_id, c.cid, row_number() OVER (PARTITION BY qs.query_id ORDER BY
         |      list_dot_product(c.cen, c.cen) - 2 * list_dot_product(c.cen, qs.qe),
         |      c.cid) AS rn
         |    FROM qs CROSS JOIN cent c) WHERE rn <= $nprobe),
         |assign AS (SELECT vec_id, cluster_id FROM (
         |    SELECT e.vec_id, c.cid AS cluster_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      list_dot_product(c.cen, c.cen) - 2 * list_dot_product(c.cen, CAST(e.embedding AS DOUBLE[])),
         |      c.cid) AS rn
         |    FROM embeddings e CROSS JOIN cent c
         |    WHERE e.embedding IS NOT NULL) WHERE rn = 1),
         |scored AS (
         |  SELECT p.query_id, e.vec_id AS neighbor_id, $cosQ AS raw
         |  FROM embeddings e, assign a, probe p, qs
         |  WHERE e.vec_id = a.vec_id AND a.cluster_id = p.cid AND qs.query_id = p.query_id)
         |SELECT query_id, neighbor_id, round(raw, 6) AS score, rank FROM (
         |  SELECT query_id, neighbor_id, raw,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, neighbor_id) AS INTEGER) AS rank
         |  FROM scored)
         |WHERE rank <= $k
         |ORDER BY query_id, rank""".stripMargin)
  }

  // --------------------------------------------------------------- q106
  /** Bucketed embedding near-dup pairs: signature replay, shared-bucket
    * pair join (id_a < id_b, multi-table dedup), exact cosine verify. */
  def q106(spark: SparkSession, dir: String, lsh: LshModel,
      minCosine: Double): Option[String] = {
    if (minSignMargin(spark, dir, lsh) < signEps) return None
    Some(
      s"""WITH ${sigsCte(planesValues(lsh))},
         |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM sigs a JOIN sigs b ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, round(raw, 6) AS cosine FROM (
         |  SELECT c.id_a, c.id_b,
         |    list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])) /
         |      (sqrt(list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(ea.embedding AS DOUBLE[]))) *
         |       sqrt(list_dot_product(CAST(eb.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])))) AS raw
         |  FROM cand c, embeddings ea, embeddings eb
         |  WHERE ea.vec_id = c.id_a AND eb.vec_id = c.id_b)
         |WHERE raw >= $minCosine
         |ORDER BY id_a, id_b""".stripMargin)
  }

  // --------------------------------------------------------------- q107
  /** Bulk LSH kNN self-join aggregated to label-pair edge counts: the
    * replay of the UNGUARDED join, valid because (a) the exact-vector
    * collapse is output-lossless (LshSkewSpec parity proof) and (b) the
    * generator verifies no distinct-vector bucket exceeds the width cap
    * at this dir (thinning is id-hash-seeded, not SQL-expressible) —
    * else it withholds. */
  def q107(spark: SparkSession, dir: String, lsh: LshModel, k: Int): Option[String] = {
    if (minSignMargin(spark, dir, lsh) < signEps) return None
    // distinct-vector bucket width must stay under the cap (guard inert)
    val maxWidth = emb(spark, dir).filter(col("embedding").isNotNull)
      .select(col("embedding")).distinct()
      .select(explode(lsh.bucketsColumn(col("embedding"))).as("bucket"))
      .groupBy("bucket").count()
      .agg(max("count")).collect()(0).getLong(0)
    if (maxWidth > graft.model.GraftConfig.lshMaxBucketWidth) return None
    Some(
      s"""WITH ${sigsCte(planesValues(lsh))},
         |cand AS (SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
         |  FROM sigs a JOIN sigs b ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id <> b.vec_id),
         |scored AS (
         |  SELECT c.query_id, c.neighbor_id,
         |    list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])) /
         |      (sqrt(list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(ea.embedding AS DOUBLE[]))) *
         |       sqrt(list_dot_product(CAST(eb.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])))) AS raw
         |  FROM cand c, embeddings ea, embeddings eb
         |  WHERE ea.vec_id = c.query_id AND eb.vec_id = c.neighbor_id),
         |top AS (SELECT query_id, neighbor_id, raw FROM (
         |    SELECT query_id, neighbor_id, raw,
         |      row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, neighbor_id) AS rn
         |    FROM scored) WHERE rn <= $k)
         |SELECT la.label AS label_a, lb.label AS label_b,
         |  count(*) AS n_edges, round(avg(t.raw), 6) AS avg_score
         |FROM top t, embeddings la, embeddings lb
         |WHERE la.vec_id = t.query_id AND lb.vec_id = t.neighbor_id
         |GROUP BY la.label, lb.label
         |ORDER BY label_a, label_b""".stripMargin)
  }

  // ---------------------------------------------------------- q77 / q78
  // PQ replay: the codebooks are seeded driver state like centroids, so
  // encoding (per-subspace argmin) and ADC (literal float table lookups
  // summed) are replayable arithmetic. Guards: per-(vector, subspace)
  // code agreement between the engine's float-loop encode and the
  // double-formula argmin the SQL evaluates (with a distinct top-2 gap
  // floor), and a gap floor at the ADC top-n cutoff (the engine's
  // candidate LIMIT carries no tiebreak, so a boundary tie is not
  // replayable and withholds).

  /** `(VALUES (s, code, [..]::DOUBLE[]), ...)` rows for the m×k
    * sub-codebooks. */
  private def cbValues(pq: graft.index.PqModel): String =
    (0 until pq.m).flatMap(s => (0 until pq.k).map(c =>
      s"($s, $c, ${vecLit(pq.codebooks(s)(c))})")).mkString(",\n    ")

  /** Exact float-quantized ADC-table literals (the engine's
    * `adcTable` rounds each partial squared distance to FLOAT; the
    * emitted double literal round-trips it bit-exactly). */
  private def adcValues(tables: Seq[(Int, Array[Array[Float]])]): String =
    tables.flatMap { case (cid, t) =>
      t.zipWithIndex.toSeq.flatMap { case (row, s) =>
        row.zipWithIndex.toSeq.map { case (v, c) =>
          s"($cid, $s, $c, ${d(v)}::DOUBLE)" }
      }
    }.mkString(",\n    ")

  /** Distributed code-agreement check: the engine's actual codes
    * (float-loop NearestCentroid per subspace, over the raw embedding
    * or the FLOAT residual) vs the double-formula argmin the replay SQL
    * evaluates, plus a distinct top-2 gap floor per (vector, subspace).
    * Any disagreeing or margin-thin row withholds the oracle. */
  private def pqCodesOk(spark: SparkSession, dir: String,
      pq: graft.index.PqModel, ivf: Option[IvfModel]): Boolean = {
    val base = emb(spark, dir).filter(col("embedding").isNotNull)
    val prepared = ivf match {
      case None => base.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"),
        pq.encodeColumn(col("embedding")).as("codes"))
      case Some(m) =>
        val cents = typedlit(m.centroids.map(_.map(_.toDouble).toSeq).toSeq)
        val assigned = base.withColumn("cluster_id", m.assignColumn(col("embedding")))
        assigned.select(col("vec_id"),
          zip_with(col("embedding").cast("array<double>"),
            element_at(cents, col("cluster_id") + 1), (a, b) => a - b).as("v"),
          pq.encodeColumn(graft.index.IvfPqModel.residual(
            col("embedding"), col("cluster_id"), m.centroids)).as("codes"))
    }
    codesAgreementOk(spark, prepared, pq)
  }

  /** OPQ code-agreement: the engine encodes the FLOAT-rotated vector
    * (MatVec rounds each component to float) while the replay SQL
    * rotates in all-double arithmetic — the divergence is closed
    * exactly by the row-for-row code comparison below, with the top-2
    * gap floor guarding only the residual double-vs-double
    * summation-order noise between this generator and DuckDB. */
  private def opqCodesOk(spark: SparkSession, dir: String,
      opq: graft.index.OpqModel): Boolean = {
    val rot = typedlit(opq.rotation.map(_.map(_.toDouble).toSeq).toSeq)
    val prepared = emb(spark, dir).filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        transform(rot,
          r => ddot(r, col("embedding").cast("array<double>"))).as("v"),
        opq.encodeColumn(col("embedding")).as("codes"))
    codesAgreementOk(spark, prepared, opq.pq)
  }

  /** Shared agreement body: `prepared` carries (vec_id, v: the DOUBLE
    * vector the replay SQL sub-slices, codes: the ENGINE's codes). */
  private def codesAgreementOk(spark: SparkSession, prepared: DataFrame,
      pq: graft.index.PqModel): Boolean = {
    import spark.implicits._
    val dsub = pq.dsub
    val cbDf = (0 until pq.m).flatMap(s => (0 until pq.k).map(c =>
      (s, c, pq.codebooks(s)(c).map(_.toDouble).toSeq))).toDF("s", "code", "cvec")
    val agg = prepared.crossJoin(broadcast(cbDf))
      .select(col("vec_id"), col("codes"), col("s"), col("code"),
        aggregate(zip_with(slice(col("v"), col("s") * dsub + 1, lit(dsub)),
          col("cvec"), (a, b) => (a - b) * (a - b)), lit(0.0), _ + _).as("d"))
      .groupBy("vec_id", "s")
      .agg(min(struct(col("d"), col("code"))).as("m"),
        bounded_topk(col("d"), 2).as("t"),
        first(col("codes")).as("codes"))
      .select(
        (col("m").getField("code") =!=
          element_at(col("codes"), col("s") + 1)).as("mismatch"),
        when(size(col("t")) === 2,
          element_at(col("t"), 2) - element_at(col("t"), 1))
          .otherwise(lit(Double.MaxValue)).as("gap"))
    agg.filter(col("mismatch") || col("gap") < distEps).limit(1).collect().isEmpty
  }

  /** Gap guard at the ADC top-n cutoff. `adcDists` must carry the
    * ENGINE's exact distances (the same literal-table lookups + left-
    * fold addition order); the replay's ordered-aggregate sum over the
    * identical literals is then bit-identical, so an EXACT boundary tie
    * replays correctly through the shared (dist, id) tiebreak — only a
    * thin NONZERO gap (where a computation-order difference could still
    * flip the cutoff) withholds. */
  private def adcBoundaryOk(adcDists: DataFrame, n: Int): Boolean = {
    val top = adcDists.select(col("dist").cast("double"))
      .orderBy(col("dist")).limit(n + 1).collect().map(_.getDouble(0))
    top.length <= n || {
      val gap = top(n) - top(n - 1)
      gap == 0.0 || gap >= distEps
    }
  }

  /** The shared encode+ADC+rerank replay skeleton: `distsCte` yields
    * per-(vec_id, s, code) sub-distances whose argmin is the code;
    * `adcJoin` maps codes to the literal float table. */
  private def pqReplaySql(adcJoin: String, n: Int): String =
    s"""codes AS (SELECT vec_id, s, code FROM (
       |    SELECT vec_id, s, code,
       |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rn
       |    FROM dists) WHERE rn = 1),
       |cand AS (SELECT vec_id FROM (
       |    SELECT c.vec_id, sum(a2.val ORDER BY a2.s) AS dist
       |    FROM codes c $adcJoin
       |    GROUP BY c.vec_id)
       |  ORDER BY dist, vec_id LIMIT $n),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
       |SELECT e.vec_id, e.label, round($cosE, 6) AS score
       |FROM embeddings e, cand c, q
       |WHERE e.vec_id = c.vec_id
       |ORDER BY $cosE DESC, e.vec_id
       |LIMIT 10""".stripMargin

  /** PQ kNN (q77): per-subspace argmin encode over the raw embedding,
    * ADC top-n candidates, exact cosine rerank. */
  def q77(spark: SparkSession, dir: String, pq: graft.index.PqModel,
      n: Int): Option[String] = {
    if (!pqCodesOk(spark, dir, pq, None)) return None
    val q = queryVec(spark, dir, 0L)
    val table = pq.adcTable(q)
    // the ENGINE's own ADC distance column (same lookups + left-fold
    // order as PqModel.candidates) at the cutoff
    val scored = emb(spark, dir).filter(col("embedding").isNotNull)
      .select(pq.adcDistance(pq.encodeColumn(col("embedding")), q).as("dist"))
    if (!adcBoundaryOk(scored, n)) return None
    val dsub = pq.dsub
    Some(
      s"""WITH cb(s, code, cvec) AS (VALUES
         |    ${cbValues(pq)}),
         |adc(cid, s, code, val) AS (VALUES
         |    ${adcValues(Seq(0 -> table))}),
         |dists AS (
         |  SELECT e.vec_id, cb.s, cb.code,
         |    list_distance(list_slice(CAST(e.embedding AS DOUBLE[]),
         |      cb.s * $dsub + 1, cb.s * $dsub + $dsub), cb.cvec) AS d
         |  FROM embeddings e, cb
         |  WHERE e.embedding IS NOT NULL),
         |${pqReplaySql("JOIN adc a2 ON a2.s = c.s AND a2.code = c.code", n)}""".stripMargin)
  }

  /** `(VALUES (r, [..]::DOUBLE[]), ...)` rows of the learned rotation
    * matrix, row-major. */
  private def rotValues(rot: Array[Array[Float]]): String =
    rot.zipWithIndex.map { case (row, i) => s"($i, ${vecLit(row)})" }
      .mkString(",\n    ")

  /** OPQ kNN (q88): the seeded alternating Procrustes training is
    * deterministic driver state exactly like the PQ codebooks, so the
    * learned rotation R dumps as literal rows and the replay is
    * rotate → per-subspace argmin encode → ADC top-n → exact cosine
    * rerank IN THE ORIGINAL SPACE (R is orthogonal, so the rerank
    * never needs R). Same guard family as q77: code agreement (which
    * also absorbs the engine's float-rotated vs the SQL's
    * double-rotated vector) and an ADC-cutoff gap floor. */
  def q88(spark: SparkSession, dir: String, opq: graft.index.OpqModel,
      n: Int): Option[String] = {
    if (!opqCodesOk(spark, dir, opq)) return None
    val q = queryVec(spark, dir, 0L)
    val rq = opq.rotate(q)
    val table = opq.pq.adcTable(rq)
    // the ENGINE's own ADC distance column (rotated-query table, same
    // lookups + left-fold order as PqModel.candidates) at the cutoff
    val scored = emb(spark, dir).filter(col("embedding").isNotNull)
      .select(opq.pq.adcDistance(
        opq.encodeColumn(col("embedding")), rq).as("dist"))
    if (!adcBoundaryOk(scored, n)) return None
    val dsub = opq.pq.dsub
    Some(
      s"""WITH rot(r, rvec) AS (VALUES
         |    ${rotValues(opq.rotation)}),
         |rx AS (
         |  SELECT e.vec_id,
         |    list(list_dot_product(CAST(e.embedding AS DOUBLE[]), rr.rvec)
         |         ORDER BY rr.r) AS v
         |  FROM embeddings e, rot rr
         |  WHERE e.embedding IS NOT NULL
         |  GROUP BY e.vec_id),
         |cb(s, code, cvec) AS (VALUES
         |    ${cbValues(opq.pq)}),
         |adc(cid, s, code, val) AS (VALUES
         |    ${adcValues(Seq(0 -> table))}),
         |dists AS (
         |  SELECT rx.vec_id, cb.s, cb.code,
         |    list_distance(list_slice(rx.v,
         |      cb.s * $dsub + 1, cb.s * $dsub + $dsub), cb.cvec) AS d
         |  FROM rx, cb),
         |${pqReplaySql("JOIN adc a2 ON a2.s = c.s AND a2.code = c.code", n)}""".stripMargin)
  }

  /** IVF-PQ kNN (q78): coarse argmin assignment, probed cells, residual
    * encode, per-cell ADC tables, exact cosine rerank. */
  def q78(spark: SparkSession, dir: String, model: graft.index.IvfPqModel,
      nprobe: Int, n: Int): Option[String] = {
    import spark.implicits._
    val ivf = model.ivf; val pq = model.pq
    val q = queryVec(spark, dir, 0L)
    // the engine's probe (graph-routed or linear) must equal the
    // double-formula top-nprobe the SQL replays, with a clear edge
    val probed = ivf.probe(q, nprobe)
    val dd = doubleDists(ivf, q)
    val ordered = dd.zipWithIndex.sortBy { case (dist, i) => (dist, i) }
    if (probed.toSet != ordered.take(nprobe).map(_._2).toSet) return None
    if (dd.length > nprobe) {
      val edge = ordered(nprobe)._1 - ordered(nprobe - 1)._1
      if (edge != 0.0 && edge < distEps) return None
      if (edge == 0.0) return None // boundary tie: probe choice not replayable
    }
    if (!assignAgreementOk(spark, dir, ivf)) return None
    if (!pqCodesOk(spark, dir, pq, Some(ivf))) return None
    // per-cell ADC tables over the query's FLOAT residual (the engine's
    // arithmetic), emitted as exact literals
    val tables = probed.map { c =>
      val cen = ivf.centroids(c)
      val resid = q.indices.map(i =>
        q(i) - (if (i < cen.length) cen(i) else 0f)).toArray
      c -> pq.adcTable(resid)
    }
    // the ENGINE's distance expression (IvfPqModel.adcCandidates'
    // stacked cluster-indexed literal + the same left-fold order)
    val probedSet = probed.toSet
    val byCid = tables.toMap
    val stacked: Seq[Seq[Seq[Float]]] = ivf.centroids.indices.map { c =>
      if (!probedSet(c)) Seq.empty
      else byCid(c).map(_.toSeq).toSeq
    }
    val cell = element_at(typedlit(stacked), col("cluster_id") + 1)
    val adc = (0 until pq.m).map { s =>
      element_at(element_at(cell, s + 1), element_at(col("codes"), s + 1) + 1)
        .cast("double")
    }.reduce(_ + _)
    val scored = model.encode(
        emb(spark, dir).filter(col("embedding").isNotNull), "vec_id", "embedding")
      .filter(col("cluster_id").isin(probed.map(Int.box): _*))
      .select(adc.as("dist"))
    if (!adcBoundaryOk(scored, n)) return None
    val dsub = pq.dsub
    val probedList = probed.mkString(", ")
    Some(
      s"""WITH cent(cid, cen) AS (VALUES
         |    ${centValues(ivf)}),
         |cb(s, code, cvec) AS (VALUES
         |    ${cbValues(pq)}),
         |adc(cid, s, code, val) AS (VALUES
         |    ${adcValues(tables)}),
         |pos AS (SELECT unnest(generate_series(1, $dsub)) AS j),
         |assign AS (SELECT vec_id, cluster_id FROM (
         |    SELECT e.vec_id, c.cid AS cluster_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      list_dot_product(c.cen, c.cen) - 2 * list_dot_product(c.cen, CAST(e.embedding AS DOUBLE[])),
         |      c.cid) AS rn
         |    FROM embeddings e CROSS JOIN cent c
         |    WHERE e.embedding IS NOT NULL) WHERE rn = 1),
         |dists AS (
         |  SELECT e.vec_id, cb.s, cb.code,
         |    sum((CAST(e.embedding[cb.s * $dsub + p.j] AS DOUBLE) - ct.cen[cb.s * $dsub + p.j] - cb.cvec[p.j])
         |      * (CAST(e.embedding[cb.s * $dsub + p.j] AS DOUBLE) - ct.cen[cb.s * $dsub + p.j] - cb.cvec[p.j])) AS d
         |  FROM embeddings e
         |  JOIN assign a ON a.vec_id = e.vec_id
         |  JOIN cent ct ON ct.cid = a.cluster_id
         |  CROSS JOIN cb CROSS JOIN pos p
         |  WHERE a.cluster_id IN ($probedList) AND e.embedding IS NOT NULL
         |  GROUP BY 1, 2, 3),
         |${pqReplaySql(
             "JOIN assign ag ON ag.vec_id = c.vec_id " +
             "JOIN adc a2 ON a2.cid = ag.cluster_id AND a2.s = c.s AND a2.code = c.code", n)}""".stripMargin)
  }

  /** OPQ+IVF-PQ kNN (q91): q78's coarse-probe + residual skeleton with
    * the learned rotation applied to each residual before coding (the
    * FAISS `OPQ,IVF,PQ` stack). The rotation is seeded Procrustes
    * driver state like the codebooks, so it dumps as literal rows; the
    * replay is assign → residual → rotate (double) → argmin encode →
    * per-cell ADC → exact cosine rerank in the original space. Guards:
    * probe-set equality with an edge gap, assignment agreement, code
    * agreement on double-rotated residuals (absorbs the engine's
    * float-rotated path), and the ADC-cutoff gap floor. */
  def q91(spark: SparkSession, dir: String, model: graft.index.OpqIvfPqModel,
      nprobe: Int, n: Int): Option[String] = {
    val ivf = model.ivf; val opq = model.opq; val pq = model.pq
    val q = queryVec(spark, dir, 0L)
    val probed = ivf.probe(q, nprobe)
    val dd = doubleDists(ivf, q)
    val ordered = dd.zipWithIndex.sortBy { case (dist, i) => (dist, i) }
    if (probed.toSet != ordered.take(nprobe).map(_._2).toSet) return None
    if (dd.length > nprobe) {
      val edge = ordered(nprobe)._1 - ordered(nprobe - 1)._1
      if (edge != 0.0 && edge < distEps) return None
      if (edge == 0.0) return None // boundary tie: probe choice not replayable
    }
    if (!assignAgreementOk(spark, dir, ivf)) return None
    // code agreement: DOUBLE rotated residual (the replay SQL's vector)
    // vs the engine's float residual → float MatVec → encode path
    val cents = typedlit(ivf.centroids.map(_.map(_.toDouble).toSeq).toSeq)
    val rot = typedlit(opq.rotation.map(_.map(_.toDouble).toSeq).toSeq)
    val assigned = emb(spark, dir).filter(col("embedding").isNotNull)
      .withColumn("cluster_id", ivf.assignColumn(col("embedding")))
    val resD = zip_with(col("embedding").cast("array<double>"),
      element_at(cents, col("cluster_id") + 1), (a, b) => a - b)
    val prepared = assigned.select(col("vec_id"),
      transform(rot, r => ddot(r, resD)).as("v"),
      opq.encodeColumn(graft.index.IvfPqModel.residual(
        col("embedding"), col("cluster_id"), ivf.centroids)).as("codes"))
    if (!codesAgreementOk(spark, prepared, pq)) return None
    // per-cell ADC tables over the ROTATED float residual query — the
    // engine's exact table arithmetic (OpqIvfPqModel.candidates)
    val tables = probed.map { c =>
      val cen = ivf.centroids(c)
      val resid = q.indices.map(i =>
        q(i) - (if (i < cen.length) cen(i) else 0f)).toArray
      c -> pq.adcTable(opq.rotate(resid))
    }
    val probedSet = probed.toSet
    val byCid = tables.toMap
    val stacked: Seq[Seq[Seq[Float]]] = ivf.centroids.indices.map { c =>
      if (!probedSet(c)) Seq.empty
      else byCid(c).map(_.toSeq).toSeq
    }
    val cell = element_at(typedlit(stacked), col("cluster_id") + 1)
    val adc = (0 until pq.m).map { s =>
      element_at(element_at(cell, s + 1), element_at(col("codes"), s + 1) + 1)
        .cast("double")
    }.reduce(_ + _)
    val scored = model.encode(
        emb(spark, dir).filter(col("embedding").isNotNull), "vec_id", "embedding")
      .filter(col("cluster_id").isin(probed.map(Int.box): _*))
      .select(adc.as("dist"))
    if (!adcBoundaryOk(scored, n)) return None
    val dsub = pq.dsub
    val dim = q.length
    val probedList = probed.mkString(", ")
    Some(
      s"""WITH cent(cid, cen) AS (VALUES
         |    ${centValues(ivf)}),
         |rot(r, rvec) AS (VALUES
         |    ${rotValues(opq.rotation)}),
         |cb(s, code, cvec) AS (VALUES
         |    ${cbValues(pq)}),
         |adc(cid, s, code, val) AS (VALUES
         |    ${adcValues(tables)}),
         |assign AS (SELECT vec_id, cluster_id FROM (
         |    SELECT e.vec_id, c.cid AS cluster_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      list_dot_product(c.cen, c.cen) - 2 * list_dot_product(c.cen, CAST(e.embedding AS DOUBLE[])),
         |      c.cid) AS rn
         |    FROM embeddings e CROSS JOIN cent c
         |    WHERE e.embedding IS NOT NULL) WHERE rn = 1),
         |res AS (
         |  SELECT e.vec_id,
         |    list_transform(range(1, ${dim + 1}),
         |      j -> CAST(e.embedding[j] AS DOUBLE) - ct.cen[j]) AS resv
         |  FROM embeddings e
         |  JOIN assign a ON a.vec_id = e.vec_id
         |  JOIN cent ct ON ct.cid = a.cluster_id
         |  WHERE a.cluster_id IN ($probedList) AND e.embedding IS NOT NULL),
         |rx AS (
         |  SELECT r.vec_id,
         |    list(list_dot_product(r.resv, rr.rvec) ORDER BY rr.r) AS v
         |  FROM res r, rot rr GROUP BY r.vec_id),
         |dists AS (
         |  SELECT rx.vec_id, cb.s, cb.code,
         |    list_distance(list_slice(rx.v,
         |      cb.s * $dsub + 1, cb.s * $dsub + $dsub), cb.cvec) AS d
         |  FROM rx, cb),
         |${pqReplaySql(
             "JOIN assign ag ON ag.vec_id = c.vec_id " +
             "JOIN adc a2 ON a2.cid = ag.cluster_id AND a2.s = c.s AND a2.code = c.code", n)}""".stripMargin)
  }
}
