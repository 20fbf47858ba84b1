package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/**
 * DuckDB replay-oracle GENERATORS for the bigram-LM quality gates
 * (q118/q119) — the round-15 fix for the r14 driver hash failures.
 *
 * The r14 static oracles asked DuckDB to evaluate `ln(...)` and round
 * the result to 9 dp; `ln` differs by ulps across libm builds, so a
 * value sitting on a rounding boundary resolved differently on the
 * driver's DuckDB than on the local one even though rows/schema
 * matched. The fix is the same literal-replay trick that oracles the
 * seeded ANN family (AnnOracles): every per-position log-probability
 * depends ONLY on a handful of integer count values —
 *
 *   hit:      logp = round(ln(c2 / c1a), 9)      keyed by (c2, c1a)
 *   backoff:  logp = round(ln(α·(c1b+1)/(T+V)), 9)   keyed by c1b
 *
 * — so the generator computes the distinct (count → logp) mapping
 * ONCE, in the same JVM with the same Spark expressions the engine
 * runs (bit-identical by construction), and inlines it as a literal
 * lookup table. DuckDB still does all the real work — tokenization,
 * bigram extraction, model counting, the three scoring joins, the
 * exact decimal sum, the keep threshold — it just never calls `ln`.
 *
 * Withhold conditions (→ rows-only check, the AnnOracles discipline):
 *  - LUT larger than [[maxLutRows]] (SQL size guard);
 *  - any document's |avg_logp − keepThreshold| margin below
 *    [[keepEps]]: the only remaining cross-engine float op is the
 *    decimal→double cast + one division feeding the threshold compare,
 *    whose noise is ≤ ~1 ulp — 1e-9 is orders above it.
 */
private[graft] object LmOracles {
  val maxLutRows = 20000
  val keepEps = 1e-9
  // q118/q119 (full model) and q127 (pruned) share one model per
  // (fixture dir, prune bound) — memoize so a Verify run trains/scans
  // once per model, not once per query
  private val lutCache = scala.collection.mutable
    .Map.empty[(String, Option[Int]), Option[(String, String)]]
  private val marginCache =
    scala.collection.mutable.Map.empty[(String, Option[Int]), Boolean]
  private val alpha = 0.4
  private val keepThreshold = -9.0
  private val toksSql = ReplaySql.toksSql

  /** The distinct-count LUTs as (hitValuesSql, backoffValuesSql), or
    * None past the size cap. Values are computed by the SAME Spark
    * expression trees `TextAnalysis.lmPerplexity` evaluates per row,
    * so the literals are bit-identical to the engine's decimals.
    * `prune = Some(m)` reproduces the engine's exact frequency-cutoff
    * model (cnt·m > N — the MG-candidate/recount form is EXACTLY this
    * set by the MG guarantee, so a plain filter over the full counts
    * replays it here and a HAVING replays it in DuckDB). */
  private def luts(spark: SparkSession, dir: String,
      prune: Option[Int]): Option[(String, String)] =
    lutCache.synchronized(
      lutCache.getOrElseUpdate((dir, prune), lutsUncached(spark, dir, prune)))

  private def lutsUncached(spark: SparkSession, dir: String,
      prune: Option[Int]): Option[(String, String)] = {
    import spark.implicits._
    val docs = Tables.table(spark, dir, "documents")
    val refToks = docs.filter(col("source") === "src0")
      .select(TextAnalysis.tokens(col("text")).as("tk"))
    val refTok = refToks.select(explode(col("tk")).as("w"))
    val c1Full = refTok.groupBy("w").agg(count(lit(1)).as("c1"))
    val c2Full = refToks.filter(size(col("tk")) >= 2)
      .select(explode(arrays_zip(
        slice(col("tk"), lit(1), size(col("tk")) - 1),
        slice(col("tk"), lit(2), size(col("tk")) - 1))).as("bg"))
      .select(col("bg.0").as("w1"), col("bg.1").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val (c1, c2) = prune match {
      case None => (c1Full, c2Full)
      case Some(m) =>
        val n1 = refTok.count()
        val n2 = c2Full.agg(coalesce(sum(col("c2")), lit(0L)))
          .collect()(0).getLong(0)
        (c1Full.filter(col("c1") * m > n1),
          c2Full.filter(col("c2") * m > n2))
    }
    val tvRow = refTok.agg(count(lit(1)).as("t"),
      countDistinct(col("w")).as("v")).collect()(0)
    val (t, v) = (tvRow.getLong(0), tvRow.getLong(1))

    val hit = c2.join(c1.select(col("w").as("w1"), col("c1").as("c1a")), Seq("w1"))
      .select(col("c2"), col("c1a")).distinct()
      .withColumn("lp", round(log(col("c2") / col("c1a")), 9)
        .cast("decimal(20,9)").cast("string"))
      .collect()
    // every count value a backoff can see: each model unigram count,
    // plus 0 for words absent from the reference
    val bo = (c1.select(col("c1")).distinct().as[Long].collect() :+ 0L)
      .toSeq.toDF("c1b")
      .withColumn("lp", round(log(lit(alpha) * (col("c1b") + 1) /
          (lit(t) + lit(v))), 9)
        .cast("decimal(20,9)").cast("string"))
      .collect()
    if (hit.length > maxLutRows || bo.length > maxLutRows || bo.isEmpty) {
      System.err.println(s"[oracle-gen] lm LUT too large/empty " +
        s"(hit=${hit.length}, bo=${bo.length}) — withholding")
      None
    } else Some((
      // counts are never negative, so a dummy row keeps the VALUES
      // clause well-formed when a pruned model has NO surviving
      // bigrams (everything backs off) — the sf1 q127 case; the
      // oracle then still hash-checks the all-backoff scoring
      (hit.map(r => s"(${r.getLong(0)}, ${r.getLong(1)}, '${r.getString(2)}')")
        :+ "(-1, -1, '0')").mkString(",\n    "),
      bo.map(r => s"(${r.getLong(0)}, '${r.getString(1)}')")
        .mkString(",\n    ")))
  }

  /** Min |avg_logp − keepThreshold| over every scored doc: the
    * decimal→double cast + division margin for the keep compare. */
  private def keepMarginOk(spark: SparkSession, dir: String,
      prune: Option[Int]): Boolean =
    marginCache.synchronized(marginCache.getOrElseUpdate((dir, prune),
      keepMarginUncached(spark, dir, prune)))

  private def keepMarginUncached(spark: SparkSession, dir: String,
      prune: Option[Int]): Boolean = {
    val docs = Tables.table(spark, dir, "documents")
    val scored = TextAnalysis.lmPerplexity(docs, "doc_id", "text",
      refFilter = col("source") === "src0", maxModelTerms = prune)
    val m = scored.agg(min(abs(col("sum_logp").cast("double") /
        col("n_bigrams") - lit(keepThreshold)))).collect()(0)
    !m.isNullAt(0) && m.getDouble(0) > keepEps
  }

  /** Shared prelude: tokenization, model counts (with the exact
    * integer-cutoff HAVING when pruned), bigram extraction, the
    * literal LUTs, and the per-doc exact decimal sums. */
  private def prelude(hitValues: String, boValues: String,
      prune: Option[Int]): String = {
    val having1 = prune.map(m =>
      s"\n  HAVING count(*) * $m > (SELECT count(*) FROM (SELECT unnest(tk) FROM ref))")
      .getOrElse("")
    val having2 = prune.map(m =>
      s"\n  HAVING count(*) * $m > (SELECT count(*) FROM (SELECT tk[i] FROM ref, unnest(range(1, len(tk))) AS u(i) WHERE len(tk) >= 2))")
      .getOrElse("")
    s"""WITH d AS (
       |  SELECT doc_id, source, $toksSql AS tk
       |  FROM documents),
       |ref AS (SELECT tk FROM d WHERE source = 'src0'),
       |c1 AS (SELECT w, CAST(count(*) AS BIGINT) AS c1
       |  FROM (SELECT unnest(tk) AS w FROM ref) GROUP BY w$having1),
       |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM (
       |    SELECT tk[i] AS w1, tk[i+1] AS w2 FROM ref, unnest(range(1, len(tk))) AS u(i)
       |    WHERE len(tk) >= 2) GROUP BY w1, w2$having2),
       |lut_hit AS (SELECT a AS c2v, b AS c1v, CAST(c AS DECIMAL(20,9)) AS lp
       |  FROM (VALUES
       |    $hitValues) t(a, b, c)),
       |lut_bo AS (SELECT a AS c1bv, CAST(b AS DECIMAL(20,9)) AS lp
       |  FROM (VALUES
       |    $boValues) t(a, b)),
       |bg AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
       |  FROM d, unnest(range(1, len(tk))) AS u(i) WHERE len(tk) >= 2),
       |lp AS (SELECT bg.doc_id,
       |    CASE WHEN c2.c2 IS NOT NULL AND c1a.c1 IS NOT NULL
       |      THEN lh.lp ELSE lb.lp END AS logp_r
       |  FROM bg
       |  LEFT JOIN c2 ON c2.w1 = bg.w1 AND c2.w2 = bg.w2
       |  LEFT JOIN c1 c1a ON c1a.w = bg.w1
       |  LEFT JOIN c1 c1b ON c1b.w = bg.w2
       |  LEFT JOIN lut_hit lh ON lh.c2v = c2.c2 AND lh.c1v = c1a.c1
       |  LEFT JOIN lut_bo lb ON lb.c1bv = COALESCE(c1b.c1, 0)),
       |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(sum(logp_r) AS DECIMAL(20,9)) AS sum_logp
       |  FROM lp GROUP BY doc_id)""".stripMargin
  }

  def q118(spark: SparkSession, dir: String): Option[String] =
    luts(spark, dir, None).filter(_ => keepMarginOk(spark, dir, None)).map {
      case (hitValues, boValues) =>
        s"""${prelude(hitValues, boValues, None)}
           |SELECT doc_id, n_bigrams, sum_logp,
           |  CAST(sum_logp AS DOUBLE) / n_bigrams >= $keepThreshold AS keep
           |FROM per WHERE doc_id < 30 ORDER BY doc_id""".stripMargin
    }

  private def perSourceSelect(pre: String): String =
    s"""$pre
       |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs_scored,
       |  CAST(sum(CASE WHEN CAST(per.sum_logp AS DOUBLE) / per.n_bigrams
       |    >= $keepThreshold THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       |  CAST(sum(per.n_bigrams) AS BIGINT) AS n_bigrams,
       |  CAST(sum(per.sum_logp) AS DECIMAL(27,9)) AS sum_logp
       |FROM per JOIN d ON d.doc_id = per.doc_id
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  def q119(spark: SparkSession, dir: String): Option[String] =
    luts(spark, dir, None).filter(_ => keepMarginOk(spark, dir, None)).map {
      case (hitValues, boValues) =>
        perSourceSelect(prelude(hitValues, boValues, None))
    }

  /** q127: the bounded-model gate — same per-source shape as q119,
    * model pruned to the exact frequency-cutoff set at `m`. */
  def q127(spark: SparkSession, dir: String, m: Int): Option[String] =
    luts(spark, dir, Some(m)).filter(_ => keepMarginOk(spark, dir, Some(m)))
      .map { case (hitValues, boValues) =>
        perSourceSelect(prelude(hitValues, boValues, Some(m)))
      }
}

/**
 * Literal-LUT generated oracle for the DSIR importance-resampling
 * gate (q129) — the same discipline as [[LmOracles]]: each bucket's
 * log-ratio λ depends ONLY on the integer count pair (c_t, c_r) with
 * the totals fixed, so the generator dumps the distinct
 * (c_t, c_r) → λ map as literals (computed by the SAME Spark
 * expressions DataSelection.dsirModel evaluates — bit-identical by
 * construction) and DuckDB re-derives tokenization, the
 * unigram+bigram features, the poly-31+splitmix bucket hash, BOTH
 * model counts, the scoring join and the exact decimal sum with zero
 * `ln` exposure. Withholds (→ rows-only) when the LUT exceeds
 * [[LmOracles.maxLutRows]] or any document's |avg_w − threshold|
 * margin falls below [[LmOracles.keepEps]] (the one cross-engine
 * float op left is the decimal→double cast + division feeding the
 * keep compare).
 */
private[graft] object DsirOracles {
  private val cache = scala.collection.mutable
    .Map.empty[(String, Int, Long, Double), Option[String]]

  def q129(spark: SparkSession, dir: String, dim: Int = 256,
      seed: Long = 11L, thr: Double = 0.0): Option[String] =
    cache.synchronized(cache.getOrElseUpdate((dir, dim, seed, thr),
      gen(spark, dir, dim, seed, thr)))

  private def gen(spark: SparkSession, dir: String, dim: Int,
      seed: Long, thr: Double): Option[String] = {
    import graft.operators.DataSelection
    val docs = Tables.table(spark, dir, "documents")
    val target = col("source") === "src0"
    val lut = DataSelection.dsirModel(docs, "text", target, dim, seed)
      .select(col("c_t"), col("c_r"), col("lam").cast("string").as("l"))
      .distinct().collect()
    if (lut.length > LmOracles.maxLutRows || lut.isEmpty) {
      System.err.println(
        s"[oracle-gen] q129 LUT too large/empty (${lut.length}) — withholding")
      return None
    }
    val margin = DataSelection
      .dsirWeights(docs, "doc_id", "text", target, dim, seed, thr)
      .agg(min(abs(col("sum_w").cast("double") / col("n_feats") - lit(thr))))
      .collect()(0)
    if (margin.isNullAt(0) || margin.getDouble(0) <= LmOracles.keepEps) {
      System.err.println(s"[oracle-gen] q129 keep margin " +
        s"${if (margin.isNullAt(0)) "null" else margin.getDouble(0)} " +
        "below eps — withholding")
      return None
    }
    val lutValues = lut.map(r =>
      s"(${r.getLong(0)}, ${r.getLong(1)}, '${r.getString(2)}')")
      .mkString(",\n    ")
    val featsSql = // tk ++ bigrams (1-indexed; range(1, len) is empty below 2 tokens)
      "tk || [tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))]"
    val bucket = ReplaySql.floorModSql(
      ReplaySql.stringHashSql("f", seed), dim.toLong)
    Some(
      s"""WITH d AS (
         |  SELECT doc_id, source, ${ReplaySql.toksSql} AS tk FROM documents),
         |feats AS (SELECT doc_id, source, unnest($featsSql) AS f FROM d),
         |hb AS (SELECT doc_id, source, CAST($bucket AS BIGINT) AS b FROM feats),
         |model AS (SELECT b,
         |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
         |    CAST(count(*) AS BIGINT) AS c_r
         |  FROM hb GROUP BY b),
         |lut AS (SELECT a AS c_tv, bb AS c_rv, CAST(c AS DECIMAL(12,9)) AS lam
         |  FROM (VALUES
         |    $lutValues) t(a, bb, c)),
         |dc AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c
         |  FROM hb GROUP BY doc_id, b),
         |w AS (SELECT dc.doc_id, CAST(sum(dc.c) AS BIGINT) AS n_feats,
         |    CAST(sum(l.lam * dc.c) AS DECIMAL(20,9)) AS sum_w
         |  FROM dc
         |  JOIN model m ON m.b = dc.b
         |  JOIN lut l ON l.c_tv = m.c_t AND l.c_rv = m.c_r
         |  GROUP BY dc.doc_id)
         |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs_scored,
         |  CAST(sum(CASE WHEN CAST(w.sum_w AS DOUBLE) / w.n_feats >= $thr
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         |  CAST(sum(w.n_feats) AS BIGINT) AS n_feats,
         |  CAST(sum(w.sum_w) AS DECIMAL(27,9)) AS sum_w
         |FROM w JOIN d ON d.doc_id = w.doc_id
         |GROUP BY d.source ORDER BY d.source""".stripMargin)
  }
}

/**
 * Literal-LUT generated oracles for the two remaining ln-bearing
 * static oracles (q59 TF-IDF, q96 PMI) — round-15 de-risking of the
 * r14 failure class: their SELECTION logic is pure integer
 * arithmetic; only a DISPLAYED double passes through ln. The
 * generators compute the (integer inputs → value) map in the JVM with
 * the engine's own expressions and inline it, so DuckDB verifies all
 * the counting/ranking with zero libm exposure.
 */
private[graft] object TextLutOracles {
  private val toksSql = ReplaySql.toksSql
  private def d(x: Double): String = java.lang.Double.toString(x)

  /** q59: tfidf = tf · ln((N+1)/(df+1)) depends only on (tf, df) with
    * the corpus doc count N fixed — the LUT carries BOTH the full
    * double (the in-document ranking key, compared bit-identically as
    * a parsed literal) and the 6-dp display value. Withholds past
    * `maxPairs` distinct (tf, df) pairs (big-SF legs fall back to the
    * rows-only check; the gates' fixtures stay well under). */
  def q59(spark: SparkSession, dir: String,
      maxPairs: Int = 20000): Option[String] = {
    val docs = Tables.table(spark, dir, "documents")
    val toks = docs.select(col("doc_id").as("id"),
      explode(graft.operators.TextAnalysis.tokens(col("text"))).as("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = toks.agg(countDistinct(col("id"))).collect()(0).getLong(0)
    val pairs = tf.join(dfreq, Seq("term")).select("tf", "df").distinct()
      .withColumn("full",
        col("tf") * log((lit(nDocs) + 1).cast("double") / (col("df") + 1)))
      .withColumn("disp", round(col("full"), 6))
      .collect()
    if (pairs.length > maxPairs) {
      System.err.println(
        s"[oracle-gen] q59 LUT too large (${pairs.length}) — withholding")
      return None
    }
    val lut = pairs.map(r => s"(${r.getLong(0)}, ${r.getLong(1)}, " +
        s"'${d(r.getDouble(2))}', '${d(r.getDouble(3))}')")
      .mkString(",\n    ")
    Some(
      s"""WITH toks AS (
         |  SELECT doc_id AS id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM toks GROUP BY 1, 2),
         |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
         |  FROM tf GROUP BY 1),
         |lut AS (SELECT a AS tf, b AS df, CAST(c AS DOUBLE) AS fullv,
         |    CAST(e AS DOUBLE) AS disp
         |  FROM (VALUES
         |    $lut) t(a, b, c, e)),
         |scored AS (
         |  SELECT tf.id, tf.term, tf.tf, dfreq.df, lut.fullv, lut.disp
         |  FROM tf JOIN dfreq USING (term)
         |  JOIN lut ON lut.tf = tf.tf AND lut.df = dfreq.df),
         |ranked AS (
         |  SELECT id AS doc_id, term, tf, df, disp AS tfidf,
         |    CAST(row_number() OVER (PARTITION BY id ORDER BY fullv DESC, term) AS INTEGER) AS rank
         |  FROM scored)
         |SELECT * FROM ranked WHERE rank <= 5 AND doc_id < 100
         |ORDER BY doc_id, rank""".stripMargin)
  }

  /** q96: the top-30 pair selection orders by INTEGER c12 — only the
    * displayed pmi is transcendental, so the LUT is just the ≤ 30
    * output rows' (c12, c1, c2) → pmi map, taken from the engine's own
    * result (an inner join, so a missing triple fails loudly as a row
    * drop, never silently). */
  def q96(spark: SparkSession, dir: String,
      engine: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[String] = {
    import spark.implicits._
    // Triples come off the engine result (DuckDB re-derives and joins
    // on them, so a wrong count fails as a row drop), but the pmi LUT
    // VALUE is recomputed here from the integers with a standalone
    // expression (ADVICE r15): nDocs independently counted, the
    // formula re-typed — a bug in q96Run's pmi arithmetic now breaks
    // the hash instead of being replayed.
    val triples = engine(spark, dir)
      .select(col("c12").cast("long"), col("c1").cast("long"),
        col("c2").cast("long")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    if (triples.isEmpty) return None
    val nDocs = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), explode(
        graft.operators.TextAnalysis.tokens(col("text"))).as("term"))
      .distinct().select("doc_id").distinct().count()
    val rows = triples.toSeq.toDF("c12", "c1", "c2")
      .withColumn("pmi", round(log(
        col("c12").cast("double") * nDocs / (col("c1") * col("c2"))), 6))
      .collect()
    val lut = rows.map(r => s"(${r.getLong(0)}, ${r.getLong(1)}, " +
        s"${r.getLong(2)}, '${d(r.getDouble(3))}')")
      .mkString(",\n    ")
    Some(
      s"""WITH toks AS (
         |  SELECT DISTINCT doc_id, term FROM (
         |    SELECT doc_id, unnest($toksSql) AS term
         |    FROM documents)),
         |dfreq AS (SELECT term, count(*) AS c FROM toks GROUP BY 1),
         |vocab AS (SELECT term, c FROM dfreq ORDER BY c DESC, term LIMIT 50),
         |pruned AS (SELECT t.doc_id, t.term, v.c FROM toks t JOIN vocab v USING (term)),
         |pairs AS (
         |  SELECT a.term AS t1, b.term AS t2, a.c AS c1, b.c AS c2,
         |    count(*) AS c12
         |  FROM pruned a JOIN pruned b
         |    ON a.doc_id = b.doc_id AND a.term < b.term
         |  GROUP BY 1, 2, 3, 4),
         |topk AS (SELECT t1, t2, c1, c2, c12 FROM pairs
         |  ORDER BY c12 DESC, t1, t2 LIMIT 30),
         |lut AS (SELECT a AS c12, b AS c1, c AS c2, CAST(e AS DOUBLE) AS pmi
         |  FROM (VALUES
         |    $lut) t(a, b, c, e))
         |SELECT t1, t2, CAST(topk.c1 AS BIGINT) AS c1,
         |  CAST(topk.c2 AS BIGINT) AS c2, CAST(topk.c12 AS BIGINT) AS c12,
         |  lut.pmi
         |FROM topk JOIN lut ON lut.c12 = topk.c12 AND lut.c1 = topk.c1
         |  AND lut.c2 = topk.c2
         |ORDER BY topk.c12 DESC, t1, t2""".stripMargin)
  }

  /** Boundary distance of round(v, 6): |frac(v·10⁶) − 0.5|, in grid
    * units (1.0 = one 10⁻⁶ step). */
  private def roundMargin6(v: Double): Double = {
    val t = v * 1e6
    math.abs(t - math.floor(t) - 0.5)
  }
  /** Display-round guard: cross-engine ln noise on v is ~|v|·1e-16·10⁶
    * grid units ≤ ~1e-6 for these key magnitudes; 1e-4 is 100× above
    * it while false-withholding only ~0.02% of uniform draws. */
  private val dispEps = 1e-4
  /** Selection-cut guard on the raw keys (absolute; keys are 1e-5..1e-1
    * here and their ln noise ~1e-17). Bit-equal keys at the cut are
    * NOT safe (ADVICE r15): Spark-equal keys derived from distinct
    * (uniform, weight) inputs can come out unequal under DuckDB's own
    * ln and select the other row — so equality withholds too. */
  private val cutEps = 1e-12

  /** q98: emit the static Efraimidis–Spirakis replay SQL only when the
    * top-`m` selection cut and every displayed key_e6 sit clear of
    * cross-engine ln noise (the AnnOracles withhold discipline — the
    * SQL itself still evaluates ln, so its result is only trusted when
    * no value is within noise of a decision boundary). */
  def q98Guarded(spark: SparkSession, dir: String, staticSql: String,
      m: Int = 25): Option[String] = {
    val docs = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val ks = graft.operators.Packing.withSampleKey(docs, "doc_id", "n_chars")
      .select("sample_key").orderBy("sample_key").limit(m + 1)
      .collect().map(_.getDouble(0))
    val cutOk = ks.length <= m || ks(m) - ks(m - 1) > cutEps
    val dispOk = ks.take(m).forall(k => roundMargin6(k * 1e6) > dispEps)
    if (cutOk && dispOk) Some(staticSql)
    else {
      System.err.println("[oracle-gen] q98 withheld: key margin inside " +
        s"ln-noise guard (cutOk=$cutOk dispOk=$dispOk)")
      None
    }
  }

  /** q99: the per-source form — rank-`perGroup` vs rank-`perGroup`+1
    * gap and display margins checked PER GROUP. */
  def q99Guarded(spark: SparkSession, dir: String, staticSql: String,
      perGroup: Int = 3): Option[String] = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val w = Window.partitionBy("source")
      .orderBy(col("sample_key"), col("doc_id"))
    val rows = graft.operators.Packing.withSampleKey(docs, "doc_id", "n_chars")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perGroup + 1)
      .select("source", "rn", "sample_key").collect()
      .groupBy(_.getString(0))
    val ok = rows.values.forall { g =>
      val byRank = g.sortBy(_.getInt(1)).map(_.getDouble(2))
      val cutOk = byRank.length <= perGroup ||
        byRank(perGroup) - byRank(perGroup - 1) > cutEps
      cutOk && byRank.take(perGroup)
        .forall(k => roundMargin6(k * 1e6) > dispEps)
    }
    if (ok) Some(staticSql)
    else {
      System.err.println("[oracle-gen] q99 withheld: key margin inside " +
        "ln-noise guard")
      None
    }
  }
}
