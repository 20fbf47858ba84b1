package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distribution-matching data selection — the DSIR recipe (Xie et al.
 * 2023, "Data Selection for Language Models via Importance
 * Resampling", arXiv:2302.03169): fit two bag-of-hashed-ngrams unigram
 * models — one over a trusted TARGET slice, one over the RAW corpus —
 * and weight every document by its log importance ratio
 *
 *   log w(doc) = Σ_features  log p̂_target[bucket] − log p̂_raw[bucket]
 *
 * with add-1 smoothing over `dim` hashed buckets. Documents whose
 * feature mass looks more target-like than raw-like score positive;
 * selection keeps docs with average log-ratio ≥ `keepThreshold`
 * (the deterministic top-mass variant of the paper's Gumbel resample —
 * a seeded Gumbel draw can be layered on the returned weights, but the
 * gate needs a replayable verdict).
 *
 * Features are unigrams + bigrams (the paper's choice) hashed with the
 * engine's poly-31+splitmix64 string hash into `dim` buckets — the
 * hashing trick bounds BOTH models to `dim` rows no matter how large
 * the corpus vocabulary grows, which is the whole 100 TB story:
 *
 *  - ONE corpus scan builds both models simultaneously (per-bucket
 *    raw count + target count via a conditional sum), shuffling at
 *    most `dim` keys' map-side partials — never a vocabulary-scale
 *    exchange (contrast the unbounded LM of TextAnalysis.lmPerplexity,
 *    which needs the Misra-Gries cutoff machinery to bound its model).
 *  - The per-bucket log-ratio table (`dim` rows) is explicitly
 *    broadcast for scoring, so the document feature stream crosses an
 *    exchange only as (doc, bucket, count) rows — ≤ `dim` per doc
 *    regardless of document length.
 *
 * Determinism/replayability (the round-15/16 exact-hash discipline):
 * each bucket's log-ratio λ[b] depends ONLY on the integer counts
 * (c_t[b], c_r[b]) with the totals fixed; λ rounds to 9 dp and the
 * per-document weight sums as DECIMAL — exact, order-independent on
 * both engines. The keep verdict compares the exact-derived double
 * against the threshold. DuckDB replays tokenization, hashing, both
 * model counts, the join and the decimal sum, looking λ up in a
 * literal (c_t, c_r) → λ table (DsirOracles) — it never calls `ln`.
 */
object DataSelection {

  private def stringHashCol(c: Column, seed: Long): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(org.apache.spark.sql.graft.expressions.StringHash64(
      Bridge.expression(c), seed))
  }

  /** Unigram + bigram feature array of a text column (bigrams joined
    * with a single space). Zero/one-token docs yield just their
    * unigrams — the slice(tk, 1, 0) arm keeps the empty branch typed
    * array<string> and guards the size-(-1) slice crash on empty docs
    * (the round-15 ADVICE lesson on the LM candidate pass). */
  def ngramFeatures(text: Column): Column = {
    val tk = TextAnalysis.tokens(text)
    val bigrams = when(size(tk) >= 2,
        zip_with(
          slice(tk, lit(1), size(tk) - 1),
          slice(tk, lit(2), size(tk) - 1),
          (a, b) => concat(a, lit(" "), b)))
      .otherwise(slice(tk, lit(1), lit(0)))
    concat(tk, bigrams)
  }

  /** Hashed bucket of one feature string. */
  def featureBucket(feat: Column, dim: Int, seed: Long): Column =
    pmod(stringHashCol(feat, seed), lit(dim.toLong))

  /**
   * The two hashed-ngram models and their smoothed log-ratio, built in
   * ONE corpus scan: (b, c_t, c_r, lam) with one row per OCCUPIED
   * bucket (c_r ≥ 1 — a bucket no document touches can never be looked
   * up) and
   *
   *   lam = round( ln((c_t+1)/(T_t+dim)) − ln((c_r+1)/(T_r+dim)), 9 )
   *
   * as DECIMAL(20,9). T_t/T_r are total feature occurrences in the
   * target slice / raw corpus. The frame is `dim`-bounded and
   * localCheckpointed (two consumers: totals scalar + scoring join).
   */
  def dsirModel(docs: DataFrame, textCol: String, targetFilter: Column,
      dim: Int = 4096, seed: Long = 11L): DataFrame =
    withLogRatio(docs
      .select(targetFilter.as("is_t"),
        explode(ngramFeatures(col(textCol))).as("f"))
      .select(col("is_t"), featureBucket(col("f"), dim, seed).as("b"))
      .groupBy("b")
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t"),
        count(lit(1)).as("c_r"))
      .localCheckpoint(true), dim)

  /** λ over the (b, c_t, c_r) count frame, so the oracle generator's
    * LUT literals (read off [[dsirModel]]'s output) are bit-identical
    * to the scoring λ by construction. */
  private def withLogRatio(counts: DataFrame, dim: Int): DataFrame = {
    val tot = counts.agg(
      coalesce(sum(col("c_t")), lit(0L)).as("tt"),
      coalesce(sum(col("c_r")), lit(0L)).as("tr")).collect()(0)
    val (tt, tr) = (tot.getLong(0), tot.getLong(1))
    // decimal(12,9), NOT (20,9): any decimal×bigint consumer (the
    // DuckDB oracle multiplies λ by per-bucket counts; an earlier
    // engine shape did too) must stay inside the 38-digit budget —
    // (20,9)×(20,0) hits precision 41 and Spark's precision-loss rule
    // silently truncates the product scale to 6 dp (measured: every
    // per-doc sum drifted ~1e-6 against the replay). (12,9)×(20,0) =
    // (33,9) — exact. |λ| ≤ ln(T_r+dim) < 10³ for any real corpus.
    counts.withColumn("lam",
      round(log((col("c_t") + 1).cast("double") / (lit(tt) + lit(dim.toLong))) -
            log((col("c_r") + 1).cast("double") / (lit(tr) + lit(dim.toLong))), 9)
        .cast("decimal(12,9)"))
  }

  /**
   * Per-document importance weights and the keep verdict:
   * (id, n_feats, sum_w DECIMAL(20,9), avg_w, keep) — one row per
   * document with ≥ 1 token. `avg_w` (a rounded-double display) never
   * belongs in a hashed projection; hash (n_feats, sum_w, keep).
   */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      targetFilter: Column, dim: Int = 4096, seed: Long = 11L,
      keepThreshold: Double = 0.0): DataFrame = {
    val model = dsirModel(docs, textCol, targetFilter, dim, seed)
    // scoring: every occurring bucket is in the raw model by
    // construction, so the per-OCCURRENCE broadcast join is total and
    // runs map-side in the same stage as tokenize/explode/hash; the
    // per-doc decimal sum then partial-aggregates before its one
    // exchange (≤ one (id) partial per partition). This shape beat
    // both alternatives at sf0.1: a pre-join per-(id, bucket) count
    // pass (adds an aggregation for nothing — λ·c over counts equals
    // Σλ over occurrences exactly) and a fused single-scan form that
    // localCheckpointed the (id, bucket) counts (the 5M-row
    // checkpoint write cost more than the second tokenize pass).
    docs.select(col(idCol).as("id"),
        explode(ngramFeatures(col(textCol))).as("f"))
      .select(col("id"), featureBucket(col("f"), dim, seed).as("b"))
      .join(broadcast(model.select(col("b"), col("lam"))), Seq("b"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_feats"),
        sum(col("lam")).cast("decimal(20,9)").as("sum_w"))
      .withColumn("avg_w",
        round(col("sum_w").cast("double") / col("n_feats"), 6))
      .withColumn("keep",
        col("sum_w").cast("double") / col("n_feats") >= lit(keepThreshold))
      .select(col("id").as(idCol), col("n_feats"), col("sum_w"),
        col("avg_w"), col("keep"))
  }
}
