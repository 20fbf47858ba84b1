package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.graft.expressions.HashBucket

/**
 * Pretraining-prep operators: packing documents into fixed-token-budget
 * training sequences, and deterministic source mixing toward target
 * weights. Both are pure functions of (id, token count, source) — no
 * RNG, no collect — so runs are reproducible across clusters and both
 * are DuckDB-replayable for the correctness gate.
 */
object Packing {

  private def bucketOf(c: Column, n: Int): Column =
    Bridge.column(HashBucket(Bridge.expression(c), n))

  /** Fail loudly on non-integral id columns: cast("long") on strings
    * yields nulls and every row would silently land in one split.
    * Shared with CorpusPipeline's split stage — any hash-of-id
    * assignment needs this guard. */
  private[graft] def requireIntegralId(df: DataFrame, idCol: String): Unit = {
    import org.apache.spark.sql.types._
    val ok = df.schema(idCol).dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    require(ok, s"$idCol must be an integral type for hash assignment, " +
      s"got ${df.schema(idCol).dataType}")
  }

  /**
   * Assign each document to a training-sequence bin of ~`seqTokens`
   * tokens: shard by id hash (so the cumulative windows parallelize —
   * a single global window would serialize at scale), order
   * deterministically by id within the shard, and cut bins by the
   * running token count (contiguous-fill packing: a doc goes to the
   * bin its cumulative START falls into). Output adds
   * `shard`, `bin`, `bin_start_tok`.
   *
   * Docs longer than `seqTokens` deliberately keep their own bin
   * (they span; chunking oversized docs is the upstream splitter's
   * job, reference chunk semantics).
   */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      seqTokens: Int, shards: Int = 64): DataFrame = {
    requireIntegralId(df, idCol)
    val w = Window.partitionBy("shard").orderBy(col(idCol))
    df.withColumn("shard", bucketOf(col(idCol).cast("long"), shards))
      .withColumn("bin_start_tok",
        coalesce(sum(col(tokensCol)).over(w) - col(tokensCol), lit(0L)))
      .withColumn("bin", floor(col("bin_start_tok") / seqTokens).cast("long"))
  }

  /** Per-bin packing stats (docs, tokens, fill ratio vs the budget). */
  def packingStats(packed: DataFrame, tokensCol: String, seqTokens: Int): DataFrame =
    packed.groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col(tokensCol)).as("n_tokens"))
      .withColumn("fill_ratio",
        round(least(col("n_tokens").cast("double") / seqTokens, lit(1.0)), 6))

  /**
   * Deterministic source mixing: keep each document with per-source
   * probability `weights(source)` (0..1), decided by the id's hash
   * bucket — the distributed, reproducible form of weighted sampling
   * for training-mix construction. Unlisted sources keep everything.
   */
  def mixBySource(df: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double], buckets: Int = 10000): DataFrame = {
    requireIntegralId(df, idCol)
    val b = bucketOf(col(idCol).cast("long"), buckets)
    val keepExpr = weights.foldLeft(lit(true)) { case (acc, (src, w)) =>
      when(col(sourceCol) === src, b < (w * buckets).toInt).otherwise(acc)
    }
    df.filter(keepExpr)
  }

  /**
   * Temperature-scaled source mixing (the alpha-sampling recipe of
   * multilingual pretraining, e.g. XLM-R / mT5: sampled share of
   * source s is proportional to n_s^alpha, alpha < 1 flattening the
   * source distribution toward uniform). Derived weights, not given
   * ones: per-source keep probability k_s = (n_min / n_s)^(1-alpha),
   * anchored so the SMALLEST source keeps everything and larger
   * sources downsample toward the tempered share. Membership stays the
   * deterministic id-hash bucket of [[mixBySource]].
   *
   * Per-source counts are one aggregate collected to the driver (a
   * handful of sources); thresholds floor(buckets * k_s) are computed
   * there. At alpha = 0.5 the power is evaluated as sqrt, which IEEE
   * requires to be correctly rounded — an engine replaying the
   * threshold arithmetic (DuckDB oracle) reproduces it bit-identically,
   * which is NOT guaranteed for pow(x, y).
   */
  def temperatureMix(df: DataFrame, idCol: String, sourceCol: String,
      alpha: Double = 0.5, buckets: Int = 10000): DataFrame = {
    requireIntegralId(df, idCol)
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1], got $alpha")
    val counts: Map[String, Long] = df.groupBy(sourceCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "no sources to mix")
    val nMin = counts.values.min
    val thresholds: Map[String, Int] = counts.map { case (s, n) =>
      val ratio = nMin.toDouble / n
      val k = if (alpha == 0.5) math.sqrt(ratio) else math.pow(ratio, 1.0 - alpha)
      s -> math.floor(buckets * k).toInt
    }
    val b = bucketOf(col(idCol).cast("long"), buckets)
    val keepExpr = thresholds.foldLeft(lit(false)) { case (acc, (src, thr)) =>
      when(col(sourceCol) === src, b < thr).otherwise(acc)
    }
    df.filter(keepExpr)
  }

  /**
   * Deterministic weighted sample WITHOUT replacement (Efraimidis &
   * Spirakis 2006, exponential-jumps formulation): each row draws
   * `u = uniform(splitmix64(id))` and keys on `-ln(u) / w` — the
   * minimum-key m rows are a weighted sample where inclusion
   * probability scales with weight. Pure function of (id, weight):
   * replayable by another engine, stable across runs/partitionings —
   * the same determinism contract as [[mixBySource]], which uniform
   * `orderBy(rand())` sampling has neither. The selection plans as a
   * heap top-m (`TakeOrderedAndProject`), never a global sort.
   *
   * `u` comes from the top 53 bits of the hash, offset by half a ulp
   * (`(h >>> 11) + 0.5) / 2^53`) so it is strictly inside (0,1) —
   * `ln(0)` can never fire. Output adds `sample_key`.
   */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      m: Int): DataFrame = {
    requireIntegralId(df, idCol)
    df.withColumn("sample_key", sampleKey(df, idCol, weightCol))
      .orderBy(col("sample_key"), col(idCol))
      .limit(m)
  }

  /** Per-group weighted sample: the [[weightedSample]] key ranked
    * WITHIN each group (row_number over (group, key)) — Spark plans
    * the rank filter as a map-side WindowGroupLimit, so each partition
    * keeps at most `perGroup` rows per group before the shuffle.
    * Output adds `sample_key` and `rn`. */
  def weightedSamplePerGroup(df: DataFrame, idCol: String, weightCol: String,
      groupCol: String, perGroup: Int): DataFrame = {
    requireIntegralId(df, idCol)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(col("sample_key"), col(idCol))
    df.withColumn("sample_key", sampleKey(df, idCol, weightCol))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perGroup)
  }

  /** All rows with their sampling key attached — the margin-guard
    * surface for the q98/q99 oracle generators (they need the keys
    * AROUND the selection cut, which [[weightedSample]] discards). */
  private[graft] def withSampleKey(df: DataFrame, idCol: String,
      weightCol: String): DataFrame =
    df.withColumn("sample_key", sampleKey(df, idCol, weightCol))

  /** The Efraimidis–Spirakis key: -ln(uniform(splitmix64(id))) / w.
    * The math requires w > 0; rows with a non-positive, null, or NaN
    * weight get an infinite key — zero inclusion probability (the
    * w -> 0+ limit), never a sample slot — instead of a negative key
    * that would deterministically WIN the sample (w < 0 flips the
    * sign) or a NaN with undefined sort position. */
  private def sampleKey(df: DataFrame, idCol: String,
      weightCol: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.graft.expressions.SplitMix64
    val h = Bridge.column(SplitMix64(Bridge.expression(col(idCol).cast("long"))))
    val u = (shiftrightunsigned(h, 11).cast("double") + lit(0.5)) /
      lit(9007199254740992.0) // 2^53
    val w = col(weightCol).cast("double")
    // isnan guard is load-bearing: Spark's comparison semantics order
    // NaN GREATER than every double, so NaN > 0 is true
    when(w > 0.0 && !isnan(w), -log(u) / w)
      .otherwise(lit(Double.PositiveInfinity))
  }
}
