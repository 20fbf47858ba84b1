package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Model-based quality filtering — the GPT-3/CCNet-style classifier
 * gate: a linear classifier over hashed token-count features separates
 * a trusted reference slice (label 1) from the rest of the corpus, and
 * every document is scored by the learned margin. Here: seeded batch
 * logistic regression trained by a driver loop of `iters` full-batch
 * gradient steps (the classic fastText-quality shape, linear over
 * hashing-trick features — Weinberger et al.).
 *
 * Determinism and replayability are designed in, not hoped for:
 *
 *  - Features are INTEGER token counts hashed into `dim` buckets with
 *    the engine's poly-31+splitmix64 string hash ([[org.apache.spark
 *    .sql.graft.expressions.TextHash]]) — the same hash the MinHash
 *    oracles already replay in DuckDB SQL.
 *  - The margin z = bias + Σ_d w_d·x_d evaluates as a STATIC
 *    left-associated expression chain (never a float aggregation over
 *    rows or an unordered map-sum), so both engines compute
 *    bit-identical doubles from the same weights.
 *  - Each document's per-dimension gradient contribution rounds to
 *    6 dp and sums as DECIMAL (the q01/q05 exact-sum rule): the batch
 *    gradient — and therefore the whole training trajectory — is
 *    independent of partitioning and row order. trainLogReg twice on
 *    a repartitioned corpus returns the identical weight vector.
 *  - The prediction is `z >= 0` (⇔ sigmoid(z) >= 0.5), so the oracle
 *    replays scoring with NO transcendental functions at all; sigmoid
 *    only appears inside training, which the oracle generator re-runs
 *    in Scala and dumps as weight literals.
 *
 * Scale shape: one tokenize+hash aggregation builds (doc, bucket,
 * count); the dense feature array is per-doc map assembly (bounded by
 * `dim`); each training step is ONE distributed aggregation of
 * dim+1 exact decimal sums (no driver-side data, only the KB-scale
 * gradient crosses); scoring is a narrow map. At 100 TB the step cost
 * is a corpus scan — `iters` stays small by design (the reference
 * filters trained this way use a handful of epochs).
 */
object QualityClassifier {

  private def stringHashCol(c: Column, seed: Long): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(org.apache.spark.sql.graft.expressions.StringHash64(
      Bridge.expression(c), seed))
  }

  /** Dense hashed token-count features: (id, label, x array<long> of
    * length dim). Bucket = floorMod(stringHash(token, seed), dim). */
  def features(docs: DataFrame, idCol: String, textCol: String,
      labelCol: Column, dim: Int, seed: Long): DataFrame = {
    val perBucket = docs
      .select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .withColumn("b", pmod(stringHashCol(col("tok"), seed), lit(dim.toLong)))
      .groupBy("id", "b").agg(count(lit(1)).as("c"))
      .groupBy("id")
      .agg(map_from_entries(collect_list(struct(col("b"), col("c")))).as("m"))
    docs.select(col(idCol).as("id"), labelCol.cast("double").as("y"))
      .join(perBucket, Seq("id"), "left")
      .select(col("id"), col("y"),
        transform(sequence(lit(0L), lit(dim - 1L)),
          d => coalesce(try_element_at(col("m"), d), lit(0L))).as("x"))
  }

  /** The margin z = bias + Σ w_d·x_d as a STATIC left-associated sum —
    * fixed evaluation order, codegen-friendly, bit-replayable. */
  def marginColumn(weights: Array[Double], bias: Double, x: Column): Column =
    weights.zipWithIndex.foldLeft(lit(bias)) { case (acc, (w, d)) =>
      acc + lit(w) * element_at(x, d + 1)
    }

  /** Seeded full-batch logistic regression; returns (bias, weights).
    * Gradient contributions round to 6 dp and sum as DECIMAL, so the
    * result is exactly partitioning-independent. */
  def trainLogReg(docs: DataFrame, idCol: String, textCol: String,
      labelCol: Column, dim: Int = 64, iters: Int = 5, lr: Double = 1.0,
      seed: Long = 7L, posWeight: Double = 1.0,
      momentum: Double = 0.0): (Double, Array[Double]) = {
    val feats = features(docs, idCol, textCol, labelCol, dim, seed).cache()
    val n = feats.count()
    var bias = 0.0
    var w = Array.fill(dim)(0.0)
    var vBias = 0.0
    val v = Array.fill(dim)(0.0)
    try {
      (1 to iters).foreach { _ =>
        val z = marginColumn(w, bias, col("x"))
        // class-weighted cross-entropy gradient: reference slices are
        // typically a small fraction of the corpus (the 19:1 regime),
        // and unweighted full-batch GD crawls toward the majority
        // class; weighting positive errors by neg/pos restores the
        // balanced decision boundary. Deterministic — the weight is a
        // caller-supplied constant inside the exact decimal sums.
        val wgt = when(col("y") === 1.0, lit(posWeight)).otherwise(lit(1.0))
        // materialize err in a PROJECTION first: inlining it into each
        // of the dim+1 aggregate columns would re-expand the dim-term
        // margin chain per column — O(dim²) codegen that stops
        // compiling around dim 128
        val sums = feats
          .select(col("x"),
            ((lit(1.0) / (lit(1.0) + exp(-z)) - col("y")) * wgt).as("__err"))
          .agg(
            sum(round(col("__err"), 6).cast("decimal(24,6)")).as("g_bias"),
            (0 until dim).map(d =>
              sum(round(col("__err") * element_at(col("x"), d + 1), 6)
                .cast("decimal(24,6)")).as(s"g$d")): _*)
          .collect()(0)
        // heavy-ball momentum (deterministic driver arithmetic):
        // full-batch GD on unnormalized count features is poorly
        // conditioned, and momentum cuts the iteration count ~3x —
        // each saved iteration is one distributed pass at 100 TB
        val gBias = sums.getDecimal(0).doubleValue()
        vBias = momentum * vBias - lr * gBias / n
        bias += vBias
        (0 until dim).foreach { d =>
          v(d) = momentum * v(d) - lr * sums.getDecimal(d + 1).doubleValue() / n
          w(d) = w(d) + v(d)
        }
      }
    } finally feats.unpersist()
    (bias, w)
  }

  /**
   * Closed-form ridge classifier (regularized least squares to ±1
   * targets — the Fisher-discriminant flavor of the linear quality
   * probe): ONE distributed aggregation computes the Gram matrix
   * XᵀX, Xᵀy, ΣX, Σy — every entry an INTEGER sum of count products
   * (exact, order-independent, nothing to round) — and the driver
   * solves the (dim+1)×(dim+1) normal equations with partial-pivot
   * Gaussian elimination (deterministic double arithmetic on exact
   * integer inputs). Class imbalance is handled by TARGETS: y ∈
   * {+n/n₊ for positives, −n/n₋ for negatives} — the class-weighted
   * least squares whose solution is the (regularized) Fisher
   * direction, so a 19:1 reference slice still gets a balanced
   * boundary.
   *
   * Versus [[trainLogReg]]: one corpus scan instead of `iters`
   * (at 100 TB each saved pass is the whole bill), exactly
   * deterministic with NO quantization step at all, and on
   * linearly-separable-ish quality signals the accuracy matches the
   * converged GD. Logistic stays available for calibrated
   * probabilities.
   */
  def trainRidge(docs: DataFrame, idCol: String, textCol: String,
      labelCol: Column, dim: Int = 64, lambda: Double = 1.0,
      seed: Long = 7L): (Double, Array[Double]) = {
    val feats = features(docs, idCol, textCol, labelCol, dim, seed)
    // one imperative aggregate computes every sufficient statistic —
    // see GramMatrix's doc for why this beats dim(dim+3)/2+2 sum()
    // columns (codegen field limit -> interpreted eval, measured 10 s
    // vs sub-second at dim=64)
    val gram = {
      import org.apache.spark.sql.graft.Bridge
      Bridge.column(org.apache.spark.sql.graft.expressions.GramMatrix(
        Bridge.expression(col("x")),
        Bridge.expression(col("y").cast("long")), dim).toAggregateExpression())
    }
    val stats = feats.agg(gram.as("g")).collect()(0).getSeq[Long](0)
    val n = stats(0)
    val nPos = stats(1)
    val nNeg = n - nPos
    require(nPos > 0 && nNeg > 0, "ridge probe needs both classes present")
    // class-balanced targets: +n/nPos, -n/nNeg
    val tPos = n.toDouble / nPos
    val tNeg = -n.toDouble / nNeg
    val m = dim + 1 // intercept first
    val a = Array.ofDim[Double](m, m)
    val b = new Array[Double](m)
    a(0)(0) = n + lambda
    b(0) = nPos * tPos + nNeg * tNeg // = 0 by construction, kept explicit
    (0 until dim).foreach { d =>
      val sd = stats(2 + d)
      a(0)(d + 1) = sd; a(d + 1)(0) = sd
      val syd = stats(2 + dim + d) // Σ x_d over positives
      // Σ x_d·t = syd·tPos + (sd − syd)·tNeg
      b(d + 1) = syd * tPos + (sd - syd) * tNeg
    }
    var idx = 2 + 2 * dim
    for (d <- 0 until dim; e <- d until dim) {
      val g = stats(idx); idx += 1
      a(d + 1)(e + 1) = g; a(e + 1)(d + 1) = g
      if (d == e) a(d + 1)(e + 1) += lambda
    }
    val sol = solve(a, b)
    (sol(0), sol.drop(1))
  }

  /** Gaussian elimination with partial pivoting — deterministic given
    * identical inputs (which the integer sums guarantee). */
  private def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val m = b0.length
    val a = a0.map(_.clone())
    val b = b0.clone()
    (0 until m).foreach { c =>
      var p = c
      ((c + 1) until m).foreach(r => if (math.abs(a(r)(c)) > math.abs(a(p)(c))) p = r)
      val t = a(c); a(c) = a(p); a(p) = t
      val tb = b(c); b(c) = b(p); b(p) = tb
      require(a(c)(c) != 0.0, "singular normal equations — raise lambda")
      ((c + 1) until m).foreach { r =>
        val f = a(r)(c) / a(c)(c)
        if (f != 0.0) {
          (c until m).foreach(k => a(r)(k) -= f * a(c)(k))
          b(r) -= f * b(c)
        }
      }
    }
    val x = new Array[Double](m)
    (m - 1 to 0 by -1).foreach { r =>
      var s = b(r)
      ((r + 1) until m).foreach(k => s -= a(r)(k) * x(k))
      x(r) = s / a(r)(r)
    }
    x
  }

  /** Score every document with trained weights: (id, x, z rounded to
    * 6 dp, pred = z >= 0). `pred` derives from the UNROUNDED margin —
    * exact on both engines because z is a fixed-order double chain. */
  def score(docs: DataFrame, idCol: String, textCol: String,
      labelCol: Column, bias: Double, weights: Array[Double],
      dim: Int = 64, seed: Long = 7L): DataFrame = {
    val feats = features(docs, idCol, textCol, labelCol, dim, seed)
    val z = marginColumn(weights, bias, col("x"))
    feats.select(col("id"), col("y"),
      round(z, 6).as("z"), (z >= 0).as("pred"))
  }
}
