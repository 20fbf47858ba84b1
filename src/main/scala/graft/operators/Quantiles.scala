package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/**
 * Distributed EXACT grouped quantiles via two-pass range-partitioned
 * rank selection (the TeraSort-style selection plan).
 *
 * Why not `percentile()`: Spark's exact percentile aggregate buffers
 * every value of a group inside one aggregation buffer — a per-task
 * OOM once a single group is billions of rows. Why not a window rank:
 * `row_number().over(partitionBy(group))` materializes the whole group
 * in ONE task — the same wall, shuffled.
 *
 * This plan's per-task memory is one *range partition*, independent of
 * group size:
 *
 *  0. A `percentile_approx` sweep computes per-group approximately
 *     equi-probable cut points, collected to the driver and re-emitted
 *     as a LITERAL boundary table. (Why not `repartitionByRange`: its
 *     RangePartitioner seeds sampling with the RDD id, which changes
 *     per job — two jobs over the same plan land different boundaries;
 *     measured, not theorized. A literal table makes every downstream
 *     pass a pure deterministic function of the data.)
 *  1. Each row gets `bucket = #boundaries < value` via a broadcast
 *     join with the literal table — codegen'd, no UDF, no shuffle.
 *     Bucket sizes are ~n_g/P regardless of skew in group sizes.
 *  2. Pass A counts rows per (group, bucket) — map-side partial
 *     aggregation, so only |groups| x P tiny rows shuffle. Prefix
 *     sums in bucket order give each (group, bucket) its global rank
 *     offset; group totals give the target ranks floor/ceil((n-1)*f)+1
 *     for each fraction f (the `quantile_cont` positions).
 *  3. Pass B first PRUNES to the buckets whose rank interval contains
 *     a target (pass A's counts make this exact): at most
 *     |fractions| x 2 buckets per group — ~n/P rows each — shuffle,
 *     not the whole relation. The survivors hash-repartition by
 *     (group, bucket), sort within partitions by (group, bucket,
 *     value), and stream once, emitting ONLY the rows whose global
 *     rank (offset + local index) is a target — at most
 *     |groups| x |fractions| x 2 rows leave the executors.
 *  4. Linear interpolation on those few rows on the driver.
 *
 * Driver state is |groups| x P boundaries/counts plus the selected
 * rows — this is a grouped-quantile operator, so |groups| is assumed
 * driver-small (the usual case: report dimensions), while values per
 * group are unbounded. The boundary sketch only steers partition
 * BALANCE; the result is exact whatever the sketch error. The 100 TB
 * constant-memory alternative with bounded rank error is
 * `percentile_approx` (q69); this operator is the exact path that
 * stays hash-identical to a single-node oracle.
 *
 * Reference behavior: percentile aggregations over chunk metadata
 * (reference app/api analytics endpoints compute exact order
 * statistics single-node); re-expressed here as a distributed plan.
 */
object Quantiles {

  /** bucket = #bounds strictly below v — a codegen'd binary search
    * ([[org.apache.spark.sql.graft.expressions.SortedLowerBound]]).
    * The equivalent `size(filter(bounds, x -> v > x))` runs an
    * interpreted lambda per element: measured ~1 s per million rows
    * at P=32, which dominated the whole operator. LEFT-join misses
    * (a group the sampled sweep never saw) fall back to one bucket. */
  private def bucketColumn(bounds: org.apache.spark.sql.Column,
      v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(org.apache.spark.sql.graft.expressions.SortedLowerBound(
      Bridge.expression(coalesce(bounds, array().cast("array<double>"))),
      Bridge.expression(v)))
  }

  /**
   * Exact `quantile_cont`-semantics quantiles of `valueCol` per
   * `groupCol`. Returns one row per group: (groupCol: string,
   * qs: array<double> aligned with `fractions`). Null values are
   * excluded (aggregate semantics); null group keys form their own
   * group only if present in the data as SQL would not — callers
   * filter nulls upstream if they need ANSI GROUP BY null handling.
   */
  def exactGroupedQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      fractions: Seq[Double],
      numPartitions: Int = 64,
      boundsSampleFraction: Double = 1.0): DataFrame = {
    require(fractions.nonEmpty, "at least one fraction")
    require(fractions.forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must be in [0,1], got $fractions")
    val spark = df.sparkSession
    import spark.implicits._

    // deliberately NOT persisted: the slim projection is recomputed per
    // pass. Measured at sf0.1: the columnar cache materialization costs
    // ~8x the narrow 2-column re-scan it saves (2.0 s write vs 0.25 s
    // recompute) — pruned scans beat caching here. A caller whose
    // upstream `df` is expensive to recompute should persist it.
    val slim = df
      .select(col(groupCol).cast(StringType).as("g"),
        col(valueCol).cast(DoubleType).as("v"))
      .where(col("v").isNotNull && col("g").isNotNull)

    // Pass 0: per-group approximate equi-probable cut points, collected
    // and re-emitted as a literal table so every later pass is a pure
    // deterministic function of the input (see scaladoc). The sweep may
    // run on a seeded SAMPLE (boundsSampleFraction < 1): boundary error
    // only affects partition BALANCE, never the result, and groups the
    // sample missed fall back to one bucket via the left join below.
    val cutFractions = (1 until numPartitions).map(_.toDouble / numPartitions)
    def sweep(input: DataFrame): Seq[(String, Seq[Double])] =
      input.groupBy("g")
        .agg(percentile_approx(col("v"),
          array(cutFractions.map(lit): _*), lit(1000)).as("bounds"))
        .as[(String, Seq[Double])]
        .collect()
        .toSeq
    val boundRows: Seq[(String, Seq[Double])] =
      if (cutFractions.isEmpty)
        slim.select("g").distinct().as[String].collect().toSeq
          .map(g => (g, Seq.empty[Double]))
      else if (boundsSampleFraction >= 1.0) sweep(slim)
      else sweep(slim.sample(withReplacement = false, boundsSampleFraction, 42L))
    if (boundRows.isEmpty && boundsSampleFraction >= 1.0)
      return boundRows.toDF(groupCol, "qs")
    val boundsLit = broadcast(boundRows.toDF("g", "bounds"))

    // bucket = number of cut points strictly below v: monotone in v,
    // so global rank composes as (rows in lower buckets) + local rank.
    // LEFT join + empty-array fallback: a group the sampled sweep never
    // saw still flows through (all its rows land in bucket 0).
    val bucketed = slim.join(boundsLit, Seq("g"), "left")
      .withColumn("b", bucketColumn(col("bounds"), col("v")))
      .select("g", "b", "v")

    // Pass A: per-(group, bucket) counts — map-side combine, tiny shuffle.
    val counts: Seq[(String, Int, Long)] = bucketed
      .groupBy("g", "b").count()
      .collect()
      .toSeq
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))

    val byGroup = counts.groupBy(_._1)
    val totals: Map[String, Long] =
      byGroup.map { case (g, rows) => g -> rows.map(_._3).sum }
    // Target 1-based global ranks per group for quantile_cont at each
    // fraction: the values at floor(k)+1 and ceil(k)+1 where k=(n-1)*f.
    val needed: Map[String, Set[Long]] = totals.map { case (g, n) =>
      g -> fractions.flatMap { f =>
        val k = (n - 1) * f
        Seq(math.floor(k).toLong + 1L, math.ceil(k).toLong + 1L)
      }.toSet
    }
    val offsets: Map[(String, Int), Long] = byGroup.toSeq.flatMap {
      case (g, rows) =>
        var acc = 0L
        rows.sortBy(_._2).map { case (_, b, c) =>
          val o = acc; acc += c; ((g, b), o)
        }
    }.toMap

    // Bucket pruning: pass A told us each bucket's global rank interval
    // (offset, offset+count], so only buckets CONTAINING a target rank
    // need to shuffle — at most |fractions| x 2 buckets per group
    // (~rows/P each) instead of the whole relation. This is the term
    // that dominates pass B at scale.
    val neededBuckets: Seq[(String, Int)] = byGroup.toSeq.flatMap {
      case (g, rows) =>
        val want = needed(g)
        var acc = 0L
        rows.sortBy(_._2).flatMap { case (_, b, c) =>
          val lo = acc + 1L; acc += c
          if (want.exists(r => r >= lo && r <= acc)) Some((g, b)) else None
        }
    }
    val prunedBucketed = bucketed.join(
      broadcast(neededBuckets.toDF("g", "b")), Seq("g", "b"), "left_semi")

    // Pass B: selection — pure SQL, fully codegen'd (a typed
    // mapPartitions here measured ~6x slower from the Encoder
    // round-trip). The window partitions by (group, BUCKET), so a task
    // holds one pruned bucket (~n/P rows) — same memory bound as the
    // sort-based formulation; global rank = bucket offset + local
    // row_number; ties in v are interchangeable for value-at-rank.
    val offDf = broadcast(offsets.toSeq
      .map { case ((g, b), o) => (g, b, o) }.toDF("g", "b", "off"))
    val wantDf = broadcast(needed.toSeq
      .flatMap { case (g, rs) => rs.map(r => (g, r)) }.toDF("g", "rank"))
    val wSel = org.apache.spark.sql.expressions.Window
      .partitionBy("g", "b").orderBy("v")
    val selected: Array[(String, Long, Double)] = prunedBucketed
      .withColumn("r", row_number().over(wSel))
      .join(offDf, Seq("g", "b"))
      .withColumn("rank", col("off") + col("r"))
      .join(wantDf, Seq("g", "rank"), "left_semi")
      .select("g", "rank", "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))

    val valByRank: Map[String, Map[Long, Double]] = selected
      .groupBy(_._1)
      .map { case (g, rows) => g -> rows.map(r => r._2 -> r._3).toMap }
    val out = totals.toSeq.sortBy(_._1).map { case (g, n) =>
      val ranks = valByRank(g)
      val qs = fractions.map { f =>
        val k = (n - 1) * f
        val vl = ranks(math.floor(k).toLong + 1L)
        val vh = ranks(math.ceil(k).toLong + 1L)
        vl + (vh - vl) * (k - math.floor(k))
      }
      (g, qs)
    }
    out.toDF(groupCol, "qs")
  }

  /** bucket = top-`bits` order-preserving bit prefix of v — exact
    * monotone bucketing with NO data-dependent bounds (see
    * [[org.apache.spark.sql.graft.expressions.OrderedDoubleBucket]]). */
  private def orderedBucketColumn(v: org.apache.spark.sql.Column,
      bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(org.apache.spark.sql.graft.expressions.OrderedDoubleBucket(
      Bridge.expression(v), bits))
  }

  /**
   * Multi-column form: exact grouped quantiles for SEVERAL value
   * columns (each with its own fraction list) in SHARED passes — and,
   * unlike the single-column operator, only TWO scans of the input
   * total (vs 3 per column), because the bucketing needs no prior
   * bounds sweep at all:
   *
   *  1. Pass A buckets every value by the top `bucketBits` bits of its
   *     order-preserving IEEE-754 bit pattern (an EXACT monotone,
   *     data-independent function — no percentile_approx sketch, no
   *     sampling, no literal boundary table) and counts
   *     (group, column, bucket, count, min, max) — map-side combine,
   *     tiny shuffle. Prefix sums in bucket order give global rank
   *     offsets exactly as in the range-partitioned form.
   *  2. Buckets whose rank interval contains a target AND hold a
   *     single distinct value (min == max — always true for discrete
   *     data once buckets are finer than value spacing) resolve ON THE
   *     DRIVER with no second pass. Only mixed-value target buckets —
   *     at most |fractions| x 2 per (group, column) — go to pass B's
   *     windowed selection; when none exist the operator is ONE scan.
   *
   * k columns melt into one (group, column, value) relation via
   * `posexplode`, so each pass runs once for all columns. Driver state
   * is the histogram: |groups| x k x (distinct buckets), bounded by
   * 2^bucketBits per (group, column) and in practice by the data's
   * octave span x 2^(bucketBits-12) (default 20 bits = 256 buckets
   * per power-of-two range; values in one bucket differ by < 0.4%).
   *
   * Skew safety — ADAPTIVE REFINEMENT: continuous data concentrated
   * inside one bucket's <0.4% relative spread would make a mixed
   * target bucket ≈ the whole group, and pass B's per-bucket sort a
   * single n·log n task (measured: 55 s for 20M such rows vs 2.7 s
   * for the range-partitioned form). Pass A's counts are exact, so
   * the driver KNOWS each mixed target bucket's size before pass B:
   * buckets over `maxBucketRows` are re-histogrammed at +12 bits
   * (4096x finer), recursively, terminating at 64 bits where a bucket
   * IS one distinct double (min == max, resolves driver-side). Each
   * round is one scan pruned to the offending buckets; ≤4 rounds from
   * the default 20 bits. Typical multi-octave data never triggers a
   * round; the adversarial shape above costs 2 extra scans and runs
   * in ~6.5 s instead of 55 (QuantProbe, 20M rows; the range-
   * partitioned form's adaptive bounds do the same in ~2.6 s — the
   * measured reason [[exactGroupedQuantiles]] stays the right call
   * for data KNOWN to be pathologically concentrated). Driver state
   * bounded: each round collects ≤ 2^12 x (oversized target buckets)
   * histogram rows, never a full fine-grained histogram.
   *
   * Returns one row per group: (groupCol, `<col>_qs`: array<double>
   * aligned with that column's fractions; null if the column had no
   * non-null values in the group). Bit-identical to the single-column
   * operator for any bucketBits / maxBucketRows — bucketing only
   * steers WHERE the selection work lands, never the result.
   */
  def exactGroupedQuantilesMulti(
      df: DataFrame,
      groupCol: String,
      valueCols: Seq[(String, Seq[Double])],
      bucketBits: Int = 20,
      maxBucketRows: Long = 4L << 20): DataFrame = {
    require(valueCols.nonEmpty, "at least one value column")
    require(bucketBits >= 1 && bucketBits <= 64,
      s"bucketBits must be in [1,64], got $bucketBits")
    require(maxBucketRows >= 1, s"maxBucketRows must be positive, got $maxBucketRows")
    valueCols.foreach { case (c, fs) =>
      require(fs.nonEmpty, s"no fractions for $c")
      require(fs.forall(f => f >= 0.0 && f <= 1.0), s"fractions out of [0,1] for $c")
    }
    val spark = df.sparkSession
    import spark.implicits._

    val k = valueCols.length
    // melt: (g, c, v) — one row per non-null (row, column) pair.
    // Deliberately NOT persisted (see single-column note: the columnar
    // cache write costs ~8x the narrow 2-column re-scan it saves;
    // measured) — and with the driver-resolved fast path pass B usually
    // reads nothing or a few buckets, so there is little to reuse.
    val melted = df
      .select(col(groupCol).cast(StringType).as("g"),
        posexplode(array(valueCols.map { case (c, _) => col(c).cast(DoubleType) }: _*))
          .as(Seq("c", "v")))
      .where(col("g").isNotNull && col("v").isNotNull)

    val bucketed = melted
      .withColumn("b", orderedBucketColumn(col("v"), bucketBits))
      .select("g", "c", "b", "v")

    // Pass A: exact histogram — (g, c, bucket) -> (count, min, max)
    val hist: Seq[((String, Int), Long, Long, Double, Double)] = bucketed
      .groupBy("g", "c", "b")
      .agg(count(col("v")).as("cnt"), min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect()
      .toSeq
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))

    if (hist.isEmpty) {
      val schema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField(groupCol, StringType) +:
          valueCols.map { case (c, _) =>
            org.apache.spark.sql.types.StructField(s"${c}_qs",
              org.apache.spark.sql.types.ArrayType(DoubleType))
          })
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

    val byKey = hist.groupBy(_._1)
    val totals: Map[(String, Int), Long] =
      byKey.map { case (key, rows) => key -> rows.map(_._3).sum }
    val fractionsOf: Map[Int, Seq[Double]] =
      valueCols.zipWithIndex.map { case ((_, fs), i) => i -> fs }.toMap
    val needed: Map[(String, Int), Set[Long]] = totals.map { case (key @ (_, c), n) =>
      key -> fractionsOf(c).flatMap { f =>
        val t = (n - 1) * f
        Seq(math.floor(t).toLong + 1L, math.ceil(t).toLong + 1L)
      }.toSet
    }

    // Walk each key's buckets in rank order: a target rank inside a
    // single-valued bucket (min == max) resolves immediately; a target
    // inside a small-enough mixed bucket marks it for pass B (tagged
    // with the bit width its id was computed at); an OVERSIZED mixed
    // target bucket goes to the refinement worklist instead of handing
    // pass B an unbounded single-task sort.
    val resolved = scala.collection.mutable.Map.empty[(String, Int, Long), Double]
    // (bits, g, c, bucket, rank offset)
    val passB = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Int, Long, Long)]
    // (g, c, bucket at current bits, rank offset, target ranks inside)
    var refine = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Long, Long, Set[Long])]

    def classify(bits: Int, g: String, c: Int, b: Long, off: Long, cnt: Long,
        mn: Double, mx: Double, hits: Set[Long]): Unit =
      // NaN guard: an all-NaN bucket has mn == mx false (NaN != NaN)
      // but is single-valued for rank purposes; and bits == 64 can
      // never refine further, so it must fall through to pass B.
      if (mn == mx || (mn.isNaN && mx.isNaN))
        hits.foreach(r => resolved((g, c, r)) = mn)
      else if (cnt <= maxBucketRows || bits >= 64) passB += ((bits, g, c, b, off))
      else refine += ((g, c, b, off, hits))

    byKey.foreach { case (key @ (g, c), rows) =>
      val want = needed(key)
      var acc = 0L
      rows.sortBy(_._2).foreach { case (_, b, cnt, mn, mx) =>
        val lo = acc + 1L
        val off = acc
        acc += cnt
        val hits = want.filter(r => r >= lo && r <= acc)
        if (hits.nonEmpty) classify(bucketBits, g, c, b, off, cnt, mn, mx, hits)
      }
    }

    // Refinement rounds: re-histogram ONLY the oversized target
    // buckets at +12 bits per round. Terminates: at 64 bits a bucket
    // is one distinct bit pattern, so min == max and every target
    // resolves on the driver. Each round is one pruned scan; the
    // collected histogram is ≤ 4096 x |worklist| rows.
    var prevBits = bucketBits
    while (refine.nonEmpty) {
      val curBits = math.min(64, prevBits + 12)
      val shift = curBits - prevBits
      val work = refine
      refine = scala.collection.mutable.ArrayBuffer.empty
      val parents = broadcast(
        work.toSeq.map { case (g, c, b, _, _) => (g, c, b) }.toDF("g", "c", "pb"))
      val fineHist: Map[(String, Int, Long), Seq[(Long, Long, Double, Double)]] = melted
        .withColumn("pb", orderedBucketColumn(col("v"), prevBits))
        .join(parents, Seq("g", "c", "pb"), "left_semi")
        .withColumn("b", orderedBucketColumn(col("v"), curBits))
        .groupBy("g", "c", "b")
        .agg(count(col("v")).as("cnt"), min(col("v")).as("mn"), max(col("v")).as("mx"))
        .collect()
        .toSeq
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5)))
        .groupBy { case (g, c, b, _, _, _) => (g, c, b >> shift) }
        .map { case (k, rows) =>
          k -> rows.map { case (_, _, b, cnt, mn, mx) => (b, cnt, mn, mx) }
        }
      work.foreach { case (g, c, pb, off, want) =>
        var acc = off
        fineHist((g, c, pb)).sortBy(_._1).foreach { case (b, cnt, mn, mx) =>
          val lo = acc + 1L
          val boff = acc
          acc += cnt
          val hits = want.filter(r => r >= lo && r <= acc)
          if (hits.nonEmpty) classify(curBits, g, c, b, boff, cnt, mn, mx, hits)
        }
      }
      prevBits = curBits
    }

    // Pass B (skipped entirely when every target bucket was single-
    // valued): semi-join down to the few mixed target buckets, sort
    // each within its own task, emit only the target-rank rows. Task
    // memory = one bucket — now ≤ maxBucketRows by construction. Runs
    // once per distinct bit width (one, unless refinement fired).
    val wantDf = broadcast(needed.toSeq
      .flatMap { case ((g, c), rs) => rs.map(r => (g, c, r)) }.toDF("g", "c", "rank"))
    val selected: Array[(String, Int, Long, Double)] =
      passB.toSeq.groupBy(_._1).toSeq.flatMap { case (bits, entries) =>
        val bucketedAt =
          if (bits == bucketBits) bucketed
          else melted.withColumn("b", orderedBucketColumn(col("v"), bits))
            .select("g", "c", "b", "v")
        val prunedBucketed = bucketedAt.join(
          broadcast(entries.map { case (_, g, c, b, _) => (g, c, b) }.toDF("g", "c", "b")),
          Seq("g", "c", "b"), "left_semi")
        val offDf = broadcast(
          entries.map { case (_, g, c, b, o) => (g, c, b, o) }.toDF("g", "c", "b", "off"))
        val wSel = org.apache.spark.sql.expressions.Window
          .partitionBy("g", "c", "b").orderBy("v")
        prunedBucketed
          .withColumn("r", row_number().over(wSel))
          .join(offDf, Seq("g", "c", "b"))
          .withColumn("rank", col("off") + col("r"))
          .join(wantDf, Seq("g", "c", "rank"), "left_semi")
          .select("g", "c", "rank", "v")
          .collect()
          .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      }.toArray

    val valByRank: Map[(String, Int), Map[Long, Double]] = {
      val fromPassB = selected.toSeq
        .map { case (g, c, r, v) => ((g, c), r, v) }
      val fromDriver = resolved.toSeq
        .map { case ((g, c, r), v) => ((g, c), r, v) }
      (fromPassB ++ fromDriver)
        .groupBy(_._1)
        .map { case (key, rows) => key -> rows.map(r => r._2 -> r._3).toMap }
    }
    val groups = totals.keys.map(_._1).toSeq.distinct.sorted
    val rows = groups.map { g =>
      val qsPerCol: Seq[Seq[Double]] = (0 until k).map { c =>
        totals.get((g, c)) match {
          case Some(n) =>
            val ranks = valByRank((g, c))
            fractionsOf(c).map { f =>
              val t = (n - 1) * f
              val vl = ranks(math.floor(t).toLong + 1L)
              val vh = ranks(math.ceil(t).toLong + 1L)
              vl + (vh - vl) * (t - math.floor(t))
            }
          case None => null
        }
      }
      org.apache.spark.sql.Row.fromSeq(g +: qsPerCol)
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(groupCol, StringType) +:
        valueCols.map { case (c, _) =>
          org.apache.spark.sql.types.StructField(s"${c}_qs",
            org.apache.spark.sql.types.ArrayType(DoubleType))
        })
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
  /**
   * Winsorization — outlier clipping at per-group exact quantile
   * bounds (the data-cleaning step before norm-sensitive training
   * statistics): values below the `pLo` quantile clamp up to it,
   * values above `pHi` clamp down. Bounds come from
   * [[exactGroupedQuantiles]] (quantile_cont semantics, the
   * engine-matched form q52/q80 pin) broadcast back onto the rows —
   * a dimension-sized join, no second wide shuffle. Output adds
   * `<valueCol>_w` (clipped), `__lo`, `__hi`.
   *
   * Scale note: the bounds deliberately do NOT use Spark's exact
   * `percentile` aggregate — it buffers a per-group value->count map
   * whose final merge lands on |groups| reducers, and with few groups
   * over many rows those maps reach millions of entries each (the sf10
   * probe measured 18.5x wall for 10x data on exactly that plan).
   * Bounds come from the bit-prefix histogram selection
   * ([[exactGroupedQuantilesMulti]] with one column — 2 scans, often
   * 1), which keeps per-task memory at one histogram bucket regardless
   * of group count, so the clip stays a narrow map over a scan at any
   * scale.
   */
  def winsorized(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double, pHi: Double, bucketBits: Int = 20): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad bounds ($pLo, $pHi)")
    val bounds = broadcast(
      exactGroupedQuantilesMulti(df, groupCol,
        Seq(valueCol -> Seq(pLo, pHi)), bucketBits)
        .select(col(groupCol).as("__g"),
          element_at(col(s"${valueCol}_qs"), 1).as("__lo"),
          element_at(col(s"${valueCol}_qs"), 2).as("__hi")))
    // LEFT join on the string-cast key: a group whose values are all
    // null has no bounds row (the exact path drops null values) but its
    // rows still flow through with null __lo/__hi/_w, matching the old
    // percentile-aggregate behavior.
    df.join(bounds, df(groupCol).cast(StringType) === col("__g"), "left")
      .drop("__g")
      .withColumn(valueCol + "_w",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
  }

}
