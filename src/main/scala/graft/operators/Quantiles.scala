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

  /**
   * Multi-column form: exact grouped quantiles for SEVERAL value
   * columns (each with its own fraction list) in SHARED passes. The
   * single-column operator costs 3 scans of the input per column
   * (bounds sweep, counts, selection); at 100 TB the scan is the
   * dominant cost, so k columns melt into one (group, column, value)
   * relation via `posexplode` and every pass runs once: 3 scans total,
   * with the melted shuffles carrying k-fold rows but each row only
   * (string, int, int, double) wide. Selection targets stay per-column
   * (each (group, column) has its own total/ranks), which is the
   * round-5 NOTES design: "bounds/counts share a scan; selections stay
   * per-column".
   *
   * Returns one row per group: (groupCol, `<col>_qs`: array<double>
   * aligned with that column's fractions; null if the column had no
   * non-null values in the group).
   */
  def exactGroupedQuantilesMulti(
      df: DataFrame,
      groupCol: String,
      valueCols: Seq[(String, Seq[Double])],
      numPartitions: Int = 64,
      boundsSampleFraction: Double = 1.0): DataFrame = {
    require(valueCols.nonEmpty, "at least one value column")
    valueCols.foreach { case (c, fs) =>
      require(fs.nonEmpty, s"no fractions for $c")
      require(fs.forall(f => f >= 0.0 && f <= 1.0), s"fractions out of [0,1] for $c")
    }
    val spark = df.sparkSession
    import spark.implicits._

    val k = valueCols.length
    // melt: (g, c, v) — one row per non-null (row, column) pair.
    // Deliberately NOT persisted (see single-column note: the columnar
    // cache write costs ~8x the narrow re-scan it saves; measured).
    val melted = df
      .select(col(groupCol).cast(StringType).as("g"),
        posexplode(array(valueCols.map { case (c, _) => col(c).cast(DoubleType) }: _*))
          .as(Seq("c", "v")))
      .where(col("g").isNotNull && col("v").isNotNull)

    val cutFractions = (1 until numPartitions).map(_.toDouble / numPartitions)
    def sweep(input: DataFrame): Seq[(String, Int, Seq[Double])] =
      input.groupBy("g", "c")
        .agg(percentile_approx(col("v"),
          array(cutFractions.map(lit): _*), lit(1000)).as("bounds"))
        .as[(String, Int, Seq[Double])]
        .collect()
        .toSeq
    val boundRows: Seq[(String, Int, Seq[Double])] =
      if (cutFractions.isEmpty)
        melted.select("g", "c").distinct().as[(String, Int)].collect().toSeq
          .map { case (g, c) => (g, c, Seq.empty[Double]) }
      else if (boundsSampleFraction >= 1.0) sweep(melted)
      else sweep(melted.sample(withReplacement = false, boundsSampleFraction, 42L))
    if (boundRows.isEmpty && boundsSampleFraction >= 1.0) {
      val schema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField(groupCol, StringType) +:
          valueCols.map { case (c, _) =>
            org.apache.spark.sql.types.StructField(s"${c}_qs",
              org.apache.spark.sql.types.ArrayType(DoubleType))
          })
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    val boundsLit = broadcast(boundRows.toDF("g", "c", "bounds"))

    // LEFT join: (group, column) pairs the sampled sweep missed still
    // flow through with one bucket
    val bucketed = melted.join(boundsLit, Seq("g", "c"), "left")
      .withColumn("b", bucketColumn(col("bounds"), col("v")))
      .select("g", "c", "b", "v")

    val counts: Seq[((String, Int), Int, Long)] = bucketed
      .groupBy("g", "c", "b").count()
      .collect()
      .toSeq
      .map(r => ((r.getString(0), r.getInt(1)), r.getInt(2), r.getLong(3)))

    val byKey = counts.groupBy(_._1)
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
    val offsets: Map[(String, Int, Int), Long] = byKey.toSeq.flatMap {
      case (key @ (g, c), rows) =>
        var acc = 0L
        rows.sortBy(_._2).map { case (_, b, cnt) =>
          val o = acc; acc += cnt; ((g, c, b), o)
        }
    }.toMap

    // bucket pruning (see single-column note): only buckets whose rank
    // interval contains a target shuffle into pass B
    val neededBuckets: Seq[(String, Int, Int)] = byKey.toSeq.flatMap {
      case (key @ (g, c), rows) =>
        val want = needed(key)
        var acc = 0L
        rows.sortBy(_._2).flatMap { case (_, b, cnt) =>
          val lo = acc + 1L; acc += cnt
          if (want.exists(r => r >= lo && r <= acc)) Some((g, c, b)) else None
        }
    }
    val prunedBucketed = bucketed.join(
      broadcast(neededBuckets.toDF("g", "c", "b")), Seq("g", "c", "b"), "left_semi")

    // pass B: pure-SQL window selection (see single-column note) —
    // task memory = one pruned (g, c, b) bucket
    val offDf = broadcast(offsets.toSeq
      .map { case ((g, c, b), o) => (g, c, b, o) }.toDF("g", "c", "b", "off"))
    val wantDf = broadcast(needed.toSeq
      .flatMap { case ((g, c), rs) => rs.map(r => (g, c, r)) }.toDF("g", "c", "rank"))
    val wSel = org.apache.spark.sql.expressions.Window
      .partitionBy("g", "c", "b").orderBy("v")
    val selected: Array[(String, Int, Long, Double)] = prunedBucketed
      .withColumn("r", row_number().over(wSel))
      .join(offDf, Seq("g", "c", "b"))
      .withColumn("rank", col("off") + col("r"))
      .join(wantDf, Seq("g", "c", "rank"), "left_semi")
      .select("g", "c", "rank", "v")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))

    val valByRank: Map[(String, Int), Map[Long, Double]] = selected
      .groupBy(r => (r._1, r._2))
      .map { case (key, rows) => key -> rows.map(r => r._3 -> r._4).toMap }
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
   * The two-pass range-selection bounds keep per-task memory at one
   * range partition regardless of group count, so the clip stays a
   * narrow map over a scan at any scale.
   */
  def winsorized(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double, pHi: Double, numPartitions: Int = 32,
      boundsSampleFraction: Double = 0.2): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad bounds ($pLo, $pHi)")
    // Sampled bounds sweep (the q52/q80 setting): boundary error only
    // affects partition balance, never the clip values — the result
    // stays exact. A FULL sweep with the default 64 cut points costs
    // more than the selection it steers (measured ~2/3 of q103's wall
    // at sf10).
    val bounds = broadcast(
      exactGroupedQuantiles(df, groupCol, valueCol, Seq(pLo, pHi),
        numPartitions, boundsSampleFraction)
        .select(col(groupCol).as("__g"),
          element_at(col("qs"), 1).as("__lo"),
          element_at(col("qs"), 2).as("__hi")))
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
