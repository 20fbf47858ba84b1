package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantiles

/**
 * Differential tests for the two-pass distributed exact quantile
 * against Spark's own exact `percentile` aggregate (which implements
 * the same quantile_cont interpolation), across partition counts that
 * force groups to span many range partitions.
 */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val fractions = Seq(0.0, 0.25, 0.5, 0.9, 1.0)

  private def viaPercentile(df: org.apache.spark.sql.DataFrame,
      g: String, v: String): Map[String, Seq[Double]] =
    df.groupBy(col(g).cast("string").as("g"))
      .agg(percentile(col(v).cast("double"),
        array(fractions.map(lit): _*)).as("qs"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toSeq)
      .toMap

  private def via2p(df: org.apache.spark.sql.DataFrame,
      g: String, v: String, parts: Int): Map[String, Seq[Double]] =
    Quantiles.exactGroupedQuantiles(df, g, v, fractions, parts)
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toSeq)
      .toMap

  private def assertSame(a: Map[String, Seq[Double]],
      b: Map[String, Seq[Double]]): Unit = {
    assert(a.keySet == b.keySet)
    for (g <- a.keySet; i <- fractions.indices)
      assert(math.abs(a(g)(i) - b(g)(i)) < 1e-9,
        s"group $g fraction ${fractions(i)}: ${a(g)(i)} vs ${b(g)(i)}")
  }

  test("matches exact percentile() on seeded multi-group data") {
    // Deterministic pseudo-random values, 5 groups x 4000 rows —
    // with 16 range partitions every group spans several partitions.
    val df = spark.range(20000)
      .select((col("id") % 5).cast("string").as("g"),
        pmod(hash(col("id")), lit(100000)).cast("double").as("v"))
    assertSame(viaPercentile(df, "g", "v"), via2p(df, "g", "v", 16))
  }

  test("matches on lineitem at sf0.001 across partition counts") {
    val li = queries.Tables.table(spark, sfDir, "lineitem")
    val exact = viaPercentile(li, "l_returnflag", "l_extendedprice")
    for (parts <- Seq(1, 7, 32))
      assertSame(exact, via2p(li, "l_returnflag", "l_extendedprice", parts))
  }

  test("single-row group, constant group, and duplicate values") {
    val df = Seq(
      ("solo", 42.0),
      ("const", 7.0), ("const", 7.0), ("const", 7.0),
      ("dups", 1.0), ("dups", 1.0), ("dups", 2.0), ("dups", 2.0),
      ("dups", 3.0)).toDF("g", "v")
    assertSame(viaPercentile(df, "g", "v"), via2p(df, "g", "v", 8))
  }

  test("nulls are excluded like the aggregate") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)))
      .toDF("g", "v")
    val got = via2p(df, "g", "v", 4)
    // 2 non-null values {1,3}: median = 2.0, p0 = 1.0, p100 = 3.0
    assert(math.abs(got("a")(2) - 2.0) < 1e-9)
    assert(math.abs(got("a")(0) - 1.0) < 1e-9)
    assert(math.abs(got("a")(4) - 3.0) < 1e-9)
  }

  // --- multi-column shared passes ---

  private def viaMulti(df: org.apache.spark.sql.DataFrame, g: String,
      cols: Seq[(String, Seq[Double])], bits: Int): Map[String, Seq[Seq[Double]]] =
    Quantiles.exactGroupedQuantilesMulti(df, g, cols, bits)
      .collect()
      .map(r => r.getString(0) ->
        cols.indices.map(i => Option(r.getSeq[Double](i + 1)).map(_.toSeq).orNull))
      .toMap

  test("multi-column equals per-column single runs on lineitem") {
    val li = queries.Tables.table(spark, sfDir, "lineitem")
    val cols = Seq("l_quantity" -> fractions, "l_extendedprice" -> fractions)
    val multi = viaMulti(li, "l_returnflag", cols, 16)
    for ((c, fs) <- cols) {
      val single = Quantiles.exactGroupedQuantiles(li, "l_returnflag", c, fs, 16)
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toSeq).toMap
      val idx = cols.indexWhere(_._1 == c)
      assert(single.keySet == multi.keySet)
      for (g <- single.keySet; i <- fs.indices)
        assert(math.abs(single(g)(i) - multi(g)(idx)(i)) < 1e-9,
          s"col $c group $g fraction ${fs(i)}")
    }
  }

  test("multi-column: per-column fractions and bucket-granularity invariance") {
    val df = spark.range(9000)
      .select((col("id") % 3).cast("string").as("g"),
        pmod(hash(col("id")), lit(1000)).cast("double").as("a"),
        pmod(hash(col("id") * 7), lit(500)).cast("double").as("b"))
    val cols = Seq("a" -> Seq(0.5), "b" -> Seq(0.1, 0.9))
    // 8 bits = huge mixed buckets (pass B does the work); 32 bits =
    // near-singleton buckets (driver resolves most targets): the
    // bucketing must never change the answer
    val r8 = viaMulti(df, "g", cols, 8)
    val r32 = viaMulti(df, "g", cols, 32)
    assert(r8 == r32)
    // spot-check vs percentile()
    val exact = df.groupBy("g")
      .agg(percentile(col("a"), lit(0.5)).as("am"),
        percentile(col("b"), array(lit(0.1), lit(0.9))).as("bq"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getSeq[Double](2).toSeq))
      .toMap
    for ((g, (am, bq)) <- exact) {
      assert(math.abs(r8(g)(0)(0) - am) < 1e-9)
      for (i <- bq.indices) assert(math.abs(r8(g)(1)(i) - bq(i)) < 1e-9)
    }
  }

  test("sampled bounds sweep changes nothing but balance: results identical") {
    val li = queries.Tables.table(spark, sfDir, "lineitem")
    val full = Quantiles.exactGroupedQuantiles(li, "l_returnflag",
      "l_extendedprice", fractions, 16)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toSeq).toMap
    for (frac <- Seq(0.2, 0.01)) { // 0.01 on sf0.001 ≈ tens of rows
      val sampled = Quantiles.exactGroupedQuantiles(li, "l_returnflag",
        "l_extendedprice", fractions, 16, boundsSampleFraction = frac)
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toSeq).toMap
      assertSame(full, sampled)
    }
    // multi-column path: deterministic, and bit-identical across
    // bucket granularities including the coarse extreme (4 bits =
    // sign + 3 exponent bits, nearly everything in one mixed bucket)
    val cols = Seq("l_quantity" -> fractions, "l_extendedprice" -> fractions)
    assert(viaMulti(li, "l_returnflag", cols, 16) ==
      viaMulti(li, "l_returnflag", cols, 16) // determinism of the call
    )
    val m1 = Quantiles.exactGroupedQuantilesMulti(li, "l_returnflag", cols, 16)
      .collect().map(_.toString).sorted.toSeq
    val m2 = Quantiles.exactGroupedQuantilesMulti(li, "l_returnflag", cols, 4)
      .collect().map(_.toString).sorted.toSeq
    val m3 = Quantiles.exactGroupedQuantilesMulti(li, "l_returnflag", cols)
      .collect().map(_.toString).sorted.toSeq
    assert(m1 == m2)
    assert(m1 == m3)
  }

  test("adaptive refinement: concentrated continuous data, forced rounds") {
    // 9000 values inside a 1e-9 relative spread: ONE bucket at 20 bits
    // (resolution ~0.4%/256... any coarse prefix), so a tiny
    // maxBucketRows forces multiple +12-bit refinement rounds. The
    // result must be identical with refinement forced, disabled
    // (Long.MaxValue cap sends the giant mixed bucket to pass B), and
    // to percentile().
    val df = spark.range(9000)
      .select(lit("g").as("g"),
        (lit(1.0) + pmod(hash(col("id")), lit(9000)).cast("double") * lit(1e-13)).as("v"))
    val fs = Seq(0.1, 0.5, 0.9)
    def run(cap: Long): Seq[Double] =
      Quantiles.exactGroupedQuantilesMulti(df, "g", Seq("v" -> fs), 20, maxBucketRows = cap)
        .collect()(0).getSeq[Double](1).toSeq
    val forced = run(16L)             // every mixed bucket refines
    val mild = run(1000L)             // refines then lands in pass B
    val off = run(Long.MaxValue)      // old behavior: one giant pass-B sort
    val exact = df.groupBy("g")
      .agg(percentile(col("v"), array(fs.map(lit): _*)).as("qs"))
      .collect()(0).getSeq[Double](1).toSeq
    for (i <- fs.indices) {
      assert(forced(i) == off(i), s"fraction ${fs(i)}: $forced vs $off")
      assert(mild(i) == off(i))
      assert(math.abs(forced(i) - exact(i)) < 1e-15)
    }
  }

  test("adaptive refinement: duplicate-heavy and NaN-free termination at 64 bits") {
    // values with massive duplication: refinement bottoms out at 64
    // bits where min == max resolves on the driver even though the
    // bucket count never drops under the cap
    val df = spark.range(5000)
      .select(lit("g").as("g"), (col("id") % 3).cast("double").as("v"))
    val got = Quantiles.exactGroupedQuantilesMulti(
        df, "g", Seq("v" -> Seq(0.5)), 4, maxBucketRows = 10L)
      .collect()(0).getSeq[Double](0 + 1)
    val exact = df.groupBy("g").agg(percentile(col("v"), lit(0.5)).as("m"))
      .collect()(0).getDouble(1)
    assert(got(0) == exact)
  }

  test("multi-column: all-null column in one group yields null qs") {
    val df = Seq(
      ("a", Some(1.0), Some(10.0)), ("a", Some(2.0), Some(20.0)),
      ("b", Some(5.0), None), ("b", Some(6.0), None)).toDF("g", "x", "y")
    val got = viaMulti(df, "g", Seq("x" -> Seq(0.5), "y" -> Seq(0.5)), 4)
    assert(math.abs(got("a")(0)(0) - 1.5) < 1e-9)
    assert(math.abs(got("a")(1)(0) - 15.0) < 1e-9)
    assert(math.abs(got("b")(0)(0) - 5.5) < 1e-9)
    assert(got("b")(1) == null)
  }
}
