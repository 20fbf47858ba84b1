package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.expressions._
import org.apache.spark.sql.types.{ArrayType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * ScalaCheck properties over the custom expression family (SURVEY §5.2)
 * — evaluated through the expressions' own eval paths (Literal.create +
 * eval), no Spark session needed, hundreds of cases per property.
 * Seeded: failures reproduce.
 */
class PropertySpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(300)
    .withInitialSeed(Seed(42L))

  private def check(p: Prop, name: String): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name: $r")
  }

  private val genVec: Gen[Array[Float]] =
    for {
      n <- Gen.choose(1, 16)
      xs <- Gen.listOfN(n, Gen.choose(-10.0f, 10.0f))
    } yield xs.toArray

  private def lit(v: Array[Float]) =
    Literal.create(v, ArrayType(FloatType, containsNull = false))

  private def cos(a: Array[Float], b: Array[Float]): Double =
    CosineSimilarity(lit(a), lit(b)).eval().asInstanceOf[Double]
  private def dist(a: Array[Float], b: Array[Float]): Double =
    EuclideanDistance(lit(a), lit(b)).eval().asInstanceOf[Double]

  // pad to equal length (the expressions require matching dims)
  private def samedim(a: Array[Float], b: Array[Float]): (Array[Float], Array[Float]) = {
    val n = math.max(a.length, b.length)
    (a.padTo(n, 0f), b.padTo(n, 0f))
  }

  test("cosine: bounded, symmetric, positive-scale invariant, zero-vector => 0") {
    check(Prop.forAll(genVec, genVec) { (a0, b0) =>
      val (a, b) = samedim(a0, b0)
      val c = cos(a, b)
      c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9 &&
        math.abs(c - cos(b, a)) < 1e-12 &&
        math.abs(cos(a, b.map(_ * 3.5f)) - c) < 1e-6
    }, "cosine core")
    assert(cos(Array(0f, 0f), Array(1f, 2f)) == 0.0) // embedding.py:82-84 rule
  }

  test("euclidean: non-negative, symmetric, triangle inequality, identity") {
    check(Prop.forAll(genVec, genVec, genVec) { (a0, b0, c0) =>
      val n = List(a0, b0, c0).map(_.length).max
      val (a, b, c) = (a0.padTo(n, 0f), b0.padTo(n, 0f), c0.padTo(n, 0f))
      dist(a, b) >= 0 &&
        math.abs(dist(a, b) - dist(b, a)) < 1e-9 &&
        dist(a, c) <= dist(a, b) + dist(b, c) + 1e-6 &&
        dist(a, a) < 1e-9
    }, "euclidean")
  }

  test("normalize: unit norm for nonzero, passthrough for zero") {
    check(Prop.forAll(genVec) { a =>
      val out = NormalizeVector(lit(a)).eval().asInstanceOf[GenericArrayData]
        .toDoubleArray() // output is ARRAY<DOUBLE> (precision-widening)
      val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
      val outNorm = math.sqrt(out.map(x => x * x).sum)
      if (norm == 0) out.sameElements(a.map(_.toDouble))
      else math.abs(outNorm - 1.0) < 1e-4
    }, "normalize")
  }

  private val genTokens: Gen[List[String]] =
    Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "word1", "word2", "xx", "yy"))

  private def arr(tokens: Seq[String]) =
    Literal.create(new GenericArrayData(tokens.map(UTF8String.fromString).toArray),
      ArrayType(StringType))

  test("minhash: signature agreement estimates jaccard within tolerance") {
    val k = 256
    check(Prop.forAll(genTokens.suchThat(_.nonEmpty), genTokens.suchThat(_.nonEmpty)) { (ta, tb) =>
      val sa = MinHashSignature(arr(ta), k).eval().asInstanceOf[GenericArrayData].toLongArray()
      val sb = MinHashSignature(arr(tb), k).eval().asInstanceOf[GenericArrayData].toLongArray()
      val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / k
      val (da, db) = (ta.toSet, tb.toSet)
      val trueJ = da.intersect(db).size.toDouble / da.union(db).size
      math.abs(est - trueJ) < 0.2 // k=256 => se ~ 0.03; 0.2 is >6 sigma
    }, "minhash estimate")
  }

  test("simhash: identical token multisets => identical fingerprints") {
    check(Prop.forAll(genTokens) { ts =>
      val h1 = SimHash64(arr(ts)).eval().asInstanceOf[Long]
      val h2 = SimHash64(arr(ts)).eval().asInstanceOf[Long]
      h1 == h2
    }, "simhash determinism")
  }

  test("hash_bucket: range, determinism, not constant") {
    check(Prop.forAll(Gen.choose(Long.MinValue, Long.MaxValue), Gen.choose(1, 1000)) { (id, n) =>
      val b = HashBucket(Literal(id), n).eval().asInstanceOf[Int]
      b >= 0 && b < n && b == HashBucket(Literal(id), n).eval().asInstanceOf[Int]
    }, "hash_bucket range")
    val spread = (0L until 1000L).map(i => HashBucket(Literal(i), 10).eval()).toSet
    assert(spread.size == 10)
  }

  test("rolling hash: prefix property — equal prefixes share the hash chain") {
    check(Prop.forAll(Gen.alphaNumStr, Gen.alphaNumStr, Gen.alphaNumStr) { (p, a, b) =>
      def rh(s: String) = RollingHash(Literal(UTF8String.fromString(s), StringType))
        .eval().asInstanceOf[Long]
      // deterministic + sensitive: equal strings match; differing
      // suffixes (almost surely) differ
      rh(p + a) == rh(p + a) && ((a == b) || rh(p + a) != rh(p + b) || a.isEmpty || b.isEmpty)
    }, "rolling hash")
  }

  test("quantize_int8: bounds, scale consistency, round-trip, scale invariance") {
    def quant(v: Array[Float]): Seq[Int] =
      QuantizeInt8(lit(v)).eval().asInstanceOf[GenericArrayData]
        .toIntArray().toSeq
    def scale(v: Array[Float]): Double =
      Int8Scale(lit(v)).eval().asInstanceOf[Double]
    check(Prop.forAll(genVec) { v =>
      val q = quant(v); val s = scale(v)
      val inBounds = q.forall(x => x >= -127 && x <= 127)
      val zeroCase = v.forall(_ == 0f)
      val roundTrip = zeroCase || v.zip(q).forall { case (x, qi) =>
        math.abs(x - qi / s) <= 0.5 / s + 1e-9
      }
      // the max-|x| element maps to +-127 exactly
      val maxHits = zeroCase || {
        val mx = v.map(x => math.abs(x.toDouble)).max
        v.zip(q).exists { case (x, qi) =>
          math.abs(x.toDouble) == mx && math.abs(qi) == 127
        }
      }
      inBounds && roundTrip && maxHits && (if (zeroCase) s == 0.0 else s > 0.0)
    }, "quantize bounds/round-trip")
    // positive-scale invariance: codes are a function of direction only
    check(Prop.forAll(genVec, Gen.choose(0.1f, 8.0f)) { (v, k) =>
      v.forall(_ == 0f) || quant(v) == quant(v.map(_ * k))
    }, "quantize scale invariance")
  }

  test("hilbert: 2-D and N-D curves are injective and range-bounded") {
    // 2-D xy2d: distinct cells never collide, index < 4^bits
    check(Prop.forAll(Gen.choose(1, 8), Gen.choose(0L, 255L), Gen.choose(0L, 255L),
        Gen.choose(0L, 255L), Gen.choose(0L, 255L)) { (bits, x0, y0, x1, y1) =>
      val m = (1L << bits) - 1
      val (ax, ay, bx, by) = (x0 & m, y0 & m, x1 & m, y1 & m)
      val da = HilbertEval.xy2d(bits, ax, ay)
      val db = HilbertEval.xy2d(bits, bx, by)
      val bounded = da >= 0 && da < (1L << (2 * bits))
      val injective = ((ax, ay) == (bx, by)) == (da == db)
      bounded && injective
    }, "hilbert2d injective+bounded")
    // N-D Skilling transform: same, at random dimension 2..5
    check(Prop.forAll(Gen.choose(2, 5), Gen.choose(1, 6),
        Gen.listOfN(5, Gen.choose(0L, 63L)), Gen.listOfN(5, Gen.choose(0L, 63L))) {
      (dims, bits, as, bs) =>
        val m = (1L << bits) - 1
        val a = as.take(dims).map(_ & m).toArray
        val b = bs.take(dims).map(_ & m).toArray
        val da = HilbertEval.ndIndex(a, bits)
        val db = HilbertEval.ndIndex(b, bits)
        val bounded = da >= 0 && da < (1L << (dims * bits))
        val injective = a.sameElements(b) == (da == db)
        bounded && injective
    }, "hilbertNd injective+bounded")
  }

  test("sorted_lower_bound: equals linear filter-count on sorted arrays") {
    check(Prop.forAll(
        Gen.listOf(Gen.choose(-100.0, 100.0)), Gen.choose(-120.0, 120.0)) {
      (xs, v) =>
        val sorted = xs.sorted
        val expected = sorted.count(_ < v)
        val got = SortedLowerBoundEval.count(
          new GenericArrayData(sorted.toArray), v)
        got == expected
    }, "sorted_lower_bound == linear count")
    // ties and NaN: equal bound excluded; NaN value counts nothing
    val arr = new GenericArrayData(Array(1.0, 2.0, 2.0, 3.0))
    assert(SortedLowerBoundEval.count(arr, 2.0) == 1)
    assert(SortedLowerBoundEval.count(arr, Double.NaN) == 0)
    assert(SortedLowerBoundEval.count(new GenericArrayData(Array.empty[Double]), 5.0) == 0)
  }
}
