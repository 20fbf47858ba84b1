package graft
// (int8 quantization tests appended at the bottom)

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** V1-V4 semantics vs the reference's VectorOperations
  * (app/utils/embedding.py:69-113), on both the interpreted and the
  * whole-stage-codegen path. Property-style cases use a fixed-seed
  * generator (scalatestplus glue is not resolvable offline). */
class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(col: org.apache.spark.sql.Column, a: Array[Float], b: Array[Float]): Double =
    Seq((a, b)).toDF("a", "b").select(col).as[Double].head()

  test("cosine of identical vectors is 1") {
    val v = Array(1.0f, 2.0f, 3.0f)
    assert(math.abs(one(cosine_sim($"a", $"b"), v, v) - 1.0) < 1e-12)
  }

  test("cosine hand-computed") {
    val got = one(cosine_sim($"a", $"b"), Array(1f, 0f), Array(1f, 1f))
    assert(math.abs(got - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("zero vector => cosine 0.0 (embedding.py:82-84)") {
    assert(one(cosine_sim($"a", $"b"), Array(0f, 0f), Array(1f, 2f)) == 0.0)
    assert(one(cosine_sim($"a", $"b"), Array(1f, 2f), Array(0f, 0f)) == 0.0)
  }

  test("dimension mismatch raises (embedding.py:79-80)") {
    val ex = intercept[Exception] {
      one(cosine_sim($"a", $"b"), Array(1f, 2f), Array(1f, 2f, 3f))
    }
    assert(ex.getMessage.contains("same dimension")
      || Option(ex.getCause).exists(_.getMessage.contains("same dimension")))
  }

  test("euclidean hand-computed") {
    assert(one(euclidean_dist($"a", $"b"), Array(0f, 3f), Array(4f, 0f)) == 5.0)
  }

  test("dot product hand-computed") {
    assert(one(dot_product($"a", $"b"), Array(1f, 2f, 3f), Array(4f, 5f, 6f)) == 32.0)
  }

  test("norm and normalize; zero vector passthrough (embedding.py:111-112)") {
    val df = Seq(Tuple1(Array(3.0f, 4.0f)), Tuple1(Array(0.0f, 0.0f))).toDF("v")
    val rows = df.select(vector_norm($"v").as("n"), normalize_vec($"v").as("nv"))
      .as[(Double, Array[Double])].collect()
    assert(rows(0)._1 == 5.0)
    assert(rows(0)._2.zip(Array(0.6, 0.8)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(rows(1)._1 == 0.0)
    assert(rows(1)._2.sameElements(Array(0.0, 0.0))) // unchanged
  }

  test("SQL registration works (codegen path over a real scan)") {
    graft.functions.GraftFunctions.registerAll(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet").createOrReplaceTempView("emb_t")
    val n = spark.sql(
      """SELECT vec_id, cosine_sim(embedding, embedding) AS c,
        |  vector_norm(embedding) AS nrm FROM emb_t""".stripMargin)
      .filter(abs(col("c") - 1.0) < 1e-9 && col("nrm") > 0)
      .count()
    assert(n == 500)
  }

  private def randomVecs(n: Int): Seq[Array[Float]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(n)(Array.fill(2 + rnd.nextInt(14))(rnd.nextFloat() * 20f - 10f))
  }

  test("property: cosine in [-1,1] and symmetric; euclid non-negative (batch)") {
    val cases = randomVecs(40).map(a => (a, a.map(x => x * 0.5f + 1.0f)))
    val df = cases.toDF("a", "b")
    val rows = df.select(
      cosine_sim($"a", $"b").as("c1"), cosine_sim($"b", $"a").as("c2"),
      euclidean_dist($"a", $"b").as("d")).as[(Double, Double, Double)].collect()
    rows.foreach { case (c1, c2, d) =>
      assert(c1 >= -1.0 - 1e-9 && c1 <= 1.0 + 1e-9)
      assert(math.abs(c1 - c2) < 1e-12)
      assert(d >= 0.0)
    }
  }

  test("empty arrays: cosine 0.0 (zero-norm rule), euclid 0.0, dot 0.0") {
    val empty = Array.empty[Float]
    assert(one(cosine_sim($"a", $"b"), empty, empty) == 0.0)
    assert(one(euclidean_dist($"a", $"b"), empty, empty) == 0.0)
    assert(one(dot_product($"a", $"b"), empty, empty) == 0.0)
  }

  test("null inputs propagate null (no crash)") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    val r = df.select(cosine_sim($"a", $"b")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("property: cosine scale-invariant") {
    val rnd = new scala.util.Random(7)
    randomVecs(20).filter(_.exists(_ != 0f)).foreach { a =>
      val k = 0.1f + rnd.nextFloat() * 5f
      val c1 = one(cosine_sim($"a", $"b"), a, a.map(_ * 2f))
      val c2 = one(cosine_sim($"a", $"b"), a.map(_ * k), a.map(_ * 2f))
      assert(math.abs(c1 - c2) < 1e-6)
    }
  }

  test("quantize_int8: exact floor semantics, zero vector, max maps to +-127") {
    import graft.operators.Quantize
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),   // mx=1.0: q = (64, -127, 32)
      (2L, Array(0f, 0f, 0f)),           // zero vector -> zeros, scale 0
      (3L, Array(-2.0f, 1.0f, 0.0f))     // mx=2.0: q = (-127, 64, 0)
    ).toDF("id", "v")
    val out = df.select($"id",
        Quantize.quantizeInt8($"v").as("q"),
        Quantize.int8Scale($"v").as("s"))
      .orderBy("id")
      .as[(Long, Seq[Int], Double)].collect()
    assert(out(0)._2 == Seq(64, -127, 32)) // floor(0.5*127+0.5)=64 (round half up)
    assert(out(0)._3 == 127.0)
    assert(out(1)._2 == Seq(0, 0, 0) && out(1)._3 == 0.0)
    assert(out(2)._2 == Seq(-127, 64, 0) && out(2)._3 == 63.5)
    // property: every q_i in [-127, 127] and round-trip within half a step
    val rnd = new scala.util.Random(11)
    randomVecs(20).filter(_.exists(_ != 0f)).foreach { a =>
      val mx = a.map(x => math.abs(x.toDouble)).max
      val t = 127.0 / mx
      val q = a.map(x => math.floor(x * t + 0.5).toInt)
      assert(q.forall(v => v >= -127 && v <= 127))
      a.zip(q).foreach { case (x, qi) =>
        assert(math.abs(x - qi / t) <= 0.5 / t + 1e-12)
      }
    }
    // SQL surface
    graft.functions.GraftFunctions.registerAll(spark)
    val sql = spark.sql(
      "SELECT quantize_int8(array(0.5F, -1.0F)) AS q, int8_scale(array(0.5F, -1.0F)) AS s")
      .collect()(0)
    assert(sql.getSeq[Int](0) == Seq(64, -127) && sql.getDouble(1) == 127.0)
  }
}
