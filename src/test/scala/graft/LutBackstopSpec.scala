package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.TextLutOracles

/** Hand-computed numeric backstops for the literal-LUT oracle
  * generators (VERDICT r15 item 3): the q59 tfidf and q96 pmi LUT
  * values are asserted against independently-typed `math.log`
  * formulas on a 3-doc fixture, the way LmPerplexitySpec backs up the
  * q118 logp LUT. A wrong idf/pmi formula in the engine OR the
  * generator now fails `sbt test`, not just code review — before this
  * spec the generator replayed whatever the engine computed.
  */
class LutBackstopSpec extends SparkSpec {
  import spark.implicits._

  /** 3-doc corpus with hand-enumerable counts:
    * doc 0 "apple banana apple", doc 1 "banana cherry", doc 2 "apple".
    * tf/df: (apple,d0) tf=2; (banana,d0) tf=1; (banana,d1) tf=1;
    * (cherry,d1) tf=1; (apple,d2) tf=1. df: apple=2 banana=2 cherry=1.
    * Distinct-term pairs per doc: d0 (apple,banana); d1 (banana,cherry).
    * N = 3 docs. */
  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("lut-backstop").toString
    Seq(
      (0L, "apple banana apple", "src0", "en", 18),
      (1L, "banana cherry", "src0", "en", 13),
      (2L, "apple", "src1", "en", 5)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private def round6HalfUp(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def lit(x: Double): String = java.lang.Double.toString(x)

  test("q59 LUT literals equal tf * ln((N+1)/(df+1)) computed by hand") {
    val sql = TextLutOracles.q59(spark, fixtureDir)
      .getOrElse(fail("q59 generator withheld on a 3-doc fixture"))
    val n = 3L
    def full(tf: Long, df: Long): Double =
      tf * math.log((n + 1).toDouble / (df + 1))
    // every (tf, df) pair present in the fixture, value hand-derived
    val expected = Seq((2L, 2L), (1L, 2L), (1L, 1L)).map { case (tf, df) =>
      val f = full(tf, df)
      s"($tf, $df, '${lit(f)}', '${lit(round6HalfUp(f))}')"
    }
    expected.foreach { row =>
      assert(sql.contains(row), s"q59 LUT missing hand-computed row $row")
    }
    // a deliberately WRONG formula (the un-smoothed ln(N/df)) must not
    // appear — guards against the mutation passing by coincidence
    val wrong = 2L * math.log(3.0 / 2)
    assert(!sql.contains(s"(2, 2, '${lit(wrong)}'"),
      "wrong-formula literal must differ on this fixture")
  }

  test("q96 LUT literals equal ln(c12*N/(c1*c2)) computed by hand") {
    val engine = SparkEntry.queries("q96_term_pmi")
    val sql = TextLutOracles.q96(spark, fixtureDir, engine)
      .getOrElse(fail("q96 generator withheld on a 3-doc fixture"))
    // pairs: (apple,banana) c12=1 c1=2 c2=2 -> ln(3/4);
    //        (banana,cherry) c12=1 c1=2 c2=1 -> ln(3/2)
    val expected = Seq(
      (1L, 2L, 2L, math.log(1.0 * 3 / (2 * 2))),
      (1L, 2L, 1L, math.log(1.0 * 3 / (2 * 1)))
    ).map { case (c12, c1, c2, pmi) =>
      s"($c12, $c1, $c2, '${lit(round6HalfUp(pmi))}')"
    }
    expected.foreach { row =>
      assert(sql.contains(row), s"q96 LUT missing hand-computed row $row")
    }
    // engine result must agree with the hand-computed pmi too (the
    // generator no longer copies it, so this closes the loop)
    val res = engine(spark, fixtureDir)
      .select("t1", "t2", "pmi").orderBy("t1").collect()
    assert(res.length == 2)
    assert(res(0).getString(0) == "apple" &&
      res(0).getDouble(2) == round6HalfUp(math.log(0.75)))
    assert(res(1).getString(0) == "banana" &&
      res(1).getDouble(2) == round6HalfUp(math.log(1.5)))
  }
}
