package graft

import org.apache.spark.sql.functions._

import graft.operators.DataSelection

/** DSIR importance-resampling selection (q129): hand-computed
  * log-ratio backstop on a tiny fixture (the LutBackstopSpec rule — a
  * wrong smoothing/total/direction must fail `sbt test`, not code
  * review), exact-decimal determinism, edge-document safety, and the
  * selection semantics on a planted target-like corpus. */
class DataSelectionSpec extends SparkSpec {
  import spark.implicits._

  private def round9(x: Double): BigDecimal =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)

  test("hand-computed: smoothed log-ratio weights against math.log") {
    // 2 docs. Features (unigrams + bigrams):
    //   doc 0 (target): a b        -> a, b, "a b"            (3 feats)
    //   doc 1 (raw):    a c        -> a, c, "a c"            (3 feats)
    val docs = Seq((0L, "a b", true), (1L, "a c", false))
      .toDF("doc_id", "text", "is_t")
    val dim = 16

    // bucket of each feature via the engine's pinned hash (StringHash64
    // is independently oracle-verified by q36/q120's DuckDB replays)
    val fb = Seq("a", "b", "c", "a b", "a c").toDF("f")
      .select(col("f"), DataSelection.featureBucket(col("f"), dim, 11L).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // hand-build the two models from the fixture's raw feature lists
    val targetFeats = Seq("a", "b", "a b")
    val rawFeats = Seq("a", "b", "a b", "a", "c", "a c")
    val ct = targetFeats.groupBy(fb).map { case (b, fs) => b -> fs.size.toLong }
    val cr = rawFeats.groupBy(fb).map { case (b, fs) => b -> fs.size.toLong }
    val (tt, tr) = (targetFeats.size.toLong, rawFeats.size.toLong)
    def lam(b: Long): BigDecimal = round9(
      math.log((ct.getOrElse(b, 0L) + 1).toDouble / (tt + dim)) -
      math.log((cr(b) + 1).toDouble / (tr + dim)))

    val out = DataSelection.dsirWeights(docs, "doc_id", "text",
        targetFilter = col("is_t"), dim = dim, seed = 11L)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    val expected0 = Seq("a", "b", "a b").map(f => lam(fb(f))).sum
    val expected1 = Seq("a", "c", "a c").map(f => lam(fb(f))).sum
    assert(out(0).getLong(1) == 3L && out(1).getLong(1) == 3L)
    assert(BigDecimal(out(0).getDecimal(2)) == expected0,
      s"doc0 sum_w ${out(0).getDecimal(2)} != hand-computed $expected0")
    assert(BigDecimal(out(1).getDecimal(2)) == expected1,
      s"doc1 sum_w ${out(1).getDecimal(2)} != hand-computed $expected1")
    // direction: the target doc must out-score the raw-only doc, and
    // land on the keep side of 0
    assert(expected0 > expected1)
    assert(out(0).getBoolean(4) && !out(1).getBoolean(4))
  }

  test("edge docs: empty / whitespace / single-token never crash") {
    val docs = Seq(
      (0L, "alpha beta gamma", true),
      (1L, "", false),          // zero tokens -> no features -> no row
      (2L, "   ", false),       // whitespace-only
      (3L, "solo", false)       // one token: unigram only, no bigram
    ).toDF("doc_id", "text", "is_t")
    val out = DataSelection.dsirWeights(docs, "doc_id", "text",
        targetFilter = col("is_t"), dim = 8, seed = 11L)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 3L))
    assert(out(0).getLong(1) == 5L, "3 unigrams + 2 bigrams")
    assert(out(1).getLong(1) == 1L, "single token: unigram only")
  }

  test("exact decimal sums: repartitioned corpus gives identical weights") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = DataSelection.dsirWeights(docs, "doc_id", "text",
      col("source") === "src0", dim = 256, seed = 11L)
    val b = DataSelection.dsirWeights(docs.repartition(13), "doc_id", "text",
      col("source") === "src0", dim = 256, seed = 11L)
    val diff = a.alias("a").join(b.alias("b"), Seq("doc_id"))
      .filter(col("a.sum_w") =!= col("b.sum_w") ||
        col("a.n_feats") =!= col("b.n_feats") ||
        col("a.keep") =!= col("b.keep"))
    assert(diff.count() == 0)
    assert(a.count() == b.count())
  }

  test("selection semantics: target slice scores above the raw tail") {
    // the sf0.001 corpus: src0 is the target; its own docs must rank
    // higher on average than the rest (the DSIR sanity property)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val w = DataSelection.dsirWeights(docs, "doc_id", "text",
        col("source") === "src0", dim = 256, seed = 11L)
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .withColumn("avg", col("sum_w").cast("double") / col("n_feats"))
    val byClass = w.groupBy(col("source") === "src0")
      .agg(avg(col("avg")).as("m")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byClass(true) > byClass(false),
      s"target mean ${byClass(true)} must exceed raw mean ${byClass(false)}")
    // and the target slice keeps a higher fraction
    val keepRate = w.groupBy(col("source") === "src0")
      .agg(avg(when(col("keep"), 1.0).otherwise(0.0)).as("k")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(keepRate(true) > keepRate(false))
  }
}
