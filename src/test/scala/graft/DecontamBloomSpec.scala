package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/**
 * Bloom-prefiltered decontamination: identical pairs to the broadcast
 * exact path (no false negatives by contract), the scale-path plan
 * shape (map-side might_contain BEFORE the exchange, shuffle join not
 * broadcast), and a planted-overlap fixture dense enough to exercise
 * the group-count semantics.
 */
class DecontamBloomSpec extends SparkSpec {
  import spark.implicits._

  // 40 corpus docs; every third shares its middle 8-gram with bench
  // doc (i/3): overlap is planted, the rest is per-doc unique filler
  private lazy val corpus = (0 until 40).map { i =>
    val filler = (0 until 6).map(j => s"c${i}w$j").mkString(" ")
    val core = if (i % 3 == 0) s"shared ngram block number ${i / 3} aa bb cc"
               else s"solo ngram block number $i xx yy zz"
    (i.toLong, s"$filler $core $filler")
  }.toDF("doc_id", "text")

  private lazy val bench = (0 until 5).map { b =>
    (b.toLong, s"bench intro $b shared ngram block number $b aa bb cc bench outro $b")
  }.toDF("doc_id", "text")

  test("bloom path pairs == broadcast exact path pairs (planted fixture)") {
    val exact = TextAnalysis.contaminationPairs(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = 8, minOverlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloom = TextAnalysis.contaminationPairsBloom(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = 8, minOverlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact.nonEmpty, "planted fixture produced no contamination")
    assert(bloom == exact)
    // the plant: corpus docs i=0,3,6,9,12 (i%3==0, i/3 in 0..4) hit
    // bench docs 0..4 respectively
    assert(exact.map(_._1) == Set(0L, 3L, 6L, 9L, 12L))
  }

  test("bloom path == exact path on the documents fixture (src1 registry)") {
    val docs = queries.Tables.table(spark, sfDir, "documents")
    val c = docs.filter(col("source") =!= "src1")
    val b = docs.filter(col("source") === "src1")
    val exact = TextAnalysis.contaminationPairs(c, "doc_id", "text",
        b, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloom = TextAnalysis.contaminationPairsBloom(c, "doc_id", "text",
        b, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bloom == exact)
  }

  test("plan shape: might_contain before the exchange, shuffle join not broadcast") {
    val plan = TextAnalysis.contaminationPairsBloom(corpus, "doc_id", "text",
        bench, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(800))
    assert(plan.contains("ShuffledHashJoin"), plan.take(800))
    assert(!plan.contains("BroadcastHashJoin"), plan.take(800))
    // the bloom predicate must sit below the shuffle: in the rendered
    // tree the Filter(might_contain) line is deeper than the exchange
    val lines = plan.linesIterator.toSeq
    val exch = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    val mc = lines.indexWhere(_.contains("might_contain"))
    assert(exch >= 0 && mc > exch,
      s"might_contain (line $mc) should be under the exchange (line $exch)")
  }

  test("the prefilter shrinks the corpus side to ~the true overlap") {
    // corpus shingle volume is ~40 docs x ~15 shingles; only the 5
    // planted cores overlap the bench registry. with fpp=0.01 the
    // pass-through must stay near the true-shared shingle count.
    val passed = {
      import org.apache.spark.sql.graft.Bridge
      import org.apache.spark.sql.graft.expressions.StringHash64
      def h(c: org.apache.spark.sql.Column) =
        Bridge.column(StringHash64(Bridge.expression(c)))
      val benchSh = bench.select(
          explode(TextAnalysis.shingles(col("text"), 8)).as("__s"))
        .select(h(col("__s")).as("shingle"))
      val bloom = graft.operators.BloomJoin.buildBloom(benchSh, "shingle",
        expectedItems = 1000L, fpp = 0.01)
      corpus.select(explode(TextAnalysis.shingles(col("text"), 8)).as("__s"))
        .select(h(col("__s")).as("shingle"))
        .filter(graft.operators.BloomJoin.mightContain(bloom, col("shingle")))
        .count()
    }
    val total = corpus.select(
      explode(TextAnalysis.shingles(col("text"), 8)).as("s")).count()
    info(s"corpus shingles: $total -> $passed past bloom")
    assert(passed < total / 4, s"bloom filtered almost nothing: $passed/$total")
  }
}
