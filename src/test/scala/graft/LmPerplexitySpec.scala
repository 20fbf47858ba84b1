package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Stupid-backoff bigram LM perplexity (q118/q119): hand-computed
  * probabilities on a tiny fixture, the exact-decimal sum contract,
  * keep semantics, and the scale shape of the plan. */
class LmPerplexitySpec extends SparkSpec {
  import spark.implicits._

  private def round9(x: Double): BigDecimal =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)

  test("hand-computed: seen bigram ratio, backoff on unseen, keep verdict") {
    // reference "a b a c": T=4, V=3; C1(a)=2, C1(b)=1, C1(c)=1;
    // C2(a,b)=1, C2(b,a)=1, C2(a,c)=1
    val docs = Seq(
      (0L, "a b a c", "ref"),
      (1L, "a b x", "rest"),   // (a,b) seen: ln(1/2); (b,x) unseen, x OOV: ln(0.4*1/7)
      (2L, "a c", "rest"),     // (a,c) seen: ln(1/2)
      (3L, "a", "rest"),       // single token: excluded (no bigrams)
      (4L, "z z", "rest")      // (z,z) unseen, z OOV: ln(0.4*1/7)
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.lmPerplexity(docs, "doc_id", "text",
        refFilter = col("source") === "ref", keepThreshold = -1.0)
      .orderBy("doc_id").collect()

    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 4L), "doc 3 has no bigrams")

    val lnHalf = round9(math.log(0.5))
    val lnBackoffOov = round9(math.log(0.4 * 1 / 7.0))
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), BigDecimal(r.getDecimal(2)), r.getDouble(3), r.getDouble(4),
        r.getBoolean(5))).toMap

    val (n1, sum1, avg1, _, keep1) = byId(1L)
    assert(n1 == 2L)
    assert(sum1 == lnHalf + lnBackoffOov, s"got $sum1")
    assert(avg1 == ((lnHalf + lnBackoffOov).toDouble / 2 * 1e6).round / 1e6 ||
      math.abs(avg1 - (lnHalf + lnBackoffOov).toDouble / 2) < 1e-6)
    assert(!keep1, "avg ~ -1.77 < threshold -1.0 -> drop")

    val (n2, sum2, _, ppl2, keep2) = byId(2L)
    assert(n2 == 1L && sum2 == lnHalf)
    assert(math.abs(ppl2 - 2.0) < 1e-5, s"ppl of ln(1/2) is 2, got $ppl2")
    assert(keep2, "avg -0.693 >= -1.0 -> keep")

    val (_, sum4, _, _, keep4) = byId(4L)
    assert(sum4 == lnBackoffOov && !keep4)

    // the reference doc itself scores best (all its bigrams are seen)
    val (_, _, avg0, _, keep0) = byId(0L)
    assert(keep0 && avg0 > avg1)
  }

  test("sum_logp is exact decimal: scoring is order/partitioning independent") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = TextAnalysis.lmPerplexity(docs, "doc_id", "text",
      col("source") === "src0").orderBy("doc_id").collect()
    val b = TextAnalysis.lmPerplexity(docs.repartition(17), "doc_id", "text",
      col("source") === "src0").orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq, "decimal sums must not depend on partitioning")
    assert(a.length > 100)
  }

  test("pruned model == frequency-cutoff model, partitioning-invariant (q127)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // m = 1024 on the fixture: the cutoff genuinely prunes (scores must
    // differ from the full model) while staying EXACT — the MG-
    // candidate/recount path must equal the same scoring under any
    // partitioning, because the cutoff set is partitioning-invariant
    val full = TextAnalysis.lmPerplexity(docs, "doc_id", "text",
      col("source") === "src0").orderBy("doc_id").collect()
    val a = TextAnalysis.lmPerplexity(docs, "doc_id", "text",
      col("source") === "src0", maxModelTerms = Some(1024))
      .orderBy("doc_id").collect()
    val b = TextAnalysis.lmPerplexity(docs.repartition(17), "doc_id", "text",
      col("source") === "src0", maxModelTerms = Some(1024))
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq, "pruned model must be partitioning-invariant")
    assert(a.length == full.length,
      "same docs scored (pruning changes the model, never the scored set)")
    assert(a.map(_.getDecimal(2)).toSeq != full.map(_.getDecimal(2)).toSeq,
      "cutoff must genuinely prune on this fixture")
  }

  test("bounded model survives zero-token reference docs (ADVICE r15)") {
    // tokens("") == [] is a supported input; the bigram MG-candidate
    // pass must not evaluate slice(tk, 1, -1) on it
    val docs = Seq(
      (0L, "a b a c", "ref"),
      (1L, "", "ref"),          // zero tokens — used to crash the MG pass
      (2L, "   ", "ref"),       // whitespace-only — also zero tokens
      (3L, "a b x", "rest"),
      (4L, "a c", "rest")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.lmPerplexity(docs, "doc_id", "text",
        refFilter = col("source") === "ref", keepThreshold = -1.0,
        maxModelTerms = Some(8))
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 3L, 4L))
    // empty ref docs contribute nothing: scores match the model built
    // without them
    val clean = TextAnalysis.lmPerplexity(
        docs.filter(col("doc_id") =!= 1L && col("doc_id") =!= 2L),
        "doc_id", "text", refFilter = col("source") === "ref",
        keepThreshold = -1.0, maxModelTerms = Some(8))
      .orderBy("doc_id").collect()
    assert(out.toSeq == clean.toSeq)
  }

  test("plan shape: LM counts aggregate distributed, no window over the corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val plan = TextAnalysis.lmPerplexity(docs, "doc_id", "text",
      col("source") === "src0").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "no corpus-wide window")
    assert(!plan.toLowerCase.contains("cartesian"),
      "only the 1-row (T,V) broadcast may cross")
  }
}
