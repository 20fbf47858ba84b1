package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/**
 * Gopher repetition battery: hand-computed fractions, edge cases
 * (empty/short text), and the no-shuffle codegen'd plan shape.
 */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed fractions on a planted repetitious doc") {
    // "a b a b a b a b c": n=9, distinct 3 -> frac_dup_tokens 6/9;
    // 2-grams: "a b"x4 "b a"x3 "b c"x1 -> top2 = 4*2/9;
    // 5-grams: "a b a b a"x2, "b a b a b"x2, "a b a b c"x1
    //   -> dup 4 of 5 -> 0.8
    val r = TextAnalysis.repetitionSignals(
        Seq((1L, "a b a b a b a b c")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect()(0)
    assert(r.getInt(1) == 9)
    assert(r.getDouble(2) == math.rint((1.0 - 3.0 / 9) * 1e6) / 1e6)
    assert(r.getDouble(3) == math.rint(8.0 / 9 * 1e6) / 1e6)
    assert(r.getDouble(6) == 0.8, "frac_dup_5gram")
    assert(!r.getBoolean(8), "a doc this repetitious must be dropped")
  }

  test("short and empty texts yield zero fractions and keep=true") {
    val rows = TextAnalysis.repetitionSignals(
        Seq((1L, ""), (2L, "one"), (3L, "two words")).toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rows(0).getInt(1) == 0 && rows(0).getDouble(2) == 0.0)
    assert(rows(1).getInt(1) == 1 && rows(1).getDouble(3) == 0.0)
    // "two words": one 2-gram occurring once -> top2 = 2/2 = 1.0 (the
    // whole doc IS one 2-gram) -> correctly dropped as degenerate
    assert(rows(2).getDouble(3) == 1.0)
    assert(rows(0).getBoolean(8) && rows(1).getBoolean(8))
  }

  test("plan shape: one codegen'd project, no shuffle") {
    val docs = queries.Tables.table(spark, sfDir, "documents")
    val plan = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("repetition_metrics"), plan.take(500))
    assert(!plan.contains("Exchange"), "repetition battery must not shuffle")
    assert(plan.contains("*(1)"), "must stay in whole-stage codegen")
  }

  test("organic fixture distribution is non-degenerate") {
    val docs = queries.Tables.table(spark, sfDir, "documents")
    val out = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
    val n = out.count()
    val kept = out.filter(col("keep")).count()
    info(s"keep $kept/$n")
    assert(kept > 0 && kept < n,
      s"thresholds should split the fixture, got $kept/$n")
  }
}
