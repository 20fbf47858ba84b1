package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{RangeJoin, TextAnalysis}

/** Hand-computed answers for the banded range join and TF-IDF. */
class RangeJoinTfIdfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("rangeJoin matches rows inside [lt+lower, lt+upper], inclusive") {
    val left = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 12:00:00")),
      (3L, 8L, ts("2024-01-01 10:00:00"))
    ).toDF("lid", "user_id", "ts")
    val right = Seq(
      (7L, ts("2024-01-01 10:00:00"), 1.0),  // == lt      -> match L1
      (7L, ts("2024-01-01 10:30:00"), 2.0),  // +30min     -> match L1 (inclusive upper)
      (7L, ts("2024-01-01 10:30:01"), 3.0),  // +30min+1s  -> no match
      (7L, ts("2024-01-01 09:59:59"), 4.0),  // before     -> no match
      (9L, ts("2024-01-01 10:00:10"), 5.0)   // other key  -> no match
    ).toDF("user_id", "ts", "value")
    val out = RangeJoin.rangeJoin(left, right, Seq("user_id"), "ts", "ts",
        0L, 1800L, Seq("value"))
      .select($"lid", $"r_value").as[(Long, Double)].collect().toSet
    assert(out == Set((1L, 1.0), (1L, 2.0)))
  }

  test("rangeJoin with negative lower bound (lookback window)") {
    val left = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("lid", "user_id", "ts")
    val right = Seq(
      (7L, ts("2024-01-01 09:45:00"), 1.0),  // -15min -> in [-30m, 0]
      (7L, ts("2024-01-01 10:00:01"), 2.0)   // after  -> out
    ).toDF("user_id", "ts", "value")
    val out = RangeJoin.rangeJoin(left, right, Seq("user_id"), "ts", "ts",
        -1800L, 0L, Seq("value"))
      .select($"r_value").as[Double].collect().toSeq
    assert(out == Seq(1.0))
  }

  test("rangeJoin result is invariant to band width") {
    val left = (1 to 50).map(i => (i.toLong, i.toLong % 3,
      ts(f"2024-01-01 10:${i % 60}%02d:00"))).toSeq.toDF("lid", "user_id", "ts")
    val right = (1 to 80).map(i => (i.toLong % 3,
      ts(f"2024-01-01 10:${(i * 7) % 60}%02d:30"), i.toDouble)).toSeq
      .toDF("user_id", "ts", "value")
    def run(band: Long) = RangeJoin.rangeJoin(left, right, Seq("user_id"),
        "ts", "ts", 0L, 600L, Seq("value"), bandSeconds = band)
      .select($"lid", $"r_value").as[(Long, Double)].collect().toSet
    val base = run(0L)
    assert(base.nonEmpty)
    assert(run(60L) == base && run(7L) == base && run(3600L) == base)
  }

  test("tfIdfTopTerms: rare terms outrank common ones; deterministic tiebreak") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "banana banana banana")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", 2)
      .orderBy("doc_id", "rank")
      .select($"doc_id", $"term", $"rank").as[(Long, String, Int)].collect().toSeq
    // idf: apple ln(4/2)=.69, cherry ln(4/2)=.69, banana ln(4/4)=0
    assert(out == Seq(
      (1L, "apple", 1), (1L, "banana", 2),
      (2L, "cherry", 1), (2L, "banana", 2),
      (3L, "banana", 1)))
  }

  test("connectedComponents: chains, cliques, singleton pairs, min labels") {
    // components: {1,2,3,4,5} as a chain (forces multi-round
    // propagation), {10,11,12} as a triangle, {20,21} as a lone pair
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)
    ).toDF("id_a", "id_b")
    // both paths (driver union-find / distributed min-label) must agree
    for (cc <- Seq(
        graft.operators.Dedup.connectedComponents(pairs),
        graft.operators.Dedup.connectedComponentsDistributed(pairs))) {
      val m = cc.as[(Long, Long)].collect().toMap
      assert((1L to 5L).forall(m(_) == 1L))
      assert((10L to 12L).forall(m(_) == 10L))
      assert(m(20L) == 20L && m(21L) == 20L)
    }
    // string ids must route to the (type-generic) distributed path,
    // never the long-casting local solver
    val strPairs = Seq(("b", "a"), ("b", "c"), ("x", "y")).toDF("id_a", "id_b")
    val sm = graft.operators.Dedup.connectedComponents(strPairs)
      .as[(String, String)].collect().toMap
    assert(sm == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("rangeJoin: null timestamps never match, non-null rows unaffected") {
    val left = Seq(
      (1L, Some(ts("2024-01-01 10:00:00"))),
      (2L, None: Option[Timestamp])
    ).map { case (id, t) => (id, 5L, t) }.toDF("lid", "user_id", "ts")
    val right = Seq(
      (5L, Some(ts("2024-01-01 10:05:00")), 1.0),
      (5L, None: Option[Timestamp], 2.0)
    ).toDF("user_id", "ts", "value")
    val out = RangeJoin.rangeJoin(left, right, Seq("user_id"), "ts", "ts",
        0L, 600L, Seq("value"))
      .select($"lid", $"r_value").as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 1.0))) // null-ts rows on either side drop out
  }

  test("hash_bucket: deterministic, uniform-ish, unsigned-mod semantics") {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.graft.expressions.{HashBucket, TextHash}
    val ids = (0L until 10000L).toDF("id")
    val bucketed = ids.select(col("id"),
      Bridge.column(HashBucket(Bridge.expression(col("id")), 100)).as("b"))
    val counts = bucketed.groupBy("b").count().as[(Int, Long)].collect().toMap
    assert(counts.keys.forall(b => b >= 0 && b < 100)) // unsigned mod: never negative
    assert(counts.size == 100)
    assert(counts.values.forall(n => n > 50 && n < 150)) // roughly uniform
    // matches the driver-side arithmetic exactly
    val expected = java.lang.Long.remainderUnsigned(TextHash.splitmix64(7L), 100L).toInt
    assert(bucketed.filter($"id" === 7L).select("b").as[Int].head() == expected)
  }

  test("packSequences: bins respect the token budget; oversized docs span alone") {
    import graft.operators.Packing
    val docs = Seq((1L, 300L), (2L, 300L), (3L, 300L), (4L, 2000L), (5L, 100L))
      .toDF("doc_id", "n_tok")
    val packed = Packing.packSequences(docs, "doc_id", "n_tok",
      seqTokens = 1024, shards = 1) // one shard: deterministic id order
    val bins = packed.select($"doc_id", $"bin").as[(Long, Long)].collect().toMap
    // cumulative starts: 0,300,600,900,2900 -> bins 0,0,0,0,2
    assert(bins(1L) == 0 && bins(2L) == 0 && bins(3L) == 0)
    assert(bins(4L) == 0)  // starts at 900, spans (oversized handled upstream)
    assert(bins(5L) == 2)  // starts at 2900
    val stats = Packing.packingStats(packed, "n_tok", 1024)
      .select($"bin", $"fill_ratio").as[(Long, Double)].collect().toMap
    assert(stats(0L) == 1.0) // capped
  }

  test("mixBySource keeps ~weight fraction per source, deterministically") {
    import graft.operators.Packing
    val docs = (0L until 4000L).map(i => (i, s"src${i % 2}")).toDF("doc_id", "source")
    val kept = Packing.mixBySource(docs, "doc_id", "source",
      Map("src0" -> 0.25, "src1" -> 1.0))
    val bySrc = kept.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc("src1") == 2000L)                       // weight 1.0 keeps all
    assert(bySrc("src0") > 350 && bySrc("src0") < 650)   // ~25% of 2000
    // deterministic: same call, same rows
    val again = Packing.mixBySource(docs, "doc_id", "source",
      Map("src0" -> 0.25, "src1" -> 1.0))
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(again == bySrc)
  }

  test("rangeJoin plans as an equi-join (no nested-loop) on key+band") {
    val left = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("lid", "user_id", "ts")
    val right = Seq((7L, ts("2024-01-01 10:10:00"), 1.0)).toDF("user_id", "ts", "value")
    val plan = RangeJoin.rangeJoin(left, right, Seq("user_id"), "ts", "ts",
        0L, 1800L, Seq("value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must not plan a nested loop:\n$plan")
  }
}
