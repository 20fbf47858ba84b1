package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.graft.expressions.MisraGries

import graft.operators.TextAnalysis

/**
 * Misra-Gries heavy hitters: the hand-computed eviction trace, the
 * survival guarantee (freq > N/m ⇒ candidate) under adversarial skew
 * and across partitionings (which exercises serialize/merge), and the
 * two-pass heavyHitterTerms operator's exactness + verdict.
 */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def mg(c: Column, m: Int): Column =
    Bridge.column(MisraGries(Bridge.expression(c), m).toAggregateExpression())

  test("hand-computed eviction: a a a b c d with m=2 keeps {a, d}") {
    // a,a,a -> {a:3}; b fits -> {a:3,b:1}; c full -> decrement-all
    // {a:2} (b dies, c never lands); d fits -> {a:2,d:1}
    val out = Seq(Seq("a", "a", "a", "b", "c", "d")).toDF("tk")
      .agg(mg(col("tk"), 2).as("cand"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("a", "d"), s"got $out")
  }

  test("survival guarantee: every term with freq > N/m is a candidate, any partitioning") {
    // adversarial skew: 3 heavy terms drowned in a sea of singletons
    // sized so the summary (m=8) must evict constantly
    val rows =
      (1 to 400).map(_ => "h1") ++ (1 to 300).map(_ => "h2") ++
      (1 to 200).map(_ => "h3") ++ (1 to 900).map(i => s"rare$i")
    val n = rows.size // 1800, N/m = 225: h1, h2 must survive; h3 may not
    for (parts <- Seq(1, 4, 13)) {
      val df = rows.map(t => Seq(t)).toDF("tk").repartition(parts)
      val cand = df.agg(mg(col("tk"), 8).as("c")).collect()(0).getSeq[String](0)
      assert(cand.size <= 8, s"summary overflow: ${cand.size}")
      for (must <- Seq("h1", "h2")) {
        assert(cand.contains(must),
          s"$must (freq > N/m = ${n / 8}) missing at parts=$parts: $cand")
      }
    }
  }

  test("heavyHitterTerms == exact full-shuffle top-k, verdict true, partitioning-invariant") {
    val docs = queries.Tables.table(spark, sfDir, "documents")
    val exact = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val base = TextAnalysis.heavyHitterTerms(docs, "text", k = 10, counters = 64)
      .orderBy("rank").collect()
    assert(base.map(r => (r.getString(1), r.getLong(2))).toSeq == exact)
    assert(base.forall(_.getBoolean(3)), "verdict should be provably complete")
    assert(base.map(_.getInt(0)).toSeq == (1 to base.length))
    val reparted = TextAnalysis
      .heavyHitterTerms(docs.repartition(13), "text", k = 10, counters = 64)
      .orderBy("rank").collect()
    assert(reparted.map(r => (r.getString(1), r.getLong(2))).toSeq == exact,
      "output must not depend on partitioning when the verdict holds")
  }

  test("heavyHitterTermsPerGroup == exact per-group top-k with per-group verdicts") {
    val docs = queries.Tables.table(spark, sfDir, "documents")
    val exact = docs
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(col("cnt").desc, col("term").asc)))
      .filter(col("rank") <= 5)
      .orderBy("source", "rank")
      .collect().map(r => (r.getString(0), r.getInt(3), r.getString(1), r.getLong(2))).toSeq
    val got = TextAnalysis
      .heavyHitterTermsPerGroup(docs, "source", "text", k = 5, counters = 64)
      .orderBy("source", "rank").collect()
    assert(got.map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3))).toSeq == exact)
    assert(got.forall(_.getBoolean(4)), "fixture margins should prove every group")
  }

  test("streaming fold epochs == from-scratch batch top-k over each prefix") {
    val docs = queries.Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text")
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft-vocab-state").toString
    val epochs = scala.collection.mutable.Buffer.empty[Array[org.apache.spark.sql.Row]]
    val sink = new graft.streaming.CorpusStream.DurableVocabularySink(
      stateDir, "text", 10, 64,
      onEpoch = (_, df) => epochs += df.orderBy("rank").collect())
    (0 until 3).foreach { b =>
      assert(sink.process(docs.filter(pmod(col("doc_id"), lit(3)) === b), b))
    }
    (0 until 3).foreach { e =>
      val prefix = docs.filter(pmod(col("doc_id"), lit(3)) <= e)
      val batch = TextAnalysis.heavyHitterTerms(prefix, "text", 10, 64)
        .orderBy("rank").collect()
      assert(epochs(e).map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
          == batch.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq,
        s"epoch $e diverged from the from-scratch batch run")
      assert(epochs(e).forall(_.getBoolean(3)), s"epoch $e verdict")
    }
  }

  test("re-delivered micro-batch is a no-op; fold state survives restart") {
    val docs = queries.Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text").localCheckpoint(true)
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft-vocab-state").toString
    var nEpochs = 0
    val sink = new graft.streaming.CorpusStream.DurableVocabularySink(
      stateDir, "text", 10, 64, onEpoch = (_, _) => nEpochs += 1)
    val b0 = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    val b1 = docs.filter(pmod(col("doc_id"), lit(3)) === 1)
    assert(sink.process(b0, 0))
    assert(!sink.process(b0, 0), "re-delivery must be skipped")
    assert(nEpochs == 1, "re-delivery must not re-emit")

    // restart: a FRESH sink instance over the same state dir must skip
    // the committed batch and continue the fold exactly where the old
    // process left it — epoch 1's output equals the from-scratch batch
    // run over the two-batch prefix
    var restartEpoch: Array[org.apache.spark.sql.Row] = Array.empty
    val reborn = new graft.streaming.CorpusStream.DurableVocabularySink(
      stateDir, "text", 10, 64,
      onEpoch = (_, df) => restartEpoch = df.orderBy("rank").collect())
    assert(!reborn.process(b0, 0), "committed batch must skip after restart")
    assert(reborn.process(b1, 1))
    val expect = TextAnalysis.heavyHitterTerms(b0.unionByName(b1), "text",
      10, 64).orderBy("rank").collect()
    assert(restartEpoch.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
        == expect.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq,
      "post-restart epoch diverged from the from-scratch batch run")
  }

  test("50 churning batches: state stays bounded, GC runs, epochs stay exact (VERDICT r15)") {
    import java.nio.file.{Files, Paths}
    val stateDir = Files.createTempDirectory("graft-vocab-churn").toString
    val m = 32
    val lastEpoch = scala.collection.mutable
      .ArrayBuffer.empty[Array[org.apache.spark.sql.Row]]
    val sink = new graft.streaming.CorpusStream.DurableVocabularySink(
      stateDir, "text", k = 5, counters = m,
      onEpoch = (_, df) => { lastEpoch.clear(); lastEpoch += df.orderBy("rank").collect() })
    // forced churn: every batch brings a FRESH throwaway vocabulary
    // (w<i>_*) that displaces MG counters, plus 3 stable heavies —
    // terms constantly leave and re-enter the tracked set
    def batchDf(i: Int) = {
      val rows = Seq.fill(40)("alpha") ++ Seq.fill(30)("beta") ++
        Seq.fill(20)("gamma") ++ (1 to 25).map(j => s"w${i}_$j")
      rows.map(t => Tuple1(t)).toDF("text")
    }
    (0 until 50).foreach(i => assert(sink.process(batchDf(i), i.toLong)))

    val root = Paths.get(stateDir)
    // (a) tracked count table bounded by the candidate set (≤ m rows)
    val v = Files.readString(root.resolve("LATEST")).trim.toLong
    val counts = spark.read.parquet(root.resolve(s"counts_v$v").toString)
    assert(counts.count() <= m, "eviction must bound the tracked table")
    // (b) version GC: at most 2 counts_v dirs / meta files on disk
    val entries = Files.list(root).iterator()
    var nCounts, nMeta = 0
    entries.forEachRemaining { p =>
      val n = p.getFileName.toString
      if (n.startsWith("counts_v")) nCounts += 1
      if (n.startsWith("meta_v")) nMeta += 1
    }
    assert(nCounts <= 2 && nMeta <= 2, s"GC: counts=$nCounts meta=$nMeta")
    // (c) backfill history compacted: ≤ compactEvery+1 termcounts dirs
    val nHist = Files.list(root.resolve("termcounts")).count()
    assert(nHist <= 17, s"termcounts dirs not compacted: $nHist")
    // (d) output still exact: heavies dominate every per-batch rare term
    val rows = lastEpoch.head.map(r => (r.getString(1), r.getLong(2)))
    assert(rows.take(3).toSeq ==
      Seq(("alpha", 2000L), ("beta", 1500L), ("gamma", 1000L)),
      s"got ${rows.toSeq}")
    // (e) per-trigger read set is age-independent: a new term's
    // backfill reads the compacted base + recent batches, which we
    // just proved is ≤ 17 tables — the 50-batch corpus itself is
    // never re-read (there is no raw corpus in the state dir at all)
    assert(!Files.exists(root.resolve("corpus")))
  }

  test("verdict goes false when the bound cannot prove completeness") {
    // near-uniform vocabulary wider than m: cnt_k * m <= N
    val rows = (1 to 600).map(i => Seq(s"t${i % 60}"))
    val df = rows.toDF("tk").withColumn("text", concat_ws(" ", col("tk")))
    val out = TextAnalysis.heavyHitterTerms(df, "text", k = 5, counters = 16)
      .collect()
    // 60 distinct terms, each freq 10; N=600, N/m=37.5 > 10: nothing is
    // provably safe (and the candidate set genuinely can't be trusted)
    assert(out.forall(!_.getBoolean(3)), "verdict must not overclaim")
  }
}
