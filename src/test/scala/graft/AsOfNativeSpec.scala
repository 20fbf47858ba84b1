package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.queries.Tables

/** Differential tests: the custom-physical-operator as-of join
  * (AsOfJoinExec) must agree with the composed window formulation on
  * hand cases, random data, and the real events table. */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("native as-of matches window as-of on hand-built case") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (2L, 100L, ts("2024-01-01 12:00:00")),
      (3L, 200L, ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, ts("2024-01-01 09:30:00"), 10L, 1.0),
      (100L, ts("2024-01-01 11:00:00"), 11L, 2.0),
      (200L, ts("2024-01-01 10:00:00"), 12L, 3.0)
    ).toDF("user_id", "ts", "sig_id", "value")

    val a = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("value"), "sig_id")
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    val b = AsOfJoin.asOfNative(left, right, Seq("user_id"), "ts", "ts", Seq("value"), "sig_id")
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("native and window as-of agree when the matched row carries NULLs") {
    // regression lock for the ADVICE finding: the matched row's NULL
    // must surface as NULL on BOTH implementations (no stale carry)
    val left = Seq((1L, 5L, ts("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (5L, ts("2024-01-01 09:00:00"), 1L, Some(7.0)),
      (5L, ts("2024-01-01 11:00:00"), 2L, None: Option[Double])
    ).toDF("user_id", "ts", "sig_id", "value")
    val a = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("value"), "sig_id")
      .select($"asof_value").as[Option[Double]].head()
    val b = AsOfJoin.asOfNative(left, right, Seq("user_id"), "ts", "ts", Seq("value"), "sig_id")
      .select($"asof_value").as[Option[Double]].head()
    assert(a.isEmpty && b.isEmpty)
  }

  test("native as-of matches window as-of on the events table (self as-of)") {
    val ev = Tables.table(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click").select("event_id", "user_id", "ts")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("sig_id"), col("value"))
    val a = AsOfJoin.asOf(clicks, signups, Seq("user_id"), "ts", "ts", Seq("value"), "sig_id")
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    val b = AsOfJoin.asOfNative(clicks, signups, Seq("user_id"), "ts", "ts", Seq("value"), "sig_id")
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(a.nonEmpty && a == b)
  }

  test("native as-of on random data with duplicate timestamps") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 400).map { i =>
      (i.toLong, rnd.nextInt(5).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L))
    }.toDF("event_id", "k", "ts")
    val right = (1 to 300).map { i =>
      (rnd.nextInt(5).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
        i.toLong, rnd.nextDouble())
    }.toDF("k", "ts", "tie", "v")
    val a = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("v"), "tie")
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    val b = AsOfJoin.asOfNative(left, right, Seq("k"), "ts", "ts", Seq("v"), "tie")
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("native plan shape: AsOfJoinExec with exchanges/sorts inserted") {
    val ev = Tables.table(spark, sfDir, "events").limit(100)
    val l = ev.select("event_id", "user_id", "ts")
    val r = ev.select(col("user_id"), col("ts"), col("event_id").as("tie"), col("value"))
    val df = AsOfJoin.asOfNative(l, r, Seq("user_id"), "ts", "ts", Seq("value"), "tie")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfJoinExec") || physical.contains("AsOfJoin"))
    df.collect() // executes the custom operator
  }
}
