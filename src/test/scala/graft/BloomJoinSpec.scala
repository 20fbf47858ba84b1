package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

/**
 * Bloom semi-join reduction: the pre-filter must (a) never drop a true
 * match (exactness vs the plain semi join), (b) actually shrink the
 * probe side (the point of the operator), and (c) stay codegen'd.
 */
class BloomJoinSpec extends SparkSpec {

  private lazy val lineitem = queries.Tables.table(spark, sfDir, "lineitem")
  private lazy val orders = queries.Tables.table(spark, sfDir, "orders")

  test("bloom-reduced semi join equals the plain semi join exactly") {
    val dim = orders.filter(col("o_orderpriority") === "1-URGENT")
    val reduced = BloomJoin.semiJoinReduced(lineitem, "l_orderkey",
        dim, "o_orderkey", expectedItems = 10000L, fpp = 0.01)
      .select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val plain = lineitem.join(dim.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(reduced == plain, "Bloom pre-filter changed the join result")
  }

  test("the pre-filter shrinks the probe side close to true selectivity") {
    val dim = orders.filter(col("o_orderpriority") === "1-URGENT")
    val bloom = BloomJoin.buildBloom(dim, "o_orderkey",
      expectedItems = 10000L, fpp = 0.01)
    val total = lineitem.count()
    val passed = lineitem
      .filter(BloomJoin.mightContain(bloom, col("l_orderkey"))).count()
    val trueMatches = lineitem.join(dim.select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    info(s"probe side: $total rows -> $passed past bloom ($trueMatches true)")
    assert(passed >= trueMatches, "false negatives are impossible by contract")
    // ~20% of orders are URGENT; with fpp=1% the pass-through must sit
    // near the true match count, far below the full probe side
    assert(passed <= trueMatches + (total * 0.05).toLong,
      s"bloom passed $passed vs $trueMatches true matches")
    assert(passed < total / 2, "bloom filtered almost nothing")
  }

  test("the membership predicate compiles into whole-stage codegen") {
    val dim = orders.filter(col("o_orderpriority") === "1-URGENT")
    val bloom = BloomJoin.buildBloom(dim, "o_orderkey",
      expectedItems = 10000L, fpp = 0.01)
    val plan = lineitem
      .filter(BloomJoin.mightContain(bloom, col("l_orderkey")))
      .queryExecution.executedPlan.toString
    // executedPlan.toString renders WholeStageCodegen stages as "*(n)"
    assert(plan.contains("*(1) Filter"), plan.take(500))
    assert(plan.contains("might_contain"), plan.take(500))
  }
}
