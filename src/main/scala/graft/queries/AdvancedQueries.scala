package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, RangeJoin, TextAnalysis}

/**
 * Second-round coverage widening: percentiles, pivot, moving windows,
 * full outer join, grouping sets, banded range join, TF-IDF, global
 * token top-k, histograms. Every query carries a DuckDB oracle; plans
 * stay shuffle-minimal (aggregate-then-join, broadcast dims, banded
 * equi-join instead of inequality join).
 */
object AdvancedQueries {
  import Tables.table

  /** q70's exact-verdict scale gate (rows): below it the HLL++ estimate
    * is checked against exact distinct counts; above it the query runs
    * the sketch alone (verdict = 'skipped') and the oracle generator
    * withholds. System-property override lets a test exercise the
    * above-gate path on a small fixture. */
  private[graft] def q70ExactGateMaxRows: Long =
    sys.props.get("graft.q70.gateMaxRows").map(_.toLong).getOrElse(20000000L)

  def defs: Seq[QueryDef] = Seq(

    QueryDef("q52_percentiles", Some(
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        |  round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),
      (spark, dir) =>
        // one percentile buffer per column (array of fractions), not one
        // per requested fraction — halves the per-group value buffering
        table(spark, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            percentile(col("l_quantity"), array(lit(0.5), lit(0.9))).as("q_qty"),
            percentile(col("l_extendedprice"), array(lit(0.25), lit(0.75))).as("q_price"))
          .select(col("l_returnflag"),
            round(element_at(col("q_qty"), 1), 4).as("median_qty"),
            round(element_at(col("q_qty"), 2), 4).as("p90_qty"),
            round(element_at(col("q_price"), 1), 4).as("p25_price"),
            round(element_at(col("q_price"), 2), 4).as("p75_price"))
          .orderBy(col("l_returnflag"))),

    // The 100x-scale percentile path. q52's exact percentile() buffers
    // every group's values in the agg buffer — per-task OOM once a
    // group is billions of rows. percentile_approx is a mergeable
    // Greenwald-Khanna sketch: map-side partial aggregation, constant
    // memory per group, rank error <= n/accuracy (= 0.01% of rows at
    // accuracy 10000 — the bound AdviceRegressionSpec asserts against
    // the exact order statistics). The sketch VALUES can never
    // hash-match a different engine's different sketch, so the hashed
    // output is the ERROR-BOUND VERDICT instead: the engine checks the
    // approx value's rank interval (count </<= per group, the sketch's
    // actual guarantee) against the GK window at 2/accuracy and emits
    // the boolean; the oracle replays the group keys/counts and asserts
    // every verdict true. A sketch regression past its bound now FAILS
    // the hash gate instead of hiding behind rows-only. Scale note: the
    // verdict needs NO exact percentile (no per-group value buffering —
    // it counts, constant memory), so even the gated form keeps the
    // 100x memory story; the production path is the sketch alone.
    QueryDef("q69_percentiles_approx", Some(
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
        |  true AS median_qty_ok, true AS p90_qty_ok,
        |  true AS p25_price_ok, true AS p75_price_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (spark, dir) => {
        import org.apache.spark.sql.Column
        val acc = 10000
        val err = 2.0 / acc // GK guarantee is 1/acc; 2x slack
        val li = table(spark, dir, "lineitem")
          .select(col("l_returnflag"),
            col("l_quantity").cast("double").as("qty"),
            col("l_extendedprice").cast("double").as("price"))
        val approxDf = li.groupBy("l_returnflag").agg(
          percentile_approx(col("qty"), array(lit(0.5), lit(0.9)), lit(acc)).as("aq"),
          percentile_approx(col("price"), array(lit(0.25), lit(0.75)), lit(acc)).as("ap"))
        // rank-window verdict: the approx value's rank interval
        // [count(<)+1, count(<=)] must intersect [(p-err)n, (p+err)n] —
        // the sketch's actual guarantee, exact at any n (an interpolated
        // exact-percentile bracket is NARROWER than one order-statistic
        // step at small n and false-fails)
        val stats = Seq(("median_qty", col("qty"), element_at(col("aq"), 1), 0.5),
          ("p90_qty", col("qty"), element_at(col("aq"), 2), 0.9),
          ("p25_price", col("price"), element_at(col("ap"), 1), 0.25),
          ("p75_price", col("price"), element_at(col("ap"), 2), 0.75))
        val cntCols: Seq[Column] = stats.flatMap { case (tag, v, a, _) =>
          Seq(sum(when(v <= a, 1L).otherwise(0L)).as(s"le_$tag"),
            sum(when(v < a, 1L).otherwise(0L)).as(s"lt_$tag"))
        }
        def ok(tag: String, p: Double): Column =
          (col(s"le_$tag").cast("double") >= floor((lit(p) - err) * col("n_rows"))) &&
            ((col(s"lt_$tag").cast("double") + 1) <= ceil((lit(p) + err) * col("n_rows")))
        li.join(broadcast(approxDf), Seq("l_returnflag"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_rows"), cntCols: _*)
          .select(col("l_returnflag"), col("n_rows"),
            ok("median_qty", 0.5).as("median_qty_ok"),
            ok("p90_qty", 0.9).as("p90_qty_ok"),
            ok("p25_price", 0.25).as("p25_price_ok"),
            ok("p75_price", 0.75).as("p75_price_ok"))
          .orderBy(col("l_returnflag"))
      }),

    // The exact-AND-distributed percentile path: two-pass range-
    // partitioned rank selection (operators/Quantiles.scala). Same
    // oracle as q52 — bit-identical results — but per-task memory is
    // one range partition instead of one group's entire value set, so
    // this is the plan that survives a group of billions of rows
    // without the sketch error of q69.
    QueryDef("q80_percentiles_exact2p", Some(
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        |  round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),
      (spark, dir) => {
        // the two value columns are independent selection pipelines —
        // run them as concurrent driver jobs (Spark schedules both
        // stages at once) instead of back-to-back
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration.Duration
        val li = table(spark, dir, "lineitem")
        val qtyF = Future(graft.operators.Quantiles
          .exactGroupedQuantiles(li, "l_returnflag", "l_quantity",
            Seq(0.5, 0.9), numPartitions = 32, boundsSampleFraction = 0.2)
          .select(col("l_returnflag"),
            round(element_at(col("qs"), 1), 4).as("median_qty"),
            round(element_at(col("qs"), 2), 4).as("p90_qty")))
        val priceF = Future(graft.operators.Quantiles
          .exactGroupedQuantiles(li, "l_returnflag", "l_extendedprice",
            Seq(0.25, 0.75), numPartitions = 32, boundsSampleFraction = 0.2)
          .select(col("l_returnflag"),
            round(element_at(col("qs"), 1), 4).as("p25_price"),
            round(element_at(col("qs"), 2), 4).as("p75_price")))
        val qty = Await.result(qtyF, Duration.Inf)
        val price = Await.result(priceF, Duration.Inf)
        qty.join(price, "l_returnflag").orderBy("l_returnflag")
      }),

    // Same result as q80, computed by the MULTI-column operator via
    // exact order-preserving bit-prefix histograms: ONE histogram scan
    // (no bounds sweep — the bucketing is a data-independent monotone
    // bit function), then target ranks in single-valued buckets
    // resolve on the driver and only mixed target buckets go to a
    // second windowed-selection scan — at most 2 scans of lineitem
    // total vs q80's 3 per column, the term that dominates at 100 TB
    // on a saturated cluster.
    QueryDef("q87_percentiles_shared", Some(
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        |  round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),
      (spark, dir) =>
        graft.operators.Quantiles
          .exactGroupedQuantilesMulti(table(spark, dir, "lineitem"), "l_returnflag",
            Seq("l_quantity" -> Seq(0.5, 0.9), "l_extendedprice" -> Seq(0.25, 0.75)))
          .select(col("l_returnflag"),
            round(element_at(col("l_quantity_qs"), 1), 4).as("median_qty"),
            round(element_at(col("l_quantity_qs"), 2), 4).as("p90_qty"),
            round(element_at(col("l_extendedprice_qs"), 1), 4).as("p25_price"),
            round(element_at(col("l_extendedprice_qs"), 2), 4).as("p75_price"))
          .orderBy("l_returnflag")),

    QueryDef("q53_pivot", Some(
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
        |  CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS urgent,
        |  CAST(count(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT) AS high,
        |  CAST(count(*) FILTER (o_orderpriority = '3-MEDIUM') AS BIGINT) AS medium,
        |  CAST(count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS not_specified,
        |  CAST(count(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT) AS low
        |FROM orders
        |GROUP BY 1 ORDER BY 1""".stripMargin),
      (spark, dir) =>
        table(spark, dir, "orders")
          .groupBy(year(col("o_orderdate")).as("order_year"))
          .pivot("o_orderpriority",
            Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .withColumnsRenamed(Map(
            "1-URGENT" -> "urgent", "2-HIGH" -> "high", "3-MEDIUM" -> "medium",
            "4-NOT SPECIFIED" -> "not_specified", "5-LOW" -> "low"))
          .orderBy("order_year")),

    QueryDef("q54_moving_avg", Some(
      """WITH daily AS (
        |  SELECT date_trunc('day', o_orderdate) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT d, revenue,
        |  CAST(floor(CAST(sum(revenue) OVER w7 AS DOUBLE)
        |    / count(*) OVER w7 * 1000000.0 + 0.5) AS BIGINT) AS ma7_e6,
        |  CAST(revenue - lag(revenue, 1) OVER (ORDER BY d) AS DECIMAL(38,2)) AS delta
        |FROM daily
        |WINDOW w7 AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY d""".stripMargin),
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        // MONTH-PARTITIONED moving window (VERDICT r16 item 6): the
        // ROWS-6-PRECEDING frame and lag(1) reach at most 6 rows into
        // EARLIER months, and each month's trailing ≤6 rows are a
        // bounded set — collect the per-month tails driver-side (6 ×
        // #months rows), hand each month its carry-in copies, and run
        // the window PARTITIONED by month: no single-partition
        // WindowExec, and the frame a 100 TB daily series needs stays
        // one bounded exchange + a tiny broadcast union. Decimal sums
        // are exact and see the identical frame rows, the ma7 double
        // division sees identical operands — the global-window oracle
        // replay is unchanged.
        val daily = table(spark, dir, "orders")
          .groupBy(date_trunc("day", col("o_orderdate")).as("d"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)").as("revenue"))
          .withColumn("m", date_trunc("month", col("d")))
        val tails = daily
          .withColumn("__rn", row_number().over(
            Window.partitionBy("m").orderBy(col("d").desc)))
          .filter(col("__rn") <= 6)
          .select("m", "d", "revenue")
          .collect()
          .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getDecimal(2)))
          .sortBy(_._2.getTime)
        val monthsSorted = tails.map(_._1).distinct.sortBy(_.getTime)
        val helperRows = scala.collection.mutable.ArrayBuffer
          .empty[(java.sql.Timestamp, java.sql.Timestamp, java.math.BigDecimal)]
        var acc = Vector.empty[(java.sql.Timestamp, java.math.BigDecimal)]
        monthsSorted.foreach { mi =>
          helperRows ++= acc.takeRight(6).map { case (d, rev) => (mi, d, rev) }
          acc = acc ++ tails.filter(_._1 == mi).map(t => (t._2, t._3))
        }
        import spark.implicits._
        val helpers = helperRows.toSeq.toDF("m", "d", "revenue")
          .select(col("m"), col("d"),
            col("revenue").cast("decimal(38,2)").as("revenue"))
        val ext = daily.select("m", "d", "revenue")
          .withColumn("__h", lit(false))
          .unionByName(helpers.withColumn("__h", lit(true)))
        val byD = Window.partitionBy("m").orderBy(col("d"))
        val w7 = byD.rowsBetween(-6, Window.currentRow)
        // moving average as (exact decimal window sum -> double) / frame
        // count: one IEEE division, bit-identical on both engines
        ext
          .withColumn("ma7_e6", floor(sum(col("revenue")).over(w7)
              .cast("double") / count(lit(1)).over(w7) * lit(1e6)
            + lit(0.5)))
          .withColumn("delta", (col("revenue")
            - lag(col("revenue"), 1).over(byD)).cast("decimal(38,2)"))
          .filter(!col("__h"))
          .select(col("d"), col("revenue"), col("ma7_e6"), col("delta"))
          .orderBy("d")
      }),

    QueryDef("q55_full_outer", Some(
      """WITH c AS (
        |  SELECT c_nationkey AS nationkey, count(*) AS n_cust
        |  FROM customer WHERE c_acctbal > 7500 GROUP BY 1),
        |s AS (
        |  SELECT s_nationkey AS nationkey, count(*) AS n_supp
        |  FROM supplier WHERE s_acctbal > 7500 GROUP BY 1)
        |SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
        |  CAST(coalesce(n_cust, 0) AS BIGINT) AS n_cust,
        |  CAST(coalesce(n_supp, 0) AS BIGINT) AS n_supp
        |FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
        |ORDER BY nationkey""".stripMargin),
      (spark, dir) => {
        val c = table(spark, dir, "customer").filter(col("c_acctbal") > 7500)
          .groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_cust"))
        val s = table(spark, dir, "supplier").filter(col("s_acctbal") > 7500)
          .groupBy(col("s_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(s, Seq("nationkey"), "full_outer")
          .select(col("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nationkey")
      }),

    QueryDef("q56_grouping_sets", Some(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum(floor(l_quantity * 100 + 0.5)) AS DOUBLE) / 100 AS DECIMAL(38,2)) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),
      (spark, dir) => {
        table(spark, dir, "lineitem").createOrReplaceTempView("q56_lineitem")
        spark.sql(
          """SELECT l_returnflag, l_linestatus,
            |  CAST(CAST(sum(floor(l_quantity * 100 + 0.5)) AS DOUBLE) / 100 AS DECIMAL(38,2)) AS sum_qty,
            |  count(*) AS n
            |FROM q56_lineitem
            |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
            |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
      }),

    QueryDef("q57_histogram", Some(
      """SELECT CAST(floor(n_chars / 200) AS BIGINT) AS bucket,
        |  count(*) AS n,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM documents
        |GROUP BY 1 ORDER BY 1""".stripMargin),
      (spark, dir) =>
        table(spark, dir, "documents")
          .groupBy(floor(col("n_chars") / 200).as("bucket"))
          .agg(count(lit(1)).as("n"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"))
          .orderBy("bucket")),

    QueryDef("q58_token_topk", Some(
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |    t -> t <> '')) AS term
        |  FROM documents)
        |SELECT term, count(*) AS n
        |FROM toks GROUP BY term
        |ORDER BY n DESC, term LIMIT 40""".stripMargin),
      (spark, dir) =>
        table(spark, dir, "documents")
          .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
          .groupBy("term").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("term").asc)
          .limit(40)),

    // q58's top-k semantics computed the 100 TB way (heavyHitterTerms
    // scaladoc): a Misra-Gries summary generates ≤ 4096 candidates in
    // one scan (the exchange moves one fixed-size summary per partition
    // instead of a key per distinct term), a second scan recounts only
    // the candidates exactly. provably_complete replays as pure
    // arithmetic: cnt_k · m > N proves no non-candidate could reach the
    // top k, so the oracle is the plain exact top-k — and the engine's
    // output is partitioning-invariant whenever the verdict is true
    // (it is at every fixture scale: min(top-40 cnt)·4096 > N with
    // ≥ 1.3× margin even at sf10's 3100-term vocabulary).
    QueryDef("q122_heavy_hitters", Some(
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |    t -> t <> '')) AS term
        |  FROM documents),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM toks),
        |c AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt
        |  FROM toks GROUP BY term ORDER BY cnt DESC, term LIMIT 40),
        |r AS (SELECT CAST(row_number() OVER (ORDER BY cnt DESC, term) AS INTEGER) AS rank,
        |  term, cnt FROM c)
        |SELECT r.rank, r.term, r.cnt,
        |  (SELECT min(cnt) FROM r) * 4096 > n.n_tokens
        |    AND (SELECT count(*) FROM r) = 40 AS provably_complete
        |FROM r CROSS JOIN n ORDER BY rank""".stripMargin),
      (spark, dir) =>
        TextAnalysis.heavyHitterTerms(table(spark, dir, "documents"),
            "text", k = 40, counters = 4096)
          .orderBy("rank")),

    // q122's grouped form: top-10 vocabulary PER SOURCE (the mixing-
    // decision report) — per-group MG summaries + per-group exact token
    // counts ride ONE exchange in pass 1, pass 2 recounts the candidate
    // (source, term) pairs exactly. Verdict margin measured >= 13x at
    // every gate scale (1.43x at sf10).
    QueryDef("q123_heavy_hitters_per_source", Some(
      """WITH toks AS (
        |  SELECT source, unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |    t -> t <> '')) AS term
        |  FROM documents),
        |n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens
        |  FROM toks GROUP BY source),
        |c AS (SELECT source, term, CAST(count(*) AS BIGINT) AS cnt
        |  FROM toks GROUP BY source, term),
        |r AS (SELECT source, term, cnt,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY cnt DESC, term) AS INTEGER) AS rank
        |  FROM c),
        |k AS (SELECT source, rank, term, cnt FROM r WHERE rank <= 10),
        |kth AS (SELECT source, min(cnt) AS kth, count(*) AS nret
        |  FROM k GROUP BY source)
        |SELECT k.source, k.rank, k.term, k.cnt,
        |  kth.kth * 4096 > n.n_tokens AND kth.nret = 10 AS provably_complete
        |FROM k JOIN kth USING (source) JOIN n USING (source)
        |ORDER BY source, rank""".stripMargin),
      (spark, dir) =>
        TextAnalysis.heavyHitterTermsPerGroup(table(spark, dir, "documents"),
            "source", "text", k = 10, counters = 4096)
          .orderBy("source", "rank")),

    // Round-15: oracle GENERATED (TextLutOracles.q59) — tfidf depends
    // only on (tf, df) integer pairs, so the ln values ship as a
    // literal LUT (full double = the ranking key, 6-dp = display) and
    // DuckDB verifies counting + ranking with zero libm exposure (the
    // r14 hash-failure class).
    QueryDef("q59_tfidf", None,
      (spark, dir) =>
        TextAnalysis.tfIdfTopTerms(table(spark, dir, "documents"), "doc_id", "text", 5)
          .filter(col("doc_id") < 100)
          .orderBy("doc_id", "rank"),
      oracleGen = Some((spark, dir) => AnnOracles.safe("q59") {
        TextLutOracles.q59(spark, dir)
      })),

    QueryDef("q60_range_join", Some(
      """SELECT c.event_id, count(*) AS n_purch,
        |  CAST(sum(CAST(p.value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS purch_value
        |FROM events c JOIN events p
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |WHERE c.event_type = 'click'
        |GROUP BY c.event_id
        |ORDER BY c.event_id""".stripMargin),
      (spark, dir) => {
        val ev = table(spark, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts", "value")
        RangeJoin.rangeJoin(clicks, purchases, Seq("user_id"), "ts", "ts",
            lowerSeconds = 0L, upperSeconds = 1800L, rightVals = Seq("value"))
          .groupBy("event_id")
          .agg(count(lit(1)).as("n_purch"),
            sum(col("r_value").cast("decimal(18,2)"))
              .cast("decimal(38,2)").as("purch_value"))
          .orderBy("event_id")
      }),

    // Near-dup pair list -> dedup clusters: min-label connected
    // components, oracled by a DuckDB recursive CTE over the SAME
    // (oracle-verified, q34) pair derivation.
    QueryDef("q61_dedup_clusters", Some(
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '') AS tk
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] FOR i IN range(1, greatest(len(tk) - 1, 1))]) AS shingles
        |  FROM toks WHERE len(tk) >= 3),
        |ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    count(*) AS common, any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |  HAVING CAST(count(*) AS DOUBLE) / (any_value(a.n_sh) + any_value(b.n_sh) - count(*)) >= 0.2),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |nodes AS (SELECT DISTINCT a AS id FROM edges),
        |reach AS (
        |  SELECT id, id AS r FROM nodes
        |  UNION
        |  SELECT e.b AS id, reach.r FROM reach JOIN edges e ON e.a = reach.id)
        |SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin),
      (spark, dir) => {
        val pairs = Dedup.ngramJaccardPairs(table(spark, dir, "documents"),
          "doc_id", "text", shingleSize = 3, minJaccard = 0.2)
        Dedup.connectedComponents(pairs.select("id_a", "id_b"))
          .select(col("id").as("doc_id"), col("label").as("cluster_id"))
          .orderBy("doc_id")
      }),

    // Deterministic train/val/test assignment: split membership is a
    // pure function of the id (splitmix64 -> unsigned mod 100), stable
    // across runs/partitionings/engines — DuckDB replays the identical
    // 64-bit wraparound arithmetic in HUGEINT, so this is hash-compared,
    // not a statistical check. (sample() could never be oracled.)
    // Winsorization (Quantiles.winsorized scaladoc): clip extended
    // price at per-flag [p05, p95] exact-quantile bounds, then compare
    // raw vs clipped totals. Clip classification is engine-stable:
    // data values (2dp) sit >= 1e-4 from any interpolated (4dp) bound,
    // and bounds that coincide with data points are computed exactly
    // by both engines. Totals sum per-row DECIMAL(18,4) casts — exact,
    // order-independent addition in both engines, so the compare holds
    // at any scale (double sums drifted past the rounding quantum in
    // the sf1 probe; see q01).
    QueryDef("q103_winsorize", Some(
      """WITH b AS (
        |  SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.05) AS lo,
        |    quantile_cont(l_extendedprice, 0.95) AS hi
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, count(*) AS n,
        |  CAST(sum(CASE WHEN l_extendedprice < lo OR l_extendedprice > hi
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS raw_sum,
        |  CAST(sum(CAST(least(greatest(l_extendedprice, lo), hi) AS DECIMAL(18,4)))
        |    AS DECIMAL(38,4)) AS w_sum,
        |  round(min(lo), 4) AS lo, round(min(hi), 4) AS hi
        |FROM lineitem l JOIN b USING (l_returnflag)
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin),
      (spark, dir) => {
        import graft.operators.Quantiles
        Quantiles.winsorized(table(spark, dir, "lineitem"),
            "l_returnflag", "l_extendedprice", 0.05, 0.95)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(when(col("l_extendedprice") < col("__lo")
              || col("l_extendedprice") > col("__hi"), 1L).otherwise(0L))
              .as("n_clipped"),
            sum(col("l_extendedprice").cast("decimal(18,2)"))
              .cast("decimal(38,2)").as("raw_sum"),
            sum(col("l_extendedprice_w").cast("decimal(18,4)"))
              .cast("decimal(38,4)").as("w_sum"),
            round(min(col("__lo")), 4).as("lo"),
            round(min(col("__hi")), 4).as("hi"))
          .orderBy("l_returnflag")
      }),

    // Deterministic weighted sampling (Efraimidis–Spirakis exponential
    // keys; Packing.weightedSample scaladoc): key = -ln(u)/w from the
    // splitmix64 of the id, heap top-25 by key. The oracle replays the
    // full hash + key arithmetic; selection order is by the unrounded
    // key (doc_id tiebreak), display rounds at 6 after a 1e6 scale.
    // Round-15: emission is MARGIN-GUARDED (TextLutOracles.q98Guarded)
    // — the SQL evaluates ln, so it is only emitted when the selection
    // cut and every displayed key sit clear of cross-libm noise.
    QueryDef("q98_weighted_sample", None,
      (spark, dir) => {
        import graft.operators.Packing
        Packing.weightedSample(
            table(spark, dir, "documents").select("doc_id", "source", "n_chars"),
            "doc_id", "n_chars", m = 25)
          .select(col("doc_id"), col("source"), col("n_chars"),
            round(col("sample_key") * 1000000, 6).as("key_e6"))
      },
      oracleGen = Some((spark, dir) => AnnOracles.safe("q98") {
        TextLutOracles.q98Guarded(spark, dir, q98StaticSql)
      })),

    // Grouped weighted sampling: the q98 key ranked within each source
    // (row_number over (source, key)) — plans as a map-side
    // WindowGroupLimit like q71's stratified sample, but with
    // weight-proportional inclusion instead of uniform. Margin-guarded
    // emission per group (see q98).
    QueryDef("q99_weighted_per_source", None,
      (spark, dir) => {
        import graft.operators.Packing
        Packing.weightedSamplePerGroup(
            table(spark, dir, "documents").select("doc_id", "source", "n_chars"),
            "doc_id", "n_chars", "source", perGroup = 3)
          .select(col("doc_id"), col("source"), col("n_chars"), col("rn"),
            round(col("sample_key") * 1000000, 6).as("key_e6"))
          .orderBy("source", "rn")
      },
      oracleGen = Some((spark, dir) => AnnOracles.safe("q99") {
        TextLutOracles.q99Guarded(spark, dir, q99StaticSql)
      })),

    QueryDef("q62_split_assign", Some(
      s"""WITH h1 AS (
         |  SELECT doc_id, source,
         |    CAST((CAST(doc_id AS HUGEINT) + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z
         |  FROM documents),
         |${smStages()}
         |b AS (SELECT doc_id, source, CAST(xor(z, z >> 31) % 100 AS INTEGER) AS bucket FROM h3)
         |SELECT source,
         |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
         |  count(*) AS n
         |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (spark, dir) => {
        val bucket = hashBucket(col("doc_id"), 100)
        table(spark, dir, "documents")
          .withColumn("bucket", bucket)
          .withColumn("split", when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val").otherwise("test"))
          .groupBy("source", "split").agg(count(lit(1)).as("n"))
          .orderBy("source", "split")
      }),

    // Rank-distribution window trio (percent_rank / cume_dist / ntile)
    // over per-supplier revenue within each return flag. Revenue is
    // rounded BEFORE ranking on both sides: the rank order must not
    // depend on cross-engine float-summation noise, and ntile
    // additionally depends on exact row order, so the ordering key is
    // (rounded revenue, suppkey) — fully deterministic. Aggregate-
    // then-window: the window input is |flags| x |suppliers| rows,
    // not lineitem.
    // revenue is a DECIMAL sum (exact, order-independent — see q01):
    // the window ORDERS BY revenue, so even a last-ulp double
    // difference between engines can swap two rows and shift every
    // rank/cume after the swap — the sf1 probe caught one such flip.
    QueryDef("q84_rank_distribution", Some(
      """WITH rev AS (
        |  SELECT l_returnflag, l_suppkey,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * CAST(1 - l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS revenue
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, l_suppkey, revenue,
        |  CAST(floor(percent_rank() OVER w * 1000000.0 + 0.5) AS BIGINT) AS pct_rank_e6,
        |  CAST(floor(cume_dist() OVER w * 1000000.0 + 0.5) AS BIGINT) AS cume_e6,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM rev
        |WINDOW w AS (PARTITION BY l_returnflag ORDER BY revenue, l_suppkey)
        |ORDER BY l_returnflag, l_suppkey""".stripMargin),
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("l_returnflag")
          .orderBy(col("revenue"), col("l_suppkey"))
        table(spark, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_suppkey"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)")
              * (lit(1) - col("l_discount")).cast("decimal(18,2)"))
            .cast("decimal(38,4)").as("revenue"))
          .select(col("l_returnflag"), col("l_suppkey"), col("revenue"),
            floor(percent_rank().over(w) * lit(1e6) + lit(0.5))
              .as("pct_rank_e6"),
            floor(cume_dist().over(w) * lit(1e6) + lit(0.5)).as("cume_e6"),
            ntile(4).over(w).as("quartile"))
          .orderBy("l_returnflag", "l_suppkey")
      }),

    // Time-series gap filling: hourly purchase revenue on a dense
    // generated spine, missing hours forward-filled with the last
    // observed value (last(_, ignoreNulls) over an unbounded-preceding
    // frame). The global window is bounded by the TIME RANGE (720
    // hours here), not the data volume — the aggregate runs first, so
    // this is safe at any corpus scale; shard by a coarser unit (day,
    // series id) if the spine itself ever grows unbounded.
    QueryDef("q85_gap_fill", Some(
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS h, count(*) AS n_events,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |spine AS (
        |  SELECT unnest(generate_series((SELECT min(h) FROM hourly),
        |    (SELECT max(h) FROM hourly), INTERVAL 1 HOUR)) AS h),
        |j AS (SELECT s.h, hourly.n_events, hourly.rev
        |  FROM spine s LEFT JOIN hourly ON s.h = hourly.h)
        |SELECT h, CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
        |  last_value(rev IGNORE NULLS) OVER
        |    (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revenue_filled,
        |  CAST(CASE WHEN n_events IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_gap
        |FROM j ORDER BY h""".stripMargin),
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val hourly = table(spark, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)"))
              .cast("decimal(38,2)").as("rev"))
        val spine = hourly.agg(min("h").as("mn"), max("h").as("mx"))
          .select(explode(sequence(col("mn"), col("mx"),
            expr("interval 1 hour"))).as("h"))
        // DAY-PARTITIONED forward fill (VERDICT r16 item 6): the
        // IGNORE-NULLS running last_value needs, per hour, the latest
        // non-null at or before it — fill WITHIN each day with a
        // day-partitioned window, and resolve the cross-day carry-in
        // driver-side from the bounded per-day last-non-null table
        // (≤ one row per day), broadcast back as a (day, carry) join.
        // No single-partition WindowExec; the fill value is the same
        // stored decimal the global frame would have picked.
        val j = spine.join(hourly, Seq("h"), "left")
          .withColumn("day", date_trunc("day", col("h")))
        val dayLast = j.filter(col("rev").isNotNull)
          .groupBy("day").agg(max(struct(col("h"), col("rev"))).as("s"))
          .select(col("day"), col("s.rev").as("last_rev"))
          .collect().map(r => (r.getTimestamp(0), r.getDecimal(1)))
          .sortBy(_._1.getTime)
        val allDays = j.select(col("day")).distinct()
          .collect().map(_.getTimestamp(0)).sortBy(_.getTime)
        var ci = 0
        var cur: java.math.BigDecimal = null
        val carries = allDays.flatMap { day =>
          while (ci < dayLast.length && dayLast(ci)._1.getTime < day.getTime) {
            cur = dayLast(ci)._2; ci += 1
          }
          Option(cur).map(c => (day, c))
        }
        import spark.implicits._
        val carryDf = carries.toSeq.toDF("day", "carry")
          .select(col("day"), col("carry").cast("decimal(38,2)").as("__carry"))
        val wd = Window.partitionBy("day").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        j.join(broadcast(carryDf), Seq("day"), "left")
          .select(col("h"),
            coalesce(col("n_events"), lit(0L)).as("n_events"),
            coalesce(last(col("rev"), ignoreNulls = true).over(wd),
              col("__carry")).as("revenue_filled"),
            col("n_events").isNull.cast("int").as("is_gap"))
          .orderBy("h")
      }),

    // Deterministic global corpus shuffle, the sharded formulation:
    // shard = splitmix64(id) mod S, position within shard by the full
    // mixed value (unsigned order — Spark compares the signed long
    // xor'd with Long.MinValue, which is exactly UBIGINT order). The
    // (shard, pos) composite defines the global permutation without a
    // single-partition global window; orderBy(rand()) is neither
    // stable across runs nor replayable by another engine.
    QueryDef("q82_shuffle_shards", Some(
      s"""WITH h1 AS (
         |  SELECT doc_id,
         |    CAST((CAST(doc_id AS HUGEINT) + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z
         |  FROM documents),
         |${smStages(carry = "")}
         |b AS (SELECT doc_id, CAST(xor(z, z >> 31) % 16 AS INTEGER) AS shard,
         |  xor(z, z >> 31) AS zf FROM h3)
         |SELECT shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY zf, doc_id) AS BIGINT) AS pos,
         |  doc_id
         |FROM b ORDER BY shard, pos""".stripMargin),
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.graft.Bridge
        import org.apache.spark.sql.graft.expressions.SplitMix64
        val z = Bridge.column(SplitMix64(Bridge.expression(col("doc_id"))))
        table(spark, dir, "documents")
          .select(col("doc_id"), hashBucket(col("doc_id"), 16).as("shard"), z.as("z"))
          .withColumn("pos", row_number().over(
            Window.partitionBy("shard")
              .orderBy(col("z").bitwiseXOR(lit(Long.MinValue)), col("doc_id"))).cast("long"))
          .select("shard", "pos", "doc_id")
          .orderBy("shard", "pos")
      }),

    // Sequence packing: documents -> fixed-token-budget training bins,
    // sharded by id hash so the cumulative window parallelizes. Pure
    // function of (id, token count): DuckDB replays the splitmix shard
    // AND the running-sum bin cut exactly.
    QueryDef("q64_sequence_packing", Some(
      s"""WITH h1 AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '')) AS BIGINT) AS n_tok,
         |    CAST((CAST(doc_id AS HUGEINT) + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z
         |  FROM documents),
         |${smStages(carry = ", n_tok")}
         |b AS (SELECT doc_id, n_tok, CAST(xor(z, z >> 31) % 8 AS INTEGER) AS shard FROM h3),
         |packed AS (
         |  SELECT shard, doc_id, n_tok,
         |    CAST(coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id) - n_tok, 0) AS BIGINT) AS bin_start_tok
         |  FROM b),
         |binned AS (
         |  SELECT shard, CAST(floor(bin_start_tok / 1024) AS BIGINT) AS bin, doc_id, n_tok FROM packed)
         |SELECT shard, bin, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  CAST(floor(least(CAST(sum(n_tok) AS DOUBLE) / 1024, 1.0) * 1000000.0 + 0.5) AS BIGINT) AS fill_ratio_e6
         |FROM binned GROUP BY shard, bin ORDER BY shard, bin""".stripMargin),
      (spark, dir) => {
        val docs = table(spark, dir, "documents")
          .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
        val packed = graft.operators.Packing.packSequences(docs, "doc_id", "n_tok",
          seqTokens = 1024, shards = 8)
        // hash the e6 floor form, not the operator's rounded double
        // (round-16 rule: identical IEEE ops on both engines)
        graft.operators.Packing.packingStats(packed, "n_tok", seqTokens = 1024)
          .withColumn("fill_ratio_e6",
            floor(least(col("n_tokens").cast("double") / 1024, lit(1.0))
              * lit(1e6) + lit(0.5)))
          .drop("fill_ratio")
          .orderBy("shard", "bin")
      }),

    // Cardinality sketch — the at-scale counterpart to q11's exact
    // count(distinct): HyperLogLog++ partial-aggregates map-side in
    // constant memory (one sketch per group, merged across partitions)
    // where exact distinct shuffles every distinct value. The sketch
    // VALUES can never hash-match a different engine's different
    // sketch (q69's argument), so the hashed output is the ERROR-BOUND
    // VERDICT: the engine compares its HLL++ estimate against its own
    // exact distinct count at 5x the configured rsd (0.02 => 10% —
    // HLL++ error is probabilistic, so the gate sits far outside the
    // one-sigma band; the tight 2-sigma bound stays asserted in
    // AdviceRegressionSpec) and emits the boolean; the oracle replays
    // the group keys/row counts and asserts every verdict true.
    // Scale gate (the same philosophy as the replay-flop budget): the
    // exact-distinct ground truth exists ONLY to gate the sketch, and
    // at 100x fixtures it costs more than everything it verifies (a
    // two-distinct-column aggregate Expands to 2x rows then shuffles
    // every distinct value — measured 286 s at sf10 vs 2.5 s at
    // sf0.1), so the verdict is EVALUATED below q70ExactGateMaxRows
    // (covers every correctness leg: driver sf0.01, local sf0.1, the
    // sf1 gate at 6M rows). Above the gate the bench pays sketch cost
    // only — the production path is always the sketch alone — and the
    // gate state is EXPLICIT in the output (`verdict` = 'checked' /
    // 'skipped', ADVICE r12: a constant-true column made a skipped
    // verdict hash-indistinguishable from a passed one) while the
    // oracle GENERATOR withholds, so an above-gate leg records
    // rows-only rather than a vacuous hash pass.
    QueryDef("q70_distinct_approx", None,
      (spark, dir) => {
        val li = table(spark, dir, "lineitem")
        val gateExact =
          graft.sources.TableStats.rowCountForSizing(li) <= q70ExactGateMaxRows
        def ok(approx: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =
          abs(approx.cast("double") / exact.cast("double") - 1.0) <= 5 * 0.02
        // the sketch aggregate alone — the production (above-gate) plan
        val base = li.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_rows"),
            approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("ao"),
            approx_count_distinct(col("l_partkey"), rsd = 0.02).as("ap"))
        if (!gateExact)
          base.select(col("l_returnflag"), col("n_rows"),
            lit(true).as("orders_ok"), lit(true).as("parts_ok"),
            lit("skipped").as("verdict"))
            .orderBy("l_returnflag")
        else {
          // exact ground truth as two SEPARATE distinct-then-count
          // aggregations, NOT a multi-countDistinct in the sketch agg:
          // that plans an Expand(3) — 3x the input rows, with the
          // 2704-register rsd-0.02 HLL buffers riding the expanded
          // groups — measured 4.9 s vs 1.2 s for this shape at sf0.1
          // (isolated min-of-3; sketch-only floor 0.42 s). Each
          // distinct pre-aggregates map-side to ~|distinct| rows.
          def exactDistinct(c: String, as: String) =
            li.select(col("l_returnflag"), col(c)).distinct()
              .groupBy("l_returnflag").agg(count(lit(1)).as(as))
          base
            .join(exactDistinct("l_orderkey", "eo"), Seq("l_returnflag"))
            .join(exactDistinct("l_partkey", "ep"), Seq("l_returnflag"))
            .select(col("l_returnflag"), col("n_rows"),
              ok(col("ao"), col("eo")).as("orders_ok"),
              ok(col("ap"), col("ep")).as("parts_ok"),
              lit("checked").as("verdict"))
            .orderBy("l_returnflag")
        }
      },
      oracleGen = Some((spark, dir) => {
        val n = graft.sources.TableStats.rowCountForSizing(
          table(spark, dir, "lineitem"))
        if (n > q70ExactGateMaxRows) {
          System.err.println(
            s"[oracle-gen] q70 oracle withheld: $n rows past the exact gate" +
              s" ($q70ExactGateMaxRows) — verdict not evaluated at this scale")
          None
        } else Some(
          """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
            |  true AS orders_ok, true AS parts_ok, 'checked' AS verdict
            |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      })),

    // Deterministic stratified sampling: EXACTLY n docs per source,
    // selected by splitmix64 hash rank (stable across runs/engines —
    // DuckDB replays the hash, so this is hash-compared, unlike any
    // RNG sample). The rank filter plans a WindowGroupLimit: each
    // partition keeps only its local top-n before the shuffle, so the
    // per-group sort never materializes a full group.
    QueryDef("q71_stratified_sample", Some(
      s"""WITH h1 AS (
         |  SELECT doc_id, source,
         |    CAST((CAST(doc_id AS HUGEINT) + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z
         |  FROM documents),
         |${smStages()}
         |b AS (SELECT doc_id, source, CAST(xor(z, z >> 31) % 10000 AS INTEGER) AS bucket FROM h3),
         |r AS (SELECT doc_id, source, bucket,
         |    CAST(row_number() OVER (PARTITION BY source ORDER BY bucket, doc_id) AS INTEGER) AS rn
         |  FROM b)
         |SELECT source, rn, doc_id FROM r WHERE rn <= 5
         |ORDER BY source, rn""".stripMargin),
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("source")
          .orderBy(col("bucket"), col("doc_id"))
        table(spark, dir, "documents")
          .withColumn("bucket", hashBucket(col("doc_id"), 10000))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select("source", "rn", "doc_id")
          .orderBy("source", "rn")
      }),

    // Deterministic source mixing toward target weights: membership is
    // a pure hash of the id, thresholded per source.
    QueryDef("q65_mix_sampling", Some(
      s"""WITH h1 AS (
         |  SELECT doc_id, source,
         |    CAST((CAST(doc_id AS HUGEINT) + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z
         |  FROM documents),
         |${smStages()}
         |b AS (SELECT doc_id, source, CAST(xor(z, z >> 31) % 10000 AS INTEGER) AS bucket FROM h3),
         |kept AS (
         |  SELECT doc_id, source FROM b
         |  WHERE CASE WHEN source = 'src0' THEN bucket < 2500
         |             WHEN source = 'src1' THEN bucket < 5000
         |             WHEN source = 'src2' THEN bucket < 0
         |             ELSE TRUE END)
         |SELECT source, count(*) AS n FROM kept GROUP BY source ORDER BY source""".stripMargin),
      (spark, dir) =>
        graft.operators.Packing.mixBySource(table(spark, dir, "documents"),
            "doc_id", "source",
            Map("src0" -> 0.25, "src1" -> 0.5, "src2" -> 0.0))
          .groupBy("source").agg(count(lit(1)).as("n"))
          .orderBy("source")),

    // Temperature-scaled source mixing (alpha = 0.5): per-source keep
    // probability (n_min/n_s)^(1-alpha), thresholds floor(10000*sqrt(
    // n_min/n_s)) — sqrt is correctly rounded per IEEE so DuckDB
    // replays the driver's threshold arithmetic bit-identically (pow
    // would not guarantee that). Membership is the same splitmix64
    // bucket as q62/q63/q65.
    // The fixture's `source` is uniform (no skew to temper), so the
    // query derives a skewed pseudo-source from doc_id — deterministic
    // and engine-replayable — giving the thresholds real work: web 70%
    // of docs, books 20%, code 10% → keep probs sqrt(0.1/0.7) etc.
    QueryDef("q90_temperature_mix", Some(
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 10 < 7 THEN 'web'
         |         WHEN doc_id % 10 < 9 THEN 'books' ELSE 'code' END AS source
         |  FROM documents),
         |c AS (SELECT source, count(*) AS n FROM d GROUP BY source),
         |mn AS (SELECT CAST(min(n) AS DOUBLE) AS nmin FROM c),
         |t AS (SELECT source, n, CAST(floor(10000 * sqrt(mn.nmin / CAST(c.n AS DOUBLE))) AS INTEGER) AS thr FROM c, mn),
         |h1 AS (
         |  SELECT doc_id, source,
         |    CAST((CAST(doc_id AS HUGEINT) + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z
         |  FROM d),
         |${smStages()}
         |b AS (SELECT doc_id, source, CAST(xor(z, z >> 31) % 10000 AS INTEGER) AS bucket FROM h3),
         |kept AS (
         |  SELECT b.source, count(*) AS cnt
         |  FROM b JOIN t USING (source) WHERE b.bucket < t.thr GROUP BY b.source)
         |SELECT t.source, CAST(t.n AS BIGINT) AS n_docs,
         |  CAST(coalesce(k.cnt, 0) AS BIGINT) AS n_kept
         |FROM t LEFT JOIN kept k ON t.source = k.source
         |ORDER BY t.source""".stripMargin),
      (spark, dir) => {
        val docs = table(spark, dir, "documents")
          .select(col("doc_id"),
            when(col("doc_id") % 10 < 7, "web")
              .when(col("doc_id") % 10 < 9, "books")
              .otherwise("code").as("source"))
        val kept = graft.operators.Packing
          .temperatureMix(docs, "doc_id", "source", alpha = 0.5)
          .groupBy("source").agg(count(lit(1)).as("n_kept"))
        docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
          .join(kept, Seq("source"), "left")
          .na.fill(0L, Seq("n_kept"))
          .orderBy("source")
      }),

    // Positional lateral explode (posexplode / unnest-with-index):
    // the generator-operator shape tokenized pipelines use constantly.
    QueryDef("q68_posexplode", Some(
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '') AS tk
        |  FROM documents WHERE doc_id < 20)
        |SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, tk[i] AS token
        |FROM toks, unnest(range(1, len(tk) + 1)) AS u(i)
        |ORDER BY doc_id, pos""".stripMargin),
      (spark, dir) =>
        table(spark, dir, "documents")
          .filter(col("doc_id") < 20)
          .select(col("doc_id"),
            posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "token")))
          .orderBy("doc_id", "pos")),

    QueryDef("q67_rank_functions", Some(
      """SELECT c_custkey,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  CAST(floor(percent_rank() OVER w * 1000000.0 + 0.5) AS BIGINT) AS pct_rank_e6,
        |  CAST(floor(cume_dist() OVER w * 1000000.0 + 0.5) AS BIGINT) AS cume_e6
        |FROM customer
        |WHERE c_nationkey = 7
        |WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_custkey""".stripMargin),
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        // RANGE-PARTITIONED global rank (VERDICT r16 item 6): a bare
        // Window.orderBy moves every row to ONE partition (WindowExec
        // warns). Instead: repartitionByRange on the sort key, rank
        // locally per partition, add driver-merged partition offsets
        // (one bounded count per partition — the offset-merge shape
        // that survives a 100 TB sort key). ntile/percent_rank/
        // cume_dist all derive from (global rank, n) exactly because
        // the (c_acctbal, c_custkey) sort key is UNIQUE (no peers):
        //   percent_rank = (rank-1)/(n-1)   (0.0 when n = 1)
        //   cume_dist    = rank/n
        //   ntile(4)     = the SQL-standard first-(n%4)-buckets-larger
        // with the same IEEE double divisions the window functions do.
        // The localCheckpoint pins ONE materialized pid assignment so
        // the offset job and the output job cannot disagree on
        // boundaries (repartitionByRange samples per RDD id).
        val base = table(spark, dir, "customer")
          .filter(col("c_nationkey") === 7)
          .select(col("c_custkey"), col("c_acctbal"))
        val parted = base
          .repartitionByRange(8, col("c_acctbal").desc, col("c_custkey"))
          .withColumn("__pid", spark_partition_id())
          .localCheckpoint(true)
        val counts = parted.groupBy("__pid").count()
          .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
        val n = counts.map(_._2).sum
        val offsets = counts.map(_._1)
          .zip(counts.scanLeft(0L)(_ + _._2).dropRight(1)).toMap
        val q4 = n / 4
        val r4 = n % 4
        val lrn = row_number().over(Window.partitionBy("__pid")
          .orderBy(col("c_acctbal").desc, col("c_custkey")))
        val rank = element_at(typedlit(offsets), col("__pid")) + lrn
        // Spark's `/` on longs is double division; the divisions below
        // are exact in double for any realistic n, floor recovers the
        // integer bucket
        val quartile = when(lit(q4) === 0, rank)
          .when(rank <= lit(r4 * (q4 + 1)),
            floor((rank - 1) / lit(math.max(q4 + 1, 1L).toDouble)) + 1)
          .otherwise(lit(r4) + floor((rank - 1 - lit(r4 * (q4 + 1)))
            / lit(math.max(q4, 1L).toDouble)) + 1)
        val pctRank = if (n <= 1L) lit(0.0)
          else (rank - 1).cast("double") / lit((n - 1).toDouble)
        parted
          .select(col("c_custkey"),
            quartile.cast("int").as("quartile"),
            floor(pctRank * lit(1e6) + lit(0.5)).as("pct_rank_e6"),
            floor(rank.cast("double") / lit(n.toDouble) * lit(1e6)
              + lit(0.5)).as("cume_e6"))
          .orderBy("c_custkey")
      }),

    // Value-navigation window functions (first/last/nth) with explicit
    // frames — the remaining window family member the suite lacked.
    // Frame semantics matter: last_value needs the full-partition frame
    // (the default RANGE ... CURRENT ROW would return the current row).
    QueryDef("q79_value_windows", Some(
      """SELECT o_custkey, o_orderkey,
        |  CAST(first_value(o_orderkey) OVER w AS BIGINT) AS first_order,
        |  CAST(last_value(o_orderkey) OVER w AS BIGINT) AS last_order,
        |  CAST(nth_value(o_orderkey, 2) OVER w AS BIGINT) AS second_order,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |    - first_value(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DECIMAL(38,2)) AS price_vs_first
        |FROM orders
        |WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin),
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        table(spark, dir, "orders")
          .filter(col("o_custkey") < 50)
          .select(col("o_custkey"), col("o_orderkey"),
            first(col("o_orderkey")).over(w).as("first_order"),
            last(col("o_orderkey")).over(w).as("last_order"),
            nth_value(col("o_orderkey"), 2).over(w).as("second_order"),
            (col("o_totalprice").cast("decimal(18,2)")
              - first(col("o_totalprice").cast("decimal(18,2)")).over(w))
              .cast("decimal(38,2)").as("price_vs_first"))
          .orderBy("o_custkey", "o_orderkey")
      }),

    QueryDef("q63_sample_10pct", Some(
      s"""WITH h1 AS (
         |  SELECT doc_id,
         |    CAST((CAST(doc_id AS HUGEINT) + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z
         |  FROM documents),
         |${smStages(carry = "")}
         |b AS (SELECT doc_id, CAST(xor(z, z >> 31) % 100 AS INTEGER) AS bucket FROM h3)
         |SELECT doc_id, bucket FROM b WHERE bucket < 10 ORDER BY doc_id""".stripMargin),
      (spark, dir) =>
        table(spark, dir, "documents")
          .withColumn("bucket", hashBucket(col("doc_id"), 100))
          .filter(col("bucket") < 10)
          .select("doc_id", "bucket")
          .orderBy("doc_id")))

  /** `hash_bucket` column (splitmix64 + unsigned mod). */
  private def hashBucket(c: org.apache.spark.sql.Column, n: Int) = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.graft.expressions.HashBucket
    Bridge.column(HashBucket(Bridge.expression(c), n))
  }

  /** The two splitmix64 multiply stages as DuckDB CTEs: 64-bit
    * wraparound multiplication done in HUGEINT by splitting the left
    * operand into 32-bit halves (the full 128-bit product would
    * overflow INT128). `carry` = extra columns threaded through. */
  /** The q98/q99 static replay SQL — full splitmix + E-S key
    * arithmetic; EMITTED only through TextLutOracles' margin guards
    * (the ln is libm-variant, so the replay is trusted only when no
    * key sits within noise of a selection or rounding boundary). */
  private lazy val q98StaticSql: String =
    s"""WITH h1 AS (
       |  SELECT doc_id, source, n_chars,
       |    CAST((CAST(doc_id AS HUGEINT) + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z
       |  FROM documents),
       |${smStages(", source, n_chars")}
       |k AS (
       |  SELECT doc_id, source, n_chars,
       |    -ln((CAST(xor(z, z >> 31) // 2048 AS DOUBLE) + 0.5) / 9007199254740992.0)
       |      / n_chars AS sample_key
       |  FROM h3)
       |SELECT doc_id, source, n_chars,
       |  round(sample_key * 1000000, 6) AS key_e6
       |FROM k ORDER BY sample_key, doc_id LIMIT 25""".stripMargin

  private lazy val q99StaticSql: String =
    s"""WITH h1 AS (
       |  SELECT doc_id, source, n_chars,
       |    CAST((CAST(doc_id AS HUGEINT) + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z
       |  FROM documents),
       |${smStages(", source, n_chars")}
       |k AS (
       |  SELECT doc_id, source, n_chars,
       |    -ln((CAST(xor(z, z >> 31) // 2048 AS DOUBLE) + 0.5) / 9007199254740992.0)
       |      / n_chars AS sample_key
       |  FROM h3),
       |r AS (
       |  SELECT doc_id, source, n_chars, sample_key,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY sample_key, doc_id) AS INTEGER) AS rn
       |  FROM k)
       |SELECT doc_id, source, n_chars, rn,
       |  round(sample_key * 1000000, 6) AS key_e6
       |FROM r WHERE rn <= 3 ORDER BY source, rn""".stripMargin

  private def smStages(carry: String = ", source"): String = {
    def stage(name: String, from: String, shift: Int, const: String) =
      s"""$name AS (
         |  SELECT doc_id$carry,
         |    CAST(((CAST(xor(z, z >> $shift) AS HUGEINT) // 4294967296 * $const) % 18446744073709551616 * 4294967296
         |      + (CAST(xor(z, z >> $shift) AS HUGEINT) % 4294967296) * $const) % 18446744073709551616 AS UBIGINT) AS z
         |  FROM $from),""".stripMargin
    stage("h2", "h1", 30, "13787848793156543929") + "\n" +
      stage("h3", "h2", 27, "10723151780598845931")
  }
}
