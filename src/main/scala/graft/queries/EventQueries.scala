package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Sessionize}

/**
 * Event-stream operator coverage on `events.parquet`: JSON extraction,
 * tumbling windows (the batch mirror of the Structured Streaming path in
 * graft.streaming), gap sessionization, and the as-of join.
 */
object EventQueries {
  import Tables.table

  def defs: Seq[QueryDef] = Seq(

    QueryDef("q40_events_json", Some(
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS value_sum,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin),
      (spark, dir) =>
        table(spark, dir, "events")
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)"))
              .cast("decimal(38,2)").as("value_sum"),
            sum(col("k")).as("k_sum"))
          .orderBy(col("event_type"))),

    QueryDef("q41_tumbling_window", Some(
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS value_sum
        |FROM events
        |GROUP BY date_trunc('hour', ts), event_type
        |ORDER BY window_start, event_type""".stripMargin),
      (spark, dir) =>
        table(spark, dir, "events")
          .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)"))
              .cast("decimal(38,2)").as("value_sum"))
          .orderBy("window_start", "event_type")),

    QueryDef("q42_sessionize", Some(
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS value_sum
        |FROM marked
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin),
      (spark, dir) =>
        Sessionize.sessionize(table(spark, dir, "events"), "user_id", "ts",
            gapSeconds = 1800, tieBreak = "event_id")
          .groupBy(col("user_id"))
          .agg((max(col("session_id")) + 1).cast("long").as("n_sessions"),
            count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)"))
              .cast("decimal(38,2)").as("value_sum"))
          .orderBy(col("user_id"))),

    QueryDef("q43_asof_join", Some(
      """SELECT c.event_id, c.user_id, c.ts,
        |  CAST(s.value AS DECIMAL(18,2)) AS asof_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON c.user_id = s.user_id AND c.ts >= s.ts
        |ORDER BY c.event_id""".stripMargin),
      (spark, dir) => {
        val ev = table(spark, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts"), col("event_id").as("sig_id"), col("value"))
        AsOfJoin.asOf(clicks, signups, keys = Seq("user_id"),
            leftTime = "ts", rightTime = "ts",
            rightVals = Seq("value"), tieBreak = "sig_id")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("asof_value").cast("decimal(18,2)").as("asof_value"))
          .orderBy("event_id")
      }),

    QueryDef("q44_sliding_window", Some(
      // 1h windows sliding by 30m: each event belongs to the windows
      // starting at floor30(ts) and floor30(ts)-30m. make_timestamp
      // keeps the computation timezone-free (to_timestamp would round-
      // trip through TIMESTAMPTZ and shift under a non-UTC session).
      """WITH w AS (
        |  SELECT event_type, value,
        |    unnest([
        |      make_timestamp(CAST(floor(epoch(ts)/1800)*1800*1000000 AS BIGINT)),
        |      make_timestamp(CAST((floor(epoch(ts)/1800)*1800 - 1800)*1000000 AS BIGINT))
        |    ]) AS window_start
        |  FROM events)
        |SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
        |  event_type, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS value_sum
        |FROM w
        |GROUP BY 1, 2, 3
        |ORDER BY window_start, event_type""".stripMargin),
      (spark, dir) =>
        table(spark, dir, "events")
          .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)"))
              .cast("decimal(38,2)").as("value_sum"))
          .select(col("window.start").as("window_start"),
            col("window.end").as("window_end"), col("event_type"), col("n"), col("value_sum"))
          .orderBy("window_start", "event_type")),

    // lead/lag navigation: per-user inter-event gaps and value deltas.
    // Gaps as BIGINT microseconds (unix_micros/epoch_us on both sides —
    // integer arithmetic, no fractional-second cast ambiguity); value
    // deltas as exact DECIMAL subtraction of the 2dp fixture values
    // (round-16 rule: no rounded double in the hashed projection).
    // The window partitions by user_id — parallel across users, and the
    // per-user event count is bounded by activity, not corpus size.
    QueryDef("q89_lead_lag", Some(
      """WITH e AS (
        |  SELECT user_id, event_id, ts, CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events WHERE user_id < 5)
        |SELECT user_id, event_id, ts,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
        |  CAST(v - lag(v) OVER w AS DECIMAL(38,2)) AS value_delta,
        |  CAST(lead(v) OVER w - v AS DECIMAL(38,2)) AS next_delta
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, ts, event_id""".stripMargin),
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        table(spark, dir, "events")
          .filter(col("user_id") < 5)
          .withColumn("v", col("value").cast("decimal(18,2)"))
          .select(col("user_id"), col("event_id"), col("ts"),
            (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"),
            (col("v") - lag(col("v"), 1).over(w))
              .cast("decimal(38,2)").as("value_delta"),
            (lead(col("v"), 1).over(w) - col("v"))
              .cast("decimal(38,2)").as("next_delta"))
          .orderBy("user_id", "ts", "event_id")
      }),

    // Event-type transition matrix (first-order Markov estimate): the
    // next event per user stream via lead() over (user, time), pair
    // counts, and row-normalized transition probabilities. The window
    // partitions by user — parallel across users, per-partition size
    // bounded by one user's activity.
    QueryDef("q102_event_transitions", Some(
      """WITH seq AS (
        |  SELECT user_id, event_type AS cur,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |pairs AS (
        |  SELECT cur, nxt, count(*) AS n FROM seq
        |  WHERE nxt IS NOT NULL GROUP BY cur, nxt),
        |totals AS (SELECT cur, sum(n) AS row_total FROM pairs GROUP BY cur)
        |SELECT p.cur, p.nxt, p.n,
        |  CAST(floor(CAST(p.n AS DOUBLE) / t.row_total * 1000000.0 + 0.5) AS BIGINT) AS prob_e6
        |FROM pairs p JOIN totals t USING (cur)
        |ORDER BY cur, nxt""".stripMargin),
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val pairs = table(spark, dir, "events")
          .select(col("user_id"), col("event_type").as("cur"),
            lead(col("event_type"), 1).over(w).as("nxt"))
          .filter(col("nxt").isNotNull)
          .groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
        // row totals as a window over the AGGREGATED pairs (a
        // |event_types|^2-row relation): a groupBy+join here would
        // re-execute the whole lead()+agg pipeline a second time for
        // the broadcast side — the round-5 q102 run variance
        pairs
          .withColumn("row_total", sum("n").over(Window.partitionBy("cur")))
          // e6 micro-units via the floor formula (round-16 hash rule):
          // identical IEEE ops on both engines, no decimal tie class
          .select(col("cur"), col("nxt"), col("n"),
            floor(col("n").cast("double") / col("row_total") * lit(1e6)
              + lit(0.5)).as("prob_e6"))
          .orderBy("cur", "nxt")
      }),

    // Cohort retention — users grouped by FIRST active day, activity
    // tracked at day offsets 0..7: two aggregations over distinct
    // (user, day) pairs plus a cohort join. The distinct collapses
    // event volume to user-days before anything wide happens. The
    // cohort table is #users rows — it grows with the data, so the
    // days⋈cohort join is unhinted (AQE broadcasts when it fits;
    // both sides arrive hash-partitioned by user_id from their own
    // aggregations, so the shuffle fallback reuses exchanges). Only
    // `sizes` (one row per calendar day — bounded by time, not data)
    // keeps an explicit broadcast.
    QueryDef("q101_cohort_retention", Some(
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events),
        |cohort AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY 1),
        |sizes AS (SELECT cohort_day, count(*) AS cohort_size FROM cohort GROUP BY 1),
        |act AS (
        |  SELECT c.cohort_day,
        |    CAST(date_diff('day', c.cohort_day, d.day) AS INTEGER) AS offset_day,
        |    count(DISTINCT d.user_id) AS n_active
        |  FROM days d JOIN cohort c ON d.user_id = c.user_id
        |  WHERE date_diff('day', c.cohort_day, d.day) <= 7
        |  GROUP BY 1, 2)
        |SELECT a.cohort_day, a.offset_day, a.n_active, s.cohort_size,
        |  CAST(floor(CAST(a.n_active AS DOUBLE) / s.cohort_size * 1000000.0 + 0.5) AS BIGINT) AS retention_e6
        |FROM act a JOIN sizes s USING (cohort_day)
        |ORDER BY cohort_day, offset_day""".stripMargin),
      (spark, dir) => {
        val days = table(spark, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val cohort = days.groupBy("user_id").agg(min("day").as("cohort_day"))
        val sizes = cohort.groupBy("cohort_day")
          .agg(count(lit(1)).as("cohort_size"))
        days.join(cohort, "user_id")
          .withColumn("offset_day", datediff(col("day"), col("cohort_day")))
          .filter(col("offset_day") <= 7)
          .groupBy("cohort_day", "offset_day")
          .agg(countDistinct(col("user_id")).as("n_active"))
          .join(broadcast(sizes), "cohort_day")
          .select(col("cohort_day"), col("offset_day"), col("n_active"),
            col("cohort_size"),
            floor(col("n_active").cast("double") / col("cohort_size")
              * lit(1e6) + lit(0.5)).as("retention_e6"))
          .orderBy("cohort_day", "offset_day")
      }),

    // Ordered funnel (view -> click -> purchase): a user reaches step k
    // only via events strictly AFTER their step k-1 time — the
    // behavioral-analytics pattern windows can't express directly
    // (each step's anchor is the previous step's aggregate). Three
    // filtered aggregates chained by joins on user_id: the events
    // table is scanned per step with the type filter pushed to
    // parquet. The step tables are #users rows — they grow with the
    // data, so the joins are unhinted: AQE broadcasts a step table at
    // runtime when it fits, and at cluster scale the shuffle fallback
    // is already keyed by user_id on both sides (each step's groupBy
    // produces that partitioning), so the chain adds no extra wide
    // exchange.
    QueryDef("q94_funnel", Some(
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
        |SELECT 1 AS step, 'view' AS name, count(*) AS users FROM s1
        |UNION ALL SELECT 2, 'view>click', count(*) FROM s2
        |UNION ALL SELECT 3, 'view>click>purchase', count(*) FROM s3
        |ORDER BY step""".stripMargin),
      (spark, dir) => {
        val e = table(spark, dir, "events").select("user_id", "event_type", "ts")
        val s1 = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val s2 = e.filter(col("event_type") === "click")
          .join(s1, "user_id")
          .filter(col("ts") > col("t1"))
          .groupBy("user_id").agg(min("ts").as("t2"))
        val s3 = e.filter(col("event_type") === "purchase")
          .join(s2, "user_id")
          .filter(col("ts") > col("t2"))
          .groupBy("user_id").agg(min("ts").as("t3"))
        def row(step: Int, name: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)).as("users"))
            .select(lit(step).as("step"), lit(name).as("name"), col("users"))
        row(1, "view", s1)
          .unionByName(row(2, "view>click", s2))
          .unionByName(row(3, "view>click>purchase", s3))
          .orderBy("step")
      }))
}
