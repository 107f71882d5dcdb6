package graft.ops

import graft.{OpModule, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream product analytics — the OLAP trio every events table
  * eventually answers (resampling onto a regular grid, cohort
  * retention, funnel conversion), expressed as single Catalyst plans
  * keyed on the entity so each parallelizes over users at any scale.
  * Extends the reference's event-table surface (§2 events queries)
  * with the workload shapes its users run downstream.
  */
object AnalyticsOps extends OpModule {

  val qs: Seq[Q] = Seq(
    // ev1 — resample each user's irregular value series onto a DAILY
    // grid with last-observation-carried-forward (LOCF — exact, unlike
    // float interpolation): generate the per-user day grid with
    // sequence(), union it under the raw events, and run ONE per-user
    // ordered window whose last_value(IGNORE NULLS) carries the latest
    // reading onto every grid row (the j8 merged-stream as-of pass onto
    // a synthetic right side). Grid rows before a user's first reading
    // stay null by design. One window exchange keyed on user_id; grid
    // size is span-days × users, independent of event count.
    Q("ev1_resample_locf", Some(
      """WITH ev AS (SELECT user_id, ts, value, event_id FROM events),
        |sp AS (SELECT user_id, date_trunc('day', min(ts)) AS d0,
        |              date_trunc('day', max(ts)) AS d1 FROM ev GROUP BY 1),
        |g AS (SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS gts FROM sp),
        |u AS (SELECT user_id, ts, value, 0 AS is_grid, event_id FROM ev
        |      UNION ALL SELECT user_id, gts, NULL, 1, NULL FROM g),
        |l AS (SELECT user_id, ts, is_grid,
        |        last_value(value IGNORE NULLS) OVER (
        |          PARTITION BY user_id ORDER BY ts, is_grid, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf
        |      FROM u)
        |SELECT user_id, ts AS grid_ts, locf FROM l WHERE is_grid = 1
        |ORDER BY user_id, grid_ts""".stripMargin),
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .select(col("user_id"), col("ts"), col("value"), col("event_id"))
        val grid = ev.groupBy("user_id")
          .agg(date_trunc("day", min("ts")).as("d0"), date_trunc("day", max("ts")).as("d1"))
          .select(col("user_id"),
            explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("ts"))
          .withColumn("value", lit(null).cast("double"))
          .withColumn("is_grid", lit(1))
          .withColumn("event_id", lit(null).cast("long"))
        val tagged = ev.withColumn("is_grid", lit(0))
          .unionByName(grid.select("user_id", "ts", "value", "is_grid", "event_id"))
        val w = Window.partitionBy("user_id").orderBy("ts", "is_grid", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tagged
          .withColumn("locf", last("value", ignoreNulls = true).over(w))
          .filter(col("is_grid") === 1)
          .select(col("user_id"), col("ts").cast("timestamp_ntz").as("grid_ts"), col("locf"))
          .orderBy("user_id", "grid_ts")
      }),

    // ev2 — weekly cohort retention: a user's cohort is the Monday of
    // their FIRST event's week; each later event lands at an integer
    // week offset from it (both ends week-truncated, so the day
    // difference is exactly divisible by 7). Output is the classic
    // retention matrix (cohort_week × week_offset → distinct users).
    // Two aggregations and a user-keyed join — the cohort table is one
    // row per user, broadcastable far beyond any real user count.
    Q("ev2_cohort_retention", Some(
      """WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |           FROM events GROUP BY user_id)
        |SELECT f.cohort_week, date_diff('day', f.cohort_week,
        |         date_trunc('week', e.ts)) // 7 AS week_offset,
        |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM events e JOIN f ON f.user_id = e.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        val cohorts = ev.groupBy("user_id")
          .agg(date_trunc("week", min("ts")).as("cohort_week"))
        ev.join(cohorts, "user_id")
          .withColumn("week_offset",
            (datediff(date_trunc("week", col("ts")), col("cohort_week")) / 7)
              .cast("long"))
          .groupBy(col("cohort_week"), col("week_offset"))
          .agg(countDistinct("user_id").as("n_users"))
          .select(col("cohort_week").cast("timestamp_ntz").as("cohort_week"),
            col("week_offset"), col("n_users"))
          .orderBy("cohort_week", "week_offset")
      }),

    // ev3 — strict-order funnel conversion (view → click → purchase):
    // a user converts a stage only with an event STRICTLY AFTER their
    // earliest completion of the previous stage — the sequence
    // semantics a naive per-type count gets wrong. Three per-user min
    // aggregations chained by user-keyed joins (each stage table is one
    // row per qualifying user); the final count is a single row.
    Q("ev3_funnel", Some(
      """WITH v AS (SELECT user_id, min(ts) AS tv FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS tc FROM events e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts > v.tv GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS tp FROM events e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_click_after_view,
        |       (SELECT count(*) FROM p) AS n_purchase_after_click""".stripMargin),
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        def stage(typ: String, prev: org.apache.spark.sql.DataFrame,
            prevTs: String, out: String) =
          ev.filter(col("event_type") === typ)
            .join(prev, "user_id")
            .filter(col("ts") > col(prevTs))
            .groupBy("user_id").agg(min("ts").as(out))
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("tv"))
        val c = stage("click", v, "tv", "tc")
        val p = stage("purchase", c, "tc", "tp")
        v.agg(count(lit(1)).as("n_view"))
          .crossJoin(c.agg(count(lit(1)).as("n_click_after_view")))
          .crossJoin(p.agg(count(lit(1)).as("n_purchase_after_click")))
      }),

    // ev4 — RFM segmentation: per user, recency (days since last
    // event), frequency (event count) and monetary (exact decimal value
    // sum), each cut into quartiles — the classic user-scoring shape.
    // The quartile windows run over the per-USER aggregate (cardinality
    // = users, already corpus-reduced); this is the EXACT small-scale/
    // audit twin — at user counts where even that sort dominates, ev4b
    // below cuts the same quartiles from per-dimension histograms with
    // no global sort. Ties break on user_id so both engines cut
    // identically.
    Q("ev4_rfm_segments", Some(
      """WITH m AS (SELECT max(date_trunc('day', ts)) AS d1 FROM events),
        |u AS (SELECT user_id,
        |        date_diff('day', date_trunc('day', max(ts)), (SELECT d1 FROM m)) AS recency_days,
        |        count(*) AS frequency,
        |        CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS monetary
        |      FROM events GROUP BY user_id)
        |SELECT user_id, recency_days, CAST(frequency AS BIGINT) AS frequency, monetary,
        |  CAST(ntile(4) OVER (ORDER BY recency_days ASC, user_id ASC) AS BIGINT) AS r_quartile,
        |  CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id ASC) AS BIGINT) AS f_quartile,
        |  CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id ASC) AS BIGINT) AS m_quartile
        |FROM u ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        val u = ev.crossJoin(broadcast(
            ev.agg(date_trunc("day", max("ts")).as("d1"))))
          .groupBy("user_id")
          .agg(datediff(first("d1"), date_trunc("day", max("ts"))).cast("long")
            .as("recency_days"),
            count(lit(1)).as("frequency"),
            sum(col("value").cast(DecimalType(38, 4))).cast("double").as("monetary"))
        u.withColumn("r_quartile", ntile(4).over(
            Window.orderBy(col("recency_days").asc, col("user_id").asc)).cast("long"))
          .withColumn("f_quartile", ntile(4).over(
            Window.orderBy(col("frequency").desc, col("user_id").asc)).cast("long"))
          .withColumn("m_quartile", ntile(4).over(
            Window.orderBy(col("monetary").desc, col("user_id").asc)).cast("long"))
          .select("user_id", "recency_days", "frequency", "monetary",
            "r_quartile", "f_quartile", "m_quartile")
          .orderBy("user_id")
      }),

    // ev4b — the 100× SCALE PATH for ev4's RFM quartiles (the x17b
    // pattern). ev4's three `ntile` windows are GLOBAL sorts over the
    // per-user aggregate — at 10^8+ users each is a one-task sort. Here
    // every dimension is cut from a 1024-bin histogram instead: binning
    // is INTEGER arithmetic over broadcast (min, max) bounds — monetary
    // bins on the 1e4-scaled exact DECIMAL sum cast to BIGINT, so every
    // bin edge is integer-exact on both engines and the query stays
    // fully DuckDB-oracled — the per-bin COUNTS (≤ 1024 rows/dim at any
    // corpus size) carry all the rank information, cumulative counts
    // over the tiny histogram assign each bin its quartile, and users
    // inherit quartiles through three broadcast joins. The only windows
    // run over histogram cardinality, never users. Users in a
    // quartile-straddling bin land whole-bin on one side — the
    // deterministic approximation AnalyticsSpec bounds against ev4's
    // exact ntile twin.
    Q("ev4b_rfm_segments_hist", Some(rfmHistOracleSql),
      (s, dir) => rfmSegmentsHist(s, dir)),

    // ev5 — rolling active users (DAU / 7-day WAU per day): rolling
    // COUNT DISTINCT is the one aggregate window frames cannot express
    // (no distinct over a moving frame), so it runs as the standard
    // CONTRIBUTION EXPLODE: each (user, active-day) pair contributes to
    // the 7 window-end days it falls inside, then one distinct count
    // per end day. Work is |user-days| × 7 rows with 16-byte keys —
    // linear in activity, never quadratic in days — and the explode is
    // map-side; both distinct aggregations shuffle on (day, user).
    // Window ends are restricted to observed calendar days so both
    // engines agree on the domain.
    Q("ev5_rolling_active", Some(
      """WITH ad AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events),
        |cal AS (SELECT DISTINCT d FROM ad),
        |dau AS (SELECT d, count(*) AS dau FROM ad GROUP BY d),
        |contrib AS (SELECT user_id,
        |              unnest(generate_series(d, d + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS x
        |            FROM ad),
        |wau AS (SELECT c.x AS d, CAST(count(DISTINCT c.user_id) AS BIGINT) AS wau
        |        FROM contrib c JOIN cal ON cal.d = c.x GROUP BY 1)
        |SELECT dau.d AS day, CAST(dau.dau AS BIGINT) AS dau, wau.wau
        |FROM dau JOIN wau ON wau.d = dau.d ORDER BY day""".stripMargin),
      (s, dir) => {
        // three consumers (cal, dau, wau) — truncate once or the events
        // scan + the user-day distinct shuffle re-execute per branch
        val ad = Tables(s, dir, "events")
          .select(col("user_id"), date_trunc("day", col("ts")).as("d")).distinct()
          .localCheckpoint(true)
        val cal = ad.select("d").distinct()
        val dau = ad.groupBy("d").agg(count(lit(1)).as("dau"))
        val wau = ad
          .select(col("user_id"),
            explode(sequence(col("d"), col("d") + expr("interval 6 days"),
              expr("interval 1 day"))).as("x"))
          .join(cal.withColumnRenamed("d", "x"), "x")
          .groupBy(col("x").as("d"))
          .agg(countDistinct("user_id").as("wau"))
        dau.join(wau, "d")
          .select(col("d").cast("timestamp_ntz").as("day"),
            col("dau").cast("long").as("dau"), col("wau"))
          .orderBy("day")
      }),

    // ev6 — growth accounting: per day, NEW users (first-ever event),
    // RETURNING users (active but seen before) and the cumulative user
    // count — the activation/retention decomposition every growth
    // dashboard opens with. First-seen day is one per-user min; the
    // daily split is a user-day distinct joined back on it; the
    // cumulative curve is a running sum over the (tiny) per-day new
    // counts, so the only ordered window runs over calendar cardinality,
    // never users or events.
    Q("ev6_growth_accounting", Some(
      """WITH ad AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events),
        |fs AS (SELECT user_id, min(d) AS d0 FROM ad GROUP BY user_id),
        |daily AS (SELECT ad.d,
        |            CAST(sum(CASE WHEN ad.d = fs.d0 THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
        |            CAST(sum(CASE WHEN ad.d = fs.d0 THEN 0 ELSE 1 END) AS BIGINT) AS returning_users
        |          FROM ad JOIN fs ON fs.user_id = ad.user_id GROUP BY ad.d)
        |SELECT d AS day, new_users, returning_users,
        |  CAST(sum(new_users) OVER (ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumulative_users
        |FROM daily ORDER BY day""".stripMargin),
      (s, dir) => {
        // two consumers (fs, the daily join) — truncate once, as ev5
        val ad = Tables(s, dir, "events")
          .select(col("user_id"), date_trunc("day", col("ts")).as("d")).distinct()
          .localCheckpoint(true)
        val fs = ad.groupBy("user_id").agg(min("d").as("d0"))
        val daily = ad.join(fs, "user_id")
          .groupBy("d")
          .agg(sum(when(col("d") === col("d0"), 1).otherwise(0)).cast("long").as("new_users"),
            sum(when(col("d") === col("d0"), 0).otherwise(1)).cast("long").as("returning_users"))
        daily
          .withColumn("cumulative_users", sum("new_users").over(
            Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"))
          .select(col("d").cast("timestamp_ntz").as("day"),
            col("new_users"), col("returning_users"), col("cumulative_users"))
          .orderBy("day")
      })
  )

  /** ev4b implementation — see the Q above for the scale argument; the
    * bin rule and quartile-edge machinery are [[HistCut]]'s, shared
    * with w3b so the cross-engine-exact cut cannot drift between call
    * sites. Recency cuts ascending (recent = quartile 1); frequency and
    * monetary cut descending (heavy/valuable = 1).
    */
  def rfmSegmentsHist(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val u = ev.crossJoin(broadcast(
        ev.agg(date_trunc("day", max("ts")).as("d1"))))
      .groupBy("user_id")
      .agg(datediff(first("d1"), date_trunc("day", max("ts"))).cast("long")
        .as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(col("value").cast(DecimalType(38, 4))).as("mdec"))
      .withColumn("monetary", col("mdec").cast("double"))
      // exact integer image of the decimal sum (scale 4 → ×10^4): bin
      // edges computed on it are integer arithmetic, never float
      .withColumn("monetary_i", (col("mdec") * 10000).cast("long"))
      .drop("mdec")
      // feeds both the broadcast bounds agg and `b` — truncate once or
      // the events scan + per-user groupBy execute once per consumer
      .localCheckpoint(true)
    val bounds = u.agg(
      min("recency_days").as("r_lo"), max("recency_days").as("r_hi"),
      min("frequency").as("f_lo"), max("frequency").as("f_hi"),
      min("monetary_i").as("m_lo"), max("monetary_i").as("m_hi"))
    val b = u.crossJoin(broadcast(bounds))
      .withColumn("r_bin", expr(HistCut.binExpr("recency_days", "r_lo", "r_hi")))
      .withColumn("f_bin", expr(HistCut.binExpr("frequency", "f_lo", "f_hi")))
      .withColumn("m_bin", expr(HistCut.binExpr("monetary_i", "m_lo", "m_hi")))
      .localCheckpoint(true) // feeds three histogram aggs + the final join
    b.join(broadcast(HistCut.quartileCuts(b, "r_bin", asc = true, "r_quartile")), Seq("r_bin"))
      .join(broadcast(HistCut.quartileCuts(b, "f_bin", asc = false, "f_quartile")), Seq("f_bin"))
      .join(broadcast(HistCut.quartileCuts(b, "m_bin", asc = false, "m_quartile")), Seq("m_bin"))
      .select("user_id", "recency_days", "frequency", "monetary",
        "r_quartile", "f_quartile", "m_quartile")
      .orderBy("user_id")
  }

  /** DuckDB twin of [[rfmSegmentsHist]] — bin rule and cut CTEs from
    * [[HistCut]], the same single source as the Spark side.
    */
  private def rfmHistOracleSql: String =
    s"""WITH m AS (SELECT max(date_trunc('day', ts)) AS d1 FROM events),
       |u AS (SELECT user_id,
       |        date_diff('day', date_trunc('day', max(ts)), (SELECT d1 FROM m)) AS recency_days,
       |        CAST(count(*) AS BIGINT) AS frequency,
       |        CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS monetary,
       |        CAST(sum(CAST(value AS DECIMAL(38,4))) * 10000 AS BIGINT) AS monetary_i
       |      FROM events GROUP BY user_id),
       |bd AS (SELECT min(recency_days) AS r_lo, max(recency_days) AS r_hi,
       |              min(frequency) AS f_lo, max(frequency) AS f_hi,
       |              min(monetary_i) AS m_lo, max(monetary_i) AS m_hi FROM u),
       |b AS (SELECT u.*,
       |        ${HistCut.binSql("recency_days", "r_lo", "r_hi")} AS r_bin,
       |        ${HistCut.binSql("frequency", "f_lo", "f_hi")} AS f_bin,
       |        ${HistCut.binSql("monetary_i", "m_lo", "m_hi")} AS m_bin
       |      FROM u CROSS JOIN bd),
       |rc AS (${HistCut.quartileCutSql("b", "r_bin", "ASC")}),
       |fc AS (${HistCut.quartileCutSql("b", "f_bin", "DESC")}),
       |mc AS (${HistCut.quartileCutSql("b", "m_bin", "DESC")})
       |SELECT b.user_id, b.recency_days, b.frequency, b.monetary,
       |  CAST(rc.q AS BIGINT) AS r_quartile, CAST(fc.q AS BIGINT) AS f_quartile,
       |  CAST(mc.q AS BIGINT) AS m_quartile
       |FROM b JOIN rc ON rc.bin = b.r_bin JOIN fc ON fc.bin = b.f_bin
       |       JOIN mc ON mc.bin = b.m_bin
       |ORDER BY user_id""".stripMargin
}
