package graft.ops

import graft.{Dec, OpModule, Q, Tables}
import org.apache.spark.sql.functions._

/** Time-series / event-stream operators over the `events` table:
  * tumbling-window aggregation (the batch form of SURVEY.md §2.11's
  * Structured Streaming mapping — the streaming twin lives in
  * [[graft.streaming.EventStream]]), JSON extraction, pivot (§2.8 T4) and
  * the grid-bucketed radius self-join (§2.4 J5, radius_graph analog,
  * /root/reference/larennet/larennet.py:53-57).
  */
object EventOps extends OpModule {

  val qs: Seq[Q] = Seq(
    // Tumbling-window aggregation (window($"ts","1 hour") batch analog).
    Q("st1_window_agg", Some(
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts, event_type,
         |  count(*) AS n, ${Dec.sqlSum("value")} AS sum_value
         |FROM events GROUP BY hour_ts, event_type ORDER BY hour_ts, event_type""".stripMargin),
      (s, dir) => Tables(s, dir, "events")
        // timestamp_ntz output: the oracle's timestamps are wall-clock
        // naive; session TZ is UTC so the cast is the identity instant.
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour_ts"), col("event_type"))
        .agg(count(lit(1)).as("n"), Dec.dsum(col("value")).as("sum_value"))
        .orderBy("hour_ts", "event_type")),

    // st1b — HOPPING (sliding) window aggregate: 1-hour windows every 15
    // minutes, so each event lands in exactly 4 overlapping windows (the
    // trend-smoothing grain rate monitors use). Spark's `window`
    // expression computes membership natively in batch AND streaming —
    // EventStream.slidingAgg is the streaming twin, StreamingSpec pins
    // them equal — while the oracle derives the same 4 epoch-aligned
    // starts per event in exact integer microseconds.
    Q("st1b_sliding_agg", Some(
      s"""WITH w AS (
         |  SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000
         |           - k * 900000000) AS wstart, event_type, value
         |  FROM (SELECT ts, event_type, value,
         |          unnest(generate_series(0, 3)) AS k FROM events))
         |SELECT wstart AS window_ts, event_type,
         |  count(*) AS n, ${Dec.sqlSum("value")} AS sum_value
         |FROM w GROUP BY window_ts, event_type ORDER BY window_ts, event_type""".stripMargin),
      (s, dir) => Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), Dec.dsum(col("value")).as("sum_value"))
        .select(col("window.start").cast("timestamp_ntz").as("window_ts"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_ts", "event_type")),

    // JSON scalar extraction from the props column.
    Q("e1_json_extract", Some(
      """SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k FROM (
        |  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => Tables(s, dir, "events")
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))
        .orderBy("event_type")),

    // Typed JSON extraction: from_json with an explicit schema — the
    // scalable path (no per-row path parsing; one struct projection).
    // CONTRACT: props.k is a JSON NUMBER (the fixture generator's
    // shape). The typed side surfaces a quoted "12" or malformed JSON
    // as NULL where the oracle's string-extract-then-cast would coerce
    // it — that asymmetry is the point of the typed path (schema
    // violations become visible), and e1 is the string-extraction twin
    // whose both sides coerce.
    Q("e2_json_typed", Some(
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE event_id < 100 ORDER BY event_id""".stripMargin),
      (s, dir) => Tables(s, dir, "events")
        .filter(col("event_id") < 100)
        .select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))).getField("k").as("k"))
        .orderBy("event_id")),

    // e3 — VariantType ingestion (Spark 4's semi-structured type): parse
    // the JSON ONCE into a Variant binary value and extract typed fields
    // with `variant_get` — the open-schema path when props carry MIXED
    // shapes no single from_json struct covers. At warehouse scale the
    // Variant binary is what lands in parquet (shredded columns at the
    // scan in new-enough writers), so extraction is a typed field read,
    // not per-query string path parsing. The oracle reads the same
    // values through DuckDB's JSON extraction.
    Q("e3_variant_extract", Some(
      """SELECT event_type,
        |  CAST(sum(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  CAST(min(k) AS BIGINT) AS min_k, CAST(max(k) AS BIGINT) AS max_k
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => Tables(s, dir, "events")
        .select(col("event_type"),
          variant_get(parse_json(col("props")), "$.k", "long").as("k"))
        .groupBy("event_type")
        .agg(sum(when(col("k") > 50, lit(1L)).otherwise(lit(0L))).cast("long").as("n_high"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")),

    // T4 — sparse→dense pivot (COO scatter analog,
    // view_spacepoint_data.ipynb cell-11..13): day × event_type counts.
    Q("t4_pivot", Some(
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY day ORDER BY day""".stripMargin),
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val p = Tables(s, dir, "events")
          .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
          .groupBy("day")
          .pivot("event_type", types)
          .agg(count(lit(1)))
        // pivot yields null for absent (day, type) combos; the oracle's
        // FILTER form yields 0 — align on 0.
        p.select(col("day") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
          .orderBy("day")
      }),

    // As-of join: each error event matched to the same user's most recent
    // strictly-prior purchase. Spark lacks a native as-of operator; the
    // Spark-first form is a single windowed pass over the merged stream —
    // no join at all, one shuffle by user. (event_id is the monotone time
    // proxy; ns-timestamp ties would make ordering engine-dependent.)
    Q("j8_asof_join", Some(
      """SELECT event_id, user_id, prior_purchase FROM (
        |  SELECT event_id, user_id, event_type,
        |    last_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_purchase
        |  FROM events)
        |WHERE event_type = 'error' ORDER BY event_id""".stripMargin),
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("event_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        Tables(s, dir, "events")
          .withColumn("prior_purchase",
            last(when(col("event_type") === "purchase", col("event_id")), ignoreNulls = true)
              .over(w))
          .filter(col("event_type") === "error")
          .select("event_id", "user_id", "prior_purchase")
          .orderBy("event_id")
      }),

    // T4-inverse — unpivot/melt: wide per-day counts back to long form.
    Q("t4b_unpivot", Some(
      """WITH wide AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    count(*) FILTER (WHERE event_type = 'click') AS click,
        |    count(*) FILTER (WHERE event_type = 'error') AS error
        |  FROM events GROUP BY day)
        |SELECT day, kind, n FROM (
        |  SELECT day, 'click' AS kind, click AS n FROM wide
        |  UNION ALL
        |  SELECT day, 'error' AS kind, error AS n FROM wide)
        |ORDER BY day, kind""".stripMargin),
      (s, dir) => Tables(s, dir, "events")
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .groupBy("day")
        .pivot("event_type", Seq("click", "error"))
        .agg(count(lit(1)))
        .select(col("day"), col("click"), col("error"))
        .na.fill(0L, Seq("click", "error"))
        .unpivot(Array(col("day")), Array(col("click"), col("error")), "kind", "n")
        .orderBy("day", "kind")),

    // J5 — radius self-join via grid bucketing: pairs of events from the
    // same user within 600 s. Each left row is exploded to its own and the
    // two neighboring time buckets, so every qualifying pair is matched by
    // exactly one equi-join key — the standard Spark spatial-join shape
    // (no O(n²) cross product; shuffle keyed on (user, bucket)).
    Q("j5_radius_join", Some(
      """SELECT e1.event_id AS a, e2.event_id AS b
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id AND e1.event_id < e2.event_id
        | AND abs(epoch_us(e1.ts) - epoch_us(e2.ts)) <= 600000000
        |ORDER BY a, b""".stripMargin),
      (s, dir) => {
        val r = 600000000L // 600 s in µs
        val e = Tables(s, dir, "events")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
        val left = e
          .withColumn("bk0", expr(s"us div $r"))
          .withColumn("bk", explode(array(col("bk0") - 1, col("bk0"), col("bk0") + 1)))
          .select(col("event_id").as("a"), col("user_id").as("u"),
            col("us").as("us1"), col("bk"))
        val right = e
          .select(col("event_id").as("b"), col("user_id").as("u"),
            col("us").as("us2"), expr(s"us div $r").as("bk"))
        // equi-join on (user, bucket) — co-partitioned shuffle, residual
        // distance predicate applied post-join.
        left.join(right, Seq("u", "bk"))
          .filter(col("a") < col("b") && abs(col("us1") - col("us2")) <= r)
          .select("a", "b")
          .orderBy("a", "b")
      }),

    // st3 — interval join: each purchase matched to the same user's
    // errors within the following 6 hours (10 minutes matches nothing at
    // sf0.001 — threshold sized to be non-empty at every test scale).
    // The batch twin of streaming.JoinStream's watermarked stream-stream
    // join (StreamingSpec pins streamed == this). Catalyst plans the
    // equi-key (user) as the join key with the time range as residual —
    // one shuffle by user; no time-bucket explosion needed because the
    // user key already bounds each probe side.
    Q("st3_interval_join", Some(intervalJoinOracleSql),
      (s, dir) => {
        val (p, e) = purchaseErrorSides(s, dir)
        p.join(e, col("user_id") === col("euser") &&
            col("ets") >= col("pts") &&
            col("ets") <= col("pts") + expr("INTERVAL 6 HOURS"))
          .select(col("user_id"), col("purchase_id"), col("error_id"))
          .orderBy("user_id", "purchase_id", "error_id")
      }),

    // st3b — the SAME semantics through the custom sorted-interval-join
    // physical operator (graft.plans.IntervalJoinExec: LogicalPlan +
    // SparkStrategy + SparkPlan; one linear sweep per key instead of the
    // declarative plan's per-key residual-filtered nested loop). Shares
    // st3's oracle SQL — a custom physical operator hash-matched by a
    // second engine through the driver gate.
    Q("st3b_interval_join_custom", Some(intervalJoinOracleSql),
      (s, dir) => {
        // IntervalJoinStrategy comes from session setup (GraftExtensions
        // in Verify/Bench/specs) — a query must not mutate session-global
        // planner state
        val (p, e) = purchaseErrorSides(s, dir)
        graft.plans.IntervalJoin.join(p, e, "user_id", "euser", "pts", "ets",
          0L, 6L * 3600L * 1000000L)
          .select(col("user_id"), col("purchase_id"), col("error_id"))
          .orderBy("user_id", "purchase_id", "error_id")
      }),

    // st3c — LEFT OUTER through the same custom operator: every purchase
    // preserved, purchases with no error in the following 6 h padded with
    // error_id = -1 (COALESCE rather than NULL output keeps the driver
    // compare away from engine-specific NULL sort order).
    Q("st3c_interval_join_outer", Some(intervalJoinOuterOracleSql),
      (s, dir) => {
        val (p, e) = purchaseErrorSides(s, dir)
        graft.plans.IntervalJoin.join(p, e, "user_id", "euser", "pts", "ets",
          0L, 6L * 3600L * 1000000L, joinType = "left_outer")
          .select(col("user_id"), col("purchase_id"),
            coalesce(col("error_id"), lit(-1L)).as("error_id"))
          .orderBy("user_id", "purchase_id", "error_id")
      })
  )

  /** st3c oracle: the event_type predicates must live in the subqueries —
    * in a LEFT JOIN an ON-clause filter on the LEFT side would not filter
    * (it only fails the match and pads), silently changing semantics.
    */
  private def intervalJoinOuterOracleSql: String =
    """SELECT p.user_id, p.event_id AS purchase_id,
      |  CAST(coalesce(e.event_id, -1) AS BIGINT) AS error_id
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      |  ON p.user_id = e.user_id
      | AND epoch_us(e.ts) >= epoch_us(p.ts)
      | AND epoch_us(e.ts) <= epoch_us(p.ts) + 21600000000
      |ORDER BY 1, 2, 3""".stripMargin

  /** Shared st3/st3b oracle. The comparison runs on epoch_us — the events
    * fixture is TIMESTAMP(NANOS) and the Spark side reads µs-truncated
    * values, so a raw-ns DuckDB comparison would diverge on pairs whose
    * order (or exact 6 h boundary) flips below the microsecond (the
    * j5/st2b convention).
    */
  private def intervalJoinOracleSql: String = // def: referenced during qs init above
    """SELECT p.user_id, p.event_id AS purchase_id, e.event_id AS error_id
      |FROM events p JOIN events e
      |  ON p.user_id = e.user_id AND p.event_type = 'purchase' AND e.event_type = 'error'
      | AND epoch_us(e.ts) >= epoch_us(p.ts)
      | AND epoch_us(e.ts) <= epoch_us(p.ts) + 21600000000
      |ORDER BY 1, 2, 3""".stripMargin

  /** Shared st3/st3b sides: purchases (purchase_id, user_id, pts) and
    * errors (error_id, euser, ets).
    */
  private def purchaseErrorSides(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val ev = Tables(s, dir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id").as("euser"),
        col("ts").as("ets"))
    (p, e)
  }
}
