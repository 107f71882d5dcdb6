package graft.ops

import graft.{OpModule, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar-function and analytic breadth (SURVEY.md §2.10 — the surface
  * the engine inherits from `functions._`, exercised explicitly so the
  * oracle pins the semantics): strings, date arithmetic, null handling,
  * distribution ranks, group-relative predicates.
  */
object ScalarOps extends OpModule {

  val qs: Seq[Q] = Seq(
    // Analytic distribution functions.
    Q("w7_percent_rank", Some(
      """SELECT c_custkey,
        |  percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS pr,
        |  cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS cd
        |FROM customer ORDER BY c_custkey""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
        Tables(s, dir, "customer")
          .select(col("c_custkey"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"))
          .orderBy("c_custkey")
      }),

    // String functions.
    Q("x6_string_funcs", Some(
      """SELECT c_custkey, upper(c_name) AS uname, length(c_name) AS nlen,
        |  substring(c_name, 1, 8) AS prefix, lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
        |  replace(c_mktsegment, 'A', '_') AS repl,
        |  concat(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS tag
        |FROM customer ORDER BY c_custkey""".stripMargin),
      (s, dir) => Tables(s, dir, "customer")
        .select(col("c_custkey"),
          upper(col("c_name")).as("uname"),
          length(col("c_name")).cast("long").as("nlen"),
          substring(col("c_name"), 1, 8).as("prefix"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
          regexp_replace(col("c_mktsegment"), "A", "_").as("repl"),
          concat(col("c_mktsegment"), lit("#"), col("c_nationkey").cast("string")).as("tag"))
        .orderBy("c_custkey")),

    // Date arithmetic on the order/ship timeline.
    Q("t13_date_arith", Some(
      """SELECT l_orderkey, l_linenumber,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_days,
        |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_day,
        |  CAST(month(l_shipdate) AS BIGINT) AS ship_month,
        |  CAST(dayofweek(l_shipdate) + 1 AS BIGINT) AS ship_dow
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_orderkey < 500 ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, dir) => Tables(s, dir, "lineitem")
        .filter(col("l_orderkey") < 500)
        .join(broadcast(Tables(s, dir, "orders").filter(col("o_orderkey") < 500)),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
            .cast("long").as("ship_days"),
          date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("due_day"),
          month(col("l_shipdate")).cast("long").as("ship_month"),
          dayofweek(col("l_shipdate")).cast("long").as("ship_dow"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Group-relative predicate: customers above their segment's average
    // balance (the scalar-subquery/window pattern).
    Q("w8_above_avg", Some(
      """SELECT c_custkey, c_mktsegment, c_acctbal FROM (
        |  SELECT c_custkey, c_mktsegment, c_acctbal,
        |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) OVER (PARTITION BY c_mktsegment) AS DOUBLE)
        |      / count(*) OVER (PARTITION BY c_mktsegment) AS seg_avg
        |  FROM customer)
        |WHERE c_acctbal > seg_avg ORDER BY c_custkey""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("c_mktsegment")
        Tables(s, dir, "customer")
          .withColumn("seg_avg",
            sum(col("c_acctbal").cast(org.apache.spark.sql.types.DecimalType(18, 4))).over(w)
              .cast("double") / count(lit(1)).over(w))
          .filter(col("c_acctbal") > col("seg_avg"))
          .select("c_custkey", "c_mktsegment", "c_acctbal")
          .orderBy("c_custkey")
      }),

    // Null handling: lag-delta with explicit fill + nullif/coalesce.
    Q("t14_null_fill", Some(
      """SELECT user_id, event_id,
        |  coalesce(value - lag(value) OVER (PARTITION BY user_id ORDER BY event_id), 0.0) AS delta0,
        |  nullif(event_type, 'view') AS non_view
        |FROM events ORDER BY user_id, event_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        Tables(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            coalesce(col("value") - lag(col("value"), 1).over(w), lit(0.0)).as("delta0"),
            nullif(col("event_type"), lit("view")).as("non_view"))
          .orderBy("user_id", "event_id")
      })
  )
}
