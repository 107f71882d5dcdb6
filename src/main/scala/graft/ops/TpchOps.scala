package graft.ops

import graft.{OpModule, Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** TPC-H-shaped headline queries adapted to the driver's test schema —
  * the recognizable scan-heavy (Q1), join-top-k (Q3) and selective-scan
  * (Q6) benchmark shapes, all DuckDB-oracled.
  *
  * Float policy: per-row products are computed in double (deterministic
  * on identical inputs), then cast to DECIMAL(18,4) before the shuffled
  * sum so accumulation is exact and order-free (see graft.Dec).
  */
object TpchOps extends OpModule {

  // the parity-critical decimal-accumulation rule has ONE home
  // (graft.Dec.dsum) — a local copy here would silently pin the 22
  // TPC-H shapes to a stale rule if Dec's scale ever changed
  private def dsum4(c: org.apache.spark.sql.Column) = graft.Dec.dsum(c)

  val qs: Seq[Q] = Seq(
    // Q1 pricing summary: full-scan multi-aggregate with avg/sum/count.
    Q("tpch_q1", Some(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) * CAST(1 + l_tax AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      (s, dir) => {
        val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
        // (1+tax) is multiplied in exact decimal space: chaining a second
        // double→decimal cast can disagree with DuckDB at a shortest-
        // representation rounding boundary (observed on this data).
        // The scale-8 sum goes to double VIA A STRING: a direct
        // decimal→double cast double-rounds in DuckDB once the scaled
        // integer exceeds 2^53, and a scale-down re-round hits exact-half
        // ties; both engines print the exact decimal and parse the string
        // with correctly-rounded strtod, so the string route is identical.
        val charge = disc.cast(DecimalType(18, 4)) *
          (lit(1) + col("l_tax")).cast(DecimalType(8, 4))
        Tables(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("2001-09-02 00:00:00").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum4(col("l_quantity")).as("sum_qty"),
            dsum4(col("l_extendedprice")).as("sum_base_price"),
            dsum4(disc).as("sum_disc_price"),
            sum(charge).cast("string").cast("double").as("sum_charge"),
            (dsum4(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            (dsum4(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
            (dsum4(col("l_discount")) / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      }),

    // Q3 shipping-priority shape: segment filter, two joins, revenue
    // top-10 via sort-limit.
    Q("tpch_q3", Some(
      """SELECT o_orderkey, revenue, o_orderdate, o_orderpriority FROM (
        |  SELECT o_orderkey,
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |    o_orderdate, o_orderpriority
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |                JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE c_mktsegment = 'BUILDING'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |    AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY o_orderkey, o_orderdate, o_orderpriority)
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin),
      (s, dir) => {
        val cutoff = lit("1998-01-01 00:00:00").cast("timestamp")
        Tables(s, dir, "lineitem")
          .filter(col("l_shipdate") > cutoff)
          .join(Tables(s, dir, "orders").filter(col("o_orderdate") < cutoff),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables(s, dir, "customer")
            .filter(col("c_mktsegment") === "BUILDING")),
            col("o_custkey") === col("c_custkey"))
          .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
          .agg(dsum4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
          .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      }),

    // Q6 forecast-revenue-change: highly selective scan, single-row agg.
    Q("tpch_q6", Some(
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin),
      (s, dir) => Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(dsum4(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))),

    // Q5 local-supplier-volume shape: the 6-table star join. Spark-first
    // join order: region⋈nation prune to the target region FIRST and ride
    // along the (tiny) broadcast through supplier, so the big
    // lineitem⋈orders shuffle join probes a pre-filtered broadcast and
    // only the orders⋈customer equi-join (plus the local-supplier
    // residual c_nationkey = s_nationkey) shuffles by key. The 2-year
    // window keeps the result non-empty at sf0.001 (TPC-H's 1-year is).
    Q("tpch_q5", Some(
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |              JOIN nation ON s_nationkey = n_nationkey
        |              JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),
      (s, dir) => {
        val asiaNations = Tables(s, dir, "nation")
          .join(broadcast(Tables(s, dir, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")
        val localSupp = Tables(s, dir, "supplier")
          .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "s_nationkey", "n_name")
        Tables(s, dir, "lineitem")
          .join(Tables(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(localSupp), col("l_suppkey") === col("s_suppkey"))
          .join(Tables(s, dir, "customer"),
            col("o_custkey") === col("c_custkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .groupBy("n_name")
          .agg(dsum4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      }),

    // Q4 order-priority-checking shape: THE EXISTS-SUBQUERY QUERY — the
    // predicate-subquery half of the decorrelation surface (tpch_q17
    // covers the scalar half). Through spark.sql on purpose:
    // RewritePredicateSubquery turns the correlated EXISTS (equality on
    // the order key PLUS a correlated l_shipdate > o_orderdate
    // inequality) into a LEFT SEMI hash join — one keyed shuffle, no
    // per-row re-scan (Q17DecorrelationSpec pins the plan). Timestamps
    // compare exactly, so no float boundary hazard exists cross-engine.
    Q("tpch_q4", Some(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin),
      (s, dir) => {
        Tables(s, dir, "orders").createOrReplaceTempView("graft_q4_orders")
        Tables(s, dir, "lineitem").createOrReplaceTempView("graft_q4_lineitem")
        s.sql(
          """SELECT o_orderpriority, count(*) AS order_count
            |FROM graft_q4_orders o
            |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
            |  AND EXISTS (SELECT 1 FROM graft_q4_lineitem l
            |              WHERE l.l_orderkey = o.o_orderkey
            |                AND l.l_shipdate > o.o_orderdate)
            |GROUP BY o_orderpriority
            |ORDER BY o_orderpriority""".stripMargin)
      }),

    // Q21 composite shape: EXISTS and NOT EXISTS on the SAME table in
    // one query — parts shipped in 1997-H1 that went quiet by December,
    // per brand. One optimized plan carrying BOTH rewrites at once (left
    // semi + left anti against differently-filtered scans of lineitem),
    // the shape the real Q21 stresses; Q17DecorrelationSpec pins both
    // joins appear in the single plan.
    Q("tpch_q21_shape", Some(
      """SELECT p_brand, count(*) AS n_parts
        |FROM part p
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |        WHERE l.l_partkey = p.p_partkey
        |          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |          AND l.l_shipdate < TIMESTAMP '1997-07-01 00:00:00')
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l2
        |        WHERE l2.l_partkey = p.p_partkey
        |          AND l2.l_shipdate >= TIMESTAMP '1997-12-01 00:00:00'
        |          AND l2.l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin),
      (s, dir) => {
        Tables(s, dir, "part").createOrReplaceTempView("graft_q21_part")
        Tables(s, dir, "lineitem").createOrReplaceTempView("graft_q21_lineitem")
        s.sql(
          """SELECT p_brand, count(*) AS n_parts
            |FROM graft_q21_part p
            |WHERE EXISTS (SELECT 1 FROM graft_q21_lineitem l
            |        WHERE l.l_partkey = p.p_partkey
            |          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            |          AND l.l_shipdate < TIMESTAMP '1997-07-01 00:00:00')
            |  AND NOT EXISTS (SELECT 1 FROM graft_q21_lineitem l2
            |        WHERE l2.l_partkey = p.p_partkey
            |          AND l2.l_shipdate >= TIMESTAMP '1997-12-01 00:00:00'
            |          AND l2.l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
            |GROUP BY p_brand
            |ORDER BY p_brand""".stripMargin)
      }),

    // NOT IN — the NULL-AWARE ANTI JOIN, the third and last subquery
    // plan shape (tpch_q4 = EXISTS → left semi, tpch_q17 = correlated
    // scalar → aggregate joins): parts with no 1997-H1 shipment.
    // RewritePredicateSubquery plans LEFT ANTI with the null-aware
    // `key = key OR isnull(key = key)` condition — NOT IN must yield
    // zero rows if the subquery list contains any NULL, a semantics an
    // anti join alone gets wrong (Q17DecorrelationSpec pins the plan).
    Q("j9_notin_anti", Some(
      """SELECT p_brand, count(*) AS n_parts
        |FROM part p
        |WHERE p.p_partkey NOT IN (SELECT l_partkey FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00')
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin),
      (s, dir) => {
        Tables(s, dir, "part").createOrReplaceTempView("graft_j9_part")
        Tables(s, dir, "lineitem").createOrReplaceTempView("graft_j9_lineitem")
        s.sql(
          """SELECT p_brand, count(*) AS n_parts
            |FROM graft_j9_part p
            |WHERE p.p_partkey NOT IN (SELECT l_partkey FROM graft_j9_lineitem
            |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            |    AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00')
            |GROUP BY p_brand
            |ORDER BY p_brand""".stripMargin)
      }),

    // Q13 customer-distribution shape: LEFT OUTER join with a FILTERED
    // JOIN CONDITION → orders-per-customer → histogram of counts. The
    // part naive users get wrong: the priority exclusion must live in the
    // ON clause — as a WHERE on the joined result it nulls out the
    // zero-order customers and silently turns the outer join inner
    // (Q17DecorrelationSpec pins LeftOuter surviving optimization AND the
    // filter pushed below the join onto the orders scan, which is the
    // plan you want: the exclusion prunes the orders shuffle, the outer
    // join keeps every customer). count(o_orderkey) counts non-null
    // matches only, so no-order customers land in the c_count = 0 bucket.
    Q("tpch_q13", Some(
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |      FROM customer c LEFT OUTER JOIN orders o
        |        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        |      GROUP BY c.c_custkey) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin),
      (s, dir) => Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"),
          col("c_custkey") === col("o_custkey") &&
            col("o_orderpriority") =!= "1-URGENT", "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)),

    // Q20 excess-shipment shape: the two-level nested subquery chain —
    // an IN whose subquery itself contains an IN plus a TWO-COLUMN
    // correlated aggregate subquery (the availqty > 0.5·sum(l_quantity)
    // analog on this schema: a single shipment exceeding half that
    // supplier's total for the part). Through spark.sql on purpose:
    // RewritePredicateSubquery must flatten the outer IN to a left semi
    // join whose right side contains ANOTHER left semi join (part-name
    // IN) and the decorrelated per-(partkey, suppkey) aggregate join —
    // completing the decorrelation family at depth 2
    // (Q17DecorrelationSpec pins no subquery survives and both semi
    // levels appear). Quantities are integral doubles ≪ 2^53, so the
    // cross-multiplied `2·qty > sum` boundary is exact on both engines.
    Q("tpch_q20_shape", Some(
      """SELECT n_name, count(*) AS n_suppliers
        |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE s.s_suppkey IN (
        |  SELECT l.l_suppkey FROM lineitem l
        |  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%rod%')
        |    AND l.l_quantity * 2 > (SELECT sum(l2.l_quantity) FROM lineitem l2
        |                            WHERE l2.l_partkey = l.l_partkey
        |                              AND l2.l_suppkey = l.l_suppkey))
        |GROUP BY n_name ORDER BY n_name""".stripMargin),
      (s, dir) => {
        Tables(s, dir, "supplier").createOrReplaceTempView("graft_q20_supplier")
        Tables(s, dir, "nation").createOrReplaceTempView("graft_q20_nation")
        Tables(s, dir, "lineitem").createOrReplaceTempView("graft_q20_lineitem")
        Tables(s, dir, "part").createOrReplaceTempView("graft_q20_part")
        s.sql(
          """SELECT n_name, count(*) AS n_suppliers
            |FROM graft_q20_supplier s JOIN graft_q20_nation n
            |  ON s.s_nationkey = n.n_nationkey
            |WHERE s.s_suppkey IN (
            |  SELECT l.l_suppkey FROM graft_q20_lineitem l
            |  WHERE l.l_partkey IN (SELECT p_partkey FROM graft_q20_part
            |                        WHERE p_name LIKE '%rod%')
            |    AND l.l_quantity * 2 > (SELECT sum(l2.l_quantity) FROM graft_q20_lineitem l2
            |                            WHERE l2.l_partkey = l.l_partkey
            |                              AND l2.l_suppkey = l.l_suppkey))
            |GROUP BY n_name ORDER BY n_name""".stripMargin)
      }),

    // Q17 small-quantity-order shape: lineitem rows below 0.2× their
    // part's average quantity, per brand. THE CORRELATED-SUBQUERY QUERY —
    // FUSED form (round 12 — the q11 single-scan precedent): the classic
    // q17 spelling carries twin correlated count/sum subqueries, and
    // Catalyst 4.1's RewriteCorrelatedScalarSubquery decorrelates each
    // into its OWN per-partkey aggregate over lineitem —
    // MergeScalarSubqueries does not merge the correlated pair, so the
    // fact table is aggregate-scanned twice (Q17DecorrelationSpec pins
    // exactly that shape on the subquery form, constructed there). The
    // product query computes count(*) and sum(l_quantity) in ONE
    // per-partkey pass and joins once: measured 2.28 → 1.16 s at sf0.1.
    // The inner join is exact (no COUNT-bug edge): every probing lineitem
    // row's partkey group contains at least that row, so the per-partkey
    // aggregate can never be empty for a key the join probes. The DuckDB
    // oracle deliberately KEEPS the subquery spelling — two independent
    // formulations agreeing is a stronger check than one translated.
    //
    // The threshold `qty < 0.2 * avg(qty)` is compared cross-multiplied —
    // `5 * qty * count < sum` — because 0.2 has no exact binary
    // representation and the engines' avg pipelines differ (Spark decimal
    // avg vs DuckDB double avg), so a boundary row (integer quantities
    // make avg=25 → threshold 5 exactly representable-adjacent) could
    // flip between engines. Cross-multiplied, both sides are exact: the
    // decimal sum is order-free, and even where DuckDB's width promotion
    // falls back to double, the products here are integral and ≪ 2^53,
    // hence exactly representable.
    Q("tpch_q17", Some(
      """SELECT p.p_brand, count(*) AS n_small,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS small_revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE CAST(l.l_quantity AS DECIMAL(18,4)) * 5 *
        |      (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        |    < (SELECT sum(CAST(l2.l_quantity AS DECIMAL(18,4))) FROM lineitem l2
        |       WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY p.p_brand
        |ORDER BY p.p_brand""".stripMargin),
      (s, dir) => {
        Tables(s, dir, "lineitem").createOrReplaceTempView("graft_q17_lineitem")
        Tables(s, dir, "part").createOrReplaceTempView("graft_q17_part")
        s.sql(
          """WITH pk AS (SELECT l_partkey, count(*) AS n_lines,
            |              sum(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty
            |            FROM graft_q17_lineitem GROUP BY l_partkey)
            |SELECT p.p_brand, count(*) AS n_small,
            |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS small_revenue
            |FROM graft_q17_lineitem l
            |  JOIN graft_q17_part p ON l.l_partkey = p.p_partkey
            |  JOIN pk ON pk.l_partkey = l.l_partkey
            |WHERE CAST(l.l_quantity AS DECIMAL(18,4)) * 5 * pk.n_lines < pk.sum_qty
            |GROUP BY p.p_brand
            |ORDER BY p.p_brand""".stripMargin)
      }),

    // Q18 large-volume-order shape: IN over a GROUP BY … HAVING subquery.
    // RewritePredicateSubquery plans the IN as a left semi join against
    // the aggregated orderkey set — the "filter a fact by an aggregate of
    // itself" shape. The semi join and the outer lineitem aggregate reuse
    // the SAME l_orderkey hash partitioning, so AQE schedules one
    // exchange for both. Quantities are integral doubles ≪ 2^53, so the
    // HAVING boundary is exact on both engines; top-100 is sort-limit
    // with o_orderkey tie-break (o_totalprice alone can tie).
    Q("tpch_q18", Some(
      """SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
        |  CAST(sum(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |                JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                       GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
        |GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
        |ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100""".stripMargin),
      (s, dir) => {
        Tables(s, dir, "customer").createOrReplaceTempView("graft_q18_customer")
        Tables(s, dir, "orders").createOrReplaceTempView("graft_q18_orders")
        Tables(s, dir, "lineitem").createOrReplaceTempView("graft_q18_lineitem")
        s.sql(
          """SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
            |  CAST(sum(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
            |FROM graft_q18_customer c JOIN graft_q18_orders o ON c.c_custkey = o.o_custkey
            |                JOIN graft_q18_lineitem l ON o.o_orderkey = l.l_orderkey
            |WHERE o.o_orderkey IN (SELECT l_orderkey FROM graft_q18_lineitem
            |                       GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
            |GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
            |ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100""".stripMargin)
      }),

    // Q15 top-supplier shape: argmax over an aggregated view — the
    // revenue CTE is read twice (join side + scalar max), and the scalar
    // side collapses to a one-row broadcast. Revenue is compared for
    // EQUALITY in exact DECIMAL (never the double cast): a double
    // round-trip could split a true tie differently per engine, returning
    // a different number of co-champions.
    Q("tpch_q15_shape", Some(
      """WITH rev AS (SELECT l_suppkey,
        |    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS r
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name, CAST(rev.r AS DOUBLE) AS total_revenue
        |FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
        |WHERE rev.r = (SELECT max(r) FROM rev)
        |ORDER BY s.s_suppkey""".stripMargin),
      (s, dir) => {
        Tables(s, dir, "supplier").createOrReplaceTempView("graft_q15_supplier")
        Tables(s, dir, "lineitem").createOrReplaceTempView("graft_q15_lineitem")
        s.sql(
          """WITH rev AS (SELECT l_suppkey,
            |    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS r
            |  FROM graft_q15_lineitem
            |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
            |  GROUP BY l_suppkey)
            |SELECT s.s_suppkey, s.s_name, CAST(rev.r AS DOUBLE) AS total_revenue
            |FROM graft_q15_supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
            |WHERE rev.r = (SELECT max(r) FROM rev)
            |ORDER BY s.s_suppkey""".stripMargin)
      }),

    // Q22 global-sales-opportunity shape: an uncorrelated scalar AVERAGE
    // subquery gating the outer scan plus a NOT EXISTS anti join —
    // "above-average-balance customers with no recent orders". The
    // average is compared CROSS-MULTIPLIED in DECIMAL (bal·n > sum):
    // avg-of-double is summation-order-dependent and differs between
    // engines at the boundary; bal·n and the decimal sum are both exact.
    Q("tpch_q22_shape", Some(
      """SELECT c_mktsegment, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
        |FROM customer c
        |WHERE CAST(c.c_acctbal AS DECIMAL(18,4)) *
        |      (SELECT count(*) FROM customer WHERE c_acctbal > 0)
        |    > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,4))) FROM customer
        |       WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin),
      (s, dir) => {
        Tables(s, dir, "customer").createOrReplaceTempView("graft_q22_customer")
        Tables(s, dir, "orders").createOrReplaceTempView("graft_q22_orders")
        s.sql(
          """SELECT c_mktsegment, count(*) AS n_cust,
            |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
            |FROM graft_q22_customer c
            |WHERE CAST(c.c_acctbal AS DECIMAL(18,4)) *
            |      (SELECT count(*) FROM graft_q22_customer WHERE c_acctbal > 0)
            |    > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,4))) FROM graft_q22_customer
            |       WHERE c_acctbal > 0)
            |  AND NOT EXISTS (SELECT 1 FROM graft_q22_orders o
            |                  WHERE o.o_custkey = c.c_custkey
            |                    AND o.o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
            |GROUP BY c_mktsegment
            |ORDER BY c_mktsegment""".stripMargin)
      }),

    // Q2 minimum-cost-supplier shape (no partsupp table in this schema,
    // so lineitem plays the supply catalog): the CORRELATED SCALAR MIN —
    // each part's cheapest shipment line. The ORACLE keeps the correlated
    // form; the Spark side computes the identical result as a SINGLE-SCAN
    // lexicographic argmin (round 16, guide §6 "scan once" / §3):
    // Spark's own RewriteCorrelatedScalarSubquery decorrelates the WHERE
    // into a per-partkey MIN aggregate joined back to a SECOND lineitem
    // scan — two full fact scans at any SF (plans/r16/
    // tpch_q2_shape_before.txt lines 14/22). But the whole query only
    // ever needs, per partkey, the min price and the min suppkey among
    // the rows achieving it — exactly `min(struct(price, suppkey))`:
    // struct ordering compares price first (same total order as
    // min(price)), suppkey breaks price ties (same value as
    // min(suppkey) over the tied rows). IEEE equality on the raw
    // double and the struct ordering agree because lineitem prices are
    // positive non-null monies (no NaN/±0.0 pairs; verified count ==
    // count(l_extendedprice) == count(l_suppkey) on the driver data) —
    // the argmin is row-for-row the correlated filter's output. The
    // final re-aggregation runs over one row per part (not the fact
    // table) and exists only to reproduce the GROUP BY's collapse if
    // p_partkey ever carried duplicates.
    Q("tpch_q2_shape", Some(
      """SELECT p.p_brand, l.l_partkey, min(l.l_suppkey) AS supp_key,
        |  CAST(l.l_extendedprice AS DOUBLE) AS min_price
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_extendedprice = (SELECT min(l2.l_extendedprice)
        |                           FROM lineitem l2
        |                           WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY p.p_brand, l.l_partkey, l.l_extendedprice
        |ORDER BY l.l_partkey""".stripMargin),
      (s, dir) => {
        val best = Tables(s, dir, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(min(struct(col("l_extendedprice"), col("l_suppkey"))).as("m"))
        best.join(Tables(s, dir, "part"),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand"), col("l_partkey"),
            col("m.l_suppkey").as("supp_key"),
            col("m.l_extendedprice").cast("double").as("min_price"))
          .groupBy("p_brand", "l_partkey", "min_price")
          .agg(min(col("supp_key")).as("supp_key"))
          .select(col("p_brand"), col("l_partkey"), col("supp_key"),
            col("min_price"))
          .orderBy("l_partkey")
      }),

    // Q11 important-stock shape: HAVING against a GLOBAL scalar subquery
    // — parts whose shipped value exceeds 1.3× the mean part value. The
    // threshold is scale-FREE (× mean, not TPC-H's fixed fraction that
    // must be retuned per SF) and compared in integer CENTS
    // (round(price·100): exact at any aggregation order on both engines,
    // and the cross-multiplied product peaks ~2·10^13 ≪ 2^63 at sf0.1;
    // a DECIMAL cross-multiply here would overflow DuckDB's width-38
    // product and silently fall back to double). The two scalar
    // subqueries are one-row broadcasts; the displayed value reuses the
    // exact DECIMAL sum.
    Q("tpch_q11_shape", Some(
      """SELECT l_partkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS part_value
        |FROM lineitem
        |GROUP BY l_partkey
        |HAVING sum(CAST(round(l_extendedprice * 100) AS BIGINT)) *
        |       (SELECT count(DISTINCT l_partkey) FROM lineitem) * 10
        |     > (SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |        FROM lineitem) * 13
        |ORDER BY l_partkey""".stripMargin),
      (s, dir) => {
        // ONE lineitem scan + ONE shuffle: the declarative HAVING form
        // (kept as the oracle) costs three scans — the main groupBy plus
        // two scalar subqueries, one of them a full COUNT(DISTINCT) over
        // lineitem. But every global the threshold needs is derivable
        // from the per-partkey aggregate itself: distinct-partkey count
        // = number of groups, global cents = sum of group cents. So the
        // globals re-aggregate the ~|parts| grouped rows (not the fact
        // table) and broadcast back as a one-row threshold. The grouped
        // table is eagerly checkpoint-materialized so BOTH consumers
        // (threshold agg, filter) read it without re-deriving — exchange
        // reuse alone cannot share the subtree because column pruning
        // specializes the threshold branch to a different aggregate.
        // One row per part is the small side at any corpus scale
        // (measured sf0.1 isolated reps=3: 3.49 s → 1.51 s).
        val per = Tables(s, dir, "lineitem").groupBy("l_partkey").agg(
          graft.Dec.dsum(col("l_extendedprice")).as("part_value"),
          sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("cents"))
          .localCheckpoint(true)
        val threshold = per.agg(sum("cents").as("tot_cents"),
          count(lit(1)).as("n_parts"))
        per.crossJoin(broadcast(threshold))
          .filter(col("cents") * col("n_parts") * 10 > col("tot_cents") * 13)
          .select(col("l_partkey"), col("part_value"))
          .orderBy("l_partkey")
      }),

    // Q19 discounted-revenue shape: the DISJUNCTION-OF-CONJUNCTIONS join
    // predicate. Catalyst extracts the common l_partkey = p_partkey
    // equi-key so this plans as a broadcast HASH join (part is the dim)
    // with the OR-of-ANDs as a post-probe residual — never a cartesian
    // nested loop — and pushes the per-side implied disjunctions
    // (brand ∈ {…} onto part, quantity ∈ [1,50] onto lineitem) into the
    // scans.
    Q("tpch_q19_shape", Some(
      """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       count(*) AS n
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
        |       AND l.l_quantity BETWEEN 1 AND 20)
        |   OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 10 AND 30
        |       AND l.l_quantity BETWEEN 10 AND 35)
        |   OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 20 AND 50
        |       AND l.l_quantity BETWEEN 20 AND 50)""".stripMargin),
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val pt = Tables(s, dir, "part")
        val clause = (
          (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#22" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 35)) ||
          (col("p_brand") === "Brand#33" && col("p_size").between(20, 50) &&
            col("l_quantity").between(20, 50)))
        li.join(broadcast(pt), col("l_partkey") === col("p_partkey") && clause)
          .agg(dsum4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n"))
      }),

    // Q12 shipping-mode shape adapted to this schema (no l_shipmode):
    // join + CONDITIONAL AGGREGATION — per return flag, how many 1997
    // shipments belonged to high- vs low-priority orders. One keyed
    // shuffle; the CASE sums are map-side partials; all-integer outputs.
    Q("tpch_q12_shape", Some(
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),
      (s, dir) => {
        val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        Tables(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
          .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag")
          .agg(sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
          .orderBy("l_returnflag")
      }),

    // Q7 volume-shipping shape: bilateral trade between two nation
    // GROUPS (TPC-H's single pair is empty at sf0.001). Spark-first join
    // order: nation is broadcast into supplier and customer FIRST, so
    // the fact side probes a pre-filtered broadcast supplier dim and
    // only orders⋈customer shuffles by key; the direction disjunction
    // (A→B or B→A) stays a cheap post-join residual on two low-card
    // string columns. Revenue sums in exact DECIMAL (order-free).
    Q("tpch_q7_shape", Some(
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(sum(volume) AS DOUBLE) AS revenue, count(*) AS n
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
        |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume
        |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |                JOIN orders ON o_orderkey = l_orderkey
        |                JOIN customer ON c_custkey = o_custkey
        |                JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |                JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
        |          AND n2.n_name IN ('NATION_5','NATION_6','NATION_7','NATION_8'))
        |      OR (n1.n_name IN ('NATION_5','NATION_6','NATION_7','NATION_8')
        |          AND n2.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')))
        |    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                       AND TIMESTAMP '1997-12-31 00:00:00')
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin),
      (s, dir) => {
        val gA = Seq("NATION_1", "NATION_2", "NATION_3", "NATION_4")
        val gB = Seq("NATION_5", "NATION_6", "NATION_7", "NATION_8")
        val nat = Tables(s, dir, "nation").filter(col("n_name").isin(gA ++ gB: _*))
        val supp = Tables(s, dir, "supplier")
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val cust = Tables(s, dir, "customer")
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        Tables(s, dir, "lineitem")
          .filter(col("l_shipdate").between(
            lit("1996-01-01 00:00:00").cast("timestamp"),
            lit("1997-12-31 00:00:00").cast("timestamp")))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .filter((col("supp_nation").isin(gA: _*) && col("cust_nation").isin(gB: _*)) ||
                  (col("supp_nation").isin(gB: _*) && col("cust_nation").isin(gA: _*)))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(dsum4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      }),

    // Q8 national-market-share shape: NATION_1's share of PROMO-part
    // revenue sold to ASIA customers, per order year. Both CASE-gated
    // sums accumulate in exact DECIMAL (ELSE 0, not NULL, so a year with
    // no target-nation sales divides 0 — not NULL — identically on both
    // engines); the ratio is a single double division of two exact
    // casts. part/supplier/nation/region are all broadcast dims; the
    // only keyed shuffles are lineitem⋈orders and orders⋈customer.
    Q("tpch_q8_shape", Some(
      """SELECT o_year,
        |  CAST(CAST(sum(CASE WHEN nation = 'NATION_1' THEN volume
        |                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |     / CAST(sum(volume) AS DOUBLE) AS DOUBLE) AS mkt_share,
        |  count(*) AS n
        |FROM (
        |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume,
        |    n1.n_name AS nation
        |  FROM part JOIN lineitem ON p_partkey = l_partkey
        |            JOIN supplier ON s_suppkey = l_suppkey
        |            JOIN orders ON l_orderkey = o_orderkey
        |            JOIN customer ON o_custkey = c_custkey
        |            JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |            JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |            JOIN region ON n2.n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        |    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                        AND TIMESTAMP '1997-12-31 00:00:00')
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin),
      (s, dir) => {
        val volume = (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4))
        val asiaNat = Tables(s, dir, "nation")
          .join(broadcast(Tables(s, dir, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("asia_nationkey"))
        val suppNat = Tables(s, dir, "supplier")
          .join(broadcast(Tables(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("nation"))
        Tables(s, dir, "lineitem")
          .join(broadcast(Tables(s, dir, "part").filter(col("p_type") === "PROMO")),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
          .join(Tables(s, dir, "orders")
            .filter(col("o_orderdate").between(
              lit("1996-01-01 00:00:00").cast("timestamp"),
              lit("1997-12-31 00:00:00").cast("timestamp"))),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(asiaNat), col("c_nationkey") === col("asia_nationkey"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            (sum(when(col("nation") === "NATION_1", volume)
              .otherwise(lit(BigDecimal(0)).cast(DecimalType(18, 4)))).cast("double") /
             sum(volume).cast("double")).as("mkt_share"),
            count(lit(1)).as("n"))
          .orderBy("o_year")
      }),

    // Q9 product-type-profit shape (no partsupp, so profit is plain
    // discounted revenue): LIKE-filtered part broadcast into the fact,
    // supplier-nation rollup per ship year. The '%widget%' contains-scan
    // prunes part before the join; nation/supplier ride as broadcasts so
    // the aggregate is the only keyed shuffle.
    Q("tpch_q9_shape", Some(
      """SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation,
        |    CAST(EXTRACT(year FROM l_shipdate) AS INT) AS o_year,
        |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS amount
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |                JOIN supplier ON s_suppkey = l_suppkey
        |                JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%widget%')
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin),
      (s, dir) => Tables(s, dir, "lineitem")
        .join(broadcast(Tables(s, dir, "part").filter(col("p_name").contains("widget"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("l_shipdate")).as("o_year"))
        .agg(dsum4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)),

    // Q10 returned-item-revenue shape: top-20 customers by refund-flagged
    // revenue in a quarter. Sort key is the exact-DECIMAL-derived double
    // (identical on both engines) with c_custkey as the tie-break, so
    // LIMIT 20 cuts deterministically.
    Q("tpch_q10_shape", Some(
      """SELECT c_custkey, c_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |              JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
      (s, dir) => Tables(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .join(Tables(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01 00:00:00").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)),

    // Q14 promotion-effect shape: single-row ratio of PROMO-part revenue
    // to total revenue in a quarter. Both sums accumulate in exact
    // DECIMAL (ELSE 0 keeps the numerator non-NULL when no PROMO rows);
    // the 100·x/y is one double expression evaluated left-to-right
    // identically on both engines. part is a broadcast dim.
    Q("tpch_q14_shape", Some(
      """SELECT CAST(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN volume
        |                        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |          / CAST(sum(volume) AS DOUBLE) AS DOUBLE) AS promo_revenue,
        |       count(*) AS n
        |FROM (
        |  SELECT p_type,
        |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00')""".stripMargin),
      (s, dir) => {
        val volume = (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4))
        Tables(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
          .join(broadcast(Tables(s, dir, "part")),
            col("l_partkey") === col("p_partkey"))
          .agg(
            (lit(100.0) * sum(when(col("p_type") === "PROMO", volume)
              .otherwise(lit(BigDecimal(0)).cast(DecimalType(18, 4)))).cast("double") /
             sum(volume).cast("double")).as("promo_revenue"),
            count(lit(1)).as("n"))
      }),

    // Q16 supplier-count shape (lineitem plays the partsupp catalog):
    // COUNT(DISTINCT) per part attribute triple with a NOT IN exclusion
    // subquery — Spark plans the NOT IN as a null-aware anti against the
    // (tiny, broadcast) negative-balance supplier list, and the distinct
    // count as a two-phase partial-distinct aggregate. Goes through
    // spark.sql so the subquery rewrite itself is exercised.
    Q("tpch_q16_shape", Some(
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#13' AND p_size IN (1, 4, 7)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),
      (s, dir) => {
        Tables(s, dir, "lineitem").createOrReplaceTempView("graft_q16_lineitem")
        Tables(s, dir, "part").createOrReplaceTempView("graft_q16_part")
        Tables(s, dir, "supplier").createOrReplaceTempView("graft_q16_supplier")
        s.sql(
          """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
            |FROM graft_q16_lineitem JOIN graft_q16_part ON p_partkey = l_partkey
            |WHERE p_brand <> 'Brand#13' AND p_size IN (1, 4, 7)
            |  AND l_suppkey NOT IN (SELECT s_suppkey FROM graft_q16_supplier
            |                        WHERE s_acctbal < 0)
            |GROUP BY p_brand, p_type, p_size
            |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
      })
  )
}
