package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{IvmOps, ViewSpec}
import graft.plans.MvRegistry

/** Materialized-view rewrite: a matching per-custkey aggregate over the
  * registered base scan is substituted with the partial store at
  * analysis time; anything the partials cannot answer is left alone.
  *
  * The suite registers a PRIVATE copy of `orders` as its base table:
  * suites run in parallel in one JVM with one shared registry, and
  * ivm3_mv_rewrite (run by ShuffleBudgetSpec over the shared sf dir)
  * must not race this suite's registrations on the same key.
  */
class MvRewriteSpec extends AnyFunSuite with SparkSuite {

  private val D = DecimalType(18, 4)

  // private base: a copy of orders under a fixture-owned path
  private lazy val basePath = {
    val d = java.nio.file.Files.createTempDirectory("mv_base").toString + "/base"
    Tables(spark, sf, "orders").write.mode("overwrite").parquet(d)
    d
  }

  private def baseAgg = spark.read.parquet(basePath)
    .groupBy("o_custkey").agg(
      count(lit(1)).as("n_orders"),
      sum(col("o_totalprice").cast(D)).as("sum_dec"),
      min(col("o_totalprice")).as("min_price"),
      max(col("o_totalprice")).as("max_price"))
    .orderBy("o_custkey")

  private def withView(f: String => Unit): Unit = {
    val storeDir = java.nio.file.Files.createTempDirectory("mv_view").toString
    IvmOps.orderPartials(spark.read.parquet(basePath))
      .write.mode("overwrite").parquet(storeDir)
    try f(storeDir)
    finally MvRegistry.unregister(basePath) // only OUR key — clear() would race other suites
  }

  private def baseDirName = new java.io.File(basePath).getParentFile.getName

  test("matching aggregate is rewritten to a view scan and answers identically") {
    withView { storeDir =>
      val want = baseAgg.collect() // analyzed before registration → base plan
      MvRegistry.register(spark, basePath, storeDir)
      val rewritten = baseAgg // analyzed with the view registered
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(storeDir).getName),
        s"rewritten plan does not scan the view:\n$plan")
      assert(!plan.contains(baseDirName),
        s"rewritten plan still scans the base table:\n$plan")
      assert(!plan.contains("HashAggregate"),
        s"rewritten plan still aggregates — the partials ARE the answer:\n$plan")
      val got = rewritten.collect()
      assert(got.toSeq == want.toSeq, "view substitution changed the answer")
    }
  }

  test("a filter above the scan disqualifies — partials only answer the unfiltered question") {
    withView { storeDir =>
      MvRegistry.register(spark, basePath, storeDir)
      val filtered = spark.read.parquet(basePath)
        .filter(col("o_orderkey") > 100)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      val plan = filtered.queryExecution.executedPlan.toString
      assert(plan.contains(baseDirName) &&
        !plan.contains(new java.io.File(storeDir).getName),
        s"filtered aggregate must NOT be rewritten:\n$plan")
    }
  }

  test("a GROUP-KEY filter commutes with the grouping and is answered from the view") {
    withView { storeDir =>
      def keyFiltered = spark.read.parquet(basePath)
        .filter(col("o_custkey") % 5 === 2)
        .groupBy("o_custkey").agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(D)).as("sum_dec"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy("o_custkey")
      val want = keyFiltered.collect() // before registration → base plan
      assert(want.nonEmpty, "fixture filter selected no groups — test is vacuous")
      MvRegistry.register(spark, basePath, storeDir)
      val rewritten = keyFiltered
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(storeDir).getName) &&
        !plan.contains(baseDirName),
        s"group-key-filtered aggregate must be answered from the view:\n$plan")
      assert(!plan.contains("HashAggregate"),
        s"per-key read over the view needs no re-aggregation:\n$plan")
      assert(rewritten.collect().toSeq == want.toSeq,
        "group-key filter substitution changed the answer")
    }
  }

  test("a GROUP-KEY filter on the GLOBAL rollup filters the view's partials") {
    withView { storeDir =>
      def filteredRollup = spark.read.parquet(basePath)
        .filter(col("o_custkey") % 5 === 2)
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(D)).as("sum_dec"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
      val want = filteredRollup.collect()
      MvRegistry.register(spark, basePath, storeDir)
      val rolled = filteredRollup
      val plan = rolled.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(storeDir).getName) &&
        !plan.contains(baseDirName),
        s"filtered global rollup must re-aggregate the filtered view:\n$plan")
      assert(rolled.collect().toSeq == want.toSeq,
        "filtered rollup substitution changed the answer")
    }
  }

  test("a filter mixing the group key with a non-key column still disqualifies") {
    withView { storeDir =>
      MvRegistry.register(spark, basePath, storeDir)
      val mixed = spark.read.parquet(basePath)
        .filter(col("o_custkey") % 5 === 2 && col("o_totalprice") > 10.0)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      val plan = mixed.queryExecution.executedPlan.toString
      assert(plan.contains(baseDirName) &&
        !plan.contains(new java.io.File(storeDir).getName),
        s"a predicate touching a non-key column selects ROWS, not groups — " +
          s"must not rewrite:\n$plan")
    }
  }

  test("a non-deterministic group-key predicate disqualifies") {
    withView { storeDir =>
      MvRegistry.register(spark, basePath, storeDir)
      val nondet = spark.read.parquet(basePath)
        .filter(col("o_custkey") % 5 === 2 && rand() < 2.0)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      val plan = nondet.queryExecution.executedPlan.toString
      assert(plan.contains(baseDirName) &&
        !plan.contains(new java.io.File(storeDir).getName),
        s"rand() samples base ROWS; the view has one row per group — " +
          s"must not rewrite:\n$plan")
    }
  }

  test("an aggregate the partials cannot answer disqualifies the whole rewrite") {
    withView { storeDir =>
      MvRegistry.register(spark, basePath, storeDir)
      val withAvg = spark.read.parquet(basePath)
        .groupBy("o_custkey").agg(
          count(lit(1)).as("n_orders"),
          avg(col("o_totalprice")).as("avg_price"))
      val plan = withAvg.queryExecution.executedPlan.toString
      assert(plan.contains(baseDirName) &&
        !plan.contains(new java.io.File(storeDir).getName),
        s"avg is not a stored partial — must not rewrite:\n$plan")
    }
  }

  test("an unregistered base path is untouched — registration is the opt-in") {
    withView { storeDir =>
      MvRegistry.register(spark, basePath, storeDir)
      MvRegistry.unregister(basePath)
      val plan = baseAgg.queryExecution.executedPlan.toString
      assert(plan.contains(baseDirName),
        s"rule must be inert once the view is unregistered:\n$plan")
    }
  }

  test("view REBUILD must unregister first: the builder aggregate is itself the registered shape") {
    withView { storeDir =>
      MvRegistry.register(spark, basePath, storeDir)
      // the partial-build aggregate over a registered base is EXACTLY the
      // shape the rule substitutes — left registered, a rebuild would
      // read the store it is overwriting (ivm3 unregisters for the
      // rebuild window; this pins why)
      val builder = IvmOps.orderPartials(spark.read.parquet(basePath))
      assert(builder.queryExecution.executedPlan.toString
        .contains(new java.io.File(storeDir).getName),
        "builder shape unexpectedly escaped the rewrite — hazard pin is stale")
      MvRegistry.unregister(basePath)
      val safe = IvmOps.orderPartials(spark.read.parquet(basePath))
      val plan = safe.queryExecution.executedPlan.toString
      assert(plan.contains(baseDirName) &&
        !plan.contains(new java.io.File(storeDir).getName),
        s"unregistered rebuild must read the base:\n$plan")
    }
  }

  test("GLOBAL rollup is answered from the view by re-aggregating partials") {
    withView { storeDir =>
      def globalAgg = spark.read.parquet(basePath).agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(D)).as("sum_dec"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      val want = globalAgg.collect() // before registration → base plan
      MvRegistry.register(spark, basePath, storeDir)
      val rolled = globalAgg
      val plan = rolled.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(storeDir).getName) &&
        !plan.contains(baseDirName),
        s"global rollup must re-aggregate the view, not the base:\n$plan")
      assert(rolled.collect().toSeq == want.toSeq,
        "view rollup changed the global answer")
    }
  }

  test("GLOBAL rollup over an EMPTY base: count is 0, not null") {
    val emptyBase = java.nio.file.Files.createTempDirectory("mv_empty").toString + "/base"
    val emptyView = java.nio.file.Files.createTempDirectory("mv_empty_v").toString
    spark.read.parquet(basePath).filter(lit(false))
      .write.mode("overwrite").parquet(emptyBase)
    IvmOps.orderPartials(spark.read.parquet(emptyBase))
      .write.mode("overwrite").parquet(emptyView)
    def globalAgg = spark.read.parquet(emptyBase).agg(
      count(lit(1)).as("n_orders"),
      sum(col("o_totalprice").cast(D)).as("sum_dec"))
    val want = globalAgg.collect() // (0, null) from the base plan
    MvRegistry.register(spark, emptyBase, emptyView)
    try {
      val rolled = globalAgg
      assert(rolled.queryExecution.executedPlan.toString
        .contains(new java.io.File(emptyView).getName),
        "empty-base rollup was not rewritten — edge test is vacuous")
      assert(rolled.collect().toSeq == want.toSeq,
        s"empty-base rollup diverged: ${rolled.collect().toSeq} vs ${want.toSeq}")
    } finally MvRegistry.unregister(emptyBase)
  }

  test("an IN-LIST group-key filter routes to the view (the verdict's literal warehouse read)") {
    withView { storeDir =>
      def inList = spark.read.parquet(basePath)
        .filter(col("o_custkey").isin(1L, 2L, 3L, 5L, 8L))
        .groupBy("o_custkey").agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(D)).as("sum_dec"))
        .orderBy("o_custkey")
      val want = inList.collect() // before registration → base plan
      assert(want.nonEmpty, "IN-list selected no groups — test is vacuous")
      MvRegistry.register(spark, basePath, storeDir)
      val rewritten = inList
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(storeDir).getName) &&
        !plan.contains(baseDirName),
        s"IN-list group-key read must be answered from the view:\n$plan")
      assert(rewritten.collect().toSeq == want.toSeq,
        "IN-list substitution changed the answer")
    }
  }

  test("a RANGE group-key filter routes to the view") {
    withView { storeDir =>
      def range = spark.read.parquet(basePath)
        .filter(col("o_custkey") >= 10L && col("o_custkey") <= 200L)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
        .orderBy("o_custkey")
      val want = range.collect()
      assert(want.nonEmpty, "range selected no groups — test is vacuous")
      MvRegistry.register(spark, basePath, storeDir)
      val rewritten = range
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(storeDir).getName) &&
        !plan.contains(baseDirName),
        s"range group-key read must be answered from the view:\n$plan")
      assert(rewritten.collect().toSeq == want.toSeq,
        "range substitution changed the answer")
    }
  }

  // second base table for the multi-view cases: a private lineitem copy
  private lazy val liBasePath = {
    val d = java.nio.file.Files.createTempDirectory("mv_libase").toString + "/base"
    Tables(spark, sf, "lineitem").write.mode("overwrite").parquet(d)
    d
  }
  private def liBaseDirName = new java.io.File(liBasePath).getParentFile.getName

  test("multi-view: each base routes to ITS OWN store; the other registration never captures it") {
    withView { ordersStore =>
      val liStore = java.nio.file.Files.createTempDirectory("mv_liview").toString
      IvmOps.partials(spark.read.parquet(liBasePath), ViewSpec.PartItems)
        .write.mode("overwrite").parquet(liStore)
      def liAgg = spark.read.parquet(liBasePath)
        .filter(col("l_partkey").isin(2L, 3L, 5L, 7L, 11L))
        .groupBy("l_partkey").agg(
          count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast(D)).as("sum_qty"),
          min(col("l_extendedprice")).as("min_eprice"))
        .orderBy("l_partkey")
      val wantLi = liAgg.collect() // before registration → base plan
      val wantOrders = baseAgg.collect()
      MvRegistry.register(spark, basePath, ordersStore)
      MvRegistry.register(spark, liBasePath, liStore, ViewSpec.PartItems)
      try {
        val liPlan = liAgg.queryExecution.executedPlan.toString
        assert(liPlan.contains(new java.io.File(liStore).getName) &&
          !liPlan.contains(liBaseDirName) &&
          !liPlan.contains(new java.io.File(ordersStore).getName),
          s"lineitem read must route to the lineitem store only:\n$liPlan")
        assert(liAgg.collect().toSeq == wantLi.toSeq,
          "multi-view lineitem substitution changed the answer")
        // the orders view stays live and still answers its own reads
        val oPlan = baseAgg.queryExecution.executedPlan.toString
        assert(oPlan.contains(new java.io.File(ordersStore).getName) &&
          !oPlan.contains(baseDirName),
          s"orders read must still route to the orders store:\n$oPlan")
        assert(baseAgg.collect().toSeq == wantOrders.toSeq,
          "orders substitution changed under multi-view registration")
      } finally MvRegistry.unregister(liBasePath)
    }
  }

  test("an aggregate outside the DECLARED vocabulary disqualifies under the declared spec") {
    val liStore = java.nio.file.Files.createTempDirectory("mv_livoc").toString
    IvmOps.partials(spark.read.parquet(liBasePath), ViewSpec.PartItems)
      .write.mode("overwrite").parquet(liStore)
    MvRegistry.register(spark, liBasePath, liStore, ViewSpec.PartItems)
    try {
      // sum over a column the spec never declared as a sum source
      val foreignSum = spark.read.parquet(liBasePath)
        .groupBy("l_partkey").agg(
          count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast(D)).as("sum_eprice"))
      val p1 = foreignSum.queryExecution.executedPlan.toString
      assert(p1.contains(liBaseDirName) &&
        !p1.contains(new java.io.File(liStore).getName),
        s"an undeclared sum source must not rewrite:\n$p1")
      // max over the declared min-only extremum source
      val foreignMax = spark.read.parquet(liBasePath)
        .groupBy("l_partkey").agg(max(col("l_extendedprice")).as("max_eprice"))
      val p2 = foreignMax.queryExecution.executedPlan.toString
      assert(p2.contains(liBaseDirName) &&
        !p2.contains(new java.io.File(liStore).getName),
        s"max over a min-only declared extremum must not rewrite:\n$p2")
    } finally MvRegistry.unregister(liBasePath)
  }

  test("KEY-FUNCTIONAL regroup: GROUP BY f(key) re-aggregates the partials by f") {
    withView { storeDir =>
      def banded = spark.read.parquet(basePath)
        .groupBy((col("o_custkey") % 10).as("cust_band")).agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(D)).as("sum_dec"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy("cust_band")
      val want = banded.collect() // before registration → base plan
      assert(want.length > 1, "banding produced one group — test is vacuous")
      MvRegistry.register(spark, basePath, storeDir)
      val rewritten = banded
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(storeDir).getName) &&
        !plan.contains(baseDirName),
        s"banded regroup must re-aggregate the view, not the base:\n$plan")
      assert(rewritten.collect().toSeq == want.toSeq,
        "key-functional regroup changed the answer")
    }
  }

  test("KEY-FUNCTIONAL regroup fires on the BARE SQL spelling too") {
    withView { storeDir =>
      spark.read.parquet(basePath).createOrReplaceTempView("mv_regroup_base")
      def q = spark.sql(
        """SELECT o_custkey % 10 AS cust_band, count(1) AS n_orders,
          |  sum(CAST(o_totalprice AS DECIMAL(18,4))) AS sum_dec
          |FROM mv_regroup_base GROUP BY o_custkey % 10
          |ORDER BY cust_band""".stripMargin)
      val want = q.collect()
      MvRegistry.register(spark, basePath, storeDir)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(storeDir).getName) &&
        !plan.contains(baseDirName),
        s"SQL-spelled regroup must be answered from the view:\n$plan")
      assert(q.collect().toSeq == want.toSeq,
        "SQL regroup substitution changed the answer")
    }
  }

  test("KEY-FUNCTIONAL regroup composes with a key-only filter") {
    withView { storeDir =>
      def q = spark.read.parquet(basePath)
        .filter(col("o_custkey") % 5 === 2)
        .groupBy((col("o_custkey") % 3).as("band"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_totalprice")).as("min_price"))
        .orderBy("band")
      val want = q.collect()
      assert(want.nonEmpty, "filtered regroup selected nothing — test is vacuous")
      MvRegistry.register(spark, basePath, storeDir)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(storeDir).getName) &&
        !plan.contains(baseDirName),
        s"filtered regroup must filter + re-aggregate the view:\n$plan")
      assert(q.collect().toSeq == want.toSeq,
        "filtered regroup substitution changed the answer")
    }
  }

  test("a grouping function of a NON-key column disqualifies the regroup") {
    withView { storeDir =>
      MvRegistry.register(spark, basePath, storeDir)
      val nonKey = spark.read.parquet(basePath)
        .groupBy((col("o_orderkey") % 10).as("band"))
        .agg(count(lit(1)).as("n_orders"))
      val p1 = nonKey.queryExecution.executedPlan.toString
      assert(p1.contains(baseDirName) &&
        !p1.contains(new java.io.File(storeDir).getName),
        s"f(non-key) groups ROWS the view cannot separate — must not rewrite:\n$p1")
      // mixing the key with another column is just as unanswerable
      val mixed = spark.read.parquet(basePath)
        .groupBy(((col("o_custkey") + col("o_orderkey")) % 10).as("band"))
        .agg(count(lit(1)).as("n_orders"))
      val p2 = mixed.queryExecution.executedPlan.toString
      assert(p2.contains(baseDirName) &&
        !p2.contains(new java.io.File(storeDir).getName),
        s"f(key, other) must not rewrite:\n$p2")
    }
  }

  test("count(DISTINCT key) is answered as a count of the view's rows") {
    withView { storeDir =>
      def q = spark.read.parquet(basePath).agg(
        countDistinct(col("o_custkey")).as("n_custs"),
        count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"))
      val want = q.collect()
      MvRegistry.register(spark, basePath, storeDir)
      val rewritten = q
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(storeDir).getName) &&
        !plan.contains(baseDirName),
        s"count-distinct-of-key must count the view's rows:\n$plan")
      assert(!plan.contains("Expand"),
        s"the rewritten plan must not carry the distinct expansion:\n$plan")
      assert(rewritten.collect().toSeq == want.toSeq,
        "count-distinct substitution changed the answer")
      // per-band distinct keys through the regroup arm
      def banded = spark.read.parquet(basePath)
        .groupBy((col("o_custkey") % 7).as("band"))
        .agg(countDistinct(col("o_custkey")).as("n_custs"))
        .orderBy("band")
      MvRegistry.unregister(basePath)
      val wantBanded = banded.collect()
      MvRegistry.register(spark, basePath, storeDir)
      val b = banded
      assert(b.queryExecution.executedPlan.toString
        .contains(new java.io.File(storeDir).getName),
        "banded count-distinct-of-key must route to the view")
      assert(b.collect().toSeq == wantBanded.toSeq,
        "banded count-distinct substitution changed the answer")
      // distinct over a NON-key column cannot be answered by partials
      val nonKey = spark.read.parquet(basePath)
        .agg(countDistinct(col("o_totalprice")).as("n_prices"))
      val p = nonKey.queryExecution.executedPlan.toString
      assert(p.contains(baseDirName) &&
        !p.contains(new java.io.File(storeDir).getName),
        s"count(DISTINCT non-key) must not rewrite:\n$p")
    }
  }

  test("HAVING routes: a filter ABOVE the aggregate composes with the rewrite") {
    // HAVING analyzes to Filter(cond, Aggregate(...)); transformUp
    // rewrites the inner aggregate to the view projection and the
    // outer filter applies unchanged on top — no special casing needed,
    // this pins that it stays true
    withView { storeDir =>
      def having = spark.read.parquet(basePath)
        .groupBy("o_custkey").agg(
          count(lit(1)).as("n_orders"),
          min(col("o_totalprice")).as("min_price"))
        .filter(col("n_orders") >= 3)
        .orderBy("o_custkey")
      val want = having.collect()
      assert(want.nonEmpty, "HAVING selected no groups — test is vacuous")
      MvRegistry.register(spark, basePath, storeDir)
      val rewritten = having
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(storeDir).getName) &&
        !plan.contains(baseDirName),
        s"HAVING over a matching aggregate must still answer from the view:\n$plan")
      assert(rewritten.collect().toSeq == want.toSeq,
        "HAVING substitution changed the answer")
    }
  }

  test("a different grouping key disqualifies") {
    withView { storeDir =>
      MvRegistry.register(spark, basePath, storeDir)
      val byStatus = spark.read.parquet(basePath)
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n_orders"))
      val plan = byStatus.queryExecution.executedPlan.toString
      assert(plan.contains(baseDirName) &&
        !plan.contains(new java.io.File(storeDir).getName),
        s"wrong grouping key must not rewrite:\n$plan")
    }
  }

  test("base mutation after registration disqualifies the rewrite until re-registration") {
    // the MECHANICAL freshness gate (round 13): registration captures the
    // base's file-population epoch; a base mutated afterwards must fall
    // back to the base scan (fresh answer), and re-registering a rebuilt
    // view re-arms the rewrite. Private base — this test mutates it.
    val d = java.nio.file.Files.createTempDirectory("mv_fresh").toString + "/base"
    Tables(spark, sf, "orders").write.mode("overwrite").parquet(d)
    val storeDir = java.nio.file.Files.createTempDirectory("mv_fresh_view").toString
    IvmOps.orderPartials(spark.read.parquet(d))
      .write.mode("overwrite").parquet(storeDir)
    val viewName = new java.io.File(storeDir).getName
    val baseName = new java.io.File(d).getParentFile.getName
    def agg = spark.read.parquet(d)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")
    try {
      MvRegistry.register(spark, d, storeDir)
      val p1 = agg.queryExecution.executedPlan.toString
      assert(p1.contains(viewName) && !p1.contains(baseName),
        s"fresh registration must rewrite:\n$p1")

      // mutate the base AFTER registration: append 50 rows
      Tables(spark, sf, "orders").limit(50).write.mode("append").parquet(d)
      val stale = agg
      val p2 = stale.queryExecution.executedPlan.toString
      assert(!p2.contains(viewName) && p2.contains(baseName),
        s"a mutated base must DISQUALIFY the stale view:\n$p2")
      // and the fallback answers the FRESH base, appended rows included
      val totalRows = stale.collect().map(_.getLong(1)).sum
      assert(totalRows == spark.read.parquet(d).count(),
        "fallback answer does not reflect the base mutation")

      // rebuild + re-register → the rewrite re-arms and matches the fallback
      IvmOps.orderPartials(spark.read.parquet(d))
        .write.mode("overwrite").parquet(storeDir)
      MvRegistry.register(spark, d, storeDir)
      val rearmed = agg
      val p3 = rearmed.queryExecution.executedPlan.toString
      assert(p3.contains(viewName) && !p3.contains(baseName),
        s"re-registration must re-arm the rewrite:\n$p3")
      assert(rearmed.collect().map(_.getLong(1)).sum == totalRows,
        "re-armed view answer disagrees with the fresh fallback")
    } finally MvRegistry.unregister(d)
  }

  test("avg(cast src) answers from count+sum partials; bare double avg does NOT route") {
    // round-14 #8: the view stores sum(cast(src AS DECIMAL(18,4))) and
    // count — avg of the SAME cast is their division, substituted via
    // Spark's own Average.evaluateExpression so the semantics (result
    // scale, HALF_UP, null-on-empty) are identical by construction. The
    // bare double avg(src) accumulates in double — a DIFFERENT number —
    // and must keep scanning the base.
    withView { storeDir =>
      def decAvg = spark.read.parquet(basePath)
        .groupBy("o_custkey").agg(
          avg(col("o_totalprice").cast(D)).as("avg_dec"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_custkey")
      val want = decAvg.collect()
      MvRegistry.register(spark, basePath, storeDir)
      val routed = decAvg
      val p1 = routed.queryExecution.executedPlan.toString
      assert(p1.contains(new java.io.File(storeDir).getName) &&
        !p1.contains(baseDirName),
        s"decimal avg must route to the view partials:\n$p1")
      assert(routed.collect().toSeq == want.toSeq,
        "avg substitution changed the answer")
      val bare = spark.read.parquet(basePath)
        .groupBy("o_custkey").agg(avg(col("o_totalprice")).as("avg_d"))
      val p2 = bare.queryExecution.executedPlan.toString
      assert(!p2.contains(new java.io.File(storeDir).getName),
        s"bare double avg must NOT route (different accumulation):\n$p2")
    }
  }

  test("count(DISTINCT src) over a DECLARED dist source routes on the keyed read; regroup/global disqualify") {
    // round-14 #5: the SupplierParts view stores the pair-store-derived
    // n_parts column; a per-suppkey count(DISTINCT l_partkey) is a pure
    // projection of it. Distinct counts do NOT re-aggregate (summing
    // per-group distincts double-counts parts shared across suppliers),
    // so the grouping-free and regrouped reads must fall back.
    val spec = graft.etl.ViewSpec.SupplierParts
    val d = java.nio.file.Files.createTempDirectory("mv_dist").toString + "/li"
    Tables(spark, sf, "lineitem").write.mode("overwrite").parquet(d)
    val storeDir = java.nio.file.Files.createTempDirectory("mv_dist_view").toString
    IvmOps.partials(spark.read.parquet(d), spec)
      .write.mode("overwrite").parquet(storeDir)
    val viewName = new java.io.File(storeDir).getName
    def keyed = spark.read.parquet(d)
      .groupBy("l_suppkey").agg(
        count(lit(1)).as("n_lines"),
        count_distinct(col("l_partkey")).as("n_parts"))
      .orderBy("l_suppkey")
    try {
      val want = keyed.collect()
      MvRegistry.register(spark, d, storeDir, spec)
      val routed = keyed
      val p1 = routed.queryExecution.executedPlan.toString
      assert(p1.contains(viewName),
        s"keyed count(DISTINCT declared-src) must route to the view:\n$p1")
      assert(routed.collect().toSeq == want.toSeq,
        "routed distinct count changed the answer")
      // grouping-free: count(DISTINCT l_partkey) over the whole table
      // is NOT Σ n_parts — must scan the base
      val global = spark.read.parquet(d)
        .agg(count_distinct(col("l_partkey")).as("n_parts"))
      val p2 = global.queryExecution.executedPlan.toString
      assert(!p2.contains(viewName),
        s"global distinct count must NOT re-aggregate the view:\n$p2")
      // regroup by a key function: same non-additivity — must scan base
      val regrouped = spark.read.parquet(d)
        .groupBy((col("l_suppkey") % 10).as("bucket"))
        .agg(count_distinct(col("l_partkey")).as("n_parts"))
      val p3 = regrouped.queryExecution.executedPlan.toString
      assert(!p3.contains(viewName),
        s"regrouped distinct count must NOT re-aggregate the view:\n$p3")
      // count(DISTINCT key) stays answerable (view rows), unaffected
      val keyCount = spark.read.parquet(d)
        .agg(count_distinct(col("l_suppkey")).as("n_supp"))
      val p4 = keyCount.queryExecution.executedPlan.toString
      assert(p4.contains(viewName),
        s"count(DISTINCT key) must still answer from the view's rows:\n$p4")
    } finally MvRegistry.unregister(d)
  }

  test("epoch hardening: swapping two files' mtimes moves the epoch (no linear cancellation)") {
    // round-13's epoch was a commutative SUM of weak per-file products:
    // mtime terms were additive and name-independent, so two files
    // SWAPPING mtimes left the sum — and thus the freshness verdict —
    // unchanged. The round-14 avalanche fold must catch exactly that.
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("mv_epoch").toString
    Files.write(Paths.get(dir, "part-a.parquet"), Array[Byte](1, 2, 3))
    Files.write(Paths.get(dir, "part-b.parquet"), Array[Byte](4, 5, 6))
    val ta = java.nio.file.attribute.FileTime.fromMillis(1700000001000L)
    val tb = java.nio.file.attribute.FileTime.fromMillis(1700000002000L)
    Files.setLastModifiedTime(Paths.get(dir, "part-a.parquet"), ta)
    Files.setLastModifiedTime(Paths.get(dir, "part-b.parquet"), tb)
    val before = MvRegistry.currentEpoch(spark, dir)
    assert(before == MvRegistry.currentEpoch(spark, dir),
      "epoch of an untouched tree must be stable")
    // the offsetting mutation: a↔b swap their modification times
    Files.setLastModifiedTime(Paths.get(dir, "part-a.parquet"), tb)
    Files.setLastModifiedTime(Paths.get(dir, "part-b.parquet"), ta)
    assert(MvRegistry.currentEpoch(spark, dir) != before,
      "swapped mtimes must move the epoch — linear terms cancelled")
  }

  test("epoch hardening: an add/remove pair cannot cancel — count rides the fold") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("mv_epoch2").toString
    Files.write(Paths.get(dir, "part-a.parquet"), Array[Byte](1, 2, 3))
    val one = MvRegistry.currentEpoch(spark, dir)
    Files.write(Paths.get(dir, "part-b.parquet"), Array[Byte](1, 2, 3))
    val two = MvRegistry.currentEpoch(spark, dir)
    assert(two != one, "an added file must move the epoch")
    Files.delete(Paths.get(dir, "part-b.parquet"))
    assert(MvRegistry.currentEpoch(spark, dir) == one,
      "returning to the original population must return the epoch")
    // bookkeeping files are invisible to a scan, so also to the epoch
    Files.write(Paths.get(dir, "_SUCCESS"), Array[Byte]())
    assert(MvRegistry.currentEpoch(spark, dir) == one,
      "a non-data file must not move the epoch")
  }

  test("malformed freshnessIntervalMs degrades to check-always, not a throw") {
    withView { storeDir =>
      spark.conf.set("spark.graft.mv.freshnessIntervalMs", "not-a-number")
      try {
        MvRegistry.register(spark, basePath, storeDir)
        val plan = baseAgg.queryExecution.executedPlan.toString
        assert(plan.contains(new java.io.File(storeDir).getName),
          s"a malformed perf knob must not disable (or crash) the rewrite:\n$plan")
      } finally spark.conf.unset("spark.graft.mv.freshnessIntervalMs")
    }
  }
}
