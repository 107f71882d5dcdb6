package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.IvmOps

class IvmSpec extends AnyFunSuite with SparkSuite {

  private val D = DecimalType(18, 4)

  // the identical dataflow as the oracled queries, but against PRIVATE
  // store dirs: EntrySpec and ShuffleBudgetSpec both execute the query
  // surface in parallel suites, and a third writer on the shared scratch
  // would overwrite a store mid-read
  private def privateDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/store"

  test("ivm1: incremental insert-only refresh equals the full recompute") {
    val refreshed = IvmOps.ivm1At(spark, sf, privateDir("ivm1_spec"))
    val full = Tables(spark, sf, "orders")
      .groupBy("o_custkey").agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(D)).cast("double").as("sum_price"),
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"))
      .orderBy("o_custkey")
    assert(refreshed.exceptAll(full).count() == 0 &&
      full.exceptAll(refreshed).count() == 0,
      "refreshed view differs from full recompute")
  }

  test("ivm1: the refresh plan reads the stored partials, not the base rows") {
    // Run once so the store exists, then inspect the refresh's scans: the
    // store parquet must be one of them — the merge consumes partials.
    val storeDir = privateDir("ivm1_plan")
    val df = IvmOps.ivm1At(spark, sf, storeDir)
    df.write.format("noop").mode("overwrite").save()
    val scans = df.queryExecution.executedPlan.toString
    assert(scans.contains(new java.io.File(storeDir).getName),
      s"refresh plan does not scan the partial store $storeDir:\n$scans")
    // and the store is view-sized: one row per base custkey, not per order
    val store = spark.read.parquet(storeDir)
    assert(store.count() == store.select("o_custkey").distinct().count())
  }

  test("ivm2: retraction refresh equals the changelog applied directly") {
    val refreshed = IvmOps.ivm2At(spark, sf, privateDir("ivm2_spec"))
    // Direct (non-incremental) evaluation of the same changelog semantics.
    val orders = Tables(spark, sf, "orders")
    val withCut = orders.crossJoin(
      broadcast(orders.agg(expr("(max(o_orderkey) + 1) div 2").as("cut"))))
    val survivors = withCut
      .filter(col("o_orderkey") < col("cut"))
      .filter(!(col("o_orderkey") % 13 === 5 && col("o_orderkey") % 7 =!= 3))
      .select(col("o_custkey"),
        (col("o_totalprice").cast(D) +
          when(col("o_orderkey") % 7 === 3,
            lit(new java.math.BigDecimal("100.0000")).cast(D))
            .otherwise(lit(java.math.BigDecimal.ZERO).cast(D))).as("p"))
    val inserts = withCut.filter(col("o_orderkey") >= col("cut"))
      .select(col("o_custkey"), col("o_totalprice").cast(D).cast(survivors.schema("p").dataType).as("p"))
    val full = survivors.unionByName(inserts)
      .groupBy("o_custkey").agg(
        count(lit(1)).as("n_orders"),
        sum("p").cast("double").as("sum_price"))
      .orderBy("o_custkey")
    assert(refreshed.exceptAll(full).count() == 0 &&
      full.exceptAll(refreshed).count() == 0,
      "retraction-refreshed view differs from the directly-applied changelog")
  }

  test("ivm2 algebra: a group fully retracted leaves the view; updates keep membership") {
    import spark.implicits._
    val store = Seq((1L, 1L, "5.0000"), (2L, 2L, "10.0000"))
      .toDF("o_custkey", "n_orders", "sum_dec")
      .select(col("o_custkey"), col("n_orders"),
        col("sum_dec").cast(DecimalType(28, 4)).as("sum_dec"))
    val adj = Seq(
      (1L, -1L, "-5.0000"),  // delete custkey 1's only order → group leaves
      (2L, 0L, "100.0000"))  // update one of custkey 2's orders
      .toDF("o_custkey", "dn", "ds")
      .select(col("o_custkey"), col("dn"),
        col("ds").cast(DecimalType(28, 4)).as("ds"))
    val out = IvmOps.refreshWithRetractions(store, adj)
      .select(col("o_custkey"), col("n_orders"), col("sum_dec").cast("double").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set((2L, 2L, 110.0)),
      s"expected only custkey 2 with (n=2, sum=110.0), got $out")
  }

  test("ivm2b: full-view retraction refresh (min/max included) equals the changelog applied directly") {
    val refreshed = IvmOps.ivm2bAt(spark, sf, privateDir("ivm2b_spec"))
    val orders = Tables(spark, sf, "orders")
    val withCut = orders.crossJoin(
      broadcast(orders.agg(expr("(max(o_orderkey) + 1) div 2").as("cut"))))
    val survivors = withCut
      .filter(col("o_orderkey") < col("cut"))
      .filter(!(col("o_orderkey") % 13 === 5 && col("o_orderkey") % 7 =!= 3))
      .select(col("o_custkey"),
        (col("o_totalprice").cast(D) +
          when(col("o_orderkey") % 7 === 3,
            lit(new java.math.BigDecimal("100.0000")).cast(D))
            .otherwise(lit(java.math.BigDecimal.ZERO).cast(D))).as("p"),
        when(col("o_orderkey") % 7 === 3, col("o_totalprice") + lit(100.0))
          .otherwise(col("o_totalprice")).as("v"))
    val inserts = withCut.filter(col("o_orderkey") >= col("cut"))
      .select(col("o_custkey"),
        col("o_totalprice").cast(D).cast(survivors.schema("p").dataType).as("p"),
        col("o_totalprice").as("v"))
    val full = survivors.unionByName(inserts)
      .groupBy("o_custkey").agg(
        count(lit(1)).as("n_orders"),
        sum("p").cast("double").as("sum_price"),
        min("v").as("min_price"), max("v").as("max_price"))
      .orderBy("o_custkey")
    assert(refreshed.exceptAll(full).count() == 0 &&
      full.exceptAll(refreshed).count() == 0,
      "full-view retraction refresh differs from the directly-applied changelog")
  }

  test("ivm2b gate: only extremum-hit groups recompute; untouched groups never consult the base") {
    import spark.implicits._
    // store: g1 {1.0, 5.0}, g2 {2.0, 4.0}
    val baseRows = Seq((1L, 1.0), (1L, 5.0), (2L, 2.0), (2L, 4.0))
      .toDF("o_custkey", "v")
    val store = baseRows.groupBy("o_custkey").agg(
      count(lit(1)).as("n_orders"),
      sum(col("v").cast(D)).as("sum_dec"),
      min("v").as("min_price"), max("v").as("max_price"))
    // changelog: delete g1's MIN (1.0) → extremum hit; insert 3.0 into g2
    // (interior value, no hit)
    val changes = Seq(
      (1L, -1L, "-1.0000", Some(1.0), None: Option[Double]),
      (2L, 1L, "3.0000", None: Option[Double], Some(3.0)))
      .toDF("o_custkey", "dn", "ds", "v_removed", "v_added")
      .select(col("o_custkey"), col("dn"),
        col("ds").cast(DecimalType(28, 4)).as("ds"),
        col("v_removed"), col("v_added"))
    assert(IvmOps.extremumTouchedGroups(store, changes)
      .collect().map(_.getLong(0)).toSet == Set(1L),
      "exactly the min-deleting group must be flagged for recompute")
    // POISON base rows for the untouched group: if the refresh consulted
    // the base anywhere outside the touched-group semi-join, g2's min
    // would read -999.0 — it must come purely from the store/adds merge
    val current = Seq((1L, 5.0), (2L, -999.0)).toDF("o_custkey", "v")
    val out = IvmOps.refreshWithRetractionsFull(store, changes, current)
      .select(col("o_custkey"), col("n_orders"),
        col("sum_dec").cast("double").as("s"),
        col("min_price"), col("max_price"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(out == Set(
      (1L, 1L, 5.0, 5.0, 5.0),    // recomputed from the group's own rows
      (2L, 3L, 9.0, 2.0, 4.0)),   // merged: least/greatest of store + adds
      s"unexpected refreshed view: $out")
    // the recompute branch is a left-semi-gated read — the plan carries it
    val plan = IvmOps.refreshWithRetractionsFull(store, changes, current)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"group-scoped recompute must read the base through a semi-join:\n$plan")
    // an extremum-free changelog flags NOTHING — zero base groups re-read
    val interiorOnly = changes.filter(col("o_custkey") === 2L)
    assert(IvmOps.extremumTouchedGroups(store, interiorOnly).count() == 0,
      "a changelog that never removes an extremum must touch zero groups")
  }

  test("ivm2b gate: a group born AND retracted within one changelog recomputes (store-absent removal)") {
    import spark.implicits._
    // store knows nothing of group 9; one batch inserts {5.0, 1.0} and
    // deletes the 1.0 — the merge path would answer min = least(null,
    // add_min) = 1.0, counting the retracted value as if it survived
    val store = Seq((1L, 1L, "7.0000", 7.0, 7.0))
      .toDF("o_custkey", "n_orders", "sum_dec", "min_price", "max_price")
      .select(col("o_custkey"), col("n_orders"),
        col("sum_dec").cast(DecimalType(28, 4)).as("sum_dec"),
        col("min_price"), col("max_price"))
    val changes = Seq(
      (9L, 1L, "5.0000", None: Option[Double], Some(5.0)),
      (9L, 1L, "1.0000", None: Option[Double], Some(1.0)),
      (9L, -1L, "-1.0000", Some(1.0), None: Option[Double]))
      .toDF("o_custkey", "dn", "ds", "v_removed", "v_added")
      .select(col("o_custkey"), col("dn"),
        col("ds").cast(DecimalType(28, 4)).as("ds"),
        col("v_removed"), col("v_added"))
    assert(IvmOps.extremumTouchedGroups(store, changes)
      .collect().map(_.getLong(0)).toSet == Set(9L),
      "a removal against a store-absent group must trip the recompute gate")
    val current = Seq((1L, 7.0), (9L, 5.0)).toDF("o_custkey", "v")
    val out = IvmOps.refreshWithRetractionsFull(store, changes, current)
      .filter(col("o_custkey") === 9L)
      .select(col("n_orders"), col("min_price"), col("max_price"))
      .head()
    assert((out.getLong(0), out.getDouble(1), out.getDouble(2)) == ((1L, 5.0, 5.0)),
      s"born-and-retracted group must recompute, got $out")
  }

  test("ivm2b law: refresh equals recompute across changelog variants") {
    import spark.implicits._
    // exercise each gate edge: delete-at-max, update moving the min UP
    // (old value out = extremum hit), duplicate-extremum delete (the
    // conservative recompute still lands right), full-group retraction
    val baseRows = Seq(
      (1L, 1.0), (1L, 1.0), (1L, 9.0),   // duplicated min
      (2L, 2.0), (2L, 8.0),              // max-delete target
      (3L, 3.0), (3L, 7.0),              // min-update target
      (4L, 4.0))                         // full retraction
      .toDF("o_custkey", "v")
    val store = baseRows.groupBy("o_custkey").agg(
      count(lit(1)).as("n_orders"),
      sum(col("v").cast(D)).as("sum_dec"),
      min("v").as("min_price"), max("v").as("max_price"))
    val changes = Seq(
      (1L, -1L, "-1.0000", Some(1.0), None: Option[Double]), // one of the dup mins
      (2L, -1L, "-8.0000", Some(8.0), None: Option[Double]), // the max
      (3L, 0L, "7.0000", Some(3.0), Some(10.0)),             // min 3 → 10
      (4L, -1L, "-4.0000", Some(4.0), None: Option[Double])) // group empties
      .toDF("o_custkey", "dn", "ds", "v_removed", "v_added")
      .select(col("o_custkey"), col("dn"),
        col("ds").cast(DecimalType(28, 4)).as("ds"),
        col("v_removed"), col("v_added"))
    // post-changelog truth
    val current = Seq((1L, 1.0), (1L, 9.0), (2L, 2.0), (3L, 7.0), (3L, 10.0))
      .toDF("o_custkey", "v")
    val got = IvmOps.refreshWithRetractionsFull(store, changes, current)
      .select(col("o_custkey"), col("n_orders"),
        col("sum_dec").cast("double").as("s"),
        col("min_price"), col("max_price"))
    val want = current.groupBy("o_custkey").agg(
      count(lit(1)).as("n_orders"),
      sum(col("v").cast(D)).cast("double").as("s"),
      min("v").as("min_price"), max("v").as("max_price"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      s"refresh diverged from recompute: got ${got.collect().toSeq} " +
        s"want ${want.collect().toSeq}")
  }

  test("ivm4: join-view refresh equals the full join recompute; delta join broadcasts the dim") {
    val storeDir = privateDir("ivm4_spec")
    val refreshed = IvmOps.ivm4At(spark, sf, storeDir)
    val full = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey").agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(D)).cast("double").as("sum_price"))
      .orderBy("c_nationkey")
    assert(refreshed.exceptAll(full).count() == 0 &&
      full.exceptAll(refreshed).count() == 0,
      "join-view refresh differs from the full join recompute")
    val plan = refreshed.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the delta join must broadcast the dimension:\n$plan")
    assert(plan.contains(new java.io.File(storeDir).getName),
      s"refresh must read the stored join partials:\n$plan")
  }

  test("a store bucketed on the view key merges exchange-free on its side") {
    // The deployment claim in IvmOps' scaladoc, as a plan pin: bucket
    // the store by o_custkey (bucket count == shuffle partitions so the
    // delta agg's clustering satisfies the join), and the full-outer
    // merge needs EXACTLY ONE exchange — the delta's partial aggregation.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables(spark, sf, "orders")
      val base = orders.filter(col("o_orderkey") % 2 === 0)
      val delta = orders.filter(col("o_orderkey") % 2 === 1)
      IvmOps.orderPartials(base)
        .write.mode("overwrite").bucketBy(4, "o_custkey").sortBy("o_custkey")
        .saveAsTable("ivm_store_bucketed")
      val store = spark.table("ivm_store_bucketed")
      val merged = IvmOps.refreshInsertOnlyMerged(store, delta)
      val plan = merged.queryExecution.executedPlan.toString
      val shuffles = "(?m)^\\s*[+:|\\- ]*Exchange ".r.findAllIn(plan).size
      assert(plan.contains("Bucketed: true"), s"store scan not bucketed:\n$plan")
      assert(shuffles == 1,
        s"expected only the delta partial-agg exchange, got $shuffles:\n$plan")
      // value-equivalent to the union-form refresh
      val unionForm = IvmOps.refreshInsertOnly(store, delta)
      def norm(df: org.apache.spark.sql.DataFrame) = df.select(
        col("o_custkey"), col("n_orders"),
        col("sum_dec").cast("double").as("s"), col("min_price"), col("max_price"))
      assert(norm(merged).exceptAll(norm(unionForm)).count() == 0 &&
        norm(unionForm).exceptAll(norm(merged)).count() == 0,
        "join-form merge diverges from the union-form refresh")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS ivm_store_bucketed")
    }
  }

  test("generic view laws: a TWO-SUM, MAX-only declared view runs the same refresh algebra") {
    import spark.implicits._
    import graft.etl.{ExtAgg, SumAgg, ViewSpec}
    // a spec shaped like NEITHER built-in view: two sums with their own
    // delta columns, one max (no min) — exercises the Seq-generality of
    // the lifted operators beyond the Orders/PartItems instances
    val v = ViewSpec(groupCol = "k", countOut = "n",
      sums = Seq(SumAgg("x", "sum_x", "dx"), SumAgg("y", "sum_y", "dy")),
      exts = Seq(ExtAgg(isMin = false, "x", "max_x")))
    val base = Seq((1L, 2.0, 10.0), (1L, 5.0, 20.0), (2L, 3.0, 30.0))
      .toDF("k", "x", "y")
    val store = IvmOps.partials(base, v)
    // delete g1's MAX x (5.0) → recompute gate; insert (2, 4.0, 40.0)
    // (no removal → g2 merges)
    val changes = Seq(
      (1L, -1L, "-5.0000", "-20.0000", Some(5.0), None: Option[Double]),
      (2L, 1L, "4.0000", "40.0000", None: Option[Double], Some(4.0)))
      .toDF("k", "dn", "dx", "dy", "v_removed", "v_added")
      .select(col("k"), col("dn"),
        col("dx").cast(DecimalType(28, 4)).as("dx"),
        col("dy").cast(DecimalType(28, 4)).as("dy"),
        col("v_removed"), col("v_added"))
    val current = Seq((1L, 2.0), (2L, 3.0), (2L, 4.0)).toDF("k", "v")
    assert(IvmOps.extremumTouchedGroups(store, changes, v)
      .collect().map(_.getLong(0)).toSet == Set(1L),
      "only the max-deleting group must recompute under the declared spec")
    val got = IvmOps.refreshWithRetractionsFull(store, changes, current, v)
      .select(col("k"), col("n"), col("sum_x").cast("double").as("sx"),
        col("sum_y").cast("double").as("sy"), col("max_x"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got == Set(
      (1L, 1L, 2.0, 10.0, 2.0),   // recomputed max from the group's rows
      (2L, 2L, 7.0, 70.0, 4.0)),  // merged: greatest(store 3.0, add 4.0)
      s"declared-spec refresh diverged: $got")
    // insert-only law under the same spec: refresh equals full recompute
    val d2 = Seq((2L, 1.0, 5.0), (3L, 9.0, 9.0)).toDF("k", "x", "y")
    val refreshed = IvmOps.refreshInsertOnly(store, d2, v)
    val full = IvmOps.partials(base.unionByName(d2), v)
    assert(refreshed.exceptAll(full).count() == 0 &&
      full.exceptAll(refreshed).count() == 0,
      "declared-spec insert-only refresh differs from full recompute")
  }

  test("multi-source extrema: each source gates and recomputes against its OWN population") {
    import spark.implicits._
    import graft.etl.{ExtAgg, SumAgg, ViewSpec}
    // round-13 lift: min(x), max(y) in ONE view — x's changelog pair is
    // the bare (v_removed, v_added), y's is suffixed (ViewSpec.removedFor)
    val v = ViewSpec(groupCol = "k", countOut = "n",
      sums = Seq(SumAgg("x", "sum_x", "dx")),
      exts = Seq(ExtAgg(isMin = true, "x", "min_x"),
        ExtAgg(isMin = false, "y", "max_y")))
    assert(v.removedFor("x") == "v_removed" && v.valueFor("x") == "v",
      "first source must keep the bare single-source names")
    assert(v.removedFor("y") == "v_removed_y" && v.addedFor("y") == "v_added_y",
      "further sources must carry suffixed changelog columns")
    val base = Seq((1L, 2.0, 10.0), (1L, 5.0, 20.0), (2L, 3.0, 30.0))
      .toDF("k", "x", "y")
    val store = IvmOps.partials(base, v)
    // g1: delete the row holding min x (2.0) AND max y (20.0)? No —
    // delete (1, 2.0, 10.0): removes g1's min_x (gate for x) but NOT
    // its max_y (10.0 < 20.0, y merges). g2: insert (2, 1.0, 5.0):
    // no removal anywhere, both sources merge.
    val changes = Seq(
      (1L, -1L, "-2.0000", Some(2.0), None: Option[Double],
        Some(10.0), None: Option[Double]),
      (2L, 1L, "1.0000", None: Option[Double], Some(1.0),
        None: Option[Double], Some(5.0)))
      .toDF("k", "dn", "dx", "v_removed", "v_added",
        "v_removed_y", "v_added_y")
      .select(col("k"), col("dn"),
        col("dx").cast(DecimalType(28, 4)).as("dx"),
        col("v_removed"), col("v_added"),
        col("v_removed_y"), col("v_added_y"))
    // the delete touches g1 ONLY via the x gate: its removed y (10.0)
    // does not reach the stored max_y (20.0)
    assert(IvmOps.extremumTouchedGroups(store, changes, v)
      .collect().map(_.getLong(0)).toSet == Set(1L),
      "only the min_x-deleting group must recompute")
    // post-changelog truth with BOTH value columns
    val current = Seq((1L, 5.0, 20.0), (2L, 3.0, 30.0), (2L, 1.0, 5.0))
      .toDF("k", "v", "v_y")
    val got = IvmOps.refreshWithRetractionsFull(store, changes, current, v)
      .select(col("k"), col("n"), col("sum_x").cast("double").as("sx"),
        col("min_x"), col("max_y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got == Set(
      (1L, 1L, 5.0, 5.0, 20.0),   // min_x recomputed; max_y from recompute too (touched group)
      (2L, 2L, 4.0, 1.0, 30.0)),  // both sources merged: least(3,1), greatest(30,5)
      s"multi-source refresh diverged: $got")
  }

  test("distinct-count law: pair multiplicities keep count(DISTINCT src) exact under retractions") {
    import spark.implicits._
    import graft.etl.{DistAgg, SumAgg, ViewSpec}
    // round-14 #5. The hinge case: a value held TWICE in a group loses
    // one holder — the naive set-store would drop the value; the pair
    // multiplicity (2 → 1) keeps it, and only the LAST holder's
    // retraction removes the distinct.
    val v = ViewSpec(groupCol = "k", countOut = "n",
      sums = Seq(SumAgg("x", "sum_x", "dx")),
      dists = Seq(DistAgg("p", "n_p")))
    val base = Seq((1L, 2.0, 10L), (1L, 3.0, 10L), (1L, 4.0, 20L),
      (2L, 5.0, 30L)).toDF("k", "x", "p")
    val store = IvmOps.partials(base, v)
    assert(store.filter(col("k") === 1L).head().getAs[Long]("n_p") == 2L,
      "seed partials must count distinct sources")
    val pairs = IvmOps.pairPartials(base, v, v.dists.head)
    // changelog: delete ONE of g1's two p=10 lines (distinct survives),
    // delete g1's only p=20 line (distinct drops), insert p=40 into g2
    val changes = Seq(
      (1L, -1L, "-2.0000", Some(10L), None: Option[Long]),
      (1L, -1L, "-4.0000", Some(20L), None: Option[Long]),
      (2L, 1L, "7.0000", None: Option[Long], Some(40L)))
      .toDF("k", "dn", "dx", "v_removed", "v_added")
      .select(col("k"), col("dn"),
        col("dx").cast(DecimalType(28, 4)).as("dx"),
        col("v_removed"), col("v_added"))
    val (got, newPairs) = IvmOps.refreshWithRetractionsDistinct(
      store, Seq(v.dists.head -> pairs), changes, v)
    val rows = got.select(col("k"), col("n"),
      col("sum_x").cast("double").as("sx"), col("n_p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(rows == Set(
      (1L, 1L, 3.0, 1L),  // p=10 survives via multiplicity; p=20 gone
      (2L, 2L, 12.0, 2L)),
      s"retraction distinct refresh diverged: $rows")
    // the refreshed pair store equals the post-changelog recompute —
    // the subset law that makes further folds exact
    val after = Seq((1L, 3.0, 10L), (2L, 5.0, 30L), (2L, 7.0, 40L))
      .toDF("k", "x", "p")
    val pairsWant = IvmOps.pairPartials(after, v, v.dists.head)
    val pairsGot = newPairs.head._2
    assert(pairsGot.exceptAll(pairsWant).count() == 0 &&
      pairsWant.exceptAll(pairsGot).count() == 0,
      "refreshed pair store differs from the post-changelog recompute")
    // insert-only branch: refresh equals full recompute, and two
    // sequential folds equal one (batch-boundary independence)
    val d1 = Seq((1L, 1.0, 20L), (3L, 2.0, 10L)).toDF("k", "x", "p")
    val d2 = Seq((3L, 3.0, 10L), (3L, 4.0, 50L)).toDF("k", "x", "p")
    val (one, onePairs) = IvmOps.refreshInsertOnlyDistinct(
      store, Seq(v.dists.head -> pairs), d1.unionByName(d2), v)
    val (s1, p1) = IvmOps.refreshInsertOnlyDistinct(
      store, Seq(v.dists.head -> pairs), d1, v)
    val (two, _) = IvmOps.refreshInsertOnlyDistinct(s1, p1, d2, v)
    val full = IvmOps.withDistincts(
      IvmOps.partials(base.unionByName(d1).unionByName(d2), v.copy(dists = Nil)),
      Seq(v.dists.head ->
        IvmOps.pairPartials(base.unionByName(d1).unionByName(d2), v, v.dists.head)),
      v)
    for ((name, got) <- Seq(("one-fold", one), ("two-fold", two))) {
      assert(got.exceptAll(full).count() == 0 &&
        full.exceptAll(got).count() == 0,
        s"$name insert-only distinct refresh differs from full recompute")
    }
    assert(onePairs.head._2.exceptAll(
      IvmOps.pairPartials(base.unionByName(d1).unionByName(d2), v, v.dists.head))
      .count() == 0, "insert-only pair fold differs from recompute")
  }

  test("extrema AND distinct counts compose in ONE refresh entry point (retraction law)") {
    import spark.implicits._
    import graft.etl.{DistAgg, ExtAgg, SumAgg, ViewSpec}
    // round-15 #6: the require that punted this shape to manual
    // composition is gone — refreshWithRetractionsDistinct routes the
    // core through refreshWithRetractionsFull when extrema are declared,
    // driven by the SAME changelog that feeds the pair stores
    val v = ViewSpec(groupCol = "k", countOut = "n",
      sums = Seq(SumAgg("x", "sum_x", "dx")),
      exts = Seq(ExtAgg(isMin = true, src = "x", out = "min_x")),
      dists = Seq(DistAgg("p", "n_p")))
    val base = Seq((1L, 2.0, 10L), (1L, 3.0, 10L), (1L, 4.0, 20L),
      (2L, 5.0, 30L)).toDF("k", "x", "p")
    val store = IvmOps.partials(base, v)
    val pairs = IvmOps.pairPartials(base, v, v.dists.head)
    // delete g1's stored MIN (x=2, a p=10 holder: distinct survives via
    // multiplicity), delete g1's only p=20 line, insert into g2 (merge
    // branch for its min) — exercising recompute, pair retract, and merge
    val changes = Seq(
      (1L, -1L, "-2.0000", Some(2.0), None: Option[Double], Some(10L), None: Option[Long]),
      (1L, -1L, "-4.0000", Some(4.0), None: Option[Double], Some(20L), None: Option[Long]),
      (2L, 1L, "7.0000", None: Option[Double], Some(7.0), None: Option[Long], Some(40L)))
      .toDF("k", "dn", "dx", "v_removed", "v_added", "v_removed_p", "v_added_p")
      .select(col("k"), col("dn"), col("dx").cast(DecimalType(28, 4)).as("dx"),
        col("v_removed"), col("v_added"), col("v_removed_p"), col("v_added_p"))
    val after = Seq((1L, 3.0, 10L), (2L, 5.0, 30L), (2L, 7.0, 40L))
      .toDF("k", "x", "p")
    val currentRows = after.select(col("k"), col("x").as("v"), col("p").as("v_p"))
    val (got, newPairs) = IvmOps.refreshWithRetractionsDistinct(
      store, Seq(v.dists.head -> pairs), changes, v, Some(currentRows))
    val rows = got.select(col("k"), col("n"),
      col("sum_x").cast("double").as("sx"), col("min_x"), col("n_p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toSet
    assert(rows == Set(
      (1L, 1L, 3.0, 3.0, 1L),   // min recomputed 2.0 → 3.0; p=10 survives
      (2L, 2L, 12.0, 5.0, 2L)), // min merged least(5, 7); p=40 joins
      s"composed extrema+distinct refresh diverged: $rows")
    // the law: composed refresh == full recompute over the
    // post-changelog base, pairs included
    val full = IvmOps.withDistincts(
      IvmOps.partials(after, v.copy(dists = Nil)),
      Seq(v.dists.head -> IvmOps.pairPartials(after, v, v.dists.head)), v)
    assert(got.exceptAll(full).count() == 0 && full.exceptAll(got).count() == 0,
      "composed refresh differs from the post-changelog recompute")
    val pairsWant = IvmOps.pairPartials(after, v, v.dists.head)
    assert(newPairs.head._2.exceptAll(pairsWant).count() == 0 &&
      pairsWant.exceptAll(newPairs.head._2).count() == 0,
      "refreshed pair store differs from the post-changelog recompute")
    // the contract is still explicit: extrema without currentRows throw
    val e = intercept[IllegalArgumentException] {
      IvmOps.refreshWithRetractionsDistinct(
        store, Seq(v.dists.head -> pairs), changes, v)
    }
    assert(e.getMessage.contains("currentRows"))
  }

  test("ivm8c law: sketched distinct folds are batch-boundary independent; retraction refuses") {
    import spark.implicits._
    import graft.etl.{DistAgg, SumAgg, ViewSpec}
    // round-15 #8: the HLL union is associative at fixed lgK, so the
    // folded sketch store — not just its estimate — is independent of
    // how the inserts were batched, the same law the pair store
    // satisfies. At these cardinalities the sketch is in sparse mode,
    // so the estimates are additionally EXACT.
    val v = ViewSpec(groupCol = "k", countOut = "n",
      sums = Seq(SumAgg("x", "sum_x", "dx")),
      dists = Seq(DistAgg("p", "n_p", rsd = Some(0.02))))
    val rng = new scala.util.Random(42)
    def chunk(g: Int, n: Int) = Seq.fill(n)(
      (rng.nextInt(g).toLong, rng.nextInt(100).toDouble, rng.nextInt(500).toLong))
    val base = chunk(5, 200).toDF("k", "x", "p")
    val d1 = chunk(5, 150).toDF("k", "x", "p")
    val d2 = chunk(5, 150).toDF("k", "x", "p")
    val store = IvmOps.partials(base, v)
    val sk = IvmOps.distPartials(base, v, v.dists.head)
    val (one, _) = IvmOps.refreshInsertOnlyDistinct(
      store, Seq(v.dists.head -> sk), d1.unionByName(d2), v)
    val (s1, p1) = IvmOps.refreshInsertOnlyDistinct(
      store, Seq(v.dists.head -> sk), d1, v)
    val (two, twoPairs) = IvmOps.refreshInsertOnlyDistinct(s1, p1, d2, v)
    assert(one.exceptAll(two).count() == 0 && two.exceptAll(one).count() == 0,
      "one-fold and two-fold sketched views diverge — the union law is broken")
    // sparse-mode exactness at this cardinality: estimate == exact
    val all = base.unionByName(d1).unionByName(d2)
    val exact = all.groupBy("k").agg(count_distinct(col("p")).as("e"))
    val cmp = two.join(exact, Seq("k"))
      .filter(col("n_p") =!= col("e")).count()
    assert(cmp == 0, "sparse-mode sketch estimates must be exact here")
    // the store is |groups| rows of bounded sketches, not a pair multiset
    val skRows = twoPairs.head._2.count()
    assert(skRows == 5, s"sketch store must hold one row per group, got $skRows")
    // retraction entry point refuses a sketched dist at require-time
    val e = intercept[IllegalArgumentException] {
      IvmOps.refreshWithRetractionsDistinct(store,
        Seq(v.dists.head -> sk),
        Seq((1L, -1L, "-1.0000", Some(1L), None: Option[Long]))
          .toDF("k", "dn", "dx", "v_removed", "v_added")
          .select(col("k"), col("dn"),
            col("dx").cast(DecimalType(28, 4)).as("dx"),
            col("v_removed"), col("v_added")), v)
    }
    assert(e.getMessage.contains("cannot retract"))
  }

  test("ivm1 merge is increment-order independent: two deltas in sequence equal one") {
    import spark.implicits._
    def snap(rows: Seq[(Long, Double)]) =
      rows.toDF("o_custkey", "o_totalprice")
    val base = snap(Seq((1L, 10.0), (2L, 20.0)))
    val d1 = snap(Seq((1L, 5.0), (3L, 7.0)))
    val d2 = snap(Seq((2L, 1.0), (3L, 2.0)))
    val store0 = IvmOps.orderPartials(base)
    val seq2 = IvmOps.refreshInsertOnly(IvmOps.refreshInsertOnly(store0, d1), d2)
    val once = IvmOps.refreshInsertOnly(store0, d1.unionByName(d2))
    assert(seq2.exceptAll(once).count() == 0 && once.exceptAll(seq2).count() == 0,
      "folding two deltas sequentially must equal folding their union once")
  }
}
