package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{IvmOps, StoreFs}
import graft.streaming.IvmStream

/** Streaming twin of ivm1: micro-batch order deltas folded into the
  * persisted per-custkey view, one committed store version per applied
  * batch, exactly-once via the version marker's batch identity.
  */
class IvmStreamSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def rows(seed: Int) = {
    val rng = new scala.util.Random(seed)
    // cents-exact prices: decimal partials are exact regardless, but
    // min/max compare raw doubles, so keep the fixture on the 2dp grid
    Seq.fill(40)((rng.nextInt(100000).toLong, rng.nextInt(7).toLong,
      (rng.nextInt(100000) + 1) / 100.0))
  }

  private def writeDelta(inDir: String, seed: Int): Seq[(Long, Long, Double)] = {
    val d = rows(seed)
    d.toDF("o_orderkey", "o_custkey", "o_totalprice")
      .coalesce(1).write.mode("append").parquet(inDir)
    d
  }

  private def fullRecompute(all: Seq[(Long, Long, Double)]) =
    IvmStream.canonical(IvmOps.orderPartials(
      all.toDF("o_orderkey", "o_custkey", "o_totalprice")))

  private def assertViewEquals(got: org.apache.spark.sql.DataFrame,
      want: org.apache.spark.sql.DataFrame, clue: String): Unit =
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      s"$clue: live view diverges from the batch recompute")

  test("a DECLARED view streams through the same machinery: PartItems folds + routes reads") {
    // the ivm5 lineitem-by-partkey view (count, decimal quantity sum,
    // min extended price) maintained as a stream purely by declaration —
    // schemas, store layout, canonical cast, and rewrite registration
    // all derive from the ViewSpec
    val spec = graft.etl.ViewSpec.PartItems
    val inDir = java.nio.file.Files.createTempDirectory("ivm_li_in").toString
    val store = java.nio.file.Files.createTempDirectory("ivm_li_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivm_li_ckpt").toString
    val base = java.nio.file.Files.createTempDirectory("ivm_li_base").toString + "/base"
    val liSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("l_partkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("l_quantity",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("l_extendedprice",
        org.apache.spark.sql.types.DoubleType)))
    def liRows(seed: Int) = {
      val rng = new scala.util.Random(seed)
      Seq.fill(50)((rng.nextInt(9).toLong, rng.nextInt(50).toDouble + 1.0,
        (rng.nextInt(100000) + 1) / 100.0))
    }
    val all = (1 to 3).flatMap { i =>
      val d = liRows(300 + i)
      d.toDF("l_partkey", "l_quantity", "l_extendedprice")
        .coalesce(1).write.mode("append").parquet(inDir)
      d
    }
    // the registered base the routed read scans (content irrelevant to
    // the ROUTING assertion — registration pins path → view)
    all.toDF("l_partkey", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(base)
    try {
      val q = IvmStream.viewRefreshStream(spark, inDir, store, ckpt,
        registerBase = Some(base), spec = spec, deltaSchema = liSchema)
      q.processAllAvailable(); q.stop()
      val Some((_, view)) = IvmStream.liveView(spark, store)
      val want = IvmStream.canonicalFor(IvmOps.partials(
        all.toDF("l_partkey", "l_quantity", "l_extendedprice"), spec), spec)
      assertViewEquals(view, want, "declared-view stream")
      // read side: the per-partkey aggregate over the registered base
      // must route to the streamed store under the DECLARED vocabulary
      // (count/min only — the stream's sum partial is pinned 38,4 for
      // cross-version schema stability, so a 28,4-summing query
      // correctly does not match, same as the orders routing test)
      val routed = spark.read.parquet(base)
        .groupBy("l_partkey").agg(
          count(lit(1)).as("n_items"),
          min(col("l_extendedprice")).as("min_eprice"))
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(store).getName),
        s"read over the registered base must route to the streamed view:\n$plan")
    } finally graft.plans.MvRegistry.unregister(base)
  }

  test("three micro-batches fold into the view; one committed version per batch") {
    val inDir = java.nio.file.Files.createTempDirectory("ivm_in").toString
    val store = java.nio.file.Files.createTempDirectory("ivm_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivm_ckpt").toString
    val all = (1 to 3).flatMap(i => writeDelta(inDir, 100 + i))
    val q = IvmStream.viewRefreshStream(spark, inDir, store, ckpt)
    q.processAllAvailable(); q.stop()
    val fs = StoreFs.fs(spark, store)
    val versions = StoreFs.committedVersions(fs, store)
    assert(versions == Seq(1, 2, 3), s"expected v1..v3 committed, got $versions")
    val Some((live, view)) = IvmStream.liveView(spark, store)
    assert(live == 3)
    assertViewEquals(view, fullRecompute(all), "after 3 batches")
    // each version carries a distinct batch identity — the transaction log
    val ids = versions.map(n => StoreFs.readMarker(fs, s"$store/v$n").get)
    assert(ids == ids.distinct && ids.forall(_.startsWith("batch:")),
      s"marker identities must be distinct batch ids: $ids")
  }

  test("replay after a crash between marker flip and checkpoint commit does NOT double-fold") {
    val inDir = java.nio.file.Files.createTempDirectory("ivm_in2").toString
    val store = java.nio.file.Files.createTempDirectory("ivm_store2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivm_ckpt2").toString
    val all = (1 to 2).flatMap(i => writeDelta(inDir, 200 + i))
    @volatile var killed = false
    val q1 = IvmStream.viewRefreshStream(spark, inDir, store, ckpt,
      onBatchCommitted = _ => if (!killed) {
        killed = true
        throw new RuntimeException("injected crash after marker flip")
      })
    val err = intercept[Throwable] { q1.processAllAvailable() }
    assert(Iterator.iterate(err)(_.getCause).takeWhile(_ != null).take(10)
      .exists(e => Option(e.getMessage).exists(_.contains("injected crash"))),
      s"query died of something other than the injected crash: $err")
    q1.stop()
    // batch 0's version IS committed (crash was after the flip)…
    val fs = StoreFs.fs(spark, store)
    assert(StoreFs.committedVersions(fs, store) == Seq(1),
      "the crashed batch must have committed its version before dying")
    // …so the restart must SKIP refolding batch 0 and fold only batch 1
    val q2 = IvmStream.viewRefreshStream(spark, inDir, store, ckpt)
    q2.processAllAvailable(); q2.stop()
    val versions = StoreFs.committedVersions(fs, store)
    assert(versions == Seq(1, 2),
      s"replay must not create an extra version for the committed batch: $versions")
    val Some((_, view)) = IvmStream.liveView(spark, store)
    assertViewEquals(view, fullRecompute(all), "after crash + replay")
  }

  test("CDC stream: retraction adjustments fold per batch; a group deleted across batches leaves the view") {
    val inDir = java.nio.file.Files.createTempDirectory("ivmc_in").toString
    val store = java.nio.file.Files.createTempDirectory("ivmc_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivmc_ckpt").toString
    def writeAdj(rows: Seq[(Long, Long, String)]): Unit =
      rows.toDF("o_custkey", "dn", "ds")
        .select(col("o_custkey"), col("dn"),
          col("ds").cast(org.apache.spark.sql.types.DecimalType(28, 4)).as("ds"))
        .coalesce(1).write.mode("append").parquet(inDir)
    // batch 0: insert ck1 (5.00), insert ck2 twice (10.00 + 20.00)
    writeAdj(Seq((1L, 1L, "5.0000"), (2L, 1L, "10.0000"), (2L, 1L, "20.0000")))
    // batch 1: delete ck1's only order; update one ck2 order by +100
    writeAdj(Seq((1L, -1L, "-5.0000"), (2L, 0L, "100.0000")))
    val q = IvmStream.cdcRefreshStream(spark, inDir, store, ckpt)
    q.processAllAvailable(); q.stop()
    val fs = StoreFs.fs(spark, store)
    assert(StoreFs.committedVersions(fs, store) == Seq(1, 2))
    val Some((_, view)) = IvmStream.liveView(spark, store)
    val got = view.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).doubleValue)).toSet
    assert(got == Set((2L, 2L, 130.0)),
      s"expected ck1 fully retracted and ck2 at (2, 130.0), got $got")
  }

  test("stream-maintained view routes reads through the MV rewrite, stale by at most one version") {
    val inDir = java.nio.file.Files.createTempDirectory("ivmr_in").toString
    val store = java.nio.file.Files.createTempDirectory("ivmr_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivmr_ckpt").toString
    // the routed read: count/min/max over the stream's base dir — the
    // exact shapes the canonical view answers with identical types (the
    // stream's sum partial is pinned DECIMAL(38,4) for cross-version
    // schema stability, so a 28,4-summing query correctly does NOT match)
    def routed = spark.read.parquet(inDir)
      .groupBy("o_custkey").agg(
        count(lit(1)).as("n_orders"),
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"))
      .orderBy("o_custkey")
    def recompute(all: Seq[(Long, Long, Double)]) =
      all.toDF("o_orderkey", "o_custkey", "o_totalprice")
        .groupBy("o_custkey").agg(
          count(lit(1)).as("n_orders"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"))
        .orderBy("o_custkey")
    try {
      val batch1 = writeDelta(inDir, 301)
      val q1 = IvmStream.viewRefreshStream(spark, inDir, store, ckpt,
        registerBase = Some(inDir))
      q1.processAllAvailable(); q1.stop()
      val plan1 = routed.queryExecution.executedPlan.toString
      assert(plan1.contains(new java.io.File(store).getName) &&
        !plan1.contains(new java.io.File(inDir).getName),
        s"routed read must scan the maintained view, not the base dir:\n$plan1")
      assert(routed.collect().toSeq == recompute(batch1).collect().toSeq,
        "routed read diverges from batch-1 truth")
      // BETWEEN batches: files landed but not folded — the base mutated
      // AFTER registration, so the mechanical freshness gate (round 13)
      // disqualifies the stale view and the read falls back to the base
      // scan, serving the FRESH truth. (Previously it served the
      // one-version-stale view at view cost; a deployment preferring
      // that trade re-purchases bounded staleness with
      // spark.graft.mv.freshnessIntervalMs.)
      val batch2 = writeDelta(inDir, 302)
      val planBetween = routed.queryExecution.executedPlan.toString
      assert(planBetween.contains(new java.io.File(inDir).getName),
        s"between batches the stale view must disqualify:\n$planBetween")
      assert(routed.collect().toSeq ==
        recompute(batch1 ++ batch2).collect().toSeq,
        "between batches the fallback must serve the fresh base truth")
      // resume: the next fold re-registers and the read advances to v2
      val q2 = IvmStream.viewRefreshStream(spark, inDir, store, ckpt,
        registerBase = Some(inDir))
      q2.processAllAvailable(); q2.stop()
      val plan2 = routed.queryExecution.executedPlan.toString
      assert(plan2.contains("v2"),
        s"after batch 2 the routed read must scan version 2:\n$plan2")
      assert(routed.collect().toSeq ==
        recompute(batch1 ++ batch2).collect().toSeq,
        "routed read diverges from batch-2 truth after the version flip")
    } finally graft.plans.MvRegistry.unregister(inDir)
  }

  test("full-CDC stream maintains MIN/MAX: extremum deletes recompute from the maintained base") {
    import org.apache.spark.sql.types.DecimalType
    val inDir = java.nio.file.Files.createTempDirectory("ivmf_in").toString
    val store = java.nio.file.Files.createTempDirectory("ivmf_store").toString
    val base = java.nio.file.Files.createTempDirectory("ivmf_base").toString + "/orders"
    val ckpt = java.nio.file.Files.createTempDirectory("ivmf_ckpt").toString
    // one base SNAPSHOT per batch — the versioned-table time-travel
    // pattern the provider contract expects (a live-path read would
    // tear versions whenever the producer runs ahead of the fold)
    def writeBase(rows: Seq[(Long, Double)], batchId: Long): Unit =
      rows.toDF("o_custkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$base/b$batchId")
    def baseSnapshotFor(batchId: Long) = spark.read.parquet(s"$base/b$batchId")
    def writeBatch(ops: Seq[(Long, Long, String, Option[Double], Option[Double])]): Unit =
      ops.toDF("o_custkey", "dn", "ds", "v_removed", "v_added")
        .select(col("o_custkey"), col("dn"),
          col("ds").cast(DecimalType(28, 4)).as("ds"),
          col("v_removed"), col("v_added"))
        .coalesce(1).write.mode("append").parquet(inDir)
    def view(): Map[Long, (Long, Double, Double, Double)] = {
      val Some((_, v)) = IvmStream.liveView(spark, store)
      v.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDecimal(2).doubleValue(), r.getDouble(3),
          r.getDouble(4)))).toMap
    }
    // batch 0: the upstream writer commits the base, then publishes the
    // insert-only changelog — g1 {5, 9}, g2 {3, 7}
    val rows0 = Seq((1L, 5.0), (1L, 9.0), (2L, 3.0), (2L, 7.0))
    writeBase(rows0, 0L)
    writeBatch(rows0.map { case (k, p) =>
      (k, 1L, f"$p%.4f", None: Option[Double], Some(p)) })
    val q = IvmStream.fullCdcRefreshStream(spark, inDir, store,
      baseSnapshotFor, ckpt)
    try {
      q.processAllAvailable()
      assert(view() == Map(
        1L -> ((2L, 14.0, 5.0, 9.0)),
        2L -> ((2L, 10.0, 3.0, 7.0))), s"after batch 0: ${view()}")
      // batch 1: delete g1's MIN (extremum hit → recompute g1 from the
      // maintained base) + insert an INTERIOR value into g2 (merge path)
      val rows1 = Seq((1L, 9.0), (2L, 3.0), (2L, 7.0), (2L, 4.0))
      writeBase(rows1, 1L) // the batch's consistent base snapshot
      writeBatch(Seq(
        (1L, -1L, "-5.0000", Some(5.0), None),
        (2L, 1L, "4.0000", None, Some(4.0))))
      q.processAllAvailable()
      assert(view() == Map(
        1L -> ((1L, 9.0, 9.0, 9.0)),   // min recomputed: 5.0 left
        2L -> ((3L, 14.0, 3.0, 7.0))), // merged: interior insert
        s"after batch 1: ${view()}")
      val fs = StoreFs.fs(spark, store)
      assert(StoreFs.committedVersions(fs, store) == Seq(1, 2),
        "one committed version per applied batch")
    } finally q.stop()
  }

  test("events view streams by declaration: the delta schema derives from the spec") {
    import spark.implicits._
    val spec = graft.etl.ViewSpec.Events
    val inDir = java.nio.file.Files.createTempDirectory("ivm_ev_in").toString
    val store = java.nio.file.Files.createTempDirectory("ivm_ev_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivm_ev_ckpt").toString
    def evRows(seed: Int) = {
      val rng = new scala.util.Random(seed)
      Seq.fill(60)((rng.nextInt(25).toLong, (rng.nextInt(10000) + 1) / 100.0))
    }
    val all = (1 to 3).flatMap { i =>
      val d = evRows(400 + i)
      d.toDF("user_id", "value").coalesce(1).write.mode("append").parquet(inDir)
      d
    }
    // NO deltaSchema argument: the stream derives (user_id, value) from
    // the spec — the drift hazard the round-12 advice flagged is gone
    val q = IvmStream.viewRefreshStream(spark, inDir, store, ckpt, spec = spec)
    try {
      q.processAllAvailable()
      val Some((_, view)) = IvmStream.liveView(spark, store)
      val want = IvmStream.canonicalFor(
        IvmOps.partials(all.toDF("user_id", "value"), spec), spec)
      assertViewEquals(view, want, "events declared-view stream")
    } finally q.stop()
    // an explicit schema that does NOT cover the spec is refused before
    // the stream starts, not silently null-filled
    val err = intercept[IllegalArgumentException] {
      IvmStream.viewRefreshStream(spark, inDir, store,
        java.nio.file.Files.createTempDirectory("ivm_ev_ckpt2").toString,
        spec = spec, deltaSchema = IvmStream.orderSchema)
    }
    assert(err.getMessage.contains("user_id"),
      s"schema-coverage error must name the missing columns: ${err.getMessage}")
  }

  test("two-source extrema stream: each source normalizes and recomputes independently") {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val spec = graft.etl.ViewSpec.LineStats
    val inDir = java.nio.file.Files.createTempDirectory("ivm_ls_in").toString
    val store = java.nio.file.Files.createTempDirectory("ivm_ls_store").toString
    val base = java.nio.file.Files.createTempDirectory("ivm_ls_base").toString + "/li"
    val ckpt = java.nio.file.Files.createTempDirectory("ivm_ls_ckpt").toString
    def writeBase(rows: Seq[(Long, Double, Double)], batchId: Long): Unit =
      rows.toDF("l_suppkey", "l_quantity", "l_extendedprice")
        .write.mode("overwrite").parquet(s"$base/b$batchId")
    // changelog vocabulary: quantity gets the bare pair, extended price
    // the suffixed pair (ViewSpec.removedFor naming)
    def writeBatch(ops: Seq[(Long, Long, String, Option[Double], Option[Double],
        Option[Double], Option[Double])]): Unit =
      ops.toDF("l_suppkey", "dn", "ds", "v_removed", "v_added",
        "v_removed_l_extendedprice", "v_added_l_extendedprice")
        .select(col("l_suppkey"), col("dn"),
          col("ds").cast(DecimalType(28, 4)).as("ds"),
          col("v_removed"), col("v_added"),
          col("v_removed_l_extendedprice"), col("v_added_l_extendedprice"))
        .coalesce(1).write.mode("append").parquet(inDir)
    def view() = {
      val Some((_, v)) = IvmStream.liveView(spark, store)
      v.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDecimal(2).doubleValue(), r.getDouble(3),
          r.getDouble(4)))).toMap
    }
    // batch 0: inserts — g1 rows (qty, eprice): (5, 100), (9, 50);
    // g2: (3, 70)
    val rows0 = Seq((1L, 5.0, 100.0), (1L, 9.0, 50.0), (2L, 3.0, 70.0))
    writeBase(rows0, 0L)
    writeBatch(rows0.map { case (k, q, ep) =>
      (k, 1L, f"$q%.4f", None: Option[Double], Some(q),
        None: Option[Double], Some(ep)) })
    val q = IvmStream.fullCdcRefreshStream(spark, inDir, store,
      bid => spark.read.parquet(s"$base/b$bid"), ckpt, spec = spec)
    try {
      q.processAllAvailable()
      assert(view() == Map(
        1L -> ((2L, 14.0, 5.0, 100.0)),
        2L -> ((1L, 3.0, 3.0, 70.0))), s"after batch 0: ${view()}")
      // batch 1: delete g1's (5, 100) row — it holds g1's min QUANTITY
      // and its max EPRICE, so BOTH sources' gates fire for g1; insert
      // an interior row into g2 (pure merge on both sources)
      val rows1 = Seq((1L, 9.0, 50.0), (2L, 3.0, 70.0), (2L, 4.0, 60.0))
      writeBase(rows1, 1L)
      writeBatch(Seq(
        (1L, -1L, "-5.0000", Some(5.0), None, Some(100.0), None),
        (2L, 1L, "4.0000", None, Some(4.0), None, Some(60.0))))
      q.processAllAvailable()
      assert(view() == Map(
        1L -> ((1L, 9.0, 9.0, 50.0)),   // both extrema recomputed
        2L -> ((2L, 7.0, 3.0, 70.0))),  // both merged
        s"after batch 1: ${view()}")
    } finally q.stop()
  }

  test("declared distinct counts stream: pair stores ride each version; routed read exact") {
    // round-14 #5's stream leg: SupplierParts (count, sum, and
    // count(DISTINCT l_partkey)) folds micro-batches through
    // refreshInsertOnlyDistinct — each committed version carries its
    // pairs_<out> table beside the view, and the dist column equals the
    // full recompute at every step (duplicate (supp, part) rows across
    // batches must NOT inflate it — the pair multiplicities absorb them).
    val spec = graft.etl.ViewSpec.SupplierParts
    val inDir = java.nio.file.Files.createTempDirectory("ivm_dist_in").toString
    val store = java.nio.file.Files.createTempDirectory("ivm_dist_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivm_dist_ckpt").toString
    def rowsOf(seed: Int) = {
      val rng = new scala.util.Random(seed)
      // small part space so cross-batch duplicate (supp, part) pairs are
      // guaranteed — the case a set-based store would get wrong
      Seq.fill(40)((rng.nextInt(5).toLong, rng.nextInt(50).toDouble + 1.0,
        rng.nextInt(8).toLong))
    }
    val all = (1 to 3).flatMap { i =>
      val d = rowsOf(700 + i)
      d.toDF("l_suppkey", "l_quantity", "l_partkey")
        .coalesce(1).write.mode("append").parquet(inDir)
      d
    }
    try {
      val q = IvmStream.viewRefreshStream(spark, inDir, store, ckpt,
        registerBase = Some(inDir), spec = spec)
      q.processAllAvailable(); q.stop()
      val Some((n, view)) = IvmStream.liveView(spark, store)
      // every committed version carries its pair table
      (1 to n).foreach { vn =>
        assert(new java.io.File(s"$store/v$vn/pairs_n_parts").exists(),
          s"version $vn is missing its pair store") }
      val want = all.toDF("l_suppkey", "l_quantity", "l_partkey")
        .groupBy("l_suppkey").agg(
          count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
            .cast(org.apache.spark.sql.types.DecimalType(38, 4)).as("sum_qty"),
          countDistinct(col("l_partkey")).as("n_parts"))
      assertViewEquals(view, want, "distinct-count stream")
      // routed read: count(DISTINCT l_partkey) per suppkey answers from
      // the streamed store under the declared vocabulary
      val routed = spark.read.parquet(inDir)
        .groupBy("l_suppkey").agg(
          count(lit(1)).as("n_lines"),
          countDistinct(col("l_partkey")).as("n_parts"))
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(store).getName),
        s"distinct read over the registered base must route to the view:\n$plan")
      val got = routed.orderBy("l_suppkey").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val truth = want.orderBy("l_suppkey").collect()
        .map(r => (r.getLong(0), r.getAs[Long]("n_lines"), r.getAs[Long]("n_parts")))
      assert(got.sameElements(truth), "routed distinct answer diverges")
    } finally graft.plans.MvRegistry.unregister(inDir)
  }

  test("TOCTOU closed: a landed-but-unfolded file disqualifies EVEN AT registration time") {
    // Two delta files land BEFORE the stream starts; maxFilesPerTrigger=1
    // folds them one batch each. At batch 0's registration the second
    // file is already in the base dir — the round-13 registration listed
    // the dir at that moment and baked the unfolded file into the epoch,
    // so a routed read between the batches served a view missing its
    // rows while lookupFresh reported it fresh. Round 14 registers from
    // the version's own folded-file epoch state, so the live listing
    // disagrees and the read must fall back to the fresh base scan.
    val inDir = java.nio.file.Files.createTempDirectory("ivm_toctou_in").toString
    val store = java.nio.file.Files.createTempDirectory("ivm_toctou_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivm_toctou_ckpt").toString
    val b1 = writeDelta(inDir, 501)
    val b2 = writeDelta(inDir, 502)
    def routed = spark.read.parquet(inDir)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
    val storeName = new java.io.File(store).getName
    val inName = new java.io.File(inDir).getName
    // (plan, rowTotal) observed INSIDE the commit callback, per batch
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, (String, Long)]()
    try {
      val q = IvmStream.viewRefreshStream(spark, inDir, store, ckpt,
        maxFilesPerTrigger = 1, registerBase = Some(inDir),
        onBatchCommitted = { id =>
          val r = routed
          seen.put(id, (r.queryExecution.executedPlan.toString,
            r.collect().map(_.getLong(1)).sum)): Unit
        })
      q.processAllAvailable(); q.stop()
      assert(seen.containsKey(0L) && seen.containsKey(1L),
        s"expected two observed batches, got ${seen.keySet()}")
      val (plan0, total0) = seen.get(0L)
      assert(!plan0.contains(storeName) && plan0.contains(inName),
        s"batch 0's registration must NOT qualify while an unfolded file " +
          s"sits in the base dir (the TOCTOU):\n$plan0")
      assert(total0 == (b1 ++ b2).size.toLong,
        "the disqualified read must serve the fresh base truth")
      val (plan1, total1) = seen.get(1L)
      assert(plan1.contains(storeName) && !plan1.contains(inName),
        s"after the last landed file folds, the read must route:\n$plan1")
      assert(total1 == (b1 ++ b2).size.toLong, "routed answer wrong")
      // steady state after the stream: still routed, still right
      val p = routed.queryExecution.executedPlan.toString
      assert(p.contains(storeName), s"steady-state read must route:\n$p")
    } finally graft.plans.MvRegistry.unregister(inDir)
  }

  test("WAL paths are JSON-unescaped before hashing into the epoch chain") {
    // the WAL stores paths JSON-escaped; fileTerm must see the decoded
    // path or the sidecar chain silently breaks for any escaped path
    // (round 15, advisor low)
    assert(IvmStream.jsonUnescape("""plain/path.parquet""") == "plain/path.parquet")
    assert(IvmStream.jsonUnescape("""a\\b\"c""") == """a\b"c""")
    assert(IvmStream.jsonUnescape("""dir\/file""") == "dir/file")
    assert(IvmStream.jsonUnescape("""café\t x""") == "café\t x")
    assert(IvmStream.jsonUnescape("bad\\uZZZZtail") == "bad\\uZZZZtail")
  }

  test("explicit delta schema with lossless upcasts (int key, float source) is accepted and cast in") {
    // previously worked through canonicalFor's casts, then the typing
    // guard hard-failed it — accepted again with the cast inserted
    // before the fold (round 15, advisor low)
    val spec = graft.etl.ViewSpec.Orders
    val inDir = java.nio.file.Files.createTempDirectory("ivm_up_in").toString
    val store = java.nio.file.Files.createTempDirectory("ivm_up_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivm_up_ckpt").toString
    import org.apache.spark.sql.{types => t}
    val narrow = t.StructType(Seq(
      t.StructField("o_custkey", t.IntegerType),
      t.StructField("o_totalprice", t.FloatType)))
    val d = rows(601)
    d.toDF("o_orderkey", "o_custkey", "o_totalprice")
      .select(col("o_custkey").cast("int"), col("o_totalprice").cast("float"))
      .coalesce(1).write.mode("append").parquet(inDir)
    val q = IvmStream.viewRefreshStream(spark, inDir, store, ckpt,
      spec = spec, deltaSchema = narrow)
    q.processAllAvailable(); q.stop()
    val Some((_, view)) = IvmStream.liveView(spark, store)
    // the float→double upcast happens BEFORE partials, so the expected
    // view folds the float-rounded values, not the original doubles
    val want = fullRecompute(d.map { case (k, c, p) => (k, c, p.toFloat.toDouble) })
    assertViewEquals(view, want, "upcast stream")
    // a genuinely incompatible type still fails loudly at stream start
    val bad = t.StructType(Seq(
      t.StructField("o_custkey", t.StringType),
      t.StructField("o_totalprice", t.DoubleType)))
    val e = intercept[IllegalArgumentException] {
      IvmStream.viewRefreshStream(spark, inDir, store, ckpt,
        spec = spec, deltaSchema = bad)
    }
    assert(e.getMessage.contains("typing posture"))
  }

  test("legacy store without the epoch sidecar registers NOTHING when base is the delta dir") {
    // .orElse(preEpoch) there would re-open the TOCTOU: a pre-fold
    // LISTING of the live delta dir can include landed-but-unfolded
    // files, reporting the view fresh while their rows are missing
    // (round 15, advisor medium) — the safe posture is base-scan
    // fallback until the chain is re-established
    val inDir = java.nio.file.Files.createTempDirectory("ivm_leg_in").toString
    val store = java.nio.file.Files.createTempDirectory("ivm_leg_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivm_leg_ckpt").toString
    writeDelta(inDir, 701)
    val q = IvmStream.viewRefreshStream(spark, inDir, store, ckpt,
      registerBase = Some(inDir))
    q.processAllAvailable(); q.stop()
    try {
      assert(graft.plans.MvRegistry.lookup(inDir).nonEmpty,
        "sanity: the healthy chain registers")
      // break the chain the way a pre-sidecar store would present
      val fs = StoreFs.fs(spark, store)
      fs.delete(new org.apache.hadoop.fs.Path(s"$store/v1/epochstate"), false)
      graft.plans.MvRegistry.unregister(inDir)
      writeDelta(inDir, 702)
      val q2 = IvmStream.viewRefreshStream(spark, inDir, store, ckpt,
        registerBase = Some(inDir))
      q2.processAllAvailable(); q2.stop()
      // the broken chain must propagate (v2 gets no sidecar) and the
      // delta-dir registration must therefore be SKIPPED, not taken
      // from a pre-fold listing
      assert(StoreFs.readAux(fs, s"$store/v2", "epochstate").isEmpty,
        "a broken sidecar chain must not silently restart mid-stream")
      assert(graft.plans.MvRegistry.lookup(inDir).isEmpty,
        "a legacy store without the sidecar must not register the delta-dir base")
    } finally graft.plans.MvRegistry.unregister(inDir)
  }

  test("old versions stay immutable as the view rolls forward") {
    val inDir = java.nio.file.Files.createTempDirectory("ivm_in3").toString
    val store = java.nio.file.Files.createTempDirectory("ivm_store3").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivm_ckpt3").toString
    writeDelta(inDir, 301)
    val q = IvmStream.viewRefreshStream(spark, inDir, store, ckpt)
    q.processAllAvailable(); q.stop()
    val v1Before = spark.read.parquet(s"$store/v1/view").collect().toSet
    writeDelta(inDir, 302)
    val q2 = IvmStream.viewRefreshStream(spark, inDir, store, ckpt)
    q2.processAllAvailable(); q2.stop()
    assert(StoreFs.committedVersions(StoreFs.fs(spark, store), store) == Seq(1, 2))
    val v1After = spark.read.parquet(s"$store/v1/view").collect().toSet
    assert(v1After == v1Before, "v1 changed after v2 was staged — versions must be immutable")
  }
}
