package graft

import graft.plans.{IntervalJoin, IntervalJoinExec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The custom interval-join operator (LogicalPlan + Strategy + SparkPlan,
  * SURVEY §2.12 path (c)) must be plan-for-plan the operator we claim and
  * row-for-row the declarative join's result — for both join types, and
  * with the per-key buffer spilling when pushed past the SMJ thresholds.
  * IntervalJoinStrategy is registered session-wide by GraftExtensions
  * (SparkSuite builds the session withExtensions) — no planner-state
  * mutation here.
  */
class IntervalJoinSpec extends AnyFunSuite with SparkSuite {

  private def declarative(l: DataFrame, r: DataFrame, lo: Long, hi: Long,
      joinType: String = "inner"): DataFrame =
    l.join(r, l("k") === r("k2") &&
      r("t2") >= l("t") + lo && r("t2") <= l("t") + hi, joinType)

  test("custom exec equals the declarative join on the events interval join (st3 semantics)") {
    val ev = Tables(spark, sf, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id").as("euser"),
        col("ts").as("ets"))
    val custom = IntervalJoin.join(p, e, "user_id", "euser", "pts", "ets",
      0L, 6L * 3600L * 1000000L)
    // the physical plan IS the custom operator (string check — AQE
    // wraps the tree in AdaptiveSparkPlanExec, hiding it from exists)
    assert(custom.queryExecution.executedPlan.toString.contains("IntervalJoin"),
      custom.queryExecution.executedPlan.toString)
    val got = custom.select(col("user_id"), col("purchase_id"), col("error_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = ops.EventOps.qs.find(_.name == "st3_interval_join").get.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("left-outer custom exec equals the declarative left-outer join (st3c semantics)") {
    val ev = Tables(spark, sf, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id").as("euser"),
        col("ts").as("ets"))
    def norm(df: DataFrame) = df
      .select(col("user_id"), col("purchase_id"),
        coalesce(col("error_id"), lit(-1L)).as("error_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val custom = norm(IntervalJoin.join(p, e, "user_id", "euser", "pts", "ets",
      0L, 6L * 3600L * 1000000L, joinType = "left_outer"))
    val twin = norm(p.join(e, col("user_id") === col("euser") &&
        col("ets") >= col("pts") &&
        col("ets") <= col("pts") + expr("INTERVAL 6 HOURS"), "left_outer"))
    assert(custom.nonEmpty)
    assert(custom == twin) // exact multiset, pads included
    // left outer preserves every purchase (inner drops the unmatched ones)
    val purchases = p.count()
    assert(custom.keysIterator.map(_._2).toSet.size == purchases.toInt)
  }

  test("property: equals the declarative join on adversarial random fixtures (both join types)") {
    // heavy duplicate keys and timestamps (the degenerate cases a sweep
    // with a monotone start pointer can get wrong: ties, empty windows,
    // lo > 0 shifting the window off every row, keys on one side only)
    import spark.implicits._
    val rowGen: Gen[(Long, Long)] = for {
      k <- Gen.choose(0L, 6L)         // few keys → many duplicates
      t <- Gen.choose(0L, 40L)        // dense ts → many exact ties
    } yield (k, t)
    def fixture(seed: Long, n: Int): Seq[(Long, Long)] =
      (0 until n).flatMap(i => rowGen.apply(Gen.Parameters.default, Seed(seed * 1000 + i)))
    for (seed <- 1L to 4L; (lo, hi) <- Seq((0L, 5L), (-3L, 3L), (2L, 2L), (4L, 1L));
         jt <- Seq("inner", "left_outer")) {
      val l = fixture(seed, 60).toDF("k", "t")
      val r = fixture(seed + 100, 60).map { case (k, t) => (k, t) }.toDF("k2", "t2")
      def key(x: org.apache.spark.sql.Row) =
        (x.getLong(0), x.getLong(1),
          if (x.isNullAt(2)) Long.MinValue else x.getLong(2),
          if (x.isNullAt(3)) Long.MinValue else x.getLong(3))
      val custom = IntervalJoin.join(l, r, "k", "k2", "t", "t2", lo, hi, jt)
        .collect().map(key).groupBy(identity).view.mapValues(_.length).toMap
      val want = declarative(l, r, lo, hi, jt)
        .collect().map(key).groupBy(identity).view.mapValues(_.length).toMap
      assert(custom == want, s"seed=$seed lo=$lo hi=$hi jt=$jt") // exact multiset
    }
  }

  test("null keys and timestamps: inner drops, left outer pads") {
    import spark.implicits._
    val l = Seq((Some(1L), Some(10L)), (None, Some(10L)), (Some(1L), None))
      .toDF("k", "t")
    val r = Seq((Some(1L), Some(11L)), (None, Some(11L)), (Some(1L), None))
      .toDF("k2", "t2")
    val inner = IntervalJoin.join(l, r, "k", "k2", "t", "t2", 0L, 5L).collect()
    assert(inner.length == 1) // only the fully-non-null pair
    assert(declarative(l, r, 0L, 5L).collect().length == 1)
    // left outer: all 3 left rows survive — 1 matched, 2 null-padded
    val outer = IntervalJoin.join(l, r, "k", "k2", "t", "t2", 0L, 5L, "left_outer").collect()
    assert(outer.length == 3)
    assert(outer.count(_.isNullAt(2)) == 2)
    assert(declarative(l, r, 0L, 5L, "left_outer").collect().length == 3)
  }

  test("string keys sweep correctly through the interpreted ordering") {
    import spark.implicits._
    // duplicate string keys, ties, one key absent on the right — the
    // key-change detection must compare VALUES (UTF8String views into
    // reused row buffers), not references
    val l = Seq(("alice", 0L), ("alice", 10L), ("bob", 5L), ("carol", 1L))
      .toDF("k", "t")
    val r = Seq(("alice", 3L), ("alice", 12L), ("bob", 6L), ("dave", 7L))
      .toDF("k2", "t2")
    def norm(df: DataFrame) = df.collect()
      .map(x => (x.getString(0), x.getLong(1), x.getString(2), x.getLong(3)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val custom = norm(IntervalJoin.join(l, r, "k", "k2", "t", "t2", 0L, 5L))
    val want = norm(declarative(l, r, 0L, 5L))
    assert(custom == want)
    assert(custom.nonEmpty)
    // left outer with string keys: carol has no match and must pad
    val outer = IntervalJoin.join(l, r, "k", "k2", "t", "t2", 0L, 5L, "left_outer")
      .collect()
    assert(outer.length == declarative(l, r, 0L, 5L, "left_outer").collect().length)
    assert(outer.exists(x => x.getString(0) == "carol" && x.isNullAt(2)))
  }

  test("hot key spills to disk past the SMJ thresholds and stays correct") {
    import spark.implicits._
    // one hot key carrying 4000 right rows (≫ spill threshold), plus a
    // second ordinary key to exercise buffer clear/reuse across keys
    val l = ((0 until 50).map(i => (7L, i * 100L)) :+ ((8L, 10L))).toDF("k", "t")
    val r = ((0 until 4000).map(i => (7L, i.toLong)) :+ ((8L, 12L))).toDF("k2", "t2")
    val confs = Seq(
      "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "16",
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "64",
      "spark.sql.adaptive.enabled" -> "false") // direct plan → metrics reachable
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val custom = IntervalJoin.join(l, r, "k", "k2", "t", "t2", 0L, 150L)
      val got = custom.collect().map(x =>
        (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
        .groupBy(identity).view.mapValues(_.length).toMap
      val want = declarative(l, r, 0L, 150L).collect().map(x =>
        (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(got == want)
      assert(got.nonEmpty)
      val exec = custom.queryExecution.executedPlan
        .collectFirst { case e: IntervalJoinExec => e }
      assert(exec.isDefined, custom.queryExecution.executedPlan.toString)
      // the buffer actually took the spill path (not just stayed on heap)
      assert(exec.get.metrics("spillSize").value > 0,
        s"expected disk spill with threshold 64 and a 4000-row key; " +
          s"metrics=${exec.get.metrics.view.mapValues(_.value).toMap}")
      assert(exec.get.metrics("peakBufferedRows").value >= 4000)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
