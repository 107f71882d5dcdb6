package graft

import graft.plans.{IntervalJoin, IntervalJoinStrategy}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The custom interval-join operator (LogicalPlan + Strategy + SparkPlan,
  * SURVEY §2.12 path (c)) must be plan-for-plan the operator we claim and
  * row-for-row the declarative join's result.
  */
class IntervalJoinSpec extends AnyFunSuite with SparkSuite {

  private def withStrategy[A](f: => A): A = {
    spark.experimental.extraStrategies = Seq(IntervalJoinStrategy)
    try f finally spark.experimental.extraStrategies = Nil
  }

  private def declarative(l: DataFrame, r: DataFrame, lo: Long, hi: Long): DataFrame =
    l.join(r, l("k") === r("k2") &&
      r("t2") >= l("t") + lo && r("t2") <= l("t") + hi)

  test("custom exec equals the declarative join on the events interval join (st3 semantics)") {
    withStrategy {
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
  }

  test("property: equals the declarative join on adversarial random fixtures") {
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
    withStrategy {
      for (seed <- 1L to 4L; (lo, hi) <- Seq((0L, 5L), (-3L, 3L), (2L, 2L), (4L, 1L))) {
        val l = fixture(seed, 60).toDF("k", "t")
        val r = fixture(seed + 100, 60).map { case (k, t) => (k, t) }.toDF("k2", "t2")
        val custom = IntervalJoin.join(l, r, "k", "k2", "t", "t2", lo, hi)
          .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
          .groupBy(identity).view.mapValues(_.length).toMap
        val want = declarative(l, r, lo, hi)
          .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
          .groupBy(identity).view.mapValues(_.length).toMap
        assert(custom == want, s"seed=$seed lo=$lo hi=$hi") // exact multiset
      }
    }
  }

  test("null keys and timestamps match nothing (inner-join semantics)") {
    import spark.implicits._
    withStrategy {
      val l = Seq((Some(1L), Some(10L)), (None, Some(10L)), (Some(1L), None))
        .toDF("k", "t")
      val r = Seq((Some(1L), Some(11L)), (None, Some(11L)), (Some(1L), None))
        .toDF("k2", "t2")
      val custom = IntervalJoin.join(l, r, "k", "k2", "t", "t2", 0L, 5L).collect()
      assert(custom.length == 1) // only the fully-non-null pair
      val want = declarative(l, r, 0L, 5L).collect()
      assert(want.length == 1)
    }
  }
}
