package graft

import org.scalatest.funsuite.AnyFunSuite

/** Laws of the ev product-analytics trio (exact values are oracled;
  * these pin the structural invariants).
  */
class AnalyticsSpec extends AnyFunSuite with SparkSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("ev1: per-user grid is dense daily and LOCF is non-null from the first reading on") {
    val rows = q("ev1_resample_locf").collect()
    def epochDay(r: org.apache.spark.sql.Row) =
      r.getAs[java.time.LocalDateTime](1).toLocalDate.toEpochDay
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, rs) =>
      val days = rs.map(epochDay).sorted
      val diffs = days.zip(days.tail).map { case (a, b) => b - a }
      assert(diffs.forall(_ == 1L), s"user $u grid not dense daily")
      // grid spans first-event-day .. last-event-day, so day 1 already
      // carries that day's (truncated-to-day ≤ ts) reading or null only
      // if the first event is later in day 1 — subsequent days never null
      assert(rs.sortBy(epochDay).tail.forall(!_.isNullAt(2)),
        s"user $u has a null after the first grid day")
    }
  }

  test("ev2: offset-0 cell of each cohort equals the cohort's user count") {
    val rows = q("ev2_cohort_retention").collect()
    val zero = rows.filter(_.getLong(1) == 0L)
      .map(r => r.getAs[java.time.LocalDateTime](0) -> r.getLong(2)).toMap
    // every user's first event is in their cohort week, so the 0-offset
    // cell is the full cohort; later offsets can never exceed it
    rows.foreach { r =>
      assert(r.getLong(2) <= zero(r.getAs[java.time.LocalDateTime](0)),
        s"retention cell exceeds cohort size: $r")
    }
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    assert(zero.values.sum == users, "cohort sizes must partition the user base")
  }

  test("ev3: funnel counts are monotone non-increasing") {
    val r = q("ev3_funnel").head()
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"funnel not monotone: $v $c $p")
    assert(v > 0)
  }
}
