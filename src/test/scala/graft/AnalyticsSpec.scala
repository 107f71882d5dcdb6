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

  test("ev4b histogram quartiles match an independent reimplementation and stay within a bin of ev4's exact ntile cut") {
    val exact = q("ev4_rfm_segments").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val hist = q("ev4b_rfm_segments_hist").collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(hist.keySet == exact.keySet, "ev4b must cover exactly ev4's users")

    // independent Scala reimplementation of the histogram cut: same
    // integer bin rule, same cumulative-count quartile edges
    val users = exact.keys.toSeq.sorted
    // the 1e4-scaled monetary image recomputed EXACTLY from the decimal
    // sum (round-tripping ev4's double output would lose exactness once
    // sums exceed ~2^53/10^4 — a latent large-SF flake, not a real bin)
    val monetaryI = Tables(spark, sf, "events")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.expr(
        "cast(sum(cast(value as decimal(38,4))) * 10000 as bigint)").as("mi"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def dims(u: Long) = {
      val (r, f, _, _, _, _) = exact(u)
      (r, f, monetaryI(u))
    }
    def histCut(value: Map[Long, Long], asc: Boolean): (Map[Long, Long], Map[Long, Long]) = {
      val lo = value.values.min; val hi = value.values.max
      val bin = value.map { case (u, v) => u -> ((v - lo) * 1024) / (hi - lo + 1) }
      val counts = bin.groupBy(_._2).map { case (b, g) => b -> g.size.toLong }
      val order = counts.keys.toSeq.sortBy(b => if (asc) b else -b)
      val n = value.size.toDouble
      val cumPrev = order.zip(order.scanLeft(0L)((acc, b) => acc + counts(b))).toMap
      val qOfBin = cumPrev.map { case (b, cp) =>
        b -> (if (cp < n / 4.0) 1L else if (cp < n / 2.0) 2L
              else if (cp < n * 3.0 / 4.0) 3L else 4L)
      }
      (bin.map { case (u, b) => u -> qOfBin(b) }, bin)
    }
    val (rq, rb) = histCut(users.map(u => u -> dims(u)._1).toMap, asc = true)
    val (fq, fb) = histCut(users.map(u => u -> dims(u)._2).toMap, asc = false)
    val (mq, mb) = histCut(users.map(u => u -> dims(u)._3).toMap, asc = false)
    users.foreach { u =>
      assert((rq(u), fq(u), mq(u)) == hist(u),
        s"user $u: ev4b ${hist(u)} != reimplementation ${(rq(u), fq(u), mq(u))}")
    }

    // vs the exact ntile twin: a user can only disagree if its bin
    // straddles a quartile boundary, and then only within the bin's own
    // exact-quartile span (±1 for the n%4 ntile-edge offset)
    def bound(name: String, bins: Map[Long, Long], got: Map[Long, Long],
        exactQ: Long => Long): Unit = {
      val span = users.groupBy(bins).map { case (b, us) =>
        b -> (us.map(exactQ).min, us.map(exactQ).max)
      }
      var disagree = 0
      users.foreach { u =>
        val (lo, hi) = span(bins(u))
        if (got(u) != exactQ(u)) disagree += 1
        assert(got(u) >= lo - 1 && got(u) <= hi + 1,
          s"$name user $u: hist quartile ${got(u)} outside bin span [$lo, $hi]±1")
      }
      info(s"$name: $disagree of ${users.size} users disagree with the exact ntile cut")
    }
    bound("recency", rb, rq, u => exact(u)._4)
    bound("frequency", fb, fq, u => exact(u)._5)
    bound("monetary", mb, mq, u => exact(u)._6)
  }

  test("ev3: funnel counts are monotone non-increasing") {
    val r = q("ev3_funnel").head()
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"funnel not monotone: $v $c $p")
    assert(v > 0)
  }
}
