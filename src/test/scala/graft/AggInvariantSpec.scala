package graft

import org.scalatest.funsuite.AnyFunSuite

class AggInvariantSpec extends AnyFunSuite with SparkSuite {

  test("approx_count_distinct lands within the configured error of exact") {
    // a2c's bounded-oracle form carries the exact twin and the bound
    // flag in one row: the exact column must agree with a2b, and the
    // flag (|approx − exact| ≤ 5%·exact) must hold on every group.
    val exact = SparkEntry.queries("a2b_count_distinct")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("a2c_approx_distinct")(spark, sf).collect()
    assert(exact.keySet == rows.map(_.getString(0)).toSet)
    rows.foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)),
        s"${r.getString(0)}: a2c exact twin disagrees with a2b")
      assert(r.getInt(2) == 1, s"${r.getString(0)}: HLL sketch outside 5% bound")
    }
  }

  test("percentile sketch lands inside a11's rank windows") {
    // The query's own flag encodes the bound; assert it directly so a
    // sketch drift fails the suite, not just the driver compare.
    val rows = SparkEntry.queries("a11_quantiles")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(4) == 1,
      s"${r.getString(0)}: percentile_approx outside ±5% rank window"))
  }
}
