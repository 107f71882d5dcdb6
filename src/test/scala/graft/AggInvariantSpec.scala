package graft

import org.scalatest.funsuite.AnyFunSuite

class AggInvariantSpec extends AnyFunSuite with SparkSuite {

  test("approx_count_distinct lands within the configured error of exact") {
    val exact = SparkEntry.queries("a2b_count_distinct")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("a2c_approx_distinct")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n < 0.10, s"$k: exact=$n approx=$a")
    }
  }
}
