package graft

import org.scalatest.funsuite.AnyFunSuite

class VectorAggSpec extends AnyFunSuite with SparkSuite {

  test("typed vector-sum Aggregator matches the relational decimal-exact path") {
    val typed = SparkEntry.queries("a8b_vector_sum_typed")(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val relational = SparkEntry.queries("a8_vector_sum")(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(typed.keySet == relational.keySet)
    typed.foreach { case (label, v) =>
      val w = relational(label)
      assert(v.length == w.length)
      v.zip(w).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6, s"label $label") }
    }
  }

  test("stratified sample respects per-stratum fractions") {
    val sample = SparkEntry.queries("r5_stratified_sample")(spark, sf)
    val sizes = sample.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = Tables(spark, sf, "lineitem").groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // loose band: Bernoulli at these sizes
    assert(sizes.getOrElse("R", 0L).toDouble / totals("R") > 0.05)
    assert(sizes.getOrElse("A", 0L).toDouble / totals("A") < 0.05)
  }
}
