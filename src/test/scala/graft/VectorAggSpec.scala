package graft

import org.scalatest.funsuite.AnyFunSuite

class VectorAggSpec extends AnyFunSuite with SparkSuite {

  test("typed vector-sum Aggregator matches the relational decimal-exact path") {
    // both queries emit long form (label, pos, sv)
    def collect(name: String): Map[(Int, Long), Double] =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val typed = collect("a8b_vector_sum_typed")
    val relational = collect("a8_vector_sum")
    assert(typed.keySet == relational.keySet)
    assert(typed.nonEmpty)
    typed.foreach { case (k, a) =>
      assert(math.abs(a - relational(k)) < 1e-6, s"key $k") }
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
