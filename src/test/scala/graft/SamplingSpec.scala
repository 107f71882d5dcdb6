package graft

import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite with SparkSuite {

  test("bernoulli sample is seed-deterministic and near the target fraction") {
    val fn = SparkEntry.queries("r1_bernoulli_sample")
    val total = Tables(spark, sf, "lineitem").count().toDouble
    val a = fn(spark, sf).collect().map(_.toSeq)
    val b = fn(spark, sf).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq) // same seed, same partitioning → same rows
    val frac = a.length / total
    assert(frac > 0.02 && frac < 0.10, s"fraction $frac far from 0.05")
  }

  test("seeded shuffle returns a deterministic permutation prefix") {
    val fn = SparkEntry.queries("r2_shuffle_epoch")
    val a = fn(spark, sf).collect().map(_.toSeq)
    val b = fn(spark, sf).collect().map(_.toSeq)
    assert(a.length == 100)
    assert(a.toSeq == b.toSeq)
  }
}
