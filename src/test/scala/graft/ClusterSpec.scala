package graft

import graft.quality.ClusterOps
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the nn9 distributed k-means fit (the DuckDB oracle pins the
  * exact values; these pin the algorithmic invariants on top).
  */
class ClusterSpec extends AnyFunSuite with SparkSuite {

  test("nn9: every vector assigned once, to a seed-id cluster") {
    val a = ClusterOps.kmeansAssign(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(a.length == n)
    assert(a.map(_.getLong(0)).distinct.length == n)
    assert(a.forall { r => val c = r.getLong(2); c >= 0 && c < 8 })
  }

  test("nn9: Lloyd objective is non-increasing over rounds") {
    val sums = (1 to 3).map { r =>
      ClusterOps.kmeansAssign(spark, sf, rounds = r).collect()
        .map(_.getDouble(3)).sum
    }
    // each (assign, update) step can only lower the sum of squared
    // distances (exact in real arithmetic; ulp-level slack for the
    // double folds)
    assert(sums(1) <= sums(0) * (1 + 1e-9), s"round 2 objective rose: $sums")
    assert(sums(2) <= sums(1) * (1 + 1e-9), s"round 3 objective rose: $sums")
  }

  test("nn9: rerun is bit-deterministic") {
    val a = ClusterOps.kmeansAssign(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    val b = ClusterOps.kmeansAssign(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }
}
