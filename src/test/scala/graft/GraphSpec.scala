package graft

import graft.ops.GraphOps
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite with SparkSuite {

  test("connected components: chain, clique, and separate pairs resolve to min ids") {
    import spark.implicits._
    // components: {1..5} as a chain, {10,11,12} as a clique, {20,21}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("a", "b")
    val comp = GraphOps.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(comp(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L))
    assert(Seq(20L, 21L).forall(comp(_) == 20L))
  }

  test("dedup clusters group the planted signature-identical documents") {
    val clusters = SparkEntry.queries("dd6_dedup_clusters")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.nonEmpty)
    // every representative is a member of its own cluster and is minimal
    clusters.values.toSet.foreach { rep: Long =>
      assert(clusters(rep) == rep)
      val members = clusters.filter(_._2 == rep).keys
      assert(members.min == rep)
    }
  }
}
