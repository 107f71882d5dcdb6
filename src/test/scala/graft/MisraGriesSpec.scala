package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two regimes of the Misra–Gries summary, proven separately:
  * exactness when capacity covers the vocabulary (the x16 query's
  * oracle-ability rests on this), and the deterministic
  * `true − N/(k+1) ≤ est ≤ true` bound plus the heavy-hitter survival
  * guarantee under tight capacity across a forced multi-partition merge
  * tree.
  */
class MisraGriesSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def tokens = Tables(spark, sf, "documents")
    .select(explode_outer(split(trim(col("text")), "\\s+")).as("token"))
    .filter(col("token").isNotNull)
    .as[String]

  test("capacity ≥ vocabulary: the sketch equals the exact count on every partitioning") {
    val exact = tokens.groupBy("token").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 7)) {
      val est = tokens.repartition(parts)
        .select(ops.MisraGries(ops.MisraGriesOps.Capacity).toColumn.name("m"))
        .collect()(0)
      assert(est == exact, s"sketch != exact at $parts partitions")
    }
  }

  test("tight capacity: bounds hold and the planted heavy hitter survives merges") {
    val k = 8
    // skewed synthetic stream: "hot" is 1/3 of all tokens, the rest
    // spread over 40 distinct cold tokens (vocab ≫ k forces evictions)
    val n = 3000
    val stream = (0 until n).map(i =>
      if (i % 3 == 0) "hot" else s"cold${i % 40}")
    val truth = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val est = stream.toDS().repartition(5)
      .select(ops.MisraGries(k).toColumn.name("m"))
      .collect()(0)
    // one-sided error: estimates never overcount, and undercount at most
    // N/(k+1) in total across the merge tree
    est.foreach { case (t, c) =>
      assert(c <= truth(t), s"$t overcounted: $c > ${truth(t)}")
      assert(truth(t) - c <= n / (k + 1), s"$t undercounted past the bound: $c vs ${truth(t)}")
    }
    // any item with true count > N/(k+1) is guaranteed present
    assert(est.contains("hot"), s"heavy hitter evicted: $est")
    assert(truth("hot") > n / (k + 1))
  }
}
