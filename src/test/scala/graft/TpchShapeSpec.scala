package graft

import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the round-6 TPC-H completions (q7/q8/q9/q10/q14/q16 —
  * the family now covers all 22 query shapes). Each test enforces the
  * 100 TB-relevant plan property, not just the (separately oracled)
  * result: dims must broadcast, NOT IN must become a null-aware anti,
  * top-k must be a sort-limit.
  */
class TpchShapeSpec extends AnyFunSuite with SparkSuite {

  private def q(name: String) = ops.TpchOps.qs.find(_.name == name).get.fn(spark, sf)

  // AQE hides stage contents from SparkPlan.collect (QueryStageExec
  // children are not tree children), so plan-shape pins on the FINAL
  // physical plan go through its string form.
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes the physical plan
    df.queryExecution.executedPlan.toString
  }

  test("tpch_q16's NOT IN plans a null-aware left anti join") {
    val opt = q("tpch_q16_shape").queryExecution.optimizedPlan
    val anti = opt.collect { case j: Join if j.joinType == LeftAnti => j }
    assert(anti.nonEmpty, s"NOT IN did not rewrite to a left anti join:\n$opt")
  }

  test("q7/q8/q9's dimension joins all broadcast — no dim-side shuffle") {
    for (name <- Seq("tpch_q7_shape", "tpch_q8_shape", "tpch_q9_shape")) {
      val plan = finalPlan(q(name))
      val bcasts = "BroadcastHashJoin".r.findAllIn(plan).size
      assert(bcasts >= 2, s"$name: expected broadcast dim joins, got $bcasts:\n" +
        plan.take(4000))
    }
  }

  test("tpch_q10's top-20 is a sort-limit (TakeOrderedAndProject), never a global sort") {
    val plan = finalPlan(q("tpch_q10_shape"))
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrderedAndProject:\n${plan.take(4000)}")
    assert(!plan.contains("rangepartitioning"), s"global sort leaked into q10:\n${plan.take(4000)}")
  }

  test("tpch_q14's promo ratio is non-NULL and within [0, 100] at test scale") {
    val row = q("tpch_q14_shape").collect().head
    val ratio = row.getDouble(row.fieldIndex("promo_revenue"))
    assert(!ratio.isNaN && ratio >= 0.0 && ratio <= 100.0, s"ratio=$ratio")
  }
}
