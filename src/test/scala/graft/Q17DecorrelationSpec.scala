package graft

import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §4 claims subquery decorrelation comes free from Catalyst;
  * these specs pin that the claim holds ON THE PLAN, not just the
  * result, for all four subquery shapes (correlated scalar, EXISTS,
  * NOT IN, EXISTS+NOT EXISTS composite): each must rewrite to joins —
  * a per-row re-executed subquery would be O(rows × subquery), the
  * classic scale killer. Note for q17: Catalyst 4.1 keeps the twin
  * count/sum subqueries as TWO column-pruned per-partkey aggregates
  * (MergeScalarSubqueries does not merge this correlated pair), so the
  * enforced contract is two keyed aggregates of 2-column projections —
  * still O(rows), never per-row.
  */
class Q17DecorrelationSpec extends AnyFunSuite with SparkSuite {

  test("tpch_q17's correlated scalar subqueries decorrelate to an aggregate+join") {
    val df = ops.TpchOps.qs.find(_.name == "tpch_q17").get.fn(spark, sf)
    val opt = df.queryExecution.optimizedPlan

    // no correlated scalar subquery survives optimization
    val residualSubqueries = opt.collectWithSubqueries {
      case p => p.expressions.flatMap(_.collect {
        case s: ScalarSubquery if s.isCorrelated => s
      })
    }.flatten
    assert(residualSubqueries.isEmpty,
      s"correlated subquery not decorrelated:\n$opt")

    // the rewrite shape: aggregates feeding joins on the correlation key
    // (the decorrelated per-part count and sum — Catalyst 4.1 keeps them
    // as two column-pruned aggregates; MergeScalarSubqueries does not
    // merge this correlated pair)
    val aggsUnderJoin = opt.collect {
      case j: Join if j.children.exists(_.collectFirst { case a: Aggregate => a }.isDefined) => j
    }
    assert(aggsUnderJoin.nonEmpty, s"no aggregate+join decorrelation shape:\n$opt")
    val partkeyAggs = opt.collect {
      case a: Aggregate if a.groupingExpressions.exists(_.references.exists(
        _.name == "l_partkey")) => a
    }
    assert(partkeyAggs.size == 2, s"expected the two decorrelated per-partkey aggregates:\n$opt")
    // and each decorrelated aggregate reads a pruned projection, not the
    // full 11-column lineitem row
    partkeyAggs.foreach { a =>
      assert(a.child.output.length <= 2, s"subquery aggregate not column-pruned:\n$a")
    }

    // and the result itself is non-empty at the test scale
    assert(df.limit(1).collect().nonEmpty)
  }

  test("tpch_q4's correlated EXISTS decorrelates to a left semi join") {
    import org.apache.spark.sql.catalyst.expressions.Exists
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    val df = ops.TpchOps.qs.find(_.name == "tpch_q4").get.fn(spark, sf)
    val opt = df.queryExecution.optimizedPlan
    val residual = opt.collectWithSubqueries {
      case p => p.expressions.flatMap(_.collect { case e: Exists => e })
    }.flatten
    assert(residual.isEmpty, s"EXISTS not decorrelated:\n$opt")
    val semis = opt.collect { case j: Join if j.joinType == LeftSemi => j }
    assert(semis.nonEmpty, s"no left semi join in the rewritten plan:\n$opt")
    // the correlated inequality must ride the semi join as its condition,
    // not re-execute per row
    assert(semis.exists(_.condition.exists(_.toString.contains("l_shipdate"))),
      s"correlated inequality not in the join condition:\n$opt")
    assert(df.limit(1).collect().nonEmpty)
  }

  test("j9's NOT IN decorrelates to a NULL-AWARE left anti join") {
    import org.apache.spark.sql.catalyst.expressions.{InSubquery, Not}
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    val df = ops.TpchOps.qs.find(_.name == "j9_notin_anti").get.fn(spark, sf)
    val opt = df.queryExecution.optimizedPlan
    val residual = opt.collectWithSubqueries {
      case p => p.expressions.flatMap(_.collect {
        case n @ Not(_: InSubquery) => n
        case i: InSubquery => i
      })
    }.flatten
    assert(residual.isEmpty, s"NOT IN not rewritten:\n$opt")
    val antis = opt.collect { case j: Join if j.joinType == LeftAnti => j }
    assert(antis.nonEmpty, s"no left anti join in the rewritten plan:\n$opt")
    // the null-aware condition: NOT IN is not a plain anti join — a NULL
    // anywhere in the subquery list empties the result, encoded as an
    // `isnull(key = key)` disjunct in the join condition
    assert(antis.exists(_.condition.exists(_.toString.toLowerCase.contains("isnull"))),
      s"anti join is not null-aware:\n$opt")
    assert(df.limit(1).collect().nonEmpty)
  }

  test("tpch_q21_shape carries BOTH rewrites in one plan: left semi AND left anti") {
    import org.apache.spark.sql.catalyst.expressions.Exists
    import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
    val df = ops.TpchOps.qs.find(_.name == "tpch_q21_shape").get.fn(spark, sf)
    val opt = df.queryExecution.optimizedPlan
    val residual = opt.collectWithSubqueries {
      case p => p.expressions.flatMap(_.collect { case e: Exists => e })
    }.flatten
    assert(residual.isEmpty, s"EXISTS/NOT EXISTS not rewritten:\n$opt")
    assert(opt.collect { case j: Join if j.joinType == LeftSemi => j }.nonEmpty,
      s"no left semi join:\n$opt")
    assert(opt.collect { case j: Join if j.joinType == LeftAnti => j }.nonEmpty,
      s"no left anti join:\n$opt")
    assert(df.limit(1).collect().nonEmpty)
  }
}
