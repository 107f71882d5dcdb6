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

  test("q17 subquery form: correlated scalar subqueries decorrelate to aggregate+join") {
    // the CLASSIC q17 spelling, constructed here (the product tpch_q17 is
    // hand-fused since round 12 — this spec keeps pinning what Catalyst
    // does with the subquery form, which is exactly WHY the product query
    // is fused: the twin correlated pair decorrelates to TWO aggregates)
    Tables(spark, sf, "lineitem").createOrReplaceTempView("q17spec_lineitem")
    Tables(spark, sf, "part").createOrReplaceTempView("q17spec_part")
    val df = spark.sql(
      """SELECT p.p_brand, count(*) AS n_small
        |FROM q17spec_lineitem l JOIN q17spec_part p ON l.l_partkey = p.p_partkey
        |WHERE CAST(l.l_quantity AS DECIMAL(18,4)) * 5 *
        |      (SELECT count(*) FROM q17spec_lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        |    < (SELECT sum(CAST(l2.l_quantity AS DECIMAL(18,4))) FROM q17spec_lineitem l2
        |       WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY p.p_brand""".stripMargin)
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

  test("product tpch_q17 is the FUSED form: exactly one per-partkey aggregate") {
    val df = ops.TpchOps.qs.find(_.name == "tpch_q17").get.fn(spark, sf)
    val opt = df.queryExecution.optimizedPlan
    // one per-partkey pass computes count AND sum (the fusion the
    // decorrelated form pays two scans for); lineitem is aggregate-
    // scanned once
    val partkeyAggs = opt.collect {
      case a: Aggregate if a.groupingExpressions.exists(_.references.exists(
        _.name == "l_partkey")) => a
    }
    assert(partkeyAggs.size == 1,
      s"fused q17 must carry exactly ONE per-partkey aggregate:\n$opt")
    val aggFns = partkeyAggs.head.aggregateExpressions
      .flatMap(_.collect { case ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression => ae })
    assert(aggFns.size == 2 &&
      aggFns.exists(_.aggregateFunction.prettyName == "count") &&
      aggFns.exists(_.aggregateFunction.prettyName == "sum"),
      s"fused aggregate must compute count and sum together: $aggFns")
    // the fused aggregate still reads a pruned projection
    assert(partkeyAggs.head.child.output.length <= 2,
      s"fused aggregate not column-pruned:\n${partkeyAggs.head}")
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

  test("tpch_q13: outer join SURVIVES optimization with the filter pushed to orders, not post-join") {
    import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val df = ops.TpchOps.qs.find(_.name == "tpch_q13").get.fn(spark, sf)
    val opt = df.queryExecution.optimizedPlan
    // the outer join must NOT have been turned inner (the naive
    // WHERE-on-result spelling loses the zero-order customers)
    val outer = opt.collect { case j: Join if j.joinType == LeftOuter => j }
    assert(outer.nonEmpty, s"left outer join did not survive optimization:\n$opt")
    assert(opt.collect { case j: Join if j.joinType == Inner => j }.isEmpty,
      s"join degenerated to inner:\n$opt")
    // the priority exclusion belongs BELOW the join on the orders side
    // (pruning the shuffle), never ABOVE it (which would drop the
    // padding rows)
    val aboveJoin = opt.collect {
      case f: Filter if f.condition.toString.contains("o_orderpriority") &&
        f.collectFirst { case j: Join => j }.isDefined => f
    }
    assert(aboveJoin.isEmpty, s"priority filter sits above the outer join:\n$opt")
    val belowJoin = outer.head.right.collectFirst {
      case f: Filter if f.condition.toString.contains("o_orderpriority") => f
    }
    assert(belowJoin.isDefined, s"priority filter not pushed to the orders side:\n$opt")
    // and the scan itself gets it as a pushed filter
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("Not(EqualTo(o_orderpriority,1-URGENT))"),
      s"filter not pushed to the orders scan:\n$physical")
    assert(df.limit(1).collect().nonEmpty)
  }

  test("tpch_q20_shape: depth-2 nested subqueries flatten — no residual subquery, two semi levels") {
    import org.apache.spark.sql.catalyst.expressions.{InSubquery, ScalarSubquery}
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    val df = ops.TpchOps.qs.find(_.name == "tpch_q20_shape").get.fn(spark, sf)
    val opt = df.queryExecution.optimizedPlan
    // nothing re-executes per row: no IN-subquery or correlated scalar
    // survives anywhere, including inside rewritten children
    val residual = opt.collectWithSubqueries {
      case p => p.expressions.flatMap(_.collect {
        case i: InSubquery => i
        case sq: ScalarSubquery if sq.isCorrelated => sq
      })
    }.flatten
    assert(residual.isEmpty, s"nested subqueries not fully rewritten:\n$opt")
    // both nesting levels become semi joins: supplier⋉lineitem and
    // lineitem⋉part — the outer semi's right side contains the inner one
    val semis = opt.collect { case j: Join if j.joinType == LeftSemi => j }
    assert(semis.size >= 2, s"expected two semi-join levels, got ${semis.size}:\n$opt")
    val nested = semis.exists(outerJoin => outerJoin.right.collectFirst {
      case j: Join if j.joinType == LeftSemi => j
    }.isDefined)
    assert(nested, s"semi joins not nested (depth-2 chain lost):\n$opt")
    // the correlated aggregate decorrelates to a per-(partkey, suppkey)
    // aggregate feeding a join
    val corrAggs = opt.collect {
      case a: Aggregate if Seq("l_partkey", "l_suppkey").forall(k =>
        a.groupingExpressions.exists(_.references.exists(_.name == k))) => a
    }
    assert(corrAggs.nonEmpty, s"no decorrelated (partkey, suppkey) aggregate:\n$opt")
    assert(df.limit(1).collect().nonEmpty)
  }

  test("tpch_q2_shape plans as a SINGLE-SCAN per-partkey struct argmin") {
    // Round 16 replaced the correlated-min SQL (whose decorrelation
    // scanned lineitem TWICE — the r15 verdict's one confirmed plan
    // defect) with a direct min(struct(price, suppkey)) argmin. Pin the
    // load-bearing properties: exactly ONE lineitem relation, a pruned
    // per-partkey struct-min aggregate, and no residual subquery.
    val df = ops.TpchOps.qs.find(_.name == "tpch_q2_shape").get.fn(spark, sf)
    val opt = df.queryExecution.optimizedPlan
    val residual = opt.collectWithSubqueries {
      case p => p.expressions.flatMap(_.collect {
        case s: ScalarSubquery if s.isCorrelated => s
      })
    }.flatten
    assert(residual.isEmpty, s"unexpected correlated subquery:\n$opt")
    val lineitemScans = opt.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation
        if r.output.exists(_.name == "l_extendedprice") => r
    }
    assert(lineitemScans.size == 1,
      s"expected ONE lineitem scan, got ${lineitemScans.size}:\n$opt")
    val argminAggs = opt.collect {
      case a: Aggregate if a.groupingExpressions.size == 1 &&
        a.groupingExpressions.head.references.exists(_.name == "l_partkey") &&
        a.aggregateExpressions.exists(e =>
          e.toString.toLowerCase.contains("min(struct(")) => a
    }
    assert(argminAggs.nonEmpty, s"no per-partkey struct-min aggregate:\n$opt")
    argminAggs.foreach { a =>
      assert(a.child.output.length <= 3, s"argmin aggregate not column-pruned:\n$a")
    }
    assert(df.limit(1).collect().nonEmpty)
  }

  test("tpch_q18's IN-over-HAVING plans as a semi join against the aggregate") {
    import org.apache.spark.sql.catalyst.expressions.InSubquery
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    val df = ops.TpchOps.qs.find(_.name == "tpch_q18").get.fn(spark, sf)
    val opt = df.queryExecution.optimizedPlan
    val residual = opt.collectWithSubqueries {
      case p => p.expressions.flatMap(_.collect { case i: InSubquery => i })
    }.flatten
    assert(residual.isEmpty, s"IN subquery not rewritten:\n$opt")
    // the semi join's right side is the grouped-HAVING aggregate on
    // l_orderkey (the "filter a fact by an aggregate of itself" shape)
    val semis = opt.collect { case j: Join if j.joinType == LeftSemi => j }
    assert(semis.nonEmpty, s"no left semi join:\n$opt")
    val aggUnderSemi = semis.exists(_.right.collectFirst {
      case a: Aggregate if a.groupingExpressions.exists(_.references.exists(
        _.name == "l_orderkey")) => a
    }.isDefined)
    assert(aggUnderSemi, s"semi join right side is not the orderkey aggregate:\n$opt")
    assert(df.limit(1).collect().nonEmpty)
  }

  test("tpch_q22_shape: NOT EXISTS becomes an anti join; only uncorrelated scalars remain") {
    import org.apache.spark.sql.catalyst.expressions.Exists
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    val df = ops.TpchOps.qs.find(_.name == "tpch_q22_shape").get.fn(spark, sf)
    val opt = df.queryExecution.optimizedPlan
    val residualExists = opt.collectWithSubqueries {
      case p => p.expressions.flatMap(_.collect { case e: Exists => e })
    }.flatten
    assert(residualExists.isEmpty, s"NOT EXISTS not rewritten:\n$opt")
    assert(opt.collect { case j: Join if j.joinType == LeftAnti => j }.nonEmpty,
      s"no left anti join:\n$opt")
    // the average gate stays as scalar subqueries — but UNCORRELATED
    // ones (one-row broadcasts computed once), never per-row
    val corr = opt.collectWithSubqueries {
      case p => p.expressions.flatMap(_.collect {
        case s: ScalarSubquery if s.isCorrelated => s
      })
    }.flatten
    assert(corr.isEmpty, s"average-gate subquery is correlated:\n$opt")
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
