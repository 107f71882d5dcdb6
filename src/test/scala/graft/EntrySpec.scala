package graft

import org.scalatest.funsuite.AnyFunSuite

class EntrySpec extends AnyFunSuite with SparkSuite {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query names; no duplicate names") {
    val qn = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qn))
    assert(SparkEntry.all.map(_.name).distinct.size == SparkEntry.all.size)
  }

  test("every query executes and is non-empty at sf0.001") {
    val empty = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"empty results: $empty")
  }
}
