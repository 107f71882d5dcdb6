package graft

import org.scalatest.funsuite.AnyFunSuite

/** Top-level so ExpressionEncoder can instantiate it without an outer scope. */
case class Line(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

/** Typed Dataset[T] surface (SURVEY.md §1.5: case-class views where type
  * safety helps — the reference's per-event record decode becomes a typed
  * Dataset with compile-time field checks).
  */
class TypedApiSpec extends AnyFunSuite with SparkSuite {

  test("typed Dataset view with typed groupByKey aggregation") {
    import spark.implicits._
    val ds = Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .as[Line]
    val byFlag = ds.groupByKey(_.l_returnflag)
      .mapGroups((k, rows) => (k, rows.map(_.l_quantity).sum))
      .collect().toMap
    val expected = Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.sum("l_quantity"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byFlag.keySet == expected.keySet)
    byFlag.foreach { case (k, v) => assert(math.abs(v - expected(k)) < 1e-6) }
  }
}
