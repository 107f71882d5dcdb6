package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: the multi-column pruning claim, measured. */
class ZOrderSpec extends AnyFunSuite with SparkSuite {

  test("z-ordered layout prunes row groups on BOTH dimensions; single sort only on its own") {
    val ((sortedA, sortedB), (zA, zB)) = etl.ZOrder.zorderPruneStats(spark, sf)
    val total = Tables(spark, sf, "lineitem").count()

    // the dedicated sort is (near-)optimal on its own column
    assert(sortedA < total / 4, s"A-sorted layout did not prune an A-range: $sortedA of $total")
    // …but a range on the OTHER column reads essentially everything
    assert(sortedB > total / 2, s"expected the A-sorted layout NOT to prune a B-range: $sortedB of $total")
    // the z-layout prunes BOTH dimensions
    assert(zA < total / 2, s"z-layout did not prune an A-range: $zA of $total")
    assert(zB < total / 2, s"z-layout did not prune a B-range: $zB of $total")
    // and beats the single-sort layout decisively where it matters
    assert(zB * 2 < sortedB, s"z-layout B-range $zB not clearly better than single-sort $sortedB")
  }

  test("z-order write preserves content exactly") {
    val base = etl.ScratchDirs.keyed("zorder_roundtrip", sf)
    val li = Tables(spark, sf, "lineitem")
    etl.ZOrder.zorderWrite(li, "l_partkey", "l_suppkey", base, numFiles = 3)
    val back = spark.read.parquet(base)
    assert(back.count() == li.count())
    // order-free content fingerprint over the full row
    def fp(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.Row = {
      val h = md5(concat_ws("|", df.columns.sorted.map(col): _*))
      df.agg(min(h), max(h), count(lit(1))).collect()(0)
    }
    assert(fp(back) == fp(li), "z-order write changed content")
  }
}
