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

  test("U32Fold: the codegen conv fast path equals the interpreted hex fold on every draw") {
    // r7/ft1/x18b run conv(h, 16, 10) in production while their DuckDB
    // oracles replay the base-16 fold — this pins the two spellings to
    // the same value over the corpus's actual md5 prefixes.
    import org.apache.spark.sql.functions._
    val mismatches = Tables(spark, sf, "lineitem")
      .select(substring(md5(concat_ws("|",
        col("l_orderkey"), col("l_linenumber"), lit("r7/42"))), 1, 8).as("h"))
      .withColumn("a", expr(graft.U32Fold.convExpr))
      .withColumn("b", expr(graft.U32Fold.expr))
      .filter(col("a") =!= col("b"))
      .count()
    assert(mismatches == 0)
  }
}
