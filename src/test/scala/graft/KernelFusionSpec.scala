package graft

import graft.plans.KernelFusionRule
import graft.quality.SimilarityOps
import graft.tensor.{FloatDot, FloatL2Sq, FloatNorm}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KernelFusionSpec extends AnyFunSuite with SparkSuite {

  test("rule rewrites HOF dot/norm patterns into the codegen kernels") {
    val e = Tables(spark, sf, "embeddings")
    val df = e.select(
      SimilarityOps.dotHof(col("embedding"), col("embedding")).as("d"),
      SimilarityOps.l2normHof(col("embedding")).as("n"))
    val before = df.queryExecution.analyzed
    assert(!before.expressions.exists(_.exists(_.isInstanceOf[FloatDot])))
    val after = KernelFusionRule(before)
    assert(after.expressions.exists(_.exists(_.isInstanceOf[FloatDot])))
    assert(after.expressions.exists(_.exists(_.isInstanceOf[FloatNorm])))
  }

  test("rule rewrites the HOF squared-L2 pattern into FloatL2Sq, results unchanged") {
    val e = Tables(spark, sf, "embeddings")
    val df = e.select(col("vec_id"),
      SimilarityOps.l2sqHof(col("embedding"), reverse(col("embedding"))).as("d"))
    val before = df.queryExecution.analyzed
    assert(!before.expressions.exists(_.exists(_.isInstanceOf[FloatL2Sq])))
    val after = KernelFusionRule(before)
    assert(after.expressions.exists(_.exists(_.isInstanceOf[FloatL2Sq])))
    // and the rewrite is bit-preserving end-to-end
    spark.experimental.extraOptimizations = Seq(KernelFusionRule)
    try {
      val fused = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      spark.experimental.extraOptimizations = Nil
      val plain = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(fused == plain)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("fused session plans produce identical results") {
    spark.experimental.extraOptimizations = Seq(KernelFusionRule)
    try {
      val e = Tables(spark, sf, "embeddings")
      val df = e.select(col("vec_id"),
        SimilarityOps.dotHof(col("embedding"), col("embedding")).as("d"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("floatdot") || plan.contains("float_dot"), plan)
      val fused = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      spark.experimental.extraOptimizations = Nil
      val plain = e.select(col("vec_id"),
        SimilarityOps.dotHof(col("embedding"), col("embedding")).as("d"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(fused == plain) // bit-identical
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("GraftExtensions injection applies cleanly to a fresh extensions context") {
    // getOrCreate reuses the shared session, so exercise the extension
    // object directly against the injection API (throws on bad wiring).
    val captured = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(captured)
  }
}
