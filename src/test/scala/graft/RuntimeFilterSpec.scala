package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning — the row-level sibling of s9's
  * dynamic partition pruning. At 100 TB the dimension side of a join is
  * often too big to broadcast AND the fact is not partitioned by the
  * join key, so neither broadcast pruning nor DPP applies; Spark's
  * InjectRuntimeFilter then builds a bloom filter from the FILTERED dim
  * and applies it to the fact scan side, pruning most fact rows before
  * the shuffle. This spec pins that the rewrite actually engages on this
  * engine's join shapes and that it cannot change results.
  */
class RuntimeFilterSpec extends AnyFunSuite with SparkSuite {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bloom filter injects on the fact side of a shuffle join and preserves results") {
    val expected = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate") >= lit("2001-01-01 00:00:00").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect()(0)

    withConfs(
      // the 100 TB premise: dim does NOT broadcast
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // injection gates sized for production scans; zero them so the
      // rewrite engages at spec scale
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.number.threshold" -> "10") {
      val q = Tables(spark, sf, "lineitem")
        .join(Tables(spark, sf, "orders")
          .filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_orderdate") >= lit("2001-01-01 00:00:00").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      // the optimized plan carries the injected might_contain probe on
      // the lineitem side, fed by a bloom-filter aggregate built over
      // the FILTERED orders keys
      val opt = q.queryExecution.optimizedPlan.toString.toLowerCase
      assert(opt.contains("bloom"),
        s"no runtime bloom filter injected:\n${q.queryExecution.optimizedPlan}")
      // and pruning is an optimization, never a semantics change
      val got = q.collect()(0)
      assert(got == expected, s"bloom-filtered result $got != $expected")
    }
  }
}
