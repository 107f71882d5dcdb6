package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: pre-shuffled table layout so repeated equi-joins on the
  * bucket key need no exchange — the co-located-join strategy SCALING.md
  * names for fact⋈fact joins at 100 TB.
  */
class BucketingSpec extends AnyFunSuite with SparkSuite {

  test("node-id-bucketed edges make a PageRank round's join exchange-free everywhere but the dst aggregation") {
    // The deployment-scale claim in GraphOps (pageRank/bfsHops/CC
    // scaladoc): bucket the edge table by node id once, and the
    // PER-ROUND node-keyed join stops re-shuffling. Evidence: one full
    // PageRank contribution round over a bucketed edge table — degree
    // aggregation, rank seed, edges⋈ranks on src — planned with
    // broadcasts disabled must contain EXACTLY ONE shuffle exchange,
    // the per-dst contribution sum (the one shuffle the message pattern
    // genuinely needs). Unbucketed, the same round pays hashpartitioning
    // exchanges on BOTH join inputs every round; bucketed, the scan's
    // bucket layout satisfies the join and the groupBy(src) distribution
    // for every round of the iteration. This underwrites g1/g2/v7/er2/
    // dd6's per-round joins all at once (same key shape).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      ops.GraphOps.tradeEdges(spark, sf)
        .write.mode("overwrite").bucketBy(8, "src").sortBy("src")
        .saveAsTable("edges_bucketed")
      val be = spark.table("edges_bucketed")
      // one contribution round, exactly GraphOps.pageRank's step shape:
      // per-src degree, uniform seed rank, contribution join + dst sum
      def round(edges: org.apache.spark.sql.DataFrame) = {
        val r = edges.groupBy(col("src").as("id"))
          .agg(count(lit(1)).as("d"))
          .withColumn("r", lit(ops.GraphOps.RankScale))
        edges.join(r.select(col("id").as("src"), expr("r div d").as("contrib")), "src")
          .groupBy("dst").agg(sum("contrib").as("t"))
      }
      val bucketed = round(be)
      val plan = bucketed.queryExecution.executedPlan.toString
      val shuffles = "(?m)^\\s*[+:|\\- ]*Exchange ".r.findAllIn(plan).size
      assert(plan.contains("Bucketed: true"), plan)
      assert(shuffles == 1, s"expected only the dst-sum exchange, got $shuffles:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(src"),
        s"edge-side/rank-side src re-shuffle present:\n$plan")
      // and the unbucketed twin really does pay the src exchanges …
      val unbucketed = round(ops.GraphOps.tradeEdges(spark, sf))
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning(src"))
      // … while both compute identical contributions
      assert(bucketed.exceptAll(unbucketed).count() == 0)
      assert(unbucketed.exceptAll(bucketed).count() == 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS edges_bucketed")
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      Tables(spark, sf, "lineitem")
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_bucketed")
      Tables(spark, sf, "orders")
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("o_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // neither join input may re-shuffle: the only allowed exchange is
      // the aggregation's, after the join
      val joinSection = plan.substring(plan.indexOf("Join"))
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
        !joinSection.contains("Exchange hashpartitioning(o_orderkey"), plan)
      // and the result matches the plain join
      val expected = Tables(spark, sf, "lineitem")
        .join(Tables(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      assert(joined.exceptAll(expected).count() == 0)
      assert(expected.exceptAll(joined).count() == 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
