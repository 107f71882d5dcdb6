package graft

import graft.ops.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite with SparkSuite {

  test("salted join equals the plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of rows share one hot key
    val big = (0 until 20000).map(i => (if (i % 10 == 0) i.toLong % 50 else 7L, i))
      .toDF("k", "v")
    val small = (0L until 50L).map(k => (k, s"dim$k")).toDF("k2", "name")
    val plain = big.join(small, col("k") === col("k2"))
      .select("k", "v", "name")
    val salted = SkewJoin.saltedJoin(big, small, col("k"), col("k2"), salts = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("j10: the oracled query engages the salted shuffled join — salt in the keys, no broadcast") {
    val q = SkewJoin.skewedSaltedAgg(spark, sf)
    q.write.format("noop").mode("overwrite").save() // settle AQE to the final plan
    val plan = q.queryExecution.executedPlan.toString
    // the dim is NOT broadcast (the regime the salted path exists for)…
    assert(!plan.contains("BroadcastHashJoin"),
      s"dim was broadcast — the salted shuffle regime never engaged:\n$plan")
    // …the join is a shuffled join whose keys carry the salt…
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"no shuffled join in the executed plan:\n$plan")
    assert(plan.contains("__salt"),
      s"salt column absent from the executed plan's join keys:\n$plan")
    // …and the planted hot key is really split: its rows land on many
    // distinct (key, salt) shuffle keys instead of one hot reducer key
    val hotSalts = SkewJoin.saltedJoin(
      graft.Tables(spark, sf, "lineitem").select(
        when(col("l_orderkey") % 10 < 7, lit(0L))
          .otherwise(col("l_orderkey") % 997).as("hk")),
      graft.Tables(spark, sf, "part")
        .groupBy((col("p_partkey") % 997).as("k")).agg(count(lit(1)).as("dim_n"))
        .hint("shuffle_hash"),
      col("hk"), col("k"), salts = 32)
    // peek under the drop(): recompute the salted big side alone
    val spread = graft.Tables(spark, sf, "lineitem")
      .select(when(col("l_orderkey") % 10 < 7, lit(0L))
        .otherwise(col("l_orderkey") % 997).as("hk"))
      .withColumn("__salt", (rand(42L) * 32).cast("int"))
      .filter(col("hk") === 0L)
      .select("__salt").distinct().count()
    assert(spread >= 16, s"hot key spread over only $spread/32 salts")
    assert(!hotSalts.columns.contains("__salt"),
      "salt column must not leak into the salted-join output")
  }

  test("AQE splits the skewed partition at runtime — the first-line skew defense") {
    import spark.implicits._
    // SCALING.md names AQE skew-join as the first line and saltedJoin as
    // the manual escape hatch; this pins the first line actually firing.
    // One hot key carries ~all left rows; thresholds shrunk so the
    // runtime stats qualify the partition as skewed at spec scale
    // (production keeps the 256 MB defaults).
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "4KB")
    val olds = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val big = (0 until 200000)
        .map(i => (if (i % 100 == 0) i.toLong % 50 else 7L, s"payload_$i"))
        .toDF("k", "v")
      val right = (0L until 50L).flatMap(k => (0 until 200).map(j => (k, j)))
        .toDF("k2", "w")
      // a GLOBAL aggregate on purpose: a groupBy on the join key would
      // reuse the join's hash partitioning, and OptimizeSkewedJoin
      // declines to split a skewed partition when that would force an
      // extra downstream shuffle (unless forceOptimizeSkewedJoin)
      // sum(length(v)) keeps the VARYING payload flowing through the
      // join: with only the constant hot key pruned into the shuffle,
      // the hot partition's compressed blocks are a few KB and AQE's
      // size statistics (which read compressed sizes) never see skew
      val q = big.join(right, col("k") === col("k2"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("k") === 7L, 1L).otherwise(0L)).as("hot"),
          sum(length(col("v"))).as("bytes"))
      val row = q.collect()(0)
      // the hot key's output multiplicity is correct…
      assert(row.getLong(1) == 198000L * 200, s"hot-key count wrong: ${row.getLong(1)}")
      assert(row.getLong(0) == 198000L * 200 + 2000L * 200, s"total wrong: ${row.getLong(0)}")
      // …and the executed SMJ really ran in skew-split mode
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$plan")
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
