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
