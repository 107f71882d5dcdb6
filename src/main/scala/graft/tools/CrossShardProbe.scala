package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Evidence probe behind ShardParity's dd2/dd6 checks: HOW MANY dd2
  * pairs cross sf10 shards, and what is the TRUE token-set Jaccard of
  * each? GenScale's token-keyed mutation leaves docs whose tokens all
  * have odd crc32 IDENTICAL across copies (the scaladoc's ≈0.33
  * cross-copy Jaccard is an average, not a per-doc bound), so a small
  * cross-copy duplicate population exists BY CONSTRUCTION — the probe
  * verifies every cross-shard pair is one of those (true Jaccard far
  * above the 0.33 background), i.e. signal, not hash artifact.
  */
object CrossShardProbe {
  def main(args: Array[String]): Unit = {
    val sf1 = args.lift(0).getOrElse("testdata/sf1.0")
    val sf10 = args.lift(1).getOrElse("testdata/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("graft.scan.fanout", 32)
      .config("spark.ui.enabled", "false")
      .appName("graft-cross-shard-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val D = Tables(spark, sf1, "documents")
        .agg(max(col("doc_id"))).head().getLong(0) + 1L
      val pairs = graft.quality.DedupOps
        .minhashPairs(spark, sf10, minEstJaccard = 0.8).localCheckpoint(true)
      val cross = pairs
        .filter(floor(col("a") / D) =!= floor(col("b") / D)).localCheckpoint(true)
      println(s"[xprobe] total pairs=${pairs.count()} cross-shard=${cross.count()}")
      val toks = Tables(spark, sf10, "documents")
        .select(col("doc_id"),
          array_distinct(split(trim(col("text")), "\\s+")).as("tok"))
      val scored = cross
        .join(toks.select(col("doc_id").as("a"), col("tok").as("ta")), "a")
        .join(toks.select(col("doc_id").as("b"), col("tok").as("tb")), "b")
        .select(col("a"), col("b"),
          (size(array_intersect(col("ta"), col("tb"))).cast("double") /
            size(array_union(col("ta"), col("tb")))).as("true_j"))
        .localCheckpoint(true)
      println("[xprobe] true-Jaccard deciles of cross-shard pairs:")
      scored.select(expr(
        "percentile(true_j, array(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0))"))
        .head().getSeq[Double](0).zip(Seq("min", "p10", "p25", "p50", "p75", "p90", "max"))
        .foreach { case (v, l) => println(f"[xprobe]   $l%4s ${v}%.3f") }
      println(s"[xprobe] cross-shard pairs with true_j < 0.5: " +
        scored.filter(col("true_j") < 0.5).count())
      println(s"[xprobe] cross-shard pairs with IDENTICAL token sets: " +
        scored.filter(col("true_j") === 1.0).count())
      // shard-0 subset law: within-shard-0 pairs at sf10 can only LOSE
      // pairs vs standalone sf1.0 (buckets gaining cross-copy members
      // can exceed the cap), never gain
      val r1 = graft.quality.DedupOps
        .minhashPairs(spark, sf1, minEstJaccard = 0.8).localCheckpoint(true)
      val s0 = pairs.filter(col("a") < D && col("b") < D)
      println(s"[xprobe] shard0 pairs=${s0.count()} sf1.0 pairs=${r1.count()} " +
        s"gained=${s0.exceptAll(r1).count()} lost=${r1.exceptAll(s0).count()}")
    } finally spark.stop()
  }
}
