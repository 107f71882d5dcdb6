package graft.tools

import org.apache.spark.sql.SparkSession

/** Counts dd2's candidate-pair population at a scale dir — the
  * denominator of the µs/pair flatness law (SCALING §three-decade:
  * dd2's wall must track the pair population, not the corpus bytes).
  * Kept minimal on purpose: [[CrossShardProbe]] additionally verifies
  * recall against true token-set Jaccard, which is DuckDB/join-heavy
  * and intractable at sf100; this prints just the population.
  */
object PairCount {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("testdata/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("graft.scan.fanout", 32)
      .config("spark.ui.enabled", "false")
      .appName("graft-pair-count").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mode = args.lift(1).getOrElse("verified")
    try {
      val t0 = System.nanoTime()
      // "verified" = the full dd2 output population (candidates that
      // survive the sig_agree >= threshold check — the r12 µs/pair
      // denominator); "candidates" = the pre-attachment candidate
      // population (the work unit of the expansion + verification
      // stages), countable WITHOUT the |pairs| × sig_bytes attachment
      // shuffle that exceeds a single node's disk at sf100.
      val n = mode match {
        case "candidates" =>
          graft.quality.DedupOps.minhashCandidates(spark, dir).count()
        case _ =>
          graft.quality.DedupOps.minhashPairs(spark, dir, 0.8).count()
      }
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[paircount] $dir $mode%s pairs=$n%d wall=$s%.2f s " +
        f"=> ${s * 1e6 / n}%.2f us/pair")
    } finally spark.stop()
  }
}
