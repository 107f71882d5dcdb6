package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the dd2 rep-bucket size distribution above the in-expression
  * expansion threshold — the evidence behind [[graft.quality.DedupOps]]'s
  * hard-cap choice (how dense do over-cap buckets actually get at sf10,
  * i.e. what does chunked enumeration have to absorb to drive the
  * CrossShardProbe subset-law losses to zero).
  */
object BucketDist {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("testdata/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("graft.scan.fanout", 32)
      .config("spark.ui.enabled", "false")
      .appName("graft-bucket-dist").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val over = graft.quality.DedupOps.minhashDroppedBuckets(spark, dir)
        .localCheckpoint(true)
      println(s"[bdist] $dir over-cap buckets=${over.count()}")
      over.groupBy((floor(log2(col("n_members"))).cast("int")).as("log2_size"))
        .agg(count(lit(1)).as("n_buckets"), max("n_members").as("max_members"),
          sum(col("n_members") * (col("n_members") - 1) / 2).as("pairs_if_enumerated"))
        .orderBy("log2_size")
        .collect().foreach(r => println(s"[bdist]   $r"))
    } finally spark.stop()
  }
}
