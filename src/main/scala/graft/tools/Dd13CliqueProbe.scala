package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.quality.DedupOps

/** One-off evidence probe for the dd13 decomposition (COVERAGE.md §dd13):
  * how much of the candidate-pair population is identical-signature
  * redundancy? Prints eval/train doc counts, distinct-signature counts,
  * band-bucket member-vs-rep sizes, and the candidate-pair total the
  * agreement join actually processes.
  */
object Dd13CliqueProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("testdata/sf1.0")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("graft.scan.fanout", 32)
      .config("spark.ui.enabled", "false")
      .appName("graft-dd13-cliques").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val docs = Tables(spark, sfDir, "documents")
      val evalDocs = docs.filter(col("doc_id") % 2 === 1)
      val train = docs.filter(col("doc_id") % 2 === 0)
      val evalSigs = DedupOps.minhashSignaturesOf(spark, evalDocs).localCheckpoint(true)
      val trainSigs = DedupOps.minhashSignaturesOf(spark, train).localCheckpoint(true)
      println(s"[probe] eval docs=${evalSigs.count()} distinctSigs=" +
        evalSigs.select("sig").distinct().count())
      println(s"[probe] train docs=${trainSigs.count()} distinctSigs=" +
        trainSigs.select("sig").distinct().count())
      def bands(sigs: org.apache.spark.sql.DataFrame) =
        DedupOps.bandedSigs(sigs).drop("sig") // THE production band keys
      val eb = bands(evalSigs).localCheckpoint(true)
      val buckets = eb.groupBy("band", "bkey").agg(count(lit(1)).as("members"))
      println("[probe] eval bucket member-count histogram (top 10):")
      buckets.groupBy("members").count().orderBy(desc("members")).limit(10)
        .collect().foreach(r => println(s"[probe]   members=${r.get(0)} buckets=${r.get(1)}"))
      val admitted = eb.join(buckets.filter(col("members") <= 1000)
        .select("band", "bkey"), Seq("band", "bkey"), "left_semi")
      val cand = bands(trainSigs)
        .join(admitted.select(col("band"), col("bkey"), col("doc_id").as("a_id")),
          Seq("band", "bkey"))
      println(s"[probe] candidate pairs before distinct=${cand.count()}")
      println(s"[probe] candidate pairs after distinct=" +
        cand.select("doc_id", "a_id").distinct().count())
    } finally spark.stop()
  }
}
