package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc stage profiler for bench hot spots: times each named sub-plan
  * with a noop write in a warm session. Dev tool, not part of the query
  * surface.
  */
object Profile {
  def time(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    val docs = graft.Tables(spark, dir, "documents")
    println("docs rows = " + docs.count())
    docs.select(
      avg(length(col("text"))).as("avg_len"),
      max(length(col("text"))).as("max_len"),
      avg(size(split(trim(col("text")), "\\s+"))).as("avg_toks")).show()

    time("dd2.signatures")(graft.quality.DedupOps.minhashSignatures(spark, dir))
    time("dd2.cliques")(graft.quality.DedupOps.minhashCliques(spark, dir))

    // Bucket-size distribution for the banded LSH over representatives.
    {
      val cliques = graft.quality.DedupOps.minhashCliques(spark, dir)
      val reps = cliques.select(element_at(col("ids"), 1).as("doc_id"), col("sig"))
      println("reps = " + reps.count())
      val bandKeys = (0 until 4).map { b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * 8 + 1, 8), lit(b)).as("bkey")).as(s"bk$b")
      }
      val bsz = reps.withColumn("bk", explode(array(bandKeys: _*)))
        .groupBy(col("bk.band"), col("bk.bkey")).agg(count(lit(1)).as("n"))
      bsz.orderBy(desc("n")).show(10)
      bsz.select(sum(col("n") * (col("n") - 1) / 2).as("cand_pairs")).show()
    }
    time("dd2.pairs(aqe-on)")(graft.quality.DedupOps.minhashPairs(spark, dir, 0.8))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("dd2.pairs(aqe-off)")(graft.quality.DedupOps.minhashPairs(spark, dir, 0.8))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("dd2.pairs(no-codegen)")(graft.quality.DedupOps.minhashPairs(spark, dir, 0.8))
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    time("x5.winnow")(graft.SparkEntry.queries("x5_winnow_fingerprint")(spark, dir))
    time("x4.fingerprint")(graft.SparkEntry.queries("x4_fingerprint")(spark, dir))
    time("dd6.clusters")(graft.SparkEntry.queries("dd6_dedup_clusters")(spark, dir))
    time("dd3b.pairs")(graft.SparkEntry.queries("dd3b_simhash_lsh")(spark, dir))
    spark.stop()
  }
}
