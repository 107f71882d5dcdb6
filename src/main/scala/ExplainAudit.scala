object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("p3_mask_filter", "p5_key_lookup", "v4_triplet_join", "j5_radius_join", "v1_voxelize")) {
      println(s"========== $name")
      val plan = graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      // keep the interesting lines
      plan.split("\n").filter(l =>
        l.contains("Scan") || l.contains("PushedFilters") || l.contains("Join") ||
        l.contains("Exchange") || l.contains("WholeStageCodegen") || l.contains("HashAggregate")
      ).take(20).foreach(println)
    }
    spark.stop()
  }
}
