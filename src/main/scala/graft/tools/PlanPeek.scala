package graft.tools

/** Throwaway plan inspector: `runMain graft.tools.PlanPeek <query> [sfDir]`. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val q = graft.SparkEntry.queries(args(0))(spark, dir)
    q.write.format("noop").mode("overwrite").save()
    println("=== EXECUTED ===")
    println(q.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
