/** One-off audit main: prints `name shuffleExchanges` for every
  * SparkEntry query's initial physical plan at sf0.001 — the data
  * backing ShuffleBudgetSpec's per-family budgets. Broadcast exchanges
  * are excluded on purpose: they are the cheap alternative the budgets
  * push plans toward.
  */
object ShuffleCount {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    graft.SparkEntry.all.sortBy(_.name).foreach { q =>
      try {
        val plan = q.fn(spark, dir).queryExecution.executedPlan.toString
        val shuffles = "(?m)^\\s*[+:|\\- ]*Exchange ".r.findAllIn(plan).size
        println(s"[shuffle] ${q.name} $shuffles")
      } catch {
        case e: Exception => println(s"[shuffle] ${q.name} ERR ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
